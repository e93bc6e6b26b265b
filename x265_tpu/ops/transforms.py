"""HEVC core transforms: 4/8/16/32 integer DCT and the 4x4 DST-VII.

Inverse transform + dequant follow ITU-T H.265 §8.6 exactly (normative);
the forward transform mirrors the standard partial-butterfly formulation
(reference embodiment: x265_1.9/source/common/dct.cpp:442-636), expressed
as two rounded matrix products so the whole thing is a batched matmul on
device — the TPU-native replacement for dct8.asm (SURVEY.md §2.3).

Shapes: all batched entry points take ``[B, N, N]`` int32 and are shape-
polymorphic in B only; N and all shifts are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._dct_matrix import T32

# 4x4 DST-VII matrix (H.265 §8.6.4.1; used for 4x4 intra luma TBs)
DST4 = np.array([
    [29, 55, 74, 84],
    [74, 74, 0, -74],
    [84, -29, -74, 55],
    [55, -84, 74, -29],
], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """N-point HEVC transform matrix (rows subsample T32: T_N[k]=T32[32k/N][:N])."""
    assert n in (4, 8, 16, 32)
    return np.ascontiguousarray(T32[:: 32 // n, :n])


def _matrix(n: int, dst: bool) -> np.ndarray:
    return DST4 if dst else dct_matrix(n)


# ---------------------------------------------------------------------------
# numpy reference (spec oracle)
# ---------------------------------------------------------------------------

def forward_transform_np(resi: np.ndarray, bit_depth: int = 8,
                         dst: bool = False) -> np.ndarray:
    """2D forward transform of one NxN residual block (int32)."""
    n = resi.shape[-1]
    log2n = n.bit_length() - 1
    t = _matrix(n, dst).astype(np.int64)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    # stage 1 transforms rows (output transposed), stage 2 transforms columns:
    # C = T @ R @ T^T with rounding after each stage.
    tmp = (t @ resi.astype(np.int64).T + (1 << (shift1 - 1))) >> shift1
    out = (t @ tmp.T + (1 << (shift2 - 1))) >> shift2
    return out.astype(np.int32)


def inverse_transform_np(coef: np.ndarray, bit_depth: int = 8,
                         dst: bool = False) -> np.ndarray:
    """Normative inverse transform (§8.6.4): returns NxN int32 residual."""
    n = coef.shape[-1]
    t = _matrix(n, dst).astype(np.int64)
    shift1 = 7
    shift2 = 20 - bit_depth
    # stage 1 vertical: E = clip16((T^T C + 64) >> 7)
    tmp = (t.T @ coef.astype(np.int64) + (1 << (shift1 - 1))) >> shift1
    tmp = np.clip(tmp, -32768, 32767)
    # stage 2 horizontal: R = clip16((E T + add) >> shift2)
    out = (tmp @ t + (1 << (shift2 - 1))) >> shift2
    return np.clip(out, -32768, 32767).astype(np.int32)


# ---------------------------------------------------------------------------
# batched jnp (device path)
# ---------------------------------------------------------------------------

def _rshift_round(x, shift: int):
    return (x + (1 << (shift - 1))) >> shift


# MXU-exact integer matmul: int32 einsums run on the TPU's vector unit;
# the same contraction in float32 rides the MXU.  A float32 dot of
# integer operands is EXACT while every partial sum stays below 2^24,
# so stages whose accumulator bound exceeds that split the data operand
# into hi/lo halves (two exact f32 matmuls recombined in int32) —
# bit-exactness is asserted by tests/test_ops.py against the numpy
# spec oracles.

def _mm_f32(spec: str, t: jax.Array, x: jax.Array, n: int,
            xmax: int) -> jax.Array:
    """einsum(spec, t, x) exactly, via f32 on the MXU.  ``xmax``: bound
    on |x| (the transform matrix entries are < 2^7, so the accumulator
    bound is n * 2^7 * xmax)."""
    tf = t.astype(jnp.float32)
    if n * 128 * xmax < (1 << 24):
        return jnp.einsum(spec, tf, x.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
    hi = (x >> 8).astype(jnp.float32)
    lo = (x & 255).astype(jnp.float32)
    h = jnp.einsum(spec, tf, hi,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    l = jnp.einsum(spec, tf, lo,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    return (h << 8) + l


@functools.partial(jax.jit, static_argnames=("bit_depth", "dst"))
def forward_transform(resi: jax.Array, bit_depth: int = 8,
                      dst: bool = False) -> jax.Array:
    """Batched forward transform: [B, N, N] int32 -> [B, N, N] int32."""
    n = resi.shape[-1]
    log2n = n.bit_length() - 1
    t = jnp.asarray(_matrix(n, dst), dtype=jnp.int32)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    # C = T @ R @ T^T, rounding after each stage
    tmp = _rshift_round(
        _mm_f32("ki,bji->bkj", t, resi, n, 1 << (bit_depth + 1)), shift1)
    out = _rshift_round(_mm_f32("ki,bji->bkj", t, tmp, n, 1 << 16),
                        shift2)
    return out


@functools.partial(jax.jit, static_argnames=("bit_depth", "dst"))
def inverse_transform(coef: jax.Array, bit_depth: int = 8,
                      dst: bool = False) -> jax.Array:
    """Batched normative inverse transform: [B, N, N] int32 -> [B, N, N]."""
    n = coef.shape[-1]
    t = jnp.asarray(_matrix(n, dst), dtype=jnp.int32)
    tmp = _rshift_round(_mm_f32("ki,bkj->bij", t, coef, n, 1 << 15), 7)
    tmp = jnp.clip(tmp, -32768, 32767)
    out = _rshift_round(_mm_f32("lj,bil->bij", t, tmp, n, 1 << 15),
                        20 - bit_depth)
    return jnp.clip(out, -32768, 32767)
