"""Quantization / dequantization (ITU-T H.265 §8.6.3).

Capability parity with the reference's Quant::transformNxN quant path and
``dequant_normal`` (x265_1.9/source/common/quant.cpp:397,612; pixel-util8.asm
quant/nquant/dequant kernels), as batched integer jnp ops.  Flat (default)
scaling matrices for now; custom scaling lists arrive with --scaling-list.

Notation: per = qp // 6, rem = qp % 6,
transform_shift = 15 - bit_depth - log2N (MAX_TR_DYNAMIC_RANGE = 15).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# §8.6.3 levelScale, and the forward scales 2^(14+.../...) used by encoders
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int32)
QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564],
                        dtype=np.int32)
QUANT_SHIFT = 14


def _qbits(qp: int, log2n: int, bit_depth: int) -> int:
    transform_shift = 15 - bit_depth - log2n
    return QUANT_SHIFT + qp // 6 + transform_shift


# ---------------------------------------------------------------------------
# numpy reference
# ---------------------------------------------------------------------------

def quant_np(coef: np.ndarray, qp: int, bit_depth: int = 8,
             intra: bool = True) -> np.ndarray:
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qbits = _qbits(qp, log2n, bit_depth)
    offset = (171 if intra else 85) << (qbits - 9)
    scale = int(QUANT_SCALES[qp % 6])
    level = (np.abs(coef.astype(np.int64)) * scale + offset) >> qbits
    return (np.sign(coef) * np.clip(level, 0, 32767)).astype(np.int32)


def dequant_np(level: np.ndarray, qp: int, bit_depth: int = 8) -> np.ndarray:
    """Normative §8.6.3 with flat scaling list (m=16)."""
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    bd_shift = bit_depth + log2n - 5
    scale = (int(INV_QUANT_SCALES[qp % 6]) * 16) << (qp // 6)
    d = (level.astype(np.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767).astype(np.int32)


# ---------------------------------------------------------------------------
# batched jnp
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bit_depth", "intra"))
def quant(coef: jax.Array, qp: jax.Array, bit_depth: int = 8,
          intra: bool = True) -> jax.Array:
    """[B, N, N] int32 coeffs, qp scalar-or-[B] -> quantized levels.

    int64-free: abs(coef) <= 2^15, scale < 2^15 -> product < 2^30 fits int32
    only if qbits subtraction is done in two steps; we split the shift.
    """
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qp = jnp.asarray(qp, jnp.int32)
    transform_shift = 15 - bit_depth - log2n
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    offset_num = jnp.int32(171 if intra else 85)
    if qp.ndim:  # per-block qp
        scale = scale[:, None, None]
        qbits = qbits[:, None, None]
    absc = jnp.abs(coef)
    # split the product: (a*s) >> qbits == ((a*s_hi) >> (qbits-7)) issues with
    # rounding; instead do the multiply in two int32 pieces:
    #   a*s = (a*(s>>7))<<7 + a*(s&127)
    hi = absc * (scale >> 7)
    lo = absc * (scale & 127)
    offset = offset_num << (qbits - 9)
    # level = (hi<<7 + lo + offset) >> qbits, computed without overflow:
    level = (hi + ((lo + offset) >> 7)) >> (qbits - 7)
    level = jnp.clip(level, 0, 32767)
    return jnp.sign(coef) * level


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def dequant(level: jax.Array, qp: jax.Array, bit_depth: int = 8) -> jax.Array:
    """Normative dequant, batched.  [B, N, N] levels, qp scalar-or-[B]."""
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    qp = jnp.asarray(qp, jnp.int32)
    bd_shift = bit_depth + log2n - 5
    per = qp // 6
    scale16 = jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qp % 6] * 16
    if qp.ndim:
        scale16 = scale16[:, None, None]
        per = per[:, None, None]
    # |level|*scale16<<per can exceed int32 at high qp.  Any |level| beyond
    # lmax already dequantizes past the ±32767 clip, so pre-clamping levels
    # to lmax+1 yields bit-identical post-clip output with int32-safe
    # products (lmax*scale_eff <= (32767<<bd_shift) + scale_eff < 2^26).
    scale_eff = scale16 << per
    lmax = (32767 << bd_shift) // scale_eff + 1
    lvl = jnp.clip(level, -lmax, lmax)
    d = (lvl * scale_eff + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, -32768, 32767)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def quant_masked(coef: jax.Array, qp: jax.Array, intra_mask: jax.Array,
                 bit_depth: int = 8) -> jax.Array:
    """Like ``quant`` but with a per-block intra/inter rounding-offset
    selector: intra_mask [B] bool (True -> intra offset 171, else 85)."""
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qp = jnp.asarray(qp, jnp.int32)
    transform_shift = 15 - bit_depth - log2n
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    offset_num = jnp.where(intra_mask, 171, 85).astype(jnp.int32)[:, None,
                                                                  None]
    absc = jnp.abs(coef)
    hi = absc * (scale >> 7)
    lo = absc * (scale & 127)
    offset = offset_num << (qbits - 9)
    level = (hi + ((lo + offset) >> 7)) >> (qbits - 7)
    level = jnp.clip(level, 0, 32767)
    return jnp.sign(coef) * level
