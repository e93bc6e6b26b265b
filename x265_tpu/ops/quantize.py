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
    selector: intra_mask [B] bool (True -> intra offset 171, else 85).
    ``qp`` may be scalar or per-block [B]."""
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qp = jnp.asarray(qp, jnp.int32)
    transform_shift = 15 - bit_depth - log2n
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    if qp.ndim:
        scale = scale[:, None, None]
        qbits = qbits[:, None, None]
    offset_num = jnp.where(intra_mask, 171, 85).astype(jnp.int32)[:, None,
                                                                  None]
    absc = jnp.abs(coef)
    hi = absc * (scale >> 7)
    lo = absc * (scale & 127)
    offset = offset_num << (qbits - 9)
    level = (hi + ((lo + offset) >> 7)) >> (qbits - 7)
    level = jnp.clip(level, 0, 32767)
    return jnp.sign(coef) * level


# ---------------------------------------------------------------------------
# sign data hiding (§7.4.9.11 / encoder side of x265's signBitHidingHDQ,
# x265_1.9/source/common/quant.cpp:247)
# ---------------------------------------------------------------------------

def _diag4_rank() -> np.ndarray:
    """rank[y, x] = position of (x, y) in the 4x4 up-right diagonal scan."""
    rank = np.zeros((4, 4), np.int32)
    i = 0
    for s in range(7):
        for x in range(s + 1):
            y = s - x
            if x < 4 and y < 4:
                rank[y, x] = i
                i += 1
    return rank


DIAG4_RANK = _diag4_rank()


def sign_hide_np(levels: np.ndarray, rank: np.ndarray = None) -> np.ndarray:
    """Enforce the sign-hiding parity constraint on one TB's levels.

    For each 4x4 subblock whose significant span in scan order exceeds 3,
    the sign of the coefficient closest to DC is inferred from the parity
    of the subblock's absolute sum; if the parity disagrees, the magnitude
    of that coefficient is bumped by one (always structure-preserving).
    """
    if rank is None:
        rank = DIAG4_RANK
    out = levels.copy()
    n = levels.shape[-1]
    for ys in range(0, n, 4):
        for xs in range(0, n, 4):
            sb = out[ys:ys + 4, xs:xs + 4]
            nz = sb != 0
            if not nz.any():
                continue
            ranks = np.where(nz, rank, 99)
            first = ranks.min()
            last = np.where(nz, rank, -1).max()
            if last - first <= 3:
                continue
            fy, fx = np.argwhere(ranks == first)[0]
            val = int(sb[fy, fx])
            odd = int(np.abs(sb).sum()) & 1
            if (odd == 1) != (val < 0):
                sb[fy, fx] = val + (1 if val > 0 else -1)
    return out


def sign_hide_diag(levels: "jax.Array") -> "jax.Array":
    """Batched jnp version for diagonal-scan TBs: levels [B, n, n]."""
    b, n, _ = levels.shape
    s = n // 4
    rank = jnp.asarray(DIAG4_RANK)
    sb = levels.reshape(b, s, 4, s, 4).transpose(0, 1, 3, 2, 4)  # [B,s,s,4,4]
    nz = sb != 0
    ranks = jnp.where(nz, rank, 99)
    first = ranks.min(axis=(-2, -1))                             # [B,s,s]
    last = jnp.where(nz, rank, -1).max(axis=(-2, -1))
    hide = (last - first) > 3
    first_mask = (rank[None, None, None] == first[..., None, None]) & nz
    val = jnp.sum(jnp.where(first_mask, sb, 0), axis=(-2, -1))
    odd = (jnp.sum(jnp.abs(sb), axis=(-2, -1)) & 1) == 1
    mismatch = hide & (odd != (val < 0))
    bump = jnp.where(val > 0, 1, -1)
    sb = jnp.where(first_mask & mismatch[..., None, None],
                   sb + bump[..., None, None], sb)
    return sb.transpose(0, 1, 3, 2, 4).reshape(b, n, n)
