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
# RDOQ — rate-distortion optimized quantization
#
# Batched re-design of x265's rdoQuant trellis (x265_1.9/source/common/
# quant.cpp:551): instead of the sequential per-coefficient context walk
# with CABAC estBit tables (encoder/entropy.cpp:1950), every coefficient
# evaluates its candidate levels {0, L-1, L} in parallel with
#   J(l) = D_pixel(l) + lambda2 * R(l)
# where L is the round-nearest level, D is the transform-domain squared
# error mapped to the pixel domain (the HEVC core transform is orthogonal
# up to the 2^transform_shift gain per dimension), and R is the same
# monotone residual_coding bits model used for mode decisions
# (common/rdcost.py level_bits).  A second vectorized stage re-evaluates
# each 4x4 coefficient group for group-zeroing (the coded_sub_block_flag
# saving), mirroring rdoQuant's sig-group pass.  Output levels feed the
# normative dequant/CABAC paths unchanged, so conformance is unaffected.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _scan_tables(n: int):
    """(rank [n, n], last_bits [n*n]) for the up-right diagonal scan with
    4x4 coefficient-group structure (§6.5.3): rank 0 = DC, increasing
    toward high frequency; last_bits[p] estimates the
    last_sig_coeff_x/y_prefix+suffix cost of scan position p."""
    def diag_rank(m):
        rank = np.zeros((m, m), np.int32)
        i = 0
        for s in range(2 * m - 1):
            for x in range(s + 1):
                y = s - x
                if x < m and y < m:
                    rank[y, x] = i
                    i += 1
        return rank

    if n == 4:
        rank = diag_rank(4)
    else:
        g = n // 4
        grp = diag_rank(g)
        rank = (np.kron(grp, np.ones((4, 4), np.int32)) * 16
                + np.tile(diag_rank(4), (g, g)))
    ys, xs = np.divmod(np.argsort(rank.ravel(), kind="stable"), n)
    lb = (2.0 * np.floor(np.log2(xs + 1.0)) + 1.0
          + 2.0 * np.floor(np.log2(ys + 1.0)) + 1.0).astype(np.float32)
    return rank, lb


# The level_bits model (rdcost.py) is an UPPER bound on real CABAC cost
# (context-coded sig/gt1 flags average well under 1 bit each); charging it
# at full weight over-zeroes at high QP.  0.7 calibrated end-to-end
# against this encoder's actual CABAC output (see tests/test_rdoq.py).
_RDOQ_RATE_SCALE = 0.7


def _rdoq_core(jnp, coef, qp, bit_depth, psy_scale: float = 0.0):
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qp = jnp.asarray(qp, jnp.int32)
    ts = 15 - bit_depth - log2n
    qbits = QUANT_SHIFT + qp // 6 + ts
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    scale_eff = ((jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qp % 6] * 16)
                 << (qp // 6))
    bd_shift = bit_depth + log2n - 5
    # lambda2 = 0.85 * (2^(qp/6-2))^2  (rdcost.py lambda_ssd), damped by
    # the rate-model calibration factor
    lam2 = (0.85 * _RDOQ_RATE_SCALE
            * jnp.exp2((qp.astype(jnp.float32) - 12.0) / 3.0))
    lam2b = lam2[:, None] if qp.ndim else lam2      # [B, 1] for scan axes
    if qp.ndim:                          # per-block qp
        scale = scale[:, None, None]
        qbits = qbits[:, None, None]
        scale_eff = scale_eff[:, None, None]
        lam2 = lam2[:, None, None]
    absc = jnp.abs(coef)
    # round-nearest max candidate, int32-safe split as in quant()
    hi = absc * (scale >> 7)
    lo = absc * (scale & 127)
    offset = jnp.int32(1) << (qbits - 1)
    lmax = jnp.clip((hi + ((lo + offset) >> 7)) >> (qbits - 7), 0, 32767)
    cands = jnp.stack([jnp.zeros_like(lmax),
                       jnp.maximum(lmax - 1, 0), lmax])      # [3, B, n, n]
    dqf = cands.astype(jnp.float32) * (scale_eff.astype(jnp.float32)
                                       / float(2 ** bd_shift))
    err = absc.astype(jnp.float32) - dqf
    dist = err * err * float(2.0 ** (-2 * ts))               # pixel domain
    lf = cands.astype(jnp.float32)
    rate = jnp.where(cands > 0,
                     3.0 + 2.0 * jnp.floor(
                         jnp.log2(jnp.maximum(lf, 1.0))), 0.0)
    j = dist + lam2 * rate
    if psy_scale > 0.0:
        # psy-rdoq (x265 quant.cpp:551 rdoQuant's usePsy path): the
        # reconstructed coefficient's energy is a BONUS — retaining AC
        # magnitude is worth lambda_sad * psyRdoqScale per unit of
        # pixel-domain reconstructed amplitude, so larger candidate
        # levels win ties against zeroing on textured blocks.  DC is
        # excluded (x265 keeps psy off the DC position).
        lam_sad = jnp.sqrt(lam2 / (0.85 * _RDOQ_RATE_SCALE))
        ac = jnp.ones((n, n), bool).at[0, 0].set(False)
        j = j - (psy_scale * lam_sad) * (
            dqf * float(2.0 ** (-ts))) * ac[None, None]
    best = jnp.argmin(j, axis=0)         # ties -> lowest level wins
    level = jnp.take_along_axis(cands, best[None], axis=0)[0]
    jbest = jnp.min(j, axis=0)
    b = coef.shape[0]

    # ---- last-position pass (the core of rdoQuant's trellis win): pick
    # the scan position p that minimizes
    #   sum_{rank<=p} J(chosen) + sum_{rank>p} D(0) + lambda2*last_bits(p)
    # via batched cumulative sums over the static scan permutation.
    rank_tab, lb_tab = _scan_tables(n)
    perm = jnp.asarray(np.argsort(rank_tab.ravel(), kind="stable"))
    rank_j = jnp.asarray(rank_tab)
    n2 = n * n
    js = jbest.reshape(b, n2)[:, perm]               # scan order
    d0s = dist[0].reshape(b, n2)[:, perm]
    lvs = level.reshape(b, n2)[:, perm]
    cum_j = jnp.cumsum(js, axis=1)
    cum_d0 = jnp.cumsum(d0s, axis=1)
    tot_d0 = cum_d0[:, -1:]
    cost_p = cum_j + (tot_d0 - cum_d0) + lam2b * jnp.asarray(lb_tab)
    cost_p = jnp.where(lvs != 0, cost_p, jnp.inf)    # last coeff is sig
    # all-zero candidate: total zero-distortion, no residual syntax at
    # all (cbf=0 saves ~2 bits)
    lamv = lam2b[:, 0] if qp.ndim else lam2b
    cost_all0 = tot_d0[:, 0] - lamv * 2.0
    p_best = jnp.argmin(cost_p, axis=1)
    min_cost = jnp.min(cost_p, axis=1)
    keep_any = min_cost <= cost_all0
    keep = (rank_j[None] <= p_best[:, None, None]) & keep_any[:, None,
                                                              None]
    level = jnp.where(keep, level, 0)

    # ---- group zeroing: drop whole 4x4 groups whose coded cost exceeds
    # the all-zero distortion plus the csbf overhead (level_bits' 2 bits)
    g = n // 4
    sum_j = jbest.reshape(b, g, 4, g, 4).sum(axis=(2, 4))
    sum_d0 = dist[0].reshape(b, g, 4, g, 4).sum(axis=(2, 4))
    lvl_g = level.reshape(b, g, 4, g, 4)
    nzg = jnp.any(lvl_g != 0, axis=(2, 4))
    lam2_g = lam2.reshape(b, 1, 1) if lam2.ndim else lam2
    zero_grp = nzg & (sum_d0 < sum_j + lam2_g * 2.0)
    # never zero the group holding the chosen last position (keeps the
    # last-pos decision consistent)
    scan_yx = np.divmod(np.argsort(rank_tab.ravel(), kind="stable"), n)
    lgy = jnp.asarray(scan_yx[0] // 4)[p_best]
    lgx = jnp.asarray(scan_yx[1] // 4)[p_best]
    is_last_grp = ((jnp.arange(g)[None, :, None] == lgy[:, None, None])
                   & (jnp.arange(g)[None, None, :] == lgx[:, None, None]))
    zero_grp = zero_grp & ~is_last_grp
    level = jnp.where(zero_grp[:, :, None, :, None], 0,
                      lvl_g).reshape(b, n, n)
    return jnp.sign(coef) * level


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def rdoq(coef: jax.Array, qp: jax.Array, bit_depth: int = 8) -> jax.Array:
    """[B, N, N] int32 transform coeffs, qp scalar-or-[B] -> RDO levels."""
    return _rdoq_core(jnp, coef, qp, bit_depth)


def rdoq_np(coef: np.ndarray, qp: int, bit_depth: int = 8) -> np.ndarray:
    """Numpy oracle of ``rdoq`` for a single [n, n] block."""
    out = np.asarray(jax.device_get(
        rdoq(jnp.asarray(coef[None], jnp.int32), qp, bit_depth)))
    return out[0].astype(np.int32)


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
