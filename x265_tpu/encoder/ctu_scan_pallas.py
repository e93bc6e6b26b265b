"""Pallas TPU megakernel for the CTU wavefront scan step.

The jnp scan body (encoder/ctu_scan.py make_step) issues ~600 small XLA
ops per wavefront level; at ~1-3 us per op the 62-level 1080p scan costs
~90 ms/frame even though the math itself is trivial (measured round 5).
This module compiles the ENTIRE per-level step — frontier seeding, 35-mode
intra prediction, forward/inverse transforms, quantization, sign-hiding,
reconstruction, the in-scan 32-vs-16 CU RD decision and the frontier
update — into ONE Mosaic kernel invoked from the existing ``lax.scan``
body, playing the role x265's 171k-line asm layer plays for the CPU
(x265_1.9/source/common/x86/, SURVEY.md §2.3/§7 design stance).

Bit-exactness strategy (all integer math):
  * every matmul runs on the MXU with operands that are EXACT in bf16
    (|x| <= 256) or split hi/lo so each half is; f32 accumulation of
    products below 2^24 is error-free,
  * per-lane mode selection is a one-hot contraction (no gathers),
  * reference-sample substitution is a log-step last/first-valid fill
    (no cummax / take_along_axis),
  * Mosaic-unsupported patterns (minor-dim reshapes, rev, functional
    scatter) are avoided by construction: flatten/unflatten go through
    lanes-minor transposes, reversal is a matmul with an antidiagonal
    matrix, in-place updates write to VMEM scratch refs.

Feature coverage: 8-bit, 64x64 CTB, sign-hide, strong-intra-smoothing,
decide32 on/off, intra/inter (incl. the inter TU32 uniform-quad trial).
RDOQ / noise-reduction / RQT configurations fall back to the jnp step
(ctu_scan.py gates on these).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..ops.quantize import QUANT_SCALES, INV_QUANT_SCALES, QUANT_SHIFT
from ..ops.transforms import dct_matrix
from ..ops.intra import _weight_tensor
from ..ops.quantize import DIAG4_RANK


def _use_interpret() -> bool:
    return os.environ.get("X265_PALLAS", "") == "interp"


def pallas_supported(scan, inter: bool, decide32: bool, rqt: bool) -> bool:
    """Whether the Pallas step covers this configuration."""
    if os.environ.get("X265_NO_PALLAS"):
        return False
    if scan.rdoq or scan.noise_reduction or rqt:
        return False
    if getattr(scan, "psy_rd", 0.0) > 0.0:
        return False    # psy energy term not in the kernel yet
    if scan.bit_depth != 8:
        return False
    t = scan.t
    if not t["has32"] or t["geom"].log2_ctb != 6:
        return False
    # Mosaic relayout bug on single-lane reductions; tiny pictures use
    # the jnp step (the kernel's win is large-frame wavefronts anyway)
    if t["lmax"] < 2:
        return False
    if not _use_interpret():
        import jax
        if jax.default_backend() != "tpu":
            return False
    return True


def make_pallas_step(scan, inter: bool, decide32: bool):
    """Returns step(carry, xs) -> (carry, ys) with the same contract as
    ctu_scan.make_step's step (non-rdoq/nr path), backed by one Pallas
    kernel per level."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = scan.t
    g = t["geom"]
    bd = scan.bit_depth
    assert bd == 8
    maxv = 255
    ctb = 64
    ctbc = 32
    cw, ch = g.ctbs_w, g.ctbs_h
    L = t["lmax"]
    n_quads, spq = t["n_quads"], t["slots_per_quad"]
    nslots = t["nslots"]
    strong = scan.strong
    sign_hide = scan.sign_hide
    CH_ = 1 + ctb + 32
    CW_ = 1 + 2 * ctb
    CHC = 1 + ctbc + 16
    CWC = 1 + 2 * ctbc
    OVH16, OVH32 = 9.0, 12.0

    def z_origins(count, size):
        out = []
        for i in range(count):
            out.append((((i & 1) | ((i >> 1) & 2)) * size,
                        (((i >> 1) & 1) | ((i >> 2) & 2)) * size))
        return out

    quad_orig = z_origins(n_quads, 32)
    slot_orig = z_origins(spq, 16)

    # ---- static tables shipped as kernel inputs ----
    def w_flatT(n):
        W, shift, add, filt = _weight_tensor(n)
        # [35, n*n, R] -> [R, 35*n*n] (R-major: lanes-major matmuls
        # keep every intermediate's minor dim large, avoiding the
        # 128-lane padding blowup of a lanes-minor layout)
        return (np.ascontiguousarray(
                    np.asarray(W).reshape(35 * n * n, 4 * n + 1).T),
                shift.astype(np.float32), add.astype(np.float32),
                filt.astype(np.float32))

    W16T, SH16, AD16, FI16 = w_flatT(16)
    W8T, SH8, AD8, FI8 = w_flatT(8)
    W32T, SH32, AD32, FI32 = w_flatT(32)
    # DMA slices need the sublane dim aligned to 8: pad R 129 -> 136
    W32T = np.concatenate(
        [W32T, np.zeros((7, W32T.shape[1]), W32T.dtype)], axis=0)
    T16 = dct_matrix(16).astype(np.float32)
    T32 = dct_matrix(32).astype(np.float32)
    T8 = dct_matrix(8).astype(np.float32)
    RANK4 = DIAG4_RANK.astype(np.int32)
    QS = QUANT_SCALES.astype(np.float32)       # [6]
    IQS = INV_QUANT_SCALES.astype(np.float32)  # [6]

    f32 = jnp.float32
    i32 = jnp.int32

    # ------------------------------------------------------------------
    # kernel helpers (traced inside the kernel body)
    # ------------------------------------------------------------------

    def iota2(shape, dim):
        return jax.lax.broadcasted_iota(i32, shape, dim)

    def b2i(x):
        # bool -> int32 without the (unsupported) i1 vreg bitcast
        return jnp.where(x, 1, 0).astype(i32)

    def b2f(x):
        return jnp.where(x, 1.0, 0.0).astype(f32)

    def dot_hi(a, b):
        """f32 matmul with EXACT accumulation for integer operands
        below 2^24: in-kernel jnp.dot defaults to one bf16 pass, which
        rounds anything above 2^8 (found the hard way: quant scale
        26214 -> 26240)."""
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=f32)

    def revmat(R):
        ii = iota2((R, R), 0)
        jj = iota2((R, R), 1)
        return b2f(ii + jj == R - 1)

    def reverse_rows(x, R):
        """[L?, R] int32 -> reversed along axis 1 (values <= 2^20)."""
        return dot_hi(x.astype(f32), revmat(R)).astype(i32)

    def substitute(val, avail, R):
        """§8.4.4.2.2 fill: val/avail [Lx, R] int32 (avail 0/1)."""
        colid = iota2(val.shape, 1)
        fv, fok = val, avail
        s = 1
        while s < R:
            sv = jnp.roll(fv, s, axis=1)
            so = jnp.roll(fok, s, axis=1) * b2i(colid >= s)
            take = (1 - fok) * so
            fv = fv * (1 - take) + sv * take
            fok = jnp.maximum(fok, so)
            s <<= 1
        bv, bok = val, avail
        s = 1
        while s < R:
            sv = jnp.roll(bv, -s, axis=1)
            so = jnp.roll(bok, -s, axis=1) * b2i(colid < R - s)
            take = (1 - bok) * so
            bv = bv * (1 - take) + sv * take
            bok = jnp.maximum(bok, so)
            s <<= 1
        out = jnp.where(fok > 0, fv, bv)
        any_av = jnp.max(avail, axis=1)[:, None]
        return jnp.where(any_av > 0, out, 1 << (bd - 1))

    def unflatten(vT, n, lanes):
        """[n*n, lanes] -> [lanes, n, n]."""
        return jnp.transpose(vT.reshape(n, n, lanes), (2, 0, 1))

    def unflat(v, n, lanes):
        """[lanes, n*n] -> [lanes, n, n] (Mosaic-safe: VMEM blocks keep
        a >=128 minor dim; the spatial form is built via transposes)."""
        return unflatten(jnp.transpose(v), n, lanes)

    def flat(x, n, lanes):
        """[lanes, n, n] -> [lanes, n*n]."""
        return jnp.transpose(
            jnp.transpose(x, (1, 2, 0)).reshape(n * n, lanes))

    def lanes3(x, lanes, a=1, b=1):
        """Per-lane scalar [lanes] (or [lanes, 1]) -> [lanes, a, b]
        MATERIALIZED (Mosaic rejects both the 1-D -> 3-D reshape and
        [L,1,1] -> [L,n,n] broadcasts; an outer-product matmul in the
        lanes-minor layout is always legal; exact for |x| < 2^24)."""
        x2 = x if x.ndim == 2 else x[:, None]
        ones_ab = (iota2((a * b, 1), 0) * 0 + 1).astype(f32)
        big = dot_hi(ones_ab, jnp.transpose(x2).astype(f32))
        return jnp.transpose(big.reshape(a, b, lanes),
                             (2, 0, 1)).astype(x2.dtype)

    def rowwise(v, n, lanes):
        """[lanes, n] -> [lanes, n, n] replicating along axis 1 (rows):
        out[l, y, x] = v[l, x]."""
        vT = jnp.transpose(v)                           # [n(x), lanes]
        v3 = vT.reshape(1, n, lanes)                    # leading-dim add
        rep = jnp.concatenate([v3] * n, axis=0)         # [n(y), n(x), L]
        return jnp.transpose(rep, (2, 0, 1))

    def colwise(v, n, lanes):
        """[lanes, n] -> [lanes, n, n]: out[l, y, x] = v[l, y]."""
        return jnp.swapaxes(rowwise(v, n, lanes), 1, 2)

    def matmul_bf16(a_i32, b_bf16):
        """Exact int matmul: a [M, K] int32 with |a| <= 256 -> bf16;
        b already bf16-exact.  f32 accumulate."""
        return jnp.dot(a_i32.astype(jnp.bfloat16), b_bf16,
                       preferred_element_type=f32)

    def matmul_split(x, tmat_bf16):
        """Exact x @ T for |x| < 2^23: hi/lo split, both halves
        bf16-exact (|hi| <= 2^15 needs a second split at 2^16 -- the
        values here stay below 2^16 so one split suffices)."""
        hi = jax.lax.shift_right_arithmetic(x, 8)
        lo = x & 255
        h = jnp.dot(hi.astype(jnp.bfloat16), tmat_bf16,
                    preferred_element_type=f32).astype(i32)
        low = jnp.dot(lo.astype(jnp.bfloat16), tmat_bf16,
                      preferred_element_type=f32).astype(i32)
        return (h << 8) + low

    def rshift_round(x, sh):
        return jax.lax.shift_right_arithmetic(x + (1 << (sh - 1)), sh)

    def fwd_transform(resi, n, tmat, lanes):
        """[lanes, n, n] residual (|r| <= 255) -> coef [lanes, n, n]."""
        log2n = n.bit_length() - 1
        s1 = log2n + bd - 9
        s2 = log2n + 6
        tT = tmat.T                                    # [i, k] bf16
        r2 = resi.reshape(lanes * n, n)
        gflat = jnp.dot(r2.astype(jnp.bfloat16), tT,
                        preferred_element_type=f32).astype(i32)
        gv = rshift_round(gflat, s1).reshape(lanes, n, n)   # [l, j, k]
        gt = jnp.swapaxes(gv, 1, 2)                          # [l, k, j]
        o2 = matmul_split(gt.reshape(lanes * n, n), tmat.T)  # over j
        out = rshift_round(o2, s2).reshape(lanes, n, n)      # [l, k, m]
        return jnp.swapaxes(out, 1, 2)                       # [l, m, k]

    def inv_transform(coef, n, tmat, lanes):
        """Normative inverse: coef [lanes, n, n] -> residual."""
        s2 = 20 - bd
        cj = jnp.swapaxes(coef, 1, 2)                  # [l, j, k]
        t1 = matmul_split(cj.reshape(lanes * n, n), tmat)   # sum_k C*T[k,i]
        tmp = jnp.clip(rshift_round(t1, 7), -32768, 32767)
        tmp3 = jnp.swapaxes(tmp.reshape(lanes, n, n), 1, 2)  # [l, i, j]
        o2 = matmul_split(tmp3.reshape(lanes * n, n), tmat)  # over j
        out = jnp.clip(rshift_round(o2, s2), -32768, 32767)
        return out.reshape(lanes, n, n)

    def qp_derived(qp, n, qsv, iqsv):
        """(scale [Lx], qbits [Lx], scale_eff [Lx], bdshift) int32."""
        log2n = n.bit_length() - 1
        ts = 15 - bd - log2n
        rem = qp % 6
        per = qp // 6
        oh6 = b2f(rem[:, None] == iota2((qp.shape[0], 6), 1))
        scale = dot_hi(oh6, qsv[:, None])[:, 0].astype(i32)
        iscale = dot_hi(oh6, iqsv[:, None])[:, 0].astype(i32)
        qbits = QUANT_SHIFT + per + ts
        scale_eff = (iscale * 16) << per
        return scale, qbits, scale_eff, bd + log2n - 5

    def quant_masked(coef, qp, intra_mask, n, lanes, qsv, iqsv):
        scale, qbits, _, _ = qp_derived(qp, n, qsv, iqsv)
        s3 = lanes3(scale, lanes, n, n)
        q3 = lanes3(qbits, lanes, n, n)
        offn = lanes3(jnp.where(intra_mask > 0, 171, 85), lanes, n, n)
        absc = jnp.abs(coef)
        hi = absc * (s3 >> 7)
        lo = absc * (s3 & 127)
        offset = offn << (q3 - 9)
        level = jax.lax.shift_right_logical(
            hi + jax.lax.shift_right_logical(lo + offset, 7), q3 - 7)
        level = jnp.clip(level, 0, 32767)
        return jnp.sign(coef) * level

    def dequant(level, qp, n, lanes, qsv, iqsv):
        _, _, scale_eff, bdshift = qp_derived(qp, n, qsv, iqsv)
        se = lanes3(scale_eff, lanes, n, n)
        lmax = (32767 << bdshift) // se + 1
        lvl = jnp.clip(level, -lmax, lmax)
        d = rshift_round(lvl * se, bdshift)
        return jnp.clip(d, -32768, 32767)

    def sign_hide_apply(lv_ref, n, lanes, rank4_i):
        """In-place sign-hide on lv_ref[:lanes, :n, :n] (scratch)."""
        for a in range(n // 4):
            for b in range(n // 4):
                sb = lv_ref[0:lanes, 4 * a:4 * a + 4, 4 * b:4 * b + 4]
                nz = b2i(sb != 0)
                rk = rank4_i[None]
                ranks = jnp.where(nz > 0, rk, 99)
                first = ranks.min(axis=2).min(axis=1)
                last = jnp.where(nz > 0, rk, -1).max(axis=2).max(axis=1)
                hide = (last - first) > 3
                fm = (rk == lanes3(first, lanes, 4, 4)) & (nz > 0)
                val = jnp.where(fm, sb, 0).sum(axis=2).sum(axis=1)
                odd = (jnp.abs(sb).sum(axis=2).sum(axis=1) & 1) == 1
                mm = hide & (odd != (val < 0))
                bump = jnp.where(val > 0, 1, -1)
                lv_ref[0:lanes, 4 * a:4 * a + 4, 4 * b:4 * b + 4] = (
                    jnp.where(fm & (lanes3(b2i(mm), lanes,
                                            4, 4) > 0),
                              sb + lanes3(bump, lanes, 4, 4), sb))

    def pool4(x_f32, n, lanes):
        """4x4-subblock sums: [lanes, n, n] f32 -> [lanes, g, g]."""
        gsz = n // 4
        ii = iota2((n, gsz), 0)
        jj = iota2((n, gsz), 1)
        P4 = b2f((ii >> 2) == jj)                      # [n, g]
        r1 = dot_hi(x_f32.reshape(lanes * n, n),
                    P4).reshape(lanes, n, gsz)
        r2 = jnp.transpose(r1, (0, 2, 1))              # [lanes, g, n]
        r3 = dot_hi(r2.reshape(lanes * gsz, n), P4)
        return r3.reshape(lanes, gsz, gsz)

    def level_bits(lv, n, lanes):
        """Cheap residual-bits model (rdcost.level_bits_jnp twin):
        integer-exact MSB-count magnitude bits + per-4x4-group flags."""
        a = jnp.abs(lv)
        msb = sum(b2i(a >= (1 << k)) for k in range(1, 16))
        mag = jnp.where(a > 0, 2 * msb + 3, 0)
        bits = mag.sum(axis=2).sum(axis=1)
        nzf = b2f(a > 0)
        grp = jnp.minimum(pool4(nzf, n, lanes), 1.0)
        return (bits.astype(f32)
                + 2.0 * grp.sum(axis=2).sum(axis=1))

    def ssd(a, b2):
        d = a - b2
        return (d * d).sum(axis=2).sum(axis=1).astype(f32)

    def onehot35(modes, lanes):
        return b2f(modes[:, None] == iota2((lanes, 35), 1))

    def smooth121(refs, R):
        mid = (refs[:, :-2] + 2 * refs[:, 1:-1] + refs[:, 2:] + 2) >> 2
        colid = iota2(refs.shape, 1)
        interior = (colid >= 1) & (colid <= R - 2)
        return jnp.where(
            interior, jnp.concatenate(
                [refs[:, 0:1], mid, refs[:, R - 1:R]], axis=1), refs)

    def predict_core(ref_sel, oh, n, wn_src, shv, adv, lanes,
                     w32buf=None, dma_sem=None):
        """Mode-selected prediction from the chosen refs.

        ref_sel [lanes, R] int32, oh [lanes, 35] one-hot.  ``wn_src`` is
        a VMEM ref [R, 35*n*n] bf16 for n <= 16, or an HBM (ANY) ref for
        n == 32 streamed in 7-mode chunks through ``w32buf``."""
        n2 = n * n
        refb = ref_sel.astype(jnp.bfloat16)
        accsel = jnp.zeros((lanes, n2), f32)
        if n == 32:
            CHUNK = 7
            zpad = jnp.zeros((lanes, 7), jnp.bfloat16)
            refb136 = jnp.concatenate([refb, zpad], axis=1)
            for c in range(35 // CHUNK):
                cp = pltpu.make_async_copy(
                    wn_src.at[:, pl.ds(c * CHUNK * n2, CHUNK * n2)],
                    w32buf, dma_sem)
                cp.start()
                cp.wait()
                accc = jnp.dot(refb136, w32buf[:],
                               preferred_element_type=f32)
                for k in range(CHUNK):
                    m = c * CHUNK + k
                    accsel = accsel + (oh[:, m:m + 1]
                                       * accc[:, k * n2:(k + 1) * n2])
        else:
            accc = jnp.dot(refb, wn_src[:], preferred_element_type=f32)
            for m in range(35):
                accsel = accsel + (oh[:, m:m + 1]
                                   * accc[:, m * n2:(m + 1) * n2])
        sh = dot_hi(oh, shv[:, None]).astype(i32)     # [lanes,1]
        ad = dot_hi(oh, adv[:, None]).astype(i32)
        pre = jax.lax.shift_right_arithmetic(accsel.astype(i32) + ad, sh)
        return unflatten(jnp.transpose(pre), n, lanes)

    def predict(refs, modes, n, is_luma, WnT, shv, adv, fiv, lanes,
                w32buf=None, dma_sem=None):
        """refs [lanes, R] substituted int32; -> [lanes, n, n]."""
        R = 4 * n + 1
        oh = onehot35(modes, lanes)
        if is_luma:
            filtered = smooth121(refs, R)
            uf = dot_hi(oh, fiv[:, None])[:, 0] > 0.5
            ref_sel = jnp.where(uf[:, None], filtered, refs)
        else:
            ref_sel = refs
        pred = predict_core(ref_sel, oh, n, WnT, shv, adv, lanes,
                            w32buf, dma_sem)
        return pred, ref_sel

    def luma_post(pred, refs, modes, n, lanes):
        """DC/VER/HOR boundary post-filters (n < 32, luma, from the
        UNFILTERED canonical refs)."""
        DC_, HOR_, VER_ = 1, 10, 26
        # left[k] = refs[:, 2n-1-k] for k = 0..n-1
        left = reverse_rows(refs[:, n:2 * n], n)
        corner = refs[:, 2 * n:2 * n + 1]
        top = refs[:, 2 * n + 1:3 * n + 1]
        dc = (left.sum(axis=1, keepdims=True)
              + top.sum(axis=1, keepdims=True) + n) >> (n.bit_length())
        row0 = (top + 3 * dc + 2) >> 2
        col0 = (left + 3 * dc + 2) >> 2
        c00 = (left[:, 0:1] + 2 * dc + top[:, 0:1] + 2) >> 2
        # fold the corner sample into row 0, then insert rows/cols
        cid = iota2(row0.shape, 1)
        row0 = jnp.where(cid == 0, c00, row0)
        i1 = iota2((lanes, n, n), 1)
        i2 = iota2((lanes, n, n), 2)
        is_dc = lanes3(b2i(modes == DC_), lanes,
                       n, n) > 0
        pred = jnp.where(is_dc & (i2 == 0) & (i1 > 0),
                         colwise(col0, n, lanes), pred)
        pred = jnp.where(is_dc & (i1 == 0), rowwise(row0, n, lanes),
                         pred)
        ver_col = jnp.clip(top[:, :1] + jax.lax.shift_right_arithmetic(
            left - corner, 1), 0, maxv)
        hor_row = jnp.clip(left[:, :1] + jax.lax.shift_right_arithmetic(
            top - corner, 1), 0, maxv)
        is_ver = lanes3(b2i(modes == VER_), lanes,
                        n, n) > 0
        is_hor = lanes3(b2i(modes == HOR_), lanes,
                        n, n) > 0
        pred = jnp.where(is_ver & (i2 == 0), colwise(ver_col, n, lanes),
                         pred)
        pred = jnp.where(is_hor & (i1 == 0), rowwise(hor_row, n, lanes),
                         pred)
        return pred

    def strong_smooth(ref, lanes):
        """§8.4.4.2.3 strong smoothing candidate + condition ([L, 129])."""
        n = 32
        corner = ref[:, 2 * n:2 * n + 1]
        bl_last = ref[:, 0:1]
        tr_last = ref[:, 4 * n:4 * n + 1]
        topm1 = ref[:, 3 * n:3 * n + 1]    # top[n-1]
        leftm1 = ref[:, n:n + 1]           # left[n-1] = ref[2n-1-(n-1)]
        thr = 1 << (bd - 5)
        cond = ((jnp.abs(corner + tr_last - 2 * topm1) < thr)
                & (jnp.abs(corner + bl_last - 2 * leftm1) < thr))[:, 0]
        colid = iota2(ref.shape, 1)
        # left span: canonical idx j in [0, 2n-1] holds p[-1][2n-1-j];
        # strong: p[-1][y] = ((64-(y+1))*corner + (y+1)*bl_last + 32)>>6
        yy = 2 * n - 1 - colid             # y at column j
        iw = yy + 1
        sleft = jax.lax.shift_right_arithmetic(
            (64 - iw) * corner + iw * bl_last + 32, 6)
        # top span: canonical idx j in [2n+1, 4n] holds p[x][-1], x=j-2n-1
        xx = colid - 2 * n - 1
        ix = xx + 1
        stop = jax.lax.shift_right_arithmetic(
            (64 - ix) * corner + ix * tr_last + 32, 6)
        out = jnp.where(colid < 2 * n,
                        jnp.where(colid == 0, ref, sleft), ref)
        out = jnp.where(colid > 2 * n,
                        jnp.where(colid == 4 * n, ref, stop), out)
        return out, cond

    # ------------------------------------------------------------------
    # the kernel
    # ------------------------------------------------------------------

    def kernel(*args):
        ai = iter(args)

        def nxt(name):
            r = next(ai)
            return r

        cx_s = nxt("cx")
        cy_s = nxt("cy")
        rowf = nxt("rowf"); colf = nxt("colf")
        rowfb = nxt("rowfb"); colfb = nxt("colfb")
        rowfr = nxt("rowfr"); colfr = nxt("colfr")
        corn_y = nxt("corn_y"); corn_cb = nxt("corn_cb")
        corn_cr = nxt("corn_cr")
        m16 = nxt("m16"); qp_y = nxt("qp_y")
        qp_cb = nxt("qp_cb"); qp_cr = nxt("qp_cr")
        o16y = nxt("o16y"); o8cb = nxt("o8cb"); o8cr = nxt("o8cr")
        l16av = nxt("l16av"); c8av = nxt("c8av")
        w16 = nxt("w16"); w8 = nxt("w8"); w32 = nxt("w32")
        t16 = nxt("t16"); t8 = nxt("t8"); t32 = nxt("t32")
        sh16 = nxt("sh16"); ad16 = nxt("ad16"); fi16 = nxt("fi16")
        sh8 = nxt("sh8"); ad8 = nxt("ad8")
        sh32 = nxt("sh32"); ad32 = nxt("ad32"); fi32 = nxt("fi32")
        rank4 = nxt("rank4")
        qs_r = nxt("qs"); iqs_r = nxt("iqs")
        o32y = nxt("o32y"); o16cb = nxt("o16cb"); o16cr = nxt("o16cr")
        m32v = nxt("m32"); l32av = nxt("l32av"); c16av = nxt("c16av")
        quad_okv = nxt("quad_ok")
        if decide32:
            lamv = nxt("lam")
        else:
            use32v = nxt("use32")
        if inter:
            ivv = nxt("iv"); ipy = nxt("ipy")
            ipcb = nxt("ipcb"); ipcr = nxt("ipcr")
            if decide32:
                m32inv = nxt("m32in")
        # outputs
        lv16_o = nxt("lv16_o"); lv8c_o = nxt("lv8c_o")
        lv32_o = nxt("lv32_o"); lvc16_o = nxt("lvc16_o")
        u32_o = nxt("u32_o"); inty_o = nxt("inty_o"); intc_o = nxt("intc_o")
        rowf_o = nxt("rowf_o"); colf_o = nxt("colf_o")
        rowfb_o = nxt("rowfb_o"); colfb_o = nxt("colfb_o")
        rowfr_o = nxt("rowfr_o"); colfr_o = nxt("colfr_o")
        # scratch
        C = nxt("C"); Cc = nxt("Cc")
        lvb = nxt("lvb"); lvbc = nxt("lvbc")
        qb = nxt("qb"); qbc = nxt("qbc")
        w32buf = nxt("w32buf"); dsem = nxt("dsem")

        t16b = t16[:].astype(jnp.bfloat16)
        t8b = t8[:].astype(jnp.bfloat16)
        t32b = t32[:].astype(jnp.bfloat16)
        rank4_i = rank4[:]
        qpl = qp_y[:]
        qpc2 = jnp.concatenate([qp_cb[:], qp_cr[:]])
        ones_l = jnp.ones((L,), i32)
        ones_2l = jnp.ones((2 * L,), i32)

        # ---- seed lane buffers from the frontier ----
        C[:, :, :] = jnp.zeros((L, CH_, CW_), i32)
        Cc[:, :, :] = jnp.zeros((2 * L, CHC, CWC), i32)
        for l in range(L):
            cxl = cx_s[l]
            cyl = cy_s[l]
            cx1 = jnp.minimum(cxl + 1, cw)

            def seed(buf, lane, rf, cf, nn):
                buf[lane, 0, 1:1 + nn] = rf[pl.ds(cxl, 1), :][0]
                buf[lane, 0, 1 + nn:1 + 2 * nn] = rf[pl.ds(cx1, 1), :][0]
                buf[lane, 1:1 + nn, 0] = cf[pl.ds(cyl, 1), :][0]

            seed(C, l, rowf, colf, ctb)
            seed(Cc, l, rowfb, colfb, ctbc)
            seed(Cc, L + l, rowfr, colfr, ctbc)
        # corners (gathered outside the kernel): all-lane [L, 1] writes
        C[:, 0, 0:1] = corn_y[:]
        Cc[0:L, 0, 0:1] = corn_cb[:]
        Cc[L:2 * L, 0, 0:1] = corn_cr[:]

        def refs_from_C(ref_buf, lx0, ly0, nsz, lanes):
            leftc = ref_buf[0:lanes, ly0:ly0 + 2 * nsz + 1, lx0]
            leftr = reverse_rows(leftc, 2 * nsz + 1)
            top = ref_buf[0:lanes, ly0, lx0 + 1:lx0 + 2 * nsz + 1]
            return jnp.concatenate([leftr, top], axis=1)

        qsv = qs_r[:]
        iqsv = iqs_r[:]

        def tq(pred, orig, qp, imask, n, tmat, lanes, lv_ref):
            """transform+quant+(sign hide)+dequant+recon; levels are
            left in lv_ref[:lanes, :n, :n]; returns rec."""
            resi = orig - pred
            coef = fwd_transform(resi, n, tmat, lanes)
            lv_ref[0:lanes, 0:n, 0:n] = quant_masked(coef, qp, imask, n,
                                                     lanes, qsv, iqsv)
            if sign_hide:
                sign_hide_apply(lv_ref, n, lanes, rank4_i)
            levels = lv_ref[0:lanes, 0:n, 0:n]
            dq = dequant(levels, qp, n, lanes, qsv, iqsv)
            r2 = inv_transform(dq, n, tmat, lanes)
            nzsum = jnp.abs(levels).sum(axis=2).sum(axis=1)
            has = lanes3(b2i(nzsum > 0), lanes, n, n) > 0
            rec = jnp.clip(jnp.where(has, pred + r2, pred), 0, maxv)
            return rec

        def predict16(refs_sub, modes, lanes):
            pred, _ = predict(refs_sub, modes, 16, True, w16, sh16[:],
                              ad16[:], fi16[:], lanes)
            return luma_post(pred, refs_sub, modes, 16, lanes)

        def predict_chroma(refs_sub, modes, n, Wn, shn, adn, lanes):
            pred, _ = predict(refs_sub, modes, n, False, Wn, shn, adn,
                              None, lanes)
            return pred

        def predict32_f(raw, av, m32m):
            ref = substitute(raw, av, 129)
            if not strong:
                pred, _ = predict(ref, m32m, 32, True, w32, sh32[:],
                                  ad32[:], fi32[:], L, w32buf, dsem)
                return pred
            # strong smoothing: both ref variants through ONE chunked
            # pass (2L lanes) so W32 is streamed once
            sref, scond = strong_smooth(ref, L)
            oh = onehot35(m32m, L)
            filt_flag = dot_hi(oh, fi32[:][:, None])[:, 0] > 0.5
            use_strong = scond & filt_flag
            ref_sel = jnp.where(use_strong[:, None], sref, ref)
            f121 = smooth121(ref_sel, 129)
            ref_ff = jnp.where(filt_flag[:, None], f121, ref_sel)
            refs2 = jnp.concatenate([ref_ff, ref_sel])
            oh2 = jnp.concatenate([oh, oh])
            pred2 = predict_core(refs2, oh2, 32, w32,
                                 sh32[:], ad32[:], 2 * L, w32buf, dsem)
            return jnp.where(lanes3(b2i(use_strong), L, 32, 32) > 0,
                             pred2[L:2 * L], pred2[0:L])

        for q in range(n_quads):
            qx, qy = quad_orig[q]
            m32m = m32v[q, :]
            o32 = unflat(o32y[q * L:(q + 1) * L], 32, L)
            pred32 = predict32_f(refs_from_C(C, qx, qy, 32, L),
                                 l32av[q * L:(q + 1) * L], m32m)
            rec32 = tq(pred32, o32, qpl, ones_l, 32, t32b, L, lvb)
            lv32 = lvb[0:L, 0:32, 0:32]
            lv32_o[q * L:(q + 1) * L, :] = flat(lv32, 32, L)
            # chroma 16 candidate
            raw2 = refs_from_C(Cc, qx // 2, qy // 2, 16, 2 * L)
            av2 = jnp.concatenate([c16av[q * L:(q + 1) * L]] * 2)
            refc = substitute(raw2, av2, 65)
            m32_2 = jnp.concatenate([m32m, m32m])
            predc = predict_chroma(refc, m32_2, 16, w16[:], sh16[:],
                                   ad16[:], 2 * L)
            oc32 = unflat(jnp.concatenate(
                [o16cb[q * L:(q + 1) * L],
                 o16cr[q * L:(q + 1) * L]]), 16, 2 * L)
            recc32 = tq(predc, oc32, qpc2, ones_2l, 16, t16b, 2 * L,
                        lvbc)
            lvc32 = lvbc[0:2 * L, 0:16, 0:16]
            lvc16_o[q * 2 * L:(q + 1) * 2 * L, :] = flat(lvc32, 16,
                                                         2 * L)
            if decide32:
                lam = lamv[:]
                sc = ssd(recc32, oc32)
                bc = level_bits(lvc32, 16, 2 * L)
                cost32 = (ssd(rec32, o32) + sc[:L] + sc[L:]
                          + lam * (level_bits(lv32, 32, L)
                                   + bc[:L] + bc[L:] + OVH32))
                cost16 = jnp.zeros((L,), f32)
                any_inter = jnp.zeros((L,), i32)
            slot_pred_list = []
            slot_predc_list = []
            for s in range(spq):
                i = q * spq + s
                sx, sy = qx + slot_orig[s][0], qy + slot_orig[s][1]
                modes = m16[i, :]
                ref = substitute(refs_from_C(C, sx, sy, 16, L),
                                 l16av[i * L:(i + 1) * L], 65)
                pred = predict16(ref, modes, L)
                if inter:
                    iv = ivv[i, :]
                    pred = jnp.where(lanes3(iv, L, 16, 16) > 0,
                                     unflat(ipy[i * L:(i + 1) * L],
                                            16, L), pred)
                    imask = 1 - iv
                else:
                    iv = None
                    imask = ones_l
                o16 = unflat(o16y[i * L:(i + 1) * L], 16, L)
                slot_pred_list.append(pred)
                rec = tq(pred, o16, qpl, imask, 16, t16b, L, lvb)
                lv = lvb[0:L, 0:16, 0:16]
                lv16_o[i * L:(i + 1) * L, :] = flat(lv, 16, L)
                # chroma 8
                raw2 = refs_from_C(Cc, sx // 2, sy // 2, 8, 2 * L)
                av2 = jnp.concatenate([c8av[i * L:(i + 1) * L]] * 2)
                refc = substitute(raw2, av2, 33)
                m2 = jnp.concatenate([modes, modes])
                predc = predict_chroma(refc, m2, 8, w8[:], sh8[:],
                                       ad8[:], 2 * L)
                if inter:
                    iv2 = jnp.concatenate([iv, iv])
                    ipc = unflat(jnp.concatenate(
                        [ipcb[i * L:(i + 1) * L],
                         ipcr[i * L:(i + 1) * L]]), 8, 2 * L)
                    predc = jnp.where(lanes3(iv2, 2 * L, 8, 8) > 0,
                                      ipc, predc)
                    imask2 = 1 - iv2
                else:
                    imask2 = ones_2l
                oc = unflat(jnp.concatenate(
                    [o8cb[i * L:(i + 1) * L],
                     o8cr[i * L:(i + 1) * L]]), 8, 2 * L)
                slot_predc_list.append(predc)
                recc = tq(predc, oc, qpc2, imask2, 8, t8b, 2 * L,
                          lvbc)
                lvc = lvbc[0:2 * L, 0:8, 0:8]
                lv8c_o[i * 2 * L:(i + 1) * 2 * L, :] = flat(lvc, 8,
                                                            2 * L)
                C[:, 1 + sy:1 + sy + 16, 1 + sx:1 + sx + 16] = rec
                Cc[:, 1 + sy // 2:1 + sy // 2 + 8,
                   1 + sx // 2:1 + sx // 2 + 8] = recc
                if decide32:
                    sc = ssd(recc, oc)
                    bc = level_bits(lvc, 8, 2 * L)
                    cost16 = cost16 + (
                        ssd(rec, o16) + sc[:L] + sc[L:]
                        + lam * (level_bits(lv, 16, L)
                                 + bc[:L] + bc[L:] + OVH16))
                    if inter:
                        any_inter = jnp.maximum(any_inter, iv)
            # ---- quadrant decision ----
            if decide32:
                u32 = (quad_okv[q, :] > 0) & (cost32 < cost16)
                if inter:
                    u32 = u32 & (any_inter == 0)
            else:
                u32 = use32v[q, :] > 0
            sel32 = u32
            if inter and decide32:
                # inter TU32 trial for uniform-motion quads
                qb[0:L, 0:16, 0:16] = slot_pred_list[0]
                qb[0:L, 0:16, 16:32] = slot_pred_list[1]
                qb[0:L, 16:32, 0:16] = slot_pred_list[2]
                qb[0:L, 16:32, 16:32] = slot_pred_list[3]
                ip32 = qb[0:L, 0:32, 0:32]
                qbc[0:2 * L, 0:8, 0:8] = slot_predc_list[0]
                qbc[0:2 * L, 0:8, 8:16] = slot_predc_list[1]
                qbc[0:2 * L, 8:16, 0:8] = slot_predc_list[2]
                qbc[0:2 * L, 8:16, 8:16] = slot_predc_list[3]
                ipc16 = qbc[0:2 * L, 0:16, 0:16]
                zl = jnp.zeros((L,), i32)
                rec32i = tq(ip32, o32, qpl, zl, 32, t32b, L, lvb)
                lv32i = lvb[0:L, 0:32, 0:32]
                recc16i = tq(ipc16, oc32, qpc2,
                             jnp.zeros((2 * L,), i32), 16, t16b, 2 * L,
                             lvbc)
                lvc16i = lvbc[0:2 * L, 0:16, 0:16]
                sci = ssd(recc16i, oc32)
                bci = level_bits(lvc16i, 16, 2 * L)
                c32i = (ssd(rec32i, o32) + sci[:L] + sci[L:]
                        + lam * (level_bits(lv32i, 32, L)
                                 + bci[:L] + bci[L:] + OVH32))
                tu32 = (m32inv[q, :] > 0) & (c32i < cost16)
                sel32 = u32 | tu32
                t1 = lanes3(b2i(tu32), L, 32, 32) > 0
                tu32i = b2i(tu32)
                t2 = lanes3(jnp.concatenate([tu32i, tu32i]),
                            2 * L, 16, 16) > 0
                lv32_prev = lv32_o[q * L:(q + 1) * L, :]
                lv32_o[q * L:(q + 1) * L, :] = jnp.where(
                    tu32i[:, None] > 0, flat(lv32i, 32, L), lv32_prev)
                lvc_prev = lvc16_o[q * 2 * L:(q + 1) * 2 * L, :]
                lvc16_o[q * 2 * L:(q + 1) * 2 * L, :] = jnp.where(
                    jnp.concatenate([tu32i, tu32i])[:, None] > 0,
                    flat(lvc16i, 16, 2 * L), lvc_prev)
                rec32 = jnp.where(t1, rec32i, rec32)
                recc32 = jnp.where(t2, recc16i, recc32)
            u32_o[q, :] = b2i(sel32)
            s3 = lanes3(b2i(sel32), L, 32, 32) > 0
            cur = C[:, 1 + qy:1 + qy + 32, 1 + qx:1 + qx + 32]
            C[:, 1 + qy:1 + qy + 32, 1 + qx:1 + qx + 32] = jnp.where(
                s3, rec32, cur)
            sel32i = b2i(sel32)
            s2c = lanes3(jnp.concatenate([sel32i, sel32i]),
                         2 * L, 16, 16) > 0
            qcx, qcy = qx // 2, qy // 2
            curc = Cc[:, 1 + qcy:1 + qcy + 16, 1 + qcx:1 + qcx + 16]
            Cc[:, 1 + qcy:1 + qcy + 16, 1 + qcx:1 + qcx + 16] = \
                jnp.where(s2c, recc32, curc)

        # ---- outputs: recon tiles + frontier ----
        inty_o[:, :] = flat(C[:, 1:1 + ctb, 1:1 + ctb], ctb, L)
        intc_o[:, :] = flat(Cc[:, 1:1 + ctbc, 1:1 + ctbc], ctbc, 2 * L)
        rowf_o[:, :] = rowf[:, :]
        colf_o[:, :] = colf[:, :]
        rowfb_o[:, :] = rowfb[:, :]
        colfb_o[:, :] = colfb[:, :]
        rowfr_o[:, :] = rowfr[:, :]
        colfr_o[:, :] = colfr[:, :]
        for l in range(L):
            cxl = cx_s[l]
            cyl = cy_s[l]

            def upd(buf, lane, rf_o, cf_o, nn):
                rf_o[pl.ds(cxl, 1), :] = buf[pl.ds(lane, 1), nn, 1:1 + nn]
                cf_o[pl.ds(cyl, 1), :] = buf[pl.ds(lane, 1), 1:1 + nn, nn]

            upd(C, l, rowf_o, colf_o, ctb)
            upd(Cc, l, rowfb_o, colfb_o, ctbc)
            upd(Cc, L + l, rowfr_o, colfr_o, ctbc)

    # ------------------------------------------------------------------
    # pallas_call wrapper = the lax.scan step
    # ------------------------------------------------------------------
    V = pl.BlockSpec(memory_space=pltpu.VMEM)
    S = pl.BlockSpec(memory_space=pltpu.SMEM)

    consts = dict(
        w16=jnp.asarray(W16T, jnp.bfloat16),
        w8=jnp.asarray(W8T, jnp.bfloat16),
        w32=jnp.asarray(W32T, jnp.bfloat16),
        t16=jnp.asarray(T16), t8=jnp.asarray(T8), t32=jnp.asarray(T32),
        sh16=jnp.asarray(SH16), ad16=jnp.asarray(AD16),
        fi16=jnp.asarray(FI16),
        sh8=jnp.asarray(SH8), ad8=jnp.asarray(AD8),
        sh32=jnp.asarray(SH32), ad32=jnp.asarray(AD32),
        fi32=jnp.asarray(FI32),
        rank4=jnp.asarray(RANK4),
        qs=jnp.asarray(QS), iqs=jnp.asarray(IQS),
    )

    def step(carry, xs):
        (rowf, colf, cornf, rowfb, colfb, cornfb,
         rowfr, colfr, cornfr) = carry

        def sm(a):          # slot-major [L, nslots, ...] -> [nslots*L, ...]
            return jnp.swapaxes(a, 0, 1).reshape(
                (a.shape[1] * a.shape[0],) + a.shape[2:])

        def smf(a):
            """slot-major + spatial-flatten: [L, ns, n, n] ->
            [ns*L, n*n] (narrow-minor VMEM blocks pad lanes to 128 —
            an 8x waste at n = 16 that OOMs the kernel at 1080p)."""
            b = sm(a)
            return b.reshape(b.shape[0], b.shape[1] * b.shape[2])

        cxv = xs["cx"]
        cyv = xs["cy"]
        par_in = (cyv - 1) & 1
        ins = dict(
            cx=cxv, cy=cyv,
            rowf=rowf, colf=colf,
            rowfb=rowfb, colfb=colfb,
            rowfr=rowfr, colfr=colfr,
            corn_y=cornf[cxv, par_in][:, None],
            corn_cb=cornfb[cxv, par_in][:, None],
            corn_cr=cornfr[cxv, par_in][:, None],
            m16=jnp.swapaxes(xs["m16"], 0, 1),
            qp_y=xs["qp_y"], qp_cb=xs["qp_cb"], qp_cr=xs["qp_cr"],
            o16y=smf(xs["o16y"]), o8cb=smf(xs["o8cb"]),
            o8cr=smf(xs["o8cr"]),
            l16av=sm(xs["l16_av"].astype(jnp.int32)),
            c8av=sm(xs["c8_av"].astype(jnp.int32)),
            **consts,
            o32y=smf(xs["o32y"]), o16cb=smf(xs["o16cb"]),
            o16cr=smf(xs["o16cr"]),
            m32=jnp.swapaxes(xs["m32"], 0, 1),
            l32av=sm(xs["l32_av"].astype(jnp.int32)),
            c16av=sm(xs["c16_av"].astype(jnp.int32)),
            quad_ok=jnp.swapaxes(xs["quad_ok"].astype(jnp.int32), 0, 1),
        )
        if decide32:
            ins["lam"] = xs["lam"]
        else:
            ins["use32"] = jnp.swapaxes(xs["use32"].astype(jnp.int32),
                                        0, 1)
        if inter:
            ins["iv"] = jnp.swapaxes(xs["inter"].astype(jnp.int32), 0, 1)
            ins["ipy"] = smf(xs["ipy"])
            ins["ipcb"] = smf(xs["ipcb"])
            ins["ipcr"] = smf(xs["ipcr"])
            if decide32:
                ins["m32in"] = jnp.swapaxes(
                    xs["m32_in"].astype(jnp.int32), 0, 1)

        order = ["cx", "cy", "rowf", "colf", "rowfb", "colfb",
                 "rowfr", "colfr", "corn_y", "corn_cb", "corn_cr",
                 "m16", "qp_y",
                 "qp_cb", "qp_cr", "o16y", "o8cb", "o8cr", "l16av",
                 "c8av", "w16", "w8", "w32", "t16", "t8", "t32",
                 "sh16", "ad16", "fi16", "sh8", "ad8", "sh32", "ad32",
                 "fi32", "rank4", "qs", "iqs", "o32y", "o16cb", "o16cr", "m32",
                 "l32av", "c16av", "quad_ok"]
        if decide32:
            order.append("lam")
        else:
            order.append("use32")
        if inter:
            order += ["iv", "ipy", "ipcb", "ipcr"]
            if decide32:
                order.append("m32in")
        arg_list = [ins[k] for k in order]
        A = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [S if k in ("cx", "cy") else (A if k == "w32" else V)
                    for k in order]

        out_shapes = [
            jax.ShapeDtypeStruct((nslots * L, 256), jnp.int32),
            jax.ShapeDtypeStruct((nslots * 2 * L, 64), jnp.int32),
            jax.ShapeDtypeStruct((n_quads * L, 1024), jnp.int32),
            jax.ShapeDtypeStruct((n_quads * 2 * L, 256), jnp.int32),
            jax.ShapeDtypeStruct((n_quads, L), jnp.int32),
            jax.ShapeDtypeStruct((L, ctb * ctb), jnp.int32),
            jax.ShapeDtypeStruct((2 * L, ctbc * ctbc), jnp.int32),
            jax.ShapeDtypeStruct(rowf.shape, jnp.int32),
            jax.ShapeDtypeStruct(colf.shape, jnp.int32),
            jax.ShapeDtypeStruct(rowfb.shape, jnp.int32),
            jax.ShapeDtypeStruct(colfb.shape, jnp.int32),
            jax.ShapeDtypeStruct(rowfr.shape, jnp.int32),
            jax.ShapeDtypeStruct(colfr.shape, jnp.int32),
        ]
        scratch = [
            pltpu.VMEM((L, CH_, CW_), jnp.int32),          # C
            pltpu.VMEM((2 * L, CHC, CWC), jnp.int32),      # Cc
            pltpu.VMEM((L, 32, 32), jnp.int32),            # lvb
            pltpu.VMEM((2 * L, 16, 16), jnp.int32),        # lvbc
            pltpu.VMEM((L, 32, 32), jnp.int32),            # qb
            pltpu.VMEM((2 * L, 16, 16), jnp.int32),        # qbc
            pltpu.VMEM((136, 7 * 1024), jnp.bfloat16),     # w32buf
            pltpu.SemaphoreType.DMA,                       # dsem
        ]
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=[V] * len(out_shapes),
            scratch_shapes=scratch,
            interpret=_use_interpret(),
        )(*arg_list)

        (lv16f, lv8cf, lv32f, lvc16f, u32m, inty, intc,
         rowf, colf, rowfb, colfb, rowfr, colfr) = outs
        # corner carry (parity-slotted) maintained outside the kernel:
        # the new corner IS the last element of the lane's bottom row
        cornf = cornf.at[cxv + 1, cyv & 1].set(rowf[cxv, ctb - 1])
        cornfb = cornfb.at[cxv + 1, cyv & 1].set(rowfb[cxv, ctbc - 1])
        cornfr = cornfr.at[cxv + 1, cyv & 1].set(rowfr[cxv, ctbc - 1])

        # ---- repackage ys exactly like the jnp step ----
        lv16_s = lv16f.reshape(nslots, L, 16, 16).astype(jnp.int16)
        lv8_s = lv8cf.reshape(nslots, 2 * L, 8, 8).astype(jnp.int16)
        lv32_s = lv32f.reshape(n_quads, L, 32, 32).astype(jnp.int16)
        lvc16_s = lvc16f.reshape(n_quads, 2 * L, 16, 16).astype(jnp.int16)
        u32_s = u32m.astype(bool)
        ys = (lv16_s, lv8_s, lv32_s, lvc16_s, u32_s, None,
              inty.reshape(L, ctb, ctb).astype(jnp.int16),
              intc.reshape(2 * L, ctbc, ctbc).astype(jnp.int16), None)
        carry = (rowf, colf, cornf, rowfb, colfb, cornfb,
                 rowfr, colfr, cornfr)
        return carry, ys

    return step
