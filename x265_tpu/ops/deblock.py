"""HEVC deblocking filter (ITU-T H.265 §8.7.2).

Reference embodiments: x265_1.9/source/common/deblock.cpp (encoder side)
and libde265/libde265/deblock.cc (decoder side).

TPU-native design: HEVC's deblocking is explicitly parallel-by-direction —
all vertical edges are independent (8-px spacing vs 4-px read / 3-px write
reach), then all horizontal edges run on the vertically-filtered output.
So the whole filter is two fully-vectorized passes over [n_edges, ...]
segment tensors; this numpy implementation is the spec oracle, the jnp
version (same math) is the device path.

Covers intra (BS 2 on TU/PU edges) and inter boundary-strength derivation
(MV-difference / reference-mismatch rules incl. the two-list B case,
x265_1.9/source/common/deblock.cpp:193 getBoundaryStrength).
"""

from __future__ import annotations

import numpy as np

# §8.7.2.5.3 Table 8-12: beta'(Q) and tc'(Q)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
     26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
     58, 60, 62, 64], dtype=np.int32)
TC_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
     4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24],
    dtype=np.int32)


def _clip3(lo, hi, v):
    return np.clip(v, lo, hi)


def luma_edge_filter(seg: np.ndarray, qp: int, bit_depth: int = 8,
                     beta_off: int = 0, tc_off: int = 0, bs: int = 2):
    """Filter a batch of 4-line luma edge segments.

    seg: [E, 4, 8] int32 — 4 lines perpendicular to the edge;
         columns 0..3 = p3..p0, 4..7 = q0..q3.
    Returns filtered copy (only p2..q2, i.e. cols 1..6, may change).
    """
    e = seg.shape[0]
    out = seg.copy()
    if e == 0:
        return out
    shift = bit_depth - 8
    # qp may be a scalar or a per-edge [E] array (cu_qp_delta: edge QP is
    # the average of the two adjacent CUs' QpY, §8.7.2.5.3)
    qb = _clip3(0, 51, np.asarray(qp) + beta_off * 2)
    qt = _clip3(0, 53, np.asarray(qp) + 2 * (bs - 1) + tc_off * 2)
    beta = BETA_TABLE[qb] << shift
    tc = TC_TABLE[qt] << shift
    if np.ndim(tc) == 0:
        beta = int(beta)
        tc = int(tc)
        if tc == 0 and beta == 0:
            return out
        tcl = tc                      # line-math (broadcasts over [E, 4])
    else:
        tcl = tc[:, None]
    p3, p2, p1, p0 = (seg[:, :, i].astype(np.int32) for i in range(4))
    q0, q1, q2, q3 = (seg[:, :, i].astype(np.int32) for i in range(4, 8))

    dp0 = np.abs(p2[:, 0] - 2 * p1[:, 0] + p0[:, 0])
    dp3 = np.abs(p2[:, 3] - 2 * p1[:, 3] + p0[:, 3])
    dq0 = np.abs(q2[:, 0] - 2 * q1[:, 0] + q0[:, 0])
    dq3 = np.abs(q2[:, 3] - 2 * q1[:, 3] + q0[:, 3])
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    dp = dp0 + dp3
    dq = dq0 + dq3
    d = dpq0 + dpq3
    filter_on = d < beta                                    # [E]

    # strong/weak decision (evaluated at lines 0 and 3)
    def strong_cond(i):
        return ((2 * (dpq0 if i == 0 else dpq3) < (beta >> 2))
                & (np.abs(p3[:, i] - p0[:, i]) + np.abs(q0[:, i] - q3[:, i])
                   < (beta >> 3))
                & (np.abs(p0[:, i] - q0[:, i]) < ((5 * tc + 1) >> 1)))

    strong = strong_cond(0) & strong_cond(3)                # [E]

    # ---- strong filter (all 4 lines) ----
    sp0 = _clip3(p0 - 2 * tcl, p0 + 2 * tcl,
                 (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = _clip3(p1 - 2 * tcl, p1 + 2 * tcl, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = _clip3(p2 - 2 * tcl, p2 + 2 * tcl,
                 (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = _clip3(q0 - 2 * tcl, q0 + 2 * tcl,
                 (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
    sq1 = _clip3(q1 - 2 * tcl, q1 + 2 * tcl, (p0 + q0 + q1 + q2 + 2) >> 2)
    sq2 = _clip3(q2 - 2 * tcl, q2 + 2 * tcl,
                 (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)

    # ---- weak filter ----
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = np.abs(delta) < tcl * 10                          # per line
    dlt = _clip3(-tcl, tcl, delta)
    maxval = (1 << bit_depth) - 1
    wp0 = _clip3(0, maxval, p0 + dlt)
    wq0 = _clip3(0, maxval, q0 - dlt)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp1 = (dp < side_thresh)[:, None]                       # [E,1]
    dEq1 = (dq < side_thresh)[:, None]
    tc2 = tcl >> 1
    dp1 = _clip3(-tc2, tc2, (((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1)
    dq1 = _clip3(-tc2, tc2, (((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1)
    wp1 = _clip3(0, maxval, p1 + dp1)
    wq1 = _clip3(0, maxval, q1 + dq1)

    on = filter_on[:, None]
    st = strong[:, None] & on
    wk = (~strong[:, None]) & on & w_on

    out[:, :, 1] = np.where(st, sp2, p2)
    out[:, :, 2] = np.where(st, sp1, np.where(wk & dEp1, wp1, p1))
    out[:, :, 3] = np.where(st, sp0, np.where(wk, wp0, p0))
    out[:, :, 4] = np.where(st, sq0, np.where(wk, wq0, q0))
    out[:, :, 5] = np.where(st, sq1, np.where(wk & dEq1, wq1, q1))
    out[:, :, 6] = np.where(st, sq2, q2)
    return out


def chroma_edge_filter(seg: np.ndarray, qp: int, bit_depth: int = 8,
                       tc_off: int = 0):
    """Filter a batch of 4-line chroma edge segments (BS=2 only).

    seg: [E, 4, 4] int32 — columns 0..1 = p1..p0, 2..3 = q0..q1.
    """
    out = seg.copy()
    if seg.shape[0] == 0:
        return out
    shift = bit_depth - 8
    qt = _clip3(0, 53, np.asarray(qp) + 2 + tc_off * 2)
    tc = TC_TABLE[qt] << shift
    if np.ndim(tc) == 0:
        tc = int(tc)
        if tc == 0:
            return out
    else:
        tc = tc[:, None]
    p1, p0, q0, q1 = (seg[:, :, i].astype(np.int32) for i in range(4))
    delta = _clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
    maxval = (1 << bit_depth) - 1
    out[:, :, 1] = _clip3(0, maxval, p0 + delta)
    out[:, :, 2] = _clip3(0, maxval, q0 - delta)
    return out


# ---------------------------------------------------------------------------
# picture-level driver (numpy oracle)
# ---------------------------------------------------------------------------

def deblock_plane_np(plane: np.ndarray, bs_v: np.ndarray,
                     bs_h: np.ndarray, qp: int, bit_depth: int = 8,
                     beta_off: int = 0, tc_off: int = 0, *,
                     chroma: bool = False) -> np.ndarray:
    """Apply deblocking to one plane.

    bs_v/bs_h: [h4, w4] uint8 boundary strength (0 = no edge) at 4-sample
    granularity of THIS plane, at the left/top side of each 4x4 segment.
    Grid restrictions (8-px) must already be applied by the caller.
    All vertical edges are filtered first (any BS), then all horizontal
    edges on the vertically-filtered output (§8.7.2 order).
    """
    h, w = plane.shape
    out = plane.astype(np.int32).copy()
    reach = 2 if chroma else 4
    # per-edge QP: pass (qp_v_map, qp_h_map) [h4, w4] arrays holding the
    # §8.7.2.5.3 (QpP + QpQ + 1) >> 1 average at each edge position
    qp_map = isinstance(qp, tuple)

    def run(mask, bs, horizontal):
        ys, xs = np.nonzero(mask)
        if horizontal:
            keep = (ys * 4 >= reach) & (ys * 4 + reach <= h)
        else:
            keep = (xs * 4 >= reach) & (xs * 4 + reach <= w)
        ys, xs = ys[keep], xs[keep]
        if not len(ys):
            return
        if horizontal:
            cols = (xs[:, None] * 4 + np.arange(4)[None, :])
            rows = (ys[:, None] * 4 - reach + np.arange(2 * reach)[None, :])
            idx = (rows[:, None, :], cols[:, :, None])
        else:
            rows = (ys[:, None] * 4 + np.arange(4)[None, :])
            cols = (xs[:, None] * 4 - reach + np.arange(2 * reach)[None, :])
            idx = (rows[:, :, None], cols[:, None, :])
        seg = out[idx]                                       # [E, 4, 2R]
        q = qp[1 if horizontal else 0][ys, xs] if qp_map else qp
        f = (chroma_edge_filter(seg, q, bit_depth, tc_off) if chroma
             else luma_edge_filter(seg, q, bit_depth, beta_off, tc_off,
                                   bs=bs))
        out[idx] = f

    for bs in (1, 2):
        run(bs_v == bs, bs, horizontal=False)
    for bs in (1, 2):
        run(bs_h == bs, bs, horizontal=True)
    return out.astype(plane.dtype)


def derive_edge_flags(ps):
    """TU/CU boundary flags + per-4x4 luma-cbf map at 4x4 luma granularity.

    edge_v[y4, x4] = vertical edge along the LEFT side of that 4x4 block;
    picture-boundary edges excluded (§8.7.2: not filtered).  cbf4 marks
    4x4 blocks whose containing luma TU has nonzero coefficients (used by
    the BS=1 derivation).  2Nx2N PUs: PU edges coincide with CU edges.
    """
    from ..common.recon import cu_leaves, tu_leaves

    g = ps.geom
    ev = np.zeros((g.h4, g.w4), bool)
    eh = np.zeros((g.h4, g.w4), bool)
    cbf4 = np.zeros((g.h4, g.w4), bool)
    for ctu in range(g.n_ctbs):
        for (cx, cy, log2_cb) in cu_leaves(ps, ctu):
            for (tx, ty, log2_tb, _d) in tu_leaves(ps, cx, cy, log2_cb):
                n4 = 1 << (log2_tb - 2)
                ty4, tx4 = ty >> 2, tx >> 2
                if tx > 0:
                    ev[ty4:ty4 + n4, tx4] = True
                if ty > 0:
                    eh[ty4, tx4:tx4 + n4] = True
                sz = 1 << log2_tb
                if np.any(ps.coeff_y[ty:ty + sz, tx:tx + sz]):
                    cbf4[ty4:ty4 + n4, tx4:tx4 + n4] = True
    return ev, eh, cbf4


def motion_bs_planes(ps):
    """Per-4x4 motion-comparison state for the BS derivation (§8.7.2.4):

    Returns (nmv, mva, mvb, poca, pocb) where nmv is 1/2, mva/mvb the
    (up to) two MVs with their reference POCs; uni-predicted blocks
    duplicate their single (mv, poc) into both slots.
    """
    d = np.where(ps.inter_dir == 0, 1, ps.inter_dir).astype(np.int32)
    pocs0 = np.asarray(ps.ref_pocs_l0 if len(ps.ref_pocs_l0) else [0],
                       np.int32)
    pocs1 = np.asarray(ps.ref_pocs_l1 if len(ps.ref_pocs_l1) else [0],
                       np.int32)
    poc_l0 = pocs0[np.minimum(ps.ref_idx0.astype(np.int32),
                              len(pocs0) - 1)]
    poc_l1 = pocs1[np.minimum(ps.ref_idx1.astype(np.int32),
                              len(pocs1) - 1)]
    mv0 = ps.mv0.astype(np.int32)
    mv1 = ps.mv1.astype(np.int32)
    nmv = np.where(d == 3, 2, 1)
    # slot A: L0 motion unless the block is uni-L1
    use_l1a = d == 2
    mva = np.where(use_l1a[..., None], mv1, mv0)
    poca = np.where(use_l1a, poc_l1, poc_l0)
    # slot B: L1 motion for bi, duplicate of A for uni
    mvb = np.where((d == 3)[..., None], mv1, mva)
    pocb = np.where(d == 3, poc_l1, poca)
    return nmv, mva, mvb, poca, pocb


def derive_bs(ps, ev, eh, cbf4):
    """Boundary strength per edge (§8.7.2.4): (bs_v, bs_h) uint8 arrays.

    2 = either side intra; 1 = nonzero luma coeffs in either TU, or
    motion mismatch: different MV count, different reference pictures,
    or any MV delta >= 1 luma sample (4 qpel) — with the both-orderings
    check when a bi block's two references are the same picture.
    """
    from ..cabac.ctu import MODE_INTRA as _INTRA

    intra4 = ps.pred_mode == _INTRA
    nmv, mva, mvb, poca, pocb = motion_bs_planes(ps)

    def ge4(a, b):
        return np.any(np.abs(a - b) >= 4, axis=-1)

    def bs_dir(edge, axis):
        p_intra = np.roll(intra4, 1, axis=axis)
        p_cbf = np.roll(cbf4, 1, axis=axis)
        pn = np.roll(nmv, 1, axis=axis)
        pmva = np.roll(mva, 1, axis=axis)
        pmvb = np.roll(mvb, 1, axis=axis)
        ppoca = np.roll(poca, 1, axis=axis)
        ppocb = np.roll(pocb, 1, axis=axis)
        # reference-picture set comparison (order-free)
        set_eq = (((poca == ppoca) & (pocb == ppocb))
                  | ((poca == ppocb) & (pocb == ppoca)))
        aligned = ge4(mva, pmva) | ge4(mvb, pmvb)
        crossed = ge4(mva, pmvb) | ge4(mvb, pmva)
        # when the two references differ, MVs pair by picture; when both
        # point at the same picture, BS=1 only if both orderings exceed
        same_pair = poca == pocb
        align_ok = np.where(
            poca == ppoca, aligned,
            np.where(poca == ppocb, crossed, True))
        bi_diff = np.where(same_pair, aligned & crossed, align_ok)
        mv_big = np.where(nmv != pn, True,
                          np.where(~set_eq, True, bi_diff))
        bs = np.where(intra4 | p_intra, 2,
                      np.where(cbf4 | p_cbf | mv_big, 1, 0)).astype(np.uint8)
        return np.where(edge, bs, 0).astype(np.uint8)

    return bs_dir(ev, axis=1), bs_dir(eh, axis=0)


def qp4_per_cu(ps) -> np.ndarray:
    """[h4, w4] per-4x4 QpY under cu_qp_delta (QG == CTB).

    Within a CTB, CUs preceding (z-order) the first coefficient-bearing
    CU have QpY = qPY_PRED (the previous CTB's actual QP, slice QP for
    the first); the first coded CU and all following CUs have the
    signaled QP (ps.qp_ctb).  Mirrors libde265's per-CU
    decode_quantization_parameters calls (transform.cc:31, slice.cc:4256).
    """
    from ..common.recon import cu_leaves

    g = ps.geom
    qp4 = np.zeros((g.h4, g.w4), np.int32)
    pred = ps.slice_qp
    for ctu in range(g.n_ctbs):
        q_ctb = int(ps.qp_ctb[ctu])
        delta_seen = False
        for (cx, cy, log2_cb) in cu_leaves(ps, ctu):
            sz = 1 << log2_cb
            if not delta_seen:
                if (np.any(ps.coeff_y[cy:cy + sz, cx:cx + sz])
                        or np.any(ps.coeff_cb[cy >> 1:(cy + sz) >> 1,
                                              cx >> 1:(cx + sz) >> 1])
                        or np.any(ps.coeff_cr[cy >> 1:(cy + sz) >> 1,
                                              cx >> 1:(cx + sz) >> 1])):
                    delta_seen = True
            q = q_ctb if delta_seen else pred
            qp4[cy >> 2:(cy + sz) >> 2, cx >> 2:(cx + sz) >> 2] = q
        pred = q_ctb
    return qp4


def _chroma_qp_arr(qp: np.ndarray, offset: int) -> np.ndarray:
    """Vectorized §8.6.1 chroma QP mapping (4:2:0) for per-edge QP maps."""
    from ..cabac.ctu import _CHROMA_QP_MAP
    qpi = np.clip(qp + offset, -12, 57)
    return np.where(qpi < 30, np.maximum(0, qpi),
                    np.where(qpi > 43, qpi - 6,
                             _CHROMA_QP_MAP[np.clip(qpi - 30, 0, 13)]))


def deblock_picture_np(ps, planes, qp_y: int, bit_depth: int = 8,
                       beta_off: int = 0, tc_off: int = 0,
                       cb_qp_offset: int = 0, cr_qp_offset: int = 0):
    """Deblock a reconstructed picture (any slice type).  ``planes`` are
    CODED-size (Y, Cb, Cr) views; returns new filtered planes (inputs
    untouched — intra prediction uses the unfiltered samples)."""
    from ..cabac.ctu import chroma_qp

    ev, eh, cbf4 = derive_edge_flags(ps)
    bs_v, bs_h = derive_bs(ps, ev, eh, cbf4)
    # luma: 8-px grid
    lv, lh = bs_v.copy(), bs_h.copy()
    lv[:, 1::2] = 0
    lh[1::2, :] = 0
    if ps.cu_qp_delta_enabled:
        # per-4x4 QpY (§8.6.1 as embodied by libde265 transform.cc:31):
        # CUs decoded BEFORE the QG's cu_qp_delta keep the predicted QP
        # (CuQpDeltaVal still 0 at their decode), the delta-carrying CU
        # and everything after get the signaled QP.  qp_ctb holds the
        # QG's final (actual) QP; pred = previous QG's actual QP.
        g = ps.geom
        qp4_full = qp4_per_cu(ps)
        h4, w4 = planes[0].shape[0] >> 2, planes[0].shape[1] >> 2
        qp4 = qp4_full[:h4, :w4]
        qv = (np.roll(qp4, 1, axis=1) + qp4 + 1) >> 1
        qh = (np.roll(qp4, 1, axis=0) + qp4 + 1) >> 1
        qp_l = (qv, qh)
        cqv = _chroma_qp_arr(qv[::2, ::2], cb_qp_offset)
        cqh = _chroma_qp_arr(qh[::2, ::2], cb_qp_offset)
        qp_cb = (cqv, cqh)
        qp_cr = (_chroma_qp_arr(qv[::2, ::2], cr_qp_offset),
                 _chroma_qp_arr(qh[::2, ::2], cr_qp_offset))
    else:
        qp_l = qp_y
        qp_cb = chroma_qp(qp_y, cb_qp_offset)
        qp_cr = chroma_qp(qp_y, cr_qp_offset)
    y = deblock_plane_np(planes[0], lv, lh, qp_l, bit_depth, beta_off,
                         tc_off)
    # chroma (4:2:0): 16-luma-px (8-chroma-px) grid, BS==2 only
    h4c, w4c = ev.shape[0] // 2, ev.shape[1] // 2
    cv = np.zeros((h4c, w4c), np.uint8)
    ch = np.zeros((h4c, w4c), np.uint8)
    cv[:, 0::2] = np.where(bs_v[::2, 0::4] == 2, 2, 0)
    ch[0::2, :] = np.where(bs_h[0::4, ::2] == 2, 2, 0)
    cb = deblock_plane_np(planes[1], cv, ch, qp_cb, bit_depth,
                          tc_off=tc_off, chroma=True)
    cr = deblock_plane_np(planes[2], cv, ch, qp_cr, bit_depth,
                          tc_off=tc_off, chroma=True)
    return y, cb, cr


# backward-compatible name (I-slice pictures derive BS=2 automatically)
deblock_intra_picture_np = deblock_picture_np


# ---------------------------------------------------------------------------
# device (jnp) path — same math, whole-plane regular tiling
# ---------------------------------------------------------------------------
# The 8-px deblocking grid makes every vertical edge's read window
# [8k-4, 8k+4) tile the plane exactly (stride == width), so the whole
# vertical pass is reshape -> batched segment filter -> reshape, with NO
# gathers; the horizontal pass runs the same on the transposed output.
# This replaces the reference's per-CTU loop (x265_1.9
# source/common/deblock.cpp deblockCTU) with two dense device passes.

def _luma_seg_filter_jnp(seg, bs, qp, bit_depth, beta_off, tc_off):
    """seg: [E, 4, 8] int32; bs: [E] int32 (0 = skip).  Returns [E, 4, 8]."""
    import jax.numpy as jnp

    from ._util import take_small

    shift = bit_depth - 8
    qb = jnp.clip(qp + beta_off * 2, 0, 51)
    qt = jnp.clip(qp + 2 * (bs - 1) + tc_off * 2, 0, 53)
    if getattr(qb, "ndim", 0) == 0:
        beta = (jnp.asarray(BETA_TABLE)[qb] << shift)
    else:
        beta = (take_small(BETA_TABLE, qb) << shift)
    tc = (take_small(TC_TABLE, qt) << shift)
    if beta.ndim == 0:
        beta = jnp.broadcast_to(beta, bs.shape)
    beta = beta[:, None]
    tc = tc[:, None]

    p3, p2, p1, p0 = (seg[:, :, i] for i in range(4))
    q0, q1, q2, q3 = (seg[:, :, i] for i in range(4, 8))

    dp0 = jnp.abs(p2[:, 0] - 2 * p1[:, 0] + p0[:, 0])
    dp3 = jnp.abs(p2[:, 3] - 2 * p1[:, 3] + p0[:, 3])
    dq0 = jnp.abs(q2[:, 0] - 2 * q1[:, 0] + q0[:, 0])
    dq3 = jnp.abs(q2[:, 3] - 2 * q1[:, 3] + q0[:, 3])
    dpq0, dpq3 = dp0 + dq0, dp3 + dq3
    dp, dq = dp0 + dp3, dq0 + dq3
    d = dpq0 + dpq3
    b1 = beta[:, 0]
    t1 = tc[:, 0]
    filter_on = (d < b1) & (bs > 0) & (t1 > 0)

    def strong_cond(dpq, i):
        return ((2 * dpq < (b1 >> 2))
                & (jnp.abs(p3[:, i] - p0[:, i])
                   + jnp.abs(q0[:, i] - q3[:, i]) < (b1 >> 3))
                & (jnp.abs(p0[:, i] - q0[:, i]) < ((5 * t1 + 1) >> 1)))

    strong = strong_cond(dpq0, 0) & strong_cond(dpq3, 3)

    c3 = lambda lo, hi, v: jnp.clip(v, lo, hi)  # noqa: E731
    sp0 = c3(p0 - 2 * tc, p0 + 2 * tc,
             (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = c3(p1 - 2 * tc, p1 + 2 * tc, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = c3(p2 - 2 * tc, p2 + 2 * tc,
             (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = c3(q0 - 2 * tc, q0 + 2 * tc,
             (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
    sq1 = c3(q1 - 2 * tc, q1 + 2 * tc, (p0 + q0 + q1 + q2 + 2) >> 2)
    sq2 = c3(q2 - 2 * tc, q2 + 2 * tc,
             (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = jnp.abs(delta) < tc * 10
    dlt = jnp.clip(delta, -tc, tc)
    maxval = (1 << bit_depth) - 1
    wp0 = jnp.clip(p0 + dlt, 0, maxval)
    wq0 = jnp.clip(q0 - dlt, 0, maxval)
    side_thresh = (b1 + (b1 >> 1)) >> 3
    dEp1 = (dp < side_thresh)[:, None]
    dEq1 = (dq < side_thresh)[:, None]
    tc2 = tc >> 1
    dp1 = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tc2, tc2)
    dq1 = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dp1, 0, maxval)
    wq1 = jnp.clip(q1 + dq1, 0, maxval)

    on = filter_on[:, None]
    st = strong[:, None] & on
    wk = (~strong[:, None]) & on & w_on

    out = seg
    out = out.at[:, :, 1].set(jnp.where(st, sp2, p2))
    out = out.at[:, :, 2].set(
        jnp.where(st, sp1, jnp.where(wk & dEp1, wp1, p1)))
    out = out.at[:, :, 3].set(jnp.where(st, sp0, jnp.where(wk, wp0, p0)))
    out = out.at[:, :, 4].set(jnp.where(st, sq0, jnp.where(wk, wq0, q0)))
    out = out.at[:, :, 5].set(
        jnp.where(st, sq1, jnp.where(wk & dEq1, wq1, q1)))
    out = out.at[:, :, 6].set(jnp.where(st, sq2, q2))
    return out


def _chroma_seg_filter_jnp(seg, bs, qp, bit_depth, tc_off):
    """seg: [E, 4, 4] int32 (p1 p0 q0 q1); bs: [E] (2 filters)."""
    import jax.numpy as jnp

    from ._util import take_small

    shift = bit_depth - 8
    qt = jnp.clip(qp + 2 + tc_off * 2, 0, 53)
    if getattr(qt, "ndim", 0) == 0:
        tc = (jnp.asarray(TC_TABLE)[qt] << shift)
    else:
        tc = (take_small(TC_TABLE, qt) << shift)
    tc = jnp.where(bs == 2, tc, 0)[:, None]
    p1, p0, q0, q1 = (seg[:, :, i] for i in range(4))
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    maxval = (1 << bit_depth) - 1
    out = seg
    out = out.at[:, :, 1].set(jnp.clip(p0 + delta, 0, maxval))
    out = out.at[:, :, 2].set(jnp.clip(q0 - delta, 0, maxval))
    return out


def _deblock_dir_jnp(plane, bs_edge, qp, bit_depth, beta_off, tc_off,
                     chroma):
    """One direction (vertical edges) over the whole plane.

    plane: [H, W] int32; bs_edge: [H//4, nk] per-edge BS for edges at
    x = 8(k+1).  Returns the filtered plane.
    """
    import jax.numpy as jnp

    H, W = plane.shape
    G = 8
    R = 2 if chroma else 4
    nk = W // G - 1
    if nk < 1:
        return plane
    x0 = G - R
    span = plane[:, x0:x0 + nk * G]
    win = span.reshape(H, nk, G)
    seg = win.reshape(H // 4, 4, nk, G).transpose(0, 2, 1, 3).reshape(
        -1, 4, G)
    bs = bs_edge.reshape(-1)
    if getattr(qp, "ndim", 0) == 2:      # per-edge QP map [H//4, nk]
        qp = qp.reshape(-1)
    f = (_chroma_seg_filter_jnp(seg[:, :, :2 * R], bs, qp, bit_depth,
                                tc_off) if chroma
         else _luma_seg_filter_jnp(seg, bs, qp, bit_depth, beta_off,
                                   tc_off))
    seg = seg.at[:, :, :2 * R].set(f) if chroma else f
    win = seg.reshape(H // 4, nk, 4, G).transpose(0, 2, 1, 3).reshape(
        H, nk * G)
    return plane.at[:, x0:x0 + nk * G].set(win)


def deblock_plane_jnp(plane, bs_v, bs_h, qp, bit_depth=8, beta_off=0,
                      tc_off=0, *, chroma=False):
    """Device deblocking of one plane (both directions, §8.7.2 order).

    plane [H, W] int32; bs_v/bs_h [H//4, W//4] BS at 4-granularity with
    grid restrictions and picture-boundary masking already applied (same
    contract as deblock_plane_np).
    """
    import jax.numpy as jnp

    H, W = plane.shape
    nkv = W // 8 - 1
    nkh = H // 8 - 1
    # per-edge QP maps: qp = (qp_v, qp_h) [H//4, W//4] (§8.7.2.5.3 P/Q avg)
    per_edge = isinstance(qp, tuple)
    # per-edge BS: edge k at x = 8(k+1) -> bs at x4 = 2(k+1)
    if nkv >= 1:
        bsv = bs_v[:, 2::2][:, :nkv]
        q = qp[0][:, 2::2][:, :nkv] if per_edge else qp
        plane = _deblock_dir_jnp(plane, bsv, q, bit_depth, beta_off,
                                 tc_off, chroma)
    if nkh >= 1:
        bsh = bs_h[2::2, :][:nkh].T
        q = qp[1][2::2, :][:nkh].T if per_edge else qp
        plane = _deblock_dir_jnp(plane.T, bsh, q, bit_depth, beta_off,
                                 tc_off, chroma).T
    return plane


def edge_masks_np(geom, log2_ctb: int):
    """Static 16-grid TU edge masks over the PADDED plane, with picture
    (coded-size) boundary edges excluded.  [h4p, w4p] bool x2 + a mask of
    4x4 units inside the coded picture (for BS gating)."""
    ph = geom.ctbs_h << log2_ctb
    pw = geom.ctbs_w << log2_ctb
    h4p, w4p = ph // 4, pw // 4
    x4 = np.arange(w4p)[None, :]
    y4 = np.arange(h4p)[:, None]
    inside = (x4 * 4 < geom.width) & (y4 * 4 < geom.height)
    ev = (x4 % 4 == 0) & (x4 > 0) & inside
    eh = (y4 % 4 == 0) & (y4 > 0) & inside
    return (np.broadcast_to(ev, (h4p, w4p)).copy(),
            np.broadcast_to(eh, (h4p, w4p)).copy(),
            np.broadcast_to(inside, (h4p, w4p)).copy())


def deblock_picture_jnp(planes, intra4, cbf4, mv4, use32, static_masks,
                        qp_y, qp_cb, qp_cr, bit_depth=8, beta_off=0,
                        tc_off=0, motion_b=None):
    """Device deblocking of a whole reconstructed picture (padded planes).

    planes: (Y [PH, PW], Cb, Cr) int32; intra4/cbf4 [h4p, w4p] bool;
    mv4 [h4p, w4p, 2] int32 qpel; use32 [PH//32, PW//32] bool or None;
    static_masks from edge_masks_np.  qps are Python ints or traced
    scalars (beta/tc lookup domain 0..53).  Mirrors deblock_picture_np.

    motion_b (B slices): (nmv, mva, mvb, poca, pocb) per-4x4 planes as in
    motion_bs_planes; when None, single-list L0 comparison (P slices).
    """
    import jax.numpy as jnp

    ev0, eh0, inside = (jnp.asarray(m) for m in static_masks)
    h4p, w4p = ev0.shape
    if use32 is not None:
        u4 = jnp.repeat(jnp.repeat(use32, 8, 0), 8, 1)
        x4 = jnp.arange(w4p)[None, :]
        y4 = jnp.arange(h4p)[:, None]
        ev = ev0 & ~(u4 & (x4 % 8 == 4))
        eh = eh0 & ~(u4 & (y4 % 8 == 4))
    else:
        ev, eh = ev0, eh0

    mv = mv4.astype(jnp.int32)

    def ge4(a, b):
        return jnp.any(jnp.abs(a - b) >= 4, axis=-1)

    def bs_dir(edge, axis):
        p_intra = jnp.roll(intra4, 1, axis=axis)
        p_cbf = jnp.roll(cbf4, 1, axis=axis)
        if motion_b is None:
            mv_big = ge4(mv, jnp.roll(mv, 1, axis=axis))
        else:
            nmv, mva, mvb, poca, pocb = motion_b
            pn = jnp.roll(nmv, 1, axis=axis)
            pmva = jnp.roll(mva, 1, axis=axis)
            pmvb = jnp.roll(mvb, 1, axis=axis)
            ppoca = jnp.roll(poca, 1, axis=axis)
            ppocb = jnp.roll(pocb, 1, axis=axis)
            set_eq = (((poca == ppoca) & (pocb == ppocb))
                      | ((poca == ppocb) & (pocb == ppoca)))
            aligned = ge4(mva, pmva) | ge4(mvb, pmvb)
            crossed = ge4(mva, pmvb) | ge4(mvb, pmva)
            align_ok = jnp.where(
                poca == ppoca, aligned,
                jnp.where(poca == ppocb, crossed, True))
            bi_diff = jnp.where(poca == pocb, aligned & crossed, align_ok)
            mv_big = jnp.where(nmv != pn, True,
                               jnp.where(~set_eq, True, bi_diff))
        bs = jnp.where(intra4 | p_intra, 2,
                       jnp.where(cbf4 | p_cbf | mv_big, 1, 0))
        return jnp.where(edge, bs, 0).astype(jnp.int32)

    bs_v = bs_dir(ev, axis=1)
    bs_h = bs_dir(eh, axis=0)
    # luma 8-px grid restriction (edges only on even 4-cols by
    # construction, but keep parity with the numpy contract)
    y = deblock_plane_jnp(planes[0].astype(jnp.int32), bs_v, bs_h, qp_y,
                          bit_depth, beta_off, tc_off)
    # chroma: 16-luma-px grid, BS==2 only
    h4c, w4c = h4p // 2, w4p // 2
    cv = jnp.zeros((h4c, w4c), jnp.int32)
    ch = jnp.zeros((h4c, w4c), jnp.int32)
    cv = cv.at[:, 0::2].set(jnp.where(bs_v[::2, 0::4] == 2, 2, 0))
    ch = ch.at[0::2, :].set(jnp.where(bs_h[0::4, ::2] == 2, 2, 0))
    cb = deblock_plane_jnp(planes[1].astype(jnp.int32), cv, ch, qp_cb,
                           bit_depth, tc_off=tc_off, chroma=True)
    cr = deblock_plane_jnp(planes[2].astype(jnp.int32), cv, ch, qp_cr,
                           bit_depth, tc_off=tc_off, chroma=True)
    return y, cb, cr
