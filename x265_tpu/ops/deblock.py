"""HEVC deblocking filter (ITU-T H.265 §8.7.2).

Reference embodiments: x265_1.9/source/common/deblock.cpp (encoder side)
and libde265/libde265/deblock.cc (decoder side).

TPU-native design: HEVC's deblocking is explicitly parallel-by-direction —
all vertical edges are independent (8-px spacing vs 4-px read / 3-px write
reach), then all horizontal edges run on the vertically-filtered output.
So the whole filter is two fully-vectorized passes over [n_edges, ...]
segment tensors; this numpy implementation is the spec oracle, the jnp
version (same math) is the device path.

Intra-only for now: every TU/PU edge has boundary strength 2.  BS derivation
for inter (MV/ref comparisons) lands with the inter path.
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
    qb = _clip3(0, 51, qp + beta_off * 2)
    qt = _clip3(0, 53, qp + 2 * (bs - 1) + tc_off * 2)
    beta = int(BETA_TABLE[qb]) << shift
    tc = int(TC_TABLE[qt]) << shift
    if tc == 0 and beta == 0:
        return out
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
    sp0 = _clip3(p0 - 2 * tc, p0 + 2 * tc,
                 (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = _clip3(p1 - 2 * tc, p1 + 2 * tc, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = _clip3(p2 - 2 * tc, p2 + 2 * tc,
                 (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = _clip3(q0 - 2 * tc, q0 + 2 * tc,
                 (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
    sq1 = _clip3(q1 - 2 * tc, q1 + 2 * tc, (p0 + q0 + q1 + q2 + 2) >> 2)
    sq2 = _clip3(q2 - 2 * tc, q2 + 2 * tc,
                 (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)

    # ---- weak filter ----
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = np.abs(delta) < tc * 10                           # per line
    dlt = _clip3(-tc, tc, delta)
    maxval = (1 << bit_depth) - 1
    wp0 = _clip3(0, maxval, p0 + dlt)
    wq0 = _clip3(0, maxval, q0 - dlt)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp1 = (dp < side_thresh)[:, None]                       # [E,1]
    dEq1 = (dq < side_thresh)[:, None]
    tc2 = tc >> 1
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
    qt = _clip3(0, 53, qp + 2 + tc_off * 2)
    tc = int(TC_TABLE[qt]) << shift
    if tc == 0:
        return out
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
        f = (chroma_edge_filter(seg, qp, bit_depth, tc_off) if chroma
             else luma_edge_filter(seg, qp, bit_depth, beta_off, tc_off,
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


def derive_bs(ps, ev, eh, cbf4):
    """Boundary strength per edge (§8.7.2.4): (bs_v, bs_h) uint8 arrays.

    2 = either side intra; 1 = nonzero luma coeffs in either TU, or MV delta
    >= 1 luma sample (4 qpel); 0 = no filtering.  Single-ref L0 only.
    """
    from ..cabac.ctu import MODE_INTRA as _INTRA

    intra4 = ps.pred_mode == _INTRA
    mv = ps.mv0.astype(np.int32)

    def bs_dir(edge, axis):
        p_intra = np.roll(intra4, 1, axis=axis)
        p_cbf = np.roll(cbf4, 1, axis=axis)
        p_mv = np.roll(mv, 1, axis=axis)
        mv_big = np.any(np.abs(mv - p_mv) >= 4, axis=-1)
        bs = np.where(intra4 | p_intra, 2,
                      np.where(cbf4 | p_cbf | mv_big, 1, 0)).astype(np.uint8)
        return np.where(edge, bs, 0).astype(np.uint8)

    return bs_dir(ev, axis=1), bs_dir(eh, axis=0)


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
    y = deblock_plane_np(planes[0], lv, lh, qp_y, bit_depth, beta_off,
                         tc_off)
    # chroma (4:2:0): 16-luma-px (8-chroma-px) grid, BS==2 only
    h4c, w4c = ev.shape[0] // 2, ev.shape[1] // 2
    cv = np.zeros((h4c, w4c), np.uint8)
    ch = np.zeros((h4c, w4c), np.uint8)
    cv[:, 0::2] = np.where(bs_v[::2, 0::4] == 2, 2, 0)
    ch[0::2, :] = np.where(bs_h[0::4, ::2] == 2, 2, 0)
    qp_cb = chroma_qp(qp_y, cb_qp_offset)
    qp_cr = chroma_qp(qp_y, cr_qp_offset)
    cb = deblock_plane_np(planes[1], cv, ch, qp_cb, bit_depth,
                          tc_off=tc_off, chroma=True)
    cr = deblock_plane_np(planes[2], cv, ch, qp_cr, bit_depth,
                          tc_off=tc_off, chroma=True)
    return y, cb, cr


# backward-compatible name (I-slice pictures derive BS=2 automatically)
deblock_intra_picture_np = deblock_picture_np
