"""CTU-level device wavefront reconstruction (all planes, one lax.scan).

Round-2 replacement for the per-16x16-block wavefront (encoder/wavefront.py).
The closed-loop intra dependency is scheduled at CTU granularity: CTU
(cx, cy) depends only on its left and top-right CTUs (classic WPP order,
x265_1.9/source/encoder/frameencoder.cpp WPP rows; libde265 thread tasks),
so the scan runs ``ctbs_w + 2*(ctbs_h-1)`` levels — ~62 at 1080p/64 vs the
~530 z-scan levels of the 16x16 schedule — with every CTU of a diagonal as
one batched lane.  Inside a lane the CTU's TU structure is an UNROLLED
z-order stage sequence inside the scan body (no per-stage dispatch):

  per 32x32 quadrant (z-order):
    * a 32x32-TU intra candidate (for CUs chosen as 32x32 by the RD
      decision pass), then
    * four 16x16 slots (z-order): intra 16x16 TU or inter-pred override,
    * a masked overwrite of the quadrant with the 32x32 recon (use32).
  chroma mirrors the structure at half size (16x16-TU quadrant vs four
  8x8 slots) with Cb and Cr as paired lanes in the same stages.

All three planes live in ONE flat carry buffer; gather/scatter index and
availability tables (normative §6.4.1 z-scan availability) are static per
geometry and streamed per level through the scan's xs.  QPs are per-CTU
arrays (AQ/cu_qp_delta ready).  Output is bit-exact with the numpy spec
path (common/recon.py) — asserted by tests/test_ctu_scan.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..common.geometry import PictureGeometry, intra_neighbor_coords
from .wavefront import _predict_lanes, _substitute

STRONG_THRESH_SHIFT = 5   # §8.4.4.2.3: 1 << (BitDepth - 5)


@functools.lru_cache(maxsize=8)
def build_ctu_tables(width: int, height: int, log2_ctb: int):
    """Static schedule + gather/scatter tables for the CTU wavefront.

    Returns a dict of numpy arrays (see code for keys).  The flat device
    buffer layout is [luma (ph*pw) | cb (cph*cpw) | cr | 1 dummy slot].
    """
    g = PictureGeometry(width, height, log2_ctb, 3)
    ctb = 1 << log2_ctb
    cw, ch = g.ctbs_w, g.ctbs_h
    nctb = g.n_ctbs
    ph, pw = ch * ctb, cw * ctb
    cph, cpw = ph // 2, pw // 2
    lsize = ph * pw
    csize = cph * cpw
    flat_size = lsize + 2 * csize + 1          # +1 dummy slot
    drop = flat_size                            # scatter base -> all dropped

    # WPP levelization: lvl = cx + 2*cy
    lvl = np.add.outer(2 * np.arange(ch), np.arange(cw))
    n_levels = int(lvl.max()) + 1
    counts = np.bincount(lvl.ravel(), minlength=n_levels)
    lmax = int(counts.max())
    lvl_ctu = np.full((n_levels, lmax), nctb, np.int32)
    fill = np.zeros(n_levels, np.int32)
    for cy in range(ch):
        for cx in range(cw):
            li = int(lvl[cy, cx])
            lvl_ctu[li, fill[li]] = cy * cw + cx
            fill[li] += 1

    n_quads = max(1, (ctb // 32) ** 2)          # 32x32 quadrants per CTU
    slots_per_quad = (min(ctb, 32) // 16) ** 2  # 16x16 slots per quadrant
    nslots = n_quads * slots_per_quad
    has32 = ctb >= 32

    # z-order origins of quadrants within the CTU and slots within quadrant
    def z_origins(count, size):
        out = []
        for i in range(count):
            x = ((i & 1) | ((i >> 1) & 2)) * size
            y = (((i >> 1) & 1) | ((i >> 2) & 2)) * size
            out.append((x, y))
        return out

    quad_orig = z_origins(n_quads, 32) if has32 else [(0, 0)]
    slot_orig = z_origins(slots_per_quad, 16)

    gw16 = pw // 16
    b16_n = (ph // 16) * gw16                  # 16-grid block count
    gw32 = pw // 32 if has32 else 1
    b32_n = (ph // 32) * gw32 if has32 else 1

    # per-(ctu, slot/quad) tables; extra dummy row at index nctb
    b16 = np.full((nctb + 1, nslots), b16_n, np.int32)
    b32 = np.full((nctb + 1, n_quads), b32_n, np.int32)
    l16_ri = np.zeros((nctb + 1, nslots, 65), np.int32)
    l16_av = np.zeros((nctb + 1, nslots, 65), bool)
    c8_ri = np.zeros((nctb + 1, nslots, 33), np.int32)
    c8_av = np.zeros((nctb + 1, nslots, 33), bool)
    l16_base = np.full((nctb + 1, nslots), drop, np.int32)
    c8_base = np.full((nctb + 1, nslots), drop, np.int32)
    l32_ri = np.zeros((nctb + 1, n_quads, 129), np.int32)
    l32_av = np.zeros((nctb + 1, n_quads, 129), bool)
    c16_ri = np.zeros((nctb + 1, n_quads, 65), np.int32)
    c16_av = np.zeros((nctb + 1, n_quads, 65), bool)
    # quadrants fully inside the coded picture (32x32 CU legal there)
    quad_ok = np.zeros((nctb + 1, n_quads), bool)

    def luma_tab(x0, y0, n):
        xs, ys = intra_neighbor_coords(x0, y0, n)
        av = g.avail_rows(x0, y0, xs, ys)
        ri = (np.clip(ys, 0, ph - 1) * pw + np.clip(xs, 0, pw - 1))
        return ri.astype(np.int32), av

    def chroma_tab(x0c, y0c, n):
        xs, ys = intra_neighbor_coords(x0c, y0c, n)
        av = g.avail_rows(x0c << 1, y0c << 1, xs << 1, ys << 1)
        ri = lsize + (np.clip(ys, 0, cph - 1) * cpw
                      + np.clip(xs, 0, cpw - 1))
        return ri.astype(np.int32), av

    for c in range(nctb):
        ox, oy = g.ctu_origin(c)
        for q, (qx, qy) in enumerate(quad_orig):
            if has32:
                x0, y0 = ox + qx, oy + qy
                if x0 < g.width and y0 < g.height:
                    l32_ri[c, q], l32_av[c, q] = luma_tab(x0, y0, 32)
                    c16_ri[c, q], c16_av[c, q] = chroma_tab(
                        x0 >> 1, y0 >> 1, 16)
                    quad_ok[c, q] = (x0 + 32 <= g.width
                                     and y0 + 32 <= g.height)
            for s, (sx, sy) in enumerate(slot_orig):
                i = q * slots_per_quad + s
                x0, y0 = ox + qx + sx, oy + qy + sy
                if x0 >= g.width or y0 >= g.height:
                    continue       # out-of-picture slot: dummy/drop entries
                b16[c, i] = (y0 // 16) * gw16 + (x0 // 16)
                l16_ri[c, i], l16_av[c, i] = luma_tab(x0, y0, 16)
                c8_ri[c, i], c8_av[c, i] = chroma_tab(x0 >> 1, y0 >> 1, 8)
                l16_base[c, i] = y0 * pw + x0
                c8_base[c, i] = lsize + (y0 >> 1) * cpw + (x0 >> 1)
        if has32:
            for q, (qx, qy) in enumerate(quad_orig):
                x0, y0 = ox + qx, oy + qy
                if x0 < g.width and y0 < g.height:
                    b32[c, q] = (y0 // 32) * gw32 + (x0 // 32)

    # stream per-level slices through the scan
    def per_level(a):
        return a[lvl_ctu]            # [n_levels, lmax, ...]

    # per-level CTU grid coordinates (dummy lanes -> garbage frontier
    # slots: cx = cw reads/writes the spare rowf row, cy = ch likewise)
    cxs_t = np.full((n_levels, lmax), cw, np.int32)
    cys_t = np.full((n_levels, lmax), ch, np.int32)
    for li in range(n_levels):
        for k in range(lmax):
            c = lvl_ctu[li, k]
            if c < nctb:
                cxs_t[li, k] = c % cw
                cys_t[li, k] = c // cw

    return dict(
        geom=g, n_levels=n_levels, lmax=lmax, nctb=nctb,
        plane=(ph, pw), cplane=(cph, cpw), flat_size=flat_size,
        lsize=lsize, csize=csize, has32=has32,
        n_quads=n_quads, slots_per_quad=slots_per_quad, nslots=nslots,
        b16_n=b16_n, b32_n=b32_n, quad_ok=quad_ok[:nctb],
        xs=dict(ctu=lvl_ctu, cx=cxs_t, cy=cys_t,
                b16=per_level(b16), b32=per_level(b32),
                l16_av=per_level(l16_av),
                c8_av=per_level(c8_av),
                l32_av=per_level(l32_av),
                c16_av=per_level(c16_av),
                quad_ok=per_level(quad_ok)),
        lvl_ctu=lvl_ctu)


def _strong_smooth_select(ref, n, bit_depth):
    """§8.4.4.2.3 strong (bilinear) smoothing for 32x32 luma TBs.

    ref: [L, 4n+1] int32 (unfiltered canonical).  Returns the
    strong-filtered vector + the [L] flatness-condition mask; the caller
    selects per lane (only where the mode's filter flag is set)."""
    import jax.numpy as jnp

    assert n == 32
    corner = ref[:, 2 * n]                       # p[-1][-1]
    left = ref[:, 2 * n - 1: n - 1: -1]          # left[k] = p[-1][k]
    bl_last = ref[:, 0]                          # p[-1][2n-1]
    top = ref[:, 2 * n + 1: 3 * n + 1]           # top[x] = p[x][-1]
    tr_last = ref[:, 4 * n]                      # p[2n-1][-1]
    thr = 1 << (bit_depth - STRONG_THRESH_SHIFT)
    cond = ((jnp.abs(corner + tr_last - 2 * top[:, n - 1]) < thr)
            & (jnp.abs(corner + bl_last - 2 * left[:, n - 1]) < thr))
    i = jnp.arange(1, 2 * n, dtype=jnp.int32)    # 1..63
    # pF[-1][y] = ((63-y)*p[-1][-1] + (y+1)*p[-1][63] + 32) >> 6 (y = i-1)
    sleft = ((64 - i)[None, :] * corner[:, None]
             + i[None, :] * bl_last[:, None] + 32) >> 6
    stop = ((64 - i)[None, :] * corner[:, None]
            + i[None, :] * tr_last[:, None] + 32) >> 6
    out = ref
    # left span occupies canonical indices 2n-1 .. 0 (p[-1][0..2n-1])
    out = out.at[:, 2 * n - 1::-1].set(
        jnp.concatenate([sleft, bl_last[:, None]], axis=1))
    out = out.at[:, 2 * n + 1:].set(
        jnp.concatenate([stop, tr_last[:, None]], axis=1))
    return out, cond


class CtuScan:
    """Whole-picture reconstruction scan at CTU granularity."""

    def __init__(self, geom: PictureGeometry, bit_depth: int = 8,
                 sign_hide: bool = False,
                 strong_intra_smoothing: bool = False,
                 rdoq: bool = False, noise_reduction: bool = False,
                 psy_rd: float = 0.0, psy_rdoq: float = 0.0):
        self.t = build_ctu_tables(geom.width, geom.height, geom.log2_ctb)
        self.bit_depth = bit_depth
        self.sign_hide = sign_hide
        self.strong = strong_intra_smoothing
        self.rdoq = rdoq
        self.noise_reduction = noise_reduction
        self.psy_rd = float(psy_rd)
        self.psy_rdoq = float(psy_rdoq)
        self.geom = geom

    # -- block (de)arrangement helpers (device-side) -------------------------

    def _to_blocks(self, pl, n):
        import jax.numpy as jnp
        ph, pw = pl.shape
        return pl.reshape(ph // n, n, pw // n, n).transpose(
            0, 2, 1, 3).reshape(-1, n, n)

    # -- the scan ------------------------------------------------------------

    def scan_fn(self, inter: bool, decide32: bool = False,
                rqt: bool = False, allow_pallas: bool = True):
        """Returns run(...) -> (rec_y, rec_cb, rec_cr, lv16_y, lv8_cb,
        lv8_cr, lv32_y, lv16_cb, lv16_cr, use32, tu8).

        run(oy, ocb, ocr, mode16, mode32, use32, qp_y, qp_cb, qp_cr
            [, lam, is_inter, ipred_y, ipred_cb, ipred_cr, rqt_ok])

        With ``rqt`` (inter slices), every inter 16x16 slot additionally
        evaluates the DEPTH-1 residual quadtree candidate — four 8x8
        luma TUs + four 4x4 chroma TUs — and RD-selects TU16 vs TU8
        jointly over all three planes (x265 search.cpp:2838
        estimateResidualQT re-cast as one batched in-scan compare).
        ``rqt_ok`` [B16] masks blocks whose containing CU cannot take
        another TU split level (merged 64x64 CUs at
        max_transform_hierarchy_depth_inter == 2).  The returned ``tu8``
        [B16] marks blocks coded with the split tree; their lv16/lv8
        outputs hold the four sub-TU levels in place.

        * oy/ocb/ocr: padded original planes.
        * mode16 [B16] int32; mode32 [B32] int32, use32 [B32] bool (the
          32x32-CU decision; pass zeros when CTU < 32).
        * qp_* [nctb] int32 per-CTU QPs (QpBdOffset included).
        * is_inter [B16] bool + ipred_* [B16, n, n] int32 (inter=True).

        With ``decide32`` the 32x32-vs-4x16x16 CU choice is made INSIDE
        the scan per quadrant (x265 analysis.cpp compressIntraCU RD
        compare, re-cast as a closed-loop batched decision): both
        candidates are reconstructed from the true causal neighbors, the
        cheaper one by SSD + lambda*bits wins, and the returned ``use32``
        [B32] replaces the input (pass ``lam`` [nctb] float32 SSD-domain
        lambdas).  Levels outputs are in block-raster order ([B16, 16, 16]
        etc.); rows of lv16/lv8 under a use32 quadrant are garbage (mask
        by use32), and vice versa.
        """
        import jax
        import jax.numpy as jnp

        from ..common.rdcost import level_bits_jnp
        from ..ops.cost import psy_cost
        from ..ops.quantize import (_rdoq_core, dequant, quant_masked,
                                    sign_hide_diag)
        from ..ops.transforms import forward_transform, inverse_transform

        t = self.t
        bd = self.bit_depth
        g = t["geom"]
        ph, pw = t["plane"]
        cph, cpw = t["cplane"]
        has32 = t["has32"]
        n_quads, spq = t["n_quads"], t["slots_per_quad"]
        nslots = t["nslots"]
        B16, B32 = t["b16_n"], t["b32_n"]
        strong = self.strong
        sign_hide = self.sign_hide
        use_rdoq = self.rdoq
        # psy-rd: the psycho-visual energy term enters every in-scan RD
        # compare (32-vs-16 CU, inter RQT, TU32 trial) as
        # lambda_sad * psyRd * 0.33 * psyCost, the exact weighting of
        # x265's RDCost::calcPsyRdCost (rdcost.h:74; setPsyRdScale
        # folds the 0.33).  lam (xs) is the SSD-domain 0.85*lambda^2, so
        # lambda_sad = sqrt(lam / 0.85).
        psy = self.psy_rd > 0.0 and (decide32 or rqt)
        psy_scale = self.psy_rd * 0.33
        maxv = (1 << bd) - 1
        n_levels, lmax = t["n_levels"], t["lmax"]
        ctb = 1 << g.log2_ctb
        ctbc = ctb // 2
        cw, ch = g.ctbs_w, g.ctbs_h
        # lane-local CTU buffer dims: row 0 = top refs (2*ctb wide for
        # above-right), col 0 = left refs, + below-CTU garbage rows so every
        # slot's below-left slice exists (availability masks those off)
        CH_ = 1 + ctb + (32 if has32 else 16)
        CW_ = 1 + 2 * ctb
        CHC = 1 + ctbc + (16 if has32 else 8)
        CWC = 1 + 2 * ctbc

        def z_origins(count, size):
            out = []
            for i in range(count):
                out.append((((i & 1) | ((i >> 1) & 2)) * size,
                            (((i >> 1) & 1) | ((i >> 2) & 2)) * size))
            return out

        quad_orig = z_origins(n_quads, 32) if has32 else [(0, 0)]
        slot_orig = z_origins(spq, 16)

        def refs_from(C, lx0, ly0, nsz):
            """Canonical [lanes, 4n+1] reference vector for the block at
            LOCAL origin (lx0, ly0): reversed left column (incl. corner)
            + top row — static slices of the lane-local buffer."""
            leftc = C[:, ly0:ly0 + 2 * nsz + 1, lx0][:, ::-1]
            top = C[:, ly0, lx0 + 1:lx0 + 2 * nsz + 1]
            return jnp.concatenate([leftc, top], axis=1)

        xs_all = {k: jnp.asarray(v) for k, v in t["xs"].items()}

        use_nr = self.noise_reduction
        # trace-time context for the noise-reduction hooks: make_step
        # installs the step's data dict; the step resets the per-step
        # stats accumulators which flow out through the scan ys
        _nr_ctx = {"d": None, "stats": None}

        def tq(pred, orig, qp, intra_mask, n, levels_in=None,
               nr_cat=None, luma=True):
            """Transform-quantize-reconstruct one stage (encode) or
            dequant-reconstruct (decode when levels_in given).

            ``nr_cat``: DCT-domain noise-reduction category name (x265
            quant.cpp:205 denoiseDct / frameencoder.cpp:1331 update):
            when set, the per-position offsets d["nr_<cat>_{i,p}"] are
            subtracted from |coef| before quantization and the |coef|
            sums accumulate for the host-side running-average update."""
            if levels_in is None:
                resi = orig - pred
                coef = forward_transform(resi, bd, dst=False)
                if use_nr and nr_cat is not None:
                    d_ = _nr_ctx["d"]
                    K = coef.shape[0]
                    a = jnp.abs(coef).reshape(K, n * n)
                    sgn = jnp.sign(coef).reshape(K, n * n)
                    off = jnp.where(intra_mask[:, None],
                                    d_["nr_" + nr_cat + "_i"][None],
                                    d_["nr_" + nr_cat + "_p"][None])
                    # accumulate |coef| sums + block counts by intra/
                    # inter (all-zero lanes = dummies/clean skips: not
                    # counted, keeping the running average residual-led)
                    live = jnp.any(a != 0, axis=1)
                    im = intra_mask & live
                    pm = (~intra_mask) & live
                    st = _nr_ctx["stats"]
                    s_i, c_i, s_p, c_p = st.get(nr_cat, (0, 0, 0, 0))
                    st[nr_cat] = (
                        s_i + (a * im[:, None]).sum(0, dtype=jnp.int32),
                        c_i + im.sum(dtype=jnp.int32),
                        s_p + (a * pm[:, None]).sum(0, dtype=jnp.int32),
                        c_p + pm.sum(dtype=jnp.int32))
                    coef = (sgn * jnp.maximum(0, a - off)).reshape(
                        K, n, n).astype(coef.dtype)
                if use_rdoq:
                    # psy-rdoq is luma-only, like x265 (quant.cpp
                    # rdoQuant's usePsy gate)
                    levels = _rdoq_core(
                        jnp, coef, qp, bd,
                        psy_scale=self.psy_rdoq if luma else 0.0)
                else:
                    levels = quant_masked(coef, qp, intra_mask, bd)
                if sign_hide:
                    levels = sign_hide_diag(levels)
            else:
                levels = levels_in
            dq = dequant(levels, qp, bd)
            r2 = inverse_transform(dq, bd, dst=False)
            has = jnp.any(levels != 0, axis=(1, 2))[:, None, None]
            rec = jnp.clip(jnp.where(has, pred + r2, pred), 0, maxv)
            return levels, rec

        def predict32(raw, av, m32):
            ref = _substitute(raw, av, bd)
            if not strong:
                return _predict_lanes(ref, m32, 32, True, bd)
            from ..ops.intra import _weight_tensor
            sref, scond = _strong_smooth_select(ref, 32, bd)
            filt = jnp.asarray(_weight_tensor(32)[3])[m32]
            use_strong = scond & filt
            ref_sel = jnp.where(use_strong[:, None], sref, ref)
            # strong-filtered lanes must not get the [1 2 1] filter again:
            # is_luma=False disables filtering (n=32 has no luma post-ops)
            pred_f = _predict_lanes(ref_sel, m32, 32, True, bd)
            pred_u = _predict_lanes(ref_sel, m32, 32, False, bd)
            return jnp.where(use_strong[:, None, None], pred_u, pred_f)

        def ssd(a, b):
            # integer-exact (sums < 2^31): float summation order would
            # diverge between XLA and the Pallas step for sums > 2^24
            d = a - b
            return jnp.sum(d * d, axis=(1, 2)).astype(jnp.float32)

        # CU-syntax overhead estimates (bits) for the RD compare: a
        # 16-config quadrant codes 4x (luma mode + cbfs) + a split flag;
        # the 32-config codes one mode + cbfs (entropy.cpp encodeCU cost)
        OVH16, OVH32 = 9.0, 12.0

        def make_step(d):
            _nr_ctx["d"] = d

            def step(carry, xs):
                _nr_ctx["stats"] = {}
                (rowf, colf, cornf, rowfb, colfb, cornfb,
                 rowfr, colfr, cornfr) = carry
                cx, cy = xs["cx"], xs["cy"]
                L = cx.shape[0]                  # = lmax
                qp_y = xs["qp_y"]                # [L] per-lane
                qp_c2 = jnp.concatenate([xs["qp_cb"], xs["qp_cr"]])
                if decide32 or rqt:
                    lam = xs["lam"]              # [L] SSD-domain lambda
                    if psy:
                        # SAD-domain lambda for calcPsyRdCost's psy term
                        plam = psy_scale * jnp.sqrt(lam / 0.85)
                ones_l = jnp.ones((L,), bool)
                ones_2l = jnp.ones((2 * L,), bool)
                lv16_o, lv8_o, lv32_o, lvc16_o, u32_o = [], [], [], [], []
                tu8_o = []

                def split4(x, m):
                    """[K, 2m, 2m] -> [4K, m, m] (z-order quadrants)."""
                    K = x.shape[0]
                    return x.reshape(K, 2, m, 2, m).transpose(
                        1, 3, 0, 2, 4).reshape(4 * K, m, m)

                def join4(x, m):
                    """Inverse of split4."""
                    K = x.shape[0] // 4
                    return x.reshape(2, 2, K, m, m).transpose(
                        2, 0, 3, 1, 4).reshape(K, 2 * m, 2 * m)

                # lane-local CTU buffers seeded from the frontier state
                cx1 = jnp.minimum(cx + 1, cw)
                par = (cy - 1) & 1
                C = jnp.zeros((L, CH_, CW_), jnp.int32)
                C = C.at[:, 0, 1:1 + 2 * ctb].set(
                    jnp.concatenate([rowf[cx], rowf[cx1]], axis=1))
                C = C.at[:, 1:1 + ctb, 0].set(colf[cy])
                C = C.at[:, 0, 0].set(cornf[cx, par])
                Cc = jnp.zeros((2 * L, CHC, CWC), jnp.int32)
                Cc = Cc.at[:, 0, 1:1 + 2 * ctbc].set(jnp.concatenate([
                    jnp.concatenate([rowfb[cx], rowfb[cx1]], axis=1),
                    jnp.concatenate([rowfr[cx], rowfr[cx1]], axis=1)]))
                Cc = Cc.at[:, 1:1 + ctbc, 0].set(
                    jnp.concatenate([colfb[cy], colfr[cy]]))
                Cc = Cc.at[:, 0, 0].set(
                    jnp.concatenate([cornfb[cx, par], cornfr[cx, par]]))

                for q in range(n_quads):
                    qx, qy = quad_orig[q]
                    slot_preds, slot_predcs = [], []
                    if has32:
                        m32 = xs["m32"][:, q]
                        o32y = xs["o32y"][:, q]
                        # 32x32 luma TU candidate (refs precede quadrant)
                        pred32 = predict32(refs_from(C, qx, qy, 32),
                                           xs["l32_av"][:, q], m32)
                        lv32, rec32 = tq(pred32, o32y, qp_y,
                                         ones_l, 32, nr_cat="y32")
                        # 16x16 chroma TU candidate (cb+cr paired lanes)
                        raw2 = refs_from(Cc, qx // 2, qy // 2, 16)
                        av2 = jnp.concatenate([xs["c16_av"][:, q]] * 2)
                        refc = _substitute(raw2, av2, bd)
                        m32_2 = jnp.concatenate([m32, m32])
                        predc = _predict_lanes(refc, m32_2, 16, False, bd)
                        oc32 = jnp.concatenate([xs["o16cb"][:, q],
                                                xs["o16cr"][:, q]])
                        lvc32, recc32 = tq(predc, oc32, qp_c2, ones_2l,
                                           16, nr_cat="c16", luma=False)
                        if decide32:
                            sc = ssd(recc32, oc32)
                            bc = level_bits_jnp(lvc32)
                            cost32 = (ssd(rec32, o32y)
                                      + sc[:L] + sc[L:]
                                      + lam * (level_bits_jnp(lv32)
                                               + bc[:L] + bc[L:] + OVH32))
                            if psy:
                                cost32 = cost32 + plam * psy_cost(
                                    o32y, rec32)
                            cost16 = jnp.full((L,), 0.0)
                            any_inter = jnp.zeros((L,), bool)
                    for s in range(spq):
                        i = q * spq + s
                        sx, sy = qx + slot_orig[s][0], qy + slot_orig[s][1]
                        m = xs["m16"][:, i]
                        # 16x16 luma slot
                        ref = _substitute(refs_from(C, sx, sy, 16),
                                          xs["l16_av"][:, i], bd)
                        pred = _predict_lanes(ref, m, 16, True, bd)
                        if inter:
                            iv = xs["inter"][:, i]
                            pred = jnp.where(iv[:, None, None],
                                             xs["ipy"][:, i], pred)
                            imask = ~iv
                        else:
                            imask = ones_l
                        o16 = xs["o16y"][:, i]
                        slot_preds.append(pred)
                        lv, rec = tq(pred, o16, qp_y, imask, 16,
                                     nr_cat="y16")
                        # 8x8 chroma slot (cb + cr paired lanes)
                        raw2 = refs_from(Cc, sx // 2, sy // 2, 8)
                        av2 = jnp.concatenate([xs["c8_av"][:, i]] * 2)
                        refc = _substitute(raw2, av2, bd)
                        m2 = jnp.concatenate([m, m])
                        predc = _predict_lanes(refc, m2, 8, False, bd)
                        if inter:
                            iv2 = jnp.concatenate([iv, iv])
                            ip = jnp.concatenate([xs["ipcb"][:, i],
                                                  xs["ipcr"][:, i]])
                            predc = jnp.where(iv2[:, None, None], ip, predc)
                            imask2 = ~iv2
                        else:
                            imask2 = ones_2l
                        oc = jnp.concatenate([xs["o8cb"][:, i],
                                              xs["o8cr"][:, i]])
                        slot_predcs.append(predc)
                        lvc, recc = tq(predc, oc, qp_c2, imask2, 8,
                                       nr_cat="c8", luma=False)
                        if inter and rqt:
                            # depth-1 RQT candidate: 4x 8x8 luma TUs +
                            # 4x 4x4 chroma TUs, joint RD vs the TU16
                            # config (search.cpp:2838)
                            lv8s, rec8s = tq(split4(pred, 8),
                                             split4(o16, 8),
                                             jnp.tile(qp_y, 4),
                                             jnp.tile(imask, 4), 8)
                            lv4s, rec4s = tq(split4(predc, 4),
                                             split4(oc, 4),
                                             jnp.tile(qp_c2, 4),
                                             jnp.tile(imask2, 4), 4,
                                             luma=False)
                            rec8 = join4(rec8s, 8)
                            lv8 = join4(lv8s, 8)
                            rec4 = join4(rec4s, 4)
                            lv4 = join4(lv4s, 4)
                            sc16 = ssd(recc, oc)
                            bc16 = level_bits_jnp(lvc)
                            c16 = (ssd(rec, o16) + sc16[:L] + sc16[L:]
                                   + lam * (level_bits_jnp(lv)
                                            + bc16[:L] + bc16[L:]))
                            if psy:
                                c16 = c16 + plam * psy_cost(o16, rec)
                            sc4 = ssd(rec4, oc)
                            b8 = level_bits_jnp(lv8s).reshape(4, L).sum(0)
                            bc4 = level_bits_jnp(lv4s).reshape(
                                4, 2 * L).sum(0)
                            # split flag + extra cbf signaling overhead
                            c8 = (ssd(rec8, o16) + sc4[:L] + sc4[L:]
                                  + lam * (b8 + bc4[:L] + bc4[L:] + 9.0))
                            if psy:
                                c8 = c8 + plam * psy_cost(o16, rec8)
                            tu8 = iv & xs["rqt_ok"][:, i] & (c8 < c16)
                            t3 = tu8[:, None, None]
                            t3c = jnp.concatenate([tu8, tu8])[:, None,
                                                              None]
                            rec = jnp.where(t3, rec8, rec)
                            lv = jnp.where(t3, lv8, lv)
                            recc = jnp.where(t3c, rec4, recc)
                            lvc = jnp.where(t3c, lv4, lvc)
                            tu8_o.append(tu8)
                        lv16_o.append(lv)
                        lv8_o.append(lvc)
                        C = C.at[:, 1 + sy:1 + sy + 16,
                                 1 + sx:1 + sx + 16].set(rec)
                        Cc = Cc.at[:, 1 + sy // 2:1 + sy // 2 + 8,
                                   1 + sx // 2:1 + sx // 2 + 8].set(recc)
                        if has32 and decide32:
                            sc = ssd(recc, oc)
                            bc = level_bits_jnp(lvc)
                            cost16 = cost16 + (
                                ssd(rec, o16) + sc[:L] + sc[L:]
                                + lam * (level_bits_jnp(lv)
                                         + bc[:L] + bc[L:] + OVH16))
                            if psy:
                                cost16 = cost16 + plam * psy_cost(o16, rec)
                            if inter:
                                any_inter = any_inter | iv
                    if has32:
                        if decide32:
                            u32 = xs["quad_ok"][:, q] & (cost32 < cost16)
                            if inter:
                                u32 = u32 & ~any_inter
                        else:
                            u32 = xs["use32"][:, q]
                        sel32, rec32f, lv32f = u32, rec32, lv32
                        recc32f, lvc32f = recc32, lvc32
                        if inter and decide32:
                            # inter TU32 trial for uniform-motion quads
                            # (x265 medium codes TU == CU for inter;
                            # merged 32/64 CUs otherwise pay 4x TU16
                            # cbf/structure syntax).  The quad's inter
                            # prediction is the four slot preds
                            # reassembled (same MV everywhere, so MC is
                            # position-independent and seam-free).
                            ip32 = join4(jnp.concatenate(slot_preds), 16)
                            ipc16 = join4(jnp.concatenate(slot_predcs), 8)
                            zl = jnp.zeros((L,), bool)
                            lv32i, rec32i = tq(ip32, o32y,
                                               qp_y, zl, 32, nr_cat="y32")
                            lvc16i, recc16i = tq(ipc16, oc32, qp_c2,
                                                 jnp.zeros((2 * L,), bool),
                                                 16, nr_cat="c16",
                                                 luma=False)
                            sci = ssd(recc16i, oc32)
                            bci = level_bits_jnp(lvc16i)
                            c32i = (ssd(rec32i, o32y)
                                    + sci[:L] + sci[L:]
                                    + lam * (level_bits_jnp(lv32i)
                                             + bci[:L] + bci[L:] + OVH32))
                            if psy:
                                c32i = c32i + plam * psy_cost(o32y, rec32i)
                            tu32 = xs["m32_in"][:, q] & (c32i < cost16)
                            t1 = tu32[:, None, None]
                            t2 = jnp.concatenate([tu32, tu32]
                                                 )[:, None, None]
                            sel32 = u32 | tu32
                            rec32f = jnp.where(t1, rec32i, rec32)
                            lv32f = jnp.where(t1, lv32i, lv32)
                            recc32f = jnp.where(t2, recc16i, recc32)
                            lvc32f = jnp.where(t2, lvc16i, lvc32)
                        # sel32 = intra-32 CUs | inter TU32 quads; the
                        # host separates them via the merge masks
                        # (tu32 quads are exactly sel32 & m32_in)
                        u32_o.append(sel32)
                        lv32_o.append(lv32f)
                        lvc16_o.append(lvc32f)
                        # masked overwrite of the quadrant with the 32 recon
                        C = C.at[:, 1 + qy:1 + qy + 32,
                                 1 + qx:1 + qx + 32].set(
                            jnp.where(sel32[:, None, None], rec32f,
                                      C[:, 1 + qy:1 + qy + 32,
                                        1 + qx:1 + qx + 32]))
                        u2 = jnp.concatenate([sel32, sel32])[:, None, None]
                        qcx, qcy = qx // 2, qy // 2
                        Cc = Cc.at[:, 1 + qcy:1 + qcy + 16,
                                   1 + qcx:1 + qcx + 16].set(
                            jnp.where(u2, recc32f,
                                      Cc[:, 1 + qcy:1 + qcy + 16,
                                         1 + qcx:1 + qcx + 16]))

                # frontier update (dummy lanes carry out-of-range indices:
                # writes land in the spare garbage rows)
                rowf = rowf.at[cx].set(C[:, ctb, 1:1 + ctb])
                colf = colf.at[cy].set(C[:, 1:1 + ctb, ctb])
                cornf = cornf.at[cx + 1, cy & 1].set(C[:, ctb, ctb])
                botc = Cc[:, ctbc, 1:1 + ctbc]
                rightc = Cc[:, 1:1 + ctbc, ctbc]
                cc = Cc[:, ctbc, ctbc]
                rowfb = rowfb.at[cx].set(botc[:L])
                rowfr = rowfr.at[cx].set(botc[L:])
                colfb = colfb.at[cy].set(rightc[:L])
                colfr = colfr.at[cy].set(rightc[L:])
                cornfb = cornfb.at[cx + 1, cy & 1].set(cc[:L])
                cornfr = cornfr.at[cx + 1, cy & 1].set(cc[L:])

                ys = tuple(jnp.stack(v).astype(jnp.int16) if v else None
                           for v in (lv16_o, lv8_o, lv32_o, lvc16_o))
                nr_ys = (_nr_ctx["stats"] if use_nr else None)
                ys = ys + (jnp.stack(u32_o) if u32_o else None,
                           jnp.stack(tu8_o) if tu8_o else None,
                           C[:, 1:1 + ctb, 1:1 + ctb].astype(jnp.int16),
                           Cc[:, 1:1 + ctbc, 1:1 + ctbc].astype(jnp.int16),
                           nr_ys)
                return (rowf, colf, cornf, rowfb, colfb, cornfb,
                        rowfr, colfr, cornfr), ys
            return step

        def run(oy, ocb, ocr, mode16, mode32, use32, qp_y, qp_cb, qp_cr,
                lam=None, is_inter=None, ipred_y=None, ipred_cb=None,
                ipred_cr=None, m32_in=None, rqt_ok=None,
                nr_offsets=None):
            out_dtype = jnp.uint8 if bd == 8 else jnp.uint16
            pad16 = jnp.zeros((1, 16, 16), jnp.int32)
            pad8 = jnp.zeros((1, 8, 8), jnp.int32)
            zpad = jnp.zeros((1,), jnp.int32)
            d = dict(
                orig16_y=jnp.concatenate(
                    [self._to_blocks(oy.astype(jnp.int32), 16), pad16]),
                orig8_cb=jnp.concatenate(
                    [self._to_blocks(ocb.astype(jnp.int32), 8), pad8]),
                orig8_cr=jnp.concatenate(
                    [self._to_blocks(ocr.astype(jnp.int32), 8), pad8]),
                mode16=jnp.concatenate([mode16.astype(jnp.int32), zpad]),
                qp_y=jnp.concatenate([qp_y.astype(jnp.int32), zpad]),
                qp_cb=jnp.concatenate([qp_cb.astype(jnp.int32), zpad]),
                qp_cr=jnp.concatenate([qp_cr.astype(jnp.int32), zpad]),
            )
            if has32:
                pad32 = jnp.zeros((1, 32, 32), jnp.int32)
                d["orig32_y"] = jnp.concatenate(
                    [self._to_blocks(oy.astype(jnp.int32), 32), pad32])
                d["orig16_cb"] = jnp.concatenate(
                    [self._to_blocks(ocb.astype(jnp.int32), 16), pad16])
                d["orig16_cr"] = jnp.concatenate(
                    [self._to_blocks(ocr.astype(jnp.int32), 16), pad16])
                d["mode32"] = jnp.concatenate(
                    [mode32.astype(jnp.int32), zpad])
                if not decide32:
                    d["use32"] = jnp.concatenate(
                        [jnp.asarray(use32, bool), jnp.zeros((1,), bool)])
            if decide32 or rqt:
                d["lam"] = jnp.concatenate(
                    [jnp.asarray(lam, jnp.float32),
                     jnp.zeros((1,), jnp.float32)])
            if inter:
                d["is_inter"] = jnp.concatenate(
                    [jnp.asarray(is_inter, bool), jnp.zeros((1,), bool)])
                d["ipred_y"] = jnp.concatenate(
                    [ipred_y.astype(jnp.int32), pad16])
                d["ipred_cb"] = jnp.concatenate(
                    [ipred_cb.astype(jnp.int32), pad8])
                d["ipred_cr"] = jnp.concatenate(
                    [ipred_cr.astype(jnp.int32), pad8])
                zb1 = jnp.zeros((1,), bool)
                if inter and decide32:
                    m32b = (jnp.zeros((t["b32_n"],), bool)
                            if m32_in is None else jnp.asarray(m32_in,
                                                               bool))
                    d["m32_in"] = jnp.concatenate([m32b.reshape(-1), zb1])
                if rqt:
                    rq = (jnp.ones((t["b16_n"],), bool)
                          if rqt_ok is None else jnp.asarray(rqt_ok, bool))
                    d["rqt_ok"] = jnp.concatenate([rq.reshape(-1), zb1])

            if use_nr:
                sizes = {"y16": 256, "c8": 64, "y32": 1024, "c16": 256}
                for cat, nn in sizes.items():
                    if not has32 and cat in ("y32", "c16"):
                        continue
                    for sfx in ("_i", "_p"):
                        key = cat + sfx
                        v = (nr_offsets or {}).get(
                            key, np.zeros((nn,), np.int32))
                        d["nr_" + cat + sfx] = jnp.asarray(v, jnp.int32)

            # ---- pre-permuted per-level streams ----
            # Every per-step ``d[...][indices]`` gather is hoisted out of
            # the scan body as ONE whole-frame gather over the STATIC
            # schedule tables, streamed through xs.  Thousands of tiny
            # in-scan gathers serialize on XLA:TPU (profiled round 5);
            # the hoisted form is a single large static-index gather.
            xs_run = dict(xs_all)
            b16t = jnp.asarray(t["xs"]["b16"])    # [nlv, L, nslots]
            ctut = jnp.asarray(t["xs"]["ctu"])    # [nlv, L]
            xs_run["o16y"] = d["orig16_y"][b16t]
            xs_run["o8cb"] = d["orig8_cb"][b16t]
            xs_run["o8cr"] = d["orig8_cr"][b16t]
            xs_run["m16"] = d["mode16"][b16t]
            xs_run["qp_y"] = d["qp_y"][ctut]
            xs_run["qp_cb"] = d["qp_cb"][ctut]
            xs_run["qp_cr"] = d["qp_cr"][ctut]
            if has32:
                b32t = jnp.asarray(t["xs"]["b32"])  # [nlv, L, n_quads]
                xs_run["o32y"] = d["orig32_y"][b32t]
                xs_run["o16cb"] = d["orig16_cb"][b32t]
                xs_run["o16cr"] = d["orig16_cr"][b32t]
                xs_run["m32"] = d["mode32"][b32t]
                if not decide32:
                    xs_run["use32"] = d["use32"][b32t]
            if decide32 or rqt:
                xs_run["lam"] = d["lam"][ctut]
            if inter:
                xs_run["inter"] = d["is_inter"][b16t]
                xs_run["ipy"] = d["ipred_y"][b16t]
                xs_run["ipcb"] = d["ipred_cb"][b16t]
                xs_run["ipcr"] = d["ipred_cr"][b16t]
                if decide32:
                    xs_run["m32_in"] = d["m32_in"][b32t]
                if rqt:
                    xs_run["rqt_ok"] = d["rqt_ok"][b16t]

            carry0 = (
                jnp.zeros((cw + 1, ctb), jnp.int32),       # rowf
                jnp.zeros((ch + 1, ctb), jnp.int32),       # colf
                jnp.zeros((cw + 2, 2), jnp.int32),         # cornf
                jnp.zeros((cw + 1, ctbc), jnp.int32),      # rowf cb
                jnp.zeros((ch + 1, ctbc), jnp.int32),      # colf cb
                jnp.zeros((cw + 2, 2), jnp.int32),         # cornf cb
                jnp.zeros((cw + 1, ctbc), jnp.int32),      # rowf cr
                jnp.zeros((ch + 1, ctbc), jnp.int32),      # colf cr
                jnp.zeros((cw + 2, 2), jnp.int32),         # cornf cr
            )
            from .ctu_scan_pallas import make_pallas_step, pallas_supported
            if allow_pallas and pallas_supported(self, inter, decide32,
                                                 rqt):
                step_fn = make_pallas_step(self, inter, decide32)
            else:
                step_fn = make_step(d)
            _, ys = jax.lax.scan(step_fn, carry0, xs_run)
            (lv16_s, lv8_s, lv32_s, lvc16_s, u32_s, tu8_s,
             int_y, int_c, nr_s) = ys
            nr_out = (jax.tree.map(lambda a: a.sum(0), nr_s)
                      if nr_s is not None else None)

            # Reorder level stacks to block-raster via STATIC inverse
            # permutations + gather — the schedule tables are static per
            # geometry, and TPU scatters (at[].set) cost ~10x a static
            # gather (profiled: 4 x 17 ms/frame at 1080p).
            nctb = t["nctb"]

            def inv_perm(tab_src, bn):
                # default = the appended all-zero source row (out-of-
                # picture blocks in the padded plane must stay zero)
                flat = np.swapaxes(np.asarray(tab_src), 1, 2).reshape(-1)
                inv = np.full(bn, len(flat), np.int32)
                valid = flat < bn
                inv[flat[valid]] = np.nonzero(valid)[0]
                return jnp.asarray(inv)

            inv16 = inv_perm(t["xs"]["b16"], B16)
            inv_ctb = inv_perm(t["lvl_ctu"].reshape(
                n_levels, lmax, 1), nctb)

            def tiles_to_plane(tiles, size, cww, chh):
                out = tiles.reshape(-1, size, size)[inv_ctb]
                return out.reshape(chh, cww, size, size).transpose(
                    0, 2, 1, 3).reshape(chh * size, cww * size)

            rec_y = tiles_to_plane(int_y, ctb, cw, ch).astype(out_dtype)
            int_c = int_c.reshape(n_levels, 2, lmax, ctbc, ctbc)
            rec_cb = tiles_to_plane(int_c[:, 0], ctbc, cw, ch).astype(
                out_dtype)
            rec_cr = tiles_to_plane(int_c[:, 1], ctbc, cw, ch).astype(
                out_dtype)

            def unstack(lv, inv, n):
                # lv: [n_levels, nstage, L, n, n] -> [bn, n, n]
                flat = lv.reshape(-1, n, n)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((1, n, n), flat.dtype)])
                return flat[inv]

            lv16_y = unstack(lv16_s, inv16, 16)
            lv8 = lv8_s.reshape(n_levels, nslots, 2, lmax, 8, 8)
            lv8_cb = unstack(lv8[:, :, 0], inv16, 8)
            lv8_cr = unstack(lv8[:, :, 1], inv16, 8)
            if has32:
                inv32 = inv_perm(t["xs"]["b32"], B32)
                lv32_y = unstack(lv32_s, inv32, 32)
                lvc = lvc16_s.reshape(n_levels, n_quads, 2, lmax, 16, 16)
                lv16_cb = unstack(lvc[:, :, 0], inv32, 16)
                lv16_cr = unstack(lvc[:, :, 1], inv32, 16)
                use32_out = jnp.concatenate(
                    [u32_s.reshape(-1),
                     jnp.zeros((1,), u32_s.dtype)])[inv32]
            else:
                lv32_y = lv16_cb = lv16_cr = None
                use32_out = jnp.zeros((B32,), bool)
            if tu8_s is not None:
                tu8_out = jnp.concatenate(
                    [tu8_s.reshape(-1),
                     jnp.zeros((1,), tu8_s.dtype)])[inv16]
            else:
                tu8_out = jnp.zeros((B16,), bool)
            return (rec_y, rec_cb, rec_cr, lv16_y, lv8_cb, lv8_cr,
                    lv32_y, lv16_cb, lv16_cr, use32_out, tu8_out, nr_out)

        return run
