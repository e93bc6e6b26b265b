"""Lookahead: lowres pyramid analysis + cuTree QP-offset propagation.

Role of x265's Lookahead (x265_1.9/source/encoder/slicetype.cpp):
  * half-res downscale of each incoming frame (common/lowres.h:107)
  * per-8x8-lowres-block (== 16x16 full-res) intra and inter cost
    estimates (slicetypeDecide's CostEstimateGroup / lowresIntraEstimate,
    slicetype.cpp:230,1899) — here ONE batched device program per frame:
    all-mode intra SATD + full-search SAD vs the previous lowres, the
    TPU-first replacement for the bonded-worker HEX search (SURVEY §2.6 P5)
  * cuTree (slicetype.cpp:1641 cuTree, :1741 estimateCUPropagate, :1844
    cuTreeFinish): future-reference importance propagated backward through
    the lookahead window along lowres MVs, converted to per-block QP
    offsets qpCuTreeOffset = qpAqOffset - 5*(1-qcomp) * log2 ratio.

The window introduces output delay — exactly x265's delayed-output
contract (x265_encoder_encode returning 0 NALs while the queue fills).
The zero-latency path (Encoder.encode_frame) bypasses it, mirroring
x265's tune zerolatency (rc-lookahead 0, no cutree).
"""

from __future__ import annotations

import numpy as np


class LowresFrame:
    """Analyzed lookahead entry (role of x265's Lowres, lowres.h:107)."""

    __slots__ = ("planes", "low", "intra_cost", "inter_cost", "mv",
                 "aq_offsets", "invq", "satd_cost", "weight")

    def __init__(self, planes, low, aq_offsets):
        self.planes = planes          # full-res source (Y, Cb, Cr)
        self.low = low                # device half-res luma
        self.intra_cost = None        # [gh8, gw8] int32 (lowres 8x8 grid)
        self.inter_cost = None        # [gh8, gw8] int32 vs previous frame
        self.mv = None                # [gh8, gw8, 2] int32 (x, y) lowres px
        self.aq_offsets = aq_offsets  # [gh16, gw16] float (full-res grid)
        self.invq = None              # 256 * 2^(-aqoff/6) per lowres block
        self.satd_cost = 0.0          # frame complexity for rate control


def _build_lowres_program(lw, lh, r):
    """Device program: (cur_low, prev_low) -> per-8x8-block intra cost,
    inter cost, integer MV.  Full-search SAD over (2r+1)^2 via static
    row slices (same shape as the main ME, device_pipeline.py)."""
    import jax
    import jax.numpy as jnp

    from ..ops.cost import satd as satd_fn
    from ..ops.intra import predict_all_modes, substitute_references

    n = 8
    gh, gw = lh // n, lw // n
    nb = gh * gw
    offs = np.array([(dy, dx) for dy in range(-r, r + 1)
                     for dx in range(-r, r + 1)], np.int32)

    # open-loop intra availability on the lowres grid (top/left rows)
    av = np.ones((nb, 4 * n + 1), bool)
    by = np.repeat(np.arange(gh), gw)
    bx = np.tile(np.arange(gw), gh)
    av[bx == 0, :2 * n + 1] = False              # left column + corner
    av[by == 0, 2 * n:] = False                  # corner + top rows
    av[by == gh - 1, :n] = False                 # below-left
    av[bx == gw - 1, 3 * n + 1:] = False         # above-right
    # below-left/above-right z-scan availability approximation: raster
    # order makes below-left unavailable everywhere, above-right available
    # except on the last column (matches x265's lowres intra estimate
    # which only uses the top/left rows anyway)
    av[:, :n] = False

    def analysis_refs(y):
        ypad = jnp.pad(y.astype(jnp.int32), ((1, 2 * n), (1, 2 * n)),
                       mode="edge")
        rows = jnp.stack([ypad[k * n:k * n + 2 * n + 1, :]
                          for k in range(gh)])
        lc = jnp.stack([rows[:, :, c * n] for c in range(gw)], 1)
        toprow = rows[:, 0, :]
        top = jnp.stack([toprow[:, c * n + 1:c * n + 1 + 2 * n]
                         for c in range(gw)], 1)
        return jnp.concatenate([lc[:, :, ::-1], top], -1).reshape(
            nb, 4 * n + 1)

    def run(cur, prev):
        cur32 = cur.astype(jnp.int32)
        ob = cur32.reshape(gh, n, gw, n).transpose(0, 2, 1, 3).reshape(
            -1, n, n)
        # intra: all 35 modes on the lowres 8x8 grid (one MXU batch)
        refs = substitute_references(analysis_refs(cur), jnp.asarray(av), 8)
        preds = predict_all_modes(refs, n, True, 8)
        icost = jnp.min(satd_fn(ob[:, None], preds), axis=1) + 4

        # inter: full-search SAD vs prev (edge-padded by r)
        pe = jnp.pad(prev.astype(jnp.int32), r, mode="edge")

        def row_body(_, dy):
            rows = jax.lax.dynamic_slice(pe, (dy, 0), (lh, lw + 2 * r))
            cand = jnp.stack([rows[:, dx:dx + lw]
                              for dx in range(2 * r + 1)])
            d = jnp.abs(cur32[None] - cand)
            return 0, d.reshape(2 * r + 1, gh, n, gw, n).sum(axis=(2, 4))

        _, cs = jax.lax.scan(row_body, 0,
                             jnp.arange(2 * r + 1, dtype=jnp.int32))
        costs = cs.transpose(2, 3, 0, 1).reshape(nb, -1)
        # small |mv| bias (the lambda*mvbits analogue of lowresMC cost)
        bias = (jnp.abs(jnp.asarray(offs)).sum(1) >> 2).astype(jnp.int32)
        idx = jnp.argmin(costs + bias[None, :], axis=1)
        pcost = jnp.take_along_axis(costs, idx[:, None], 1)[:, 0]
        mv = jnp.asarray(offs)[idx]              # (dy, dx)
        return (icost.reshape(gh, gw).astype(jnp.int32),
                pcost.reshape(gh, gw).astype(jnp.int32),
                mv.reshape(gh, gw, 2)[..., ::-1].astype(jnp.int32))

    import jax
    return jax.jit(run), (gh, gw)


def _build_bidir_program(lw, lh, r):
    """Device program: (cur, ref0, ref1, mv0, mv1) -> per-8x8-block SAD
    of cur vs the rounded average of the two integer-MV motion
    compensations (the lowres bidir predictor of x265's
    estimateFrameCost, slicetype.cpp:377)."""
    import jax
    import jax.numpy as jnp

    n = 8
    gh, gw = lh // n, lw // n
    by = (np.repeat(np.arange(gh), gw) * n).astype(np.int32)
    bx = (np.tile(np.arange(gw), gh) * n).astype(np.int32)

    def run(cur, p0, p1, mv0, mv1):
        cur32 = cur.astype(jnp.int32)
        ob = cur32.reshape(gh, n, gw, n).transpose(0, 2, 1, 3).reshape(
            -1, n, n)

        def mc(ref, mv):
            pe = jnp.pad(ref.astype(jnp.int32), r, mode="edge")
            mvf = mv.reshape(-1, 2)          # (x, y) integer lowres px
            ys = jnp.asarray(by) + jnp.clip(mvf[:, 1], -r, r) + r
            xs = jnp.asarray(bx) + jnp.clip(mvf[:, 0], -r, r) + r
            return jax.vmap(
                lambda y0, x0: jax.lax.dynamic_slice(
                    pe, (y0, x0), (n, n)))(ys, xs)

        pred = (mc(p0, mv0) + mc(p1, mv1) + 1) >> 1
        sad = jnp.abs(ob - pred).sum(axis=(1, 2))
        return sad.reshape(gh, gw).astype(jnp.int32)

    return jax.jit(run)


class Lookahead:
    """Sliding-window lookahead queue (x265 Lookahead role).

    push() returns analyzed frames ready for encoding once the window is
    deep enough; flush() drains.  Offsets returned per frame combine AQ
    and cuTree (qpCuTreeOffset semantics)."""

    def __init__(self, params, bit_depth: int = 8):
        self.p = params
        self.bit_depth = bit_depth
        self.depth = max(1, min(params.rc_lookahead, 32))
        self.cutree = bool(params.cu_tree)
        self.strength = 5.0 * (1.0 - params.qcomp)
        self.queue: list[LowresFrame] = []
        self._prog = None
        self._grid = None
        self._prev_low = None
        self._pair_cache = {}           # (id, id) -> ([gh,gw] sad, mv)
        self._bidir_prog = None

    def _analyze(self, fr: LowresFrame) -> None:
        import jax.numpy as jnp

        y = fr.planes[0]
        h2, w2 = (y.shape[0] // 2) & ~7, (y.shape[1] // 2) & ~7
        if self._prog is None:
            r = 10
            self._prog, self._grid = _build_lowres_program(w2, h2, r)
        y32 = np.asarray(y, np.uint8 if self.bit_depth == 8
                         else np.uint16).astype(np.int32)
        low = ((y32[0::2, 0::2] + y32[1::2, 0::2] + y32[0::2, 1::2]
                + y32[1::2, 1::2] + 2) >> 2)[:h2, :w2]
        low = low.astype(np.uint8 if self.bit_depth == 8 else np.uint16)
        prev = self._prev_low if self._prev_low is not None else low
        ic, pc, mv = self._prog(jnp.asarray(low), jnp.asarray(prev))
        fr.low = low
        fr.intra_cost = np.asarray(ic)
        fr.inter_cost = np.asarray(pc)
        fr.mv = np.asarray(mv)
        fr.satd_cost = float(np.minimum(fr.intra_cost,
                                        fr.inter_cost).sum())
        # invQscaleFactor (common.cpp:94 x265_exp2fix8 semantics) on the
        # lowres block grid (== full-res 16x16 grid, cropped to match)
        gh, gw = self._grid[1], self._grid[0]
        gh, gw = fr.intra_cost.shape
        aq = fr.aq_offsets[:gh, :gw] if fr.aq_offsets is not None \
            else np.zeros((gh, gw))
        fr.invq = 256.0 * np.exp2(-aq / 6.0)
        self._prev_low = low

    def push(self, planes, aq_offsets) -> list:
        """Add a display-order frame; returns frames leaving the window
        (with .final_offsets attached via cuTree) in display order."""
        fr = LowresFrame(planes, None, aq_offsets)
        self._analyze(fr)
        self.queue.append(fr)
        out = []
        while len(self.queue) > self.depth:
            out.append(self._pop())
        return out

    def flush(self) -> list:
        out = []
        while self.queue:
            out.append(self._pop())
        return out

    def _pop(self) -> tuple:
        """Run cuTree over the current window and pop the front frame.

        Returns (planes, offsets16 [gh, gw] float or None, satd_cost,
        scenecut) — scenecut is the lowres cost-ratio decision
        (x265 slicetype.cpp:1437 analogue: a frame whose inter cost is
        close to its intra cost starts a new GOP), taken here BEFORE
        dispatch so the encode pipeline never needs a mid-stream redo.
        """
        fr = self.queue[0]
        off = fr.aq_offsets
        scenecut = False
        if fr.intra_cost is not None:
            bias = self.p.scenecut_threshold / 100.0
            ic = float(fr.intra_cost.sum())
            pc = float(np.minimum(fr.intra_cost, fr.inter_cost).sum())
            scenecut = ic > 0 and pc >= (1.0 - bias) * ic
        if self.cutree and fr.intra_cost is not None:
            prop = self._propagate()
            ic = fr.intra_cost.astype(np.float64)
            weighted = ic * fr.invq / 256.0
            log2_ratio = np.where(
                weighted > 0,
                np.log2(weighted + prop + 1e-9) - np.log2(weighted + 1e-9),
                0.0)
            gh, gw = ic.shape
            base = (fr.aq_offsets[:gh, :gw]
                    if fr.aq_offsets is not None else 0.0)
            off = base - self.strength * log2_ratio
        self.queue.pop(0)
        return fr.planes, off, fr.satd_cost, scenecut, fr

    # -- b-adapt cost estimation (x265 slicetype.cpp CostEstimateGroup
    # re-cast as on-demand batched lowres programs) ------------------------

    def pair_cost(self, b_fr: LowresFrame, r_fr: LowresFrame) -> np.ndarray:
        """Per-8x8-lowres-block SAD of ``b_fr`` full-search-predicted
        from ``r_fr`` ([gh, gw] int32) plus the winning integer MVs.
        Same device program as the window analysis (estimateFrameCost's
        unidirectional list cost, slicetype.cpp:230)."""
        import jax.numpy as jnp
        k = (id(b_fr), id(r_fr))
        hit = self._pair_cache.get(k)
        if hit is not None:
            return hit
        _, pc, mv = self._prog(jnp.asarray(b_fr.low), jnp.asarray(r_fr.low))
        out = (np.asarray(pc), np.asarray(mv))
        self._pair_cache[k] = out
        if len(self._pair_cache) > 256:
            self._pair_cache.pop(next(iter(self._pair_cache)))
        return out

    def bidir_cost(self, b_fr: LowresFrame, p0: LowresFrame,
                   p1: LowresFrame) -> float:
        """Frame cost of coding ``b_fr`` as a B with references (p0, p1):
        per block min(intra, list0, list1, bidir-average) summed — the
        bidir term is the SAD against the average of the two
        motion-compensated predictions at the searched integer MVs
        (x265 slicetype.cpp:377 estimateFrameCost's bidir path; without
        it the trellis degenerates to all-P, since unidirectional SAD
        never beats the adjacent-frame chain)."""
        pc0, mv0 = self.pair_cost(b_fr, p0)
        pc1, mv1 = self.pair_cost(b_fr, p1)
        if self._bidir_prog is None:
            self._bidir_prog = _build_bidir_program(*b_fr.low.shape[::-1],
                                                    r=10)
        import jax.numpy as jnp
        bi = np.asarray(self._bidir_prog(
            jnp.asarray(b_fr.low), jnp.asarray(p0.low),
            jnp.asarray(p1.low), jnp.asarray(mv0), jnp.asarray(mv1)))
        per_blk = np.minimum.reduce([
            b_fr.intra_cost.astype(np.int64), pc0.astype(np.int64),
            pc1.astype(np.int64), bi.astype(np.int64)])
        return float(per_blk.sum())

    def p_cost(self, b_fr: LowresFrame, ref_fr: LowresFrame) -> float:
        """Frame cost of coding ``b_fr`` as a P predicted from
        ``ref_fr``: per block min(intra, list0) summed."""
        pc, _ = self.pair_cost(b_fr, ref_fr)
        return float(np.minimum(b_fr.intra_cost.astype(np.int64),
                                pc.astype(np.int64)).sum())

    def _propagate(self) -> np.ndarray:
        """estimateCUPropagate (slicetype.cpp:1741) over the window: each
        frame's (aq-weighted intra cost + inherited propagation) flows to
        the previous frame's blocks along the lowres MVs, weighted by how
        predictable the block was ((intra - inter) / intra)."""
        q = self.queue
        gh, gw = q[0].intra_cost.shape
        prop = np.zeros((gh, gw), np.float64)   # flowing INTO q[i-1]
        for i in range(len(q) - 1, 0, -1):
            fr = q[i]
            ic = fr.intra_cost.astype(np.float64)
            pc = np.minimum(ic, fr.inter_cost.astype(np.float64))
            weighted = ic * fr.invq / 256.0
            amount = (weighted + prop) * np.maximum(ic - pc, 0.0) \
                / np.maximum(ic, 1.0)
            # scatter along MVs with bilinear splitting (x265 CLIP_ADD
            # block); MVs are lowres integer pixels, blocks are 8x8
            nxt = np.zeros((gh, gw), np.float64)
            by = np.repeat(np.arange(gh), gw)
            bx = np.tile(np.arange(gw), gh)
            mv = fr.mv.reshape(-1, 2)
            a = amount.reshape(-1)
            fx = bx * 8 + mv[:, 0]
            fy = by * 8 + mv[:, 1]
            cux = np.floor_divide(fx, 8)
            cuy = np.floor_divide(fy, 8)
            wx = (fx - cux * 8) / 8.0
            wy = (fy - cuy * 8) / 8.0
            for dx, dy, wgt in ((0, 0, (1 - wx) * (1 - wy)),
                                (1, 0, wx * (1 - wy)),
                                (0, 1, (1 - wx) * wy),
                                (1, 1, wx * wy)):
                X = cux + dx
                Y = cuy + dy
                ok = (X >= 0) & (X < gw) & (Y >= 0) & (Y < gh)
                np.add.at(nxt, (Y[ok], X[ok]), a[ok] * wgt[ok])
            prop = nxt
        return prop
