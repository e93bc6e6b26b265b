"""Fused per-frame device pipelines.

The encoder's device work for one frame — intra mode analysis, motion
estimation with subpel refinement, chroma MC, and the three wavefront
reconstruction scans — is compiled as ONE XLA program per frame type.
Intermediates (predictions, costs) never leave the device; the host only
receives the recon planes, quantized levels and decisions.  This matters
doubly here: every dispatch costs a device-link roundtrip (~45 ms through
the axon tunnel) and transfers run at ~30 MB/s.

Replaces the reference's per-kernel primitives calls with whole-frame
compiled programs (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import numpy as np


def _analyse_builder(enc, n, gh, gw, ph, pw):
    """Open-loop all-modes SATD analysis at block size n (batched matmul
    over the 35-mode weight tensor; x265 intra analysis analogue)."""
    import jax.numpy as jnp

    from ..ops.cost import satd
    from ..ops.intra import predict_all_modes, substitute_references

    ridx, avails = enc._mode_gather_tables(n, gh, gw, ph, pw)

    def analyse(y):
        refs = y.reshape(-1)[jnp.asarray(ridx)].astype(jnp.int32)
        refs = substitute_references(refs, jnp.asarray(avails),
                                     enc.bit_depth)
        preds = predict_all_modes(refs, n, True, enc.bit_depth)
        blocks = y.astype(jnp.int32).reshape(gh, n, gw, n).transpose(
            0, 2, 1, 3).reshape(-1, n, n)
        costs = satd(blocks[:, None], preds)
        return (jnp.argmin(costs, axis=1).astype(jnp.int32),
                jnp.min(costs, axis=1))

    return analyse


def build_i_pipeline(enc):
    """I-frame device program: intra analysis (16 + 32) + CTU-wavefront
    recon with the in-scan 32-vs-16 RD CU decision (encoder/ctu_scan.py).

    Returns fn(orig planes x3, qp x3, lam) -> (modes [B16], mode32 [B32],
    use32 [B32], rec x3, lv16_y, lv8_cb, lv8_cr, lv32_y, lv16_cb,
    lv16_cr).
    """
    import jax
    import jax.numpy as jnp

    g = enc.geom
    n = 16
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    gh, gw = ph // n, pw // n
    scan = enc._get_ctu_scan()
    decide = bool(scan.t["has32"]) and not enc.force_cu16
    run_scan = scan.scan_fn(inter=False, decide32=decide)
    B32 = scan.t["b32_n"]
    nctb = g.n_ctbs
    analyse = _analyse_builder(enc, n, gh, gw, ph, pw)
    analyse32 = (_analyse_builder(enc, 32, ph // 32, pw // 32, ph, pw)
                 if decide else None)

    def run(oy, ocb, ocr, qpy, qpb, qpr, lam):
        modes, _cost = analyse(oy)
        if decide:
            mode32, _c32 = analyse32(oy)
        else:
            mode32 = jnp.zeros((B32,), jnp.int32)
        out = run_scan(oy, ocb, ocr, modes, mode32,
                       jnp.zeros((B32,), bool),
                       jnp.full((nctb,), qpy, jnp.int32),
                       jnp.full((nctb,), qpb, jnp.int32),
                       jnp.full((nctb,), qpr, jnp.int32),
                       lam=jnp.full((nctb,), lam, jnp.float32))
        return (modes, mode32, out[9]) + out[:9]

    return jax.jit(run)


def build_p_pipeline(enc):
    """P-frame device program: intra analysis + full+subpel ME + chroma MC
    + inter/intra decision + CTU-wavefront recon (one lax.scan).

    fn(orig x3, ref_y_ext, ref_cb_ext, ref_cr_ext, qps, lam) ->
       (modes, mode32, use32, mv_qpel [B, 2] (x, y), inter_mask [B],
        rec x3, lv16_y, lv8_cb, lv8_cr, lv32_y, lv16_cb, lv16_cr,
        cost_p, cost_i).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.cost import satd as satd_fn
    from ..ops.interp import mc_chroma_batch, mc_luma_batch

    g = enc.geom
    n = 16
    R = enc.me_range
    M = R + 8
    CM = R // 2 + 4
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    gh, gw = ph // n, pw // n
    nb = gh * gw
    cn = n // 2
    cph, cpw = ph // 2, pw // 2
    scan = enc._get_ctu_scan()
    decide = bool(scan.t["has32"]) and not enc.force_cu16
    run_scan = scan.scan_fn(inter=True, decide32=decide)
    B32 = scan.t["b32_n"]
    nctb = g.n_ctbs
    analyse16 = _analyse_builder(enc, n, gh, gw, ph, pw)
    analyse32 = (_analyse_builder(enc, 32, ph // 32, pw // 32, ph, pw)
                 if decide else None)

    offs = np.array([(dy, dx) for dy in range(-R, R + 1)
                     for dx in range(-R, R + 1)], np.int32)
    deltas = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
              if (dy, dx) != (0, 0)]

    def to_blocks(pl, bn):
        return pl.reshape(gh, bn, gw, bn).transpose(
            0, 2, 1, 3).reshape(-1, bn, bn)

    def analyse(y):
        modes, icost = analyse16(y)
        return modes, icost, to_blocks(y.astype(jnp.int32), n)

    def me(orig, ref_ext, ob, qp):
        def body(carry, off):
            best_c, best_i, i = carry
            shifted = jax.lax.dynamic_slice(
                ref_ext, (off[0] + M, off[1] + M), (ph, pw))
            d = jnp.abs(orig - shifted)
            c = d.reshape(gh, n, gw, n).sum(axis=(1, 3))
            better = c < best_c
            return (jnp.where(better, c, best_c),
                    jnp.where(better, i, best_i), i + 1), None

        init = (jnp.full((gh, gw), 2 ** 30, jnp.int32),
                jnp.zeros((gh, gw), jnp.int32), jnp.int32(0))
        (_, idx, _), _ = jax.lax.scan(body, init, jnp.asarray(offs))
        mvi = jnp.asarray(offs)[idx].reshape(-1, 2)      # [B] (dy, dx)

        oy = np.arange(n + 9)
        by = (np.repeat(np.arange(gh), gw) * n + M - 4)
        bx = (np.tile(np.arange(gw), gh) * n + M - 4)
        rows = (jnp.asarray(by) + mvi[:, 0])[:, None] + oy[None, :]
        cols = (jnp.asarray(bx) + mvi[:, 1])[:, None] + oy[None, :]
        W = ref_ext[rows[:, :, None], cols[:, None, :]]

        def eval_q(q):
            iy = (q[:, 0] >> 2) + 4
            ix = (q[:, 1] >> 2) + 4
            win = jax.vmap(
                lambda w, y, x: jax.lax.dynamic_slice(
                    w, (y - 3, x - 3), (n + 7, n + 7)))(W, iy, ix)
            pred = mc_luma_batch(win, q[:, 1] & 3, q[:, 0] & 3, n, n,
                                 enc.bit_depth)
            return pred, satd_fn(ob, pred)

        def refine(center, best_pred, best_c, step):
            best_q = center
            for d in deltas:
                q = center + jnp.asarray(d) * step
                pred, c = eval_q(q)
                better = c < best_c
                best_c = jnp.where(better, c, best_c)
                best_pred = jnp.where(better[:, None, None], pred, best_pred)
                best_q = jnp.where(better[:, None], q, best_q)
            return best_q, best_pred, best_c

        q0 = jnp.zeros_like(mvi)
        pred0, c0 = eval_q(q0)
        q0, pred, cost = refine(q0, pred0, c0, 2)
        q0, pred, cost = refine(q0, pred, cost, 1)
        mvq = mvi * 4 + q0                                # [B, 2] (y, x) qpel

        # ---- MV coherence passes (x265's lambda*mvd-cost analogue) ----
        # adopt the west/north neighbor's MV when its SATD is within a
        # lambda bias — uniform-MV runs enable 32/64 CU merges and cheap
        # merge/skip syntax.  Evaluated batched via full-window gathers.
        # ~ lambda * typical mvd bits (SATD-domain lambda = 2^((qp-12)/6))
        lam_bias = 12.0 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 6.0)

        oy2 = np.arange(n + 7)
        byb = jnp.asarray(np.repeat(np.arange(gh), gw) * n + M)
        bxb = jnp.asarray(np.tile(np.arange(gw), gh) * n + M)

        def eval_mv(mvq_c):
            iy = (mvq_c[:, 0] >> 2)
            ix = (mvq_c[:, 1] >> 2)
            rows = (byb + iy - 3)[:, None] + oy2[None, :]
            cols = (bxb + ix - 3)[:, None] + oy2[None, :]
            win = ref_ext[rows[:, :, None], cols[:, None, :]]
            p = mc_luma_batch(win, mvq_c[:, 1] & 3, mvq_c[:, 0] & 3, n, n,
                              enc.bit_depth)
            return p, satd_fn(ob, p)

        def adopt(mvq, pred, cost, shift_axis):
            g2 = mvq.reshape(gh, gw, 2)
            cand = jnp.roll(g2, 1, axis=shift_axis).reshape(-1, 2)
            # clamp candidates into the gathered margin
            cand = jnp.clip(cand, -4 * R, 4 * R)
            p, c = eval_mv(cand[:, ::-1])        # eval takes (y, x)
            better = (c.astype(jnp.float32)
                      < cost.astype(jnp.float32) + lam_bias) & \
                (jnp.arange(nb) // gw > 0 if shift_axis == 0
                 else jnp.arange(nb) % gw > 0)
            mvq = jnp.where(better[:, None], cand, mvq)
            pred = jnp.where(better[:, None, None], p, pred)
            cost = jnp.where(better, c, cost)
            return mvq, pred, cost

        mvxy = mvq[:, ::-1]                      # (x, y)
        for _ in range(2):
            mvxy, pred, cost = adopt(mvxy, pred, cost, shift_axis=1)
        for _ in range(2):
            mvxy, pred, cost = adopt(mvxy, pred, cost, shift_axis=0)
        return mvxy, cost, pred

    def chroma_pred(ref_ext, mv):
        # mv [B, 2] (x, y) qpel == chroma eighth-pel
        icx = mv[:, 0] >> 3
        icy = mv[:, 1] >> 3
        oy = np.arange(cn + 3)
        by = (np.repeat(np.arange(gh), gw) * cn + CM - 1)
        bx = (np.tile(np.arange(gw), gh) * cn + CM - 1)
        rows = (jnp.asarray(by) + icy)[:, None] + oy[None, :]
        cols = (jnp.asarray(bx) + icx)[:, None] + oy[None, :]
        wins = ref_ext[rows[:, :, None], cols[:, None, :]]
        return mc_chroma_batch(wins, mv[:, 0] & 7, mv[:, 1] & 7, cn, cn,
                               enc.bit_depth)

    def run(oy, ocb, ocr, ref_y_ext, ref_cb_ext, ref_cr_ext,
            qpy, qpb, qpr, lam):
        modes, icost, ob = analyse(oy)
        if decide:
            mode32, _c32 = analyse32(oy)
        else:
            mode32 = jnp.zeros((B32,), jnp.int32)
        mv, pcost, pred_y = me(oy.astype(jnp.int32),
                               ref_y_ext.astype(jnp.int32), ob, qpy)
        # intra blocks in P slices cost far more bits than SATD reflects
        # (mode + full coefficients); bias the decision toward inter
        inter = pcost.reshape(-1).astype(jnp.int64) <= (
            icost.astype(jnp.int64) * 9) // 8
        pred_cb = chroma_pred(ref_cb_ext.astype(jnp.int32), mv)
        pred_cr = chroma_pred(ref_cr_ext.astype(jnp.int32), mv)
        out = run_scan(oy, ocb, ocr, modes, mode32,
                       jnp.zeros((B32,), bool),
                       jnp.full((nctb,), qpy, jnp.int32),
                       jnp.full((nctb,), qpb, jnp.int32),
                       jnp.full((nctb,), qpr, jnp.int32),
                       lam=jnp.full((nctb,), lam, jnp.float32),
                       is_inter=inter, ipred_y=pred_y,
                       ipred_cb=pred_cb, ipred_cr=pred_cr)
        # frame-level costs for the scenecut decision (x265 slicetype
        # analysis analogue): P cost = per-block best of inter/intra
        cost_p = jnp.sum(jnp.minimum(pcost.reshape(-1), icost))
        cost_i = jnp.sum(icost)
        return (modes, mode32, out[9], mv.astype(jnp.int16), inter,
                ) + out[:9] + (cost_p, cost_i)

    return jax.jit(run)
