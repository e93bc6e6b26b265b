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


def _filter_stage_builder(enc):
    """In-pipeline loop filters: coeff-plane merge + deblock + SAO.

    Returns finish(oy3, scan_out, qp_base, dqp_cb, dqp_cr, sao_lam,
    inter=None, mv=None) -> (final planes x3, coeff planes x3, sao params
    x4) — everything the host needs, so per-frame device output is one
    compact transfer (x265 frameFilter role, SURVEY §2.6 P7 as fused
    stages instead of pipelined rows).
    """
    import jax.numpy as jnp

    from ..ops.deblock import deblock_picture_jnp, edge_masks_np
    from ..ops.sao import (eo_valid_masks_np, sao_apply_plane_jnp,
                           sao_estimate_plane_jnp)

    g = enc.geom
    p = enc.params
    bd = enc.bit_depth
    ctb = 1 << g.log2_ctb
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    gh, gw = ph // 16, pw // 16
    B16 = gh * gw
    has32 = ctb >= 32
    gh32, gw32 = (ph // 32, pw // 32) if has32 else (1, 1)
    masks = edge_masks_np(g, g.log2_ctb)
    eo_y, in_y = eo_valid_masks_np(ph, pw, g.width, g.height)
    eo_c, in_c = eo_valid_masks_np(ph // 2, pw // 2, g.width // 2,
                                   g.height // 2)
    out_dtype = jnp.uint8 if bd == 8 else jnp.uint16
    aq = bool(p.aq_mode)
    cbo, cro = enc.pps.cb_qp_offset, enc.pps.cr_qp_offset
    chw, cww = g.ctbs_h, g.ctbs_w
    n4ctb = ctb // 4

    def _chroma_qp_jnp(qp, offset):
        from ..cabac.ctu import _CHROMA_QP_MAP
        from ..ops._util import take_small
        qpi = jnp.clip(qp + offset, -12, 57)
        return jnp.where(qpi < 30, jnp.maximum(0, qpi),
                         jnp.where(qpi > 43, qpi - 6,
                                   take_small(_CHROMA_QP_MAP,
                                              jnp.clip(qpi - 30, 0, 13))))

    # z-order index of every 16x16 block within its CTB (first-coded-CU
    # boundary for the per-CU deblock QP, see _qp_planes)
    n16ctb = ctb // 16
    _z16 = np.zeros((gh, gw), np.int32)
    for _by in range(gh):
        for _bx in range(gw):
            x, y, z = _bx % n16ctb, _by % n16ctb, 0
            for _i in range(4):
                z |= ((x >> _i) & 1) << (2 * _i)
                z |= ((y >> _i) & 1) << (2 * _i + 1)
            _z16[_by, _bx] = z

    def _qp_planes(cy, ccb, ccr, use32, merged, qp_base_ctb, slice_qp):
        """(actual per-CTB QP [nctb], per-4x4 QpY plane).

        §8.6.1 semantics at QG == CTB: a QG with no coded coefficients
        keeps the predicted QP (previous QG's actual, slice QP first) —
        an associative last-valid scan.  Within a coded QG, CUs that
        z-precede the first coefficient-bearing CU were decoded before
        the delta and keep the predicted QP (libde265 transform.cc:31).
        ``merged`` = (m32 [gh32, gw32], m64 [chw, cww]) inter CU merges
        (the device twin of the host _merge_inter_cus decision) or None.
        """
        import jax

        def rep2(a):
            return jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)

        has16 = (jnp.any(cy.reshape(gh, 16, gw, 16) != 0, axis=(1, 3))
                 | jnp.any(ccb.reshape(gh, 8, gw, 8) != 0, axis=(1, 3))
                 | jnp.any(ccr.reshape(gh, 8, gw, 8) != 0, axis=(1, 3)))
        # per-16-block z index of the CONTAINING CU's first block, and
        # has-any-coeff broadcast over each CU
        cuz = jnp.asarray(_z16)
        has_cu = has16
        if has32:
            q32 = use32.reshape(gh32, gw32)
            if merged is not None:
                q32 = q32 | merged[0]
            zq = jnp.asarray(_z16)[0::2, 0::2]     # quad base z
            q_has = jnp.any(has16.reshape(gh32, 2, gw32, 2), axis=(1, 3))
            cuz = jnp.where(rep2(q32), rep2(zq), cuz)
            has_cu = jnp.where(rep2(q32), rep2(q_has), has_cu)
        hasctb = jnp.any(
            has16.reshape(chw, n16ctb, cww, n16ctb), axis=(1, 3))
        if merged is not None and ctb == 64:
            m64 = merged[1]
            r64 = jnp.repeat(jnp.repeat(m64, n16ctb, 0), n16ctb, 1)
            cuz = jnp.where(r64, 0, cuz)
            hc = jnp.repeat(jnp.repeat(hasctb, n16ctb, 0), n16ctb, 1)
            has_cu = jnp.where(r64, hc, has_cu)

        def comb(a, b):
            av, aq_ = a
            bv, bq = b
            return av | bv, jnp.where(bv, bq, aq_)

        valid, qch = jax.lax.associative_scan(
            comb, (hasctb.reshape(-1), qp_base_ctb))
        actual = jnp.where(valid, qch, slice_qp)
        pred = jnp.concatenate([jnp.asarray([0], jnp.int32)
                                + slice_qp, actual[:-1]])
        # first coded CU's z per CTB; blocks in z-earlier CUs -> pred
        zz = jnp.where(has_cu, cuz, 1 << 20)
        firstz = jnp.min(zz.reshape(chw, n16ctb, cww, n16ctb),
                         axis=(1, 3))
        before16 = cuz < jnp.repeat(
            jnp.repeat(firstz, n16ctb, 0), n16ctb, 1)
        a16 = jnp.repeat(jnp.repeat(actual.reshape(chw, cww),
                                    n16ctb, 0), n16ctb, 1)
        p16 = jnp.repeat(jnp.repeat(pred.reshape(chw, cww),
                                    n16ctb, 0), n16ctb, 1)
        qp16 = jnp.where(before16, p16, a16)
        qp4 = jnp.repeat(jnp.repeat(qp16, 4, 0), 4, 1)
        return actual, qp4

    # static in-bounds masks for the inter CU merge twin
    _inb32 = np.zeros((gh32, gw32), bool)
    for _qy in range(gh32):
        for _qx in range(gw32):
            _inb32[_qy, _qx] = (_qx * 32 + 32 <= g.width
                                and _qy * 32 + 32 <= g.height)
    _inb64 = np.zeros((chw, cww), bool)
    for _cy2 in range(chw):
        for _cx2 in range(cww):
            _inb64[_cy2, _cx2] = ((_cx2 + 1) << g.log2_ctb) <= g.width \
                and ((_cy2 + 1) << g.log2_ctb) <= g.height

    def merged_masks(inter, fields):
        """Device twin of the host inter-CU merge (_merge_inter_cus):
        (m32 [gh32, gw32], m64 [chw, cww]) — aligned quads of inter
        blocks with identical motion merge to 32/64 CUs."""
        if not has32:
            return None
        ig = inter.reshape(gh, gw)
        ff = jnp.concatenate(
            [f.reshape(gh, gw, -1).astype(jnp.int32) for f in fields], -1)
        q = ff.reshape(gh32, 2, gw32, 2, -1)
        same32 = jnp.all(q == q[:, :1, :, :1], axis=(1, 3, 4))
        i32 = jnp.all(ig.reshape(gh32, 2, gw32, 2), axis=(1, 3))
        m32 = same32 & i32 & jnp.asarray(_inb32)
        if ctb == 64:
            q6 = ff.reshape(chw, 4, cww, 4, -1)
            same64 = jnp.all(q6 == q6[:, :1, :, :1], axis=(1, 3, 4))
            i64 = jnp.all(ig.reshape(chw, 4, cww, 4), axis=(1, 3))
            m64 = same64 & i64 & jnp.asarray(_inb64)
        else:
            m64 = jnp.zeros((chw, cww), bool)
        return m32, m64

    def _qp_edge_maps(qp4):
        """(luma, cb, cr) per-edge QP map pairs for the deblock stage."""
        qv = (jnp.roll(qp4, 1, axis=1) + qp4 + 1) >> 1
        qh = (jnp.roll(qp4, 1, axis=0) + qp4 + 1) >> 1
        qvc, qhc = qv[::2, ::2], qh[::2, ::2]
        return ((qv, qh),
                (_chroma_qp_jnp(qvc, cbo), _chroma_qp_jnp(qhc, cbo)),
                (_chroma_qp_jnp(qvc, cro), _chroma_qp_jnp(qhc, cro)))

    def to_plane(lv, gh_, gw_, bn):
        return lv.reshape(gh_, gw_, bn, bn).transpose(0, 2, 1, 3).reshape(
            gh_ * bn, gw_ * bn)

    def rep(a, f):
        return jnp.repeat(jnp.repeat(a, f, 0), f, 1)

    def finish(oy3, scan_out, qp_base, dqp_cb, dqp_cr, sao_lam,
               inter=None, mv=None, motion_b=None, qp_base_ctb=None,
               merged=None):
        (rec_y, rec_cb, rec_cr, lv16_y, lv8_cb, lv8_cr,
         lv32_y, lv16_cb, lv16_cr, use32, _tu8, _nr) = scan_out
        # ---- coefficient planes (merged by the CU decision) ----
        cy = to_plane(lv16_y, gh, gw, 16)
        ccb = to_plane(lv8_cb, gh, gw, 8)
        ccr = to_plane(lv8_cr, gh, gw, 8)
        if has32:
            u = use32.reshape(gh32, gw32)
            m = rep(u, 32)
            cy = jnp.where(m, to_plane(lv32_y, gh32, gw32, 32), cy)
            mc = rep(u, 16)
            ccb = jnp.where(mc, to_plane(lv16_cb, gh32, gw32, 16), ccb)
            ccr = jnp.where(mc, to_plane(lv16_cr, gh32, gw32, 16), ccr)
        planes = (rec_y.astype(jnp.int32), rec_cb.astype(jnp.int32),
                  rec_cr.astype(jnp.int32))

        # ---- per-CTB actual QP (cu_qp_delta) ----
        if aq:
            qp_actual, qp4 = _qp_planes(cy, ccb, ccr,
                                        use32 if has32 else None,
                                        merged, qp_base_ctb, qp_base)
            dqp_y, dqp_cb, dqp_cr = _qp_edge_maps(qp4)
        else:
            nctb_ = g.n_ctbs
            qp_actual = jnp.full((nctb_,), qp_base, jnp.int32)
            dqp_y = qp_base

        # ---- deblocking ----
        if p.deblock:
            if inter is not None:
                intra4 = rep(~inter.reshape(gh, gw), 4)
                mv4 = jnp.repeat(jnp.repeat(
                    mv.reshape(gh, gw, 2), 4, 0), 4, 1).astype(jnp.int32)
            else:
                intra4 = jnp.ones((ph // 4, pw // 4), bool)
                mv4 = jnp.zeros((ph // 4, pw // 4, 2), jnp.int32)
            cbf16 = jnp.any(lv16_y != 0, axis=(1, 2)).reshape(gh, gw)
            cbf4 = rep(cbf16, 4)
            if has32:
                cbf32 = jnp.any(lv32_y != 0, axis=(1, 2)).reshape(gh32,
                                                                  gw32)
                cbf4 = jnp.where(rep(u, 8), rep(cbf32, 8), cbf4)
            planes = deblock_picture_jnp(
                planes, intra4, cbf4, mv4,
                u if has32 else None, masks, dqp_y, dqp_cb, dqp_cr,
                bd, p.deblock_beta_offset, p.deblock_tc_offset,
                motion_b=motion_b)

        # ---- SAO (estimate + joint decision + apply) ----
        nctb = g.n_ctbs
        if p.sao:
            oy, ocb, ocr = (x.astype(jnp.int32) for x in oy3)
            ch_, cw_ = g.ctbs_h, g.ctbs_w
            dist, offs, bpos, bits = sao_estimate_plane_jnp(
                oy, planes[0], ch_, cw_, ctb, jnp.asarray(eo_y),
                jnp.asarray(in_y), bd)
            cost = dist + sao_lam * bits
            cost = cost.at[..., 0].set(0.0)
            best = jnp.argmin(cost, axis=-1).astype(jnp.int32)
            db, ob, pb, bb = sao_estimate_plane_jnp(
                ocb, planes[1], ch_, cw_, ctb // 2, jnp.asarray(eo_c),
                jnp.asarray(in_c), bd)
            dr, orr, pr, br = sao_estimate_plane_jnp(
                ocr, planes[2], ch_, cw_, ctb // 2, jnp.asarray(eo_c),
                jnp.asarray(in_c), bd)
            cost_c = db + dr + sao_lam * (bb + br)
            cost_c = cost_c.at[..., 0].set(0.0)
            best_c = jnp.argmin(cost_c, axis=-1).astype(jnp.int32)

            def params_of(best_, offs_, bpos_):
                types = jnp.where(best_ == 0, 0,
                                  jnp.where(best_ == 5, 1, 2))
                klass = jnp.clip(best_ - 1, 0, 3)
                osel = jnp.take_along_axis(
                    offs_, best_[..., None, None], axis=-2)[..., 0, :]
                return types, klass, osel.astype(jnp.int32), bpos_

            ty, ky, oy_sel, by_ = params_of(best, offs, bpos)
            tc_, kc, ob_sel, bb_ = params_of(best_c, ob, pb)
            _, _, or_sel, br_ = params_of(best_c, orr, pr)
            y_f = sao_apply_plane_jnp(planes[0], ch_, cw_, ctb, ty, ky,
                                      by_, oy_sel, jnp.asarray(eo_y), bd)
            cb_f = sao_apply_plane_jnp(planes[1], ch_, cw_, ctb // 2, tc_,
                                       kc, bb_, ob_sel,
                                       jnp.asarray(eo_c), bd)
            cr_f = sao_apply_plane_jnp(planes[2], ch_, cw_, ctb // 2, tc_,
                                       kc, br_, or_sel,
                                       jnp.asarray(eo_c), bd)
            planes = (y_f, cb_f, cr_f)
            sao_type = jnp.stack([ty.reshape(-1), tc_.reshape(-1)], axis=1)
            sao_class = jnp.stack([ky.reshape(-1), kc.reshape(-1)], axis=1)
            sao_bpos = jnp.stack([by_.reshape(-1), bb_.reshape(-1),
                                  br_.reshape(-1)], axis=1)
            sao_offs = jnp.stack([oy_sel.reshape(-1, 4),
                                  ob_sel.reshape(-1, 4),
                                  or_sel.reshape(-1, 4)], axis=1)
        else:
            sao_type = jnp.zeros((nctb, 2), jnp.int32)
            sao_class = jnp.zeros((nctb, 2), jnp.int32)
            sao_bpos = jnp.zeros((nctb, 3), jnp.int32)
            sao_offs = jnp.zeros((nctb, 3, 4), jnp.int32)

        # ---- transfer-diet output packing ----
        # The device link costs ~50 ms latency per fetch and ~10-20 MB/s
        # down, so per-frame output is tiered: a small always-fetched
        # dict (fetched as ONE packed buffer — see fetch_packed) with
        # nonzero-compacted luma AND chroma coefficients + slim-dtype
        # syntax, plus device-resident tails (full int8/int16 planes,
        # recon) fetched only on overflow / when the host needs pixels.
        ovf = ((jnp.abs(cy) > 127).sum() + (jnp.abs(ccb) > 127).sum()
               + (jnp.abs(ccr) > 127).sum()).astype(jnp.int32)

        def compact8(plane_blocks, cap):
            nz = jnp.any(plane_blocks != 0, axis=(1, 2))
            pos = jnp.where(nz, jnp.cumsum(nz) - 1, cap)
            buf = jnp.zeros((cap + 1, 8, 8), jnp.int8).at[pos].set(
                jnp.clip(plane_blocks, -128, 127).astype(jnp.int8),
                mode="drop")[:cap]
            return nz, buf, nz.sum().astype(jnp.int32)

        # luma: nonzero 8x8 subblocks (typical P occupancy at medium QP
        # is 3-12%; dense low-QP/I frames overflow to the plane tiers)
        cap = max(1, (B16 * 4) // 8)
        yb = cy.reshape(ph // 8, 8, pw // 8, 8).transpose(
            0, 2, 1, 3).reshape(-1, 8, 8)
        nz, buf, count_y = compact8(yb, cap)
        # chroma: both planes through one compacted buffer
        cap_c = max(1, (B16 * 2) // 8)
        cbb = jnp.concatenate([
            p.reshape(ph // 16, 8, pw // 16, 8).transpose(
                0, 2, 1, 3).reshape(-1, 8, 8) for p in (ccb, ccr)])
        c_nz, c_buf, count_c = compact8(cbb, cap_c)

        small = dict(
            c_nzmask=c_nz, c_buf=c_buf, c_count=count_c,
            y_nzmask=nz, y_buf=buf, y_count=count_y,
            ovf=ovf, qp_actual=qp_actual.astype(jnp.uint8),
            checksums=_plane_checksums(planes, bd, g),
            sao_type=sao_type.astype(jnp.uint8),
            sao_class=sao_class.astype(jnp.uint8),
            sao_bpos=sao_bpos.astype(jnp.uint8),
            sao_offs=sao_offs.astype(jnp.int8))
        if merged is not None:
            small["m32"], small["m64"] = merged
        tails = dict(
            cy16=cy.astype(jnp.int16), ccb16=ccb.astype(jnp.int16),
            ccr16=ccr.astype(jnp.int16),
            cy8=jnp.clip(cy, -128, 127).astype(jnp.int8),
            ccb8=jnp.clip(ccb, -128, 127).astype(jnp.int8),
            ccr8=jnp.clip(ccr, -128, 127).astype(jnp.int8),
            rec_coded=tuple(pl.astype(out_dtype)[:dim[0], :dim[1]]
                            for pl, dim in zip(
                                planes, ((g.height, g.width),
                                         (g.height // 2, g.width // 2),
                                         (g.height // 2, g.width // 2)))),
            rec_conf=_conf_crop(planes, out_dtype))
        # third element: full padded final planes, consumed in-program by
        # the DPB extension (never transferred)
        return small, tails, tuple(pl.astype(out_dtype) for pl in planes)

    # conformance-window crop of the final planes (EncodedFrame.recon)
    cw0, cr0, ct0, cb0 = getattr(enc.sps, "conf_win", (0, 0, 0, 0))
    _wl = g.width - 2 * (cw0 + cr0)
    _hl = g.height - 2 * (ct0 + cb0)

    def _conf_crop(planes, out_dtype):
        y, cb_, cr_ = planes
        return (y.astype(out_dtype)[2 * ct0:2 * ct0 + _hl,
                                    2 * cw0:2 * cw0 + _wl],
                cb_.astype(out_dtype)[ct0:ct0 + _hl // 2,
                                      cw0:cw0 + _wl // 2],
                cr_.astype(out_dtype)[ct0:ct0 + _hl // 2,
                                      cw0:cw0 + _wl // 2])

    finish.merged_masks = merged_masks
    return finish


def _plane_checksums(planes, bit_depth, g):
    """Device twin of common/sei.py plane_checksum (H.265 D.3.19): the
    32-bit position-masked byte sum per plane, computed on device so the
    host never fetches recon pixels for the hash SEI."""
    import jax.numpy as jnp

    def one(pl, h, w):
        p = pl[:h, :w].astype(jnp.uint32)
        xs = jnp.arange(w, dtype=jnp.uint32)
        ys = jnp.arange(h, dtype=jnp.uint32)
        mask = (((xs & 0xFF) ^ (xs >> 8))[None, :]
                ^ ((ys & 0xFF) ^ (ys >> 8))[:, None])
        s = jnp.sum((p & 0xFF) ^ mask, dtype=jnp.uint32)
        if bit_depth > 8:
            s = s + jnp.sum((p >> 8) ^ mask, dtype=jnp.uint32)
        return s

    return jnp.stack([one(planes[0], g.height, g.width),
                      one(planes[1], g.height // 2, g.width // 2),
                      one(planes[2], g.height // 2, g.width // 2)])


def _analyse_builder(enc, n, gh, gw, ph, pw):
    """Open-loop all-modes SATD analysis at block size n (batched matmul
    over the 35-mode weight tensor; x265 intra analysis analogue).

    Reference vectors are assembled from STATIC slices of the plane
    (per-block index gathers cost ~40 ms at 1080p; slices are free)."""
    import jax.numpy as jnp

    from ..ops.cost import satd
    from ..ops.intra import predict_all_modes, substitute_references

    _, avails = enc._mode_gather_tables(n, gh, gw, ph, pw)

    def analysis_refs(y):
        """[B, 4n+1] canonical (unsubstituted) open-loop references:
        reversed left column (incl. corner) + top row, via static
        slices of the edge-padded source plane."""
        ypad = jnp.pad(y.astype(jnp.int32), ((1, 2 * n), (1, 2 * n)),
                       mode="edge")
        rows = jnp.stack([ypad[r * n:r * n + 2 * n + 1, :]
                          for r in range(gh)])        # [gh, 2n+1, pwp]
        lc = jnp.stack([rows[:, :, c * n] for c in range(gw)], 1)
        toprow = rows[:, 0, :]                        # [gh, pwp]
        top = jnp.stack([toprow[:, c * n + 1:c * n + 1 + 2 * n]
                         for c in range(gw)], 1)      # [gh, gw, 2n]
        return jnp.concatenate([lc[:, :, ::-1], top], -1).reshape(
            gh * gw, 4 * n + 1)

    def analyse(y):
        refs = substitute_references(analysis_refs(y), jnp.asarray(avails),
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
    recon with the in-scan 32-vs-16 RD CU decision (encoder/ctu_scan.py)
    + in-pipeline deblock/SAO loop filters.

    Returns fn(orig planes x3, qp x3, lam, qp_base, dqp_cb, dqp_cr,
    sao_lam) -> (modes [B16], mode32 [B32], use32 [B32],
    final planes x3, coeff planes x3, sao params x4).
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
    finish = _filter_stage_builder(enc)

    extend = _extend_builder(enc)

    def run(oy, ocb, ocr, qpy, qpb, qpr, lam, qp_base, dqp_cb, dqp_cr,
            sao_lam, qp_base_ctb, nr_offsets=None):
        modes, _cost = analyse(oy)
        if decide:
            mode32, _c32 = analyse32(oy)
        else:
            mode32 = jnp.zeros((B32,), jnp.int32)
        out = run_scan(oy, ocb, ocr, modes, mode32,
                       jnp.zeros((B32,), bool), qpy, qpb, qpr, lam=lam,
                       nr_offsets=nr_offsets)
        small, tails, fplanes = finish((oy, ocb, ocr), out, qp_base,
                                       dqp_cb, dqp_cr, sao_lam,
                                       qp_base_ctb=qp_base_ctb)
        small = dict(small, modes=modes.astype(jnp.uint8),
                     mode32=mode32.astype(jnp.uint8), use32=out[9])
        if out[11] is not None:
            for cat, (si, ci, sp, cp) in out[11].items():
                small["nr_" + cat] = jnp.concatenate(
                    [si, ci[None], sp, cp[None]])
        # device-resident DPB entry: the ME/MC-extended reference planes
        # stay on device for the next frame's prep (no host roundtrip)
        return small, tails, extend(fplanes)

    fn = jax.jit(run)
    fn.raw = run        # unjitted body for shard_map wrapping (parallel/)
    return fn


def _extend_builder(enc):
    """Device-side reference extension: crop the scan recon to the CODED
    picture (the area the bitstream actually describes — the CTB-padded
    margin beyond it is scratch), then edge-replicate back out to the
    padded plane plus the ME/MC margin.  Must match the decode-side
    edge extension exactly (host _extend_ref)."""
    import jax.numpy as jnp

    g = enc.geom
    M = enc.me_range + 8
    CM = enc.me_range // 2 + 4
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    cw, ch = enc.sps.pic_width, enc.sps.pic_height

    def extend(planes3):
        y, cb, cr = planes3
        return (
            jnp.pad(y[:ch, :cw],
                    ((M, M + ph - ch), (M, M + pw - cw)), mode="edge"),
            jnp.pad(cb[:ch // 2, :cw // 2],
                    ((CM, CM + (ph - ch) // 2), (CM, CM + (pw - cw) // 2)),
                    mode="edge"),
            jnp.pad(cr[:ch // 2, :cw // 2],
                    ((CM, CM + (ph - ch) // 2), (CM, CM + (pw - cw) // 2)),
                    mode="edge"))

    return extend


def _inter_tools_builder(enc, allow_pallas=True):
    """Shared inter machinery for the P/B device pipelines: full-search +
    subpel ME, MV-coherence passes, and pp/ps luma+chroma MC evaluation
    at arbitrary per-block MVs (windows gathered from the extended ref).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.cost import satd as satd_fn
    from ..ops.interp import (bi_avg, mc_chroma_batch, mc_chroma_batch_ps,
                              mc_luma_batch, mc_luma_batch_ps)

    g = enc.geom
    n = 16
    R = enc.me_range                      # TOTAL full-pel reach (padding)
    RF = enc.me_fine                      # fine full-search radius
    RC = enc.me_coarse                    # quarter-res search radius
    RS = 4 * RC                           # max seed magnitude (full-pel)
    # the user-requested --merange is a MAXIMUM (x265 motion.cpp:571
    # mvmin/mvmax clamp); R only rounds it up for internal padding.
    # Seeds are clamped so seed+fine reach <= MRQ, and subpel/adoption
    # candidates beyond 4*MRQ qpel are masked out.
    MRQ = max(1, min(64, enc.params.me_range))
    M = R + 8
    CM = R // 2 + 4
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    gh, gw = ph // n, pw // n
    nb = gh * gw
    cn = n // 2
    bd = enc.bit_depth

    offs_f = np.array([(dy, dx) for dy in range(-RF, RF + 1)
                       for dx in range(-RF, RF + 1)], np.int32)
    deltas9 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    # ---- patch tensors: per-block neighborhoods as STATIC slices ----
    # Arbitrary per-block window gathers (advanced indexing) cost ~55-80 ms
    # each on TPU; instead every block's full [-R-4, n+R+5) neighborhood is
    # materialized ONCE from static slices, and any window at a per-block
    # integer offset is a chain of masked selects over 2R+1 static slices.
    # Patches keep the reference dtype (uint8/uint16); selected windows are
    # widened at use.
    PS = n + 2 * R + 9                    # luma patch size (pad 4 + 5)
    PSF = n + 2 * RF + 9                  # fine-stage search-region size
    # chroma: qpel mv in [-4R-3, 4R+3] -> eighth-pel int part in
    # [-R//2-1, R//2], window top-left a further -1
    CPS = cn + R + 4                      # chroma patch size

    def build_patches(ref_ext):
        """[B, PS, PS] per-16x16-block neighborhoods, top-left at block
        origin - (R+4)."""
        rs = jnp.stack([ref_ext[r * n + M - R - 4:
                                r * n + M - R - 4 + PS, :]
                        for r in range(gh)])          # [gh, PS, PW]
        cs = jnp.stack([rs[:, :, c * n + M - R - 4:
                           c * n + M - R - 4 + PS]
                        for c in range(gw)], axis=1)  # [gh, gw, PS, PS]
        return cs.reshape(nb, PS, PS)

    def build_patches_c(ref_ext):
        """[B, CPS, CPS] chroma neighborhoods, top-left at chroma block
        origin - (R//2+2)."""
        rs = jnp.stack([ref_ext[r * cn + CM - R // 2 - 2:
                                r * cn + CM - R // 2 - 2 + CPS, :]
                        for r in range(gh)])
        cs = jnp.stack([rs[:, :, c * cn + CM - R // 2 - 2:
                           c * cn + CM - R // 2 - 2 + CPS]
                        for c in range(gw)], axis=1)
        return cs.reshape(nb, CPS, CPS)

    def select_window(P, sy, sx, size, nopt):
        """W[b] = P[b, sy[b]:sy[b]+size, sx[b]:sx[b]+size] (sy/sx in
        0..nopt-1) by BINARY offset decomposition: O(log nopt) masked
        shifts instead of a linear O(nopt) masked-select chain — the
        select chains over 2R+1 options dominated ME memory traffic at
        merange 57 (HBM-bound; ~17x less traffic this way)."""
        ps = P.shape[1]
        maxoff = min(nopt, ps - size + 1) - 1
        if maxoff <= 0:
            return P[:, :size, :size]
        nbits = maxoff.bit_length()
        need = size + (1 << nbits) - 1
        if ps < need:
            P = jnp.pad(P, ((0, 0), (0, need - ps), (0, need - ps)))
        W = P[:, :need, :need]
        for k in reversed(range(nbits)):
            step = 1 << k
            ext = size + step - 1
            W = jnp.where((sy & step != 0)[:, None, None],
                          W[:, step:step + ext, :], W[:, :ext, :])
        for k in reversed(range(nbits)):
            step = 1 << k
            ext = size + step - 1
            W = jnp.where((sx & step != 0)[:, None, None],
                          W[:, :, step:step + ext], W[:, :, :ext])
        return W

    def coarse_seeds(orig, ref_ext):
        """Quarter-res full search: per-16x16-block full-pel seed MVs in
        multiples of 4 pels, reach +-RS.  TPU-first stand-in for x265's
        MVP/lowres seeding (motion.cpp:571, lowres.h:132): the downscaled
        planes make a (2RC+1)^2 grid search over the whole merange cheap."""
        def box4(p):
            h, w = p.shape
            return (p.astype(jnp.int32).reshape(h // 4, 4, w // 4, 4)
                    .sum(axis=(1, 3)) + 8) >> 4

        oq = box4(orig).astype(jnp.int16)                   # [ph/4, pw/4]
        rq = box4(jax.lax.dynamic_slice(
            ref_ext, (M - RS, M - RS),
            (ph + 2 * RS, pw + 2 * RS)).astype(jnp.int32)).astype(jnp.int16)
        qh, qw = ph // 4, pw // 4

        # all (2RC+1)^2 shifted abs-diff block sums in ONE fused pass —
        # a lax.scan over row offsets serializes ~27 launch-bound steps
        # (profiled 18 ms/ref; unrolled+int16 this streams at HBM rate).
        # int16 is safe: per-16px-block SADs of quarter-res pels <= 16*
        # 1023 < 2^15.
        rows = jnp.stack([rq[dy:dy + qh, :]
                          for dy in range(2 * RC + 1)])
        cand = jnp.stack([rows[:, :, dx:dx + qw]
                          for dx in range(2 * RC + 1)], axis=1)
        d = jnp.abs(oq[None, None] - cand)          # [27, 27, qh, qw] i16
        cs = d.reshape(2 * RC + 1, 2 * RC + 1, gh, 4, gw, 4
                       ).sum(axis=(3, 5), dtype=jnp.int16)
        # small zero-motion bias keeps seed fields coherent on flat areas
        dists = (np.abs(np.arange(-RC, RC + 1))[:, None]
                 + np.abs(np.arange(-RC, RC + 1))[None, :])
        cs = cs + 2 * jnp.asarray(dists, jnp.int16)[:, :, None, None]
        costs = cs.transpose(2, 3, 0, 1).reshape(nb, -1)
        idx = jnp.argmin(costs, axis=1)
        offs_c = np.array([(dy, dx) for dy in range(-RC, RC + 1)
                           for dx in range(-RC, RC + 1)], np.int32)
        return jnp.asarray(4 * offs_c)[idx]                 # [B] (dy, dx)

    def me(orig, ref_ext, ob, qp):
        # Stage 1: quarter-res seeds (skipped when merange <= fine reach).
        P = build_patches(ref_ext)
        if RC:
            seed = coarse_seeds(orig, ref_ext)
            seed = jnp.clip(seed, -(MRQ - RF), MRQ - RF)
            # per-block fine search region [B, PSF, PSF] at the seed
            # (top-left = seed - RF - 4), masked-select from the big patch
            S = select_window(P, seed[:, 0] + RS, seed[:, 1] + RS, PSF,
                              2 * RS + 1)
        else:
            seed = jnp.zeros((nb, 2), jnp.int32)
            S = P

        # ---- lambda * mv-bits cost (x265 motion.cpp:571 mvcost via
        # bitcost.h:45 lambda*bits LUT).  The cost anchor is a
        # neighbor-median of the coarse seed field — available BEFORE
        # the fine search, so the whole frame stays one batched program
        # (the real AMVP anchor is sequential in z-order; the seed
        # median is its parallel estimate).  Bits model: EG1-style
        # 2*log2(|d|+1)+1.718 per component (bitcost.cpp:33 s_bitsizes).
        lam = 2.0 ** ((jnp.float32(qp) - 12.0) / 6.0)
        sg = seed.reshape(gh, gw, 2)
        sw_ = jnp.roll(sg, 1, axis=1)
        sn_ = jnp.roll(sg, 1, axis=0)
        col0 = (jnp.arange(gw) == 0)[None, :, None]
        row0 = (jnp.arange(gh) == 0)[:, None, None]
        sw_ = jnp.where(col0, sg, sw_)
        sn_ = jnp.where(row0, sg, sn_)
        pmv = 4 * (sg + sw_ + sn_
                   - jnp.maximum(jnp.maximum(sg, sw_), sn_)
                   - jnp.minimum(jnp.minimum(sg, sw_), sn_)
                   ).reshape(nb, 2)                  # qpel (y, x) median

        def mv_bits(dq):
            """EG1-ish fractional bits of one qpel mvd component."""
            a = jnp.abs(dq).astype(jnp.float32)
            return jnp.where(a == 0, 0.718,
                             2.0 * jnp.log2(a + 1.0) + 1.718)

        def mv_cost(mv_q, pmv_b):
            """lambda * bits(mv - pmv) for [..., 2] qpel MVs (pmv_b
            pre-broadcast to mv_q's layout, same component order)."""
            d = mv_q - pmv_b
            return lam * (mv_bits(d[..., 0]) + mv_bits(d[..., 1]))

        # Stage 2: full-search SAD over the (2RF+1)^2 local grid.  One
        # scan step per ROW offset; the 2RF+1 column offsets inside a
        # step are STATIC slices evaluated as one batched abs-diff + box
        # reduce.
        def row_body(_, dy):
            rows = jax.lax.dynamic_slice(S, (0, dy, 0), (nb, n, PSF))
            cand = jnp.stack([rows[:, :, dx:dx + n]
                              for dx in range(4, 4 + 2 * RF + 1)], axis=0)
            d = jnp.abs(ob[None] - cand.astype(jnp.int32))
            return 0, d.sum(axis=(2, 3))                    # [2RF+1, B]

        _, cs = jax.lax.scan(row_body, 0,
                             jnp.arange(4, 4 + 2 * RF + 1, dtype=jnp.int32))
        costs = cs.transpose(2, 0, 1).reshape(nb, -1)       # [B, (2RF+1)^2]
        cand_q = 4 * (seed[:, None, :] + jnp.asarray(offs_f)[None])
        costs = costs.astype(jnp.float32) + mv_cost(cand_q, pmv[:, None])
        idx = jnp.argmin(costs, axis=1)
        mvi = seed + jnp.asarray(offs_f)[idx]               # [B] (dy, dx)
        dl = jnp.asarray(offs_f)[idx]                       # local delta

        # per-block window [B, n+9, n+9] around the integer winner, as a
        # masked select from the search region; every subpel candidate
        # below is a STATIC slice of it.
        W = select_window(S, dl[:, 0] + RF, dl[:, 1] + RF, n + 9,
                          2 * RF + 1).astype(jnp.int32)

        def refine_round(center, step):
            """Evaluate the 3x3 neighborhood center + step*delta (all
            candidates stay within qpel offset [-3, 3], so the integer
            part relative to W is -1 or 0: two static row/col slices of
            W selected per block by jnp.where)."""
            qs, wins, oobs = [], [], []
            for (dy, dx) in deltas9:
                q = center + jnp.asarray((dy * step, dx * step))  # (y, x)
                # candidates past the requested merange are masked, not
                # clamped (clamping would desync mv and prediction)
                oobs.append(jnp.any(jnp.abs(mvi * 4 + q) > 4 * MRQ,
                                    axis=1))
                iy1 = ((q[:, 0] >> 2) + 1)      # 0 or 1: W row offset
                ix1 = ((q[:, 1] >> 2) + 1)
                wr = jnp.where(iy1[:, None, None] == 0,
                               W[:, 0:n + 7, :], W[:, 1:n + 8, :])
                win = jnp.where(ix1[:, None, None] == 0,
                                wr[:, :, 0:n + 7], wr[:, :, 1:n + 8])
                qs.append(q)
                wins.append(win)
            win9 = jnp.concatenate(wins, axis=0)
            fx9 = jnp.concatenate([q[:, 1] & 3 for q in qs])
            fy9 = jnp.concatenate([q[:, 0] & 3 for q in qs])
            pred9 = mc_luma_batch(win9, fx9, fy9, n, n, enc.bit_depth)
            cost9 = satd_fn(jnp.tile(ob, (9, 1, 1)), pred9)
            pred9 = pred9.reshape(9, -1, n, n)
            cost9 = cost9.reshape(9, -1).astype(jnp.float32)
            cost9 = cost9 + mv_cost(mvi[None] * 4 + jnp.stack(qs),
                                    pmv[None])
            big = jnp.float32(1 << 30)
            cost9 = jnp.where(jnp.stack(oobs), big, cost9)
            best_c = cost9[0]
            best_q = qs[0]
            best_pred = pred9[0]
            for k in range(1, 9):
                better = cost9[k] < best_c
                best_c = jnp.where(better, cost9[k], best_c)
                best_q = jnp.where(better[:, None], qs[k], best_q)
                best_pred = jnp.where(better[:, None, None], pred9[k],
                                      best_pred)
            return best_q, best_pred, best_c

        # --subme ladder (x265 subme table, reduced to the refinement
        # rounds this search shape has): 0 = full-pel only, 1 = +half,
        # >= 2 = +quarter
        subme = int(enc.params.subme)
        from .me_pallas import (make_refine_kernel,
                                pallas_refine_supported)
        if allow_pallas and pallas_refine_supported(enc.bit_depth, nb):
            # fused Pallas subpel search: all rounds/candidates in VMEM
            refine_k = make_refine_kernel(min(subme, 2), MRQ)
            q0, pred, cost = refine_k(W, ob, mvi, pmv, lam)
        else:
            q0 = jnp.zeros_like(mvi)
            if subme >= 1:
                q0, pred, cost = refine_round(q0, 2)  # half-pel
            if subme >= 2:
                q0, pred, cost = refine_round(q0, 1)  # quarter-pel
            if subme == 0:
                # evaluate the full-pel center so pred/cost exist
                q0, pred, cost = refine_round(q0, 0)
        mvq = mvi * 4 + q0                                # [B, 2] (y, x) qpel

        # ---- MV coherence passes ----
        # adopt the west/north neighbor's MV when its TOTAL cost
        # (SATD + lambda*mv-bits) wins within a small coherence bonus —
        # uniform-MV runs additionally enable 32/64 CU merges and cheap
        # merge/skip syntax, which the bits model alone does not see.
        merge_bonus = 4.0 * lam
        pmv_xy = pmv[:, ::-1]

        def eval_mv1(mvq_c):
            """SATD eval of one candidate MV field ([B, 2] (y, x)) —
            windows selected straight from P (tiling P to evaluate two
            fields at once materialized a 2x patch copy; profiled
            slower than two selects)."""
            iy = (mvq_c[:, 0] >> 2)
            ix = (mvq_c[:, 1] >> 2)
            win = select_window(P, iy + R + 1, ix + R + 1, n + 7,
                                2 * R + 2)
            p = mc_luma_batch(win, mvq_c[:, 1] & 3, mvq_c[:, 0] & 3,
                              n, n, enc.bit_depth)
            return p, satd_fn(ob, p)

        def adopt2(mvq, pred, cost):
            """One coherence pass: west then north neighbor candidates."""
            g2 = mvq.reshape(gh, gw, 2)
            for cand, valid in (
                    (jnp.roll(g2, 1, axis=1).reshape(-1, 2),
                     jnp.arange(nb) % gw > 0),
                    (jnp.roll(g2, 1, axis=0).reshape(-1, 2),
                     jnp.arange(nb) // gw > 0)):
                cand = jnp.clip(cand, -4 * MRQ, 4 * MRQ)
                p1, c1 = eval_mv1(cand[:, ::-1])    # eval takes (y, x)
                c = c1.astype(jnp.float32) + mv_cost(cand, pmv_xy)
                better = (c < cost + merge_bonus) & valid
                mvq = jnp.where(better[:, None], cand, mvq)
                pred = jnp.where(better[:, None, None], p1, pred)
                cost = jnp.where(better, c, cost)
                g2 = mvq.reshape(gh, gw, 2)
            return mvq, pred, cost

        mvxy = mvq[:, ::-1]                      # (x, y)
        for _ in range(2):
            mvxy, pred, cost = adopt2(mvxy, pred, cost)
        return mvxy, cost, pred

    def eval_mv_ps(ref_ext, mv):
        """14-bit-domain luma prediction at per-block (x, y) qpel MVs
        (masked window select from the patch tensor)."""
        P = build_patches(ref_ext)
        iy = mv[:, 1] >> 2
        ix = mv[:, 0] >> 2
        win = select_window(P, iy + R + 1, ix + R + 1, n + 7, 2 * R + 2)
        return mc_luma_batch_ps(win, mv[:, 0] & 3, mv[:, 1] & 3, n, n, bd)

    def eval_mv(ref_ext, mv):
        """Pixel-domain luma prediction at per-block (x, y) qpel MVs."""
        P = build_patches(ref_ext)
        iy = mv[:, 1] >> 2
        ix = mv[:, 0] >> 2
        win = select_window(P, iy + R + 1, ix + R + 1, n + 7, 2 * R + 2)
        return mc_luma_batch(win, mv[:, 0] & 3, mv[:, 1] & 3, n, n, bd)

    def _chroma_windows(ref_ext, mv):
        PC = build_patches_c(ref_ext)
        icx = mv[:, 0] >> 3
        icy = mv[:, 1] >> 3
        return select_window(PC, icy + R // 2 + 1, icx + R // 2 + 1,
                             cn + 3, R + 2)

    def chroma_pred(ref_ext, mv):
        # mv [B, 2] (x, y) qpel == chroma eighth-pel
        wins = _chroma_windows(ref_ext, mv)
        return mc_chroma_batch(wins, mv[:, 0] & 7, mv[:, 1] & 7, cn, cn, bd)

    def chroma_pred_ps(ref_ext, mv):
        wins = _chroma_windows(ref_ext, mv)
        return mc_chroma_batch_ps(wins, mv[:, 0] & 7, mv[:, 1] & 7, cn, cn,
                                  bd)

    return dict(me=me, eval_mv_ps=eval_mv_ps, eval_mv=eval_mv,
                chroma_pred=chroma_pred,
                chroma_pred_ps=chroma_pred_ps, satd=satd_fn,
                bi_avg=lambda a, b: bi_avg(a, b, bd), R=R, M=M, CM=CM)


def ref_idx_bits(nr: int, n_act: int) -> np.ndarray:
    """Per-slot ref_idx bit cost [nr]: TR binarization (Table 9-37,
    cMax = n_act-1) for real slots, +inf for padding slots.

    Non-zero refs additionally carry a merge-risk bias: a block whose
    ref_idx differs from its neighbors' loses merge/skip candidacy and
    fragments the uniformization field, which costs far more than the
    TR bits alone (x265 reaches the same equilibrium through its
    merge-first analysis order; measured here: without the bias a
    noisy pan clip spent +25% bits for +0.05 dB at --ref 3)."""
    out = np.full((nr,), 1e9, np.float32)
    for r in range(min(nr, n_act)):
        tr = 0.0 if n_act == 1 else float(
            r + 1 if r < n_act - 1 else n_act - 1)
        out[r] = tr + (6.0 if r > 0 else 0.0)
    return out


def build_p_pipeline(enc, nr: int = 1):
    """P-frame device program: intra analysis + per-reference full+subpel
    ME + ref_idx selection + chroma MC + inter/intra decision +
    CTU-wavefront recon (one lax.scan).

    ``nr``: number of active L0 references.  The per-ref searches are the
    TPU-first shape of x265's per-(list,ref) ME loop
    (search.cpp:2050 predInterSearch; SURVEY §2.6 P4 pme): instead of
    distributing refs across worker threads, every ref's whole-frame ME
    is one more unrolled batched search, and ref_idx falls out of an
    argmin over (cost + lambda*ref_bits).

    fn(orig x3, refs_y tuple[nr], refs_cb, refs_cr, qps, lam, qp_base,
       dqp_cb, dqp_cr, sao_lam, qp_base_ctb, ref_pocs, wy, wo) ->
       (small dict incl. mv [B, 2] (x, y) qpel, ref_idx [B], inter [B],
        cost_p, cost_i; device tails).
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
    run_scan = scan.scan_fn(inter=True, decide32=decide)
    B32 = scan.t["b32_n"]
    nctb = g.n_ctbs
    analyse16 = _analyse_builder(enc, n, gh, gw, ph, pw)
    analyse32 = (_analyse_builder(enc, 32, ph // 32, pw // 32, ph, pw)
                 if decide else None)
    finish = _filter_stage_builder(enc)
    tools = _inter_tools_builder(enc)
    extend = _extend_builder(enc)

    def to_blocks(pl, bn):
        return pl.reshape(gh, bn, gw, bn).transpose(
            0, 2, 1, 3).reshape(-1, bn, bn)

    weightp = bool(enc.params.weightp)
    bd = enc.bit_depth
    maxv = (1 << bd) - 1

    # TWO XLA programs, chained through device-resident intermediates:
    # fusing the ME/MC producer chain into the same program as the
    # wavefront lax.scan makes XLA schedule the whole thing ~6x slower
    # (measured 1.32s vs 0.20s at 1080p) — so analysis/ME dispatch first,
    # and the scan+filters program consumes their on-device outputs.
    # wy/wo: explicit L0 ref0 luma weight (1/64 units) + offset (8-bit
    # units); (64, 0) is bit-exact unity, so one compiled program serves
    # both.
    def prep_raw(oy, refs_y, refs_cb, refs_cr, qpy, rbits, wy, wo):
        """``rbits`` [nr] float32: lambda-weighted ref_idx bit cost per
        slot; padding slots (duplicated refs beyond the actual active
        count) carry +inf so they can never win the argmin — one
        compiled program serves every active-ref count bit-exactly."""
        modes, icost = analyse16(oy)
        ob = to_blocks(oy.astype(jnp.int32), n)
        if decide:
            # intra-32 CUs are rare in P slices (the in-scan RD gate
            # requires an all-intra quad); the top-left 16-block's mode
            # stands in for a second full 35-mode 32x32 analysis
            mode32 = modes.reshape(gh, gw)[0::2, 0::2].reshape(-1)
        else:
            mode32 = jnp.zeros((B32,), jnp.int32)
        lam = 2.0 ** ((jnp.float32(qpy) - 12.0) / 6.0)
        oy32 = oy.astype(jnp.int32)
        obd = wo * (1 << (bd - 8))
        mvs, preds, totals = [], [], []
        for r in range(nr):
            ry = refs_y[r]
            if weightp and r == 0:
                # ME searches the pixel-domain weighted reference (x265
                # MotionReference::applyWeight, reference.cpp); the FINAL
                # prediction below is the normative 14-bit-domain
                # weighting of the unweighted ref (predict.cpp
                # addWeightUni)
                me_ref = jnp.clip(
                    ((ry.astype(jnp.int32) * wy + 32) >> 6) + obd,
                    0, maxv).astype(ry.dtype)
            else:
                me_ref = ry
            mv_r, pcost_r, pred_r = tools["me"](oy32, me_ref, ob, qpy)
            if weightp and r == 0:
                # §8.5.3.3.4.2 explicit uni weighting of the ps
                # intermediate
                ps_pred = tools["eval_mv_ps"](ry, mv_r)
                log2wd = 6 + 14 - bd
                pred_r = jnp.clip(
                    ((ps_pred * wy + (1 << (log2wd - 1))) >> log2wd)
                    + obd, 0, maxv)
            totals.append(pcost_r.reshape(-1).astype(jnp.float32)
                          + lam * rbits[r])
            mvs.append(mv_r)
            preds.append(pred_r)
        if nr == 1:
            rsel = jnp.zeros((mvs[0].shape[0],), jnp.int32)
            pcost, mv, pred_y = totals[0], mvs[0], preds[0]
        else:
            tc = jnp.stack(totals)                   # [NR, B]
            rsel = jnp.argmin(tc, axis=0).astype(jnp.int32)
            pcost = jnp.min(tc, axis=0)
            mv = jnp.take_along_axis(jnp.stack(mvs),
                                     rsel[None, :, None], axis=0)[0]
            pred_y = jnp.take_along_axis(
                jnp.stack(preds), rsel[None, :, None, None], axis=0)[0]
        # intra blocks in P slices cost far more bits than SATD reflects
        # (mode + full coefficients); bias the decision toward inter
        inter = pcost.astype(jnp.int64) <= (
            icost.astype(jnp.int64) * 9) // 8

        # ---- CU-merge uniformization trial (x265 checkMerge2Nx2N /
        # early-skip at depths 0-1, TPU-first): large-CU skip syntax is
        # the dominant bit saving at low rates — per 32-quad and 64-CTB,
        # try the top-left block's (mv, ref) for the WHOLE region; if
        # summed SATD + merged-CU bits beats the per-block total, adopt
        # it, collapsing the quad into one merged (often skip) CU
        # downstream (analysis.cpp:1652 merge trial + :2286 depth
        # heuristics, re-cast as one batched decision).
        def eval_sel(mv_c, rsel_c):
            """Pixel-domain pred at (mv, ref_idx) per block, with the
            slot-0 explicit weight applied when weightp."""
            out = None
            for r in range(nr):
                if weightp and r == 0:
                    ps_p = tools["eval_mv_ps"](refs_y[0], mv_c)
                    log2wd = 6 + 14 - bd
                    p_r = jnp.clip(
                        ((ps_p * wy + (1 << (log2wd - 1))) >> log2wd)
                        + obd, 0, maxv)
                else:
                    p_r = tools["eval_mv"](refs_y[r], mv_c)
                out = p_r if out is None else jnp.where(
                    (rsel_c == r)[:, None, None], p_r, out)
            return out

        def uniform_pass(mv, rsel, pred_y, pcost, inter, bs, inb):
            gq = mv.reshape(gh, gw, 2)
            tl_mv = jnp.repeat(jnp.repeat(gq[::bs, ::bs], bs, 0), bs, 1
                               ).reshape(-1, 2)
            gr = rsel.reshape(gh, gw)
            tl_r = jnp.repeat(jnp.repeat(gr[::bs, ::bs], bs, 0), bs, 1
                              ).reshape(-1)
            cand_pred = eval_sel(tl_mv, tl_r)
            cand_cost = tools["satd"](ob, cand_pred).astype(jnp.float32)

            def qsum(a):
                return jnp.repeat(jnp.repeat(
                    a.reshape(gh // bs, bs, gw // bs, bs)
                    .sum(axis=(1, 3)), bs, 0), bs, 1).reshape(-1)

            all_inter = jnp.repeat(jnp.repeat(jnp.all(
                inter.reshape(gh // bs, bs, gw // bs, bs), axis=(1, 3)),
                bs, 0), bs, 1).reshape(-1)
            nb2 = float(bs * bs)
            # merged CU: ~4 bits of split/skip/merge syntax total;
            # per-block path: ~6 bits each of flags beyond the mv bits
            # already inside pcost
            accept = (cand_cost_q := qsum(cand_cost)) + lam * 4.0 < \
                qsum(pcost) + lam * 6.0 * nb2
            accept = accept & all_inter & jnp.asarray(inb).reshape(-1)
            mv = jnp.where(accept[:, None], tl_mv, mv)
            rsel = jnp.where(accept, tl_r, rsel)
            pred_y = jnp.where(accept[:, None, None], cand_pred, pred_y)
            pcost = jnp.where(accept, cand_cost_q / nb2, pcost)
            return mv, rsel, pred_y, pcost

        def quad_inbounds(bs):
            by = (np.arange(gh) // bs) * bs * 16
            bx = (np.arange(gw) // bs) * bs * 16
            return ((by[:, None] + bs * 16 <= enc.geom.height)
                    & (bx[None, :] + bs * 16 <= enc.geom.width))

        if gh % 2 == 0 and gw % 2 == 0 and enc.geom.log2_ctb >= 5:
            mv, rsel, pred_y, pcost = uniform_pass(
                mv, rsel, pred_y, pcost, inter, 2, quad_inbounds(2))
            if gh % 4 == 0 and gw % 4 == 0 and enc.geom.log2_ctb == 6:
                mv, rsel, pred_y, pcost = uniform_pass(
                    mv, rsel, pred_y, pcost, inter, 4, quad_inbounds(4))

        def sel_chroma(refs_c):
            # evaluated at the FINAL mv field (post-uniformization), so
            # every ref's chroma MC uses the same per-block MVs
            pc = [tools["chroma_pred"](refs_c[r], mv) for r in range(nr)]
            if nr == 1:
                return pc[0]
            return jnp.take_along_axis(
                jnp.stack(pc), rsel[None, :, None, None], axis=0)[0]

        pred_cb = sel_chroma(refs_cb)
        pred_cr = sel_chroma(refs_cr)
        # frame-level costs for the scenecut decision (x265 slicetype
        # analysis analogue): P cost = per-block best of inter/intra
        cost_p = jnp.sum(jnp.minimum(pcost, icost))
        cost_i = jnp.sum(icost)
        return (modes, mode32, mv, rsel, inter, pred_y, pred_cb, pred_cr,
                cost_p, cost_i)

    def main_raw(oy, ocb, ocr, modes, mode32, mv, rsel, inter, pred_y,
                 pred_cb, pred_cr, qpy, qpb, qpr, lam, qp_base, dqp_cb,
                 dqp_cr, sao_lam, qp_base_ctb, ref_pocs, nr_offsets=None):
        merged = finish.merged_masks(inter, (mv, rsel))
        m32_in = None
        if merged is not None:
            m32q, m64q = merged
            f = m32q.shape[0] // m64q.shape[0]
            m32_in = m32q | jnp.repeat(jnp.repeat(m64q, f, 0), f, 1)
        out = run_scan(oy, ocb, ocr, modes, mode32,
                       jnp.zeros((B32,), bool), qpy, qpb, qpr, lam=lam,
                       is_inter=inter, ipred_y=pred_y,
                       ipred_cb=pred_cb, ipred_cr=pred_cr,
                       m32_in=m32_in, nr_offsets=nr_offsets)

        # deblock BS needs per-4x4 reference POCs once refs can differ
        # per block (deblock.cpp:193 boundary-strength rules)
        def rep4(a):
            return jnp.repeat(jnp.repeat(a.reshape(gh, gw, -1), 4, 0),
                              4, 1)

        poc4 = rep4(ref_pocs[rsel][:, None])[:, :, 0]
        mv4 = rep4(mv).astype(jnp.int32)
        motion_b = (jnp.ones((gh * 4, gw * 4), jnp.int32), mv4, mv4,
                    poc4, poc4)
        small, tails, fplanes = finish((oy, ocb, ocr), out, qp_base,
                                       dqp_cb, dqp_cr, sao_lam,
                                       inter=inter, mv=mv,
                                       motion_b=motion_b,
                                       qp_base_ctb=qp_base_ctb,
                                       merged=merged)
        small = dict(small, use32=out[9])
        if out[11] is not None:
            for cat, (si, ci, sp, cp) in out[11].items():
                small["nr_" + cat] = jnp.concatenate(
                    [si, ci[None], sp, cp[None]])
        return small, tails, extend(fplanes)

    prep = jax.jit(prep_raw)
    main = jax.jit(main_raw)

    def run(oy, ocb, ocr, refs_y, refs_cb, refs_cr,
            qpy, qpb, qpr, lam, qp_base, dqp_cb, dqp_cr, sao_lam,
            qp_base_ctb, ref_pocs, wy=np.int32(64), wo=np.int32(0),
            n_act=None, nr_offsets=None):
        if not isinstance(refs_y, (tuple, list)):
            refs_y, refs_cb, refs_cr = (refs_y,), (refs_cb,), (refs_cr,)
        if n_act is None:
            n_act = len(refs_y)
        rbits = ref_idx_bits(nr, n_act)
        (modes, mode32, mv, rsel, inter, pred_y, pred_cb, pred_cr,
         cost_p, cost_i) = prep(oy, tuple(refs_y), tuple(refs_cb),
                                tuple(refs_cr), qp_base, rbits, wy, wo)
        small, tails, ext = main(oy, ocb, ocr, modes, mode32, mv, rsel,
                                 inter, pred_y, pred_cb, pred_cr,
                                 qpy, qpb, qpr, lam, qp_base, dqp_cb,
                                 dqp_cr, sao_lam, qp_base_ctb,
                                 jnp.asarray(ref_pocs, jnp.int32),
                                 nr_offsets)
        small = dict(small, modes=modes.astype(jnp.uint8),
                     mode32=mode32.astype(jnp.uint8),
                     mv=mv.astype(jnp.int16),
                     ref_idx=rsel.astype(jnp.uint8), inter=inter,
                     cost_p=cost_p, cost_i=cost_i)
        return small, tails, ext

    run.prep = prep
    run.main = main
    run.prep_raw = prep_raw
    run.main_raw = main_raw
    run.nr = nr
    return run


def build_b_pipeline(enc, batch: int | None = None,
                     make_ext: bool = False):
    """B-frame device program: intra analysis + per-list ME + bi-prediction
    trial + direction decision + CTU-wavefront recon + in-loop filters.

    With ``batch=F`` the returned function encodes F independent B frames
    of one mini-GOP in a single pair of device programs (vmap over the
    frame axis; the reference planes are shared/broadcast).  This is the
    TPU-first shape of x265's frame parallelism for non-referenced Bs
    (SURVEY §2.6 P2): they have no cross-dependency, so the whole
    mini-GOP's B work is one batched dispatch.

    fn(orig x3, ref0_ext x3, ref1_ext x3, qps, lam, qp_base, dqp_cb,
       dqp_cr, sao_lam, poc_l0, poc_l1) ->
       (modes, mode32, use32, mv0 [B, 2], mv1 [B, 2], dir [B] (1/2/3),
        inter_mask [B], final planes x3, coeff planes x3, sao params x4).

    TPU-first shape of x265's checkBidir2Nx2N (search.cpp:2013): both
    list searches and the bi average are evaluated for EVERY block as
    batched tensor ops, then an argmin picks the direction.
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
    # vmapped pallas_call blocks fail the Mosaic tiling rules; the
    # batched-B scan stays on the jnp step (it amortizes across the
    # vmapped frames anyway)
    run_scan = scan.scan_fn(inter=True, decide32=decide,
                            allow_pallas=(batch is None))
    B32 = scan.t["b32_n"]
    nctb = g.n_ctbs
    analyse16 = _analyse_builder(enc, n, gh, gw, ph, pw)
    analyse32 = (_analyse_builder(enc, 32, ph // 32, pw // 32, ph, pw)
                 if decide else None)
    finish = _filter_stage_builder(enc)
    tools = _inter_tools_builder(enc,
                                 allow_pallas=(batch is None))

    def to_blocks(pl, bn):
        return pl.reshape(gh, bn, gw, bn).transpose(
            0, 2, 1, 3).reshape(-1, bn, bn)

    # same two-program split as build_p_pipeline (ME fused into the
    # scan program wrecks the XLA schedule)
    def prep(oy, r0y, r0cb, r0cr, r1y, r1cb, r1cr, qpy):
        modes, icost = analyse16(oy)
        ob = to_blocks(oy.astype(jnp.int32), n)
        if decide:
            # see build_p_pipeline: top-left 16-mode stands in for the
            # full 32x32 analysis in inter slices
            mode32 = modes.reshape(gh, gw)[0::2, 0::2].reshape(-1)
        else:
            mode32 = jnp.zeros((B32,), jnp.int32)
        oy32 = oy.astype(jnp.int32)
        mv0, c0, p0 = tools["me"](oy32, r0y, ob, qpy)
        mv1, c1, p1 = tools["me"](oy32, r1y, ob, qpy)
        c0 = c0.astype(jnp.int32)
        c1 = c1.astype(jnp.int32)
        # bi trial at the two uni winners (x265 checkBidir shape)
        ps0 = tools["eval_mv_ps"](r0y, mv0)
        ps1 = tools["eval_mv_ps"](r1y, mv1)
        pbi = tools["bi_avg"](ps0, ps1)
        cbi = tools["satd"](ob, pbi).astype(jnp.int32)
        # direction decision with a bits bias: bi codes two mvd/mvp sets
        lam = 2.0 ** ((jnp.float32(qpy) - 12.0) / 6.0)
        bi_bias = jnp.int32(8.0 * lam)
        cbi_b = cbi + bi_bias
        d = jnp.where(cbi_b <= jnp.minimum(c0, c1), 3,
                      jnp.where(c0 <= c1, 1, 2)).astype(jnp.int32)
        best = jnp.where(d == 3, cbi_b, jnp.minimum(c0, c1))
        inter = best.reshape(-1).astype(jnp.int64) <= (
            icost.astype(jnp.int64) * 9) // 8
        d3 = (d == 3)[:, None, None]
        pred_y = jnp.where(d3, pbi,
                           jnp.where((d == 1)[:, None, None], p0, p1))

        # ---- CU-merge uniformization trial (the P-pipeline pass over
        # the full two-list motion state): adopt the top-left block's
        # (mv0, mv1, dir) for 32-quads / 64-CTBs when summed SATD +
        # merged-CU bits win, enabling large merged (skip) CUs + TU32
        def eval_b(mv0_c, mv1_c, d_c):
            e0 = tools["eval_mv"](r0y, mv0_c)
            e1 = tools["eval_mv"](r1y, mv1_c)
            eb = tools["bi_avg"](tools["eval_mv_ps"](r0y, mv0_c),
                                 tools["eval_mv_ps"](r1y, mv1_c))
            return jnp.where((d_c == 3)[:, None, None], eb,
                             jnp.where((d_c == 1)[:, None, None], e0, e1))

        def adopt_b(mv0, mv1, d, pred_y, cost, inter):
            """Per-block full-motion coherence (the B-slice analogue of
            the P adopt passes, over the COMBINED (dir, mv0, mv1)
            state): a neighbor's full motion within a merge-bonus makes
            the block mergeable — without it the direction field alone
            fragments merges, and B frames code two mvd/ref/mvp sets
            per block (measured: merge on only 29/238 blocks)."""
            nb2_ = gh * gw
            for axis, valid in ((1, jnp.arange(nb2_) % gw > 0),
                                (0, jnp.arange(nb2_) // gw > 0)):
                def rl(a):
                    return jnp.roll(a.reshape((gh, gw) + a.shape[1:]),
                                    1, axis).reshape(a.shape)

                c0, c1, cd = rl(mv0), rl(mv1), rl(d)
                cp = eval_b(c0, c1, cd)
                cc = tools["satd"](ob, cp).astype(jnp.int32)
                # merge syntax ~3 bits vs two mvd/ref/mvp sets ~20 bits
                better = (cc < cost + jnp.int32(16.0 * lam)) & valid \
                    & rl(inter.reshape(-1)).reshape(-1)
                mv0 = jnp.where(better[:, None], c0, mv0)
                mv1 = jnp.where(better[:, None], c1, mv1)
                d = jnp.where(better, cd, d)
                pred_y = jnp.where(better[:, None, None], cp, pred_y)
                cost = jnp.where(better, cc, cost)
            return mv0, mv1, d, pred_y, cost

        mv0, mv1, d, pred_y, best = adopt_b(mv0, mv1, d, pred_y, best,
                                            inter)

        def uniform_pass_b(mv0, mv1, d, pred_y, cost, inter, bs, inb):
            def tl(a):
                gq = a.reshape((gh, gw) + a.shape[1:])
                return jnp.repeat(jnp.repeat(gq[::bs, ::bs], bs, 0),
                                  bs, 1).reshape(a.shape)

            tl0, tl1, tld = tl(mv0), tl(mv1), tl(d)
            cand_pred = eval_b(tl0, tl1, tld)
            cand_cost = tools["satd"](ob, cand_pred).astype(jnp.float32)

            def qsum(a):
                return jnp.repeat(jnp.repeat(
                    a.reshape(gh // bs, bs, gw // bs, bs)
                    .sum(axis=(1, 3)), bs, 0), bs, 1).reshape(-1)

            all_inter = jnp.repeat(jnp.repeat(jnp.all(
                inter.reshape(gh // bs, bs, gw // bs, bs), axis=(1, 3)),
                bs, 0), bs, 1).reshape(-1)
            nb2 = float(bs * bs)
            cq = qsum(cand_cost)
            accept = cq + lam * 4.0 < \
                qsum(cost.astype(jnp.float32)) + lam * 6.0 * nb2
            accept = accept & all_inter & jnp.asarray(inb).reshape(-1)
            mv0 = jnp.where(accept[:, None], tl0, mv0)
            mv1 = jnp.where(accept[:, None], tl1, mv1)
            d = jnp.where(accept, tld, d)
            pred_y = jnp.where(accept[:, None, None], cand_pred, pred_y)
            cost = jnp.where(accept, (cq / nb2).astype(cost.dtype), cost)
            return mv0, mv1, d, pred_y, cost

        def quad_inbounds(bs):
            by = (np.arange(gh) // bs) * bs * 16
            bx = (np.arange(gw) // bs) * bs * 16
            return ((by[:, None] + bs * 16 <= enc.geom.height)
                    & (bx[None, :] + bs * 16 <= enc.geom.width))

        if gh % 2 == 0 and gw % 2 == 0 and enc.geom.log2_ctb >= 5:
            mv0, mv1, d, pred_y, best = uniform_pass_b(
                mv0, mv1, d, pred_y, best, inter, 2, quad_inbounds(2))
            if gh % 4 == 0 and gw % 4 == 0 and enc.geom.log2_ctb == 6:
                mv0, mv1, d, pred_y, best = uniform_pass_b(
                    mv0, mv1, d, pred_y, best, inter, 4, quad_inbounds(4))
        d3 = (d == 3)[:, None, None]

        # chroma per direction (final mv/dir fields)
        pc0 = tools["chroma_pred"](r0cb, mv0)
        pc1 = tools["chroma_pred"](r1cb, mv1)
        pcbi = tools["bi_avg"](
            tools["chroma_pred_ps"](r0cb, mv0),
            tools["chroma_pred_ps"](r1cb, mv1))
        pred_cb = jnp.where(d3, pcbi,
                            jnp.where((d == 1)[:, None, None], pc0, pc1))
        pr0 = tools["chroma_pred"](r0cr, mv0)
        pr1 = tools["chroma_pred"](r1cr, mv1)
        prbi = tools["bi_avg"](
            tools["chroma_pred_ps"](r0cr, mv0),
            tools["chroma_pred_ps"](r1cr, mv1))
        pred_cr = jnp.where(d3, prbi,
                            jnp.where((d == 1)[:, None, None], pr0, pr1))
        return (modes, mode32, mv0, mv1, d, inter,
                pred_y, pred_cb, pred_cr)

    def main(oy, ocb, ocr, modes, mode32, mv0, mv1, d, inter,
             pred_y, pred_cb, pred_cr, qpy, qpb, qpr, lam,
             qp_base, dqp_cb, dqp_cr, sao_lam, poc_l0, poc_l1,
             qp_base_ctb, nr_offsets=None):
        merged_pre = finish.merged_masks(inter, (mv0, mv1, d))
        m32_in = None
        if merged_pre is not None:
            m32q, m64q = merged_pre
            f = m32q.shape[0] // m64q.shape[0]
            m32_in = m32q | jnp.repeat(jnp.repeat(m64q, f, 0), f, 1)
        out = run_scan(oy, ocb, ocr, modes, mode32,
                       jnp.zeros((B32,), bool), qpy, qpb, qpr, lam=lam,
                       is_inter=inter, ipred_y=pred_y,
                       ipred_cb=pred_cb, ipred_cr=pred_cr,
                       m32_in=m32_in, nr_offsets=nr_offsets)
        # normalized per-4x4 motion state for the in-pipeline deblock
        def rep4(a):
            return jnp.repeat(jnp.repeat(a.reshape(gh, gw, -1), 4, 0),
                              4, 1)

        dir_eff = jnp.where(inter, d, 1)
        nmv = jnp.where(dir_eff == 3, 2, 1)
        mva = jnp.where((dir_eff == 2)[:, None], mv1, mv0)
        poca = jnp.where(dir_eff == 2, poc_l1, poc_l0)
        mvb = jnp.where((dir_eff == 3)[:, None], mv1, mva)
        pocb = jnp.where(dir_eff == 3, poc_l1, poca)
        motion_b = (rep4(nmv)[:, :, 0], rep4(mva), rep4(mvb),
                    rep4(poca)[:, :, 0], rep4(pocb)[:, :, 0])
        small, tails, fplanes = finish((oy, ocb, ocr), out, qp_base,
                                       dqp_cb, dqp_cr, sao_lam,
                                       inter=inter, mv=mv0,
                                       motion_b=motion_b,
                                       qp_base_ctb=qp_base_ctb,
                                       merged=merged_pre)
        if make_ext:
            # b-pyramid reference B: extended recon joins the device DPB
            ext = _extend_builder(enc)(fplanes)
        else:
            ext = None
        sm = dict(small, use32=out[9])
        if out[11] is not None:
            for cat, (si, ci, sp, cp) in out[11].items():
                sm["nr_" + cat] = jnp.concatenate(
                    [si, ci[None], sp, cp[None]])
        return sm, tails, ext

    if batch is None:
        prep_c = jax.jit(prep)
        main_c = jax.jit(main)
    else:
        # F independent B frames: vmap over the frame axis; the two
        # reference pictures (the mini-GOP anchors) broadcast
        prep_c = jax.jit(jax.vmap(
            prep, in_axes=(0, None, None, None, None, None, None, 0)))
        main_c = jax.jit(jax.vmap(
            main, in_axes=(0,) * 20 + (None, None, 0, None)))

    def run(oy, ocb, ocr, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
            qpy, qpb, qpr, lam, qp_base, dqp_cb, dqp_cr, sao_lam,
            poc_l0, poc_l1, qp_base_ctb, nr_offsets=None):
        (modes, mode32, mv0, mv1, d, inter, pred_y, pred_cb,
         pred_cr) = prep_c(oy, r0y, r0cb, r0cr, r1y, r1cb, r1cr, qp_base)
        small, tails, ext = main_c(oy, ocb, ocr, modes, mode32, mv0, mv1,
                                   d, inter, pred_y, pred_cb, pred_cr,
                                   qpy, qpb, qpr, lam, qp_base, dqp_cb,
                                   dqp_cr, sao_lam, poc_l0, poc_l1,
                                   qp_base_ctb, nr_offsets)
        small = dict(small, modes=modes.astype(jnp.uint8),
                     mode32=mode32.astype(jnp.uint8),
                     mv0=mv0.astype(jnp.int16), mv1=mv1.astype(jnp.int16),
                     dirs=d.astype(jnp.uint8), inter=inter)
        return small, tails, ext

    run.prep = prep_c
    run.main = main_c
    return run
