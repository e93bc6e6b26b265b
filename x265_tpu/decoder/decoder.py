"""Conformant HEVC decoder (intra toolset; inter arrives with the P/B path).

Role and API shape follow libde265 (libde265/libde265/de265.h push-model,
decctx.cc decode_NAL dispatch); the implementation is our own two-phase
design: (1) sequential host-side CABAC/syntax parse into ``PicSyntax``
arrays + coefficient planes, (2) reconstruction from those arrays — the
phase that runs batched on device in the TPU path (common/recon.py is the
numpy oracle of it).

The decoder exists in-repo for closed-loop conformance testing of the
encoder (SURVEY.md §4.4, §7 step 4): every encoded stream must decode here
AND in the external oracle with matching decoded-picture-hash SEI.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..cabac.ctu import CtuCoder, PicSyntax
from ..cabac.engine import CabacDecoder
from ..cabac.tables import init_context_states
from ..common.bitstream import (NAL_PPS, NAL_PREFIX_SEI, NAL_SPS,
                                NAL_SUFFIX_SEI, NAL_VPS, BitReader,
                                split_annexb)
from ..common.geometry import PictureGeometry
from ..common.headers import (SLICE_B, SLICE_I, SLICE_P, parse_pps,
                              parse_slice_header, parse_sps, parse_vps)
from ..common.recon import reconstruct_picture
from ..ops.deblock import deblock_intra_picture_np
from ..common.sei import (SEI_DECODED_PICTURE_HASH, parse_picture_hash,
                          parse_sei_rbsp, plane_md5)


class DecodeError(Exception):
    """Raised on malformed bitstreams (role of libde265's de265_error)."""


@dataclass
class DecodedPicture:
    poc: int
    planes: tuple          # (Y, Cb, Cr) numpy arrays cropped to conf window
    hash_ok: bool | None = None   # None = no hash SEI present
    syntax: PicSyntax | None = None
    qp: int = 0
    bit_depth: int = 8
    coded_planes: tuple | None = None  # full coded-size planes (hash domain)


class Decoder:
    """Stateful Annex-B decoder.  Feed bytes; collect ``.pictures``."""

    def __init__(self, check_hashes: bool = True):
        self.vps = {}
        self.sps = {}
        self.pps = {}
        self.pictures: list[DecodedPicture] = []  # display (output) order
        self.check_hashes = check_hashes
        self._pending_hash = None
        self._cur: DecodedPicture | None = None
        self._cur_is_ref = True
        self._dpb = {}          # poc -> coded-size planes (reference pics)
        self._col_motion = {}   # poc -> TMVP motion field
        self._reorder = []      # decoded pictures awaiting output bumping
        self._num_reorder = 0   # max pics that may precede in decode order
        self._prev_poc = 0      # PicOrderCntVal of the previous picture
        self._wf_cache = {}     # wavefront decode scans per geometry
        self.warnings: list[str] = []  # non-fatal stream issues (libde265
        #                                error_queue analogue, decctx.h:123)

    def _get_ref(self, rp: int, sps):
        """Reference lookup with missing-picture concealment: synthesize
        a mid-gray substitute (libde265 decctx.cc:1429
        generate_unavailable_reference_picture) instead of failing."""
        pic = self._dpb.get(rp)
        if pic is not None:
            return pic
        self.warnings.append(f"missing reference POC {rp}: concealed")
        mid = 1 << (sps.bit_depth_luma - 1)
        subst = (np.full((sps.pic_height, sps.pic_width), mid, np.int16),
                 np.full((sps.pic_height // 2, sps.pic_width // 2), mid,
                         np.int16),
                 np.full((sps.pic_height // 2, sps.pic_width // 2), mid,
                         np.int16))
        self._dpb[rp] = subst
        return subst

    def push_bytes(self, data: bytes) -> None:
        for nal_type, _tid, rbsp in split_annexb(data):
            try:
                self.push_nal(nal_type, rbsp)
            except (IndexError, AssertionError, KeyError,
                    NotImplementedError) as exc:
                raise DecodeError(
                    f"malformed NAL (type {nal_type}): {exc}") from exc
        self.flush()

    def flush(self) -> None:
        if self._cur is not None:
            self._finish_picture()
        # end of stream: drain the reorder buffer (C.5.2.2 bumping)
        self._reorder.sort(key=lambda p: p.poc)
        self.pictures.extend(self._reorder)
        self._reorder = []

    def push_nal(self, nal_type: int, rbsp: bytes) -> None:
        if nal_type == NAL_VPS:
            v = parse_vps(rbsp)
            self.vps[v.vps_id] = v
        elif nal_type == NAL_SPS:
            s = parse_sps(rbsp)
            self.sps[s.sps_id] = s
        elif nal_type == NAL_PPS:
            p = parse_pps(rbsp)
            self.pps[p.pps_id] = p
        elif nal_type in (NAL_PREFIX_SEI, NAL_SUFFIX_SEI):
            for ptype, payload in parse_sei_rbsp(rbsp):
                if ptype == SEI_DECODED_PICTURE_HASH:
                    self._pending_hash = parse_picture_hash(payload)
                    if self._cur is not None:
                        self._finish_picture()
        elif nal_type < 32:    # VCL NAL
            if self._cur is not None:
                self._finish_picture()
            self._decode_slice(nal_type, rbsp)

    # -- slice decode --------------------------------------------------------

    def _decode_slice(self, nal_type: int, rbsp: bytes) -> None:
        # pre-read pps_id to resolve the active parameter sets
        probe = BitReader(rbsp)
        probe.read_flag()                  # first_slice_segment_in_pic_flag
        if 16 <= nal_type <= 23:
            probe.read_flag()              # no_output_of_prior_pics_flag
        pps = self.pps[probe.read_ue()]
        sps = self.sps[pps.sps_id]

        br = BitReader(rbsp)
        sh = parse_slice_header(br, sps, pps, nal_type)

        # PicOrderCntVal (§8.3.1): msb continuation from the previous
        # picture; IDR resets to 0
        is_idr = 16 <= nal_type <= 23
        if is_idr:
            poc = 0
            # IDR starts a new CVS: output everything pending, clear refs
            self._reorder.sort(key=lambda p: p.poc)
            self.pictures.extend(self._reorder)
            self._reorder = []
            self._dpb.clear()
            self._col_motion.clear()
        else:
            max_lsb = 1 << sps.log2_max_poc_lsb
            lsb = sh.pic_order_cnt_lsb
            prev_lsb = self._prev_poc % max_lsb
            prev_msb = self._prev_poc - prev_lsb
            if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
                msb = prev_msb + max_lsb
            elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
                msb = prev_msb - max_lsb
            else:
                msb = prev_msb
            poc = msb + lsb
        # TRAIL_N and other *_N types are never referenced (§7.4.2.2)
        self._cur_is_ref = nal_type % 2 == 1 or is_idr
        self._num_reorder = max(
            self._num_reorder, sps.num_reorder_pics,
            *(v.num_reorder_pics for v in self.vps.values()))

        # RPS-driven DPB marking (§8.3.2): pictures outside the current
        # RPS become "unused for reference" and leave the DPB (replaces
        # any bound heuristic; libde265 decctx.cc:1461 process_reference_
        # picture_set)
        if not is_idr and sh.rps is not None:
            keep = {poc + d for d in sh.rps.delta_pocs_s0}
            keep |= {poc + d for d in sh.rps.delta_pocs_s1}
            for gone in [p for p in self._dpb if p not in keep]:
                del self._dpb[gone]

        # reference lists from the slice RPS (§8.3.2-3, no modification)
        refs_l0, refs_l1 = [], []
        pocs_l0, pocs_l1 = [], []
        if sh.slice_type != SLICE_I and sh.rps is not None:
            before = [poc + d for d, u in zip(sh.rps.delta_pocs_s0,
                                              sh.rps.used_s0) if u]
            after = [poc + d for d, u in zip(sh.rps.delta_pocs_s1,
                                             sh.rps.used_s1) if u]
            # l0 = before (closest first) then after; l1 = after then before
            l0 = before + after
            l1 = after + before
            for rp in l0[:sh.num_ref_idx_l0]:
                refs_l0.append(self._get_ref(rp, sps))
                pocs_l0.append(rp)
            if sh.slice_type == SLICE_B:
                for rp in l1[:sh.num_ref_idx_l1]:
                    refs_l1.append(self._get_ref(rp, sps))
                    pocs_l1.append(rp)

        geom = PictureGeometry(sps.pic_width, sps.pic_height,
                               sps.log2_ctb_size, sps.log2_min_cb_size)
        ps = PicSyntax(
            geom,
            max_tr_depth_intra=sps.max_transform_hierarchy_depth_intra,
            max_tr_depth_inter=sps.max_transform_hierarchy_depth_inter,
            sign_hiding=bool(pps.sign_data_hiding))
        ps.max_merge_cand = sh.max_num_merge_cand
        ps.cur_poc = poc
        ps.ref_pocs_l0 = tuple(pocs_l0)
        ps.ref_pocs_l1 = tuple(pocs_l1)
        # TMVP: attach the collocated picture's retained motion field
        if sh.temporal_mvp_enabled and sh.slice_type != SLICE_I:
            col_list = pocs_l0 if sh.collocated_from_l0 else pocs_l1
            if col_list:
                ci = min(sh.collocated_ref_idx, len(col_list) - 1)
                col = self._col_motion.get(col_list[ci])
                if col is not None:
                    ps.temporal_mvp = True
                    ps.col = col
        ps.slice_qp = sh.slice_qp
        ps.cu_qp_delta_enabled = bool(pps.cu_qp_delta_enabled)
        ps.qp_ctb[:] = sh.slice_qp
        coder = CtuCoder(ps, sps.log2_min_cb_size, sps.log2_min_tb_size,
                         sps.log2_max_tb_size, slice_type=sh.slice_type,
                         sao_luma=bool(sh.sao_luma),
                         sao_chroma=bool(sh.sao_chroma),
                         bit_depth=sps.bit_depth_luma,
                         num_ref_l0=max(1, len(pocs_l0)),
                         num_ref_l1=max(1, len(pocs_l1)),
                         mvd_l1_zero=bool(sh.mvd_l1_zero),
                         transquant_bypass=bool(
                             pps.transquant_bypass_enabled))

        # CABAC init (§9.3.2.2, cabac_init_flag 0): I->0, P->1, B->2
        init_type = {SLICE_I: 0, SLICE_P: 1, SLICE_B: 2}[sh.slice_type]
        ctx = init_context_states(init_type, sh.slice_qp)
        data = rbsp[br.bit_pos >> 3:]  # slice data starts byte-aligned
        dec = CabacDecoder(BitReader(data), ctx)
        for ctu in range(geom.n_ctbs):
            coder.decode_ctu(dec, ctu)
            end = dec.decode_terminate()
            if ctu < geom.n_ctbs - 1:
                if end:
                    raise DecodeError(
                        f"premature end_of_slice at CTU {ctu}")
            elif not end:
                raise DecodeError("missing end_of_slice flag")

        h = geom.ctbs_h << geom.log2_ctb
        w = geom.ctbs_w << geom.log2_ctb
        bd = sps.bit_depth_luma
        planes = (np.zeros((h, w), np.int16),
                  np.zeros((h // 2, w // 2), np.int16),
                  np.zeros((h // 2, w // 2), np.int16))
        if sh.slice_type != SLICE_I and not refs_l0:
            raise DecodeError("inter slice without reference")
        if not (sh.slice_type == SLICE_I
                and not pps.transquant_bypass_enabled
                and self._wavefront_decode(ps, planes, sh, sps, pps, geom)):
            use_w = (pps.weighted_pred and sh.slice_type == SLICE_P) or \
                (pps.weighted_bipred and sh.slice_type == SLICE_B)
            reconstruct_picture(
                ps, planes, sh.slice_qp, bd,
                pps.cb_qp_offset, pps.cr_qp_offset,
                strong_smoothing=bool(sps.strong_intra_smoothing),
                ref_planes=refs_l0 or None, refs_l1=refs_l1 or None,
                weights=sh if use_w else None)

        # retain this picture's motion field for later TMVP use
        pocs0a = np.asarray(ps.ref_pocs_l0 or (0,), np.int32)
        pocs1a = np.asarray(ps.ref_pocs_l1 or (0,), np.int32)
        r0 = np.minimum(ps.ref_idx0.astype(np.int32), len(pocs0a) - 1)
        r1 = np.minimum(ps.ref_idx1.astype(np.int32), len(pocs1a) - 1)
        self._col_motion[poc] = dict(
            pred_mode=ps.pred_mode.copy(),
            inter_dir=ps.inter_dir.copy(),
            mv0=ps.mv0.copy(), mv1=ps.mv1.copy(),
            poc0=pocs0a[r0], poc1=pocs1a[r1], poc=poc)
        while len(self._col_motion) > 8:
            self._col_motion.pop(next(iter(self._col_motion)))

        # decoded picture = coded size; output view = conformance-cropped
        cw, ch = sps.pic_width, sps.pic_height
        coded = (planes[0][:ch, :cw], planes[1][:ch // 2, :cw // 2],
                 planes[2][:ch // 2, :cw // 2])
        if not sh.deblocking_filter_disabled:
            coded = deblock_intra_picture_np(
                ps, coded, sh.slice_qp, bd,
                sh.beta_offset_div2, sh.tc_offset_div2,
                pps.cb_qp_offset, pps.cr_qp_offset)
        if sh.sao_luma or sh.sao_chroma:
            from ..ops.sao import sao_apply_plane_np
            ch2, cw2 = geom.ctbs_h, geom.ctbs_w
            ctb = 1 << geom.log2_ctb

            def apply(plane, c_idx, plane_sel, size):
                return sao_apply_plane_np(
                    plane, size,
                    ps.sao_type[:, plane_sel].reshape(ch2, cw2),
                    ps.sao_eo_class[:, plane_sel].reshape(ch2, cw2),
                    ps.sao_band_pos[:, c_idx].reshape(ch2, cw2),
                    ps.sao_offsets[:, c_idx].reshape(ch2, cw2, 4),
                    bd).astype(plane.dtype)

            y_p = apply(coded[0], 0, 0, ctb) if sh.sao_luma else coded[0]
            cb_p = apply(coded[1], 1, 1, ctb // 2) if sh.sao_chroma \
                else coded[1]
            cr_p = apply(coded[2], 2, 1, ctb // 2) if sh.sao_chroma \
                else coded[2]
            coded = (y_p, cb_p, cr_p)
        cl, cr, ct, cb = sps.conf_win   # offsets in chroma units
        wl = cw - 2 * (cl + cr)
        hl = ch - 2 * (ct + cb)
        y = coded[0][2 * ct:2 * ct + hl, 2 * cl:2 * cl + wl]
        u = coded[1][ct:ct + hl // 2, cl:cl + wl // 2]
        v = coded[2][ct:ct + hl // 2, cl:cl + wl // 2]
        if self._cur_is_ref:
            self._prev_poc = poc     # §8.3.1 prevTid0Pic
        self._cur = DecodedPicture(poc=poc,
                                   planes=(y, u, v), syntax=ps,
                                   qp=sh.slice_qp, bit_depth=bd,
                                   coded_planes=coded)

    def _wavefront_decode(self, ps, planes, sh, sps, pps, geom) -> bool:
        """Batched device reconstruction for uniform fixed-16-CU intra
        pictures (the structure our encoder emits): the same wavefront
        lax.scan as the encoder, in decode mode.  Returns False when the
        parsed structure doesn't fit (the numpy spec path covers it)."""
        n = 16
        if (1 << geom.log2_ctb) < n or geom.width % n or geom.height % n:
            return False
        if pps.cu_qp_delta_enabled:
            return False             # per-CTB QP -> numpy spec path
        h4c, w4c = geom.height >> 2, geom.width >> 2
        d = geom.log2_ctb - 4
        from ..cabac.ctu import MODE_INTRA as _INTRA
        if not ((ps.depth[:h4c, :w4c] == d).all()
                and (ps.part[:h4c, :w4c] == 0).all()
                and (ps.tu_depth[:h4c, :w4c] == 0).all()
                and (ps.pred_mode[:h4c, :w4c] == _INTRA).all()
                and (ps.chroma_mode[:h4c, :w4c]
                     == ps.luma_mode[:h4c, :w4c]).all()):
            return False

        from ..encoder.wavefront import WavefrontIntraRecon

        bd = sps.bit_depth_luma
        key = (geom.width, geom.height, geom.log2_ctb, bd)
        wfs = self._wf_cache.get(key)
        if wfs is None:
            wfs = [WavefrontIntraRecon(geom.width, geom.height,
                                       geom.log2_ctb, n, is_luma=True,
                                       bit_depth=bd),
                   WavefrontIntraRecon(geom.width, geom.height,
                                       geom.log2_ctb, n // 2, is_luma=False,
                                       chroma_shift=1, bit_depth=bd)]
            self._wf_cache[key] = wfs
        if wfs[0].sched["host_mask"].any():
            return False

        from ..cabac.ctu import chroma_qp
        bd_off = 6 * (bd - 8)
        qp_y = sh.slice_qp + bd_off
        qp_cb = chroma_qp(sh.slice_qp, pps.cb_qp_offset) + bd_off
        qp_cr = chroma_qp(sh.slice_qp, pps.cr_qp_offset) + bd_off
        modes = ps.luma_mode[::4, ::4].astype(np.int32).reshape(-1)

        def blocks(plane, bn):
            gh, gw = wfs[0].sched["grid"]
            return plane.reshape(gh, bn, gw, bn).transpose(
                0, 2, 1, 3).reshape(-1, bn, bn)

        planes[0][:] = np.asarray(
            wfs[0].decode(blocks(ps.coeff_y, n), modes, qp_y))
        planes[1][:] = np.asarray(
            wfs[1].decode(blocks(ps.coeff_cb, n // 2), modes, qp_cb))
        planes[2][:] = np.asarray(
            wfs[1].decode(blocks(ps.coeff_cr, n // 2), modes, qp_cr))
        return True

    def _finish_picture(self) -> None:
        pic = self._cur
        self._cur = None
        if pic is None:
            return
        if self._pending_hash is not None and self.check_hashes:
            htype, digests = self._pending_hash
            from ..common.sei import plane_checksum, plane_crc
            fn = {0: plane_md5, 1: plane_crc, 2: plane_checksum}[htype]
            dt = np.uint8 if pic.bit_depth == 8 else np.uint16
            pic.hash_ok = all(
                fn(p.astype(dt), pic.bit_depth) == d
                for p, d in zip(pic.coded_planes, digests))
        self._pending_hash = None
        if self._cur_is_ref:
            # post-filter picture joins the DPB as a reference; eviction
            # is RPS-driven at the next slice header (§8.3.2), this bound
            # is only a safety net against RPS-less malformed streams
            self._dpb[pic.poc] = pic.coded_planes
            if len(self._dpb) > 16:
                del self._dpb[min(self._dpb)]
        # output bumping (C.5.2.2): emit lowest-POC pictures once more
        # than num_reorder are waiting
        self._reorder.append(pic)
        while len(self._reorder) > self._num_reorder:
            nxt = min(range(len(self._reorder)),
                      key=lambda i: self._reorder[i].poc)
            self.pictures.append(self._reorder.pop(nxt))


def decode_annexb(data: bytes, check_hashes: bool = True):
    """One-shot convenience: full stream bytes -> [DecodedPicture]."""
    d = Decoder(check_hashes=check_hashes)
    d.push_bytes(data)
    return d.pictures
