"""The frame encoder: I and P slices (IPPP GOPs), TPU-first.

Pipeline per frame:
  A. ONE fused device program (encoder/device_pipeline.py): batched
     35-mode intra analysis, full+subpel motion search, chroma MC, the
     inter/intra decision, and the three-plane wavefront reconstruction
     (closed-loop recon as a lax.scan over z-scan dependency levels).
  B. Host passes over the returned decision/coefficient arrays:
     merge/AMVP syntax derivation, skip derivation, BS-aware deblocking,
     rate control.
  C. Entropy: the native C slice serializer (native/slice_enc.c) over the
     PicSyntax arrays — or the Python CABAC reference path — then slice
     header, Annex-B NAL assembly, decoded-picture-hash suffix SEI.

Top-level API mirrors the reference C API surface (x265.h:1334-1403):
Encoder(params) ~ x265_encoder_open, .headers() ~ x265_encoder_headers,
.encode_frame() ~ x265_encoder_encode.
"""

from __future__ import annotations

import sys as _sys

import numpy as np

from ..cabac.ctu import (MODE_INTER, MODE_INTRA, CtuCoder, PicSyntax,
                         chroma_qp)
from ..cabac.engine import CabacEncoder
from ..cabac.tables import init_context_states
from ..common.bitstream import (NAL_IDR_W_RADL, NAL_PPS, NAL_PREFIX_SEI,
                                NAL_SPS, NAL_SUFFIX_SEI, NAL_TRAIL_R,
                                NAL_VPS, wrap_nal)
from ..common.geometry import PictureGeometry
from ..common.headers import (PPS, SPS, VPS, SLICE_B, SLICE_I, SLICE_P,
                              SliceHeader,
                              write_pps, write_slice_header, write_sps,
                              write_vps)
from ..common.params import Params
from ..common.recon import (chroma_tu_leaves, cu_leaves, gather_reference,
                            strong_smooth_reference, tu_leaves)
from ..common.sei import (SEI_DECODED_PICTURE_HASH, picture_hash_payload,
                          write_sei_rbsp)
from ..ops.deblock import deblock_intra_picture_np
from ..ops.intra import filter_flag, filter_reference_np, predict_intra_np
from ..ops.quantize import dequant_np, quant_np
from ..ops.transforms import forward_transform_np, inverse_transform_np


from dataclasses import dataclass


@dataclass
class EncodedFrame:
    """One encoded picture (x265_picture out-analogue, x265.h:155)."""
    poc: int              # POC within its coded video sequence
    display_idx: int      # global display-order index
    au: bytes             # access unit (Annex-B)
    recon: tuple          # conformance-cropped recon planes
    coded: tuple          # full coded-size recon (reference domain)
    kind: str             # "I" / "P" / "B"
    qp: int
    coded_dev: tuple = None   # device-resident ME-extended recon planes
    stats: dict = None    # x265_frame_stats analogue (CU distribution)


def _frame_cu_stats(ps) -> dict:
    """Per-frame CU distribution (x265_frame_stats.cuStats analogue,
    x265.h:119 / encoder.cpp:1230 finishFrameStats)."""
    pm = ps.pred_mode[::4, ::4]
    n = pm.size
    inter = pm != 1
    mf = ps.merge_flag[::4, ::4] != 0
    sk = ps.skip[::4, ::4] != 0
    d = ps.depth[::4, ::4].astype(np.int32)

    def pct_depth(k):
        # guard negative depths (small CTUs): comparing a uint8 view
        # against an out-of-range scalar crashes this numpy build
        if k < 0:
            return 0.0
        return round(100.0 * float((d == k).sum()) / n, 2)

    return {
        "pct_intra": round(100.0 * float((~inter).sum()) / n, 2),
        "pct_inter": round(100.0 * float(inter.sum()) / n, 2),
        "pct_merge": round(100.0 * float((inter & mf).sum()) / n, 2),
        "pct_skip": round(100.0 * float((inter & sk).sum()) / n, 2),
        # per-CU-size area shares (16-unit granularity)
        "pct_cu64": pct_depth(ps.geom.log2_ctb - 6),
        "pct_cu32": pct_depth(ps.geom.log2_ctb - 5),
        "pct_cu16": pct_depth(ps.geom.log2_ctb - 4),
    }


@dataclass
class _Pending:
    """A dispatched frame awaiting its host finish (fetch + entropy).

    The device programs were queued asynchronously; the DPB already points
    at this frame's device-resident recon, so later frames' device work can
    be dispatched before this one's host pass runs — the TPU analogue of
    x265's frame-thread overlap (frameencoder.cpp:296: entropy of frame N
    runs while frame N+1's workers are already compressing).
    """
    poc: int
    kind: str
    qp: int
    ps: object
    display_idx: int
    planes: tuple = None        # original (uncropped) source planes
    orig: tuple = None          # padded coded-size source
    out_dev: object = None      # device output tuple (None = host path)
    ext: object = None          # device ME-extended recon (anchors)
    l0_poc: object = None
    l1_poc: object = None
    rec: tuple = None           # recon planes (host path fills at dispatch)
    cu_size: int = 16
    allow_scenecut: bool = False
    la: object = None
    batch_idx: object = None    # index into a batched-B dispatch
    qp_arrays: object = None    # stashed device QP inputs (deferred B)
    is_ref_b: bool = False      # b-pyramid reference B (TRAIL_R)
    filter_qps: object = None
    wp: tuple = (64, 0, False)  # L0 luma weight (w, offset, enabled)


_PACK_CACHE: dict = {}


def fetch_packed(small: dict) -> dict:
    """Fetch a dict of device arrays as ONE transfer: a tiny jitted
    program bitcasts every leaf to uint8 and concatenates them into a
    single buffer, so the device->host link pays ONE round trip instead
    of one per leaf (the axon tunnel costs ~50 ms latency per fetch —
    per-leaf fetching of the ~20-leaf small dict dominated the frame
    budget)."""
    import jax
    import jax.numpy as jnp

    names = sorted(small)
    leaves = [small[n] for n in names]
    key = tuple((n, str(v.dtype), tuple(v.shape))
                for n, v in zip(names, leaves))
    ent = _PACK_CACHE.get(key)
    if ent is None:
        metas = []
        off = 0
        for n, v in zip(names, leaves):
            host_dt = np.dtype(str(v.dtype)) if v.dtype != jnp.bool_ \
                else np.dtype(bool)
            store_dt = np.uint8 if host_dt == bool else host_dt
            nb = int(np.prod(v.shape, dtype=np.int64)) * \
                np.dtype(store_dt).itemsize
            metas.append((n, host_dt, tuple(v.shape), off, nb))
            off += nb

        def pack(*ls):
            bs = []
            for x in ls:
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.uint8)
                if x.dtype != jnp.uint8:
                    x = jax.lax.bitcast_convert_type(x, jnp.uint8)
                bs.append(x.reshape(-1))
            return jnp.concatenate(bs)

        ent = _PACK_CACHE[key] = (jax.jit(pack), metas, off)
    pack_fn, metas, total = ent
    buf = np.asarray(pack_fn(*leaves))
    out = {}
    for n, host_dt, shape, off, nb in metas:
        store_dt = np.uint8 if host_dt == bool else host_dt
        a = np.frombuffer(buf[off:off + nb].tobytes(),
                          dtype=store_dt).reshape(shape)
        out[n] = a.astype(bool) if host_dt == bool else a
    return out


class _BatchFetch:
    """Fetch handle for a frame's (or batched mini-GOP's) small outputs:
    ONE packed transfer, optionally prefetched on a background thread so
    the device->host link overlaps the previous frame's host entropy
    pass (x265's frame-thread overlap, re-cast for the transfer link)."""

    def __init__(self, small):
        self.small = small
        self._np = None
        self._t = None

    def _run(self):
        self._np = fetch_packed(self.small)

    def start(self):
        if self._t is None and self._np is None:
            import threading
            self._t = threading.Thread(target=self._run, daemon=True)
            self._t.start()

    def fetch(self):
        if self._t is not None:
            self._t.join()
            self._t = None
        if self._np is None:
            self._np = fetch_packed(self.small)
        return self._np


def pad_plane(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad a plane to (h, w) (reference: PicYuv padding)."""
    out = np.empty((h, w), dtype=p.dtype)
    ph, pw = p.shape
    out[:ph, :pw] = p
    if pw < w:
        out[:ph, pw:] = out[:ph, pw - 1:pw]
    if ph < h:
        out[ph:, :] = out[ph - 1:ph, :]
    return out


class Encoder:
    """HEVC encoder (I/P slices).  See README.md for the honored Params
    subset; unsupported tools are listed in the round status matrix."""

    def __init__(self, params: Params):
        self.params = params
        w, h = params.source_width, params.source_height
        assert w > 0 and h > 0
        # x265_log-style startup honesty: warn for every accepted option
        # the engine does not actually honor (params._UNSUPPORTED)
        if params.log_level >= 1:
            import sys
            from ..common.params import unsupported_param_warnings
            for msg in unsupported_param_warnings(params):
                print(msg, file=sys.stderr)
        if params.lossless:
            # transquant bypass (x265 --lossless, encoder.cpp configure):
            # lossy-only tools off; in-loop filters would break exactness
            params.sign_hide = False
            params.sao = False
            params.deblock = False
            params.aq_mode = 0
        # coded size: round up to the analysis-CU grid (16) so the whole
        # picture runs on the device wavefront (no edge-crossing CUs);
        # the overshoot is hidden by the conformance window, mirroring the
        # reference's min-CU padding (x265_1.9 PicYuv::copyFromPicture)
        align = 16
        cw = (w + align - 1) & ~(align - 1)
        ch = (h + align - 1) & ~(align - 1)
        log2_ctb = params.ctu_size.bit_length() - 1
        self.geom = PictureGeometry(cw, ch, log2_ctb, 3)
        self.bit_depth = params.internal_bit_depth

        from ..common.headers import ProfileTierLevel
        from ..common.level import determine_level, enforce_level
        level_idc, tier = determine_level(
            cw, ch, params.fps_num, params.fps_denom,
            bitrate_kbps=max(params.bitrate, params.vbv_max_bitrate),
            requested_idc=params.level_idc, high_tier=params.high_tier)
        for msg in enforce_level(params, level_idc, tier):
            if params.log_level >= 1:
                import sys
                print(msg, file=sys.stderr)
        ptl = ProfileTierLevel(profile_idc=2 if self.bit_depth > 8 else 1,
                               level_idc=level_idc, tier_flag=tier)
        self.sps = SPS(
            ptl=ptl,
            pic_width=cw, pic_height=ch,
            bit_depth_luma=self.bit_depth, bit_depth_chroma=self.bit_depth,
            log2_ctb_size=log2_ctb,
            log2_min_cb_size=3,
            max_transform_hierarchy_depth_intra=max(
                0, params.tu_intra_depth - 1),
            # inter CUs merged up to 64x64 keep 16x16 TUs (identical recon
            # to the analysis grid) -> the TU tree needs two split levels
            max_transform_hierarchy_depth_inter=2,
            conf_win=(0, (cw - w) // 2, 0, (ch - h) // 2),
            strong_intra_smoothing=int(params.strong_intra_smoothing),
            vui_timing_present=1, vui_present=1,
            fps_num=params.fps_num, fps_denom=params.fps_denom,
            # VUI color/display signaling (Annex E; x265 --sar etc.)
            sar_width=params.sar_width, sar_height=params.sar_height,
            video_format=params.video_format,
            video_full_range=bool(params.video_full_range),
            colour_description_present=(params.colorprim != 2
                                        or params.transfer != 2
                                        or params.colormatrix != 2),
            colour_primaries=params.colorprim,
            transfer_characteristics=params.transfer,
            matrix_coeffs=params.colormatrix,
            chroma_loc_top=params.chromaloc,
            chroma_loc_bottom=params.chromaloc,
            # DPB capacity covers the retained reference anchors + the
            # current picture (A.4.1 / dec265 rejects RPSs larger than
            # sps_max_dec_pic_buffering)
            max_dec_pic_buffering=max(1, min(4, params.ref)) + 1,
            num_reorder_pics=0,
            temporal_mvp_enabled=int(bool(params.temporal_mvp)),
            sao_enabled=int(params.sao))
        shd = int(params.sign_hide)
        if params.deblock:
            self.pps = PPS(init_qp=26, sign_data_hiding=shd,
                           deblocking_filter_control_present=int(
                               params.deblock_tc_offset
                               or params.deblock_beta_offset),
                           tc_offset_div2=params.deblock_tc_offset,
                           beta_offset_div2=params.deblock_beta_offset)
        else:
            self.pps = PPS(init_qp=26, sign_data_hiding=shd,
                           deblocking_filter_control_present=1,
                           deblocking_filter_disabled=1)
        # explicit weighted prediction for P slices (x265 --weightp);
        # Bs keep weighted_bipred=0 (weightb unsupported)
        self.pps.weighted_pred = int(params.weightp)
        self.pps.transquant_bypass_enabled = int(params.lossless)
        self.vps = VPS(ptl=ptl)
        # adaptive quantization (x265 aq-mode 1/2/3): per-CTB QPs signaled
        # with cu_qp_delta at QG == CTB granularity
        self.aq = bool(params.aq_mode and params.aq_strength > 0)
        self.pps.cu_qp_delta_enabled = int(self.aq)
        self.qp = params.qp
        self.poc = 0
        self.frames_encoded = 0
        self.last_slice_type_str = "I"
        self.force_host_recon = False   # tests can force the numpy oracle
        self.force_python_entropy = False
        self.force_python_derivation = False
        self.force_cu16 = False         # tests: disable the 32-CU decision
        self._wf = {}                   # cached WavefrontIntraRecon per plane
        self._ctu_scan = None           # cached CtuScan (all-plane recon)
        self._mode_tables = {}          # cached mode-decision gather tables
        self._i_pipeline = None         # fused I-frame device program
        self._p_pipeline = None         # fused P-frame device program
        self._b_pipeline = None         # fused B-frame device program
        self._b_batch_pipelines = {}    # F -> batched-B device program
        self.ref = None                 # (Y, Cb, Cr) coded-size ref planes
        # lossless v1 is all-intra (inter transquant-bypass lands with the
        # bypass-aware P pipeline)
        self.force_all_intra = bool(params.lossless)
        # hierarchical motion search (x265 motion.cpp:571 MVP-seeded search
        # re-cast TPU-first): a quarter-res full search seeds a per-block
        # +-me_fine full-res refine, honoring --merange up to 64.
        # me_range is the TOTAL full-pel reach (= ME/MC margin driver).
        # merange is a MAXIMUM in x265 (motion.cpp:571 clamps the pattern
        # to the range); round the coarse reach DOWN so the total never
        # exceeds the request (round-3/4 advice: emitted MVs must stay
        # within --merange).
        mr = max(1, min(64, params.me_range))
        self.me_fine = min(8, mr)
        self.me_coarse = max(0, (mr - self.me_fine) // 4)
        self.me_range = 4 * self.me_coarse + self.me_fine
        # DCT-domain noise reduction (x265 --nr-intra/--nr-inter;
        # quant.cpp:205 denoiseDct + frameencoder.cpp:1331 update):
        # host-side running sums drive per-position offsets fed to the
        # device scan each frame
        self._nr_enabled = bool(params.noise_reduction_intra
                                or params.noise_reduction_inter)
        self._nr_sizes = {"y16": (256, 16), "c8": (64, 8),
                          "y32": (1024, 32), "c16": (256, 16)}
        self._nr_state = {}
        self._nr_offsets = {}
        if self._nr_enabled:
            for cat, (nn, _) in self._nr_sizes.items():
                for sfx in ("_i", "_p"):
                    self._nr_state[cat + sfx] = [
                        np.zeros((nn,), np.int64), 0]
                    self._nr_offsets[cat + sfx] = np.zeros((nn,),
                                                           np.int32)

        # stage wall-clock accounting (x265 DETAILED_CU_STATS /
        # printSummary analogue, SURVEY §5 tracing): accumulated by the
        # finish path; summary() renders the encode report
        import time as _time
        self._clock = _time.time
        self._t0 = self._clock()
        self._perf = {"frames": 0, "bytes": 0, "qp_sum": 0,
                      "fetch_wait": 0.0, "entropy": 0.0,
                      "by_type": {"I": 0, "P": 0, "B": 0}}
        from .ratecontrol import RateControl
        self.rc = RateControl(params)
        # HRD signaling (x265 --hrd; ratecontrol.cpp:618 initHRD):
        # requires VBV; emits hrd_parameters in the VUI plus
        # buffering-period (IRAP) and pic-timing (every AU) SEIs
        self.hrd = bool(params.hrd)
        if self.hrd and not self.rc.vbv:
            if params.log_level >= 1:
                print("x265_tpu [warning]: --hrd requires --vbv-bufsize/"
                      "--vbv-maxrate; disabling HRD", file=_sys.stderr)
            self.hrd = False
        if self.hrd:
            self._init_hrd()
        self._last_bp_order = 0         # encode order of the last BP SEI
        self._cvs_finish_base = 0       # finish counter at the last IDR
        # per-range/per-frame QP overrides (x265 --zones ratecontrol.cpp
        # getZone:156; --qpfile encoder.cpp forceqp intake)
        self._zones: list = []
        if params.zones:
            for z in params.zones.split("/"):
                parts = z.split(",")
                s, e = int(parts[0]), int(parts[1])
                qv = fac = None
                for kv in parts[2:]:
                    k, v = kv.split("=")
                    if k == "q":
                        qv = int(v)
                    elif k == "b":
                        fac = float(v)
                self._zones.append((s, e, qv, fac))
        self._qpfile_map: dict[int, int] = {}
        if params.qpfile:
            with open(params.qpfile) as fh:
                for line in fh:
                    f = line.split()
                    if len(f) >= 3 and int(f[2]) >= 0:
                        self._qpfile_map[int(f[0])] = int(f[2])
        self._prev_half = None          # half-res Y of the previous source
        # GOP structure (x265 slicetype role, fixed pattern = b-adapt 0):
        # display-order input queue + mini-GOP reordering when bframes > 0
        self.bframes = params.bframes
        self._queue = []                # [(poc, planes)] pending display order
        self._next_poc = 0              # next display POC within the CVS
        self._display_idx = 0           # global input counter (keyint)
        self._cvs_base = 0              # global index of the current IDR
        self.dpb = {}                   # poc -> coded-size recon planes
        self.dpb_dev = {}               # poc -> device-resident ext planes
        # multi-reference prediction (x265 --ref; search.cpp:2050
        # per-ref ME loop): up to 4 retained anchors form the L0 list
        self.num_ref = max(1, min(4, params.ref))
        self._ref_pocs: list[int] = []  # retained anchors, nearest first
        # weight-analysis source mirror: poc -> UNPADDED source luma of
        # every potential L0 reference (anchors).  Dedicated map (not the
        # DPB) so weightp is independent of pipeline timing and identical
        # between the sequential and GOP-parallel paths (round-3 bug:
        # gop.py never populated the DPB mirror, silently diverging).
        self._wp_src = {}
        self._col_store = {}    # poc -> collocated motion field (TMVP)
        self.prev_anchor_poc = None
        # lookahead (x265 slicetype.cpp role): cuTree propagation over a
        # rc_lookahead-deep window; adds output delay exactly like the
        # reference (push_frame/flush API).  encode_frame() is the
        # zero-latency path (x265 tune zerolatency: no lookahead/cutree).
        self.lookahead = None
        self._use_lookahead = ((params.cu_tree and params.rc_lookahead > 0
                                and self.aq)
                               or (params.b_adapt > 0 and self.bframes > 0
                                   and params.rc_lookahead > 0))
        self._anchor_low = None         # LowresFrame of the last anchor
        self._la_frame = None           # (offsets16, satd, scenecut)
        # frame pipeline: dispatched-but-unfinished frames (x265 frame
        # parallelism analogue, SURVEY §2.6 P2: device work of frame N+1
        # overlaps the host entropy pass of frame N)
        self._inflight: list[_Pending] = []
        self.pipeline_depth = max(1, params.frame_parallelism)
        # b-pyramid: the middle B of each mini-GOP becomes a reference
        # (x265 slicetype.cpp B-pyramid; --b-pyramid default on)
        self.b_pyramid = bool(params.b_pyramid and self.bframes >= 2)
        if self.bframes:
            # anchors precede their Bs in decode order but follow in
            # output order; libde265 bumps off the VPS value
            # (decctx.cc:1959).  The pyramid adds one reorder level and
            # one DPB slot for the reference B.
            reorder = 2 if self.b_pyramid else 1
            cap = max(4, self.num_ref + 2) + (1 if self.b_pyramid else 0)
            self.sps.num_reorder_pics = reorder
            self.sps.max_dec_pic_buffering = cap
            self.vps.num_reorder_pics = reorder
            self.vps.max_dec_pic_buffering = cap

    def _init_hrd(self) -> None:
        """x265 RateControl::initHRD (ratecontrol.cpp:618): normalize the
        VBV rate/size into the HRD value/scale notation and size the SEI
        delay fields."""
        p = self.params
        sps = self.sps

        def ctz(x):
            return (x & -x).bit_length() - 1 if x > 0 else 0

        def blen(x):
            return max(1, int(x).bit_length())

        br = p.vbv_max_bitrate * 1000
        cpb = p.vbv_buffer_size * 1000
        sps.hrd_bit_rate_scale = min(15, max(0, ctz(br) - 6))
        sps.hrd_bit_rate_value = br >> (sps.hrd_bit_rate_scale + 6)
        sps.hrd_cpb_size_scale = min(15, max(0, ctz(cpb) - 4))
        sps.hrd_cpb_size_value = cpb >> (sps.hrd_cpb_size_scale + 4)
        br_u = sps.hrd_bit_rate_value << (sps.hrd_bit_rate_scale + 6)
        cpb_u = sps.hrd_cpb_size_value << (sps.hrd_cpb_size_scale + 4)
        self._hrd_bitrate_unscale = br_u
        self._hrd_cpb_unscale = cpb_u
        tick = sps.fps_num / max(1, sps.fps_denom)
        max_cpb_delay = int(min(max(1, p.keyint_max) * 0.5 * tick, 2**31))
        max_dpb_delay = int(max(1, sps.max_dec_pic_buffering * 0.5 * tick))
        max_delay = int(90000.0 * cpb_u / max(1, br_u) + 0.5)
        sps.hrd_initial_cpb_len = 2 + min(22, max(4, 32 - blen(max_delay)))
        sps.hrd_cpb_removal_len = min(31, max(4, 32 - blen(max_cpb_delay)))
        sps.hrd_dpb_output_len = min(31, max(4, 32 - blen(max_dpb_delay)))
        sps.hrd_cbr = (p.rc_mode == 2
                       and p.vbv_max_bitrate <= p.bitrate)
        sps.hrd_present = True
        sps.vui_present = 1
        sps.vui_timing_present = 1

    def _min_keyint(self) -> int:
        """Effective --min-keyint: x265's auto derivation when 0
        (encoder.cpp:1609-1614: min(fps, keyint/10), clamped to
        [1, keyint/2 + 1])."""
        p = self.params
        keyint = max(1, p.keyint_max)
        mk = p.keyint_min
        if mk <= 0:
            fps = p.fps_num / max(1, p.fps_denom)
            mk = min(int(fps), keyint // 10)
        return max(1, min(mk, keyint // 2 + 1))

    # -- stream headers ------------------------------------------------------

    def headers(self) -> bytes:
        out = (wrap_nal(NAL_VPS, write_vps(self.vps))
               + wrap_nal(NAL_SPS, write_sps(self.sps))
               + wrap_nal(NAL_PPS, write_pps(self.pps)))
        hdr_seis = []
        if self.params.master_display:
            from ..common.sei import (SEI_MASTERING_DISPLAY,
                                      mastering_display_payload)
            hdr_seis.append((SEI_MASTERING_DISPLAY,
                             mastering_display_payload(
                                 self.params.master_display)))
        if self.params.max_cll:
            from ..common.sei import (SEI_CONTENT_LIGHT_LEVEL,
                                      content_light_level_payload)
            cll, fall = (int(v) for v in self.params.max_cll.split(","))
            hdr_seis.append((SEI_CONTENT_LIGHT_LEVEL,
                             content_light_level_payload(cll, fall)))
        if hdr_seis:
            from ..common.bitstream import NAL_PREFIX_SEI as _PFX
            out += wrap_nal(_PFX, write_sei_rbsp(hdr_seis),
                            long_start_code=False)
        if self.params.emit_info_sei:
            # x265-style user_data_unregistered SEI with encoder info
            from .. import __version__
            from ..common.bitstream import NAL_PREFIX_SEI
            from ..common.sei import SEI_USER_DATA_UNREGISTERED
            uuid = bytes(range(16))
            info = (f"x265_tpu {__version__} - TPU-native HEVC encoder - "
                    f"qp={self.params.qp} ctu={self.params.ctu_size}"
                    ).encode()
            sei = write_sei_rbsp([(SEI_USER_DATA_UNREGISTERED,
                                   uuid + info)])
            out += wrap_nal(NAL_PREFIX_SEI, sei)
        return out

    def _complexity_estimate(self, orig, is_p: bool) -> float:
        """Per-frame complexity for rate control (x265 lookahead SATD
        analogue, slicetype.cpp m_currentSatd): half-res SAD vs the
        previous source for P, gradient energy for I.  Replaced by the
        device lowres lookahead when it lands."""
        y = orig[0].astype(np.int32)
        half = (y[0::2, 0::2] + y[1::2, 0::2]
                + y[0::2, 1::2] + y[1::2, 1::2] + 2) >> 2
        if is_p and self._prev_half is not None:
            est = 1.5 * float(np.abs(half - self._prev_half).sum())
        else:
            est = 0.8 * float(np.abs(np.diff(half, axis=1)).sum()
                              + np.abs(np.diff(half, axis=0)).sum())
        self._prev_half = half
        return est

    # -- pass A: batched mode decision --------------------------------------

    def _decide_modes(self, orig):
        """Open-loop best intra mode per fixed-size CU, batched on device.

        Returns (cu_log2, modes[gh, gw] int array) with the CU grid at
        ``cu_size``.  Uses jnp (MXU matmul over all 35 modes at once).
        """
        import jax.numpy as jnp

        from ..ops.cost import satd
        from ..ops.intra import predict_all_modes, substitute_references

        g = self.geom
        cu_size = min(16, 1 << g.log2_ctb)   # fixed analysis CU for v1
        n = cu_size
        y = orig[0]
        gh = (g.ctbs_h << g.log2_ctb) // n
        gw = (g.ctbs_w << g.log2_ctb) // n

        # gather canonical reference vectors for every block (vectorized;
        # index/availability tables are static per geometry and cached)
        H, W = y.shape
        ridx, avails = self._mode_gather_tables(n, gh, gw, H, W)
        refs = y.reshape(-1)[ridx].astype(np.int32)

        refs_j = substitute_references(jnp.asarray(refs), jnp.asarray(avails),
                                       self.bit_depth)
        preds = predict_all_modes(refs_j, n, True, self.bit_depth)
        blocks = jnp.asarray(
            y.reshape(gh, n, gw, n).transpose(0, 2, 1, 3).reshape(
                gh * gw, n, n).astype(np.int32))
        costs = satd(blocks[:, None], preds)        # [B, 35]
        modes = np.asarray(jnp.argmin(costs, axis=1)).reshape(gh, gw)
        best = np.asarray(jnp.min(costs, axis=1)).reshape(gh, gw)
        return cu_size, modes, best

    def _mode_gather_tables(self, n, gh, gw, H, W):
        """Cached [B, 4n+1] flat gather indices + availability for the
        open-loop mode-decision reference vectors."""
        key = (n, gh, gw, H, W)
        t = self._mode_tables.get(key)
        if t is not None:
            return t
        from ..common.geometry import intra_neighbor_coords
        g = self.geom
        ridx = np.zeros((gh * gw, 4 * n + 1), np.int64)
        avails = np.zeros((gh * gw, 4 * n + 1), bool)
        for by in range(gh):
            for bx in range(gw):
                x0, y0 = bx * n, by * n
                xs, ys = intra_neighbor_coords(x0, y0, n)
                avails[by * gw + bx] = g.avail_rows(x0, y0, xs, ys)
                ridx[by * gw + bx] = (np.clip(ys, 0, H - 1) * W
                                      + np.clip(xs, 0, W - 1))
        self._mode_tables[key] = (ridx, avails)
        return ridx, avails

    def _chroma_gather_tables(self, n, gh, gw, H, W):
        """Chroma twin of _mode_gather_tables: availability evaluated in
        LUMA coordinates (geometry z-scan is luma-domain)."""
        key = ("c", n, gh, gw, H, W)
        t = self._mode_tables.get(key)
        if t is not None:
            return t
        from ..common.geometry import intra_neighbor_coords
        g = self.geom
        ridx = np.zeros((gh * gw, 4 * n + 1), np.int64)
        avails = np.zeros((gh * gw, 4 * n + 1), bool)
        for by in range(gh):
            for bx in range(gw):
                x0, y0 = bx * n, by * n
                xs, ys = intra_neighbor_coords(x0, y0, n)
                avails[by * gw + bx] = g.avail_rows(
                    x0 << 1, y0 << 1, xs << 1, ys << 1)
                ridx[by * gw + bx] = (np.clip(ys, 0, H - 1) * W
                                      + np.clip(xs, 0, W - 1))
        self._mode_tables[key] = (ridx, avails)
        return ridx, avails

    def _encode_lossless(self, ps, orig):
        """All-intra transquant-bypass picture (x265 --lossless,
        quant.cpp lossless bypass; §8.6.6).  recon == source, so intra
        prediction reads ORIGINAL neighbors — the closed-loop wavefront
        dependency vanishes and every block's mode decision, prediction
        and residual runs as one batch.  Residual samples are coded
        verbatim through residual_coding."""
        import jax.numpy as jnp

        from .wavefront import _predict_lanes, _substitute

        bd = self.bit_depth
        cu_size, modes, _c = self._decide_modes(orig)
        s4 = cu_size // 4
        ps.luma_mode[:] = np.kron(modes.astype(np.uint8),
                                  np.ones((s4, s4), np.uint8))
        ps.chroma_mode[:] = ps.luma_mode
        ps.tq_bypass[:] = 1
        rec = []
        jobs = ((orig[0], cu_size, True, ps.coeff_y, False),
                (orig[1], cu_size // 2, False, ps.coeff_cb, True),
                (orig[2], cu_size // 2, False, ps.coeff_cr, True))
        for pl, n, is_luma, coeff, is_chroma in jobs:
            H, W = pl.shape
            gh, gw = H // n, W // n
            if is_chroma:
                ridx, avails = self._chroma_gather_tables(n, gh, gw, H, W)
            else:
                ridx, avails = self._mode_gather_tables(n, gh, gw, H, W)
            raw = jnp.asarray(pl.reshape(-1)[ridx].astype(np.int32))
            refs = _substitute(raw, jnp.asarray(avails), bd)
            m = jnp.asarray(modes.reshape(-1).astype(np.int32))
            pred = _predict_lanes(refs, m, n, is_luma, bd)
            blocks = pl.reshape(gh, n, gw, n).transpose(
                0, 2, 1, 3).reshape(-1, n, n).astype(np.int32)
            resi = blocks - np.asarray(pred)
            coeff[:] = resi.reshape(gh, gw, n, n).transpose(
                0, 2, 1, 3).reshape(H, W)
            rec.append(pl.astype(np.int16))
        return tuple(rec)

    # -- pass B: sequential reconstruction ----------------------------------

    def _encode_tu(self, orig_pl, rec_pl, coeff_pl, ps, x0, y0, log2_size,
                   mode, qp, *, is_luma, chroma_shift=0):
        g = self.geom
        n = 1 << log2_size
        bd = self.bit_depth
        ref = gather_reference(rec_pl, g, x0, y0, n, bd,
                               chroma_shift=chroma_shift)
        if filter_flag(mode, n, is_luma):
            if self.sps.strong_intra_smoothing and n == 32:
                ref = strong_smooth_reference(ref, n, bd)
            else:
                ref = filter_reference_np(ref)
        pred = predict_intra_np(mode, ref, n, is_luma=is_luma, bit_depth=bd,
                                already_filtered=True)
        resi = orig_pl[y0:y0 + n, x0:x0 + n].astype(np.int32) - pred
        dst = is_luma and n == 4
        coef = forward_transform_np(resi, bd, dst=dst)
        levels = quant_np(coef, qp, bd, intra=True)
        if ps.sign_hiding and np.any(levels):
            from ..ops.quantize import sign_hide_np
            from ..cabac.syntax import scan_order, scan_for_intra
            scan_idx = (scan_for_intra(log2_size, 0 if is_luma else 1, mode))
            rank = np.zeros((4, 4), np.int32)
            sc = scan_order(4, scan_idx)
            for i, (x, y) in enumerate(sc):
                rank[y, x] = i
            levels = sign_hide_np(levels, rank)
        if np.any(levels):
            coeff_pl[y0:y0 + n, x0:x0 + n] = levels
            dq = dequant_np(levels, qp, bd)
            r = inverse_transform_np(dq, bd, dst=dst)
            rec = np.clip(pred + r, 0, (1 << bd) - 1)
        else:
            rec = pred
        rec_pl[y0:y0 + n, x0:x0 + n] = rec.astype(rec_pl.dtype)

    # -- top level -----------------------------------------------------------

    def encode_frame(self, planes):
        """planes: (Y, Cb, Cr) uint8/uint16 source arrays.

        Immediate-output path (bframes == 0 only; with B frames the
        encode order differs from display order — use push_frame/flush).
        Returns (annexb_bytes, recon_planes_cropped).
        """
        if self.bframes:
            raise ValueError(
                "bframes > 0 reorders output; use push_frame()/flush()")
        # zero-latency contract: drop the lookahead window (x265 tune
        # zerolatency semantics — rc-lookahead 0 / no cutree) and drain
        # the frame pipeline synchronously
        assert self.lookahead is None, \
            "encode_frame() after push_frame() with an active lookahead"
        self._use_lookahead = False
        out = self.push_frame(planes) + self._drain(0)
        assert len(out) == 1
        return out[0].au, out[0].recon

    def push_frame(self, planes) -> list:
        """Feed one display-order frame; returns the EncodedFrame list
        produced by this push (possibly empty, possibly a whole mini-GOP
        in ENCODE order).  Mirrors x265_encoder_encode's delayed-output
        contract (x265.h:1334; lookahead queue slicetype.cpp:649)."""
        if self._use_lookahead:
            if self.lookahead is None:
                from .lookahead import Lookahead
                self.lookahead = Lookahead(self.params, self.bit_depth)
            from .aq import aq_offsets
            cw, ch = self.sps.pic_width, self.sps.pic_height
            y = np.asarray(planes[0])
            coded = (y, np.asarray(planes[1]), np.asarray(planes[2]))
            off = aq_offsets(coded, self.params.aq_mode,
                             self.params.aq_strength, self.bit_depth,
                             normalize=self.params.rc_mode == 0)
            for la_out in self.lookahead.push(planes, off):
                self._la_frame = la_out[1:]
                self._gop_input(la_out[0])
        else:
            self._gop_input(planes)
        depth = 0 if self.force_host_recon else self.pipeline_depth
        return self._drain(depth)

    def flush(self) -> list:
        """Encode any queued frames (end of stream)."""
        if self.lookahead is not None:
            for la_out in self.lookahead.flush():
                self._la_frame = la_out[1:]
                self._gop_input(la_out[0])
        self._emit_minigop()
        return self._drain(0)

    def _drain(self, depth: int) -> list:
        """Finish in-flight frames down to ``depth`` (encode order)."""
        out = []
        while len(self._inflight) > depth:
            out.append(self._finish_one(self._inflight.pop(0)))
        return out

    def _gop_input(self, planes) -> None:
        """GOP structuring of one display-order frame (post-lookahead).
        Dispatches device work; finished frames are drained by the
        caller."""
        p = self.params
        keyint = max(1, p.keyint_max)
        la = self._la_frame
        self._la_frame = None
        # lookahead scenecut (x265 slicetype.cpp:1437 analogue): the
        # lowres cost ratio decides BEFORE dispatch, so the pipeline
        # never needs a mid-stream re-encode
        min_keyint = self._min_keyint()
        la_scenecut = (la is not None and len(la) > 2 and la[2]
                       and p.scenecut_threshold > 0
                       and (self._display_idx - self._cvs_base)
                       >= min_keyint)
        gop_start = ((self._display_idx - self._cvs_base) % keyint == 0
                     or self.prev_anchor_poc is None
                     or self.force_all_intra
                     or la_scenecut)
        if la is not None and len(la) > 3 and (self.bframes == 0
                                               or gop_start):
            self._anchor_low = la[3]
        if self.bframes == 0:
            poc = 0 if gop_start else self._next_poc
            kind = "I" if gop_start else "P"
            pend = self._dispatch_one(planes, poc, kind,
                                      l0_poc=self.prev_anchor_poc, la=la,
                                      didx=self._display_idx)
            if gop_start:
                self._cvs_base = self._display_idx
            self._after_anchor(pend, idr=pend.kind == "I")
            pend.display_idx = self._display_idx
            self._inflight.append(pend)
            self._display_idx += 1
            return
        if gop_start:
            self._emit_minigop()            # pending frames end their GOP
            self._cvs_base = self._display_idx  # before encode: display_idx
            pend = self._dispatch_one(planes, 0, "I", la=la)
            self._next_poc = 1
            self._after_anchor(pend, idr=True)
            pend.display_idx = self._cvs_base + pend.poc
            self._inflight.append(pend)
        else:
            self._queue.append((self._next_poc, planes, la))
            self._next_poc += 1
            if len(self._queue) == self.bframes + 1:
                if self.params.b_adapt > 0:
                    self._emit_minigop(count=self._slicetype_decide())
                else:
                    self._emit_minigop()
        self._display_idx += 1

    def _after_anchor(self, pf: _Pending, idr: bool = False) -> None:
        """DPB management after an anchor (I/P) DISPATCH: anchors are the
        only reference pictures (Bs are non-referenced, TRAIL_N).  The
        last ``num_ref`` anchors are retained as the L0 reference list
        (x265 dpb.cpp:261 applyReferencePictureSet / --ref), nearest
        first.  The device-resident extended recon (pf.ext) is already
        queued, so dependent frames can dispatch immediately; the host
        recon lands in self.dpb when the frame finishes."""
        if idr:
            self.dpb.clear()
            self.dpb_dev.clear()
            self._ref_pocs = []
            self._next_poc = 1
        else:
            # b-adapt emits PARTIAL queues: display-order POCs beyond
            # this anchor may already be assigned to still-queued frames,
            # so never move _next_poc backwards
            self._next_poc = max(self._next_poc, pf.poc + 1)
        # retained references: the new anchor + the previous num_ref-1
        # (Bs additionally need the previous anchor even at --ref 1)
        keep = max(self.num_ref, 2 if self.bframes else 1)
        self._ref_pocs = [pf.poc] + [p for p in self._ref_pocs
                                     if p != pf.poc][:keep - 1]
        dpb = {pf.poc: pf}
        dpb_dev = {pf.poc: pf.ext} if pf.ext is not None else {}
        for p in self._ref_pocs[1:]:
            if p in self.dpb:
                dpb[p] = self.dpb[p]
            if p in self.dpb_dev:
                dpb_dev[p] = self.dpb_dev[p]
        self.dpb, self.dpb_dev = dpb, dpb_dev
        self.prev_anchor_poc = pf.poc

    def _emit_minigop(self, count=None) -> None:
        """Dispatch the queued mini-GOP: last frame as the P anchor first,
        then the Bs against their reference pair.

        With --b-pyramid (default, >= 2 Bs) the middle B is coded first
        against (prev anchor, new anchor) and becomes a REFERENCE
        (TRAIL_R; x265 slicetype.cpp B-pyramid ref selection); the outer
        Bs predict from the half-distance pairs (prev, mid) / (mid,
        anchor).  Without it all Bs are TRAIL_N against the anchors."""
        if not self._queue:
            return
        if count is None:
            frames, self._queue = self._queue, []
        else:
            frames = self._queue[:count]
            self._queue = self._queue[count:]
        anchor_poc, anchor_planes, anchor_la = frames[-1]
        if anchor_la is not None and len(anchor_la) > 3:
            self._anchor_low = anchor_la[3]
        l0 = self.prev_anchor_poc
        base = self._cvs_base
        pend = self._dispatch_one(anchor_planes, anchor_poc,
                                  "P" if l0 is not None else "I", l0_poc=l0,
                                  la=anchor_la, didx=base + anchor_poc)
        pend.display_idx = base + anchor_poc
        self._inflight.append(pend)
        self._after_anchor(pend)        # retains prev anchor for the Bs
        bs = frames[:-1]
        pyramid = (self.b_pyramid and len(bs) >= 2
                   and not self.force_host_recon)
        if pyramid:
            mid_i = len(bs) // 2
            mpoc, mplanes, mla = bs[mid_i]
            mp = self._dispatch_one(mplanes, mpoc, "B", l0_poc=l0,
                                    l1_poc=anchor_poc, la=mla,
                                    ref_b=True, didx=base + mpoc)
            mp.display_idx = base + mpoc
            self._inflight.append(mp)
            self.dpb[mpoc] = mp
            if mp.ext is not None:
                self.dpb_dev[mpoc] = mp.ext
            for group, g_l0, g_l1 in (
                    (bs[:mid_i], l0, mpoc),
                    (bs[mid_i + 1:], mpoc, anchor_poc)):
                self._dispatch_b_group(group, g_l0, g_l1, base,
                                       keep_extra=(mpoc,))
            return
        self._dispatch_b_group(bs, l0, anchor_poc, base)

    def _dispatch_b_group(self, bs, l0, l1, base, keep_extra=()):
        """Dispatch a set of mutually independent TRAIL_N Bs sharing one
        (l0, l1) reference pair — batched when >= 2."""
        if not bs:
            return
        if len(bs) >= 2 and not self.force_host_recon:
            pends = []
            for poc, planes, la in bs:
                bp = self._dispatch_one(planes, poc, "B", l0_poc=l0,
                                        l1_poc=l1, la=la, defer_b=True,
                                        didx=base + poc)
                bp.display_idx = base + poc
                bp.ps.rps_keep = tuple(set(bp.ps.rps_keep)
                                       | set(keep_extra))
                pends.append(bp)
            self._dispatch_b_batch(pends, l0, l1)
            self._inflight.extend(pends)
        else:
            for poc, planes, la in bs:
                bp = self._dispatch_one(planes, poc, "B", l0_poc=l0,
                                        l1_poc=l1, la=la,
                                        didx=base + poc)
                bp.display_idx = base + poc
                bp.ps.rps_keep = tuple(set(bp.ps.rps_keep)
                                       | set(keep_extra))
                self._inflight.append(bp)

    def _slicetype_decide(self) -> int:
        """Adaptive B placement (x265 --b-adapt): trellis over the
        queued display-order window.  Re-casts slicetypePath
        (x265_1.9/source/encoder/slicetype.cpp:1565) + slicetypeAnalyse
        (:1193): every candidate segmentation of the window is scored as
        its anchor's lowres P cost plus each B's
        min(intra, list0, list1, bidir-average) cost, and the cheapest
        path picks the first mini-GOP's length.  b-adapt 1 and 2 share
        the trellis here: the per-pair costs are single batched lowres
        device programs, so the full path search is already cheap (the
        fast/trellis split exists in x265 because each estimate costs a
        threaded HEX search).  Returns the queue prefix length to emit
        (#Bs + 1 anchor)."""
        la = self.lookahead
        q = self._queue
        m = len(q)
        lows = [e[2][3] if (e[2] is not None and len(e[2]) > 3
                            and e[2][3] is not None
                            and e[2][3].intra_cost is not None) else None
                for e in q]
        if la is None or self._anchor_low is None                 or self._anchor_low.intra_cost is None                 or any(lo is None for lo in lows):
            return m
        # id()-keyed cache entries from dead frames must not alias new
        # objects; all frames of THIS decision are alive, so a fresh
        # cache per decision is both safe and sufficient (every pair is
        # shared across many candidate paths within one trellis)
        la._pair_cache.clear()
        anchors = [self._anchor_low] + lows
        inf = float("inf")
        best = [inf] * (m + 1)
        best[m] = 0.0
        choice = [m - 1] * (m + 1)
        for i in range(m - 1, -1, -1):
            a = anchors[i]
            for k in range(i, min(i + self.bframes, m - 1) + 1):
                c = la.p_cost(lows[k], a) + best[k + 1]
                # B reference pairs mirror the actual dispatch shape:
                # with b-pyramid and >= 2 Bs the middle B refs
                # (a, anchor) and the outer Bs the half-distance pairs
                # (slicetypePathCost's bBPyramid branch,
                # slicetype.cpp:1617)
                nb = k - i
                if self.b_pyramid and nb >= 2:
                    mid = i + nb // 2
                    pairs = [(j, a, lows[mid]) if j < mid
                             else (j, lows[mid], lows[k])
                             for j in range(i, k) if j != mid]
                    pairs.append((mid, a, lows[k]))
                else:
                    pairs = [(j, a, lows[k]) for j in range(i, k)]
                for j, r0, r1 in pairs:
                    if c >= best[i]:
                        break
                    c += la.bidir_cost(lows[j], r0, r1)
                if c < best[i]:
                    best[i] = c
                    choice[i] = k
        return choice[0] + 1

    def _qp_override(self, didx):
        """--qpfile / --zones QP override for display index ``didx``."""
        if didx is None:
            return None
        q = self._qpfile_map.get(didx)
        if q is not None:
            return min(51, max(0, q))
        for (s, e, qv, fac) in self._zones:
            if s <= didx <= e:
                if qv is not None:
                    return min(51, max(0, qv))
                if fac:
                    return min(51, max(0, round(
                        self.qp - 6.0 * np.log2(fac))))
        return None

    def _dispatch_one(self, planes, poc: int, kind: str,
                      l0_poc=None, l1_poc=None, la=None, cplx=None,
                      defer_b: bool = False, defer_all: bool = False,
                      ref_b: bool = False, didx=None):
        """Dispatch one picture's device work (async) and return the
        _Pending handle.  Does NOT advance GOP state (push_frame owns the
        ordering); the host finish (fetch + entropy) runs later in
        _finish_one, overlapping subsequent frames' device work."""
        g = self.geom
        p = self.params
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        orig = (pad_plane(np.asarray(planes[0]), ph, pw),
                pad_plane(np.asarray(planes[1]), ph // 2, pw // 2),
                pad_plane(np.asarray(planes[2]), ph // 2, pw // 2))

        if kind != "I" and (self.force_all_intra or l0_poc is None):
            kind = "I"
            poc = 0
        is_p = kind == "P"
        is_b = kind == "B"
        # frame complexity for rate control: lowres lookahead cost when
        # the window is active (x265 m_currentSatd), else the inline
        # half-res estimate
        if cplx is None:
            if la is not None and la[1]:
                cplx = float(la[1])
            else:
                cplx = self._complexity_estimate(orig, kind != "I")
        self._la_off16 = la[0] if la is not None else None
        self.qp = self.rc.frame_qp(is_intra=kind == "I", satd=cplx,
                                   is_b=is_b, is_ref_b=ref_b)
        ov = self._qp_override(didx)
        if ov is not None:
            self.qp = int(ov)

        cu_size = min(16, 1 << g.log2_ctb)
        cu_log2 = cu_size.bit_length() - 1
        cu_depth = g.log2_ctb - cu_log2

        ps = PicSyntax(
            g, max_tr_depth_intra=self.sps.max_transform_hierarchy_depth_intra,
            max_tr_depth_inter=self.sps.max_transform_hierarchy_depth_inter,
            sign_hiding=bool(self.pps.sign_data_hiding),
            slice_qp=self.qp, cu_qp_delta_enabled=self.aq)
        ps.depth[:] = cu_depth
        ps.pred_mode[:] = MODE_INTRA
        ps.tu_depth[:] = 0
        s4 = cu_size // 4

        # quantizer parameters include QpBdOffset = 6*(bd-8) (§8.6.1 Qp');
        # the slice header still carries the base 0..51 QP
        bd_off = 6 * (self.bit_depth - 8)
        qp_y = self.qp + bd_off
        qp_cb = chroma_qp(self.qp, self.pps.cb_qp_offset) + bd_off
        qp_cr = chroma_qp(self.qp, self.pps.cr_qp_offset) + bd_off
        self._qp_plan(orig)

        # slice-level reference info for the NORMATIVE MV derivations.
        # P slices use the full retained-anchor list (--ref); B slices
        # stay at one ref per list (prev anchor / next anchor).
        ps.cur_poc = poc
        if is_p and l0_poc is not None:
            active = [q for q in self._ref_pocs if q < poc]
            if l0_poc not in active:
                active = [l0_poc] + active
            ps.ref_pocs_l0 = tuple(active[:self.num_ref])
        else:
            ps.ref_pocs_l0 = (l0_poc,) if l0_poc is not None else ()
        ps.ref_pocs_l1 = (l1_poc,) if l1_poc is not None else ()
        # RPS retention snapshot: every picture the DPB must keep past
        # this frame (future frames' references — §8.3.2; x265
        # dpb.cpp:186 computeRPS).  For Bs this includes the already-
        # dispatched next anchor (s1) and older anchors future Ps use.
        ps.rps_keep = tuple(self._ref_pocs)

        pend = _Pending(poc=poc, kind=kind, qp=self.qp, ps=ps,
                        display_idx=0, planes=planes, orig=orig,
                        l0_poc=l0_poc, l1_poc=l1_poc, cu_size=cu_size)
        if p.weightp and kind != "B":
            # anchors may serve as the next P's L0 reference; record the
            # UNPADDED source luma (padding columns distort the moments
            # and the least-squares fit — the round-3 misfire trigger)
            self._wp_src[poc] = np.asarray(planes[0])
            while len(self._wp_src) > 4:
                self._wp_src.pop(next(iter(self._wp_src)))
        ref_src = self._wp_src.get(l0_poc) if is_p and p.weightp else None
        if ref_src is not None and ref_src.shape == np.asarray(
                planes[0]).shape:
            from .weights import analyse_luma_weight
            pend.wp = analyse_luma_weight(np.asarray(planes[0]), ref_src,
                                          self.bit_depth)
        ps.wp_entry = pend.wp      # slice-header pred_weight_table source
        if p.lossless:
            pend.rec = self._encode_lossless(ps, orig)
            return pend
        # the CTU scan handles partial CTBs natively (coded size is always
        # 16-aligned); the host fallback remains for tests/oracle runs
        use_pipeline = not self.force_host_recon
        if defer_all and not self.force_host_recon:
            # external batch/sharded dispatcher (parallel/gop.py or the
            # B mini-GOP batcher) stacks the device inputs itself
            pend.qp_arrays = self._qp_arrays
            pend.filter_qps = self._filter_qps()
        elif is_b:
            assert use_pipeline, "B frames require the device pipeline"
            pend.is_ref_b = ref_b
            ps.b_is_ref = ref_b
            if defer_b:
                # batched mini-GOP dispatch: stash the per-frame device
                # inputs; _dispatch_b_batch stacks them
                pend.qp_arrays = self._qp_arrays
                pend.filter_qps = self._filter_qps()
            elif ref_b:
                pend.out_dev, pend.ext = self._dispatch_b_ref(
                    orig, l0_poc, l1_poc)
            else:
                pend.out_dev = self._dispatch_b(orig, l0_poc, l1_poc)
        elif is_p:
            assert use_pipeline, "P frames require the device pipeline"
            pend.out_dev, pend.ext = self._dispatch_p(
                orig, ps.ref_pocs_l0, pend.wp)
            pend.allow_scenecut = bool(p.scenecut_threshold
                                       and self.bframes == 0
                                       and not self._use_lookahead)
        elif use_pipeline:
            pend.out_dev, pend.ext = self._dispatch_i(orig)
        else:
            rec = (np.zeros((ph, pw), np.int16),
                   np.zeros((ph // 2, pw // 2), np.int16),
                   np.zeros((ph // 2, pw // 2), np.int16))
            cu_size, modes, _c = self._decide_modes(orig)
            ps.luma_mode[:] = np.kron(modes, np.ones((s4, s4), np.uint8))
            ps.chroma_mode[:] = ps.luma_mode
            self._recon_host_fallback(ps, orig, rec, modes, cu_size,
                                      (qp_y, qp_cb, qp_cr))
            pend.rec = rec
        return pend

    def _finish_one(self, pend: _Pending) -> EncodedFrame:
        """Host finish of a dispatched frame: fetch device outputs,
        scatter syntax, derive inter syntax, entropy-code, hash, package
        the access unit, and feed rate-control."""
        g = self.geom
        p = self.params
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        self.qp = pend.qp
        ps = pend.ps
        kind = pend.kind
        is_p = kind == "P"
        is_b = kind == "B"
        poc = pend.poc
        keyint = max(1, p.keyint_max)

        checksums = None
        if pend.out_dev is not None:
            if is_b:
                o = self._finish_b(pend)
            elif is_p:
                o = self._finish_p(pend)
                cost_p, cost_i = self.last_frame_costs
                min_keyint = self._min_keyint()
                if (pend.allow_scenecut and not self._inflight
                        and cost_p > 0.85 * cost_i
                        and poc % keyint >= min_keyint):
                    # scene change: most CUs went intra — restart the GOP
                    # with an IDR (x265 scenecut analogue).  Only legal in
                    # sync mode: no later frame was dispatched against
                    # this P's recon.  satd=0: the complexity blur was
                    # already fed this frame.
                    redo = self._dispatch_one(pend.planes, 0, "I",
                                              cplx=0.0)
                    redo.display_idx = pend.display_idx
                    self._cvs_base = pend.display_idx
                    self._after_anchor(redo, idr=True)
                    return self._finish_one(redo)
            else:
                o = self._finish_i(pend)
            checksums = o["checksums"]
            tails = pend.out_dev[1]
            # recon stays DEVICE-resident (np.asarray-able on demand);
            # the host never fetches pixels unless it needs them (MD5/CRC
            # hash, --recon, tests)
            k = pend.batch_idx
            coded_rec = tails["rec_coded"]
            rec_crop = tails["rec_conf"]
            if k is not None:
                coded_rec = tuple(pl[k] for pl in coded_rec)
                rec_crop = tuple(pl[k] for pl in rec_crop)
        else:
            rec = pend.rec
            # in-loop filters run on the coded-size picture; intra
            # prediction above used the unfiltered planes, so filter a
            # copy (§8.4.4.2.1).  The device pipelines apply deblock +
            # SAO on device.
            cw, ch_ = self.sps.pic_width, self.sps.pic_height
            rec = (rec[0][:ch_, :cw], rec[1][:ch_ // 2, :cw // 2],
                   rec[2][:ch_ // 2, :cw // 2])
            orig = pend.orig
            if p.deblock:
                # deblocking beta/tc derivation indexes by the BASE QpY (no
                # QpBdOffset — the tables are clipped to 0..51, §8.7.2.5.3)
                rec = deblock_intra_picture_np(
                    ps, rec, self.qp, self.bit_depth,
                    p.deblock_beta_offset, p.deblock_tc_offset,
                    self.pps.cb_qp_offset, self.pps.cr_qp_offset)
            if self.sps.sao_enabled:
                orig_coded = (orig[0][:ch_, :cw],
                              orig[1][:ch_ // 2, :cw // 2],
                              orig[2][:ch_ // 2, :cw // 2])
                rec = self._sao_decide_apply(ps, orig_coded, rec)
            coded_rec = tuple(pl.astype(np.int16) for pl in rec)
            cl, cr, ct, cb = self.sps.conf_win
            wl = self.sps.pic_width - 2 * (cl + cr)
            hl = self.sps.pic_height - 2 * (ct + cb)
            rec_crop = (rec[0][2 * ct:2 * ct + hl, 2 * cl:2 * cl + wl],
                        rec[1][ct:ct + hl // 2, cl:cl + wl // 2],
                        rec[2][ct:ct + hl // 2, cl:cl + wl // 2])

        st = (SLICE_B if is_b else SLICE_P if is_p else SLICE_I)
        au = self._entropy_encode(ps, st, poc, pend.l0_poc, pend.l1_poc)
        if self.dpb.get(poc) is pend:
            self.dpb[poc] = coded_rec   # host DPB mirror (fallback path)

        if p.decoded_picture_hash:
            # hash covers the full decoded picture (coded size, pre-crop)
            from ..common.params import HASH_CHECKSUM
            if (p.decoded_picture_hash == HASH_CHECKSUM
                    and checksums is not None):
                # checksum computed ON DEVICE (D.3.19 position-masked
                # byte sum) — no recon pixel fetch needed
                payload = bytes([2]) + b"".join(
                    int(c).to_bytes(4, "big") for c in checksums)
            else:
                dt = np.uint8 if self.bit_depth == 8 else np.uint16
                payload = picture_hash_payload(
                    [np.asarray(pl).astype(dt) for pl in coded_rec],
                    self.bit_depth,
                    hash_type=p.decoded_picture_hash - 1)
            sei = write_sei_rbsp([(SEI_DECODED_PICTURE_HASH, payload)])
            au += wrap_nal(NAL_SUFFIX_SEI, sei, long_start_code=False)

        if self.hrd:
            # prefix SEI NAL: buffering-period on IRAP AUs + pic-timing
            # on every AU (frameencoder.cpp:436-496)
            from ..common.sei import (SEI_BUFFERING_PERIOD, SEI_PIC_TIMING,
                                      buffering_period_payload,
                                      pic_timing_payload)
            sps = self.sps
            order = self.frames_encoded
            msgs = []
            if kind == "I":
                # hrdFullness (ratecontrol.cpp:1839): 90kHz delay from
                # the CPB fill the rate control is tracking
                fill = int(self.rc.buffer_fill)
                dly = (90000 * fill + self._hrd_bitrate_unscale)                     // self._hrd_bitrate_unscale
                off = (90000 * self._hrd_cpb_unscale
                       + self._hrd_bitrate_unscale)                     // self._hrd_bitrate_unscale - dly
                msgs.append((SEI_BUFFERING_PERIOD,
                             buffering_period_payload(sps, dly, off)))
                self._last_bp_order = order
                self._cvs_finish_base = order
            rem = min(max(1, order - self._last_bp_order),
                      1 << sps.hrd_cpb_removal_len)
            out_delay = max(0, sps.num_reorder_pics + poc
                            - (order - self._cvs_finish_base))
            msgs.append((SEI_PIC_TIMING,
                         pic_timing_payload(sps, rem, out_delay)))
            au = wrap_nal(NAL_PREFIX_SEI, write_sei_rbsp(msgs),
                          long_start_code=False) + au

        if p.repeat_headers and kind == "I" and self.frames_encoded > 0:
            # emit VPS/SPS/PPS before every non-first IDR (join-in-progress
            # decoding, x265 --repeat-headers); gated on a stream-global
            # counter so scenecut IDRs (which reset poc) get headers too
            au = self.headers() + au
        if p.aud:
            # access unit delimiter (§7.3.2.5): pic_type 0=I, 1=I/P, 2=I/P/B.
            # First NAL of the AU -> zero_byte (long start code, B.2.2);
            # parameter sets follow the AUD (§7.4.2.4.4 NAL order).
            from ..common.bitstream import NAL_AUD, BitWriter
            bw = BitWriter()
            bw.write(2 if is_b else 1 if is_p else 0, 3)
            bw.rbsp_trailing_bits()
            au = wrap_nal(NAL_AUD, bw.getvalue(),
                          long_start_code=True) + au
        self.rc.update(len(au) * 8, self.qp, is_intra=kind == "I")
        self.frames_encoded += 1
        self.last_slice_type_str = "B" if is_b else "P" if is_p else "I"
        self.last_ps = ps      # exposed for tests / debugging
        self._perf["frames"] += 1
        self._perf["bytes"] += len(au)
        self._perf["qp_sum"] += self.qp
        self._perf["by_type"][self.last_slice_type_str] += 1
        return EncodedFrame(
            poc=poc, display_idx=pend.display_idx, au=au,
            recon=rec_crop, coded=coded_rec, kind=self.last_slice_type_str,
            qp=self.qp, coded_dev=pend.ext, stats=_frame_cu_stats(ps))

    # -- fused device pipelines ----------------------------------------------

    def _get_wavefronts(self, cu_size):
        """The three per-plane WavefrontIntraRecon objects (cached)."""
        from .wavefront import WavefrontIntraRecon

        g = self.geom
        jobs = (("y", cu_size, True, 0), ("cb", cu_size // 2, False, 1),
                ("cr", cu_size // 2, False, 1))
        out = []
        for key, bn, is_luma, cs in jobs:
            wf = self._wf.get((key, bn))
            if wf is None:
                wf = WavefrontIntraRecon(
                    g.width, g.height, g.log2_ctb, bn, is_luma=is_luma,
                    chroma_shift=cs, bit_depth=self.bit_depth,
                    sign_hide=bool(self.pps.sign_data_hiding))
                self._wf[(key, bn)] = wf
            out.append(wf)
        return out

    def _get_ctu_scan(self):
        """The CTU-level wavefront scan (cached; encoder/ctu_scan.py)."""
        if self._ctu_scan is None:
            from .ctu_scan import CtuScan
            self._ctu_scan = CtuScan(
                self.geom, bit_depth=self.bit_depth,
                sign_hide=bool(self.pps.sign_data_hiding),
                strong_intra_smoothing=bool(
                    self.sps.strong_intra_smoothing),
                rdoq=self.params.rdoq_level > 0,
                noise_reduction=self._nr_enabled,
                psy_rd=self.params.psy_rd,
                psy_rdoq=self.params.psy_rdoq)
        return self._ctu_scan

    def _nr_update(self, o):
        """Noise-reduction running-average update from the frame's
        fetched |DCT coef| sums (frameencoder.cpp:1331
        noiseReductionUpdate, incl. the halving cap and the
        don't-denoise-DC rule)."""
        p = self.params
        max_blocks = {4: 1 << 18, 8: 1 << 16, 16: 1 << 14, 32: 1 << 12}
        for cat, (nn, size) in self._nr_sizes.items():
            key = "nr_" + cat
            if key not in o:
                continue
            v = np.asarray(o[key]).astype(np.int64)
            si, ci = v[:nn], int(v[nn])
            sp, cp = v[nn + 1:2 * nn + 1], int(v[2 * nn + 1])
            for sfx, s_, c_ in (("_i", si, ci), ("_p", sp, cp)):
                st = self._nr_state[cat + sfx]
                st[0] += s_
                st[1] += c_
                if st[1] > max_blocks[size]:
                    st[0] >>= 1
                    st[1] >>= 1
                strength = (p.noise_reduction_intra if sfx == "_i"
                            else p.noise_reduction_inter)
                num = strength * st[1] + st[0] // 2
                off = (num // (st[0] + 1)).astype(np.int32)
                off[0] = 0               # never denoise DC
                self._nr_offsets[cat + sfx] = off

    def summary(self) -> str:
        """Encode summary (x265 printSummary, encoder.cpp:943): frame
        counts by type, average QP, bitrate and wall-clock fps, plus the
        stage accounting the TPU pipeline cares about (link-fetch wait
        vs host entropy)."""
        p = self._perf
        el = max(1e-9, self._clock() - self._t0)
        n = max(1, p["frames"])
        fps = self.params.fps_num / max(1, self.params.fps_denom)
        kbps = p["bytes"] * 8.0 * fps / n / 1000.0
        bt = p["by_type"]
        return (f"encoded {p['frames']} frames "
                f"(I {bt['I']} P {bt['P']} B {bt['B']}) in {el:.2f}s "
                f"({p['frames'] / el:.2f} fps), {kbps:.2f} kb/s, "
                f"Avg QP: {p['qp_sum'] / n:.2f} | stage wait: "
                f"fetch {p['fetch_wait']:.2f}s entropy "
                f"{p['entropy']:.2f}s")

    def _fetch_outputs(self, pend):
        """Fetch the small output dict (one transfer) and reconstruct the
        coefficient planes from the compacted nonzero-subblock form.
        Tiered overflow fallback: compact int8 -> full int8 luma plane ->
        int16 planes (|level| > 127, very low QP)."""
        import jax
        _t0 = self._clock()
        small, tails = pend.out_dev
        k = pend.batch_idx
        if isinstance(small, _BatchFetch):
            f = small.fetch()
            o = f if k is None else {key: v[k] for key, v in f.items()}
        else:
            o = fetch_packed(small)
        g = self.geom
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        if int(o["ovf"]):
            t16 = (tails["cy16"], tails["ccb16"], tails["ccr16"])
            if k is not None:
                t16 = tuple(a[k] for a in t16)
            cy, ccb, ccr = (np.asarray(a) for a in jax.device_get(t16))
        else:
            count = int(o["y_count"])
            if count <= o["y_buf"].shape[0]:
                blocks = np.zeros((ph // 8, pw // 8, 8, 8), np.int8)
                mask = o["y_nzmask"].reshape(ph // 8, pw // 8)
                blocks[mask] = o["y_buf"][:count]
                cy = blocks.transpose(0, 2, 1, 3).reshape(ph, pw)
            else:
                t8 = tails["cy8"] if k is None else tails["cy8"][k]
                cy = np.asarray(jax.device_get(t8))
            c_count = int(o["c_count"])
            if c_count <= o["c_buf"].shape[0]:
                cph, cpw = ph // 2, pw // 2
                nbc = (cph // 8) * (cpw // 8)
                blocks2 = np.zeros((2 * nbc, 8, 8), np.int8)
                blocks2[o["c_nzmask"]] = o["c_buf"][:c_count]

                def to_plane_c(bl):
                    return bl.reshape(cph // 8, cpw // 8, 8, 8).transpose(
                        0, 2, 1, 3).reshape(cph, cpw)

                ccb = to_plane_c(blocks2[:nbc])
                ccr = to_plane_c(blocks2[nbc:])
            else:
                tc = (tails["ccb8"], tails["ccr8"])
                if k is not None:
                    tc = tuple(a[k] for a in tc)
                ccb, ccr = (np.asarray(a) for a in jax.device_get(tc))
        self._perf["fetch_wait"] += self._clock() - _t0
        if self._nr_enabled:
            self._nr_update(o)
        return o, (cy, ccb, ccr)

    def _scatter_syntax(self, ps, o, coeffs):
        """Fetched device outputs -> PicSyntax coefficient planes, per-CTB
        QPs and SAO syntax."""
        cy, ccb, ccr = coeffs
        ps.coeff_y[:] = cy.astype(np.int32)
        ps.coeff_cb[:] = ccb.astype(np.int32)
        ps.coeff_cr[:] = ccr.astype(np.int32)
        ps.qp_ctb[:] = o["qp_actual"].astype(np.int32)
        if self.sps.sao_enabled:
            ps.sao_type[:] = o["sao_type"].astype(np.int8)
            ps.sao_eo_class[:] = o["sao_class"].astype(np.int8)
            ps.sao_band_pos[:] = o["sao_bpos"].astype(np.int8)
            ps.sao_offsets[:] = o["sao_offs"].astype(np.int8)

    def _apply_inter_merge(self, ps, o):
        """Apply the device-computed inter CU merge masks (the twin of
        the former host loop): aligned quads of inter blocks with
        identical motion become one 32/64 CU.  Quads whose in-scan RD
        chose the TU32 configuration (o["use32"] & merge mask) code
        TU == CU (x265 inter TU behavior); the rest keep 16x16 TUs."""
        g = self.geom
        m32 = np.asarray(o["m32"]) if o.get("m32") is not None else None
        m64 = np.asarray(o["m64"]) if o.get("m64") is not None else None
        tu32 = None
        if m32 is not None and o.get("use32") is not None:
            u = np.asarray(o["use32"]).reshape(m32.shape)
            m64r = (np.repeat(np.repeat(
                m64, m32.shape[0] // m64.shape[0], 0),
                m32.shape[1] // m64.shape[1], 1)
                if m64 is not None else np.zeros(m32.shape, bool))
            tu32 = u & (m32 | m64r)
        if m32 is not None and m32.any():
            u8 = np.kron(m32, np.ones((8, 8), bool))
            ps.depth[u8] = g.log2_ctb - 5
            ps.tu_depth[u8] = 1
        if m64 is not None and m64.any():
            u16 = np.kron(m64, np.ones((16, 16), bool))
            ps.depth[u16] = g.log2_ctb - 6
            ps.tu_depth[u16] = 2
        if tu32 is not None and tu32.any():
            t8 = np.kron(tu32, np.ones((8, 8), bool))
            ps.tu_depth[t8] -= 1

    def _apply_cu32(self, ps, use32, mode32):
        """Set the PicSyntax CU structure for chosen 32x32 intra CUs.

        use32/mode32: [gh32, gw32] over the padded plane.  The quadrant
        becomes one depth-(log2_ctb-5) intra CU with a 32x32 luma TU
        (tu_depth stays 0); luma/chroma mode is the 32-mode (DM chroma).
        """
        if use32 is None or not use32.any():
            return
        g = self.geom
        d32 = g.log2_ctb - 5
        u8 = np.kron(use32, np.ones((8, 8), bool))        # 4x4-unit mask
        m8 = np.kron(mode32.astype(np.uint8), np.ones((8, 8), np.uint8))
        ps.depth[u8] = d32
        ps.luma_mode[u8] = m8[u8]
        ps.chroma_mode[u8] = m8[u8]
        ps.tu_depth[u8] = 0
        ps.part[u8] = 0

    def _filter_qps(self):
        """(qp_base, deblock chroma QPs, SAO lambda) device inputs."""
        dq_cb = chroma_qp(self.qp, self.pps.cb_qp_offset)
        dq_cr = chroma_qp(self.qp, self.pps.cr_qp_offset)
        sao_lam = 0.72 * 2.0 ** ((self.qp - 12) / 3.0)
        return (np.int32(self.qp), np.int32(dq_cb), np.int32(dq_cr),
                np.float32(sao_lam))

    def _qp_plan(self, orig):
        """Per-CTB desired QPs + lambdas for this frame: frame QP plus AQ
        offsets (encoder/aq.py; x265 calcAdaptiveQuantFrame ->
        calculateQpforCuSize averaging).  Device pipelines quantize with
        these; the signaled per-CTB QP (ps.qp_ctb) is the device-computed
        ACTUAL chain (uncoded CTBs keep the predicted QP)."""
        g = self.geom
        p = self.params
        bd_off = 6 * (self.bit_depth - 8)
        if self.aq:
            from .aq import aq_offsets, per_ctb_qp
            off16 = getattr(self, "_la_off16", None)
            if off16 is None:
                cw, ch = self.sps.pic_width, self.sps.pic_height
                coded = (orig[0][:ch, :cw], orig[1][:ch // 2, :cw // 2],
                         orig[2][:ch // 2, :cw // 2])
                off16 = aq_offsets(coded, p.aq_mode, p.aq_strength,
                                   self.bit_depth,
                                   normalize=p.rc_mode == 0)
            qp_ctb = per_ctb_qp(np.asarray(off16), self.qp, g)
        else:
            qp_ctb = np.full((g.n_ctbs,), self.qp, np.int32)
        from ..ops.deblock import _chroma_qp_arr
        lam = 2.0 ** (qp_ctb / 6.0 - 2.0)
        self._qp_arrays = (
            (qp_ctb + bd_off).astype(np.int32),
            (_chroma_qp_arr(qp_ctb, self.pps.cb_qp_offset)
             + bd_off).astype(np.int32),
            (_chroma_qp_arr(qp_ctb, self.pps.cr_qp_offset)
             + bd_off).astype(np.int32),
            (0.85 * lam * lam).astype(np.float32),
            qp_ctb.astype(np.int32))

    def _dispatch_i(self, orig):
        from .device_pipeline import build_i_pipeline

        if self._i_pipeline is None:
            self._i_pipeline = build_i_pipeline(self)
        qpy, qpb, qpr, lam, qp_ctb = self._qp_arrays
        small, tails, ext = self._i_pipeline(
            orig[0], orig[1], orig[2], qpy, qpb, qpr, lam,
            *self._filter_qps(), qp_ctb,
            nr_offsets=self._nr_offsets if self._nr_enabled else None)
        h = _BatchFetch(small)
        h.start()
        return (h, tails), ext

    def _finish_i(self, pend):
        ps = pend.ps
        o, coeffs = self._fetch_outputs(pend)
        g = self.geom
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        gh, gw = ph // 16, pw // 16
        modes = o["modes"].reshape(gh, gw)
        s4 = pend.cu_size // 4
        ps.luma_mode[:] = np.kron(modes.astype(np.uint8),
                                  np.ones((s4, s4), np.uint8))
        ps.chroma_mode[:] = ps.luma_mode
        if self._get_ctu_scan().t["has32"]:
            use32 = o["use32"].reshape(ph // 32, pw // 32)
            mode32 = o["mode32"].reshape(ph // 32, pw // 32)
            self._apply_cu32(ps, use32, mode32)
        self._scatter_syntax(ps, o, coeffs)
        return o

    def _extend_ref(self, ref):
        """Edge-replicate a reference to coded size + ME/MC margin (host
        fallback; the common path keeps the extension on device).  Dtype
        matches the device DPB entries so both hit the same executable."""
        g = self.geom
        R = self.me_range
        M, CM = R + 8, R // 2 + 4
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        dt = np.uint8 if self.bit_depth == 8 else np.uint16

        def ext(pl, th, tw, m):
            pad = np.pad(pl, ((0, th - pl.shape[0]),
                              (0, tw - pl.shape[1])), mode="edge")
            return np.pad(pad, m, mode="edge").astype(dt)

        return (ext(ref[0], ph, pw, M),
                ext(ref[1], ph // 2, pw // 2, CM),
                ext(ref[2], ph // 2, pw // 2, CM))

    def _get_ref_ext(self, poc):
        """Reference planes extended for ME/MC: device-resident DPB entry
        when available (the common case — zero host roundtrip), else an
        edge-replicated host pad of the numpy recon."""
        dev = self.dpb_dev.get(poc)
        if dev is not None:
            return dev
        entry = self.dpb[poc]
        assert not isinstance(entry, _Pending), \
            "host reference requested before the frame finished"
        return self._extend_ref(entry)

    def _dispatch_p(self, orig, ref_pocs, wp=(64, 0, False)):
        """``ref_pocs``: active L0 list, nearest first.  The pipeline is
        compiled for a FIXED self.num_ref reference slots; a shorter
        list is padded by repeating its farthest entry (duplicates can
        never win the ref_idx argmin — same cost, more ref bits — so
        the padded program is bit-exact with a shorter one)."""
        from .device_pipeline import build_p_pipeline

        if self._p_pipeline is None:
            self._p_pipeline = build_p_pipeline(self, nr=self.num_ref)
        pocs = list(ref_pocs)
        pocs = pocs + [pocs[-1]] * (self.num_ref - len(pocs))
        refs = [self._get_ref_ext(q) for q in pocs]
        qpy, qpb, qpr, lam, qp_ctb = self._qp_arrays
        small, tails, ext = self._p_pipeline(
            orig[0], orig[1], orig[2],
            tuple(r[0] for r in refs), tuple(r[1] for r in refs),
            tuple(r[2] for r in refs),
            qpy, qpb, qpr, lam, *self._filter_qps(), qp_ctb,
            np.asarray(pocs, np.int32),
            np.int32(wp[0]), np.int32(wp[1]), n_act=len(ref_pocs),
            nr_offsets=self._nr_offsets if self._nr_enabled else None)
        h = _BatchFetch(small)
        h.start()              # overlap the link with later host work
        return (h, tails), ext

    def _finish_p(self, pend):
        ps = pend.ps
        g = self.geom
        n = cu_size = pend.cu_size
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        o, coeffs = self._fetch_outputs(pend)
        self.last_frame_costs = (float(o["cost_p"]), float(o["cost_i"]))
        gh, gw = (ph // cu_size, pw // cu_size)
        modes = o["modes"].reshape(gh, gw)
        mv = o["mv"].reshape(gh, gw, 2)
        inter_mask = o["inter"].reshape(gh, gw)
        s4 = n // 4
        ps.luma_mode[:] = np.kron(modes.astype(np.uint8),
                                  np.ones((s4, s4), np.uint8))
        ps.chroma_mode[:] = ps.luma_mode
        pm = np.where(inter_mask, MODE_INTER, MODE_INTRA).astype(np.uint8)
        ps.pred_mode[:] = np.kron(pm, np.ones((s4, s4), np.uint8))
        ps.mv0[:] = np.kron(
            mv.astype(np.int16).transpose(2, 0, 1),
            np.ones((1, s4, s4), np.int16)).transpose(1, 2, 0)
        rsel = np.asarray(o["ref_idx"]).reshape(gh, gw)
        ps.ref_idx0[:] = np.kron(rsel.astype(ps.ref_idx0.dtype),
                                 np.ones((s4, s4), ps.ref_idx0.dtype))
        ps.ref_idx0[ps.pred_mode == MODE_INTRA] = 0
        if self._get_ctu_scan().t["has32"]:
            use32 = self._intra32_mask(o).reshape(ph // 32, pw // 32)
            mode32 = o["mode32"].reshape(ph // 32, pw // 32)
            self._apply_cu32(ps, use32, mode32)
        self._apply_inter_merge(ps, o)
        self._scatter_syntax(ps, o, coeffs)
        self._derive_inter_all(ps)
        return o

    @staticmethod
    def _intra32_mask(o):
        """sel32 minus the inter-TU32 quads (those belong to merged
        inter CUs and must not get intra modes applied)."""
        u = np.asarray(o["use32"])
        m32 = o.get("m32")
        if m32 is None:
            return u
        m32 = np.asarray(m32)
        m64 = o.get("m64")
        m64r = (np.repeat(np.repeat(np.asarray(m64),
                                    m32.shape[0] // np.asarray(m64).shape[0], 0),
                          m32.shape[1] // np.asarray(m64).shape[1], 1)
                if m64 is not None else np.zeros(m32.shape, bool))
        return u.reshape(m32.shape) & ~(m32 | m64r)

    def _dispatch_b(self, orig, l0_poc, l1_poc):
        """B-frame device program dispatch: both list searches + bi trial
        happen on device (device_pipeline.build_b_pipeline).  TPU-first
        shape of x265 interModeBidir (search.cpp:2013)."""
        from .device_pipeline import build_b_pipeline

        if self._b_pipeline is None:
            self._b_pipeline = build_b_pipeline(self)
        refs0 = self._get_ref_ext(l0_poc)
        refs1 = self._get_ref_ext(l1_poc)
        qpy, qpb, qpr, lam, qp_ctb = self._qp_arrays
        small, tails, _ = self._b_pipeline(
            orig[0], orig[1], orig[2], *refs0, *refs1,
            qpy, qpb, qpr, lam,
            *self._filter_qps(), np.int32(l0_poc), np.int32(l1_poc),
            qp_ctb,
            nr_offsets=self._nr_offsets if self._nr_enabled else None)
        h = _BatchFetch(small)
        h.start()
        return (h, tails)

    def _dispatch_b_ref(self, orig, l0_poc, l1_poc):
        """b-pyramid reference B: same program + the DPB extension."""
        from .device_pipeline import build_b_pipeline

        if getattr(self, "_b_ref_pipeline", None) is None:
            self._b_ref_pipeline = build_b_pipeline(self, make_ext=True)
        refs0 = self._get_ref_ext(l0_poc)
        refs1 = self._get_ref_ext(l1_poc)
        qpy, qpb, qpr, lam, qp_ctb = self._qp_arrays
        small, tails, ext = self._b_ref_pipeline(
            orig[0], orig[1], orig[2], *refs0, *refs1,
            qpy, qpb, qpr, lam,
            *self._filter_qps(), np.int32(l0_poc), np.int32(l1_poc),
            qp_ctb,
            nr_offsets=self._nr_offsets if self._nr_enabled else None)
        h = _BatchFetch(small)
        h.start()
        return (h, tails), ext

    def _dispatch_b_batch(self, pends, l0_poc, l1_poc):
        """One batched device dispatch for all Bs of a mini-GOP (they are
        mutually independent TRAIL_N pictures; x265 encodes them on
        separate frame threads — here they ride one vmapped program)."""
        from .device_pipeline import build_b_pipeline

        F = len(pends)
        pipe = self._b_batch_pipelines.get(F)
        if pipe is None:
            pipe = self._b_batch_pipelines[F] = build_b_pipeline(
                self, batch=F)
        refs0 = self._get_ref_ext(l0_poc)
        refs1 = self._get_ref_ext(l1_poc)
        oy = np.stack([p.orig[0] for p in pends])
        ocb = np.stack([p.orig[1] for p in pends])
        ocr = np.stack([p.orig[2] for p in pends])
        qs = [np.stack([p.qp_arrays[i] for p in pends]) for i in range(5)]
        fq = [np.stack([p.filter_qps[i] for p in pends]) for i in range(4)]
        small, tails, _ = pipe(
            oy, ocb, ocr, *refs0, *refs1,
            qs[0], qs[1], qs[2], qs[3], fq[0], fq[1], fq[2], fq[3],
            np.int32(l0_poc), np.int32(l1_poc), qs[4],
            nr_offsets=self._nr_offsets if self._nr_enabled else None)
        handle = _BatchFetch(small)
        handle.start()
        for k, p in enumerate(pends):
            p.out_dev = (handle, tails)
            p.batch_idx = k

    def _finish_b(self, pend):
        """Scatter the fetched B outputs into PicSyntax and derive the
        merge/AMVP syntax."""
        ps = pend.ps
        g = self.geom
        n = cu_size = pend.cu_size
        ph = g.ctbs_h << g.log2_ctb
        pw = g.ctbs_w << g.log2_ctb
        o, coeffs = self._fetch_outputs(pend)
        gh, gw = (ph // cu_size, pw // cu_size)
        modes = o["modes"].reshape(gh, gw)
        mv0 = o["mv0"].reshape(gh, gw, 2)
        mv1 = o["mv1"].reshape(gh, gw, 2)
        dirs = o["dirs"].reshape(gh, gw)
        inter_mask = o["inter"].reshape(gh, gw)
        s4 = n // 4
        ps.luma_mode[:] = np.kron(modes.astype(np.uint8),
                                  np.ones((s4, s4), np.uint8))
        ps.chroma_mode[:] = ps.luma_mode
        pm = np.where(inter_mask, MODE_INTER, MODE_INTRA).astype(np.uint8)
        ps.pred_mode[:] = np.kron(pm, np.ones((s4, s4), np.uint8))

        def rep(a):
            return np.kron(a.astype(np.int16).transpose(2, 0, 1),
                           np.ones((1, s4, s4), np.int16)).transpose(1, 2, 0)

        ps.mv0[:] = rep(mv0)
        ps.mv1[:] = rep(mv1)
        # uni blocks keep zeros in the unused list (normative neighbor state)
        d_eff = np.where(inter_mask, dirs, 1).astype(np.uint8)
        ps.inter_dir[:] = np.kron(d_eff, np.ones((s4, s4), np.uint8))
        ps.mv0[ps.inter_dir == 2] = 0
        ps.mv1[ps.inter_dir == 1] = 0
        if self._get_ctu_scan().t["has32"]:
            use32 = self._intra32_mask(o).reshape(ph // 32, pw // 32)
            mode32 = o["mode32"].reshape(ph // 32, pw // 32)
            self._apply_cu32(ps, use32, mode32)
        self._apply_inter_merge(ps, o)
        self._scatter_syntax(ps, o, coeffs)
        self._derive_inter_all(ps)
        return o

    def _recon_host_fallback(self, ps, orig, rec, modes, cu_size, qps):
        """Spec-loop encode (numpy oracle) for non-aligned geometries and
        tests; covers the whole picture."""
        qp_y, qp_cb, qp_cr = qps
        g = self.geom
        for ctu in range(g.n_ctbs):
            for (cx, cy, log2_cb) in cu_leaves(ps, ctu):
                for (tx, ty, log2_tb, _d) in tu_leaves(ps, cx, cy, log2_cb):
                    mode = int(ps.luma_mode[ty >> 2, tx >> 2])
                    self._encode_tu(orig[0], rec[0], ps.coeff_y, ps,
                                    tx, ty, log2_tb, mode, qp_y,
                                    is_luma=True)
                cmode = int(ps.chroma_mode[cy >> 2, cx >> 2])
                for (tx, ty, clog2) in chroma_tu_leaves(ps, cx, cy, log2_cb):
                    self._encode_tu(orig[1], rec[1], ps.coeff_cb, ps,
                                    tx >> 1, ty >> 1, clog2, cmode, qp_cb,
                                    is_luma=False, chroma_shift=1)
                    self._encode_tu(orig[2], rec[2], ps.coeff_cr, ps,
                                    tx >> 1, ty >> 1, clog2, cmode, qp_cr,
                                    is_luma=False, chroma_shift=1)

    # -- P frames ------------------------------------------------------------

    def _derive_inter_all(self, ps):
        """Merge/AMVP/skip derivation over all inter CU leaves — native C
        (x265_tpu/native/slice_enc.c derive_inter_syntax) with the Python
        spec loops as fallback/oracle.  Must run after the coefficient
        planes are scattered (skip needs them)."""
        # TMVP: collocated picture = L0[0] (collocated_from_l0 = 1).
        # Attached HERE — in entropy/finish order — because the col
        # picture's final motion is only stored at its own entropy pass;
        # dispatch-time attachment would race the frame pipeline and
        # silently disable TMVP under overlap.
        if self.params.temporal_mvp and ps.ref_pocs_l0 and \
                ps.col is None:
            col = self._col_store.get(ps.ref_pocs_l0[0])
            if col is not None:
                ps.temporal_mvp = True
                ps.col = col
        if not self.force_python_derivation:
            from ..native import derive_inter_syntax_native
            if derive_inter_syntax_native(ps):
                return
        self._derive_inter_syntax(ps)
        self._derive_skip(ps)

    def _derive_inter_syntax(self, ps):
        """Per inter CU leaf (any size): choose merge (full motion equals a
        candidate) or AMVP+MVD per used list.  Reads only final neighbor
        state (z-scan availability guarantees identical derivation at
        decode time)."""
        from ..common.motion import (MotionCand, amvp_candidates,
                                     merge_candidates)

        g = self.geom
        for ctu in range(g.n_ctbs):
            for (x0, y0, log2_cb) in cu_leaves(ps, ctu):
                y4, x4 = y0 >> 2, x0 >> 2
                if ps.pred_mode[y4, x4] == MODE_INTRA:
                    continue
                n = 1 << log2_cb
                d = int(ps.inter_dir[y4, x4]) or 1
                me = MotionCand(
                    d,
                    (int(ps.mv0[y4, x4, 0]), int(ps.mv0[y4, x4, 1])),
                    int(ps.ref_idx0[y4, x4]),
                    (int(ps.mv1[y4, x4, 0]), int(ps.mv1[y4, x4, 1])),
                    int(ps.ref_idx1[y4, x4]))
                cands = merge_candidates(ps, x0, y0, n, n,
                                         ps.max_merge_cand)
                keys = [c.key() for c in cands]
                if me.key() in keys:
                    idx = keys.index(me.key())
                    ps.set_region(ps.merge_flag, x0, y0, n, 1)
                    ps.set_region(ps.merge_idx, x0, y0, n, idx)
                    continue
                if d & 1:
                    mv = me.mv0
                    amvp = amvp_candidates(ps, x0, y0, n, n, 0, me.ref0)
                    costs = [abs(mv[0] - c[0]) + abs(mv[1] - c[1])
                             for c in amvp]
                    mvp = int(np.argmin(costs))
                    ps.set_region(ps.mvp_flag, x0, y0, n, mvp)
                    ps.mvd[y4:(y0 + n) >> 2, x4:(x0 + n) >> 2] = (
                        mv[0] - amvp[mvp][0], mv[1] - amvp[mvp][1])
                if d & 2:
                    mv = me.mv1
                    amvp = amvp_candidates(ps, x0, y0, n, n, 1, me.ref1)
                    costs = [abs(mv[0] - c[0]) + abs(mv[1] - c[1])
                             for c in amvp]
                    mvp = int(np.argmin(costs))
                    ps.set_region(ps.mvp_flag1, x0, y0, n, mvp)
                    ps.mvd1[y4:(y0 + n) >> 2, x4:(x0 + n) >> 2] = (
                        mv[0] - amvp[mvp][0], mv[1] - amvp[mvp][1])

    def _derive_skip(self, ps):
        g = self.geom
        for ctu in range(g.n_ctbs):
            for (x0, y0, log2_cb) in cu_leaves(ps, ctu):
                y4, x4 = y0 >> 2, x0 >> 2
                if ps.pred_mode[y4, x4] == MODE_INTRA or \
                        not ps.merge_flag[y4, x4]:
                    continue
                n = 1 << log2_cb
                c = n >> 1
                if (ps.coeff_y[y0:y0 + n, x0:x0 + n].any()
                        or ps.coeff_cb[y0 >> 1:(y0 >> 1) + c,
                                       x0 >> 1:(x0 >> 1) + c].any()
                        or ps.coeff_cr[y0 >> 1:(y0 >> 1) + c,
                                       x0 >> 1:(x0 >> 1) + c].any()):
                    continue
                ps.set_region(ps.skip, x0, y0, n, 1)

    def _sao_decide_apply(self, ps, orig, rec):
        """Per-CTB SAO estimation + decision + apply (on the deblocked
        picture).  Fills ps.sao_* and returns the filtered planes."""
        from ..ops.sao import sao_apply_plane_np, sao_estimate_plane_np

        g = self.geom
        ctb = 1 << g.log2_ctb
        bd = self.bit_depth
        # SSE-domain lambda^2 (distortion deltas are SSD): x265-style
        lam = 0.72 * 2.0 ** ((self.qp - 12) / 3.0)

        # luma decision
        dist, offs, bpos, bits = sao_estimate_plane_np(orig[0], rec[0],
                                                       ctb, bd)
        cost = dist + (lam * bits).astype(np.int64)
        cost[..., 0] = 0
        best = np.argmin(cost, axis=-1)                   # [ch, cw]
        ch_, cw_ = best.shape
        addr = np.arange(ch_ * cw_).reshape(ch_, cw_)
        types = np.where(best == 0, 0, np.where(best == 5, 1, 2))
        ps.sao_type[:, 0] = types.reshape(-1)
        ps.sao_eo_class[:, 0] = np.where(best >= 1, best - 1, 0).clip(
            0, 3).reshape(-1)
        ps.sao_band_pos[:, 0] = bpos.reshape(-1)
        ps.sao_offsets[:, 0] = np.take_along_axis(
            offs, best[..., None, None], axis=2)[:, :, 0].reshape(-1, 4)

        # chroma: shared type/class, separate offsets/band positions
        dist_b, offs_b, bpos_b, bits_b = sao_estimate_plane_np(
            orig[1], rec[1], ctb // 2, bd)
        dist_r, offs_r, bpos_r, bits_r = sao_estimate_plane_np(
            orig[2], rec[2], ctb // 2, bd)
        cost_c = (dist_b + dist_r + (lam * (bits_b + bits_r)).astype(
            np.int64))
        cost_c[..., 0] = 0
        best_c = np.argmin(cost_c, axis=-1)
        types_c = np.where(best_c == 0, 0, np.where(best_c == 5, 1, 2))
        ps.sao_type[:, 1] = types_c.reshape(-1)
        ps.sao_eo_class[:, 1] = np.where(best_c >= 1, best_c - 1, 0).clip(
            0, 3).reshape(-1)
        ps.sao_band_pos[:, 1] = bpos_b.reshape(-1)
        ps.sao_band_pos[:, 2] = bpos_r.reshape(-1)
        ps.sao_offsets[:, 1] = np.take_along_axis(
            offs_b, best_c[..., None, None], axis=2)[:, :, 0].reshape(-1, 4)
        ps.sao_offsets[:, 2] = np.take_along_axis(
            offs_r, best_c[..., None, None], axis=2)[:, :, 0].reshape(-1, 4)

        y = sao_apply_plane_np(
            rec[0], ctb, types, best.clip(1, 4) - 1, bpos,
            ps.sao_offsets[:, 0].reshape(ch_, cw_, 4), bd)
        cb = sao_apply_plane_np(
            rec[1], ctb // 2, types_c, best_c.clip(1, 4) - 1, bpos_b,
            ps.sao_offsets[:, 1].reshape(ch_, cw_, 4), bd)
        cr = sao_apply_plane_np(
            rec[2], ctb // 2, types_c, best_c.clip(1, 4) - 1, bpos_r,
            ps.sao_offsets[:, 2].reshape(ch_, cw_, 4), bd)
        return (y.astype(rec[0].dtype), cb.astype(rec[1].dtype),
                cr.astype(rec[2].dtype))

    def _store_col_motion(self, ps, poc: int) -> None:
        """Retain this picture's final motion field for TMVP
        (§8.5.3.2.9 collocated inputs): 4x4 pred-mode/dir/MV grids plus
        per-4x4 reference-POC maps (x265 keeps the same data on its
        Frame; cudata.cpp temporal merge cand)."""
        pocs0 = np.asarray(ps.ref_pocs_l0 or (0,), np.int32)
        pocs1 = np.asarray(ps.ref_pocs_l1 or (0,), np.int32)
        r0 = np.minimum(ps.ref_idx0.astype(np.int32), len(pocs0) - 1)
        r1 = np.minimum(ps.ref_idx1.astype(np.int32), len(pocs1) - 1)
        self._col_store[poc] = dict(
            pred_mode=ps.pred_mode.copy(),
            inter_dir=ps.inter_dir.copy(),
            mv0=ps.mv0.copy(), mv1=ps.mv1.copy(),
            poc0=pocs0[r0], poc1=pocs1[r1], poc=poc)
        while len(self._col_store) > 8:
            self._col_store.pop(next(iter(self._col_store)))

    def _entropy_encode(self, ps: PicSyntax, slice_type: int = SLICE_I,
                        poc: int = 0, l0_poc=None, l1_poc=None) -> bytes:
        from ..common.bitstream import NAL_TRAIL_N
        from ..common.headers import ShortTermRPS
        _t0 = self._clock()

        if self.params.temporal_mvp:
            if slice_type == SLICE_I:
                # POC restarts at the IDR: stale collocated entries from
                # the previous CVS must never resolve (entropy order is
                # strictly serial, so this cannot race the pipeline)
                self._col_store.clear()
            self._store_col_motion(ps, poc)

        g = self.geom
        sao_on = bool(self.sps.sao_enabled)
        if slice_type == SLICE_I:
            sh = SliceHeader(slice_type=SLICE_I, slice_qp=self.qp,
                             sao_luma=int(sao_on), sao_chroma=int(sao_on))
            nal_type = NAL_IDR_W_RADL
            init_type = 0
        else:
            # explicit RPS: active references (used_by_curr = 1) plus
            # retained-only pictures future frames need (used = 0)
            # (§7.4.8; x265 codeShortTermRefPicSet entropy.cpp:523,
            # dpb.cpp:186 computeRPS)
            keep = set(getattr(ps, "rps_keep", ()))
            act0 = [q for q in ps.ref_pocs_l0 if q is not None]
            act1 = [q for q in ps.ref_pocs_l1 if q is not None]
            s0_pocs = sorted({q for q in keep if q < poc} | set(act0),
                             reverse=True)
            s1_pocs = sorted({q for q in keep if q > poc} | set(act1))
            if not s0_pocs:
                s0_pocs = [poc - 1]
            rps = ShortTermRPS(
                delta_pocs_s0=[q - poc for q in s0_pocs],
                used_s0=[1 if q in act0 else 0 for q in s0_pocs],
                delta_pocs_s1=[q - poc for q in s1_pocs],
                used_s1=[1 if q in act1 else 0 for q in s1_pocs])
            if slice_type == SLICE_B:
                # b-pyramid reference Bs are TRAIL_R; outer Bs TRAIL_N
                nal_type = (NAL_TRAIL_R if getattr(ps, "b_is_ref", False)
                            else NAL_TRAIL_N)
                init_type = 2
            else:
                nal_type = NAL_TRAIL_R
                init_type = 1
            sh = SliceHeader(
                slice_type=slice_type, slice_qp=self.qp,
                sao_luma=int(sao_on), sao_chroma=int(sao_on),
                pic_order_cnt_lsb=poc % (1 << self.sps.log2_max_poc_lsb),
                rps=rps, max_num_merge_cand=ps.max_merge_cand,
                temporal_mvp_enabled=int(getattr(ps, "temporal_mvp",
                                                 False)))
            n0 = max(1, len(act0))
            sh.num_ref_idx_l0 = n0
            if n0 != self.pps.num_ref_idx_l0_default:
                sh.num_ref_idx_active_override = 1
            if self.pps.weighted_pred and slice_type == SLICE_P:
                w, o, on = getattr(ps, "wp_entry", (64, 0, False))
                sh.luma_log2_weight_denom = 6
                sh.chroma_log2_weight_denom = 6
                # weight entry per active L0 ref; only ref0 is analysed
                sh.weights_l0 = ([(int(bool(on)), w, o, 0, 64, 0, 64, 0)]
                                 + [(0, 64, 0, 0, 64, 0, 64, 0)]
                                 * (n0 - 1))
        bw = write_slice_header(sh, self.sps, self.pps, nal_type)

        data = None
        if not self.force_python_entropy \
                and not self.pps.transquant_bypass_enabled:
            from ..native import encode_slice_data_native
            data = encode_slice_data_native(
                ps, self.qp, log2_min_cb=self.sps.log2_min_cb_size,
                log2_min_tb=self.sps.log2_min_tb_size,
                log2_max_tb=self.sps.log2_max_tb_size,
                slice_type=(2 if slice_type == SLICE_I
                            else 0 if slice_type == SLICE_B else 1),
                sao_luma=sao_on, sao_chroma=sao_on,
                bit_depth=self.bit_depth,
                num_ref_l0=max(1, len(ps.ref_pocs_l0)),
                num_ref_l1=max(1, len(ps.ref_pocs_l1))
                if slice_type == SLICE_B else 1)
        if data is None:    # P slices / no native toolchain: Python CABAC
            ctx = init_context_states(init_type, self.qp)
            enc = CabacEncoder(ctx=ctx)
            coder = CtuCoder(ps, self.sps.log2_min_cb_size,
                             self.sps.log2_min_tb_size,
                             self.sps.log2_max_tb_size,
                             slice_type=slice_type, sao_luma=sao_on,
                             sao_chroma=sao_on, bit_depth=self.bit_depth,
                             num_ref_l0=max(1, len(ps.ref_pocs_l0)),
                             num_ref_l1=max(1, len(ps.ref_pocs_l1)),
                             transquant_bypass=bool(
                                 self.pps.transquant_bypass_enabled))
            for ctu in range(g.n_ctbs):
                coder.encode_ctu(enc, ctu)
                enc.encode_terminate(1 if ctu == g.n_ctbs - 1 else 0)
            # finishSlice semantics (entropy.h:153): terminate(1) flushed
            # the engine; close the RBSP with stop bit + alignment zeros.
            enc.bw.byte_alignment()
            data = enc.bw.getvalue()
        rbsp = bw.getvalue() + data
        self._perf["entropy"] += self._clock() - _t0
        return wrap_nal(nal_type, rbsp)


def encode_sequence(frames, params: Params) -> tuple[bytes, list]:
    """Encode a list of (Y, Cb, Cr) frames; returns (annexb stream in
    decode order, recons in DISPLAY order)."""
    enc = Encoder(params)
    out = enc.headers()
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    for ef in efs:
        out += ef.au
    recons = [ef.recon for ef in sorted(efs, key=lambda e: e.display_idx)]
    return out, recons
