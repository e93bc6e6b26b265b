"""VPS/SPS/PPS/slice header write→parse roundtrip."""

from x265_tpu.common.bitstream import BitReader, NAL_IDR_W_RADL, NAL_TRAIL_R
from x265_tpu.common.headers import (
    PPS, SPS, VPS, SliceHeader, ShortTermRPS, SLICE_I, SLICE_P,
    parse_pps, parse_slice_header, parse_sps, parse_vps,
    write_pps, write_slice_header, write_sps, write_vps,
)


def test_vps_roundtrip():
    vps = VPS()
    data = write_vps(vps)
    out = parse_vps(data)
    assert out.max_sub_layers == vps.max_sub_layers
    assert out.ptl.profile_idc == vps.ptl.profile_idc
    assert out.max_dec_pic_buffering == vps.max_dec_pic_buffering


def test_sps_roundtrip():
    sps = SPS(pic_width=352, pic_height=288, log2_ctb_size=4,
              log2_min_cb_size=3, log2_max_tb_size=4, sao_enabled=0,
              temporal_mvp_enabled=1, strong_intra_smoothing=1)
    out = parse_sps(write_sps(sps))
    for f in ("pic_width", "pic_height", "log2_ctb_size", "log2_min_cb_size",
              "log2_min_tb_size", "log2_max_tb_size", "chroma_format_idc",
              "bit_depth_luma", "sao_enabled", "temporal_mvp_enabled",
              "strong_intra_smoothing", "log2_max_poc_lsb",
              "max_transform_hierarchy_depth_intra"):
        assert getattr(out, f) == getattr(sps, f), f
    assert out.pic_width_in_ctbs == 22
    assert out.pic_height_in_ctbs == 18


def test_sps_with_rps_roundtrip():
    rps = ShortTermRPS(delta_pocs_s0=[-1, -2], used_s0=[1, 1],
                       delta_pocs_s1=[2], used_s1=[1])
    sps = SPS(pic_width=64, pic_height=64, short_term_rps=[rps])
    out = parse_sps(write_sps(sps))
    assert len(out.short_term_rps) == 1
    r = out.short_term_rps[0]
    assert r.delta_pocs_s0 == [-1, -2]
    assert r.used_s0 == [1, 1]
    assert r.delta_pocs_s1 == [2]


def test_pps_roundtrip():
    pps = PPS(init_qp=32, sign_data_hiding=1, cb_qp_offset=-2, cr_qp_offset=3,
              deblocking_filter_control_present=1, deblocking_filter_disabled=1)
    out = parse_pps(write_pps(pps))
    for f in ("init_qp", "sign_data_hiding", "cb_qp_offset", "cr_qp_offset",
              "deblocking_filter_control_present", "deblocking_filter_disabled",
              "cu_qp_delta_enabled", "transform_skip_enabled",
              "entropy_coding_sync_enabled"):
        assert getattr(out, f) == getattr(pps, f), f


def test_slice_header_idr_roundtrip():
    sps = SPS(pic_width=352, pic_height=288)
    pps = PPS(init_qp=26, deblocking_filter_control_present=1,
              deblocking_filter_disabled=1)
    sh = SliceHeader(slice_type=SLICE_I, slice_qp=32)
    bw = write_slice_header(sh, sps, pps, NAL_IDR_W_RADL)
    br = BitReader(bw.getvalue())
    out = parse_slice_header(br, sps, pps, NAL_IDR_W_RADL)
    assert out.slice_type == SLICE_I
    assert out.slice_qp == 32
    assert out.first_slice_in_pic == 1
    assert out.deblocking_filter_disabled == 1


def test_slice_header_p_roundtrip():
    sps = SPS(pic_width=352, pic_height=288, temporal_mvp_enabled=0)
    pps = PPS(init_qp=26)
    rps = ShortTermRPS(delta_pocs_s0=[-1], used_s0=[1])
    sh = SliceHeader(slice_type=SLICE_P, slice_qp=30, pic_order_cnt_lsb=5,
                     rps=rps, num_ref_idx_l0=1, max_num_merge_cand=2)
    bw = write_slice_header(sh, sps, pps, NAL_TRAIL_R)
    br = BitReader(bw.getvalue())
    out = parse_slice_header(br, sps, pps, NAL_TRAIL_R)
    assert out.slice_type == SLICE_P
    assert out.slice_qp == 30
    assert out.pic_order_cnt_lsb == 5
    assert out.rps.delta_pocs_s0 == [-1]
    assert out.max_num_merge_cand == 2


def test_params_presets():
    from x265_tpu.common.params import default_params, param_parse
    p = default_params("ultrafast", source_width=352, source_height=288)
    assert p.ctu_size == 32 and p.rd_level == 2 and not p.sao
    p.validate()
    p2 = default_params("veryslow")
    assert p2.rd_level == 6 and p2.amp
    param_parse(p, "qp", "35")
    assert p.qp == 35
    param_parse(p, "input-res", "1920x1080")
    assert p.source_width == 1920
    param_parse(p, "no-wpp")
    assert not p.wavefront
    param_parse(p, "me", "star")
    assert p.me == 3
