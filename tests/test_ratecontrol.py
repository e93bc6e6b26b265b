"""Rate control: CQP I/P offsets, CRF mapping, ABR convergence."""

import numpy as np

import conftest  # noqa: F401
from test_inter import make_clip, roundtrip
from x265_tpu.common.params import RC_ABR, RC_CRF, Params, param_parse
from x265_tpu.encoder import Encoder


def test_param_parse_sets_rc_mode():
    p = Params(bframes=0, source_width=64, source_height=64)
    param_parse(p, "crf", "23")
    assert p.rc_mode == RC_CRF and p.crf == 23
    param_parse(p, "bitrate", "800")
    assert p.rc_mode == RC_ABR and p.bitrate == 800


def test_abr_tracks_target():
    w, h, n = 96, 64, 12
    frames = make_clip("mixed", w, h, n, seed=3)
    p = Params(bframes=0, source_width=w, source_height=h, fps_num=25,
               rc_mode=RC_ABR, bitrate=260, decoded_picture_hash=1)
    enc = Encoder(p)
    bits = 0
    for fr in frames:
        au, _ = enc.encode_frame(fr)
        bits += len(au) * 8
    kbps = bits * 25 / (n * 1000)
    # loose band: a v1 controller without lookahead, short clip
    assert 0.4 * 260 < kbps < 2.5 * 260, f"ABR way off target: {kbps} kbps"


def test_crf_mode_still_conformant():
    frames = make_clip("pan", 64, 64, 3, seed=1)
    roundtrip(frames, 64, 64, qp=30, rc_mode=RC_CRF, crf=30)
