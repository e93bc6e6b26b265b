"""Multi-reference prediction (x265 --ref; search.cpp:2050 per-ref ME,
dpb.cpp:261 reference list construction).

The flash/occlusion clip makes the 2-back reference strictly better than
the previous frame for most blocks — with --ref >= 2 the P frame after
the flash must shrink dramatically and the stream must still decode with
hash verification (closed loop + RPS retention of older anchors).
"""

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.encoder import Encoder


def _flash_clip(w=96, h=64, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h, w)).astype(np.uint8)
    flash = base.copy()
    flash[:, 20:60] = 255 - flash[:, 20:60]
    return [base, flash, np.roll(base, 2, axis=1),
            np.roll(base, 4, axis=1)]


def _encode(frames, **kw):
    w, h = frames[0].shape[1], frames[0].shape[0]
    u = np.full((h // 2, w // 2), 128, np.uint8)
    p = Params(source_width=w, source_height=h, qp=30, bframes=0,
               aq_mode=0, cu_tree=False, decoded_picture_hash=1,
               me_range=8, log_level=0, scenecut_threshold=0, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    efs = []
    for f in frames:
        efs += enc.push_frame((f, u, u))
    efs += enc.flush()
    for ef in efs:
        stream += ef.au
    return stream, efs, enc


def test_multiref_beats_single_ref_on_occlusion():
    frames = _flash_clip()
    s1, e1, _ = _encode(frames, ref=1)
    s3, e3, enc = _encode(frames, ref=3)
    # P after the flash should reference 2-back and get much cheaper
    assert len(e3[2].au) < len(e1[2].au) // 3, \
        (len(e3[2].au), len(e1[2].au))
    # ref_idx actually used beyond 0
    assert enc.last_ps.ref_idx0.max() >= 1
    for stream, n in ((s1, 4), (s3, 4)):
        pics = decode_annexb(stream)
        assert len(pics) == n
        assert all(p.hash_ok for p in pics)


def test_multiref_sps_dpb_capacity():
    frames = _flash_clip()
    _, _, enc = _encode(frames, ref=4)
    # RPS of the 4th frame holds 3 refs; SPS must declare capacity
    assert enc.sps.max_dec_pic_buffering >= enc.num_ref + 1


def test_multiref_rps_retains_older_anchors():
    frames = _flash_clip()
    stream, efs, enc = _encode(frames, ref=3)
    # last P's active list covers three anchors
    assert len(efs[-1].ps.ref_pocs_l0) == 3 if hasattr(
        efs[-1], "ps") else True
    pics = decode_annexb(stream)
    assert all(p.hash_ok for p in pics)
