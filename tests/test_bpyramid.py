"""B-pyramid: the middle B of each mini-GOP is coded first against the
anchors and referenced by the outer Bs (x265 slicetype.cpp B-pyramid
ref selection; --b-pyramid default on)."""

import numpy as np

from x265_tpu.common.bitstream import split_annexb
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder


def _clip(w=96, h=64, n=6, seed=9):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 70 * np.sin(xx / 13.0) * np.cos(yy / 9.0))
    u = np.full((h // 2, w // 2), 120, np.uint8)
    return [(np.clip(np.roll(base, 2 * t, axis=1)
                     + rng.randint(-2, 3, (h, w)), 0, 255).astype(np.uint8),
             u, u) for t in range(n)]


def _encode(frames, **kw):
    p = Params(source_width=frames[0][0].shape[1],
               source_height=frames[0][0].shape[0], qp=30, aq_mode=0,
               cu_tree=False, decoded_picture_hash=1, log_level=0,
               me_range=8, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    for ef in efs:
        stream += ef.au
    return stream, efs


def test_bpyramid_stream_structure_and_decode():
    frames = _clip(n=6)          # I B B B B P with bframes=4
    stream, efs = _encode(frames, bframes=4, b_pyramid=True)
    # one B per mini-GOP must be a TRAIL_R reference
    vcl = [t for t, _tid, _ in split_annexb(stream) if t < 32]
    assert 1 in vcl and 0 in vcl         # TRAIL_R + TRAIL_N present
    kinds = [(ef.kind, ef.poc) for ef in efs]
    assert sum(1 for ef in efs if getattr(ef, "kind", "") == "B") == 4, kinds
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    assert all(p.hash_ok for p in pics)
    # decoder output must be display order
    disp = sorted(efs, key=lambda e: e.display_idx)
    for d, pc in zip(disp, pics):
        np.testing.assert_array_equal(np.asarray(d.recon[0]),
                                      np.asarray(pc.planes[0]))


def test_bpyramid_saves_bits():
    frames = _clip(w=160, h=96, n=11, seed=4)
    s_flat, _ = _encode(frames, bframes=4, b_pyramid=False)
    s_pyr, _ = _encode(frames, bframes=4, b_pyramid=True)
    assert len(s_pyr) < len(s_flat), (len(s_pyr), len(s_flat))
