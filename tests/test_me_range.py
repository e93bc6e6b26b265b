"""Hierarchical motion search: --merange beyond the fine radius.

x265 honors --merange up to 32768 via adaptive search patterns
(x265_1.9/source/encoder/motion.cpp:571); the TPU-first design covers the
range with a quarter-res full search that seeds a per-block +-8 full-res
refine (device_pipeline.coarse_seeds).  These tests verify (a) the reach
bookkeeping, (b) that motion far beyond +-8 is actually found (P frame
much smaller than intra), and (c) closed-loop decodability with hash
verification.
"""

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.decoder.decoder import decode_annexb
from x265_tpu.encoder import Encoder


def _textured(w, h, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 255, (h, w)).astype(np.int32)
    y = (y + np.roll(y, 1, 0) + np.roll(y, 1, 1)) // 3
    return y.astype(np.uint8)


def test_reach_bookkeeping():
    p = Params(source_width=64, source_height=64, me_range=57)
    enc = Encoder(p)
    assert enc.me_fine == 8
    assert enc.me_coarse == 12
    assert enc.me_range == 56          # total reach never exceeds merange
    p8 = Params(source_width=64, source_height=64, me_range=8)
    enc8 = Encoder(p8)
    assert enc8.me_coarse == 0 and enc8.me_range == 8


@pytest.mark.parametrize("shift", [12, 20])
def test_long_motion_found_and_decodes(shift):
    w, h = 96, 64
    y0 = _textured(w, h)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = u.copy()
    y1 = np.roll(y0, shift, axis=1)
    p = Params(source_width=w, source_height=h, qp=30, bframes=0,
               aq_mode=0, cu_tree=False, decoded_picture_hash=1,
               me_range=57)
    enc = Encoder(p)
    stream = enc.headers()
    efs = enc.push_frame((y0, u, v))
    efs += enc.push_frame((y1, u, v))
    efs += enc.flush()
    for ef in efs:
        stream += ef.au
    sizes = {ef.kind: len(ef.au) for ef in efs}
    # the rolled frame is pure translation: with the motion found, the P
    # frame must cost far less than the I frame (merange 8 cannot reach it)
    assert sizes["P"] < sizes["I"] // 3
    outs = decode_annexb(stream)       # raises on hash mismatch
    assert len(outs) == 2
