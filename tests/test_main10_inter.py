"""Main10 inter coding: 10-bit IPPP streams (was forced all-intra;
x265 Main10 profile, predict.cpp 16-bit MC paths)."""

import numpy as np

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import encode_sequence


def test_main10_ippp_roundtrip():
    rng = np.random.RandomState(4)
    h, w = 48, 64
    base = np.clip(np.cumsum(rng.normal(0, 20, (h, w)), axis=1) + 512,
                   0, 1023)
    frames = []
    for t in range(3):
        y = np.clip(np.roll(base, 2 * t, axis=1)
                    + rng.normal(0, 4, (h, w)), 0, 1023).astype(np.uint16)
        frames.append((y,
                       np.full((h // 2, w // 2), 480, np.uint16),
                       np.full((h // 2, w // 2), 540, np.uint16)))
    p = Params(source_width=w, source_height=h, qp=30, bframes=0,
               internal_bit_depth=10, decoded_picture_hash=1,
               log_level=0, me_range=8)
    stream, recons = encode_sequence(frames, p)
    pics = decode_annexb(stream)
    assert len(pics) == 3
    assert all(pic.hash_ok for pic in pics)
    # the stream must actually contain P slices (not silently all-intra)
    from x265_tpu.common.bitstream import split_annexb
    types = [t for t, _tid, _r in split_annexb(stream) if t < 32]
    assert any(t in (0, 1) for t in types), \
        f"expected TRAIL slices in {types}"


def test_main10_bframes_roundtrip():
    """10-bit B-pyramid mini-GOPs (the 8-bit-only gates were lifted in
    round 5; x265 main10 feature matrix, CMakeLists.txt:312)."""
    rng = np.random.RandomState(7)
    h, w = 48, 64
    base = np.clip(np.cumsum(rng.normal(0, 20, (h, w)), axis=1) + 512,
                   0, 1023)
    frames = []
    for t in range(6):
        y = np.clip(np.roll(base, 3 * t, axis=1)
                    + rng.normal(0, 4, (h, w)), 0, 1023).astype(np.uint16)
        frames.append((y,
                       np.full((h // 2, w // 2), 480, np.uint16),
                       np.full((h // 2, w // 2), 540, np.uint16)))
    p = Params(source_width=w, source_height=h, qp=30, bframes=2,
               internal_bit_depth=10, decoded_picture_hash=1,
               log_level=0, me_range=8)
    stream, recons = encode_sequence(frames, p)
    pics = decode_annexb(stream)
    assert len(pics) == 6
    assert all(pic.hash_ok for pic in pics)
