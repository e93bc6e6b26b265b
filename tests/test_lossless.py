"""Lossless coding: transquant bypass (x265 --lossless; §8.6.6,
quant.cpp lossless bypass; BASELINE.md 'lossless bit-exact')."""

import numpy as np

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import encode_sequence


def test_lossless_bit_exact_roundtrip():
    rng = np.random.RandomState(5)
    h, w = 48, 64
    frames = []
    for _ in range(2):
        frames.append((rng.randint(0, 256, (h, w)).astype(np.uint8),
                       rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
                       rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)))
    p = Params(source_width=w, source_height=h, lossless=True,
               decoded_picture_hash=1, log_level=0)
    stream, recons = encode_sequence(frames, p)
    # encoder recon is the source, bit-exact
    for fr, rec in zip(frames, recons):
        for a, b in zip(fr, rec):
            assert np.array_equal(a, np.asarray(b, a.dtype))
    pics = decode_annexb(stream)
    assert len(pics) == 2
    for fr, pic in zip(frames, pics):
        assert pic.hash_ok
        for a, b in zip(fr, pic.planes):
            assert np.array_equal(a, np.asarray(b, a.dtype)), \
                "decode must be bit-exact"


def test_lossless_smooth_content_compresses():
    h, w = 64, 64
    y = np.add.outer(np.arange(h), np.arange(w)).astype(np.uint8)
    fr = [(y, np.full((h // 2, w // 2), 128, np.uint8),
           np.full((h // 2, w // 2), 128, np.uint8))]
    p = Params(source_width=w, source_height=h, lossless=True, log_level=0)
    stream, _ = encode_sequence(fr, p)
    raw = h * w * 3 // 2
    assert len(stream) < raw, f"smooth gradient should compress: " \
        f"{len(stream)} vs raw {raw}"
