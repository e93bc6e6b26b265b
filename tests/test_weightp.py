"""Weighted prediction (x265 --weightp; weightPrediction.cpp:222,
predict.cpp addWeightUni, entropy.cpp:1088 codePredWeightTable)."""

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import encode_sequence
from x265_tpu.encoder.weights import analyse_luma_weight


def test_analyse_luma_weight_fade():
    rng = np.random.default_rng(1)
    ref = np.clip(rng.normal(128, 30, (64, 96)), 0, 255).astype(np.uint8)
    # global fade to 70% brightness
    cur = np.clip(ref.astype(np.float64) * 0.7, 0, 255).astype(np.uint8)
    w, o, on = analyse_luma_weight(cur, ref)
    assert on
    assert 40 <= w <= 50            # 0.7 * 64 ~= 45
    # static content: no weight
    w, o, on = analyse_luma_weight(ref, ref)
    assert (w, o, on) == (64, 0, False)


def _fade_frames(n=4, h=64, w=96, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(np.cumsum(rng.normal(0, 6, (h, w)), axis=1) + 128,
                   0, 255)
    out = []
    for t in range(n):
        g = 1.0 - 0.18 * t            # strong linear fade
        y = np.clip(base * g, 0, 255).astype(np.uint8)
        out.append((y, np.full((h // 2, w // 2), 119, np.uint8),
                    np.full((h // 2, w // 2), 131, np.uint8)))
    return out


@pytest.mark.parametrize("wp", [False, True])
def test_weightp_stream_decodes(wp):
    frames = _fade_frames()
    p = Params(source_width=96, source_height=64, qp=30, bframes=0,
               decoded_picture_hash=1, weightp=wp, log_level=0,
               me_range=8)
    stream, recons = encode_sequence(frames, p)
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    assert all(pic.hash_ok for pic in pics)
    globals().setdefault("_SIZES", {})[wp] = len(stream)


def test_weightp_saves_bits_on_fade():
    sizes = globals().get("_SIZES", {})
    if len(sizes) < 2:
        pytest.skip("parametrized runs incomplete")
    assert sizes[True] < sizes[False], \
        f"weightp should shrink fades: {sizes}"
