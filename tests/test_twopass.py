"""2-pass rate control (ratecontrol.cpp:824 initPass2, :2474 stats)."""

import numpy as np
import pytest

from x265_tpu.common.params import Params, param_parse
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import encode_sequence


def _frames(n=6, h=48, w=64):
    rng = np.random.RandomState(9)
    base = np.clip(np.cumsum(rng.normal(0, 5, (h, w)), axis=1) + 128,
                   0, 255)
    out = []
    for t in range(n):
        y = np.clip(np.roll(base, 3 * t, axis=1)
                    + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
        out.append((y, np.full((h // 2, w // 2), 119, np.uint8),
                    np.full((h // 2, w // 2), 131, np.uint8)))
    return out


def test_two_pass_hits_target(tmp_path):
    frames = _frames()
    stats = str(tmp_path / "2pass.log")
    kbps = 220
    common = dict(source_width=64, source_height=48, bframes=0,
                  rc_mode=2, bitrate=kbps, fps_num=10, fps_denom=1,
                  decoded_picture_hash=1, log_level=0, me_range=8,
                  stats_file=stats)
    p1 = Params(stats_pass=1, **common)
    s1, _ = encode_sequence(frames, p1)
    lines = open(stats).read().strip().splitlines()
    assert len(lines) == len(frames)
    assert all("type:" in ln and "bits:" in ln for ln in lines)

    p2 = Params(stats_pass=2, **common)
    s2, _ = encode_sequence(frames, p2)
    assert all(pic.hash_ok for pic in decode_annexb(s2))
    target_bits = kbps * 1000 / 10 * len(frames)
    got = len(s2) * 8
    # pass 2 should land within 40% of target on this tiny clip, and
    # closer to target than pass 1 (or at least comparable)
    assert 0.6 * target_bits < got < 1.4 * target_bits, \
        f"pass2 {got} vs target {target_bits}"


def test_pass_parse_aliases():
    p = Params(source_width=64, source_height=48)
    param_parse(p, "pass", "2")
    param_parse(p, "stats", "foo.log")
    assert p.stats_pass == 2 and p.stats_file == "foo.log"


def test_pass2_missing_stats_raises(tmp_path):
    from x265_tpu.encoder.ratecontrol import RateControl
    p = Params(source_width=64, source_height=48, stats_pass=2,
               rc_mode=2, bitrate=100,
               stats_file=str(tmp_path / "absent.log"))
    with pytest.raises(ValueError):
        RateControl(p)
