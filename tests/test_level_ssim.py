"""Level determination (level.cpp:63), SSIM kernel, param warnings."""

import numpy as np
import pytest

from x265_tpu.common.level import determine_level, enforce_level
from x265_tpu.common.params import Params, unsupported_param_warnings
from x265_tpu.ops.ssim import ssim_db, ssim_plane_jnp, ssim_plane_np


def test_determine_level_common_formats():
    assert determine_level(1920, 1088, 30, 1)[0] == 120      # 4.0
    assert determine_level(1920, 1088, 60, 1)[0] == 123      # 4.1
    assert determine_level(3840, 2160, 30, 1)[0] == 150      # 5.0
    assert determine_level(3840, 2160, 60, 1)[0] == 153      # 5.1
    assert determine_level(352, 288, 30, 1)[0] == 60         # 2.0
    assert determine_level(64, 64, 15, 1)[0] == 30           # 1.0


def test_determine_level_bitrate_and_tier():
    # 1080p30 at 15 Mbps exceeds 4.0 main (12000) -> high tier 4.0
    idc, tier = determine_level(1920, 1088, 30, 1, bitrate_kbps=15000)
    assert (idc, tier) == (120, 1)
    # explicit request is honored upward
    idc, tier = determine_level(1280, 720, 30, 1, requested_idc=150)
    assert idc == 150
    with pytest.raises(ValueError):
        determine_level(35651584 // 4096 * 4096, 8192, 120, 1)


def test_enforce_level_clamps_bitrate():
    p = Params(source_width=1920, source_height=1080, bitrate=99999)
    msgs = enforce_level(p, 120)
    assert msgs and p.bitrate == 12000


def test_ssim_identical_and_noisy():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (72, 96)).astype(np.uint8)
    assert ssim_plane_np(a, a) == pytest.approx(1.0, abs=1e-9)
    b = np.clip(a.astype(np.int32)
                + rng.integers(-8, 9, a.shape), 0, 255).astype(np.uint8)
    s = ssim_plane_np(a, b)
    assert 0.2 < s < 1.0
    # device variant matches the numpy oracle closely
    import jax.numpy as jnp
    sj = float(ssim_plane_jnp(jnp.asarray(a), jnp.asarray(b)))
    assert sj == pytest.approx(s, abs=2e-4)
    assert ssim_db(0.99) == pytest.approx(20.0, abs=1e-6)


def test_unsupported_param_warnings():
    # library defaults are silently coerced (param.cpp behavior): a
    # default-config encoder prints NO warnings
    p = Params(source_width=64, source_height=64)
    assert unsupported_param_warnings(p) == []
    # explicit USER overrides of unimplemented tools warn
    q = Params(source_width=64, source_height=64,
               rect=True, tskip=True)
    msgs = unsupported_param_warnings(q)
    assert any("rect" in m for m in msgs)
    assert any("tskip" in m for m in msgs)
