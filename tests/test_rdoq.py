"""RDOQ — batched rate-distortion optimized quantization
(x265 quant.cpp:551 rdoQuant re-designed as candidate+last-pos passes)."""

import numpy as np
import pytest

from x265_tpu.common.params import Params, default_params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import encode_sequence


def test_rdoq_levels_bounded_by_nearest():
    import jax.numpy as jnp

    from x265_tpu.ops.quantize import quant, rdoq
    from x265_tpu.ops.transforms import forward_transform

    rng = np.random.default_rng(2)
    x = np.cumsum(rng.normal(0, 6, (16, 16, 16)), axis=2).astype(np.int32)
    coef = forward_transform(jnp.asarray(x), 8, dst=False)
    for qp in (22, 32, 42):
        lr = np.asarray(rdoq(coef, qp, 8))
        lq = np.asarray(quant(coef, qp, 8, intra=True))
        # RDOQ may only lower magnitudes vs round-nearest, never invert
        # the sign, and at most one level above the deadzone quantizer
        assert np.all(np.abs(lr) <= np.abs(lq) + 1)
        assert np.all((lr == 0) | (np.sign(lr) == np.sign(coef)))


def test_rdoq_improves_rd_on_smooth_blocks():
    import jax.numpy as jnp

    from x265_tpu.common.rdcost import lambda_ssd, level_bits_jnp
    from x265_tpu.ops.quantize import dequant, quant, rdoq
    from x265_tpu.ops.transforms import forward_transform, inverse_transform

    from x265_tpu.ops.quantize import _RDOQ_RATE_SCALE

    rng = np.random.default_rng(3)
    x = np.cumsum(rng.normal(0, 4, (64, 16, 16)), axis=2).astype(np.int32)
    coef = forward_transform(jnp.asarray(x), 8, dst=False)
    qp = 32

    def rd(lv):
        # the same (rate-damped) objective the kernel optimizes
        rec = inverse_transform(dequant(lv, qp, 8), 8, dst=False)
        ssd = float(jnp.sum((rec - x) ** 2.0))
        bits = float(jnp.sum(level_bits_jnp(lv)))
        return ssd + lambda_ssd(qp) * _RDOQ_RATE_SCALE * bits

    assert rd(rdoq(coef, qp, 8)) <= rd(quant(coef, qp, 8, intra=True))


def test_rdoq_stream_conformance():
    rng = np.random.RandomState(6)
    h, w = 48, 64
    base = np.clip(np.cumsum(rng.normal(0, 5, (h, w)), axis=1) + 128,
                   0, 255)
    frames = []
    for t in range(2):
        y = np.clip(np.roll(base, 3 * t, axis=1), 0, 255).astype(np.uint8)
        frames.append((y, np.full((h // 2, w // 2), 119, np.uint8),
                       np.full((h // 2, w // 2), 131, np.uint8)))
    p = Params(source_width=w, source_height=h, qp=30, bframes=0,
               rdoq_level=1, decoded_picture_hash=1, log_level=0,
               me_range=8)
    stream, _ = encode_sequence(frames, p)
    assert all(pic.hash_ok for pic in decode_annexb(stream))


def test_slow_preset_enables_rdoq():
    p = default_params("slow")
    assert p.rdoq_level == 2
    assert default_params("medium").rdoq_level == 0
