"""DCT-domain noise reduction (x265 --nr-intra/--nr-inter;
quant.cpp:205 denoiseDct + frameencoder.cpp:1331 noiseReductionUpdate):
running |DCT coef| averages drive per-position offsets subtracted
before quantization — non-normative (streams stay conformant)."""

import numpy as np

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder


def _noisy_clip(n=6, h=64, w=96, seed=3):
    rng = np.random.RandomState(seed)
    base = (128 + 40 * np.sin(np.arange(h) / 5.0))[:, None] * np.ones(w)
    out = []
    for t in range(n):
        y = np.clip(np.roll(base, t, 1) + rng.normal(0, 6, (h, w)),
                    0, 255).astype(np.uint8)
        out.append((y, np.full((h // 2, w // 2), 128, np.uint8),
                    np.full((h // 2, w // 2), 128, np.uint8)))
    return out


def _encode(frames, **kw):
    p = Params(source_width=96, source_height=64, qp=30, bframes=0,
               aq_mode=0, cu_tree=False, decoded_picture_hash=1,
               log_level=0, me_range=8, ref=1, weightp=False, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    for ef in efs:
        stream += ef.au
    return stream, enc


def test_nr_reduces_bits_and_decodes():
    frames = _noisy_clip()
    s0, _ = _encode(frames)
    s1, enc = _encode(frames, noise_reduction_inter=600,
                      noise_reduction_intra=600)
    assert len(s1) < len(s0), (len(s1), len(s0))
    # offsets actually learned something (non-zero after a few frames)
    assert any(v.any() for v in enc._nr_offsets.values())
    # DC never denoised
    assert all(v[0] == 0 for v in enc._nr_offsets.values())
    pics = decode_annexb(s1)
    assert len(pics) == len(frames)
    assert all(p.hash_ok for p in pics)


def test_nr_off_is_bit_identical_to_before():
    frames = _noisy_clip(n=3)
    s0, enc = _encode(frames)
    assert not enc._nr_enabled
    pics = decode_annexb(s0)
    assert all(p.hash_ok for p in pics)
