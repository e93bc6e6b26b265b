"""AQ (cu_qp_delta) + lookahead/cuTree tests.

Covers: per-CTB QP signaling round-trips (own decoder + libde265 oracle),
the §8.6.1 per-CU QP semantics under skips/merges, lookahead delayed
output, and native-vs-Python entropy equality with AQ active.
"""

import os
import subprocess

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".oracle", "build", "dec265", "dec265")


def structured_clip(w, h, n, seed=13, pan=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = (100 + 50 * np.sin((xx + pan * i) / 7.0) * np.cos(yy / 5.0)
             + rng.randint(-5, 5, (h, w))).clip(0, 255).astype(np.uint8)
        out.append((y, (y[::2, ::2] // 2 + 40).astype(np.uint8),
                    (y[::2, ::2] // 3 + 60).astype(np.uint8)))
    return out


def encode_all(enc, frames):
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    return efs


def test_aq_offsets_flat_vs_structured():
    from x265_tpu.encoder.aq import aq_offsets
    flat = (np.full((64, 96), 128, np.uint8),
            np.full((32, 48), 128, np.uint8),
            np.full((32, 48), 128, np.uint8))
    off = aq_offsets(flat, 2, 1.0, 8)
    # auto-variance on a flat frame: all energies equal -> offsets ~equal
    assert np.allclose(off, off.ravel()[0])
    frames = structured_clip(96, 64, 1)
    off2 = aq_offsets(frames[0], 2, 1.0, 8)
    assert off2.std() > 0.05         # structured content varies


@pytest.mark.parametrize("qp,bframes,la", [(30, 0, 4), (30, 2, 3),
                                           (20, 2, 3)])
def test_aq_lookahead_roundtrip(qp, bframes, la):
    """AQ + cuTree window: own decoder hash-exact on every frame."""
    frames = structured_clip(96, 64, 8)
    p = Params(source_width=96, source_height=64, qp=qp, bframes=bframes,
               decoded_picture_hash=1, rc_lookahead=la)
    enc = Encoder(p)
    assert enc._use_lookahead
    efs = encode_all(enc, frames)
    assert len(efs) == len(frames)
    stream = enc.headers() + b"".join(ef.au for ef in efs)
    pics = decode_annexb(stream)
    assert all(pic.hash_ok for pic in pics)
    assert enc.last_ps.cu_qp_delta_enabled


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="libde265 oracle not built")
def test_aq_lookahead_oracle(tmp_path):
    frames = structured_clip(96, 64, 8)
    p = Params(source_width=96, source_height=64, qp=30, bframes=2,
               decoded_picture_hash=1, rc_lookahead=3)
    enc = Encoder(p)
    efs = encode_all(enc, frames)
    stream = enc.headers() + b"".join(ef.au for ef in efs)
    bs = tmp_path / "aq.265"
    bs.write_bytes(stream)
    r = subprocess.run([ORACLE, "-c", "-o", os.devnull, str(bs)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr + r.stdout


def test_native_entropy_matches_python_with_aq():
    frames = structured_clip(96, 64, 5)
    p = Params(source_width=96, source_height=64, qp=28, bframes=0,
               decoded_picture_hash=1, rc_lookahead=3)
    enc_n = Encoder(p)
    aus_n = [ef.au for ef in encode_all(enc_n, frames)]
    enc_p = Encoder(p)
    enc_p.force_python_entropy = True
    aus_p = [ef.au for ef in encode_all(enc_p, frames)]
    assert aus_n == aus_p


def test_lookahead_delays_output():
    frames = structured_clip(96, 64, 6)
    p = Params(source_width=96, source_height=64, qp=30, bframes=0,
               decoded_picture_hash=1, rc_lookahead=4)
    enc = Encoder(p)
    emitted = [len(enc.push_frame(fr)) for fr in frames]
    # the first rc_lookahead pushes produce nothing (window fill)
    assert emitted[:4] == [0, 0, 0, 0]
    assert len(enc.flush()) == 6 - sum(emitted)


def test_zero_latency_path_disables_lookahead():
    frames = structured_clip(96, 64, 3)
    p = Params(source_width=96, source_height=64, qp=30, bframes=0,
               decoded_picture_hash=1)
    enc = Encoder(p)
    au, rec = enc.encode_frame(frames[0])     # x265 tune zerolatency shape
    assert enc.lookahead is None and not enc._use_lookahead
    au2, _ = enc.encode_frame(frames[1])
    assert au and au2
