"""Closed-loop conformance tests: encode -> decode (own decoder) -> compare
recon + decoded-picture-hash; plus external libde265 oracle when available.

This is the TPU build's version of the reference's golden-bitstream +
decoder-validation strategy (SURVEY.md §4.2/§4.4): CQP intra encodes are
deterministic, so encoder recon must equal decoder output bit-exactly.
"""

import os
import subprocess

import numpy as np
import pytest

import conftest  # noqa: F401  (sets JAX_PLATFORMS before jax import)
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".oracle", "build", "dec265", "dec265")


def make_frame(w, h, kind, seed=0):
    rng = np.random.RandomState(seed)
    if kind == "random":
        y = rng.randint(0, 256, (h, w), np.uint8)
    elif kind == "gradient":
        y = ((np.arange(h)[:, None] * 2 + np.arange(w)[None, :] * 3) % 256
             ).astype(np.uint8)
    else:  # "natural": smooth blobs + noise
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
             + rng.randint(-8, 8, (h, w))).clip(0, 255).astype(np.uint8)
    u = (rng.randint(0, 256, (h // 2, w // 2))
         if kind == "random" else np.full((h // 2, w // 2), 100)
         ).astype(np.uint8)
    v = (rng.randint(0, 256, (h // 2, w // 2))
         if kind == "random" else np.full((h // 2, w // 2), 160)
         ).astype(np.uint8)
    return y, u, v


def encode_one(frame, w, h, qp=30, **kw):
    p = Params(bframes=0, source_width=w, source_height=h, qp=qp,
               decoded_picture_hash=1, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    au, rec = enc.encode_frame(frame)
    return stream + au, rec


@pytest.mark.parametrize("kind", ["gradient", "natural", "random"])
@pytest.mark.parametrize("qp", [18, 30, 45])
def test_roundtrip_64x64(kind, qp):
    frame = make_frame(64, 64, kind)
    stream, rec = encode_one(frame, 64, 64, qp=qp)
    pics = decode_annexb(stream)
    assert len(pics) == 1
    assert pics[0].hash_ok is True
    for a, b in zip(rec, pics[0].planes):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ctu", [16, 32, 64])
def test_roundtrip_ctu_sizes(ctu):
    frame = make_frame(96, 64, "natural")
    stream, rec = encode_one(frame, 96, 64, qp=28, ctu_size=ctu)
    pics = decode_annexb(stream)
    assert pics[0].hash_ok is True
    for a, b in zip(rec, pics[0].planes):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_nonaligned_size():
    # 72x52 -> coded 72x56 with a conformance window
    frame = make_frame(72, 52, "natural")
    stream, rec = encode_one(frame, 72, 52, qp=30)
    pics = decode_annexb(stream)
    assert pics[0].hash_ok is True
    assert pics[0].planes[0].shape == (52, 72)
    for a, b in zip(rec, pics[0].planes):
        np.testing.assert_array_equal(a, b)


def test_psnr_sane():
    frame = make_frame(128, 96, "natural", seed=3)
    stream, rec = encode_one(frame, 128, 96, qp=22)
    mse = np.mean((rec[0].astype(np.float64) - frame[0]) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 35.0, f"luma PSNR too low: {psnr:.2f} dB"


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="libde265 oracle not built")
@pytest.mark.parametrize("wh", [(64, 64), (96, 48)])
def test_oracle_decode(tmp_path, wh):
    w, h = wh
    frame = make_frame(w, h, "natural", seed=5)
    stream, rec = encode_one(frame, w, h, qp=27)
    bs = tmp_path / "test.265"
    out = tmp_path / "out.yuv"
    bs.write_bytes(stream)
    r = subprocess.run([ORACLE, "-q", "-c", "-o", str(out), str(bs)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr + r.stdout
    assert "WRONG MD5" not in r.stdout and "hash mismatch" not in r.stdout
    raw = np.fromfile(out, np.uint8)
    expect = np.concatenate([p.astype(np.uint8).ravel() for p in rec])
    np.testing.assert_array_equal(raw, expect)


def test_main10_roundtrip():
    """10-bit (Main10) intra: own decoder + hash; oracle verified via its
    -c MD5 check (dec265's raw 16-bit *writer* has a stride bug, so byte
    comparison of its output is not meaningful)."""
    rng = np.random.RandomState(5)
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = (500 + 300 * np.sin(xx / 15.0) * np.cos(yy / 9.0)
         + rng.randint(-20, 20, (h, w))).clip(0, 1023).astype(np.uint16)
    u = (512 + 100 * np.sin(xx[::2, ::2] / 21.0)).astype(np.uint16)
    v = np.full((h // 2, w // 2), 300, np.uint16)
    p = Params(bframes=0, source_width=w, source_height=h, qp=30,
               decoded_picture_hash=1, internal_bit_depth=10)
    enc = Encoder(p)
    stream = enc.headers()
    au, rec = enc.encode_frame((y, u, v))
    stream += au
    pics = decode_annexb(stream)
    assert pics[0].hash_ok is True
    for a, b in zip(rec, pics[0].planes):
        np.testing.assert_array_equal(a, b)
    mse = np.mean((rec[0].astype(np.float64) - y) ** 2)
    assert 10 * np.log10(1023.0 ** 2 / mse) > 34.0
    if os.path.exists(ORACLE):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".265") as f:
            f.write(stream)
            f.flush()
            r = subprocess.run([ORACLE, "-c", "-o", "/dev/null", f.name],
                               capture_output=True, text=True, timeout=120)
            assert r.returncode == 0, r.stdout + r.stderr
