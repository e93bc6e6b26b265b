"""IPPP closed-loop conformance: encoder recon == own decoder output ==
libde265 oracle, with picture-hash SEIs, across content types that exercise
skip / merge / AMVP+MVD / intra-in-P decisions."""

import os
import subprocess

import numpy as np
import pytest

import conftest  # noqa: F401
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".oracle", "build", "dec265", "dec265")


def make_clip(kind, w, h, n_frames, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 70 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
            + 30 * np.sin((xx + 2 * yy) / 37.0))
    frames = []
    for t in range(n_frames):
        if kind == "pan":
            y = np.roll(base, 2 * t, axis=1) + rng.randint(-2, 3, (h, w))
        elif kind == "static":
            y = base + 0
        elif kind == "noise":
            y = rng.randint(0, 256, (h, w))
        else:  # "mixed": moving half, noisy half
            y = np.roll(base, 3 * t, axis=0)
            y[:, w // 2:] = rng.randint(0, 256, (h, w // 2))
        u = np.full((h // 2, w // 2), 90 + t, np.uint8)
        v = ((xx[::2, ::2] + 40 * t) % 256).astype(np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return frames


def roundtrip(frames, w, h, qp, **kw):
    p = Params(bframes=0, source_width=w, source_height=h, qp=qp,
               decoded_picture_hash=1, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    recs = []
    for fr in frames:
        au, rec = enc.encode_frame(fr)
        stream += au
        recs.append(rec)
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    for i, (rec, pic) in enumerate(zip(recs, pics)):
        assert pic.hash_ok is True, f"hash mismatch frame {i}"
        for a, b in zip(rec, pic.planes):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    return stream, recs


@pytest.mark.parametrize("kind", ["pan", "static", "noise", "mixed"])
def test_ippp_roundtrip(kind):
    frames = make_clip(kind, 96, 64, 3, seed=7)
    roundtrip(frames, 96, 64, qp=30)


@pytest.mark.parametrize("qp", [18, 37])
def test_ippp_qps(qp):
    frames = make_clip("mixed", 64, 64, 3, seed=qp)
    roundtrip(frames, 64, 64, qp=qp)


def test_keyint_refresh():
    frames = make_clip("pan", 64, 64, 4, seed=2)
    stream, _ = roundtrip(frames, 64, 64, qp=30, keyint_max=2)
    # frames 0 and 2 must be IDR (nal 19), 1 and 3 P (nal 1)
    from x265_tpu.common.bitstream import split_annexb
    vcl = [t for t, _tid, _ in split_annexb(stream) if t < 32]
    assert vcl == [19, 1, 19, 1]


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="libde265 oracle not built")
@pytest.mark.parametrize("kind", ["pan", "mixed"])
def test_ippp_oracle(tmp_path, kind):
    frames = make_clip(kind, 96, 64, 4, seed=11)
    stream, recs = roundtrip(frames, 96, 64, qp=28)
    bs = tmp_path / "p.265"
    out = tmp_path / "p.yuv"
    bs.write_bytes(stream)
    r = subprocess.run([ORACLE, "-c", "-o", str(out), str(bs)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    raw = np.fromfile(out, np.uint8)
    expect = np.concatenate([np.concatenate(
        [pl.astype(np.uint8).ravel() for pl in rec]) for rec in recs])
    np.testing.assert_array_equal(raw, expect)


@pytest.mark.parametrize("ctu", [32, 64])
def test_ippp_ctu_sizes(ctu):
    frames = make_clip("pan", 96, 64, 3, seed=5)
    roundtrip(frames, 96, 64, qp=30, ctu_size=ctu)


def test_scenecut_inserts_idr():
    # frame 2 is a completely different scene -> should become an IDR
    rng = np.random.RandomState(9)
    a = make_clip("pan", 64, 64, 2, seed=1)
    b = make_clip("noise", 64, 64, 2, seed=2)
    frames = a + b
    # min-keyint now auto-derives to x265's min(fps, keyint/10) (= 25
    # here), which correctly suppresses an IDR this early; request the
    # short minimum explicitly to exercise the scenecut path
    stream, _ = roundtrip(frames, 64, 64, qp=30, keyint_min=2)
    from x265_tpu.common.bitstream import split_annexb
    vcl = [t for t, _tid, _ in split_annexb(stream) if t < 32]
    assert vcl[0] == 19 and vcl[2] == 19, vcl   # IDR at the scene change
    assert vcl[1] == 1 and vcl[3] == 1, vcl
