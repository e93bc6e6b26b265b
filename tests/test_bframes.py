"""B-frame closed-loop conformance: mini-GOP (IbbP) streams must decode
bit-exact in our own decoder AND the libde265 oracle, in display order,
with picture-hash SEIs verified.

Covers: bi-prediction (14-bit intermediate averaging, §8.5.3.3.3),
two-list merge/AMVP derivation (§8.5.3.2), B-slice CABAC (inter_pred_idc,
ref/mvd/mvp per list), RPS with both s0 and s1 sets (§7.4.8), POC
reordering / output bumping (C.5.2.2).

Reference roles: x265 slicetype GOP assembly (slicetype.cpp:859),
checkBidir2Nx2N (search.cpp:2013); libde265 dpb.cc reorder buffer.
"""

import os
import subprocess

import numpy as np
import pytest

import conftest  # noqa: F401
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder
from x265_tpu.encoder.intra_encoder import encode_sequence

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
        else:  # "fade": global luma ramp (bi-prediction shines here)
            y = base + 4 * t
        u = np.full((h // 2, w // 2), 90 + t, np.uint8)
        v = ((xx[::2, ::2] + 40 * t) % 256).astype(np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return frames


def b_roundtrip(frames, w, h, qp, **kw):
    """Encode with B frames; assert own-decoder display-order bit-exactness
    + hash SEIs; return (stream, display-order recons, encode kinds).

    b-adapt is pinned off: these suites assert the FIXED mini-GOP
    machinery; adaptive placement is covered by tests/test_badapt.py."""
    kw.setdefault("b_adapt", 0)
    p = Params(source_width=w, source_height=h, qp=qp,
               decoded_picture_hash=1, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    for ef in efs:
        stream += ef.au
    recs = [ef.recon for ef in sorted(efs, key=lambda e: e.display_idx)]
    pics = decode_annexb(stream)
    assert len(pics) == len(frames)
    for i, (rec, pic) in enumerate(zip(recs, pics)):
        assert pic.hash_ok is True, f"hash mismatch frame {i}"
        for a, b in zip(rec, pic.planes):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    return stream, recs, [ef.kind for ef in efs]


@pytest.mark.parametrize("kind", ["pan", "static", "fade"])
def test_bframe_roundtrip(kind):
    frames = make_clip(kind, 64, 64, 9, seed=3)
    _, _, kinds = b_roundtrip(frames, 64, 64, 30, bframes=3,
                              keyint_max=250)
    assert kinds == ["I", "P", "B", "B", "B", "P", "B", "B", "B"]


def test_bframe_gop_patterns():
    # bframes=1 -> IbPbPb...; partial tail minigop at flush
    frames = make_clip("pan", 64, 64, 6, seed=5)
    _, _, kinds = b_roundtrip(frames, 64, 64, 32, bframes=1,
                              keyint_max=250)
    assert kinds == ["I", "P", "B", "P", "B", "P"]


def test_bframe_keyint_boundary():
    # keyint forces an IDR mid-stream; queued frames end their GOP first
    frames = make_clip("pan", 64, 64, 8, seed=6)
    _, _, kinds = b_roundtrip(frames, 64, 64, 30, bframes=2, keyint_max=4)
    assert kinds.count("I") == 2


def test_bframe_larger_picture():
    frames = make_clip("pan", 96, 64, 5, seed=7)
    b_roundtrip(frames, 96, 64, 31, bframes=2, keyint_max=250)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_bframe_oracle_display_order():
    """dec265 must decode the B stream and output display order matching
    our display-order recons bit-exactly (-c also verifies hash SEIs)."""
    w = h = 64
    frames = make_clip("fade", w, h, 9, seed=11)
    p = Params(source_width=w, source_height=h, qp=30, bframes=3,
               keyint_max=250, decoded_picture_hash=1)
    stream, recons = encode_sequence(frames, p)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        bs = os.path.join(td, "t.265")
        yuv = os.path.join(td, "t.yuv")
        open(bs, "wb").write(stream)
        r = subprocess.run([ORACLE, "-q", "-c", "-o", yuv, bs],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        raw = np.fromfile(yuv, np.uint8)
    fs = w * h * 3 // 2
    assert len(raw) == fs * len(frames)
    for i, rec in enumerate(recons):
        flat = np.concatenate([pl.astype(np.uint8).ravel() for pl in rec])
        np.testing.assert_array_equal(raw[i * fs:(i + 1) * fs], flat,
                                      err_msg=f"display frame {i}")


def test_bframes_actually_bipredict():
    """The fade clip must produce bi-predicted blocks (dir==3) in B
    frames — guards against the direction decision collapsing to uni."""
    frames = make_clip("fade", 64, 64, 5, seed=13)
    p = Params(source_width=64, source_height=64, qp=30, bframes=3,
               keyint_max=250)
    enc = Encoder(p)
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    # minigops encode the P anchor first, then the Bs — the final encode
    # is a B frame, so last_ps is a B picture's syntax
    assert efs[-1].kind == "B"
    assert (enc.last_ps.inter_dir == 3).any()
