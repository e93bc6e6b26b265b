"""The native C slice encoder must produce byte-identical output to the
Python CABAC/syntax path (same contract as the reference testbench's
asm-vs-C checks, SURVEY.md §4.1, applied to the entropy stage)."""

import numpy as np
import pytest

import conftest  # noqa: F401
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder
from x265_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no native toolchain")


def frames_for(kind, w, h, seed=0):
    rng = np.random.RandomState(seed)
    if kind == "random":
        y = rng.randint(0, 256, (h, w), np.uint8)
        u = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
        v = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + 90 * np.sin(xx / 13.0) * np.cos(yy / 7.0)
             ).clip(0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] * 3) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] * 5) % 256).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("kind", ["random", "structured"])
@pytest.mark.parametrize("qp", [14, 30, 45])
def test_native_matches_python(kind, qp):
    w, h = 96, 64
    frame = frames_for(kind, w, h, seed=qp)
    p = Params(bframes=0, source_width=w, source_height=h, qp=qp,
               decoded_picture_hash=1)

    enc_n = Encoder(p)
    au_n, _ = enc_n.encode_frame(frame)

    enc_p = Encoder(p)
    enc_p.force_python_entropy = True
    au_p, _ = enc_p.encode_frame(frame)

    assert au_n == au_p


def test_native_stream_decodes():
    w, h = 64, 64
    frame = frames_for("random", w, h, seed=1)
    p = Params(bframes=0, source_width=w, source_height=h, qp=26,
               decoded_picture_hash=1)
    enc = Encoder(p)
    stream = enc.headers()
    au, rec = enc.encode_frame(frame)
    pics = decode_annexb(stream + au)
    assert pics[0].hash_ok is True


def test_native_matches_python_p_slices():
    from test_inter import make_clip
    w, h = 96, 64
    frames = make_clip("mixed", w, h, 3, seed=4)
    p = Params(bframes=0, source_width=w, source_height=h, qp=27,
               decoded_picture_hash=1)
    enc_n = Encoder(p)
    aus_n = [enc_n.encode_frame(fr)[0] for fr in frames]
    enc_p = Encoder(p)
    enc_p.force_python_entropy = True
    aus_p = [enc_p.encode_frame(fr)[0] for fr in frames]
    assert aus_n == aus_p


def _encode_all(enc, frames):
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    return [ef.au for ef in efs]


def test_native_matches_python_b_slices():
    from test_inter import make_clip
    w, h = 96, 64
    frames = make_clip("mixed", w, h, 5, seed=7)
    p = Params(bframes=2, source_width=w, source_height=h, qp=27,
               decoded_picture_hash=1)
    enc_n = Encoder(p)
    aus_n = _encode_all(enc_n, frames)
    enc_p = Encoder(p)
    enc_p.force_python_entropy = True
    aus_p = _encode_all(enc_p, frames)
    assert aus_n == aus_p


@pytest.mark.parametrize("bframes", [0, 2])
def test_native_derivation_matches_python(bframes):
    """The C merge/AMVP/skip derivation must fill PicSyntax identically
    to the Python normative loops (common/motion.py)."""
    from test_inter import make_clip
    w, h = 96, 64
    frames = make_clip("mixed", w, h, 5, seed=11)
    p = Params(bframes=bframes, source_width=w, source_height=h, qp=30,
               decoded_picture_hash=1)
    enc_n = Encoder(p)
    aus_n = _encode_all(enc_n, frames)
    enc_p = Encoder(p)
    enc_p.force_python_derivation = True
    aus_p = _encode_all(enc_p, frames)
    assert aus_n == aus_p
