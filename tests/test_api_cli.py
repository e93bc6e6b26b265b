"""x265-style procedural API + CLI smoke tests."""

import subprocess
import sys

import numpy as np

import conftest  # noqa: F401
from x265_tpu import api
from x265_tpu.decoder import decode_annexb
from x265_tpu.io import write_y4m


def test_procedural_api_roundtrip():
    p = api.x265_param_default_preset("medium")
    api.x265_param_parse(p, "qp", "30")
    api.x265_param_parse(p, "hash", "md5")
    p.source_width, p.source_height = 64, 64
    enc = api.x265_encoder_open(p)
    stream = api.x265_encoder_headers(enc)
    rng = np.random.RandomState(0)
    fr = (rng.randint(0, 256, (64, 64), np.uint8),
          rng.randint(0, 256, (32, 32), np.uint8),
          rng.randint(0, 256, (32, 32), np.uint8))
    au, rec = api.x265_encoder_encode(enc, fr)
    stream += au
    # the lookahead may buffer (x265.h:1334 delayed-output contract):
    # flush with pic_in == NULL until the AU arrives
    while not au:
        au, rec = api.x265_encoder_encode(enc, None)
        stream += au
    assert decode_annexb(stream)[0].hash_ok is True
    st = api.x265_encoder_get_stats(enc)
    assert st.encoded_picture_count == 1 and st.accumulated_bits > 0
    api.x265_encoder_close(enc)


def test_cli_smoke(tmp_path):
    rng = np.random.RandomState(1)
    frames = [(rng.randint(0, 256, (48, 64), np.uint8),
               rng.randint(0, 256, (24, 32), np.uint8),
               rng.randint(0, 256, (24, 32), np.uint8)) for _ in range(2)]
    inp = tmp_path / "in.y4m"
    out = tmp_path / "out.265"
    csv = tmp_path / "log.csv"
    write_y4m(str(inp), frames, 64, 48)
    r = subprocess.run(
        [sys.executable, "-m", "x265_tpu.cli", str(inp), "-o", str(out),
         "--qp", "34", "--hash", "md5", "--csv", str(csv), "--no-progress"],
        capture_output=True, text=True, timeout=560,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    pics = decode_annexb(out.read_bytes())
    assert len(pics) == 2 and all(p.hash_ok for p in pics)
    assert csv.read_text().count("\n") == 3   # header + 2 frames


def test_decoder_graceful_errors():
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.decoder.decoder import DecodeError
    import pytest as _pytest
    with _pytest.raises(DecodeError):
        decode_annexb(b"\x00\x00\x01\x40\x01garbagegarbage" * 3)
    assert decode_annexb(b"") == []


def test_repeat_headers_mid_stream_join():
    from x265_tpu.common.params import Params
    from x265_tpu.encoder import Encoder
    rng = np.random.RandomState(4)
    frames = [(rng.randint(0, 256, (64, 64), np.uint8),
               rng.randint(0, 256, (32, 32), np.uint8),
               rng.randint(0, 256, (32, 32), np.uint8)) for _ in range(4)]
    p = Params(bframes=0, source_width=64, source_height=64, qp=33, keyint_max=2,
               repeat_headers=True, decoded_picture_hash=1,
               scenecut_threshold=0)
    enc = Encoder(p)
    aus = [enc.encode_frame(fr)[0] for fr in frames]
    # join at the second IDR (frame 2) WITHOUT the leading stream headers
    joined = aus[2] + aus[3]
    pics = decode_annexb(joined)
    assert len(pics) == 2 and all(pic.hash_ok for pic in pics)
