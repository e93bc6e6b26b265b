"""Decoder robustness: RPS-driven DPB marking, missing-ref concealment,
graceful errors (libde265 decctx.cc:1429,1461 analogues)."""

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.decoder.decoder import Decoder, DecodeError
from x265_tpu.encoder import encode_sequence


def _frames(n, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        out.append((rng.randint(0, 256, (h, w)).astype(np.uint8),
                    rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
                    rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)))
    return out


@pytest.fixture(scope="module")
def ippp_stream():
    p = Params(source_width=64, source_height=48, qp=34, bframes=0,
               decoded_picture_hash=1, log_level=0, me_range=8)
    stream, _ = encode_sequence(_frames(4), p)
    return stream


def _split_aus(stream):
    """Split an Annex-B stream at long start codes of VCL/parameter NALs."""
    import re
    starts = [m.start() for m in re.finditer(b"\x00\x00\x00\x01", stream)]
    starts.append(len(stream))
    return [stream[starts[i]:starts[i + 1]] for i in range(len(starts) - 1)]


def test_missing_reference_concealed(ippp_stream):
    """Dropping a middle P frame must not crash: later frames conceal."""
    aus = _split_aus(ippp_stream)
    # drop the second VCL AU (first P) — keep headers + IDR + later Ps
    vcl = [i for i, au in enumerate(aus)
           if len(au) > 5 and (au[4] >> 1) < 32]
    assert len(vcl) >= 3
    broken = b"".join(au for i, au in enumerate(aus) if i != vcl[1])
    d = Decoder(check_hashes=True)
    d.push_bytes(broken)           # must not raise
    assert d.warnings and "concealed" in d.warnings[0]
    # the stream still yields pictures; the concealed-ref ones hash-fail
    assert len(d.pictures) == 3
    assert any(pic.hash_ok is False for pic in d.pictures)


def test_dpb_rps_marking(ippp_stream):
    d = Decoder()
    d.push_bytes(ippp_stream)
    # IPPP with --ref 3 (the default): the RPS retains up to 3 anchors;
    # the DPB must not grow past retained refs + current
    assert len(d._dpb) <= 4
    assert all(p.hash_ok for p in d.pictures)


def test_dpb_rps_marking_single_ref():
    p = Params(source_width=64, source_height=48, qp=34, bframes=0,
               decoded_picture_hash=1, log_level=0, me_range=8, ref=1)
    stream, _ = encode_sequence(_frames(4), p)
    d = Decoder()
    d.push_bytes(stream)
    # 1 active ref: only the last anchor stays in the DPB
    assert len(d._dpb) <= 2
    assert all(p.hash_ok for p in d.pictures)


def test_truncated_slice_raises_decode_error(ippp_stream):
    broken = ippp_stream[:len(ippp_stream) // 2]
    with pytest.raises(DecodeError):
        decode_annexb(broken)
