"""Multi-chip GOP-parallel encoding: the REAL encoder sharded over a
mesh (parallel/gop.py), validated on the virtual 8-device CPU mesh.

The reference's frame parallelism contract (x265.h:442-447): with CQP
the output is deterministic for any thread count — here the multi-device
stream must be BIT-EXACT with the single-device sequential encode.
"""

import numpy as np
import pytest

import jax


def _frames(n, w=96, h=64, seed=3):
    rng = np.random.RandomState(seed)
    base = (np.arange(h)[:, None] * 2 + np.arange(w)[None, :]
            + rng.randint(0, 17, (h, w))).astype(np.uint8)
    return [(np.roll(base, 2 * t, axis=1),
             np.full((h // 2, w // 2), 90 + 3 * t, np.uint8),
             np.full((h // 2, w // 2), 150, np.uint8))
            for t in range(n)]


def _params(w=96, h=64, **kw):
    from x265_tpu.common.params import Params
    kw.setdefault("scenecut_threshold", 0)
    return Params(source_width=w, source_height=h, qp=30, bframes=0,
                  aq_mode=0, cu_tree=False, decoded_picture_hash=3, **kw)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gop_parallel_bit_exact_vs_single_device():
    from x265_tpu.parallel.gop import encode_gop_parallel
    from x265_tpu.encoder import encode_sequence

    G, gop = 8, 2
    frames = _frames(G * gop)

    # sequential single-device reference: keyint == gop size
    stream_ref, _ = encode_sequence(frames, _params(keyint_max=gop))
    stream_par = encode_gop_parallel(frames, _params(keyint_max=gop))
    assert stream_par == stream_ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gop_parallel_stream_decodes():
    from x265_tpu.parallel.gop import encode_gop_parallel
    from x265_tpu.decoder import decode_annexb

    G, gop = 8, 2
    frames = _frames(G * gop)
    stream = encode_gop_parallel(frames, _params(keyint_max=gop))
    pics = decode_annexb(stream)
    assert len(pics) == G * gop
    assert all(p.hash_ok for p in pics)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gop_parallel_abr_per_gop_deterministic():
    """ABR multi-chip: each shard owns an independent RateControl; the
    contract is per-GOP determinism — every GOP's stream equals the
    sequential encode of that GOP alone with the same params (the
    frame-parallel ABR relaxation x265 documents, x265.h:442-447)."""
    from x265_tpu.common.params import Params
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.encoder import Encoder
    from x265_tpu.parallel.gop import GopParallelEncoder

    G, n = 8, 3
    w, h = 64, 48
    rng = np.random.RandomState(3)
    gops = []
    for k in range(G):
        base = rng.randint(0, 256, (h, w), np.uint8)
        gops.append([(np.roll(base, t + k, axis=1),
                      np.full((h // 2, w // 2), 128, np.uint8),
                      np.full((h // 2, w // 2), 128, np.uint8))
                     for t in range(n)])
    from x265_tpu.common.params import RC_ABR
    p = Params(source_width=w, source_height=h, bitrate=200, fps_num=25,
               rc_mode=RC_ABR, bframes=0, aq_mode=0, cu_tree=False,
               decoded_picture_hash=1, me_range=8)
    assert p.rc_mode != 0
    enc = GopParallelEncoder(p)
    streams = enc.encode(gops)

    for k in range(G):
        seq = Encoder(p)
        out = seq.headers()
        for fr in gops[k]:
            au, _ = seq.encode_frame(fr)
            out += au
        assert streams[k] == out, f"GOP {k} diverged from sequential"
    # and the concatenation must decode with hashes intact
    hdr = enc.encoders[0].headers()
    blob = hdr + b"".join(s[len(hdr):] for s in streams)
    pics = decode_annexb(blob)
    assert len(pics) == G * n
