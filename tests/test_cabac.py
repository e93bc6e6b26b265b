"""CABAC engine encode→decode roundtrip fuzzing."""

import random

import numpy as np

from x265_tpu.cabac.engine import CabacDecoder, CabacEncoder
from x265_tpu.cabac.tables import NUM_CTX, init_context_states
from x265_tpu.common.bitstream import BitReader, BitWriter


def _roundtrip(script, init_type=0, qp=32):
    """script: list of ops ('ctx', idx, bin) / ('ep', bin) / ('eg', val, k)."""
    ctx_e = init_context_states(init_type, qp).copy()
    bw = BitWriter()
    enc = CabacEncoder(bw, ctx_e)
    for op in script:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bypass(op[1])
        elif op[0] == "epb":
            enc.encode_bypass_bins(op[1], op[2])
        elif op[0] == "eg":
            enc.encode_eg_k(op[1], op[2])
    enc.encode_terminate(1)
    bw.rbsp_trailing_bits()
    data = bw.getvalue()

    ctx_d = init_context_states(init_type, qp).copy()
    dec = CabacDecoder(BitReader(data), ctx_d)
    out = []
    for op in script:
        if op[0] == "ctx":
            out.append(("ctx", op[1], dec.decode_bin(op[1])))
        elif op[0] == "ep":
            out.append(("ep", dec.decode_bypass()))
        elif op[0] == "epb":
            out.append(("epb", dec.decode_bypass_bins(op[2]), op[2]))
        elif op[0] == "eg":
            out.append(("eg", dec.decode_eg_k(op[2]), op[2]))
    assert dec.decode_terminate() == 1
    assert out == script
    # context state must evolve identically on both sides
    np.testing.assert_array_equal(ctx_e, ctx_d)
    return data


def test_context_init_known_state():
    # init is deterministic and within packing bounds
    for t in range(3):
        for qp in (0, 26, 37, 51):
            st = init_context_states(t, qp)
            assert st.shape == (NUM_CTX,)
            assert (st >> 1).max() <= 62


def test_roundtrip_simple():
    _roundtrip([("ctx", 0, 1), ("ctx", 0, 0), ("ep", 1), ("ep", 0),
                ("eg", 77, 0), ("eg", 0, 3), ("epb", 5, 3)])


def test_roundtrip_all_contexts():
    script = []
    for i in range(NUM_CTX):
        script.append(("ctx", i, i & 1))
        script.append(("ctx", i, (i >> 1) & 1))
    _roundtrip(script, init_type=1, qp=26)


def test_roundtrip_fuzz():
    rng = random.Random(1234)
    for trial in range(30):
        script = []
        for _ in range(rng.randrange(1, 800)):
            r = rng.random()
            if r < 0.55:
                script.append(("ctx", rng.randrange(NUM_CTX), rng.randrange(2)))
            elif r < 0.8:
                script.append(("ep", rng.randrange(2)))
            elif r < 0.9:
                n = rng.randrange(1, 16)
                script.append(("epb", rng.randrange(1 << n), n))
            else:
                script.append(("eg", rng.randrange(0, 5000), rng.randrange(0, 5)))
        _roundtrip(script, init_type=rng.randrange(3), qp=rng.randrange(0, 52))


def test_roundtrip_skewed_bins():
    # long runs of the same bin exercise renormalization + bitsOutstanding
    for b in (0, 1):
        _roundtrip([("ctx", 5, b)] * 2000)
        _roundtrip([("ep", b)] * 2000)


def test_stream_has_no_start_code_before_escaping():
    # raw CABAC payload may contain 00 00 0x; NAL wrapper must escape it —
    # just verify we can generate such payloads and the wrapper handles them.
    from x265_tpu.common.bitstream import add_emulation_prevention, remove_emulation_prevention
    data = _roundtrip([("ep", 0)] * 500)
    assert remove_emulation_prevention(add_emulation_prevention(data)) == data
