"""Bitstream writer/reader, Exp-Golomb, NAL emulation prevention."""

import random

from x265_tpu.common.bitstream import (
    BitReader, BitWriter, add_emulation_prevention, remove_emulation_prevention,
    split_annexb, wrap_nal, NAL_SPS, NAL_PPS, NAL_IDR_W_RADL,
)


def test_bitwriter_basic():
    bw = BitWriter()
    bw.write(0b101, 3)
    bw.write(0b11111, 5)
    assert bw.getvalue() == bytes([0b10111111])


def test_bitwriter_cross_byte():
    bw = BitWriter()
    bw.write(0xABCDE, 20)
    bw.write(0xF, 4)
    assert bw.getvalue() == bytes([0xAB, 0xCD, 0xEF])


def test_ue_se_roundtrip():
    rng = random.Random(42)
    values = [0, 1, 2, 3, 7, 8, 255, 256, 65535] + \
             [rng.randrange(1 << 20) for _ in range(200)]
    bw = BitWriter()
    for v in values:
        bw.write_ue(v)
    sevals = [0, 1, -1, 2, -2, 100, -100] + \
             [rng.randrange(-(1 << 15), 1 << 15) for _ in range(200)]
    for v in sevals:
        bw.write_se(v)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.getvalue())
    for v in values:
        assert br.read_ue() == v
    for v in sevals:
        assert br.read_se() == v


def test_emulation_prevention_roundtrip():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00\x04",
        b"\x00" * 10,
        bytes(range(256)),
        b"\x00\x00",
        b"",
        b"\x00\x00\x03",  # needs escaping itself
    ]
    rng = random.Random(7)
    for _ in range(50):
        cases.append(bytes(rng.choice([0, 0, 0, 1, 2, 3, 255])
                           for _ in range(rng.randrange(0, 64))))
    for rbsp in cases:
        ebsp = add_emulation_prevention(rbsp)
        # no 00 00 0x pattern with x<=3 may remain
        for i in range(len(ebsp) - 2):
            assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] <= 2), \
                f"emulation survives in {ebsp.hex()}"
        assert remove_emulation_prevention(ebsp) == rbsp


def test_annexb_roundtrip():
    payloads = [(NAL_SPS, b"\x42\x00\x00\x00\x01\x99"),
                (NAL_PPS, b"\x00\x00\x02"),
                (NAL_IDR_W_RADL, bytes(range(64)))]
    stream = b"".join(wrap_nal(t, p) for t, p in payloads)
    parsed = list(split_annexb(stream))
    assert len(parsed) == 3
    for (t_in, p_in), (t_out, tid, p_out) in zip(payloads, parsed):
        assert t_out == t_in
        assert p_out == p_in
        assert tid == 0


def test_crc_matches_bitserial_spec():
    # D.3.19 CRC: bit-serial poly 0x1021 init 0xFFFF + 16 appended zero
    # bits (libde265 sei.cc crc_process_byte behavior)
    import numpy as np
    from x265_tpu.common.sei import plane_crc

    def bitserial(data):
        crc = 0xFFFF
        for byte in data + b"\x00\x00":
            for bit in range(8):
                bv = (byte >> (7 - bit)) & 1
                msb = (crc >> 15) & 1
                crc = ((crc << 1) + bv) & 0xFFFF
                if msb:
                    crc ^= 0x1021
        return crc.to_bytes(2, "big")

    rng = np.random.default_rng(7)
    p8 = rng.integers(0, 256, (5, 13), dtype=np.uint8)
    assert plane_crc(p8, 8) == bitserial(p8.tobytes())
    p10 = rng.integers(0, 1024, (3, 9), dtype=np.uint16)
    assert plane_crc(p10, 10) == bitserial(
        np.ascontiguousarray(p10, dtype="<u2").tobytes())


def test_checksum_matches_spec_loop():
    import numpy as np
    from x265_tpu.common.sei import plane_checksum

    rng = np.random.default_rng(8)
    p = rng.integers(0, 1024, (300, 7), dtype=np.uint16)
    s = 0
    for y in range(p.shape[0]):
        for x in range(p.shape[1]):
            xm = (x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8)
            s += (int(p[y, x]) & 0xFF) ^ xm
            s += (int(p[y, x]) >> 8) ^ xm
    assert plane_checksum(p, 10) == (s & 0xFFFFFFFF).to_bytes(4, "big")
