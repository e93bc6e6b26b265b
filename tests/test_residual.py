"""residual_coding encode→decode roundtrip over sizes/channels/scans."""

import numpy as np
import pytest

from x265_tpu.cabac.engine import CabacDecoder, CabacEncoder
from x265_tpu.cabac.syntax import (
    SCAN_DIAG, SCAN_HORIZ, SCAN_VERT, decode_residual, encode_residual,
    scan_order,
)
from x265_tpu.cabac.tables import init_context_states
from x265_tpu.common.bitstream import BitReader, BitWriter

RNG = np.random.default_rng(99)


def _roundtrip_one(coeffs, log2_size, c_idx, scan_idx, sign_hiding=False):
    ctx = init_context_states(0, 30)
    bw = BitWriter()
    enc = CabacEncoder(bw, ctx.copy())
    encode_residual(enc, coeffs, log2_size, c_idx, scan_idx,
                    sign_hiding=sign_hiding)
    enc.encode_terminate(1)
    bw.rbsp_trailing_bits()
    dec = CabacDecoder(BitReader(bw.getvalue()), ctx.copy())
    out = decode_residual(dec, log2_size, c_idx, scan_idx,
                          sign_hiding=sign_hiding)
    assert dec.decode_terminate() == 1
    np.testing.assert_array_equal(out, coeffs)


def test_scan_orders():
    s = scan_order(4, SCAN_DIAG)
    assert s[0].tolist() == [0, 0]
    assert s[1].tolist() == [0, 1]
    assert s[2].tolist() == [1, 0]
    assert len(scan_order(8, SCAN_HORIZ)) == 64
    assert scan_order(4, SCAN_VERT)[1].tolist() == [0, 1]


@pytest.mark.parametrize("log2_size", [2, 3, 4, 5])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_residual_roundtrip_random(log2_size, c_idx):
    if log2_size == 5 and c_idx:
        pytest.skip("32x32 chroma does not occur in 4:2:0")
    n = 1 << log2_size
    for trial in range(12):
        density = [0.02, 0.1, 0.5, 0.95][trial % 4]
        coeffs = RNG.integers(-100, 101, size=(n, n), dtype=np.int32)
        mask = RNG.random((n, n)) < density
        coeffs = coeffs * mask
        if not coeffs.any():
            coeffs[RNG.integers(n), RNG.integers(n)] = 1
        for scan_idx in ([SCAN_DIAG, SCAN_HORIZ, SCAN_VERT]
                         if log2_size <= 3 else [SCAN_DIAG]):
            _roundtrip_one(coeffs, log2_size, c_idx, scan_idx)


def test_residual_single_dc():
    for v in (1, -1, 100, -32000, 32000):
        c = np.zeros((8, 8), dtype=np.int32)
        c[0, 0] = v
        _roundtrip_one(c, 3, 0, SCAN_DIAG)


def test_residual_single_high_freq():
    c = np.zeros((16, 16), dtype=np.int32)
    c[15, 15] = -3
    _roundtrip_one(c, 4, 0, SCAN_DIAG)
    c = np.zeros((4, 4), dtype=np.int32)
    c[3, 3] = 7
    _roundtrip_one(c, 2, 1, SCAN_DIAG)


def test_residual_large_levels():
    # exercise deep exp-golomb escapes + rice adaptation
    c = RNG.integers(-30000, 30001, size=(8, 8), dtype=np.int32)
    _roundtrip_one(c, 3, 0, SCAN_DIAG)


def test_residual_sign_hiding_roundtrip():
    # encoder guarantees parity; generate blocks satisfying the constraint
    for trial in range(20):
        n = 8
        coeffs = (RNG.integers(-8, 9, size=(n, n), dtype=np.int32)
                  * (RNG.random((n, n)) < 0.6))
        if not coeffs.any():
            coeffs[0, 0] = 2
        # fix parity per 4x4 group when hiding would trigger
        scan = scan_order(4, SCAN_DIAG)
        for ys in range(n // 4):
            for xs in range(n // 4):
                grp = coeffs[ys * 4:(ys + 1) * 4, xs * 4:(xs + 1) * 4]
                nz = [(int(scanpos), x, y) for scanpos, (x, y) in enumerate(scan)
                      if grp[y, x] != 0]
                if not nz:
                    continue
                first, last = nz[0][0], nz[-1][0]
                if last - first > 3:
                    # parity of sum must match sign of first-in-scan coeff
                    s = int(np.abs(grp).sum())
                    x0, y0 = nz[0][1], nz[0][2]
                    want_neg = grp[y0, x0] < 0
                    if (s & 1) != (1 if want_neg else 0):
                        # bump the DC-most coeff magnitude by 1 to fix parity
                        grp[y0, x0] += 1 if grp[y0, x0] > 0 else -1
        if not coeffs.any():
            continue
        _roundtrip_one(coeffs, 3, 0, SCAN_DIAG, sign_hiding=True)
