"""Kernel equivalence tests: batched jnp vs numpy spec oracles.

Same shape as the reference's testbench (x265_1.9/source/test/testbench.cpp):
randomized inputs, exact integer equality, every kernel family x size.
"""

import numpy as np
import pytest

from x265_tpu.ops import cost, intra, quantize, transforms


RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("bd", [8, 10])
def test_dct_idct_equivalence(n, bd):
    maxr = (1 << bd) - 1
    resi = RNG.integers(-maxr, maxr + 1, size=(7, n, n), dtype=np.int32)
    fwd = np.asarray(transforms.forward_transform(resi, bit_depth=bd))
    inv = np.asarray(transforms.inverse_transform(fwd, bit_depth=bd))
    for i in range(resi.shape[0]):
        np.testing.assert_array_equal(
            fwd[i], transforms.forward_transform_np(resi[i], bit_depth=bd))
        np.testing.assert_array_equal(
            inv[i], transforms.inverse_transform_np(fwd[i], bit_depth=bd))


def test_dst4_equivalence():
    resi = RNG.integers(-255, 256, size=(5, 4, 4), dtype=np.int32)
    fwd = np.asarray(transforms.forward_transform(resi, dst=True))
    inv = np.asarray(transforms.inverse_transform(fwd, dst=True))
    for i in range(5):
        np.testing.assert_array_equal(
            fwd[i], transforms.forward_transform_np(resi[i], dst=True))
        np.testing.assert_array_equal(
            inv[i], transforms.inverse_transform_np(fwd[i], dst=True))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_transform_roundtrip_near_identity(n):
    # IDCT(DCT(x)) must reconstruct x closely (integer transform error small)
    resi = RNG.integers(-100, 101, size=(3, n, n), dtype=np.int32)
    fwd = np.asarray(transforms.forward_transform(resi))
    inv = np.asarray(transforms.inverse_transform(fwd))
    assert np.abs(inv - resi).max() <= 2


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("qp", [0, 10, 26, 37, 45, 51])
def test_quant_dequant_equivalence(n, qp):
    coef = RNG.integers(-(1 << 15), 1 << 15, size=(6, n, n), dtype=np.int32)
    q = np.asarray(quantize.quant(coef, qp))
    dq = np.asarray(quantize.dequant(q, qp))
    for i in range(6):
        np.testing.assert_array_equal(q[i], quantize.quant_np(coef[i], qp))
        np.testing.assert_array_equal(dq[i], quantize.dequant_np(q[i], qp))


def test_dequant_extreme_levels():
    # int32-safety at max qp with extreme levels must match the int64 oracle
    lvl = np.array([[[32767, -32768 + 1, 1, -1]] * 4], dtype=np.int32)
    for qp in (45, 51):
        dq = np.asarray(quantize.dequant(lvl, qp))
        np.testing.assert_array_equal(dq[0], quantize.dequant_np(lvl[0], qp))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_intra_all_modes_equivalence(n, is_luma):
    b = 5
    refs = RNG.integers(0, 256, size=(b, 4 * n + 1), dtype=np.int32)
    preds = np.asarray(intra.predict_all_modes(refs, n, is_luma))
    assert preds.shape == (b, 35, n, n)
    for i in range(b):
        for mode in list(range(0, 35)):
            expected = intra.predict_intra_np(mode, refs[i], n,
                                              is_luma=is_luma)
            np.testing.assert_array_equal(
                preds[i, mode], expected,
                err_msg=f"mode {mode} n {n} luma {is_luma}")


def test_reference_substitution_equivalence():
    n = 8
    r = 4 * n + 1
    for trial in range(50):
        samples = RNG.integers(0, 256, size=(1, r), dtype=np.int32)
        avail = RNG.random((1, r)) < (0.0 if trial == 0 else 0.7)
        out = np.asarray(intra.substitute_references(samples, avail))
        expected = intra.substitute_references_np(samples[0], avail[0])
        np.testing.assert_array_equal(out[0], expected)


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (16, 8)])
def test_cost_kernels(shape):
    a = RNG.integers(0, 256, size=(3,) + shape, dtype=np.int32)
    b = RNG.integers(0, 256, size=(3,) + shape, dtype=np.int32)
    sadv = np.asarray(cost.sad(a, b))
    ssev = np.asarray(cost.sse(a, b))
    satdv = np.asarray(cost.satd(a, b))
    for i in range(3):
        assert sadv[i] == np.abs(a[i].astype(int) - b[i]).sum()
        assert ssev[i] == ((a[i].astype(int) - b[i]) ** 2).sum()
        assert satdv[i] == cost.satd_np(a[i], b[i])
    if shape[0] % 8 == 0 and shape[1] % 8 == 0:
        sa8dv = np.asarray(cost.sa8d(a, b))
        for i in range(3):
            assert sa8dv[i] == cost.sa8d_np(a[i], b[i])
