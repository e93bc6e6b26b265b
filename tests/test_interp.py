"""MC interpolation: batched jnp vs numpy spec oracle, and oracle
self-consistency properties (integer positions = copy)."""

import numpy as np
import pytest

import conftest  # noqa: F401
from x265_tpu.ops.interp import (mc_chroma_batch, mc_chroma_np,
                                 mc_luma_batch, mc_luma_np)


def test_integer_position_is_copy():
    rng = np.random.RandomState(0)
    ref = rng.randint(0, 256, (64, 64)).astype(np.int32)
    out = mc_luma_np(ref, 8, 8, 16, 16, 4 * 3, 4 * -2)
    np.testing.assert_array_equal(out, ref[6:22, 11:27])
    outc = mc_chroma_np(ref, 8, 8, 8, 8, 8 * 2, 8 * 1)
    np.testing.assert_array_equal(outc, ref[9:17, 10:18])


@pytest.mark.parametrize("frac", [(1, 0), (0, 1), (2, 2), (3, 1), (1, 3)])
def test_luma_batch_matches_oracle(frac):
    rng = np.random.RandomState(1)
    ref = rng.randint(0, 256, (96, 96)).astype(np.int32)
    fx, fy = frac
    w = h = 16
    blocks, wins, frs = [], [], []
    for (x0, y0, mvx, mvy) in [(16, 16, 4 + fx, 8 + fy),
                               (32, 48, -12 + fx, 4 * 5 + fy),
                               (48, 8, 4 * 7 + fx, -8 + fy)]:
        blocks.append(mc_luma_np(ref, x0, y0, w, h, mvx, mvy))
        ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
        ys = np.clip(np.arange(iy - 3, iy + h + 4), 0, 95)
        xs = np.clip(np.arange(ix - 3, ix + w + 4), 0, 95)
        wins.append(ref[np.ix_(ys, xs)])
        frs.append((mvx & 3, mvy & 3))
    wins = np.stack(wins)
    frx = np.array([f[0] for f in frs], np.int32)
    fry = np.array([f[1] for f in frs], np.int32)
    out = np.asarray(mc_luma_batch(wins, frx, fry, w, h))
    np.testing.assert_array_equal(out, np.stack(blocks))


@pytest.mark.parametrize("frac", [(3, 0), (0, 5), (4, 4), (7, 2)])
def test_chroma_batch_matches_oracle(frac):
    rng = np.random.RandomState(2)
    ref = rng.randint(0, 256, (48, 48)).astype(np.int32)
    fx, fy = frac
    w = h = 8
    x0, y0 = 16, 12
    mvx, mvy = 8 * 2 + fx, -8 + fy
    want = mc_chroma_np(ref, x0, y0, w, h, mvx, mvy)
    ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
    ys = np.clip(np.arange(iy - 1, iy + h + 2), 0, 47)
    xs = np.clip(np.arange(ix - 1, ix + w + 2), 0, 47)
    win = ref[np.ix_(ys, xs)][None]
    out = np.asarray(mc_chroma_batch(win, np.array([mvx & 7], np.int32),
                                     np.array([mvy & 7], np.int32), w, h))[0]
    np.testing.assert_array_equal(out, want)


def test_10bit_oracle_range():
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 1024, (64, 64)).astype(np.int32)
    out = mc_luma_np(ref, 8, 8, 16, 16, 5, 7, bit_depth=10)
    assert out.min() >= 0 and out.max() <= 1023


# -- ps-domain (bi-prediction) variants --------------------------------------

def _ps_props(bit_depth):
    """uni_round(ps) must equal the pp path for every phase combo, and the
    batched ps kernel must match the numpy spec oracle."""
    from x265_tpu.ops.interp import (bi_avg_np, mc_chroma_batch_ps,
                                     mc_chroma_ps_np, mc_luma_batch_ps,
                                     mc_luma_ps_np, uni_round_np)
    rng = np.random.RandomState(4 + bit_depth)
    maxs = (1 << bit_depth) - 1
    ref = rng.randint(0, maxs + 1, (96, 96)).astype(np.int32)
    w = h = 16
    for fx in range(4):
        for fy in range(4):
            mvx, mvy = 4 * 2 + fx, -4 + fy
            x0, y0 = 24, 32
            ps = mc_luma_ps_np(ref, x0, y0, w, h, mvx, mvy, bit_depth)
            pp = mc_luma_np(ref, x0, y0, w, h, mvx, mvy, bit_depth)
            np.testing.assert_array_equal(uni_round_np(ps, bit_depth), pp)
            ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
            win = ref[iy - 3:iy + h + 4, ix - 3:ix + w + 4][None]
            out = np.asarray(mc_luma_batch_ps(
                win, np.array([fx], np.int32), np.array([fy], np.int32),
                w, h, bit_depth))[0]
            np.testing.assert_array_equal(out, ps)
            # bi of the same prediction twice reproduces the uni rounding
            np.testing.assert_array_equal(
                bi_avg_np(ps, ps, bit_depth), pp)
    for fx in range(0, 8, 3):
        for fy in range(0, 8, 2):
            mvx, mvy = 8 + fx, -8 + fy
            x0, y0 = 12, 16
            cw = chh = 8
            ps = mc_chroma_ps_np(ref, x0, y0, cw, chh, mvx, mvy, bit_depth)
            pp = mc_chroma_np(ref, x0, y0, cw, chh, mvx, mvy, bit_depth)
            np.testing.assert_array_equal(uni_round_np(ps, bit_depth), pp)
            ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
            win = ref[iy - 1:iy + chh + 2, ix - 1:ix + cw + 2][None]
            out = np.asarray(mc_chroma_batch_ps(
                win, np.array([fx], np.int32), np.array([fy], np.int32),
                cw, chh, bit_depth))[0]
            np.testing.assert_array_equal(out, ps)


def test_ps_domain_8bit():
    _ps_props(8)


def test_ps_domain_10bit():
    _ps_props(10)
