"""Device (jnp) deblock + SAO equivalence vs the numpy spec oracles."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from x265_tpu.ops.deblock import (deblock_plane_jnp, deblock_plane_np,
                                  edge_masks_np)
from x265_tpu.ops.sao import (eo_valid_masks_np, sao_apply_plane_jnp,
                              sao_apply_plane_np, sao_estimate_plane_jnp,
                              sao_estimate_plane_np)


@pytest.mark.parametrize("qp", [22, 32, 45])
@pytest.mark.parametrize("chroma", [False, True])
def test_deblock_plane_jnp_matches_np(qp, chroma):
    rng = np.random.default_rng(11)
    h, w = 64, 96
    plane = rng.integers(0, 256, (h, w)).astype(np.int32)
    # smooth it a bit so the strong/weak conditions actually vary
    plane = (plane + np.roll(plane, 1, 1) + np.roll(plane, 1, 0)) // 3
    bs_v = np.zeros((h // 4, w // 4), np.uint8)
    bs_h = np.zeros((h // 4, w // 4), np.uint8)
    # edges on the 8-px grid with mixed BS values
    bs_v[:, 2::2] = rng.integers(0, 3, (h // 4, w // 8 - 1))
    bs_h[2::2, :] = rng.integers(0, 3, (h // 8 - 1, w // 4))
    if chroma:
        bs_v = np.where(bs_v == 2, 2, 0).astype(np.uint8)
        bs_h = np.where(bs_h == 2, 2, 0).astype(np.uint8)

    ref = deblock_plane_np(plane, bs_v, bs_h, qp, chroma=chroma)
    got = np.asarray(deblock_plane_jnp(
        jnp.asarray(plane), jnp.asarray(bs_v.astype(np.int32)),
        jnp.asarray(bs_h.astype(np.int32)), qp, chroma=chroma))
    assert np.array_equal(got, ref)


def test_deblock_plane_jnp_separate_bs_per_edge():
    """BS=1 vs BS=2 tc derivation must be per-edge, not global."""
    rng = np.random.default_rng(3)
    h, w = 32, 32
    plane = rng.integers(100, 140, (h, w)).astype(np.int32)
    bs_v = np.zeros((8, 8), np.uint8)
    bs_v[:, 2] = 1
    bs_v[:, 4] = 2
    bs_h = np.zeros((8, 8), np.uint8)
    ref = deblock_plane_np(plane, bs_v, bs_h, 37)
    got = np.asarray(deblock_plane_jnp(
        jnp.asarray(plane), jnp.asarray(bs_v.astype(np.int32)),
        jnp.asarray(bs_h.astype(np.int32)), 37))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("coded", [(96, 64), (80, 48)])
def test_sao_estimate_jnp_matches_np(coded):
    rng = np.random.default_rng(7)
    cw, ch_ = coded
    ctb = 32
    ctbs_w = (cw + ctb - 1) // ctb
    ctbs_h = (ch_ + ctb - 1) // ctb
    pw, ph = ctbs_w * ctb, ctbs_h * ctb
    orig = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    rec = np.clip(orig + rng.integers(-6, 7, (ph, pw)), 0, 255)
    # numpy estimates on the coded-size crop
    dist_np, offs_np, bpos_np, bits_np = sao_estimate_plane_np(
        orig[:ch_, :cw], rec[:ch_, :cw], ctb)
    eo_valid, inside = eo_valid_masks_np(ph, pw, cw, ch_)
    dist_j, offs_j, bpos_j, bits_j = (
        np.asarray(x) for x in sao_estimate_plane_jnp(
            jnp.asarray(orig), jnp.asarray(rec), ctbs_h, ctbs_w, ctb,
            jnp.asarray(eo_valid), jnp.asarray(inside)))
    assert np.array_equal(dist_j.astype(np.int64), dist_np)
    assert np.array_equal(offs_j.astype(np.int32), offs_np)
    assert np.array_equal(bpos_j, bpos_np.astype(np.int64) * 0 + bpos_np)
    assert np.array_equal(bits_j.astype(np.int32), bits_np)


def test_sao_apply_jnp_matches_np():
    rng = np.random.default_rng(9)
    cw, ch_ = 96, 64
    ctb = 32
    ctbs_w, ctbs_h = 3, 2
    pw, ph = ctbs_w * ctb, ctbs_h * ctb
    plane = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    types = rng.integers(0, 3, (ctbs_h, ctbs_w)).astype(np.int32)
    classes = rng.integers(0, 4, (ctbs_h, ctbs_w)).astype(np.int32)
    band_pos = rng.integers(0, 32, (ctbs_h, ctbs_w)).astype(np.int32)
    offsets = rng.integers(-7, 8, (ctbs_h, ctbs_w, 4)).astype(np.int32)
    ref = sao_apply_plane_np(plane[:ch_, :cw], ctb, types, classes,
                             band_pos, offsets)
    eo_valid, _ = eo_valid_masks_np(ph, pw, cw, ch_)
    got = np.asarray(sao_apply_plane_jnp(
        jnp.asarray(plane), ctbs_h, ctbs_w, ctb, jnp.asarray(types),
        jnp.asarray(classes), jnp.asarray(band_pos), jnp.asarray(offsets),
        jnp.asarray(eo_valid)))
    assert np.array_equal(got[:ch_, :cw], ref)
