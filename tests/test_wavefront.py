"""Device wavefront recon must be bit-exact with the numpy spec path.

This is the TPU analogue of the reference testbench's asm-vs-C equivalence
contract (SURVEY.md §4.1) applied to the whole closed-loop recon pass.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
from x265_tpu.cabac.ctu import MODE_INTRA, PicSyntax, chroma_qp
from x265_tpu.common.geometry import PictureGeometry
from x265_tpu.encoder.intra_encoder import Encoder, pad_plane
from x265_tpu.encoder.wavefront import WavefrontIntraRecon
from x265_tpu.common.params import Params


def run_both(w, h, qp, seed, n=16):
    """Encode one frame's luma through (a) the sequential numpy TU loop and
    (b) the wavefront device scan, with identical modes; compare."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 99, np.uint8)
    v = np.full((h // 2, w // 2), 188, np.uint8)

    p = Params(bframes=0, source_width=w, source_height=h, qp=qp)
    enc = Encoder(p)
    g = enc.geom
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    orig = pad_plane(y.astype(np.int16), ph, pw)

    cu_size, modes, _costs = enc._decide_modes(
        (orig, pad_plane(u.astype(np.int16), ph // 2, pw // 2),
         pad_plane(v.astype(np.int16), ph // 2, pw // 2)))
    assert cu_size == n

    # numpy spec path
    ps = PicSyntax(g)
    ps.depth[:] = g.log2_ctb - 4
    ps.pred_mode[:] = MODE_INTRA
    s4 = n // 4
    ps.luma_mode[:] = np.kron(modes, np.ones((s4, s4), np.uint8))
    ps.chroma_mode[:] = ps.luma_mode
    rec_np = np.zeros((ph, pw), np.int16)
    from x265_tpu.common.recon import cu_leaves, tu_leaves
    for ctu in range(g.n_ctbs):
        for (cx, cy, log2_cb) in cu_leaves(ps, ctu):
            for (tx, ty, log2_tb, _d) in tu_leaves(ps, cx, cy, log2_cb):
                mode = int(ps.luma_mode[ty >> 2, tx >> 2])
                enc._encode_tu(orig, rec_np, ps.coeff_y, ps, tx, ty,
                               log2_tb, mode, qp, is_luma=True)

    # wavefront device path
    wf = WavefrontIntraRecon(g.width, g.height, g.log2_ctb, n, is_luma=True)
    gh, gw = wf.sched["grid"]
    blocks = orig.astype(np.int32).reshape(gh, n, gw, n).transpose(
        0, 2, 1, 3).reshape(gh * gw, n, n)
    plane, levels = wf.encode(blocks, modes.reshape(-1).astype(np.int32), qp)
    plane = np.asarray(plane)
    levels = np.asarray(levels)

    np.testing.assert_array_equal(plane, rec_np.astype(np.int32))
    lev_np = ps.coeff_y.reshape(gh, n, gw, n).transpose(0, 2, 1, 3).reshape(
        gh * gw, n, n)
    np.testing.assert_array_equal(levels, lev_np)


@pytest.mark.parametrize("qp", [12, 30, 47])
def test_wavefront_luma_bit_exact(qp):
    run_both(64, 64, qp, seed=qp)


def test_wavefront_larger():
    run_both(128, 96, 28, seed=3)


def test_wavefront_chroma_bit_exact():
    w, h, qp = 64, 64, 26
    rng = np.random.RandomState(9)
    u = rng.randint(0, 256, (h // 2, w // 2)).astype(np.int16)
    g = PictureGeometry(w, h, 6, 3)
    n = 8
    p = Params(bframes=0, source_width=w, source_height=h, qp=qp)
    enc = Encoder(p)
    modes = rng.randint(0, 35, ((h // 2) // n, (w // 2) // n)).astype(np.int32)

    ps = PicSyntax(g)
    ps.depth[:] = g.log2_ctb - 4
    ps.pred_mode[:] = MODE_INTRA
    ps.chroma_mode[:] = np.kron(modes, np.ones((4, 4), np.uint8))
    qpc = chroma_qp(qp)
    rec_np = np.zeros((h // 2, w // 2), np.int16)
    from x265_tpu.common.recon import cu_leaves, chroma_tu_leaves
    for ctu in range(g.n_ctbs):
        for (cx, cy, log2_cb) in cu_leaves(ps, ctu):
            cmode = int(ps.chroma_mode[cy >> 2, cx >> 2])
            for (tx, ty, clog2) in chroma_tu_leaves(ps, cx, cy, log2_cb):
                enc._encode_tu(u, rec_np, ps.coeff_cb, ps, tx >> 1, ty >> 1,
                               clog2, cmode, qpc, is_luma=False,
                               chroma_shift=1)

    wf = WavefrontIntraRecon(w, h, 6, n, is_luma=False, chroma_shift=1)
    gh, gw = wf.sched["grid"]
    blocks = u.astype(np.int32).reshape(gh, n, gw, n).transpose(
        0, 2, 1, 3).reshape(gh * gw, n, n)
    plane, levels = wf.encode(blocks, modes.reshape(-1), qpc)
    np.testing.assert_array_equal(np.asarray(plane),
                                  rec_np.astype(np.int32))
