"""psy-rd / psy-rdoq: psycho-visual energy preservation.

Reference semantics: x265_1.9/source/encoder/rdcost.h:34-98
(calcPsyRdCost = dist + lambda_sad*psyScale*psyCost + lambda2*bits),
x265_1.9/source/common/pixel.cpp psyCost_pp (AC Hadamard energy diff),
x265_1.9/source/common/quant.cpp:551 (psy term in rdoQuant).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from x265_tpu.ops.cost import psy_cost, psy_cost_np  # noqa: E402


def test_psy_cost_matches_oracle():
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (16, 16), (32, 32), (16, 32)]:
        a = rng.integers(0, 256, shape).astype(np.int32)
        b = rng.integers(0, 256, shape).astype(np.int32)
        got = int(psy_cost(jnp.asarray(a[None]), jnp.asarray(b[None]))[0])
        assert got == psy_cost_np(a, b)


def test_psy_cost_flat_vs_texture():
    # deadening texture to flat costs energy; identical recon costs none
    rng = np.random.default_rng(3)
    tex = rng.integers(0, 256, (16, 16)).astype(np.int32)
    flat = np.full((16, 16), int(tex.mean()), np.int32)
    z = psy_cost(jnp.asarray(tex[None]), jnp.asarray(tex[None]))
    nz = psy_cost(jnp.asarray(tex[None]), jnp.asarray(flat[None]))
    assert int(z[0]) == 0 and int(nz[0]) > 0


def test_psy_rdoq_retains_ac_energy():
    from x265_tpu.ops.quantize import _rdoq_core
    rng = np.random.default_rng(11)
    # moderate-amplitude AC-heavy transform block near the quant
    # dead-zone at a high QP: plain RDOQ zeroes marginal AC coeffs,
    # psy-rdoq keeps them
    coef = rng.integers(-2200, 2200, (4, 16, 16)).astype(np.int32)
    qp = jnp.full((4,), 37, jnp.int32)
    base = np.asarray(_rdoq_core(jnp, jnp.asarray(coef), qp, 8))
    psy = np.asarray(_rdoq_core(jnp, jnp.asarray(coef), qp, 8,
                                psy_scale=5.0))
    nz_b = int((base != 0).sum())
    nz_p = int((psy != 0).sum())
    assert nz_p > nz_b
    # DC is untouched by the psy bonus
    np.testing.assert_array_equal(base[:, 0, 0], psy[:, 0, 0])


def _encode(frame, psy_rd, qp=35):
    from x265_tpu.common.params import Params
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.encoder import encode_sequence
    h, w = frame.shape
    p = Params(source_width=w, source_height=h, qp=qp,
               decoded_picture_hash=1, psy_rd=psy_rd, aq_mode=0,
               keyint_max=1, bframes=0)
    planes = (frame.astype(np.uint8),
              np.full((h // 2, w // 2), 128, np.uint8),
              np.full((h // 2, w // 2), 128, np.uint8))
    stream, recons = encode_sequence([planes], p)
    pics = decode_annexb(stream)
    assert all(pic.hash_ok for pic in pics)
    return stream, recons[0][0].astype(np.int32)


def test_psy_rd_changes_decisions_and_preserves_energy():
    # 64x64 textured frame at high QP: without psy the in-scan RD
    # prefers cheap/flat codings; with psy the CU/TU choices shift
    # toward energy-preserving ones (x265 analysis.cpp RD compares via
    # calcPsyRdCost).  Both streams must stay conformant.
    rng = np.random.default_rng(5)
    base = np.linspace(64, 192, 64, dtype=np.int32)[None, :]
    tex = np.clip(base + rng.integers(-48, 48, (64, 64)), 0, 255)
    s0, r0 = _encode(tex, 0.0)
    s1, r1 = _encode(tex, 4.0)
    assert s0 != s1, "psy-rd had no effect on coding decisions"
    e_src = int(psy_cost(jnp.asarray(tex[None]),
                         jnp.zeros((1, 64, 64), jnp.int32))[0])
    e0 = int(psy_cost(jnp.asarray(r0[None]),
                      jnp.zeros((1, 64, 64), jnp.int32))[0])
    e1 = int(psy_cost(jnp.asarray(r1[None]),
                      jnp.zeros((1, 64, 64), jnp.int32))[0])
    # psy recon's AC energy is at least as close to the source's
    assert abs(e_src - e1) <= abs(e_src - e0)
