"""--b-adapt: adaptive B placement via the lookahead trellis.

Reference: x265_1.9/source/encoder/slicetype.cpp:1565 (slicetypePath),
:1594 (slicetypePathCost incl. the bBPyramid reference-pair shape),
:377 (estimateFrameCost bidir path).
"""

import numpy as np

import conftest  # noqa: F401
from x265_tpu.common.params import Params
from x265_tpu.decoder import decode_annexb
from x265_tpu.encoder import Encoder


def _clip(n, w=96, h=64):
    """Smooth pan followed by per-frame decorrelated noise."""
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 120 + 60 * np.sin(xx / 13.0) * np.cos(yy / 9.0)
    frames = []
    for t in range(n):
        if t < n // 2:
            y = np.roll(base, 2 * t, axis=1) + rng.randint(-2, 3, (h, w))
        else:
            y = rng.randint(0, 256, (h, w))
        frames.append((np.clip(y, 0, 255).astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8)))
    return frames


def _encode(frames, **kw):
    p = Params(source_width=frames[0][0].shape[1],
               source_height=frames[0][0].shape[0], qp=32,
               decoded_picture_hash=1, log_level=0, **kw)
    enc = Encoder(p)
    stream = enc.headers()
    out = []
    for f in frames:
        out.extend(enc.push_frame(f))
    out.extend(enc.flush())
    for ef in out:
        stream += ef.au
    kinds = [e.kind for e in sorted(out, key=lambda e: e.display_idx)]
    return stream, kinds, sum(len(e.au) for e in out)


def test_badapt_varies_minigop_and_stays_conformant():
    frames = _clip(14)
    s_fix, k_fix, bits_fix = _encode(frames, bframes=3, b_adapt=0,
                                     rc_lookahead=8)
    s_ada, k_ada, bits_ada = _encode(frames, bframes=3, b_adapt=2,
                                     rc_lookahead=8)
    # fixed pattern: every mini-GOP is bbbP; the trellis must pick a
    # different segmentation on a mixed-character clip
    assert k_ada != k_fix, f"trellis chose the fixed pattern: {k_ada}"
    # and must not pay for it (deterministic content + encode)
    assert bits_ada <= bits_fix * 1.05
    for stream in (s_fix, s_ada):
        pics = decode_annexb(stream)
        assert len(pics) == len(frames)
        assert all(pic.hash_ok for pic in pics)


def test_badapt_zero_is_fixed_pattern():
    frames = _clip(9)[:9]
    _, kinds, _ = _encode(frames, bframes=2, b_adapt=0, rc_lookahead=0,
                          cu_tree=False, aq_mode=0)
    # the flush tail closes with an anchor (last queued frame becomes P)
    assert kinds == ["I", "B", "B", "P", "B", "B", "P", "B", "P"]


def test_badapt_trellis_follows_costs():
    """Drive _slicetype_decide with synthetic pair costs: when bidir
    prediction is strictly cheaper than the adjacent-P chain the trellis
    must emit a full B run; when it is strictly more expensive the
    trellis must emit P-only (and ties break toward P, matching
    slicetypePath's iteration order)."""
    from x265_tpu.encoder.lookahead import Lookahead, LowresFrame

    p = Params(source_width=96, source_height=64, qp=32, bframes=3,
               b_adapt=2, rc_lookahead=8, log_level=0)
    enc = Encoder(p)
    enc.lookahead = la = Lookahead(p)

    def fake_frame():
        fr = LowresFrame((None, None, None), None, None)
        fr.intra_cost = np.full((8, 12), 10_000, np.int32)
        fr.low = np.zeros((64, 96), np.uint8)
        return fr

    frames = [fake_frame() for _ in range(5)]
    enc._anchor_low = frames[0]
    enc._queue = [(i + 1, None, (None, 0.0, False, frames[i + 1]))
                  for i in range(4)]

    costs = {}

    def p_cost(b, a):
        return costs["p"]

    def bidir_cost(b, r0, r1):
        return costs["b"]

    la.p_cost = p_cost
    la.bidir_cost = bidir_cost

    costs.update(p=1000.0, b=400.0)     # bidir cheaper -> max Bs
    assert enc._slicetype_decide() == 4
    costs.update(p=1000.0, b=1600.0)    # bidir dearer -> P-only
    assert enc._slicetype_decide() == 1
    costs.update(p=1000.0, b=1000.0)    # tie -> P (x265 iteration order)
    assert enc._slicetype_decide() == 1
