"""Motion vector prediction: merge candidate list and AMVP derivation.

Spec: ITU-T H.265 §8.5.3.2.3 (merge, spatial), §8.5.3.2.6 (AMVP).
Reference embodiments: x265_1.9/source/common/cudata.cpp
getInterMergeCandidates / fillMvpCand (SURVEY.md §2.1) and libde265's
motion.cc derivations.

Scope (grows with the inter toolset): single reference list L0, single
reference picture, TMVP disabled (SPS flag 0), 2Nx2N PUs.  Under these
constraints no MV scaling arises, and the spec's scaled second passes
reduce to the same-reference first passes implemented here.  These
derivations are NORMATIVE — encoder and decoder must call the same code.
"""

from __future__ import annotations

import numpy as np

MODE_INTRA = 1  # must match cabac.ctu


def _cand(ps, xc, yc, xn, yn):
    """Motion candidate at neighbor position, or None (z-scan availability +
    inter-coded requirement, §8.5.3.2.3 step availableFlagN)."""
    g = ps.geom
    if not g.available(xc, yc, xn, yn):
        return None
    if ps.pred_mode[yn >> 2, xn >> 2] == MODE_INTRA:
        return None
    mv = ps.mv0[yn >> 2, xn >> 2]
    return (int(mv[0]), int(mv[1]))


def merge_candidates(ps, x0: int, y0: int, w: int, h: int,
                     max_cand: int = 5) -> list[tuple[int, int]]:
    """Spatial merge list for a 2Nx2N PU (TMVP off) + zero fill.

    Returns ``max_cand`` (mvx, mvy) tuples (ref idx is always 0)."""
    a1 = _cand(ps, x0, y0, x0 - 1, y0 + h - 1)
    b1 = _cand(ps, x0, y0, x0 + w - 1, y0 - 1)
    b0 = _cand(ps, x0, y0, x0 + w, y0 - 1)
    a0 = _cand(ps, x0, y0, x0 - 1, y0 + h)
    cands = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4:
        b2 = _cand(ps, x0, y0, x0 - 1, y0 - 1)
        if b2 is not None and b2 != a1 and b2 != b1:
            cands.append(b2)
    while len(cands) < max_cand:
        cands.append((0, 0))
    return cands[:max_cand]


def amvp_candidates(ps, x0: int, y0: int, w: int,
                    h: int) -> list[tuple[int, int]]:
    """AMVP predictor pair [mvp0, mvp1] (§8.5.3.2.6, same-ref passes)."""
    # candidate A: A0 then A1
    mv_a = None
    for (xn, yn) in ((x0 - 1, y0 + h), (x0 - 1, y0 + h - 1)):
        c = _cand(ps, x0, y0, xn, yn)
        if c is not None:
            mv_a = c
            break
    # candidate B: B0 then B1 then B2
    mv_b = None
    for (xn, yn) in ((x0 + w, y0 - 1), (x0 + w - 1, y0 - 1),
                     (x0 - 1, y0 - 1)):
        c = _cand(ps, x0, y0, xn, yn)
        if c is not None:
            mv_b = c
            break
    cands = []
    if mv_a is not None:
        cands.append(mv_a)
    if mv_b is not None and mv_b != mv_a:
        cands.append(mv_b)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands[:2]


def clip_mv(mv: tuple[int, int], x0: int, y0: int, w: int, h: int,
            pic_w: int, pic_h: int, pad: int = 80) -> tuple[int, int]:
    """Clamp an MV so the (padded) reference window stays near the picture
    (encoder-side sanity; decoders handle any MV via edge extension)."""
    min_x = -(x0 + w + pad) * 4
    max_x = (pic_w - x0 + pad) * 4
    min_y = -(y0 + h + pad) * 4
    max_y = (pic_h - y0 + pad) * 4
    return (max(min_x, min(max_x, mv[0])), max(min_y, min(max_y, mv[1])))
