"""Weighted-prediction analysis (x265 weightPrediction.cpp:222 weightAnalyse).

Least-squares luma (scale, offset) fit of the current frame against its
L0 reference source, with an SAD gate: the weight is only enabled when
the weighted reference predicts the frame measurably better than the
plain reference (the fade detector).  Denominator fixed at 6 (w = 64
== unity), matching x265's default luma denom.

The fit runs on 4x-subsampled source planes on the host — the same
cost class as the reference's lowres-plane analysis; the per-pixel
weighted MC itself stays on device (device_pipeline.build_p_pipeline).
"""

from __future__ import annotations

import numpy as np

LUMA_DENOM = 6


def analyse_luma_weight(cur_y: np.ndarray, ref_y: np.ndarray,
                        bit_depth: int = 8):
    """(w, offset, enabled): explicit L0 luma weight for a P frame.

    w is in 1/64 units (denom 6), offset in 8-bit-domain pixel units
    (§7.4.7.3 ranges: w-64 and offset each in [-128, 127]).  Returns
    (64, 0, False) when weighting does not beat the plain reference.
    """
    c = cur_y[::4, ::4].astype(np.float64)
    r = ref_y[::4, ::4].astype(np.float64)
    sc = 1 << (bit_depth - 8)
    # fade detector: global luma moments are motion-invariant, so (unlike
    # a zero-MV SAD compare) this gate cannot misfire on displaced
    # content.  x265 reaches the same robustness via lowres MC'd SAD
    # (weightPrediction.cpp:444); moments are the batched equivalent.
    dm = (c.mean() - r.mean()) / sc
    dsd = (c.std() - r.std()) / sc
    if abs(dm) < 0.6 and abs(dsd) < max(0.6, 0.015 * r.std() / sc):
        return 64, 0, False
    vr = r.var()
    if vr < 1.0:                          # flat reference: offset-only fit
        scale = 1.0
    else:
        scale = float(((c - c.mean()) * (r - r.mean())).mean() / vr)
    w = int(round(scale * 64))
    w = max(-64, min(127, w))
    off = float(c.mean() - (w * r.mean()) / 64.0) / sc
    o = int(round(off))
    o = max(-128, min(127, o))
    if w == 64 and o == 0:
        return 64, 0, False
    return w, o, True
