"""Sample Adaptive Offset (ITU-T H.265 §8.7.3): apply + encoder estimation.

Reference embodiments: x265_1.9/source/encoder/sao.cpp (calcSaoStatsCu /
rdoSaoUnitRow) and libde265/libde265/sao.cc.

SAO is a pure post-pass over the deblocked picture: every sample's edge
category depends only on pre-SAO samples, so apply is fully vectorized
whole-plane math (no wavefront).  Estimation gathers per-CTB statistics
(count + diff-sum per category) and picks per-CTB (type, class/band,
offsets) by distortion delta with a small lambda·bits penalty.

Conventions: params per CTB:
  type: 0 = off, 1 = band (BO), 2 = edge (EO)
  eo_class: 0..3 (EO), band_pos: 0..31 (BO)
  offsets[4]: SIGNED applied values — EO categories 1..4 (cat 1,2 >= 0,
  cat 3,4 <= 0 per syntax), BO bands band_pos..band_pos+3.
"""

from __future__ import annotations

import numpy as np

# EO neighbor offsets per class: ((dy0, dx0), (dy1, dx1))
EO_NEIGHBORS = [((0, -1), (0, 1)), ((-1, 0), (1, 0)),
                ((-1, -1), (1, 1)), ((-1, 1), (1, -1))]
# edgeIdx (2 + sign sum in 0..4) -> category (0 = none)
EDGE_CAT = np.array([1, 2, 0, 3, 4], dtype=np.int32)


def _eo_category(plane: np.ndarray, klass: int) -> np.ndarray:
    """Per-sample EO category (0 = unfiltered) incl. picture-edge masking."""
    h, w = plane.shape
    p = plane.astype(np.int32)
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[klass]
    n0 = np.roll(np.roll(p, -dy0, axis=0), -dx0, axis=1)
    n1 = np.roll(np.roll(p, -dy1, axis=0), -dx1, axis=1)
    cat = EDGE_CAT[2 + np.sign(p - n0) + np.sign(p - n1)]
    # samples whose neighbors leave the picture are not filtered
    valid = np.ones((h, w), bool)
    for (dy, dx) in ((dy0, dx0), (dy1, dx1)):
        if dy == -1:
            valid[0, :] = False
        if dy == 1:
            valid[h - 1, :] = False
        if dx == -1:
            valid[:, 0] = False
        if dx == 1:
            valid[:, w - 1] = False
    return np.where(valid, cat, 0)


def sao_apply_plane_np(plane: np.ndarray, ctb_size: int,
                       types: np.ndarray, classes: np.ndarray,
                       band_pos: np.ndarray, offsets: np.ndarray,
                       bit_depth: int = 8) -> np.ndarray:
    """Apply SAO to one plane.

    types/classes/band_pos: [ctbs_h, ctbs_w]; offsets: [ctbs_h, ctbs_w, 4].
    ``ctb_size`` in THIS plane's samples.  Returns a new plane.
    """
    h, w = plane.shape
    out = plane.astype(np.int32).copy()
    maxval = (1 << bit_depth) - 1
    ch, cw = types.shape

    # EO: compute whole-plane categories per class once, select per CTB
    cats = None
    for klass in range(4):
        sel = (types == 2) & (classes == klass)
        if not sel.any():
            continue
        cat = _eo_category(plane, klass)
        for (cy, cx) in np.argwhere(sel):
            y0, x0 = cy * ctb_size, cx * ctb_size
            y1, x1 = min(y0 + ctb_size, h), min(x0 + ctb_size, w)
            blk_cat = cat[y0:y1, x0:x1]
            off = np.concatenate([[0], offsets[cy, cx]])  # cat 0..4
            out[y0:y1, x0:x1] = np.clip(
                out[y0:y1, x0:x1] + off[blk_cat], 0, maxval)
    # BO
    shift = bit_depth - 5
    for (cy, cx) in np.argwhere(types == 1):
        y0, x0 = cy * ctb_size, cx * ctb_size
        y1, x1 = min(y0 + ctb_size, h), min(x0 + ctb_size, w)
        blk = out[y0:y1, x0:x1]
        band_tab = np.zeros(32, np.int32)
        for i in range(4):
            band_tab[(band_pos[cy, cx] + i) & 31] = offsets[cy, cx, i]
        out[y0:y1, x0:x1] = np.clip(blk + band_tab[blk >> shift], 0, maxval)
    return out


def _best_offset(cnt: int, dsum: int, lo: int, hi: int):
    """Offset in [lo, hi] minimizing count*o^2 - 2*o*sum; returns (o, dd)."""
    if cnt == 0:
        return 0, 0
    o = int(np.clip(round(dsum / cnt), lo, hi))
    # walk toward zero while it improves (x265 estIterOffset style)
    best_o, best_d = 0, 0
    step = -1 if o > 0 else 1
    while True:
        d = cnt * o * o - 2 * o * dsum
        if d < best_d:
            best_d, best_o = d, o
        if o == 0:
            break
        o += step
    return best_o, best_d


def sao_estimate_plane_np(orig: np.ndarray, rec: np.ndarray, ctb_size: int,
                          bit_depth: int = 8, lam: float = 0.0):
    """Per-CTB best SAO params for one plane.

    Returns (types, classes, band_pos, offsets, dist_delta) arrays; the
    caller does the luma/chroma joint type decision and RD selection.
    dist_delta[cy, cx, option]: option 0 = off, 1..4 = EO class 0..3,
    5 = BO; offsets_all[cy, cx, option, 4].
    """
    h, w = rec.shape
    ch = (h + ctb_size - 1) // ctb_size
    cw = (w + ctb_size - 1) // ctb_size
    diff = orig.astype(np.int64) - rec.astype(np.int64)
    shift = bit_depth - 5

    nctb = ch * cw
    dist = np.zeros((ch, cw, 6), np.int64)
    offs = np.zeros((ch, cw, 6, 4), np.int32)
    band_pos = np.zeros((ch, cw), np.int32)
    bits = np.zeros((ch, cw, 6), np.int32)

    # per-pixel CTB index map (vectorized stats via bincount)
    yy = np.minimum(np.arange(h) // ctb_size, ch - 1)
    xx = np.minimum(np.arange(w) // ctb_size, cw - 1)
    ctb_id = (yy[:, None] * cw + xx[None, :]).ravel()
    dflat = diff.ravel()

    def best_offsets_vec(cnt, dsum, lo, hi):
        """Vectorized _best_offset over arrays: returns (o, dd)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            o0 = np.where(cnt > 0, np.rint(dsum / np.maximum(cnt, 1)), 0)
        o0 = np.clip(o0, lo, hi).astype(np.int64)
        best_o = np.zeros_like(o0)
        best_d = np.zeros_like(o0)
        # candidates walk from the estimate toward zero (|o| <= 7)
        for mag in range(7, 0, -1):
            for sgn in (-1, 1):
                o = sgn * mag
                valid = (np.sign(o0) == sgn) & (np.abs(o0) >= mag)
                d = cnt * o * o - 2 * o * dsum
                take = valid & (d < best_d)
                best_d = np.where(take, d, best_d)
                best_o = np.where(take, o, best_o)
        return best_o.astype(np.int32), best_d

    # EO classes
    for k in range(4):
        cat = _eo_category(rec, k).ravel()
        key = ctb_id * 5 + cat
        cnt = np.bincount(key, minlength=nctb * 5).reshape(nctb, 5)
        dsum = np.bincount(key, weights=dflat,
                           minlength=nctb * 5).reshape(nctb, 5)
        dd_total = np.zeros(nctb, np.int64)
        nb = np.full(nctb, 2, np.int64)
        for c in (1, 2, 3, 4):
            lo, hi = (0, 7) if c <= 2 else (-7, 0)
            o, dd = best_offsets_vec(cnt[:, c].astype(np.int64),
                                     dsum[:, c].astype(np.int64), lo, hi)
            offs[..., 1 + k, c - 1] = o.reshape(ch, cw)
            dd_total += dd
            nb += np.abs(o) + 1
        dist[..., 1 + k] = dd_total.reshape(ch, cw)
        bits[..., 1 + k] = nb.reshape(ch, cw)

    # BO: per-band stats, best 4-consecutive window
    bands = (rec.astype(np.int32) >> shift).ravel()
    keyb = ctb_id * 32 + bands
    bcnt = np.bincount(keyb, minlength=nctb * 32).reshape(nctb, 32)
    bsum = np.bincount(keyb, weights=dflat,
                       minlength=nctb * 32).reshape(nctb, 32)
    bo, bdd = best_offsets_vec(bcnt.astype(np.int64),
                               bsum.astype(np.int64), -7, 7)
    wnd_dd = np.stack([sum(bdd[:, (pos + i) & 31] for i in range(4))
                       for pos in range(32)], axis=1)      # [nctb, 32]
    best_pos = np.argmin(wnd_dd, axis=1)
    best_dd = np.minimum(wnd_dd.min(axis=1), 0)
    wnd_idx = (best_pos[:, None] + np.arange(4)[None, :]) & 31
    bo_sel = np.take_along_axis(bo, wnd_idx, axis=1)
    dist[..., 5] = best_dd.reshape(ch, cw)
    offs[..., 5, :] = bo_sel.reshape(ch, cw, 4)
    band_pos[:] = best_pos.reshape(ch, cw)
    bits[..., 5] = (2 + 5 + np.abs(bo_sel).sum(axis=1)
                    + 8).reshape(ch, cw)
    return dist, offs, band_pos, bits


# ---------------------------------------------------------------------------
# device (jnp) path — estimation, decision, apply
# ---------------------------------------------------------------------------
# The whole SAO stage runs as dense whole-plane math on device: per-class
# category planes via shifts, per-CTB statistics via reshape reductions,
# the x265-style offset walk as a short static loop, and apply via flat
# table gathers.  Replaces the host passes above in the fused per-frame
# pipeline (x265_1.9 source/encoder/sao.cpp calcSaoStatsCu/rdoSaoUnitRow
# role, re-cast as batched tensor ops).

def _eo_category_jnp(p, klass, valid):
    """Per-sample EO category on a padded plane (0 = unfiltered)."""
    import jax.numpy as jnp

    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[klass]
    n0 = jnp.roll(jnp.roll(p, -dy0, axis=0), -dx0, axis=1)
    n1 = jnp.roll(jnp.roll(p, -dy1, axis=0), -dx1, axis=1)
    s = jnp.sign(p - n0) + jnp.sign(p - n1)
    # EDGE_CAT as arithmetic (plane-sized table gathers serialize on TPU):
    # s=-2 -> 1, s=-1 -> 2, s=0 -> 0, s=1 -> 3, s=2 -> 4
    cat = jnp.where(s < 0, s + 3, jnp.where(s > 0, s + 2, 0))
    return jnp.where(valid, cat, 0)


def eo_valid_masks_np(ph, pw, coded_w, coded_h):
    """Static per-class EO validity masks on the padded plane: the sample
    and both its neighbors must lie inside the CODED picture."""
    out = []
    xx = np.arange(pw)[None, :]
    yy = np.arange(ph)[:, None]
    inside = (xx < coded_w) & (yy < coded_h)
    for (dy0, dx0), (dy1, dx1) in EO_NEIGHBORS:
        v = inside.copy()
        for (dy, dx) in ((dy0, dx0), (dy1, dx1)):
            if dy == -1:
                v &= yy > 0
            if dy == 1:
                v &= yy < coded_h - 1
            if dx == -1:
                v &= xx > 0
            if dx == 1:
                v &= xx < coded_w - 1
        out.append(np.broadcast_to(v, (ph, pw)).copy())
    return np.stack(out), np.broadcast_to(inside, (ph, pw)).copy()


def _best_offsets_jnp(cnt, dsum, lo, hi):
    """Vectorized x265 estIterOffset walk: returns (offset, dist_delta)."""
    import jax.numpy as jnp

    o0 = jnp.where(cnt > 0, jnp.round(dsum / jnp.maximum(cnt, 1.0)), 0.0)
    o0 = jnp.clip(o0, lo, hi)
    best_o = jnp.zeros_like(o0)
    best_d = jnp.zeros_like(o0)
    for mag in range(7, 0, -1):
        for sgn in (-1.0, 1.0):
            o = sgn * mag
            valid = (jnp.sign(o0) == sgn) & (jnp.abs(o0) >= mag)
            d = cnt * o * o - 2.0 * o * dsum
            take = valid & (d < best_d)
            best_d = jnp.where(take, d, best_d)
            best_o = jnp.where(take, o, best_o)
    return best_o, best_d


def sao_estimate_plane_jnp(orig, rec, ctbs_h, ctbs_w, ctb, eo_valid,
                           inside, bit_depth=8):
    """Device per-CTB SAO statistics for one (padded) plane.

    orig/rec: [PH, PW] int32; eo_valid [4, PH, PW] + inside [PH, PW] from
    eo_valid_masks_np.  Returns (dist [ch, cw, 6] f32, offs [ch, cw, 6, 4]
    f32, band_pos [ch, cw] int32, bits [ch, cw, 6] f32) — same layout as
    sao_estimate_plane_np (option 0 = off, 1..4 = EO class, 5 = BO).
    """
    import jax.numpy as jnp

    diff = (orig - rec).astype(jnp.float32)
    shift = bit_depth - 5

    def ctb_sum_k(x):
        """[PH, PW, K] -> [ch, cw, K] per-CTB sums."""
        k = x.shape[-1]
        return x.reshape(ctbs_h, ctb, ctbs_w, ctb, k).sum(axis=(1, 3))

    dist = [jnp.zeros((ctbs_h, ctbs_w), jnp.float32)]
    offs = [jnp.zeros((ctbs_h, ctbs_w, 4), jnp.float32)]
    bits = [jnp.zeros((ctbs_h, ctbs_w), jnp.float32)]
    lohi = ((0.0, 7.0), (0.0, 7.0), (-7.0, 0.0), (-7.0, 0.0))
    for k in range(4):
        cat = _eo_category_jnp(rec, k, eo_valid[k])
        oh = (cat[..., None] == jnp.arange(1, 5)).astype(jnp.float32)
        cnt = ctb_sum_k(oh)                       # [ch, cw, 4]
        dsum = ctb_sum_k(oh * diff[..., None])
        lo = jnp.asarray([v[0] for v in lohi])
        hi = jnp.asarray([v[1] for v in lohi])
        o, dd = _best_offsets_jnp(cnt, dsum, lo, hi)
        dist.append(dd.sum(axis=-1))
        offs.append(o)
        bits.append(2.0 + (jnp.abs(o) + 1.0).sum(axis=-1))

    # BO: 32-band stats, best 4-band window
    band = (rec >> shift)
    oh = ((band[..., None] == jnp.arange(32)) & inside[..., None]
          ).astype(jnp.float32)
    bcnt = ctb_sum_k(oh)                          # [ch, cw, 32]
    bsum = ctb_sum_k(oh * diff[..., None])
    bo, bdd = _best_offsets_jnp(bcnt, bsum, -7.0, 7.0)
    wnd_dd = jnp.stack(
        [sum(bdd[..., (pos + i) & 31] for i in range(4))
         for pos in range(32)], axis=-1)     # [ch, cw, 32]
    best_pos = jnp.argmin(wnd_dd, axis=-1).astype(jnp.int32)
    best_dd = jnp.minimum(jnp.min(wnd_dd, axis=-1), 0.0)
    wnd_idx = (best_pos[..., None] + jnp.arange(4)[None, None, :]) & 31
    bo_sel = jnp.take_along_axis(bo, wnd_idx, axis=-1)
    dist.append(best_dd)
    offs.append(bo_sel)
    bits.append(2.0 + 5.0 + jnp.abs(bo_sel).sum(axis=-1) + 8.0)
    return (jnp.stack(dist, axis=-1), jnp.stack(offs, axis=-2),
            best_pos, jnp.stack(bits, axis=-1))


def sao_apply_plane_jnp(plane, ctbs_h, ctbs_w, ctb, types, classes,
                        band_pos, offsets, eo_valid, bit_depth=8):
    """Device SAO apply on a padded plane.

    types/classes/band_pos [ch, cw] int32; offsets [ch, cw, 4] (signed
    applied values); eo_valid [4, PH, PW].  Returns the filtered plane.
    """
    import jax.numpy as jnp

    maxval = (1 << bit_depth) - 1

    def rep(a):
        """Broadcast a per-CTB [ch, cw] map to per-pixel [PH, PW]."""
        return jnp.repeat(jnp.repeat(a.astype(jnp.int32), ctb, 0), ctb, 1)

    # per-pixel EO category under each CTB's class
    cats = jnp.stack([_eo_category_jnp(plane, k, eo_valid[k])
                      for k in range(4)])             # [4, PH, PW]
    kmap = rep(classes)                               # class per pixel
    cat = sum(jnp.where(kmap == k, cats[k], 0) for k in range(4))

    # offsets as per-pixel selects — dense [PH, PW] gathers from per-CTB
    # tables cost ~70 ms/plane at 1080p on TPU (XLA lowers them to
    # serialized dynamic-slices); four compare+select plane passes are
    # ~30x cheaper for the same result
    offp = [rep(offsets[..., i]) for i in range(4)]
    eo_off = sum(jnp.where(cat == i + 1, offp[i], 0) for i in range(4))

    band = plane >> (bit_depth - 5)
    bo_off = sum(jnp.where(band == rep((band_pos + i) & 31), offp[i], 0)
                 for i in range(4))

    tmap = rep(types)
    off = jnp.where(tmap == 2, eo_off, jnp.where(tmap == 1, bo_off, 0))
    return jnp.clip(plane + off, 0, maxval)
