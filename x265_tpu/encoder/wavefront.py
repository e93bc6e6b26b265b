"""Device wavefront intra reconstruction — the TPU-native replacement for
the reference's WPP thread runtime (SURVEY.md §2.6 P1).

The closed-loop intra dependency (each block predicts from reconstructed
neighbors) is the one part of an intra encoder that cannot be flatly
batched.  Design split:

  * HOST (this module, cached per geometry): builds the dependency DAG from
    normative z-scan availability (§6.4.1) and levelizes it — every block
    whose reference samples are ready runs in the same level.  All gather /
    scatter / availability index tensors are precomputed as static arrays.
  * DEVICE: one ``lax.scan`` over levels; each step is a fully batched
    gather -> reference substitution -> 35-mode-weight matmul (MXU) ->
    residual -> DCT -> quant -> dequant -> IDCT -> clip -> scatter.

Encoder and decoder share the step; the encoder additionally quantizes,
the decoder consumes parsed coefficient levels.  Output is bit-exact with
the numpy spec path (common/recon.py) — asserted by tests/test_wavefront.py.

v1 scope: fixed-size square blocks (the encoder's fixed analysis CU), coded
size divisible by the block size.  The variable-CU schedule generalizes by
levelizing TU leaves instead of grid blocks (same machinery).
"""

from __future__ import annotations

import functools

import numpy as np

from ..common.geometry import PictureGeometry, intra_neighbor_coords
from ..ops.intra import DC, HOR, VER, _weight_tensor


@functools.lru_cache(maxsize=8)
def build_schedule(width: int, height: int, log2_ctb: int, n: int,
                   chroma_shift: int = 0):
    """Static wavefront schedule for an n-sized block grid.

    For chroma (chroma_shift=1): n is the CHROMA block size, the grid is the
    chroma plane's, and availability is evaluated in luma coords (as the
    spec does).  Returns a dict of numpy arrays:
      lvl_blk   [L, Lmax]       flat block index (B = dummy for idle lanes)
      ref_idx   [L, Lmax, R]    gather indices into the flat plane
      ref_avail [L, Lmax, R]    availability mask
      sct_idx   [L, Lmax, n*n]  scatter indices (H*W = dummy slot)
      n_levels, lane count, grid shape
    """
    g = PictureGeometry(width, height, log2_ctb, 3)
    pw = (g.ctbs_w << log2_ctb) >> chroma_shift
    ph = (g.ctbs_h << log2_ctb) >> chroma_shift
    assert pw % n == 0 and ph % n == 0
    gw, gh = pw // n, ph // n
    nblocks = gw * gh
    r = 4 * n + 1

    lvl = np.zeros((gh, gw), np.int32)
    ref_x = np.zeros((gh * gw, r), np.int64)
    ref_y = np.zeros((gh * gw, r), np.int64)
    avail = np.zeros((gh * gw, r), bool)
    # levelize in DECODE (z-scan) order: every dependency has a smaller
    # z index, so its level is final when read (raster order is NOT safe —
    # below-left deps point to blocks later in raster order)
    order = sorted(
        ((by, bx) for by in range(gh) for bx in range(gw)),
        key=lambda p: int(g.zscan[((p[0] * n) << chroma_shift) >> 2,
                                  ((p[1] * n) << chroma_shift) >> 2]))
    # Blocks fully outside the picture (CTB padding) are not coded at all.
    # Blocks CROSSING the picture edge are coded as smaller CUs — they go to
    # the host strip pass, as does (transitively) any block whose available
    # reference samples touch a host-pass block (fixpoint below).
    in_pic = np.zeros((gh, gw), bool)
    crossing = np.zeros((gh, gw), bool)
    dep_list = [[] for _ in range(gh * gw)]
    for (by, bx) in order:
            b = by * gw + bx
            x0, y0 = bx * n, by * n
            if (x0 << chroma_shift) >= g.width or \
               (y0 << chroma_shift) >= g.height:
                lvl[by, bx] = -1
                continue
            if ((x0 + n) << chroma_shift) > g.width or \
               ((y0 + n) << chroma_shift) > g.height:
                crossing[by, bx] = True
            in_pic[by, bx] = True
            xs, ys = intra_neighbor_coords(x0, y0, n)
            av = g.avail_rows(x0 << chroma_shift, y0 << chroma_shift,
                              xs << chroma_shift, ys << chroma_shift)
            ref_x[b] = np.clip(xs, 0, pw - 1)
            ref_y[b] = np.clip(ys, 0, ph - 1)
            avail[b] = av
            deps = set()
            for a, X, Y in zip(av, xs, ys):
                if a:
                    deps.add((int(Y) // n) * gw + int(X) // n)
            deps.discard(b)
            dep_list[b] = sorted(deps)
            m = 0
            for d in deps:
                dy, dx = d // gw, d % gw
                if 0 <= dy < gh and 0 <= dx < gw:
                    m = max(m, lvl[dy, dx] + 1)
            lvl[by, bx] = m

    # fixpoint: unschedule any block depending on an unscheduled in-picture
    # block (edge-crossing blocks and their transitive dependents run in the
    # host strip pass in z order, after the device scan)
    scheduled = in_pic & ~crossing
    changed = True
    while changed:
        changed = False
        for (by, bx) in order:
            b = by * gw + bx
            if not scheduled[by, bx]:
                continue
            for d in dep_list[b]:
                if in_pic[d // gw, d % gw] and not scheduled[d // gw, d % gw]:
                    scheduled[by, bx] = False
                    changed = True
                    break

    host_mask = in_pic & ~scheduled
    if not scheduled.any():
        return dict(n_levels=0, host_mask=host_mask, grid=(gh, gw),
                    plane=(ph, pw), n=n, lmax=0)

    n_levels = int(lvl[scheduled].max()) + 1
    counts = np.bincount(lvl[scheduled].ravel(), minlength=n_levels)
    lmax = int(counts.max())

    lvl_blk = np.full((n_levels, lmax), nblocks, np.int32)     # dummy = B
    ref_idx = np.zeros((n_levels, lmax, r), np.int32)
    ref_avail = np.zeros((n_levels, lmax, r), bool)
    sct_idx = np.full((n_levels, lmax, n * n), pw * ph, np.int32)
    fill = np.zeros(n_levels, np.int32)
    oy, ox = np.mgrid[0:n, 0:n]
    for by in range(gh):
        for bx in range(gw):
            if not scheduled[by, bx]:
                continue
            b = by * gw + bx
            li = int(lvl[by, bx])
            k = fill[li]
            fill[li] = k + 1
            lvl_blk[li, k] = b
            ref_idx[li, k] = (ref_y[b] * pw + ref_x[b]).astype(np.int32)
            ref_avail[li, k] = avail[b]
            sct_idx[li, k] = ((by * n + oy) * pw + bx * n + ox).ravel()

    return dict(lvl_blk=lvl_blk, ref_idx=ref_idx, ref_avail=ref_avail,
                sct_idx=sct_idx, n_levels=n_levels, lmax=lmax,
                grid=(gh, gw), plane=(ph, pw), n=n, host_mask=host_mask)


def _substitute(samples, avail, bit_depth):
    """Vectorized §8.4.4.2.2 (same math as ops.intra.substitute_references)."""
    import jax
    import jax.numpy as jnp
    lanes, r = samples.shape
    idx = jnp.arange(r, dtype=jnp.int32)[None, :]
    last = jax.lax.cummax(jnp.where(avail, idx, -1), axis=1)
    first = jnp.argmax(avail, axis=1)
    any_avail = jnp.any(avail, axis=1)
    src = jnp.where(last >= 0, last, first[:, None])
    filled = jnp.take_along_axis(samples, src, axis=1)
    return jnp.where(any_avail[:, None], filled,
                     jnp.int32(1 << (bit_depth - 1)))


def _predict_lanes(refs, modes, n, is_luma, bit_depth):
    """Per-lane single-mode intra prediction: refs [Lx, R] int32 substituted,
    modes [Lx] -> pred [Lx, n, n] int32.  Mirrors ops.intra.predict_all_modes
    but computes only the chosen mode per lane.

    Gather-free: per-lane mode selection runs as a one-hot contraction
    (gathering the [35, N*N, R] weight tensor per lane serializes on
    XLA:TPU and miscompiled on XLA:CPU inside scan bodies — jax 0.9.0).
    The two einsums are exact in f32: weights <= 32 and samples <= 1023
    keep every partial sum below 2^24 (see ops/intra.predict_all_modes),
    and the one-hot select adds a single 1.0-weighted term."""
    import jax
    import jax.numpy as jnp

    W, shift, add, filt = _weight_tensor(n)
    lanes = refs.shape[0]
    filtered = refs.at[:, 1:-1].set(
        (refs[:, :-2] + 2 * refs[:, 1:-1] + refs[:, 2:] + 2) >> 2)
    onehot = (modes[:, None] == jnp.arange(35, dtype=jnp.int32)
              ).astype(jnp.float32)                    # [Lx, 35]
    use_filt = ((onehot @ jnp.asarray(filt, jnp.float32)) > 0.5
                if is_luma else jnp.zeros((lanes,), bool))
    ref_sel = jnp.where(use_filt[:, None], filtered, refs)

    Wf = jnp.asarray(W.reshape(35, -1), jnp.float32)   # [35, N*N*R]
    r_len = W.shape[-1]
    acc_all = jnp.einsum(
        "mq,lm->lq", Wf * 1.0, onehot,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).reshape(lanes, n * n, r_len)
    acc = jnp.einsum("lpr,lr->lp", acc_all,
                     ref_sel.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    sh = (onehot @ jnp.asarray(shift, jnp.float32)).astype(jnp.int32)[:, None]
    ad = (onehot @ jnp.asarray(add, jnp.float32)).astype(jnp.int32)[:, None]
    pred = ((acc + ad) >> sh).reshape(lanes, n, n)

    if is_luma and n < 32:
        maxval = (1 << bit_depth) - 1
        left = refs[:, 2 * n - 1: n - 1: -1]
        top = refs[:, 2 * n + 1: 3 * n + 1]
        corner = refs[:, 2 * n]
        dc = (jnp.sum(left, axis=1) + jnp.sum(top, axis=1) + n) >> (
            n.bit_length())
        row0 = (top + 3 * dc[:, None] + 2) >> 2
        col0 = (left + 3 * dc[:, None] + 2) >> 2
        c00 = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        is_dc = (modes == DC)[:, None]
        pred = pred.at[:, 0, :].set(
            jnp.where(is_dc, row0, pred[:, 0, :]))
        pred = pred.at[:, :, 0].set(
            jnp.where(is_dc, col0, pred[:, :, 0]))
        pred = pred.at[:, 0, 0].set(
            jnp.where(is_dc[:, 0], c00, pred[:, 0, 0]))
        ver_col = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1),
                           0, maxval)
        hor_row = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1),
                           0, maxval)
        pred = pred.at[:, :, 0].set(
            jnp.where((modes == VER)[:, None], ver_col, pred[:, :, 0]))
        pred = pred.at[:, 0, :].set(
            jnp.where((modes == HOR)[:, None], hor_row, pred[:, 0, :]))
    return pred


class WavefrontIntraRecon:
    """Device wavefront reconstruction for one plane at fixed block size."""

    def __init__(self, width: int, height: int, log2_ctb: int, n: int, *,
                 is_luma: bool, chroma_shift: int = 0, bit_depth: int = 8,
                 sign_hide: bool = False):
        self.sched = build_schedule(width, height, log2_ctb, n, chroma_shift)
        self.n = n
        self.is_luma = is_luma
        self.bit_depth = bit_depth
        self.sign_hide = sign_hide
        self._encode_jit = None
        self._decode_jit = None

    # -- device step ---------------------------------------------------------

    def _make_scan(self, encode: bool, inter: bool = False):
        import jax
        import jax.numpy as jnp

        from ..ops.quantize import (dequant, quant, quant_masked,
                                    sign_hide_diag)
        from ..ops.transforms import forward_transform, inverse_transform

        s = self.sched
        n, bd, is_luma = self.n, self.bit_depth, self.is_luma
        ph, pw = s["plane"]
        nblocks = s["grid"][0] * s["grid"][1]
        use_dst = is_luma and n == 4

        xs_all = (jnp.asarray(s["lvl_blk"]), jnp.asarray(s["ref_idx"]),
                  jnp.asarray(s["ref_avail"]), jnp.asarray(s["sct_idx"]))

        def step(carry, xs):
            plane_flat, blocks, qp = carry     # blocks: orig (enc) / levels (dec)
            blk, ridx, ravail, sidx = xs
            samples = plane_flat[ridx]                         # [Lx, R]
            ref = _substitute(samples, ravail, bd)
            modes = blocks["modes"][blk]                       # dummy-safe
            pred = _predict_lanes(ref, modes, n, is_luma, bd)
            if inter:
                use_ov = blocks["is_inter"][blk]               # [Lx] bool
                pred = jnp.where(use_ov[:, None, None],
                                 blocks["ipred"][blk], pred)
            if encode:
                orig = blocks["data"][blk]                     # [Lx, n, n]
                resi = orig - pred
                coef = forward_transform(resi, bd, dst=use_dst)
                if inter:
                    levels = quant_masked(coef, qp, ~use_ov, bd)
                else:
                    levels = quant(coef, qp, bd, intra=True)
                if self.sign_hide:
                    # TU scans on this path are always diagonal
                    levels = sign_hide_diag(levels)
            else:
                levels = blocks["data"][blk]
            dq = dequant(levels, qp, bd)
            r2 = inverse_transform(dq, bd, dst=use_dst)
            has_coef = jnp.any(levels != 0, axis=(1, 2))[:, None, None]
            rec = jnp.clip(jnp.where(has_coef, pred + r2, pred),
                           0, (1 << bd) - 1)
            plane_flat = plane_flat.at[sidx.reshape(-1)].set(
                rec.reshape(-1), mode="drop")
            return (plane_flat, blocks, qp), (levels if encode else None)

        out_dtype = jnp.uint8 if bd == 8 else jnp.uint16

        def run(data, modes, qp, inter_pred=None, is_inter=None):
            # data: [B, n, n] orig (enc) or levels (dec); modes: [B]
            pad = jnp.zeros((1, n, n), jnp.int32)
            blocks = dict(data=jnp.concatenate([data.astype(jnp.int32),
                                                pad]),
                          modes=jnp.concatenate(
                              [modes, jnp.zeros((1,), modes.dtype)]))
            if inter:
                blocks["ipred"] = jnp.concatenate(
                    [inter_pred.astype(jnp.int32), pad])
                blocks["is_inter"] = jnp.concatenate(
                    [jnp.asarray(is_inter, bool), jnp.zeros((1,), bool)])
            plane_flat = jnp.zeros((ph * pw + 1,), jnp.int32)
            (plane_flat, _, _), levels = jax.lax.scan(
                step, (plane_flat, blocks, qp), xs_all)
            # compact dtypes: recon fits the bit depth, levels fit int16 —
            # halves/quarters the device->host transfer (the tunnel is the
            # bottleneck at ~30 MB/s)
            plane = plane_flat[:-1].reshape(ph, pw).astype(out_dtype)
            if encode:
                # levels: [L, Lmax, n, n] -> scatter back to block order
                out = jnp.zeros((nblocks + 1, n, n), jnp.int16)
                out = out.at[s["lvl_blk"].reshape(-1)].set(
                    levels.reshape(-1, n, n).astype(jnp.int16), mode="drop")
                return plane, out[:-1]
            return plane

        return run

    # -- public --------------------------------------------------------------

    def scan_fn(self, encode: bool, inter: bool = False):
        """The raw (unjitted) scan callable, for fusing several planes'
        scans into one device dispatch."""
        return self._make_scan(encode=encode, inter=inter)

    def paired_scan_fn(self, encode: bool, inter: bool = False):
        """A scan that processes TWO planes sharing this schedule (Cb+Cr)
        in one lax.scan: lanes are doubled, the carry holds both planes.
        Same bit-exact math — halves the sequential scan count.

        run2((data_a, data_b), modes, (qp_a, qp_b)[, (ipred_a, ipred_b),
        is_inter]) -> ((plane_a, levels_a), (plane_b, levels_b))."""
        import jax
        import jax.numpy as jnp

        from ..ops.quantize import dequant, quant_masked
        from ..ops.transforms import forward_transform, inverse_transform

        s = self.sched
        n, bd, is_luma = self.n, self.bit_depth, self.is_luma
        assert not (is_luma and n == 4)
        ph, pw = s["plane"]
        flat = ph * pw + 1
        nblocks = s["grid"][0] * s["grid"][1]

        ridx2 = np.stack([s["ref_idx"], s["ref_idx"] + flat], axis=2)
        sidx2 = np.stack([s["sct_idx"], s["sct_idx"] + flat], axis=2)
        xs_all = (jnp.asarray(s["lvl_blk"]),
                  jnp.asarray(ridx2.reshape(s["n_levels"], -1,
                                            4 * n + 1)),
                  jnp.asarray(np.repeat(s["ref_avail"], 2, axis=1)
                              .reshape(s["n_levels"], -1, 4 * n + 1)),
                  jnp.asarray(sidx2.reshape(s["n_levels"], -1, n * n)))
        # lane order per level: [blk0_a, blk0_b, blk1_a, blk1_b, ...]

        sh_flag = self.sign_hide

        def step(carry, xs):
            planes_flat, blocks, qps = carry
            blk, ridx, ravail, sidx = xs
            lanes = ridx.shape[0]
            samples = planes_flat[ridx]
            ref = _substitute(samples, ravail, bd)
            blk2 = jnp.repeat(blk, 2)
            modes = blocks["modes"][blk2]
            pred = _predict_lanes(ref, modes, n, is_luma, bd)
            # per-lane plane id: 0, 1, 0, 1, ...
            pid = jnp.tile(jnp.arange(2), lanes // 2)
            lane_qp = qps[pid]
            data_idx = blk2 * 2 + pid           # blocks stored interleaved
            if inter:
                use_ov = blocks["is_inter"][blk2]
                pred = jnp.where(use_ov[:, None, None],
                                 blocks["ipred"][data_idx], pred)
            if encode:
                orig = blocks["data"][data_idx]
                resi = orig - pred
                coef = forward_transform(resi, bd, dst=False)
                imask = (~use_ov) if inter else jnp.ones((lanes,), bool)
                levels = quant_masked(coef, lane_qp, imask, bd)
                if sh_flag:
                    from ..ops.quantize import sign_hide_diag
                    levels = sign_hide_diag(levels)
            else:
                levels = blocks["data"][data_idx]
            dq = dequant(levels, lane_qp, bd)
            r2 = inverse_transform(dq, bd, dst=False)
            has_coef = jnp.any(levels != 0, axis=(1, 2))[:, None, None]
            rec = jnp.clip(jnp.where(has_coef, pred + r2, pred),
                           0, (1 << bd) - 1)
            planes_flat = planes_flat.at[sidx.reshape(-1)].set(
                rec.reshape(-1), mode="drop")
            return (planes_flat, blocks, qps), (levels if encode else None)

        out_dtype = jnp.uint8 if bd == 8 else jnp.uint16

        def run2(datas, modes, qps, ipreds=None, is_inter=None):
            pad = jnp.zeros((1, n, n), jnp.int32)
            # interleave the two planes' block data: [2B+2, n, n]
            def ilv(a, b):
                st = jnp.stack([jnp.concatenate([a.astype(jnp.int32), pad]),
                                jnp.concatenate([b.astype(jnp.int32), pad])],
                               axis=1)
                return st.reshape(-1, n, n)

            blocks = dict(data=ilv(datas[0], datas[1]),
                          modes=jnp.concatenate(
                              [modes, jnp.zeros((1,), modes.dtype)]))
            if inter:
                blocks["ipred"] = ilv(ipreds[0], ipreds[1])
                blocks["is_inter"] = jnp.concatenate(
                    [jnp.asarray(is_inter, bool), jnp.zeros((1,), bool)])
            planes_flat = jnp.zeros((2 * flat,), jnp.int32)
            qps_v = jnp.stack([jnp.asarray(qps[0], jnp.int32),
                               jnp.asarray(qps[1], jnp.int32)])
            (planes_flat, _, _), levels = jax.lax.scan(
                step, (planes_flat, blocks, qps_v), xs_all)
            outs = []
            for p_i in range(2):
                pl = planes_flat[p_i * flat:(p_i + 1) * flat - 1].reshape(
                    ph, pw).astype(out_dtype)
                if encode:
                    lv = levels.reshape(s["n_levels"], -1, 2, n, n)[:, :, p_i]
                    out = jnp.zeros((nblocks + 1, n, n), jnp.int16)
                    out = out.at[s["lvl_blk"].reshape(-1)].set(
                        lv.reshape(-1, n, n).astype(jnp.int16), mode="drop")
                    outs.append((pl, out[:-1]))
                else:
                    outs.append(pl)
            return tuple(outs)

        return run2

    def encode(self, orig_blocks, modes, qp):
        """orig_blocks [B, n, n], modes [B] int32, qp int ->
        (recon plane [ph, pw] uint8/uint16, levels [B, n, n] int16)."""
        import jax
        import jax.numpy as jnp
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self._make_scan(encode=True))
        return self._encode_jit(jnp.asarray(orig_blocks),
                                jnp.asarray(modes, jnp.int32),
                                jnp.int32(qp))

    def decode(self, levels, modes, qp):
        """levels [B, n, n], modes [B] -> recon plane."""
        import jax
        import jax.numpy as jnp
        if self._decode_jit is None:
            self._decode_jit = jax.jit(self._make_scan(encode=False))
        return self._decode_jit(jnp.asarray(levels),
                                jnp.asarray(modes, jnp.int32),
                                jnp.int32(qp))
