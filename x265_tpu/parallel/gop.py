"""GOP-parallel multi-chip encoding: the REAL encoder under shard_map.

The reference scales across frames with one FrameEncoder thread per
in-flight frame plus a recon-row lag protocol
(x265_1.9/source/encoder/encoder.cpp:646-664 round-robin;
doc/reST/threading.rst:125-152).  The TPU-native shape avoids the
cross-device recon wait entirely: closed GOPs are mutually independent
(each starts with an IDR), so a mesh axis of G devices encodes G GOPs
concurrently — SURVEY §2.6 P2/P9.  Every device runs the SAME fused
per-frame device programs (device_pipeline.build_i_pipeline /
build_p_pipeline) on its own GOP's frame via ``shard_map``; the host
runs the per-GOP entropy passes (native C CABAC) on the gathered syntax
and concatenates the per-GOP streams in order.

With CQP the result is BIT-EXACT with the single-device sequential
encode of the same frames (keyint == gop_size): the device programs are
deterministic and see identical inputs — the multi-chip guarantee the
reference documents for deterministic frame counts (x265.h:442-447).
ABR/CRF run per-GOP (each shard owns a full RateControl): every GOP's
stream is bit-exact with the sequential encode of that GOP alone, the
deterministic contract x265 documents for frame-parallel ABR.

Scope: IPPP GOPs (anchors only).  B mini-GOPs inside each shard are the
same batched dispatch the single-chip path uses and land here next.
"""

from __future__ import annotations

import numpy as np

from ..common.params import Params
from ..encoder.intra_encoder import Encoder, _BatchFetch


class GopParallelEncoder:
    """Encode G closed GOPs concurrently on a G-device mesh axis.

    Each GOP gets its own host-side Encoder (headers, PicSyntax, CABAC,
    rate control at CQP); the per-frame device work of all G GOPs runs
    as ONE sharded program pair per round (round r = frame r of every
    GOP).
    """

    def __init__(self, params: Params, mesh=None, axis: str = "gop"):
        import jax
        from jax.sharding import Mesh

        assert params.bframes == 0, "GOP-parallel v1 is IPPP"
        # Rate control: each GOP runs its own independent RateControl
        # (CQP/CRF/ABR).  Determinism contract: every GOP's output equals
        # the sequential encode of that GOP alone with the same params —
        # per-GOP RC state never crosses shards (the relaxation x265
        # documents for frame-parallel ABR, x265.h:442-447; cross-GOP
        # bit budgeting is a non-goal at closed-GOP granularity).
        self.params = params
        if mesh is None:
            devs = jax.devices()
            mesh = Mesh(np.array(devs), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.G = mesh.shape[axis]
        # per-GOP host encoders (entropy/syntax state); device dispatch
        # is replaced by the sharded round programs below
        self.encoders = [Encoder(params) for _ in range(self.G)]
        for e in self.encoders:
            # scenecut would re-encode mid-GOP; GOP boundaries are fixed
            e.params = params
        self._i_sharded = None
        self._p_prep_sharded = None
        self._p_main_sharded = None

    # -- sharded program construction ----------------------------------------

    def _build(self):
        import jax
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..encoder.device_pipeline import (build_i_pipeline,
                                               build_p_pipeline)

        e0 = self.encoders[0]
        i_raw = build_i_pipeline(e0).raw
        p_pipe = build_p_pipeline(e0, nr=e0.num_ref)
        p_prep_raw, p_main_raw = p_pipe.prep_raw, p_pipe.main_raw
        mesh, axis = self.mesh, self.axis

        def shardify(raw):
            def body(*args):
                loc = jax.tree.map(lambda a: a[0], args)
                out = raw(*loc)
                return jax.tree.map(lambda x: x[None], out)

            cache = {}

            def wrapper(*args):
                if "fn" not in cache:   # shapes are fixed per encoder
                    specs_in = jax.tree.map(lambda _: P(axis), args)
                    out_shape = jax.eval_shape(body, *args)
                    specs_out = jax.tree.map(lambda _: P(axis), out_shape)
                    # the wavefront lax.scan seeds its carry with zeros
                    # created inside the body (unvarying); disable the
                    # varying-manual-axes check rather than pcast every
                    # carry leaf
                    try:
                        sm = shard_map(body, mesh=mesh, in_specs=specs_in,
                                       out_specs=specs_out, check_vma=False)
                    except TypeError:
                        sm = shard_map(body, mesh=mesh, in_specs=specs_in,
                                       out_specs=specs_out, check_rep=False)
                    cache["fn"] = jax.jit(sm)
                return cache["fn"](*args)

            return wrapper

        self._i_sharded = shardify(i_raw)
        self._p_prep_sharded = shardify(p_prep_raw)
        self._p_main_sharded = shardify(p_main_raw)

    # -- encode ---------------------------------------------------------------

    def encode(self, gops: list[list]) -> list[bytes]:
        """gops: G lists of (Y, Cb, Cr) frames, one list per device (all
        the same length; each list becomes one closed IDR GOP).  Returns
        the G Annex-B streams (headers + AUs), one per GOP — concatenate
        for a single keyint=len(gop) stream."""
        import jax

        assert len(gops) == self.G, f"need exactly {self.G} GOPs"
        n = len(gops[0])
        assert all(len(g) == n for g in gops), "equal-length GOPs"
        if self._i_sharded is None:
            self._build()

        encs = self.encoders
        outs = [[] for _ in range(self.G)]
        num_ref = encs[0].num_ref
        ext_hist: list = []             # nearest-first device ref history
        for r in range(n):
            kind = "I" if r == 0 else "P"
            pends = []
            for k, e in enumerate(encs):
                pend = e._dispatch_one(
                    gops[k][r], r, kind,
                    l0_poc=None if r == 0 else r - 1,
                    # ABR/CRF: per-frame complexity from the inline
                    # half-res estimate (deterministic per GOP); CQP
                    # ignores satd so skip the estimate entirely
                    cplx=0.0 if self.params.rc_mode == 0 else None,
                    defer_b=False, defer_all=True)
                pends.append(pend)
            oy = np.stack([p.orig[0] for p in pends])
            ocb = np.stack([p.orig[1] for p in pends])
            ocr = np.stack([p.orig[2] for p in pends])
            qs = [np.stack([p.qp_arrays[i] for p in pends])
                  for i in range(5)]
            fq = [np.stack([p.filter_qps[i] for p in pends])
                  for i in range(4)]
            if r == 0:
                small, tails, ext = self._i_sharded(
                    oy, ocb, ocr, qs[0], qs[1], qs[2], qs[3],
                    fq[0], fq[1], fq[2], fq[3], qs[4])
            else:
                wys = np.array([p.wp[0] for p in pends], np.int32)
                wos = np.array([p.wp[1] for p in pends], np.int32)
                # same padded-slot reference feed as the sequential
                # _dispatch_p (dup of the farthest ref can never win
                # the ref_idx argmin) — keeps bit-exactness
                hist = ext_hist + [ext_hist[-1]] * (num_ref
                                                    - len(ext_hist))
                pocs = [r - 1 - i for i in range(len(ext_hist))]
                pocs = pocs + [pocs[-1]] * (num_ref - len(pocs))
                ref_pocs = np.tile(np.asarray(pocs, np.int32),
                                   (self.G, 1))
                refs_y = tuple(h[0] for h in hist)
                refs_cb = tuple(h[1] for h in hist)
                refs_cr = tuple(h[2] for h in hist)
                from ..encoder.device_pipeline import ref_idx_bits
                rbits = np.tile(ref_idx_bits(num_ref, len(ext_hist)),
                                (self.G, 1))
                prep_out = self._p_prep_sharded(oy, refs_y, refs_cb,
                                                refs_cr, fq[0], rbits,
                                                wys, wos)
                (modes, mode32, mv, rsel, inter, pred_y, pred_cb,
                 pred_cr, cost_p, cost_i) = prep_out
                small, tails, ext = self._p_main_sharded(
                    oy, ocb, ocr, modes, mode32, mv, rsel, inter,
                    pred_y, pred_cb, pred_cr,
                    qs[0], qs[1], qs[2], qs[3],
                    fq[0], fq[1], fq[2], fq[3], qs[4], ref_pocs)
                small = dict(small, modes=modes, mode32=mode32,
                             mv=np.asarray(mv).astype(np.int16),
                             ref_idx=rsel,
                             inter=inter, cost_p=cost_p, cost_i=cost_i)
            ext_hist = [ext] + ext_hist[:num_ref - 1]
            for e, pend in zip(encs, pends):
                e._after_anchor(pend, idr=(r == 0))
            handle = _BatchFetch(small)
            handle.start()
            # host finish per GOP (entropy order within a GOP is strict;
            # across GOPs it is embarrassingly parallel)
            for k, (e, pend) in enumerate(zip(encs, pends)):
                pend.out_dev = (handle, tails)
                pend.batch_idx = k
                ef = e._finish_one(pend)
                outs[k].append(ef.au)
        return [encs[k].headers() + b"".join(outs[k])
                for k in range(self.G)]


def encode_gop_parallel(frames: list, params: Params, mesh=None,
                        gop_size: int | None = None) -> bytes:
    """Split ``frames`` into G equal closed GOPs (G = mesh size), encode
    them concurrently, and return the concatenated Annex-B stream —
    byte-identical to a single-device sequential encode with
    keyint == gop_size at CQP."""
    import jax

    enc = GopParallelEncoder(params, mesh=mesh)
    G = enc.G
    if gop_size is None:
        gop_size = len(frames) // G
    assert gop_size * G == len(frames), \
        f"need {G} equal GOPs (got {len(frames)} frames)"
    gops = [frames[k * gop_size:(k + 1) * gop_size] for k in range(G)]
    streams = enc.encode(gops)
    # one headers block up front; per-GOP headers stripped after the first
    hdr = enc.encoders[0].headers()
    return hdr + b"".join(s[len(hdr):] for s in streams)
