"""Pallas TPU kernel for sub-pel motion refinement.

The jnp refine_round (device_pipeline._inter_tools_builder) evaluates 9
qpel candidates per round through mc_luma_batch + SATD; the einsum
formulation materializes ~1 GB of int32 intermediates per round and
costs ~21 ms per 1080p reference (profiled round 5).  This kernel runs
both --subme rounds (half then quarter pel) for a tile of blocks
entirely in VMEM: per candidate the separable 8-tap interpolation runs
as exact MXU matmuls with banded filter matrices, SATD as block-diagonal
Hadamard matmuls, and the argmin chain stays on-chip.  Plays the role of
ipfilter8.asm + pixel-a.asm in x265's subpel loop
(x265_1.9/source/encoder/motion.cpp:1174 subpelCompare, SURVEY §2.3).

Bit-exactness contract: the PREDICTION for the chosen MV is bit-exact
with ops/interp.mc_luma_batch (normative — it feeds reconstruction).
The candidate SELECTION compares float costs (SATD + lambda*mv-bits)
whose ulp-level rounding may differ from the XLA path; MV choices are
encoder decisions, so conformance is unaffected.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..ops.interp import LUMA_FILTERS


def pallas_refine_supported(bit_depth: int, n_blocks: int = 1 << 30) -> bool:
    if os.environ.get("X265_NO_PALLAS") or os.environ.get("X265_NO_PALLAS_ME"):
        return False
    if bit_depth != 8:
        return False
    if n_blocks < 512:
        # sub-tile pictures (fewer 16x16 blocks than one T=512 grid
        # step) hit a Mosaic vector-layout abort in the padded single-
        # step grid (observed on v5e: "limits[i] <= dim(i) (64 vs 1)"
        # in ApplyVectorLayoutPass); the jnp refine path is faster than
        # one padded tile there anyway
        return False
    if os.environ.get("X265_PALLAS", "") == "interp":
        return True
    import jax
    return jax.default_backend() == "tpu"


# 4x4 Hadamard (ops/cost.H4 convention)
_H4 = np.array([[1, 1, 1, 1],
                [1, -1, 1, -1],
                [1, 1, -1, -1],
                [1, -1, -1, 1]], dtype=np.float32)


def _hband(n_in: int, w: int) -> np.ndarray:
    """[4, n_in, w] banded filter matrices: out[x] = sum_k win[x+k] f[k]."""
    out = np.zeros((4, n_in, w), np.float32)
    for p in range(4):
        f = LUMA_FILTERS[p]
        for x in range(w):
            for k in range(8):
                out[p, x + k, x] = f[k]
    return out


_DELTAS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


@functools.lru_cache(maxsize=4)
def make_refine_kernel(subme: int, mrq: int):
    """Returns refine(W [B, 25, 25] i32, ob [B, 16, 16] i32,
    mvi [B, 2] i32 (y, x) fullpel, pmv [B, 2] f32-compat i32 qpel (y, x),
    lam f32 scalar) -> (q0 [B, 2] qpel offset (y, x), pred [B, 16, 16],
    cost [B] f32).  B padded to a multiple of the tile inside."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32, i32 = jnp.float32, jnp.int32
    n = 16
    WIN = 25
    T = 512                                 # blocks per grid step

    HH = np.concatenate(list(_hband(23, 16)), axis=0)   # [4*23, 16]
    # block-diagonal H4 for the two-sided 4x4 Hadamard over 16 columns
    HC = np.zeros((16, 16), np.float32)
    for g in range(4):
        HC[4 * g:4 * g + 4, 4 * g:4 * g + 4] = _H4.T
    P4 = np.zeros((16, 4), np.float32)      # column 4-group pooling
    for x in range(16):
        P4[x, x // 4] = 1.0

    rounds = {0: [0], 1: [2], 2: [2, 1]}[subme]

    def iota2(shape, dim):
        return jax.lax.broadcasted_iota(i32, shape, dim)

    def dot_hi(a, b):
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=f32)

    def lanes3(x, a, b):
        """[T] or [T,1] -> [T, a, b] materialized."""
        x2 = x if x.ndim == 2 else x[:, None]
        ones_ab = (iota2((a * b, 1), 0) * 0 + 1).astype(f32)
        big = dot_hi(ones_ab, jnp.transpose(x2).astype(f32))
        return jnp.transpose(big.reshape(a, b, T), (2, 0, 1)).astype(
            x2.dtype)

    def kernel(w_ref, ob_ref, mvi_ref, aux_ref, hh_ref, hc_ref,
               p4_ref, q_o, pred_o, cost_o, predbuf):
        W = w_ref[:].astype(i32)
        ob = ob_ref[:].astype(i32)
        mvi = mvi_ref[:]                     # [T, 2] (y, x) fullpel
        aux = aux_ref[:]                     # [T, 4]: pmv_y pmv_x lam 0
        pmv = aux[:, 0:2]
        lamv = aux[:, 2]                     # [T] per-block lambda

        def onehot4(v):
            return jnp.where(v[:, None] == iota2((T, 4), 1), 1.0,
                             0.0).astype(f32)

        def interp(qy, qx):
            """Exact pp-domain luma MC at per-block qpel offsets
            (|q| <= 3): mirrors ops/interp.mc_luma_batch (8-bit)."""
            iy1 = jax.lax.shift_right_arithmetic(qy, 2) + 1   # 0/1
            ix1 = jax.lax.shift_right_arithmetic(qx, 2) + 1
            fy = qy & 3
            fx = qx & 3
            m_iy = lanes3(iy1, 23, WIN) > 0
            rows = jnp.where(m_iy, W[:, 1:24, :], W[:, 0:23, :])
            m_ix = lanes3(ix1, 23, 23) > 0
            cols = jnp.where(m_ix, rows[:, :, 1:24], rows[:, :, 0:23])
            # horizontal: [T*23, 23] @ [23, 16] per phase, one-hot mix
            r2 = cols.reshape(T * 23, 23).astype(f32)
            ohx = onehot4(fx)
            acc = jnp.zeros((T, 23, 16), f32)
            for p in range(4):
                accp = dot_hi(r2, hh_ref[p * 23:(p + 1) * 23, :])
                acc = acc + (accp.reshape(T, 23, 16)
                             * lanes3(ohx[:, p], 23, 16))
            tmp = acc.astype(i32)            # shift1 == 0 at 8 bit
            # vertical: contract over y via the transposed layout
            t3 = jnp.swapaxes(tmp, 1, 2)                     # [T, x, y]
            r3 = t3.reshape(T * 16, 23).astype(f32)
            ohy = onehot4(fy)
            acc2 = jnp.zeros((T, 16, 16), f32)
            for p in range(4):
                accp = dot_hi(r3, hh_ref[p * 23:(p + 1) * 23, :])
                acc2 = acc2 + (accp.reshape(T, 16, 16)
                               * lanes3(ohy[:, p], 16, 16))
            accv = acc2.astype(i32)
            out = jnp.clip(
                jax.lax.shift_right_arithmetic(accv + 2048, 12), 0, 255)
            return jnp.swapaxes(out, 1, 2)                   # [T, y, x]

        def satd(pred):
            d = (ob - pred).astype(f32)
            t1 = dot_hi(d.reshape(T * n, n), hc_ref[:])
            t1t = jnp.swapaxes(t1.reshape(T, n, n), 1, 2)
            t2 = dot_hi(t1t.reshape(T * n, n), hc_ref[:])
            a = jnp.abs(t2.astype(i32))                     # [T*n, n]
            cols4 = dot_hi(a.astype(f32), p4_ref[:])        # [T*n, 4]
            c3 = jnp.swapaxes(cols4.reshape(T, n, 4), 1, 2)  # [T, 4, n]
            rows4 = dot_hi(c3.reshape(T * 4, n), p4_ref[:])  # [T*4, 4]
            per_blk = jax.lax.shift_right_arithmetic(
                rows4.astype(i32) + 1, 1).reshape(T, 4, 4)
            return per_blk.sum(axis=2).sum(axis=1)          # [T] int32

        def mv_bits(d):
            a = jnp.abs(d)
            return jnp.where(a == 0.0, 0.718,
                             2.0 * jnp.log2(a + 1.0) + 1.718)

        best_q = jnp.zeros((T, 2), i32)
        best_c = jnp.full((T,), 3e38, f32)
        predbuf[:, :, :] = jnp.zeros((T, n, n), i32)
        for ri, step in enumerate(rounds):
            center = best_q if ri > 0 else jnp.zeros((T, 2), i32)
            best_q_r = center
            best_c_r = jnp.full((T,), 3e38, f32)
            for (dy, dx) in (_DELTAS if step > 0 else [(0, 0)]):
                qy = center[:, 0] + dy * step
                qx = center[:, 1] + dx * step
                pred = interp(qy, qx)
                c = satd(pred).astype(f32)
                mvqy = mvi[:, 0].astype(f32) * 4.0 + qy.astype(f32)
                mvqx = mvi[:, 1].astype(f32) * 4.0 + qx.astype(f32)
                c = c + lamv * (mv_bits(mvqy - pmv[:, 0])
                                + mv_bits(mvqx - pmv[:, 1]))
                oob = (jnp.abs(mvi[:, 0] * 4 + qy) > 4 * mrq) | \
                      (jnp.abs(mvi[:, 1] * 4 + qx) > 4 * mrq)
                c = jnp.where(oob, 3e38, c)
                take = c < best_c_r
                best_c_r = jnp.where(take, c, best_c_r)
                qnew = jnp.concatenate([qy[:, None], qx[:, None]], axis=1)
                best_q_r = jnp.where(take[:, None], qnew, best_q_r)
                t3m = lanes3(jnp.where(take, 1, 0), n, n) > 0
                predbuf[:, :, :] = jnp.where(t3m, pred, predbuf[:])
            best_q = best_q_r
            best_c = best_c_r
        q_o[:, :] = best_q
        pred_o[:, :, :] = predbuf[:]
        cost_o[:, :] = best_c[:, None] + jnp.zeros((T, 8), f32)

    V = pl.BlockSpec(memory_space=pltpu.VMEM)
    S = pl.BlockSpec(memory_space=pltpu.SMEM)

    def refine(Wb, ob, mvi, pmv, lam):
        B = Wb.shape[0]
        Bp = -(-B // T) * T
        pad = Bp - B

        def padb(x):
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

        Wp = padb(Wb.astype(jnp.int32))
        obp = padb(ob.astype(jnp.int32))
        mvip = padb(mvi.astype(jnp.int32))
        lamf = jnp.asarray(lam, jnp.float32)
        aux = jnp.concatenate(
            [pmv.astype(jnp.float32),
             jnp.broadcast_to(lamf, (B,))[:, None],
             jnp.zeros((B, 1), jnp.float32)], axis=1)
        auxp = padb(aux)
        grid = Bp // T

        def bs(shape):
            return pl.BlockSpec((T,) + shape, lambda i: (i,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bs((WIN, WIN)), bs((n, n)), bs((2,)), bs((4,)),
                      pl.BlockSpec((4 * 23, 16), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((16, 16), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((16, 4), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[bs((2,)), bs((n, n)), bs((8,))],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, 2), jnp.int32),
                jax.ShapeDtypeStruct((Bp, n, n), jnp.int32),
                jax.ShapeDtypeStruct((Bp, 8), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((T, n, n), jnp.int32)],
            interpret=os.environ.get("X265_PALLAS", "") == "interp",
        )(Wp, obp, mvip, auxp,
          jnp.asarray(HH), jnp.asarray(HC), jnp.asarray(P4))
        q0, pred, cost = outs
        return q0[:B], pred[:B], cost[:B, 0]

    return refine
