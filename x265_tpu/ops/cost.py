"""Distortion kernels: SAD, SSE/SSD, SATD (Hadamard), SA8D.

Reference embodiments: x265_1.9/source/common/pixel.cpp:40 (sad),
:163 (satd_4x4), :244 (sa8d_8x8) and the pixel-a.asm / sad-a.asm families.
Batched over [B, H, W] blocks; int32 exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

H4 = np.array([[1, 1, 1, 1],
               [1, -1, 1, -1],
               [1, 1, -1, -1],
               [1, -1, -1, 1]], dtype=np.int32)


def _hadamard(n: int) -> np.ndarray:
    if n == 4:
        return H4
    h = _hadamard(n // 2)
    return np.block([[h, h], [h, -h]])


def sad(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., H, W] -> [...] sum of absolute differences."""
    return jnp.sum(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)),
                   axis=(-2, -1))


def sse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


_KRON16 = np.kron(H4, H4).astype(np.float32)          # [16, 16] +-1
_KRON64 = np.kron(_hadamard(8), _hadamard(8)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def satd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum of 4x4 Hadamard-transformed absolute differences.

    a, b: [..., H, W] with H, W multiples of 4.  Matches the x265 satd
    convention: per 4x4 block (sum |H d H^T| + 1) >> 1.

    Both Hadamard stages collapse into ONE [16, 16] Kronecker matmul
    over vectorized 4x4 blocks, in float32 on the MXU (exact: +-1
    weights, 16 terms, |d| <= 1023 -> partial sums < 2^24).
    """
    d = (a.astype(jnp.int32) - b.astype(jnp.int32)).astype(jnp.float32)
    *lead, h, w = d.shape
    d = d.reshape(*lead, h // 4, 4, w // 4, 4)
    d = jnp.moveaxis(d, -3, -2)                       # [..., h/4, w/4, 4, 4]
    v = d.reshape(*d.shape[:-2], 16)
    had = jnp.einsum("ij,...j->...i", jnp.asarray(_KRON16), v,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    per_blk = (jnp.sum(jnp.abs(had), axis=-1).astype(jnp.int32) + 1) >> 1
    return jnp.sum(per_blk, axis=(-2, -1))


@functools.partial(jax.jit, static_argnames=())
def sa8d(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum of 8x8 Hadamard absolute differences ((sum + 2) >> 2 per block).

    One [64, 64] Kronecker matmul in float32 (exact: 64 terms * |d| <=
    1023 < 2^24)."""
    d = (a.astype(jnp.int32) - b.astype(jnp.int32)).astype(jnp.float32)
    *lead, h, w = d.shape
    d = d.reshape(*lead, h // 8, 8, w // 8, 8)
    d = jnp.moveaxis(d, -3, -2)
    v = d.reshape(*d.shape[:-2], 64)
    had = jnp.einsum("ij,...j->...i", jnp.asarray(_KRON64), v,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    per_blk = (jnp.sum(jnp.abs(had), axis=-1).astype(jnp.int32) + 2) >> 2
    return jnp.sum(per_blk, axis=(-2, -1))


def _psy_energy8(x: jax.Array) -> jax.Array:
    """[..., H, W] -> [..., H/8, W/8] AC (DC-removed) Hadamard energy of
    every 8x8 tile: sa8d(tile, 0) - (sad(tile, 0) >> 2).

    The 8x8 Hadamard DC coefficient equals the tile's pixel sum, so the
    sa8d normalisation ((sum|had| + 2) >> 2) counts DC as sum >> 2;
    subtracting sad >> 2 leaves pure AC energy — exactly x265's
    psyCost_pp energy term (x265_1.9/source/common/pixel.cpp:255
    sa8d_8x8 used by psyCost at sizes >= 8)."""
    xf = x.astype(jnp.float32)
    *lead, h, w = xf.shape
    t = xf.reshape(*lead, h // 8, 8, w // 8, 8)
    t = jnp.moveaxis(t, -3, -2)                        # [..., h/8, w/8, 8, 8]
    v = t.reshape(*t.shape[:-2], 64)
    had = jnp.einsum("ij,...j->...i", jnp.asarray(_KRON64), v,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    sa8d_blk = (jnp.sum(jnp.abs(had), axis=-1).astype(jnp.int32) + 2) >> 2
    sad_blk = jnp.sum(v, axis=-1).astype(jnp.int32) >> 2   # pixels >= 0
    return sa8d_blk - sad_blk


def psy_cost(a: jax.Array, b: jax.Array) -> jax.Array:
    """Psycho-visual cost between source and reconstruction blocks:
    sum over 8x8 tiles of |AC_energy(a) - AC_energy(b)|.

    Matches x265's psyCost primitive (pixel.cpp psyCost_pp template,
    wired into RD by rdcost.h:74 calcPsyRdCost): a reconstruction that
    deadens texture (loses AC energy) is penalised even when its SSD is
    low.  a, b: [..., H, W] pixel blocks, H and W multiples of 8;
    returns [...] float32."""
    d = jnp.abs(_psy_energy8(a) - _psy_energy8(b))
    return jnp.sum(d, axis=(-2, -1)).astype(jnp.float32)


# numpy oracles ------------------------------------------------------------

def satd_np(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    h, w = d.shape
    total = 0
    for y in range(0, h, 4):
        for x in range(0, w, 4):
            blk = d[y:y + 4, x:x + 4]
            had = H4 @ blk @ H4.T
            total += (int(np.abs(had).sum()) + 1) >> 1
    return total


def sa8d_np(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    h8 = _hadamard(8)
    h, w = d.shape
    total = 0
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            blk = d[y:y + 8, x:x + 8]
            had = h8 @ blk @ h8.T
            total += (int(np.abs(had).sum()) + 2) >> 2
    return total


def psy_cost_np(a: np.ndarray, b: np.ndarray) -> int:
    """Numpy oracle of ``psy_cost`` for a single [H, W] block pair."""
    z = np.zeros((8, 8), np.int64)
    total = 0
    h, w = a.shape
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            ea = (sa8d_np(a[y:y + 8, x:x + 8], z)
                  - (int(a[y:y + 8, x:x + 8].sum()) >> 2))
            eb = (sa8d_np(b[y:y + 8, x:x + 8], z)
                  - (int(b[y:y + 8, x:x + 8].sum()) >> 2))
            total += abs(ea - eb)
    return total
