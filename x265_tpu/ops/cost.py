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
