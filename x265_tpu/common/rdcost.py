"""RD cost model: per-QP lambdas + device coefficient-bits estimation.

Role of x265's RDCost (x265_1.9/source/encoder/rdcost.h:34-98) and lambda
tables (source/common/constants.cpp:33-53):
  lambda  = 2^(qp/6 - 2)          (bit-domain: scales bits vs SATD)
  lambda2 = 0.85 * lambda^2       (SSD domain: D + lambda2 * bits)

The bits estimator is NOT x265's CABAC estBit table walk (entropy.cpp:1950)
— that is inherently sequential per coefficient.  Instead it is a
vectorized upper-bound model of the residual_coding syntax cost that runs
batched on device for every candidate at once: per nonzero coefficient
sig(1) + sign(1) + gt1/gt2/remaining (~EG0 magnitude bits), plus per
coded 4x4 group overhead.  Constants calibrated against the real CABAC
output of this encoder (see tests/test_rd.py).
"""

from __future__ import annotations

import numpy as np


def lambda_bits(qp: int) -> float:
    """Bit-domain lambda (x265 x265_lambda_tab: 2^(qp/6 - 2))."""
    return float(2.0 ** (qp / 6.0 - 2.0))


def lambda_ssd(qp: int) -> float:
    """SSD-domain lambda2 (x265 x265_lambda2_tab: 0.85 * lambda^2)."""
    lam = lambda_bits(qp)
    return float(0.85 * lam * lam)


def level_bits_jnp(levels):
    """Estimated residual_coding bits per block: [L, n, n] -> [L] float32.

    Model (per coded coefficient group of 4x4):
      ~2 bits group overhead (csbf + last/sig ctx drift), and per nonzero
      coefficient 1 (sig) + 1 (sign) + 2*floor(log2(|l|)) + 1 (magnitude
      prefix/suffix, EG0-like).  Intentionally cheap and monotone in the
      true CABAC cost; used for mode/CU decisions, not for rate control.
    """
    import jax.numpy as jnp

    # integer-exact: floor(log2(|l|)) computed as the MSB index via
    # threshold counting so the bits total is a deterministic integer
    # (f32 log2/floor is epsilon-fragile across backends/kernels, and
    # the Pallas scan step must reproduce these costs bit-exactly)
    a = jnp.abs(levels)
    nz = a > 0
    msb = sum((a >= (1 << k)).astype(jnp.int32) for k in range(1, 16))
    mag = jnp.where(nz, 2 * msb + 3, 0)
    bits = jnp.sum(mag, axis=(-1, -2))
    L, n, _ = levels.shape
    g = n // 4
    grp_nz = jnp.any(
        levels.reshape(L, g, 4, g, 4) != 0, axis=(2, 4))
    bits = bits + 2 * jnp.sum(grp_nz.astype(jnp.int32), axis=(-1, -2))
    return bits.astype(jnp.float32)


def level_bits_np(levels: np.ndarray) -> np.ndarray:
    """Numpy oracle of level_bits_jnp (same integer MSB formulation)."""
    a = np.abs(levels).astype(np.int64)
    nz = a > 0
    msb = sum((a >= (1 << k)).astype(np.int64) for k in range(1, 16))
    mag = np.where(nz, 2 * msb + 3, 0)
    bits = mag.sum(axis=(-1, -2))
    L, n, _ = levels.shape
    g = n // 4
    grp_nz = np.any(levels.reshape(L, g, 4, g, 4) != 0, axis=(2, 4))
    bits = bits + 2 * grp_nz.sum(axis=(-1, -2))
    return bits.astype(np.float32)
