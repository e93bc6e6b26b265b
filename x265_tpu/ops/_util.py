"""Small shared device helpers for the kernel library."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def take_small(table, idx):
    """Gather-free small-table lookup: ``table[idx]`` for a short 1-D
    int table (< ~64 entries) and an arbitrarily-shaped int index array.

    XLA:TPU lowers plane-sized dynamic gathers to serialized
    dynamic-slices (~70 ms for a 1080p plane — profiled round 5); a
    one-hot contraction over the table axis is exact for integer tables
    below 2^24 and runs at VPU/MXU speed.  ``idx`` must already be
    clipped to the table domain.
    """
    t = np.asarray(table)
    assert t.ndim == 1 and abs(t).max() < (1 << 24)
    oh = (idx[..., None] == jnp.arange(len(t), dtype=jnp.int32))
    return jnp.sum(oh * jnp.asarray(t, jnp.int32), axis=-1,
                   dtype=jnp.int32)
