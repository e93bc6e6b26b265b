"""Intra prediction: all 35 HEVC modes (planar/DC/33 angular).

Spec: ITU-T H.265 §8.4.4.2.  Reference embodiments: the per-mode C kernels
(x265_1.9/source/common/intrapred.cpp:32-270) and the 24k-line
intrapred8_allangs.asm batch predictors (SURVEY.md §2.3).

TPU-native design: intra prediction is an *affine* map from the 4N+1
reference samples to the NxN prediction (angular interpolation, planar and
DC are all integer-weighted sums followed by a rounding shift).  We
precompute, per TU size, a weight tensor W[35, N*N, 4N+1] and evaluate all
35 modes for a batch of blocks as ONE f32 matmul on the MXU (exact: weights
<= 32, samples <= 1023, <= 4N terms -> < 2^24), then apply the rounding
shifts and the three nonlinear boundary post-filters (DC filter, pure-H/V
edge adjust) as masked vector ops.

Canonical reference-sample vector layout (length 4N+1), matching the spec's
substitution scan order (§8.4.4.2.2):
    index 0       .. N-1   : below-left  p[-1][2N-1] .. p[-1][N]
    index N       .. 2N-1  : left        p[-1][N-1]  .. p[-1][0]
    index 2N               : corner      p[-1][-1]
    index 2N+1    .. 3N    : top         p[0][-1]    .. p[N-1][-1]
    index 3N+1    .. 4N    : above-right p[N][-1]    .. p[2N-1][-1]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# §8.4.4.2.6: intraPredAngle for modes 2..34
ANGLES = np.array([32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17,
                   -21, -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5,
                   9, 13, 17, 21, 26, 32], dtype=np.int32)
INV_ANGLES = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
              -21: -390, -26: -315, -32: -256}

PLANAR, DC = 0, 1
HOR, VER = 10, 26


def ref_index(n: int, kind: str, i: int = 0) -> int:
    """Index into the canonical reference vector."""
    if kind == "bl":       # p[-1][N+i], i in 0..N-1
        return 2 * n - 1 - (n + i)
    if kind == "left":     # p[-1][i], i in 0..N-1
        return 2 * n - 1 - i
    if kind == "corner":
        return 2 * n
    if kind == "top":      # p[i][-1], i in 0..2N-1
        return 2 * n + 1 + i
    raise ValueError(kind)


def angle_of(mode: int) -> int:
    return int(ANGLES[mode - 2])


def filter_flag(mode: int, n: int, is_luma: bool) -> bool:
    """§8.4.4.2.3 reference-sample filtering decision."""
    if not is_luma or mode == DC or n == 4:
        return False
    min_dist = min(abs(mode - HOR), abs(mode - VER)) if mode != PLANAR else 10
    thresh = {8: 7, 16: 1, 32: 0}[n]
    return min_dist > thresh


# ---------------------------------------------------------------------------
# numpy reference (spec oracle, per block)
# ---------------------------------------------------------------------------

def filter_reference_np(ref: np.ndarray) -> np.ndarray:
    """[1 2 1]/4 smoothing along the canonical vector, endpoints kept."""
    out = ref.copy()
    out[1:-1] = (ref[:-2] + 2 * ref[1:-1] + ref[2:] + 2) >> 2
    return out


def substitute_references_np(samples: np.ndarray, avail: np.ndarray,
                             bit_depth: int = 8) -> np.ndarray:
    """§8.4.4.2.2 reference sample substitution.

    samples/avail: [4N+1] values and per-sample availability flags.
    """
    out = samples.astype(np.int32).copy()
    if not avail.any():
        out[:] = 1 << (bit_depth - 1)
        return out
    first = int(np.argmax(avail))
    if not avail[0]:
        out[:first] = out[first]
    for i in range(first + 1, len(out)):
        if not avail[i]:
            out[i] = out[i - 1]
    return out


def predict_intra_np(mode: int, ref: np.ndarray, n: int, *,
                     is_luma: bool = True, bit_depth: int = 8,
                     already_filtered: bool = False) -> np.ndarray:
    """Predict one NxN block from an (unfiltered) canonical ref vector."""
    if filter_flag(mode, n, is_luma) and not already_filtered:
        r = filter_reference_np(ref)
    else:
        r = ref
    left = np.array([r[ref_index(n, "left", i)] for i in range(2 * n)])
    top = np.array([r[ref_index(n, "top", i)] for i in range(2 * n)])
    corner = int(r[ref_index(n, "corner")])
    pred = np.zeros((n, n), dtype=np.int32)
    log2n = n.bit_length() - 1
    maxval = (1 << bit_depth) - 1

    if mode == PLANAR:
        for y in range(n):
            for x in range(n):
                pred[y, x] = ((n - 1 - x) * left[y] + (x + 1) * top[n]
                              + (n - 1 - y) * top[x] + (y + 1) * left[n]
                              + n) >> (log2n + 1)
        return pred

    if mode == DC:
        dc = (int(top[:n].sum()) + int(left[:n].sum()) + n) >> (log2n + 1)
        pred[:, :] = dc
        if is_luma and n < 32:
            pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
            for x in range(1, n):
                pred[0, x] = (top[x] + 3 * dc + 2) >> 2
            for y in range(1, n):
                pred[y, 0] = (left[y] + 3 * dc + 2) >> 2
        return pred

    a = angle_of(mode)
    vertical = mode >= 18
    main = top if vertical else left
    side = left if vertical else top
    # build extended main reference, 1-indexed at offset n (M[i] at em[n+i])
    em = np.zeros(4 * n + 2, dtype=np.int32)
    em[n] = corner                       # M[0]
    em[n + 1: n + 1 + 2 * n] = main[:2 * n]
    if a < 0:
        inv = INV_ANGLES[a]
        lo = (n * a) >> 5                # indices lo+1 .. -1 get projected
        for k in range(-1, lo, -1):
            idx = ((k * inv + 128) >> 8) - 1
            em[n + k] = side[idx] if idx >= 0 else corner
    for q in range(n):                   # q = y (vertical) or x (horizontal)
        pos = (q + 1) * a
        idx = pos >> 5
        fact = pos & 31
        for p in range(n):               # p = x (vertical) or y (horizontal)
            s0 = em[n + p + idx + 1]
            s1 = em[n + p + idx + 2]
            v = (s0 * (32 - fact) + s1 * fact + 16) >> 5
            if vertical:
                pred[q, p] = v
            else:
                pred[p, q] = v
    if is_luma and n < 32:
        if mode == VER:
            for y in range(n):
                pred[y, 0] = np.clip(top[0] + ((left[y] - corner) >> 1),
                                     0, maxval)
        elif mode == HOR:
            for x in range(n):
                pred[0, x] = np.clip(left[0] + ((top[x] - corner) >> 1),
                                     0, maxval)
    return pred


# ---------------------------------------------------------------------------
# weight-tensor construction (per size, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _weight_tensor(n: int):
    """Returns (W [35, N*N, 4N+1] int32, shift [35], add [35], filt [35]).

    pred_flat[m] = (W[m] @ ref + add[m]) >> shift[m]  — exact for every mode
    before the nonlinear boundary post-filters.
    ``filt[m]`` selects the filtered reference vector (luma case).
    """
    r_len = 4 * n + 2  # one extra slot for a constant-zero pad (unused idx)
    W = np.zeros((35, n * n, 4 * n + 1), dtype=np.int32)
    shift = np.zeros(35, dtype=np.int32)
    add = np.zeros(35, dtype=np.int32)
    log2n = n.bit_length() - 1

    def li(i):  # left index i (0..2N-1)
        return ref_index(n, "left", i)

    def ti(i):  # top index i (0..2N-1)
        return ref_index(n, "top", i)

    ci = ref_index(n, "corner")

    # planar
    shift[PLANAR] = log2n + 1
    add[PLANAR] = n
    for y in range(n):
        for x in range(n):
            p = y * n + x
            W[PLANAR, p, li(y)] += n - 1 - x
            W[PLANAR, p, ti(n)] += x + 1
            W[PLANAR, p, ti(x)] += n - 1 - y
            W[PLANAR, p, li(n)] += y + 1

    # DC (boundary filter applied later as post-op)
    shift[DC] = log2n + 1
    add[DC] = n
    for p in range(n * n):
        for i in range(n):
            W[DC, p, ti(i)] += 1
            W[DC, p, li(i)] += 1

    # angular
    for mode in range(2, 35):
        a = angle_of(mode)
        vertical = mode >= 18
        shift[mode] = 5
        add[mode] = 16
        # map extended-main index M[i] -> canonical ref index
        def canon(i: int) -> int:
            if i == 0:
                return ci
            if i > 0:
                return ti(i - 1) if vertical else li(i - 1)
            inv = INV_ANGLES[a]
            sidx = ((i * inv + 128) >> 8) - 1
            if sidx < 0:
                return ci
            return li(sidx) if vertical else ti(sidx)
        for q in range(n):
            pos = (q + 1) * a
            idx = pos >> 5
            fact = pos & 31
            for p in range(n):
                y, x = (q, p) if vertical else (p, q)
                flat = y * n + x
                W[mode, flat, canon(p + idx + 1)] += 32 - fact
                if fact:  # second tap unused (and may index past the
                    W[mode, flat, canon(p + idx + 2)] += fact  # ref) at fact=0


    filt_luma = np.array([filter_flag(m, n, True) for m in range(35)],
                         dtype=bool)
    return W, shift, add, filt_luma


# ---------------------------------------------------------------------------
# batched jnp (device path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "is_luma", "bit_depth"))
def predict_all_modes(refs: jax.Array, n: int, is_luma: bool = True,
                      bit_depth: int = 8) -> jax.Array:
    """All 35 intra predictions for a batch of blocks.

    refs: [B, 4N+1] int32 canonical (substituted, unfiltered) references.
    Returns [B, 35, N, N] int32.
    """
    W, shift, add, filt = _weight_tensor(n)
    maxval = (1 << bit_depth) - 1
    b = refs.shape[0]

    filtered = refs.at[:, 1:-1].set(
        (refs[:, :-2] + 2 * refs[:, 1:-1] + refs[:, 2:] + 2) >> 2)
    use_filt = filt if is_luma else np.zeros(35, dtype=bool)

    # two exact f32 contractions ON THE MXU (weights <= 32 = one bf16
    # term, samples <= 1023 = two terms, accumulator < 2^23 < 2^24):
    # Precision.HIGHEST makes the TPU's multi-pass bf16 f32-matmul
    # error-free for these integer ranges — int32 einsums would run
    # ~10x slower on the vector unit (profiled round 4).
    Wf = jnp.asarray(W, jnp.float32)          # [35, N*N, R]
    acc_u = jnp.einsum("mpr,br->bmp", Wf, refs.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
    acc_f = jnp.einsum("mpr,br->bmp", Wf, filtered.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
    sel = jnp.asarray(use_filt)[None, :, None]
    acc = jnp.where(sel, acc_f, acc_u)
    pred = (acc + jnp.asarray(add)[None, :, None]) >> jnp.asarray(shift)[None, :, None]
    pred = pred.reshape(b, 35, n, n)

    if is_luma and n < 32:
        left = refs[:, 2 * n - 1: n - 1: -1]          # left[0..N-1], [B, N]
        top = refs[:, 2 * n + 1: 3 * n + 1]           # top[0..N-1]
        corner = refs[:, 2 * n]
        dc = (jnp.sum(left, axis=1) + jnp.sum(top, axis=1) + n) >> (
            n.bit_length())                            # log2n + 1
        # DC boundary filter
        row0 = (top + 3 * dc[:, None] + 2) >> 2
        col0 = (left + 3 * dc[:, None] + 2) >> 2
        c00 = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        pred = pred.at[:, DC, 0, :].set(row0)
        pred = pred.at[:, DC, :, 0].set(col0)
        pred = pred.at[:, DC, 0, 0].set(c00)
        # pure vertical / horizontal edge adjust
        ver_col = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1),
                           0, maxval)
        hor_row = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1),
                           0, maxval)
        pred = pred.at[:, VER, :, 0].set(ver_col)
        pred = pred.at[:, HOR, 0, :].set(hor_row)
    return pred


@functools.partial(jax.jit, static_argnames=("n", "is_luma", "bit_depth"))
def predict_modes(refs: jax.Array, modes: jax.Array, n: int,
                  is_luma: bool = True, bit_depth: int = 8) -> jax.Array:
    """Predict one chosen mode per block: refs [B, 4N+1], modes [B] ->
    [B, N, N].  (Gathers from the all-modes batch; a dedicated gather-free
    kernel can come later if profiles demand it.)"""
    all_modes = predict_all_modes(refs, n, is_luma, bit_depth)
    return jnp.take_along_axis(
        all_modes, modes[:, None, None, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def substitute_references(samples: jax.Array, avail: jax.Array,
                          bit_depth: int = 8) -> jax.Array:
    """Batched §8.4.4.2.2 substitution.

    samples: [B, R] int32, avail: [B, R] bool (per-sample availability).
    Vectorized previous-available fill via a prefix max over indices.
    """
    b, r = samples.shape
    idx = jnp.arange(r, dtype=jnp.int32)[None, :]
    # last available index at-or-before i (or -1)
    last = jax.lax.associative_scan(
        jnp.maximum, jnp.where(avail, idx, -1), axis=1)
    # first available index overall (for the unavailable prefix)
    first = jnp.argmax(avail, axis=1)
    any_avail = jnp.any(avail, axis=1)
    src = jnp.where(last >= 0, last, first[:, None])
    filled = jnp.take_along_axis(samples, src, axis=1)
    return jnp.where(any_avail[:, None], filled,
                     jnp.int32(1 << (bit_depth - 1)))
