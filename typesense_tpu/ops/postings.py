"""Posting-list device ops: vectorized sorted-membership probes.

TPU-native replacement for the reference's iterator machinery
(/root/reference/include/or_iterator.h:61-182 N-way intersect loop and
posting_list.h block skip lists): instead of walking block-chained lists a
doc at a time, we pick the rarest token's postings as the *driver* vector and
test membership of every driver doc in every other (field, candidate-term)
posting row with a batched branchless binary search — log2(row) rounds of
vectorized HBM gathers, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lower_bound(flat: jax.Array, lo, hi, x, iters: int):
    """Vectorized lower_bound: first index in [lo, hi) with flat[idx] >= x.

    lo/hi/x broadcast together; `iters` must be >= ceil(log2(max range + 1)).
    Equivalent of sorted_array::lower_bound_search_bits
    (/root/reference/src/sorted_array.cpp) without the FOR-decode.
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)

    def body(_, state):
        lo, hi = state
        active = lo < hi   # converged/empty lanes must not run past hi
        mid = (lo + hi) >> 1
        v = flat[jnp.clip(mid, 0, flat.shape[0] - 1)]
        less = v < x
        new_lo = jnp.where(less, mid + 1, lo)
        new_hi = jnp.where(less, hi, mid)
        return (jnp.where(active, new_lo, lo),
                jnp.where(active, new_hi, hi))

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def lower_bound_wide(flat: jax.Array, lo, hi, x, iters: int,
                     fan: int = 4):
    """Wide-fanout lower_bound: first index in [lo, hi) with
    flat[idx] >= x, probing fan-1 pivots per step.

    On this rig a random gather from a large HBM array costs a FIXED
    ~0.35 ms regardless of lane count (latency/DMA-descriptor bound), so
    a 21-step binary search is ~7 ms of dependent gathers, while wide
    gathers above ~30K lanes turn throughput-bound (~60M elem/s). fan=4
    (3 pivots/step, ~12 steps) sits under both limits.

    Exactness: step boundaries b_j = lo + floor(width*j/fan) partition
    [lo, hi); with k = #{j in 1..fan-1 : flat[b_j] < x}, the answer lies
    in [b_k, b_{k+1}) since flat is sorted (b_k's pivot < x <= b_{k+1}'s
    pivot, boundary cases collapse the interval). Width shrinks to
    <= ceil(width/fan) each step, so after the static step count the
    interval is a single index, finished by one final compare step."""
    import math
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    steps = max(1, math.ceil(iters / math.log2(fan))) + 1
    js = jnp.arange(1, fan, dtype=jnp.int32)          # (fan-1,)
    jshape = (fan - 1,) + (1,) * max(lo.ndim, x.ndim)
    js = js.reshape(jshape)
    for _ in range(steps):
        width = hi - lo
        piv = lo[None] + (width[None] * js) // fan     # (fan-1, ...)
        v = flat[jnp.clip(piv, 0, flat.shape[0] - 1)]
        k = jnp.sum((v < x[None]).astype(jnp.int32), axis=0)
        new_lo = lo + (width * k) // fan
        new_hi = jnp.where(k < fan - 1,
                           lo + (width * (k + 1)) // fan, hi)
        # empty/degenerate ranges stay fixed points
        lo = jnp.where(width > 1, new_lo, lo)
        hi = jnp.where(width > 1, new_hi, hi)
    # final resolve: width is now <= 1
    v = flat[jnp.clip(lo, 0, flat.shape[0] - 1)]
    return jnp.where((hi > lo) & (v < x), lo + 1, lo)


def membership(flat: jax.Array, start, end, x, iters: int):
    """(found, idx): is x present in sorted slice flat[start:end)? idx is the
    position where it was found (valid only when found)."""
    idx = lower_bound(flat, start, end, x, iters)
    safe = jnp.clip(idx, 0, flat.shape[0] - 1)
    found = (idx < end) & (flat[safe] == x)
    return found, idx


def gather_slice(flat: jax.Array, start, size: int, fill=0):
    """Gather flat[start : start+size] with a static size (bucketed), padding
    out-of-range reads with `fill`. Returns (values, valid_mask)."""
    idx = start + jnp.arange(size, dtype=jnp.int32)
    valid = idx < flat.shape[0]
    safe = jnp.minimum(idx, flat.shape[0] - 1)
    vals = flat[safe]
    return jnp.where(valid, vals, fill), valid
