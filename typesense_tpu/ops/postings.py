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
        mid = (lo + hi) >> 1
        v = flat[jnp.clip(mid, 0, flat.shape[0] - 1)]
        less = v < x
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return lo


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
