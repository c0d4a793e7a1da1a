"""Vector search — TPU-shaped replacement for the hnswlib HNSW graph
(/root/reference/include/index.h:356-389 hnsw_index_t, searchKnnCloserFirst
call sites index.cpp:3384-3386).

A graph walk is pointer-chasing and branchy — the opposite of what the MXU
wants. Instead the index is a dense row-major matrix in HBM and kNN is ONE
fused matmul + filtered top-k scan; queries batch along a free dimension.
At v5e HBM bandwidth a full 2M x 768 f32 scan is ~7 ms and hits exact
recall (>= any HNSW at equal memory); bf16 storage halves that. Filter
pushdown is a mask fused into the distance select (the VectorFilterFunctor
equivalent, index.h:325-354) — no post-filtering recall loss.

Distance convention matches hnswlib InnerProductSpace: dist = 1 - <v, q>
(vectors pre-normalized for cosine at build time, index.h:379-388).
"""

from __future__ import annotations

from functools import lru_cache

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=64)
def build_knn_kernel(K: int, B: int):
    """K: top-k bucket; B: query batch bucket."""

    @jax.jit
    def kernel(vectors,        # (N, D) f32 or bf16, cosine rows pre-normalized
               queries,        # (B, D) f32
               mask,           # (N,) bool — filter & live & has-vector
               dist_threshold, # scalar f32
               ):
        q = queries.astype(vectors.dtype)
        sims = jax.lax.dot_general(
            q, vectors,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, N)
        dist = 1.0 - sims
        ok = mask[None, :] & (dist <= dist_threshold)
        neg = jnp.where(ok, -dist, -jnp.inf)
        vals, idxs = lax.top_k(neg, K)                   # (B, K)
        return idxs.astype(jnp.int32), -vals

    return kernel
