"""Batched fuzzy term matching — the TPU-native replacement for the ART
Levenshtein traversal (/root/reference/src/art.cpp:1597 art_fuzzy_recurse,
:1412 levenshtein_dist, :1745 art_fuzzy_search).

Instead of a cost-banded DP walked over radix-tree nodes, we run Myers'
bit-parallel edit-distance automaton (Hyyrö's formulation) simultaneously
over EVERY term in the flattened, lexicographically sorted term table:

- the query pattern (<= 32 chars) becomes a (256,) uint64 match-mask table
- each of the 32 unrolled steps advances the automaton for all T terms with
  ~14 elementwise uint64 ops on (T,) lanes — pure VPU work, no gathers except
  the PM[char] lookup
- non-prefix cost = the automaton score where each term ends; prefix cost =
  the running minimum over steps (edit distance of the query against every
  term prefix), matching the reference's prefix fuzzy semantics
- candidate selection = one lax.top_k over (budget-filtered cost asc,
  doc-frequency desc) keys — the FREQUENCY token ordering of art.h:143-148.

One compilation serves every query: the pattern only enters through traced
scalars (m, msb) and the PM table.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from typesense_tpu.index.artifacts import MAX_TERM_LEN


@lru_cache(maxsize=64)
def _build_fuzzy_kernel(L: int, K: int):
    """L: term table width (chars, static unroll); K: top-k candidates."""

    @jax.jit
    def kernel(term_chars_cols,   # (L, T) int32 char codes (0 = pad)
               term_lens,         # (T,) int32
               freqs,             # (T,) int32 doc frequencies
               pm,                # (256,) uint64 pattern match masks
               m,                 # scalar int32 pattern length
               budget,            # scalar int32 max edit cost
               prefix,            # scalar bool
               min_len,           # scalar int32 minimum term length gate
               ):
        T = term_lens.shape[0]
        one = jnp.uint64(1)
        full = jnp.where(m >= 64, ~jnp.uint64(0), (one << m.astype(jnp.uint64)) - one)
        msb = one << (m - 1).astype(jnp.uint64)

        VP = jnp.full((T,), full, jnp.uint64)
        VN = jnp.zeros((T,), jnp.uint64)
        score = jnp.full((T,), m, jnp.int32)
        best = score

        for i in range(L):
            c = term_chars_cols[i]
            eq = pm[c]
            X = eq | VN
            D0 = (((X & VP) + VP) ^ VP) | X
            HP = VN | ~(VP | D0)
            HN = VP & D0
            ns = score + jnp.where((HP & msb) != 0, 1, 0) - jnp.where((HN & msb) != 0, 1, 0)
            X2 = (HP << one) | one
            nVN = X2 & D0
            nVP = (HN << one) | ~(X2 | D0)

            upd = i < term_lens
            VP = jnp.where(upd, nVP, VP)
            VN = jnp.where(upd, nVN, VN)
            score = jnp.where(upd, ns, score)
            best = jnp.where(upd, jnp.minimum(best, score), best)

        cost = jnp.where(prefix, best, score)
        valid = (cost <= budget) & (term_lens >= min_len)
        # rank: lower cost first, then higher doc frequency (FREQUENCY order)
        val = jnp.where(valid,
                        (jnp.int64(3) - cost.astype(jnp.int64)) * (jnp.int64(1) << 40)
                        + freqs.astype(jnp.int64),
                        jnp.int64(-1))
        vals, idxs = lax.top_k(val, K)
        return idxs, cost[idxs], vals

    return kernel


def _pm_table(token: str) -> tuple[np.ndarray, int]:
    b = token.encode("utf-8")[:MAX_TERM_LEN]
    m = len(b)
    pm = np.zeros(256, dtype=np.uint64)
    for j, ch in enumerate(b):
        pm[ch] |= np.uint64(1) << np.uint64(j)
    return pm, m


def fuzzy_candidates(engine, token: str, budget: int, prefix: bool,
                     max_candidates: int) -> tuple[np.ndarray, np.ndarray]:
    """Top candidate (term_ids, costs) for `token` within edit cost `budget`."""
    cols = getattr(engine, "_term_cols", None)
    if cols is None:
        cols = jax.device_put(
            jnp.asarray(engine.seg.term_chars.T.astype(np.int32)))
        engine._term_cols = cols
        engine._term_lens_dev = jax.device_put(jnp.asarray(engine.seg.term_lens))
        engine._term_freqs_dev = jax.device_put(jnp.asarray(engine.seg.term_doc_freq))

    pm, m = _pm_table(token)
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    K = min(max(max_candidates * 4, 16), engine.seg.num_terms or 1)
    kern = _build_fuzzy_kernel(MAX_TERM_LEN, K)
    # reference gates: candidate length within [m - budget, inf) for prefix,
    # and practical min length so 1-char terms don't match everything
    min_len = max(1, m - budget)
    idxs, costs, vals = kern(cols, engine._term_lens_dev, engine._term_freqs_dev,
                             jnp.asarray(pm), jnp.int32(m), jnp.int32(budget),
                             jnp.bool_(prefix), jnp.int32(min_len))
    idxs = np.asarray(idxs)
    costs = np.asarray(costs)
    vals = np.asarray(vals)
    keep = vals >= 0
    return idxs[keep][:max_candidates * 4].astype(np.int64), costs[keep][:max_candidates * 4].astype(np.int64)
