"""Batched fuzzy term matching — the TPU-native replacement for the ART
Levenshtein traversal (/root/reference/src/art.cpp:1597 art_fuzzy_recurse,
:1412 levenshtein_dist, :1745 art_fuzzy_search).

Instead of a cost-banded DP walked over radix-tree nodes, we run Myers'
bit-parallel edit-distance automaton (Hyyrö's formulation) simultaneously
over EVERY term in the flattened, lexicographically sorted term table AND
over every query token at once:

- each query pattern (<= 32 chars) becomes a (256,) uint32 match-mask row
- each of the 32 unrolled steps advances the automaton for all (token, term)
  pairs with ~14 elementwise uint32 ops on (Qt, T) lanes — pure VPU work
- non-prefix cost = the automaton score where each term ends; prefix cost =
  the running minimum over steps (edit distance of the query against every
  term prefix), matching the reference's prefix fuzzy semantics
- candidate selection = one lax.top_k over (budget-filtered cost asc,
  doc-frequency desc) keys — the FREQUENCY token ordering of art.h:143-148.

One compilation serves every query shape (token count bucketed); inputs and
outputs each cross the host boundary exactly once (the TPU link charges per
transfer).
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
def _build_fuzzy_kernel(L: int, K: int, QT: int):
    """L: term table width (static unroll); K: top-k; QT: token batch."""

    @jax.jit
    def kernel(term_chars_cols,   # (L, T) int32 char codes (0 = pad)
               term_lens,         # (T,) int32
               freqs,             # (T,) int32 doc frequencies
               pm,                # (QT, 256) uint32 pattern match masks
               meta,              # (QT, 4) int64: m, budget, prefix, min_len
               ):
        T = term_lens.shape[0]
        # patterns are <= MAX_TERM_LEN = 32 chars, so the automaton fits in
        # uint32 lanes — int64 bit ops are emulated on TPU (32-bit VPU) and
        # measure several times slower
        one = jnp.uint32(1)
        m = meta[:, 0]
        budget = meta[:, 1].astype(jnp.int32)
        prefix = meta[:, 2] > 0
        min_len = meta[:, 3].astype(jnp.int32)

        full = jnp.where(m >= 32, ~jnp.uint32(0),
                         (one << m.astype(jnp.uint32)) - one)       # (QT,)
        msb = one << jnp.maximum(m - 1, 0).astype(jnp.uint32)

        VP = jnp.broadcast_to(full[:, None], (QT, T))
        VN = jnp.zeros((QT, T), jnp.uint32)
        score = jnp.broadcast_to(m.astype(jnp.int32)[:, None], (QT, T))
        best = score

        for i in range(L):
            c = term_chars_cols[i]                                  # (T,)
            eq = jnp.take(pm, c, axis=1)                            # (QT, T)
            X = eq | VN
            D0 = (((X & VP) + VP) ^ VP) | X
            HP = VN | ~(VP | D0)
            HN = VP & D0
            ns = score + jnp.where((HP & msb[:, None]) != 0, 1, 0) \
                       - jnp.where((HN & msb[:, None]) != 0, 1, 0)
            X2 = (HP << one) | one
            nVN = X2 & D0
            nVP = (HN << one) | ~(X2 | D0)

            upd = (i < term_lens)[None, :]
            VP = jnp.where(upd, nVP, VP)
            VN = jnp.where(upd, nVN, VN)
            score = jnp.where(upd, ns, score)
            best = jnp.where(upd, jnp.minimum(best, score), best)

        cost = jnp.where(prefix[:, None], best, score)              # (QT, T)
        valid = (cost <= budget[:, None]) & (term_lens[None, :] >= min_len[:, None])
        val = jnp.where(valid,
                        (jnp.int64(3) - cost.astype(jnp.int64)) * (jnp.int64(1) << 40)
                        + freqs.astype(jnp.int64)[None, :],
                        jnp.int64(-1))
        vals, idxs = lax.top_k(val, K)                              # (QT, K)
        out = jnp.stack([idxs.astype(jnp.int64),
                         cost[jnp.arange(QT)[:, None], idxs].astype(jnp.int64),
                         vals], axis=1)                             # (QT, 3, K)
        return out.reshape(-1)

    return kernel


def _pm_table(token: str) -> tuple[np.ndarray, int]:
    from typesense_tpu.index.artifacts import fold_token
    b = fold_token(token)   # codepoint-folded, matches the term table
    m = len(b)
    pm = np.zeros(256, dtype=np.uint32)
    for j, ch in enumerate(b):
        pm[ch] |= np.uint32(1) << np.uint32(j)
    return pm, m


def _ensure_device_tables(engine):
    if getattr(engine, "_term_cols", None) is None:
        engine._term_cols = jax.device_put(
            jnp.asarray(engine.seg.term_chars.T.astype(np.int32)))
        engine._term_lens_dev = jax.device_put(jnp.asarray(engine.seg.term_lens))
        engine._term_freqs_dev = jax.device_put(jnp.asarray(engine.seg.term_doc_freq))


def fuzzy_candidates_batch(engine, tokens: list[tuple[str, int, bool]],
                           max_candidates: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """tokens: [(token, budget, prefix)] -> per token (term_ids, costs).
    One device call for the whole batch."""
    if not tokens:
        return []
    _ensure_device_tables(engine)
    QT = len(tokens)
    K = min(max(max_candidates * 4, 16), max(engine.seg.num_terms, 1))

    pm = np.zeros((QT, 256), np.uint32)
    meta = np.zeros((QT, 4), np.int64)
    for i, (tok, budget, prefix) in enumerate(tokens):
        row, m = _pm_table(tok)
        pm[i] = row
        meta[i] = (max(m, 1), budget, 1 if prefix else 0, max(1, m - budget))

    kern = _build_fuzzy_kernel(MAX_TERM_LEN, K, QT)
    buf = np.asarray(kern(engine._term_cols, engine._term_lens_dev,
                          engine._term_freqs_dev, jnp.asarray(pm),
                          jnp.asarray(meta))).reshape(QT, 3, K)
    out = []
    for i in range(QT):
        idxs, costs, vals = buf[i]
        keep = vals >= 0
        out.append((idxs[keep][:max_candidates * 4],
                    costs[keep][:max_candidates * 4]))
    return out


def fuzzy_candidates(engine, token: str, budget: int, prefix: bool,
                     max_candidates: int) -> tuple[np.ndarray, np.ndarray]:
    """Single-token convenience wrapper."""
    res = fuzzy_candidates_batch(engine, [(token, budget, prefix)], max_candidates)
    return res[0] if res else (np.empty(0, np.int64), np.empty(0, np.int64))
