"""Infix (substring) term matching kernel.

Reference equivalent: /root/reference/src/index.cpp:3289 do_infix_search —
the reference scans 4 htrie buckets of tokens substring-wise on CPU threads
(index.h:46-47 array_mapped_infix_t). TPU-native design: the term dictionary
is already a dense (T, MAX_TERM_LEN) uint8 matrix, so infix matching is one
vectorized sliding-window compare over the whole table — no tries, no
buckets, one XLA program per (pattern-length bucket).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from typesense_tpu.index.artifacts import MAX_TERM_LEN


@lru_cache(maxsize=8)
def _build_infix_kernel(L: int):
    """Match a length-<=L pattern as a substring of every term.
    Loops over the MAX_TERM_LEN-L+1 start offsets (static trip count),
    comparing an (T, L) slice per offset — O(T*L) per shift, fully vector."""

    @jax.jit
    def kern(term_chars, term_lens, pattern, pattern_len):
        T = term_chars.shape[0]

        def body(s, acc):
            window = lax.dynamic_slice(term_chars, (0, s), (T, L))
            eq = (window == pattern[None, :]) | \
                (jnp.arange(L)[None, :] >= pattern_len)
            fits = (s + pattern_len) <= term_lens
            return acc | (jnp.all(eq, axis=1) & fits)

        acc = lax.fori_loop(0, MAX_TERM_LEN - L + 1, body,
                            jnp.zeros(T, dtype=bool))
        return acc

    return kern


def infix_term_mask(term_chars_dev, term_lens_dev, token: str):
    """Boolean (T,) mask of terms containing `token` as a substring."""
    from typesense_tpu.index.artifacts import fold_token
    b = fold_token(token)   # codepoint-folded, matches the term table
    L = 1
    while L < len(b):
        L *= 2
    L = min(max(L, 4), MAX_TERM_LEN)
    pat = np.zeros(L, dtype=np.uint8)
    pat[:len(b)] = np.frombuffer(b, dtype=np.uint8)
    kern = _build_infix_kernel(L)
    return kern(term_chars_dev, term_lens_dev, jnp.asarray(pat),
                jnp.int32(len(b)))
