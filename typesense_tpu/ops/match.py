"""Proximity match scoring — vectorized equivalent of the reference's Match
heap-walk (/root/reference/include/match_score.h:129-275) with identical
bit-packing (match_score.h:56-68) so ranking parity holds.

Key identity: the reference slides a heap of per-token "current offsets",
popping the min offset p each step. At any such state, the current offset of
token t equals min{positions of t >= p} (each smaller position was itself
popped earlier). The per-state displacement telescopes to
(max in-window offset) - p. So instead of a sequential heap walk we evaluate
EVERY anchor position p in parallel:

    next_t(p)     = min over positions of t that are >= p
    alive_t(p)    = next_t(p) exists
    in_window     = alive & (next_t - p <= WINDOW_SIZE)
    words(p)      = sum_t in_window
    displacement  = max_t(in-window next_t) - p
    valid anchor  = anchor is a real position and >= 2 tokens alive
                    (matches the `while window.size() > 1` loop guard)

Best = lexicographic max of (words, -displacement), first anchor in
ascending-p order on ties (the reference's strict-improvement update).
"""

from __future__ import annotations

import typesense_tpu.core.jaxcfg  # noqa: F401  (enable x64 before jnp use)
import jax
import jax.numpy as jnp

WINDOW_SIZE = 10  # match_score.h:11
# plain int, not jnp.int32: weak-typed literals behave identically in XLA
# and avoid capturing an eager device-array constant in every kernel trace
INF = 1 << 30


def match_components(positions: jax.Array, pos_valid: jax.Array,
                     token_matched: jax.Array):
    """Compute Match components for a batch of candidate docs in one field.

    positions:     (B, Q, P) int32 packed positions (sorted per token)
    pos_valid:     (B, Q, P) bool
    token_matched: (B, Q) bool — token present in this doc+field

    Returns (words_present, distance, max_offset) each (B,) int32, following
    Match() semantics incl. the single-token fallback (words=1, distance=0,
    max_offset=0 from the default-initialized member).
    """
    B, Q, P = positions.shape
    pos_valid = pos_valid & token_matched[:, :, None]
    pos = jnp.where(pos_valid, positions, INF)                     # (B, Q, P)

    # anchors: every valid position, sorted ascending per candidate so that
    # argmax tie-breaks like the reference's in-order strict improvement.
    anchors = jnp.sort(pos.reshape(B, Q * P), axis=1)              # (B, A)
    anchor_valid = anchors < INF

    # next_t(p): min position of token t >= p   -> (B, A, Q)
    ge = jnp.where(pos[:, None, :, :] >= anchors[:, :, None, None],
                   pos[:, None, :, :], INF)
    nxt = jnp.min(ge, axis=3)                                      # (B, A, Q)

    alive = nxt < INF
    alive_cnt = jnp.sum(alive, axis=2)                             # (B, A)
    in_window = alive & ((nxt - anchors[:, :, None]) <= WINDOW_SIZE)
    words = jnp.sum(in_window, axis=2).astype(jnp.int32)           # (B, A)
    max_in_win = jnp.max(jnp.where(in_window, nxt, -1), axis=2)
    displacement = jnp.maximum(max_in_win - anchors, 0).astype(jnp.int32)
    max_off = jnp.max(jnp.where(alive, nxt, -1), axis=2)           # window.front()

    usable = anchor_valid & (alive_cnt >= 2)
    # lexicographic (words, -displacement) with first-anchor tie-break
    key = jnp.where(usable,
                    words.astype(jnp.int64) * (1 << 32) - displacement.astype(jnp.int64),
                    jnp.int64(-1) << 40)
    best_a = jnp.argmax(key, axis=1)                               # (B,)
    bidx = (jnp.arange(B), best_a)
    any_usable = jnp.any(usable, axis=1)

    words_present = jnp.where(any_usable, words[bidx], 1).astype(jnp.int32)
    distance = jnp.where(any_usable, displacement[bidx], 0).astype(jnp.int32)
    max_offset = jnp.where(any_usable,
                           jnp.minimum(max_off[bidx], 255), 0).astype(jnp.int32)
    # the winning window's anchor position (packed elem<<POS_BITS|off):
    # callers derive the window's array ELEMENT from it for the
    # per-element exact-match bit (windows never span elements — the
    # packed-position gap exceeds WINDOW_SIZE)
    best_anchor = jnp.where(any_usable, anchors[bidx], 0).astype(jnp.int32)
    return words_present, distance, max_offset, best_anchor


def match_components_p4(pos: list, want_offset: bool = False):
    """Match for the dense kernel's few-positions-per-token meta planes:
    identical semantics to match_components, closed-form per anchor. `pos`
    is a list of Q lists of (B,) int32 position vectors (ascending per
    token, INF where the slot/token is absent; values are 12-bit meta
    encodings < 4096).

    next_t(p) folds over the sorted positions with a reverse select chain;
    the ascending-anchor strict-improvement tie-break packs into one int32
    max over (words, -displacement, -anchor)."""
    Q = len(pos)
    P = len(pos[0])
    B = pos[0][0].shape  # any shape: (B,) vectors or (SUBT, LANES) tiles
    if Q == 2 and not want_offset:
        return _pair_closed_form(pos, B)
    best = jnp.full(B, -1, jnp.int32)
    for qa in range(Q):
        for ka in range(P):
            p = pos[qa][ka]
            anchor_ok = p < INF
            words = jnp.zeros(B, jnp.int32)
            alive_cnt = jnp.zeros(B, jnp.int32)
            maxwin = jnp.full(B, -1, jnp.int32)
            for t in range(Q):
                nxt = jnp.full(B, INF, jnp.int32)
                for k in range(P - 1, -1, -1):
                    nxt = jnp.where(pos[t][k] >= p, pos[t][k], nxt)
                alive = nxt < INF
                in_win = alive & ((nxt - p) <= WINDOW_SIZE)
                words = words + in_win
                alive_cnt = alive_cnt + alive
                maxwin = jnp.maximum(maxwin, jnp.where(in_win, nxt, -1))
            disp = jnp.clip(maxwin - p, 0, 4095)
            usable = anchor_ok & (alive_cnt >= 2)
            key = jnp.where(usable,
                            (words << 24) | ((4095 - disp) << 12) |
                            (4095 - jnp.minimum(p, 4095)),
                            -1)
            best = jnp.maximum(best, key)
    any_usable = best >= 0
    words_present = jnp.where(any_usable, best >> 24, 1).astype(jnp.int32)
    distance = jnp.where(any_usable, 4095 - ((best >> 12) & 0xFFF),
                         0).astype(jnp.int32)
    if not want_offset:
        return words_present, distance
    # second pass: the winning anchor is unique (the key packs the anchor
    # position), so max-over-alive next_t at that anchor recovers the
    # Match.max_offset component (match_score.h window.front())
    moff = jnp.zeros(B, jnp.int32)
    for qa in range(Q):
        for ka in range(P):
            p = pos[qa][ka]
            words = jnp.zeros(B, jnp.int32)
            alive_cnt = jnp.zeros(B, jnp.int32)
            maxwin = jnp.full(B, -1, jnp.int32)
            maxalive = jnp.full(B, -1, jnp.int32)
            for t in range(Q):
                nxt = jnp.full(B, INF, jnp.int32)
                for k in range(P - 1, -1, -1):
                    nxt = jnp.where(pos[t][k] >= p, pos[t][k], nxt)
                alive = nxt < INF
                in_win = alive & ((nxt - p) <= WINDOW_SIZE)
                words = words + in_win
                alive_cnt = alive_cnt + alive
                maxwin = jnp.maximum(maxwin, jnp.where(in_win, nxt, -1))
                maxalive = jnp.maximum(maxalive, jnp.where(alive, nxt, -1))
            disp = jnp.clip(maxwin - p, 0, 4095)
            usable = (p < INF) & (alive_cnt >= 2)
            key = jnp.where(usable,
                            (words << 24) | ((4095 - disp) << 12) |
                            (4095 - jnp.minimum(p, 4095)), -1)
            moff = jnp.where((key == best) & any_usable,
                             jnp.minimum(maxalive, 255), moff)
    return words_present, distance, moff


def _pair_closed_form(pos, B):
    """Q=2 fast path with EXACT anchor-walk parity (measured ~40% of the
    generic enumeration's device time at 2.2M lanes). For two tokens the
    best words-2 state is the closest opposite-token pair: every anchor
    state (p, next_other(p)) is a pair, and any non-adjacent pair is
    dominated at the same anchor by the adjacent one, so max over ALL
    pairs of the packed (words, -distance, -anchor) key equals max over
    anchor states. The words-1 state (both tokens alive, none in window)
    keys at the global min position."""
    p, q = pos
    P = len(p)
    best = jnp.full(B, -1, jnp.int32)
    for i in range(P):
        for j in range(P):
            d = jnp.abs(p[i] - q[j])
            a = jnp.minimum(p[i], q[j])
            feas = (p[i] < INF) & (q[j] < INF) & (d <= WINDOW_SIZE)
            key = jnp.where(feas,
                            (2 << 24) | ((4095 - d) << 12) |
                            (4095 - jnp.minimum(a, 4095)), -1)
            best = jnp.maximum(best, key)
    both = (p[0] < INF) & (q[0] < INF)
    minpos = jnp.minimum(p[0], q[0])
    w1 = jnp.where(both, (1 << 24) | (4095 << 12) |
                   (4095 - jnp.minimum(minpos, 4095)), -1)
    best = jnp.maximum(best, w1)
    any_u = best >= 0
    wp = jnp.where(any_u, best >> 24, 1).astype(jnp.int32)
    dist = jnp.where(any_u, 4095 - ((best >> 12) & 0xFFF),
                     0).astype(jnp.int32)
    return wp, dist


def np_match_components(positions, pos_valid, token_matched):
    """Pure-numpy mirror of match_components (bit-identical semantics) for
    the engine's host-side heavy-doc rescore — the serving process may run
    with only the TPU backend registered, so the host path cannot assume a
    CPU jax backend, and numpy is faster at these few-thousand-lane sizes
    anyway. np.argmax picks the first max, matching jnp.argmax."""
    import numpy as np
    B, Q, P = positions.shape
    pos_valid = pos_valid & token_matched[:, :, None]
    pos = np.where(pos_valid, positions.astype(np.int64), INF)
    anchors = np.sort(pos.reshape(B, Q * P), axis=1)
    anchor_valid = anchors < INF
    ge = np.where(pos[:, None, :, :] >= anchors[:, :, None, None],
                  pos[:, None, :, :], INF)
    nxt = ge.min(axis=3)
    alive = nxt < INF
    alive_cnt = alive.sum(axis=2)
    in_window = alive & ((nxt - anchors[:, :, None]) <= WINDOW_SIZE)
    words = in_window.sum(axis=2).astype(np.int32)
    max_in_win = np.where(in_window, nxt, -1).max(axis=2)
    displacement = np.maximum(max_in_win - anchors, 0).astype(np.int32)
    max_off = np.where(alive, nxt, -1).max(axis=2)
    usable = anchor_valid & (alive_cnt >= 2)
    key = np.where(usable,
                   words.astype(np.int64) * (1 << 32)
                   - displacement.astype(np.int64),
                   np.int64(-1) << 40)
    best_a = key.argmax(axis=1)
    bidx = (np.arange(B), best_a)
    any_usable = usable.any(axis=1)
    words_present = np.where(any_usable, words[bidx], 1).astype(np.int32)
    distance = np.where(any_usable, displacement[bidx], 0).astype(np.int32)
    max_offset = np.where(any_usable,
                          np.minimum(max_off[bidx], 255), 0).astype(np.int32)
    best_anchor = np.where(any_usable, anchors[bidx], 0).astype(np.int32)
    return words_present, distance, max_offset, best_anchor


def np_pack_field_score(words_present, unique_words, total_cost, distance,
                        exact_match, max_offset_score, synonym_score):
    """numpy mirror of pack_field_score (match_score.h:56-68)."""
    import numpy as np
    wp = np.clip(words_present, 0, 255).astype(np.int64)
    uw = np.clip(unique_words, 0, 255).astype(np.int64)
    tc = np.clip(255 - total_cost, 0, 255).astype(np.int64)
    dist = (100 - np.clip(distance, 0, 100)).astype(np.int64)
    ex = np.clip(exact_match, 0, 15).astype(np.int64)
    off = np.clip(max_offset_score, 0, 255).astype(np.int64)
    syn = np.clip(synonym_score, 0, 15).astype(np.int64)
    return (wp << 40) | (uw << 32) | (tc << 24) | (dist << 16) | \
        (ex << 12) | (off << 4) | syn


def np_pack_aggregated_score(query_len, best_field_score, best_field_weight,
                             num_matching_fields, match_type: int = 0):
    """numpy mirror of pack_aggregated_score (index.cpp:5344-5380)."""
    import numpy as np
    ql = np.clip(query_len, 0, 15).astype(np.int64)
    nmf = np.clip(num_matching_fields, 0, 7).astype(np.int64)
    if match_type == 1:
        w = np.clip(best_field_weight, 0, 127).astype(np.int64)
        return (ql << 59) | (w << 51) | \
            (best_field_score.astype(np.int64) << 3) | nmf
    if match_type == 2:
        s = np.clip(best_field_score.astype(np.int64), 0, (1 << 56) - 1)
        return (ql << 59) | (s << 3) | nmf
    w = np.clip(best_field_weight, 0, 127).astype(np.int64)
    return (ql << 59) | (best_field_score.astype(np.int64) << 11) | \
        (w << 3) | nmf


def pack_field_score(words_present, unique_words, total_cost, distance,
                     exact_match, max_offset_score, synonym_score):
    """match_score.h:56-68 — identical 48-bit packing (int64)."""
    wp = jnp.clip(words_present, 0, 255).astype(jnp.int64)
    uw = jnp.clip(unique_words, 0, 255).astype(jnp.int64)
    tc = jnp.clip(255 - total_cost, 0, 255).astype(jnp.int64)
    dist = (100 - jnp.clip(distance, 0, 100)).astype(jnp.int64)
    ex = jnp.clip(exact_match, 0, 15).astype(jnp.int64)
    off = jnp.clip(max_offset_score, 0, 255).astype(jnp.int64)
    syn = jnp.clip(synonym_score, 0, 15).astype(jnp.int64)
    return (wp << 40) | (uw << 32) | (tc << 24) | (dist << 16) | (ex << 12) | (off << 4) | syn


def pack_aggregated_score(query_len, best_field_score, best_field_weight,
                          num_matching_fields, match_type: int = 0):
    """index.cpp:5344-5380 aggregated layouts.
    MAX_SCORE  [sign | tokens(4) | max_field_score(48) | weight(8) | nmf(3)]
    MAX_WEIGHT [sign | tokens(4) | weight(8) | max_field_score(48) | nmf(3)]
    SUM_SCORE  [sign | tokens(4) | sum_weighted_score(56) | nmf(3)]"""
    ql = jnp.clip(query_len, 0, 15).astype(jnp.int64)
    nmf = jnp.clip(num_matching_fields, 0, 7).astype(jnp.int64)
    if match_type == 1:    # max_weight
        w = jnp.clip(best_field_weight, 0, 127).astype(jnp.int64)
        return (ql << 59) | (w << 51) | \
            (best_field_score.astype(jnp.int64) << 3) | nmf
    if match_type == 2:    # sum_score (best_field_score = weighted sum)
        s = jnp.clip(best_field_score.astype(jnp.int64), 0, (1 << 56) - 1)
        return (ql << 59) | (s << 3) | nmf
    w = jnp.clip(best_field_weight, 0, 127).astype(jnp.int64)
    return (ql << 59) | (best_field_score.astype(jnp.int64) << 11) | (w << 3) | nmf
