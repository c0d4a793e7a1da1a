"""Proximity Match parity tests against a faithful Python port of the
reference algorithm (match_score.h:129-275), plus packing checks."""

import numpy as np
import pytest

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax.numpy as jnp

from typesense_tpu.ops.match import match_components, pack_field_score

WINDOW_SIZE = 10
MAXD = 1 << 16


def reference_match(token_offsets: list[list[int]]):
    """Line-for-line behavioral port of Match::Match (heap walk) used only as
    a test oracle. Returns (words_present, distance, max_offset)."""
    tokens_size = min(len(token_offsets), WINDOW_SIZE)
    window = [(token_offsets[t][0], t, 0) for t in range(tokens_size)]
    best_num_match, best_displacement = 1, MAXD
    max_offset = 0
    prev_min_offset = -1
    while len(window) > 1:
        window.sort(key=lambda x: -x[0])
        min_offset = window[-1][0]
        if min_offset < prev_min_offset:
            break
        prev_min_offset = min_offset
        this_displacement = 0
        this_num_match = 0
        for i in range(len(window)):
            if window[i][0] - min_offset <= WINDOW_SIZE:
                nxt = window[i][0] if i == len(window) - 1 else window[i + 1][0]
                this_displacement += window[i][0] - nxt
                this_num_match += 1
        if (this_num_match > best_num_match or
                (this_num_match == best_num_match and this_displacement < best_displacement)):
            best_displacement = this_displacement
            best_num_match = this_num_match
            max_offset = min(255, window[0][0])
        if best_num_match == tokens_size and best_displacement == len(window) - 1:
            break
        off, tid, oi = window.pop()
        if off != token_offsets[tid][-1]:
            window.append((token_offsets[tid][oi + 1], tid, oi + 1))
    if best_displacement == MAXD:
        best_displacement = 0
    return best_num_match, best_displacement, max_offset


def run_kernel(token_offsets: list[list[int]], Q=None, P=8):
    Qn = len(token_offsets)
    Q = Q or Qn
    pos = np.zeros((1, Q, P), np.int32)
    val = np.zeros((1, Q, P), bool)
    tm = np.zeros((1, Q), bool)
    for t, offs in enumerate(token_offsets):
        tm[0, t] = len(offs) > 0
        for j, o in enumerate(offs[:P]):
            pos[0, t, j] = o
            val[0, t, j] = True
    wp, dist, moff, _anchor = match_components(jnp.asarray(pos), jnp.asarray(val), jnp.asarray(tm))
    return int(wp[0]), int(dist[0]), int(moff[0])


CASES = [
    [[1], [2], [3]],                      # perfectly adjacent
    [[1], [3], [5]],                      # gaps
    [[1], [50]],                          # far apart -> partial window
    [[38, 50], [1, 39], [2, 40]],         # needs later window
    [[1, 2, 3]],                          # single token -> (1, 0, 0)
    [[5], [5], [5]],                      # identical offsets
    [[0], [12]],                          # just outside window
    [[0], [10]],                          # exactly window edge (inclusive)
    [[3, 9, 40], [2, 41], [0, 43]],
    [[7]],
    [[100, 200], [105, 201], [110, 202]],
]


@pytest.mark.parametrize("offsets", CASES)
def test_match_parity(offsets):
    exp = reference_match(offsets)
    got = run_kernel(offsets)
    assert got == exp, f"offsets={offsets}: got {got}, expected {exp}"


def test_match_randomized():
    rng = np.random.default_rng(42)
    for _ in range(60):
        Q = int(rng.integers(2, 5))
        offsets = []
        for _t in range(Q):
            n = int(rng.integers(1, 6))
            offs = np.sort(rng.choice(60, size=n, replace=False)).tolist()
            offsets.append(offs)
        exp = reference_match(offsets)
        got = run_kernel(offsets)
        assert got == exp, f"offsets={offsets}: got {got}, expected {exp}"


def test_pack_field_score_layout():
    s = pack_field_score(jnp.array([3]), jnp.array([3]), jnp.array([1]),
                         jnp.array([2]), jnp.array([1]), jnp.array([0]),
                         jnp.array([1]))
    v = int(s[0])
    assert (v >> 40) & 0xFF == 3            # words_present
    assert (v >> 32) & 0xFF == 3            # unique words
    assert (v >> 24) & 0xFF == 254          # 255 - cost
    assert (v >> 16) & 0xFF == 98           # 100 - distance
    assert (v >> 12) & 0xF == 1             # exact
    assert v & 0xF == 1                     # synonym bit
