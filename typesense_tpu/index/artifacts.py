"""Flat index artifacts — the TPU-native replacement for the reference's
pointer-based in-memory structures (ART, posting_list_t, num_tree_t,
facet_index_t — SURVEY.md §2.1).

Everything is a dense, static-shaped array so the query core can run as XLA
programs straight out of HBM:

- Term dictionary: instead of an adaptive radix tree (art.h), a padded uint8
  char matrix `term_chars (T, MAX_TERM_LEN)` + `term_lens`. Exact lookup is a
  host hash-map hit; fuzzy matching is a batched Levenshtein wavefront over
  the whole matrix (ops/fuzzy.py) — no pointer chasing.
- Postings: instead of block-chained compressed lists (posting_list.h), one
  flat CSR keyed by row = field_idx * T + term_id: `post_offsets` into
  `post_doc_ids` (sorted per row), with per-posting token positions in a
  second CSR (`pos_offsets` → `positions`). Intersection = vectorized binary
  search (ops/postings.py), not iterator walking.
- Numeric/sort/facet data: dense per-doc columns (num_tree.h / adi_tree.h /
  facet_index.h equivalents) so filters compile to elementwise masks and
  facet counts to segment-sums.
- Vectors: dense row-major matrix per vector field; search is a fused
  matmul + top-k scan (vs hnswlib graph walk).

The build is segment-oriented: `SegmentArrays` is immutable once built;
incremental writes accumulate in a host-side delta and trigger rebuilds
(Collection handles the policy). Device residency handled by `DeviceIndex`.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, NamedTuple

import numpy as np

MAX_TERM_LEN = 32          # terms longer than this are truncated for the device table
POS_BITS = 12              # token position within one (array-element) value
MAX_POS = (1 << POS_BITS) - 1
MAX_ELEM = (1 << 18) - 1   # array element index packed above position


def pack_position(elem_idx: int, pos: int) -> int:
    return (min(elem_idx, MAX_ELEM) << POS_BITS) | min(pos, MAX_POS)


# --- packed per-posting scoring meta (dense-scan kernel input) ---
# The dense keyword kernel scores docs by streaming membership planes, so
# everything proximity ranking needs must fit ONE uint32 per posting:
#   bits 0-11  pos0: first position, re-packed (elem:5 << 7 | offset:7)
#   bits 12-23 pos1: second position (== pos0 when the posting has only one)
#   bit 24     cnt2: posting has >= 2 positions
#   bit 25     last: token is the last token of its field value (exact match)
#   bit 26     heavy: meta can't represent this posting exactly (> 2
#              positions, elem > 31 or offset > 127) — the kernel re-scores
#              such docs from the full positions CSR, so ranking stays exact
#   bit 27     spare
#   bits 28-31 query-time typo cost (scatter-min picks the cheapest candidate)
# The 5/7-bit position split preserves the window semantics of the full
# packing: same-element offset deltas are exact and cross-element deltas
# stay >= 128 > WINDOW_SIZE, so proximity distances are identical.
META_HEAVY_BIT = np.uint32(1 << 26)
META_LAST_BIT = np.uint32(1 << 25)
META_CNT2_BIT = np.uint32(1 << 24)


def pack_post_meta(post_flags: np.ndarray, pos_offsets: np.ndarray,
                   positions: np.ndarray) -> np.ndarray:
    P = len(post_flags)
    if len(positions) == 0:
        return np.zeros(max(P, 1), dtype=np.uint32)
    cnt = (pos_offsets[1:] - pos_offsets[:-1]).astype(np.int64)
    last_pos = max(len(positions) - 1, 0)
    p0 = positions[np.clip(pos_offsets[:-1], 0, last_pos)].astype(np.int64)
    p1_idx = np.clip(pos_offsets[:-1] + 1, 0, last_pos)
    p1 = np.where(cnt >= 2, positions[p1_idx].astype(np.int64), p0)

    def enc(p):
        elem = p >> POS_BITS
        off = p & MAX_POS
        over = (elem > 31) | (off > 127)
        return ((np.minimum(elem, 31) << 7) | np.minimum(off, 127)), over

    e0, o0 = enc(p0)
    e1, o1 = enc(p1)
    heavy = (cnt > 2) | o0 | (o1 & (cnt >= 2))
    meta = (heavy.astype(np.uint32) << 26) \
        | ((post_flags.astype(np.uint32) & 1) << 25) \
        | ((cnt >= 2).astype(np.uint32) << 24) \
        | (e1.astype(np.uint32) << 12) | e0.astype(np.uint32)
    return meta


@dataclass
class SegmentArrays:
    """Host (numpy) image of one immutable index segment."""

    num_docs: int                      # N (dense seq ids 0..N-1)
    num_terms: int                     # T (true count; arrays padded)
    search_fields: list[str]           # indexed string fields, order = field_idx

    # --- term dictionary ---
    term_chars: np.ndarray             # (T, MAX_TERM_LEN) uint8, 0-padded
    term_lens: np.ndarray              # (T,) int32
    term_doc_freq: np.ndarray          # (T,) int32 total postings across fields

    # --- postings CSR; row = field_idx * T + term_id ---
    post_offsets: np.ndarray           # (F*T + 1,) int64
    post_doc_ids: np.ndarray           # (P,) int32, sorted within each row
    post_flags: np.ndarray             # (P,) uint8 bit0: token is last token of field value
    pos_offsets: np.ndarray            # (P + 1,) int64
    positions: np.ndarray              # (PP,) int32 packed (elem << POS_BITS | pos)

    # --- per-doc metadata ---
    live: np.ndarray                   # (N,) bool
    field_token_counts: np.ndarray     # (N, F) int32 tokens in field value (sum over elems)

    # packed per-posting scoring meta (see pack_post_meta); built lazily by
    # to_device when a segment predates the dense kernel
    post_meta: np.ndarray = None       # (P,) uint32

    # --- columns ---
    num_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)    # (N,) int64|float32
    num_multi: dict[str, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)  # CSR for array numerics
    facet_columns: dict[str, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)  # (offsets, value_ids)
    facet_values: dict[str, list[str]] = dc_field(default_factory=dict)    # value_id -> string
    str_sort_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)  # (N,) int64 order-preserving rank
    str_sort_dicts: dict[str, tuple] = dc_field(default_factory=dict)  # field -> (sorted_values, gapped ranks); seeds delta-segment rank interpolation
    vectors: dict[str, np.ndarray] = dc_field(default_factory=dict)        # (N, D) float32 (unit-normalized if cosine)
    geo_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)    # (N, 2) float32 lat,lng (NaN = missing)
    geopoly_columns: dict[str, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)  # ((N, Vmax, 2) f32, (N,) int32 vert counts)

    # host-only lookup structures
    term_to_id: dict[str, int] = dc_field(default_factory=dict)
    facet_value_to_id: dict[str, dict[str, int]] = dc_field(default_factory=dict)
    value_index: dict[str, dict[str, np.ndarray]] = dc_field(default_factory=dict)  # string filter: field -> value -> doc ids


class DeviceIndex(NamedTuple):
    """Device-resident pytree of one segment. Fields mirror SegmentArrays'
    array members; dict-valued members become tuples aligned with name lists
    kept host-side in `Collection`. Registered as a NamedTuple so it can be a
    jit argument without re-tracing per instance."""

    term_chars: Any
    term_lens: Any
    term_doc_freq: Any
    post_offsets: Any
    post_doc_ids: Any
    post_flags: Any
    pos_offsets: Any
    positions: Any
    post_meta: Any
    live: Any
    field_token_counts: Any
    num_columns: tuple          # aligned with num_column_names
    num_multi_docs: tuple       # aligned with num_multi_names: element -> doc id
    num_multi_vals: tuple       # element values
    facet_offsets: tuple        # aligned with facet_field_names
    facet_value_ids: tuple
    str_sort_columns: tuple
    vectors: tuple              # aligned with vector_field_names
    geo_columns: tuple
    geopoly_verts: tuple        # aligned with geopoly_field_names
    geopoly_counts: tuple


def to_device(seg: SegmentArrays, jnp=None) -> tuple[DeviceIndex, dict]:
    """Upload a segment to the accelerator; returns (DeviceIndex, name_map)."""
    import jax.numpy as jnp  # noqa: F811

    def put(x):
        import jax
        return jax.device_put(x)

    import numpy as np

    num_names = sorted(seg.num_columns)
    multi_names = sorted(seg.num_multi)
    facet_names = sorted(seg.facet_columns)
    str_sort_names = sorted(seg.str_sort_columns)
    vec_names = sorted(seg.vectors)
    geo_names = sorted(seg.geo_columns)
    geopoly_names = sorted(seg.geopoly_columns)

    def multi_docs(name):
        offs, vals = seg.num_multi[name]
        counts = np.diff(offs)
        return np.repeat(np.arange(len(counts), dtype=np.int32), counts)

    dev = DeviceIndex(
        term_chars=put(seg.term_chars),
        term_lens=put(seg.term_lens),
        term_doc_freq=put(seg.term_doc_freq),
        post_offsets=put(seg.post_offsets),
        post_doc_ids=put(seg.post_doc_ids),
        post_flags=put(seg.post_flags),
        pos_offsets=put(seg.pos_offsets),
        positions=put(seg.positions),
        post_meta=put(seg.post_meta if seg.post_meta is not None else
                      pack_post_meta(seg.post_flags, seg.pos_offsets,
                                     seg.positions)),
        live=put(seg.live),
        field_token_counts=put(seg.field_token_counts),
        num_columns=tuple(put(seg.num_columns[n]) for n in num_names),
        num_multi_docs=tuple(put(multi_docs(n)) for n in multi_names),
        num_multi_vals=tuple(put(seg.num_multi[n][1]) for n in multi_names),
        facet_offsets=tuple(put(seg.facet_columns[n][0]) for n in facet_names),
        facet_value_ids=tuple(put(seg.facet_columns[n][1]) for n in facet_names),
        str_sort_columns=tuple(put(seg.str_sort_columns[n]) for n in str_sort_names),
        vectors=tuple(put(seg.vectors[n]) for n in vec_names),
        geo_columns=tuple(put(seg.geo_columns[n]) for n in geo_names),
        geopoly_verts=tuple(put(seg.geopoly_columns[n][0]) for n in geopoly_names),
        geopoly_counts=tuple(put(seg.geopoly_columns[n][1]) for n in geopoly_names),
    )
    names = {
        "num": num_names, "multi": multi_names, "facet": facet_names,
        "str_sort": str_sort_names, "vec": vec_names, "geo": geo_names,
        "geopoly": geopoly_names,
    }
    return dev, names
