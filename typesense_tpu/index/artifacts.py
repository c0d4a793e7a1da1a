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
from functools import lru_cache
from typing import Any, NamedTuple

import numpy as np

MAX_TERM_LEN = 32          # terms longer than this are truncated for the device table
POS_BITS = 12              # token position within one (array-element) value
MAX_POS = (1 << POS_BITS) - 1
MAX_ELEM = (1 << 18) - 1   # array element index packed above position


def pack_position(elem_idx: int, pos: int) -> int:
    return (min(elem_idx, MAX_ELEM) << POS_BITS) | min(pos, MAX_POS)


def fold_token(s: str) -> bytes:
    """ONE byte per CODEPOINT for the device term table: ASCII identity,
    non-ASCII hashed into 128..255. Edit distances computed over this
    encoding are codepoint-level, matching the reference's unicode fuzzy
    matching (art fuzzy traversal works on codepoints) — raw UTF-8 bytes
    would make a 1-char Cyrillic/Arabic typo cost 2 edits. Distinct
    codepoints may collide in the hashed range (~1/128), which can only
    UNDER-estimate a distance by 1 and admit a rare extra candidate."""
    out = bytearray()
    for ch in s[:MAX_TERM_LEN]:
        cp = ord(ch)
        out.append(cp if cp < 128 else 128 + ((cp * 2654435761) & 0x7F))
    return bytes(out)


# --- packed per-posting scoring meta (dense-scan kernel input) ---
# TWO int32 words per posting so the dense scan's membership/cost pass
# streams HALF the bytes (and single-token or no-text-sort queries never
# read word B at all):
#   word A (the COMPARE word — plane min-combining orders by it):
#     bits 25-30 query-time typo cost (0 in stored/head form)
#     bit  24    heavy: > 3 positions or elem/offset overflow — such docs
#                re-score from the positions CSR, ranking stays exact
#     bit  23    last: token is the last token of its field value
#     bits 21-22 cnt-1: positions count 1..3 (heavy above)
#     bits 0-11  pos0 (re-packed 12 bits: elem:5 << 7 | offset:7)
#   word B: bits 0-11 pos1, bits 12-23 pos2
# The 5/7-bit position split preserves window semantics: same-element
# offset deltas are exact, cross-element deltas stay >= 128 > WINDOW_SIZE.
MA_CNT_SHIFT = 21
MA_LAST_SHIFT = 23
MA_HEAVY_SHIFT = 24
MA_COST_SHIFT = 25
MA_EMPTY = np.int32(2**31 - 1)   # plane init; above any packed A word


def pack_post_meta_ab_device(post_flags, pos_offsets, positions):
    """Device-side (A, B) meta packing for head-plane construction."""
    import typesense_tpu.core.jaxcfg  # noqa: F401
    import jax
    import jax.numpy as jnp

    P = len(post_flags)
    if len(positions) == 0:
        z = jax.device_put(np.zeros(max(P, 1), dtype=np.int32))
        return z, z
    last = max(len(positions) - 1, 0)

    @jax.jit
    def pack(flags, po, pos):
        cnt = po[1:] - po[:-1]
        encs = []
        over = jnp.zeros(P, bool)
        for k in range(3):
            idx = jnp.clip(po[:-1] + k, 0, last)
            p = pos[idx].astype(jnp.int64)
            valid = cnt > k
            elem = p >> POS_BITS
            off = p & MAX_POS
            over = over | (((elem > 31) | (off > 127)) & valid)
            enc = (jnp.minimum(elem, 31) << 7) | jnp.minimum(off, 127)
            encs.append(jnp.where(valid, enc, 0))
        heavy = (cnt > 3) | over
        a = (encs[0]
             | ((jnp.clip(cnt, 1, 3) - 1) << MA_CNT_SHIFT)
             | ((flags.astype(jnp.int64) & 1) << MA_LAST_SHIFT)
             | (heavy.astype(jnp.int64) << MA_HEAVY_SHIFT))
        b = encs[1] | (encs[2] << 12)
        return a.astype(jnp.int32), b.astype(jnp.int32)

    return pack(post_flags, pos_offsets, positions)


# --- 32-bit per-posting meta for the QUERY-TIME scatter path ---
# TPU scatter-min on int64 measures ~9x slower than 32-bit, so per-query
# scatters of mid-size rows use this 2-position uint32 packing (the dense
# scan converts winning cells to the meta64 form); the build-time head
# planes carry full meta64.
#   bits 0-11  pos0   bits 12-23 pos1   bit 24 cnt>=2   bit 25 last
#   bit 26     heavy (> 2 positions or field/offset overflow)
#   bits 28-31 query-time typo cost
M32_CNT2_SHIFT = 24
M32_LAST_SHIFT = 25
M32_HEAVY_SHIFT = 26
M32_COST_SHIFT = 28


def pack_post_meta32_device(post_flags, pos_offsets, positions):
    import typesense_tpu.core.jaxcfg  # noqa: F401
    import jax
    import jax.numpy as jnp

    P = len(post_flags)
    if len(positions) == 0:
        return jax.device_put(np.zeros(max(P, 1), dtype=np.uint32))
    last = max(len(positions) - 1, 0)

    @jax.jit
    def pack(flags, po, pos):
        cnt = po[1:] - po[:-1]
        p0 = pos[jnp.clip(po[:-1], 0, last)].astype(jnp.int64)
        p1i = jnp.clip(po[:-1] + 1, 0, last)
        p1 = jnp.where(cnt >= 2, pos[p1i].astype(jnp.int64), p0)

        def enc(p):
            elem = p >> POS_BITS
            off = p & MAX_POS
            over = (elem > 31) | (off > 127)
            return ((jnp.minimum(elem, 31) << 7) | jnp.minimum(off, 127)), \
                over

        e0, o0 = enc(p0)
        e1, o1 = enc(p1)
        heavy = (cnt > 2) | o0 | (o1 & (cnt >= 2))
        return ((heavy.astype(jnp.int64) << M32_HEAVY_SHIFT)
                | ((flags.astype(jnp.int64) & 1) << M32_LAST_SHIFT)
                | ((cnt >= 2).astype(jnp.int64) << M32_CNT2_SHIFT)
                | (e1 << 12) | e0).astype(jnp.uint32)

    return pack(post_flags, pos_offsets, positions)


def build_heavy_lists(seg) -> tuple[np.ndarray, np.ndarray]:
    """Per-row CSR of HEAVY postings (docs whose occurrence meta exceeds
    the packed plane capacity and need exact CSR rescoring). Precomputing
    these at build time lets the dense2 kernel stream a query's heavy
    candidates as contiguous slices — the per-query whole-N heavy
    selection loop measured ~4.5 ms at 2.2M docs.

    Entries pack doc_id | (tier64 << 30): tier64 marks postings heavy
    under the 3-position meta64 criterion (head-plane rows); all entries
    satisfy the wider 2-position meta32 criterion (scattered rows). The
    kernel masks by each candidate row's actual path."""
    P = len(seg.post_flags)
    po = seg.pos_offsets
    pos = seg.positions
    if len(pos) == 0 or P == 0:
        return (np.zeros(0, np.int32),
                np.zeros(len(seg.post_offsets), np.int64))
    cnt = np.diff(po)
    last = len(pos) - 1

    def over(k):
        idx = np.clip(po[:-1] + k, 0, last)
        p = pos[idx]
        return ((p >> POS_BITS) > 31) | ((p & MAX_POS) > 127)

    o0 = over(0) & (cnt > 0)
    o1 = over(1) & (cnt > 1)
    o2 = over(2) & (cnt > 2)
    heavy32 = (cnt > 2) | o0 | o1
    heavy64 = (cnt > 3) | o0 | o1 | o2
    hmask = heavy32                 # superset of heavy64 by construction
    hidx = np.flatnonzero(hmask)
    row_of = np.searchsorted(seg.post_offsets, hidx, side="right") - 1
    counts = np.bincount(row_of, minlength=len(seg.post_offsets) - 1)
    heavy_offsets = np.concatenate(
        [[0], np.cumsum(counts)]).astype(np.int64)
    packed = (seg.post_doc_ids[hidx].astype(np.int64)
              | (heavy64[hidx].astype(np.int64) << 30)).astype(np.int32)
    return packed, heavy_offsets


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

    # packed per-posting scoring meta (see pack_post_meta); normally None —
    # to_device packs it directly on device at upload time
    post_meta: np.ndarray = None       # (P,) int64

    # --- columns ---
    num_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)    # (N,) int64|float32
    num_multi: dict[str, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)  # CSR for array numerics
    facet_columns: dict[str, tuple[np.ndarray, np.ndarray]] = dc_field(default_factory=dict)  # (offsets, value_ids)
    facet_values: dict[str, list[str]] = dc_field(default_factory=dict)    # value_id -> string
    str_sort_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)  # (N,) int64 order-preserving rank
    str_sort_dicts: dict[str, tuple] = dc_field(default_factory=dict)  # field -> (sorted_values, gapped ranks); seeds delta-segment rank interpolation
    vectors: dict[str, np.ndarray] = dc_field(default_factory=dict)        # (N, D) float32 (unit-normalized if cosine)
    geo_columns: dict[str, np.ndarray] = dc_field(default_factory=dict)    # (N, 2) float32 lat,lng (NaN = missing)
    # geopoint[] entries: name -> ((E,) doc seq ids, (E, 2) coords);
    # filters/sorts reduce per entry then per doc (closest point wins)
    geo_multi: dict[str, tuple] = dc_field(default_factory=dict)
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
    head_a: Any                 # (H, N) int32 A-word planes for the
                                # highest-volume posting rows (scatter cache)
    head_b: Any                 # (H, N) int32 B-word planes
    heavy_ids: Any              # (HP,) int32 doc|tier64<<30 heavy postings
                                # (CSR rows via seg.heavy_offsets)
    live: Any
    field_token_counts: Any
    facet_single: tuple         # aligned with facet names: (N,) int32 value
                                # id per doc (size = V sentinel when missing)
                                # or None when the field is multi-valued
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


HEAD_ROW_MIN = 65536    # rows at least this long are head-plane candidates


def head_plane_budget_bytes() -> int:
    import os
    return int(os.environ.get("TS_HEAD_PLANE_MB", "768")) * 1_000_000


def select_head_rows(seg: SegmentArrays) -> np.ndarray:
    """Longest posting rows first, until the plane budget is spent. Under a
    Zipf vocabulary this caches the rows that dominate per-query scatter
    volume (the reference never pays this cost — its posting lists are
    iterated, not densified; on TPU dense planes are what make the scoring
    scan sequential, so caching the head rows is the analogous read
    optimization to the reference's posting-block skip lists)."""
    row_lens = np.diff(seg.post_offsets)
    budget = head_plane_budget_bytes()
    n_max = max(budget // (8 * max(seg.num_docs, 1)), 0)
    if n_max == 0:
        return np.empty(0, np.int64)
    cand = np.flatnonzero(row_lens >= min(HEAD_ROW_MIN,
                                          max(seg.num_docs // 8, 4096)))
    if len(cand) == 0:
        return np.empty(0, np.int64)
    order = cand[np.argsort(-row_lens[cand], kind="stable")]
    return order[:n_max].astype(np.int64)


def plane_cache_rows(num_docs: int) -> int:
    """Number of runtime LRU plane-cache slots appended after the build-time
    head rows. The cache turns EVERY dense2 query into the all-head kernel
    signature (SCB == SCBB == 0): the per-query scatter-plane path costs
    ~19 ms/query at 2.2M docs in plane memset + merge-convert alone, while
    a one-time on-device row densification costs ~1-5 ms and is reused
    across queries (Zipf query mixes repeat tokens heavily)."""
    import os
    if num_docs < int(os.environ.get("TS_PLANE_CACHE_MIN_N", "200000")):
        return 0
    rows = os.environ.get("TS_PLANE_CACHE_ROWS")
    if rows is not None:
        return max(int(rows), 0)
    # sized for a 16 GB chip: ~7.8 GB static at 2.2M docs with the 6 GB
    # default (bench releases the cache before its vector config); slot
    # count capped so small corpora don't densify the whole vocabulary
    budget = int(os.environ.get("TS_PLANE_CACHE_MB", "6144")) * 1_000_000
    NP = -(-max(num_docs, 1) // 128) * 128
    return min(max(budget // (8 * NP), 0), 1024)


def build_head_planes(seg: SegmentArrays, post_doc_ids_dev):
    """Two (H, N) int32 dense meta planes (words A and B) for the selected
    head rows, built on-device. Doc ids are unique within one posting row,
    so the A/B pair scatters without any atomic-pair concern."""
    import typesense_tpu.core.jaxcfg  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax import lax

    rows = select_head_rows(seg)
    N = max(seg.num_docs, 1)
    # planes are padded to a 128-multiple width (lane-aligned tiles);
    # pad cells stay MA_EMPTY / 0 (XLA kernels slice [:N] as before)
    NP = -(-N // 128) * 128
    if len(rows) == 0:
        e = jax.device_put(np.full((1, 1), MA_EMPTY, np.int32))
        return e, e, {}
    meta_a, meta_b = pack_post_meta_ab_device(
        seg.post_flags, seg.pos_offsets, seg.positions)
    po = seg.post_offsets
    CH = 1 << 20

    @jax.jit
    def one(start, end, post_doc_ids, ma, mb):
        def step(i, planes):
            pa, pb = planes
            idx = start + i * CH + jnp.arange(CH, dtype=jnp.int64)
            valid = idx < end
            safe = jnp.clip(idx, 0, post_doc_ids.shape[0] - 1)
            docs = post_doc_ids[safe]
            flat = jnp.where(valid, docs, jnp.int32(NP))
            pa = pa.at[flat].set(ma[safe], mode="drop")
            pb = pb.at[flat].set(mb[safe], mode="drop")
            return pa, pb

        n = (end - start + CH - 1) // CH
        return lax.fori_loop(0, n, step,
                             (jnp.full((NP,), MA_EMPTY, jnp.int32),
                              jnp.zeros((NP,), jnp.int32)))

    pa_list, pb_list = [], []
    for r in rows:
        pa, pb = one(jnp.int64(po[r]), jnp.int64(po[r + 1]),
                     post_doc_ids_dev, meta_a, meta_b)
        pa_list.append(pa)
        pb_list.append(pb)
    head_map = {int(r): h for h, r in enumerate(rows)}
    return jnp.stack(pa_list), jnp.stack(pb_list), head_map


PLANE_GROUP_ROWS = 8   # rows per runtime-cache group: an insert copies one
# 2 * g * NP group (~141 MB at 2.2M docs) — this backend's buffer donation
# does NOT alias, so group size IS the insert cost


@lru_cache(maxsize=32)
def make_plane_gather(NP: int, n: int):
    """Per-query plane gather: copies the n runtime-cache rows a query
    needs into a private (n, NP) pair the dense2 kernel indexes directly.
    Group selection happens on the HOST (the engine passes the right group
    array per position), so the big kernel carries no lax.switch — a
    22-branch switch over group operands pushed its XLA compile past 19
    minutes on this toolchain."""
    import typesense_tpu.core.jaxcfg  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def gather(ris, *groups):
        # groups: n A-group arrays then n B-group arrays, each (g, NP)
        z = jnp.int32(0)
        outs_a = [lax.dynamic_slice(groups[j], (ris[j], z), (1, NP))
                  for j in range(n)]
        outs_b = [lax.dynamic_slice(groups[n + j], (ris[j], z), (1, NP))
                  for j in range(n)]
        return (jnp.concatenate(outs_a, axis=0),
                jnp.concatenate(outs_b, axis=0))

    return gather


@lru_cache(maxsize=8)
def make_group_row_writer(NP: int, g: int):
    """Jitted densifier for the grouped runtime plane cache: builds one
    posting row's (A, B) meta planes and writes them into row `slot` of a
    (g, NP) group pair. The group arrays are donated; even in copy-mode
    (donation aliasing unsupported on this backend) the copy is one small
    group, not the whole cache."""
    import typesense_tpu.core.jaxcfg  # noqa: F401
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax

    CH = 1 << 18

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def write_row(grp_a, grp_b, slot, start, end, post_doc_ids,
                  meta_a, meta_b):
        lane = jnp.arange(CH, dtype=jnp.int64)

        def step(i, planes):
            pa, pb = planes
            idx = start + i * CH + lane
            valid = idx < end
            safe = jnp.clip(idx, 0, post_doc_ids.shape[0] - 1)
            docs = post_doc_ids[safe].astype(jnp.int64)
            # invalid tail lanes map to unique ascending out-of-bounds
            # indices: keeps the scatter's sorted+unique promise honest
            # while mode="drop" discards them
            flat = jnp.where(valid, docs, NP + lane)
            pa = pa.at[flat].set(meta_a[safe], mode="drop",
                                 indices_are_sorted=True,
                                 unique_indices=True)
            pb = pb.at[flat].set(meta_b[safe], mode="drop",
                                 indices_are_sorted=True,
                                 unique_indices=True)
            return pa, pb

        n = (end - start + CH - 1) // CH
        pa, pb = lax.fori_loop(0, n, step,
                               (jnp.full((NP,), MA_EMPTY, jnp.int32),
                                jnp.zeros((NP,), jnp.int32)))
        z = jnp.zeros((), slot.dtype)
        ha = lax.dynamic_update_slice(grp_a, pa[None], (slot, z))
        hb = lax.dynamic_update_slice(grp_b, pb[None], (slot, z))
        return ha, hb

    return write_row


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

    def facet_single(name):
        """(N,) int32 single value id per doc (V = missing sentinel), or
        None when any doc holds multiple values (those need the CSR path)."""
        offs, vals = seg.facet_columns[name]
        counts = np.diff(offs)
        if counts.max(initial=0) > 1:
            return None
        V = len(seg.facet_values[name])
        col = np.full(seg.num_docs, V, np.int32)
        has = counts == 1
        col[has] = vals[offs[:-1][has]]
        return put(col)

    post_doc_ids_dev = put(seg.post_doc_ids)
    n_cache = plane_cache_rows(seg.num_docs)
    head_a, head_b, head_map = build_head_planes(seg, post_doc_ids_dev)
    # the runtime plane cache densifies rows on demand from these packed
    # meta words (kept resident: ~274 MB at 2.2M docs)
    plane_meta = None
    if n_cache > 0:
        plane_meta = pack_post_meta_ab_device(
            seg.post_flags, seg.pos_offsets, seg.positions)
    # the per-query scatter path (and heavy rescore's last-flag) uses the
    # 32-bit 2-position packing, which scatters ~9x faster than int64
    post_meta_dev = pack_post_meta32_device(seg.post_flags, seg.pos_offsets,
                                            seg.positions)
    heavy_packed, heavy_offsets = build_heavy_lists(seg)
    seg.heavy_offsets = heavy_offsets       # host planner slice bounds
    heavy_ids_dev = put(heavy_packed if len(heavy_packed)
                        else np.zeros(1, np.int32))

    dev = DeviceIndex(
        term_chars=put(seg.term_chars),
        term_lens=put(seg.term_lens),
        term_doc_freq=put(seg.term_doc_freq),
        post_offsets=put(seg.post_offsets),
        post_doc_ids=post_doc_ids_dev,
        post_flags=put(seg.post_flags),
        pos_offsets=put(seg.pos_offsets),
        positions=put(seg.positions),
        post_meta=post_meta_dev,
        head_a=head_a,
        head_b=head_b,
        heavy_ids=heavy_ids_dev,
        live=put(seg.live),
        field_token_counts=put(seg.field_token_counts),
        facet_single=tuple(facet_single(n) for n in facet_names),
        num_columns=tuple(put(seg.num_columns[n]) for n in num_names),
        num_multi_docs=tuple(put(multi_docs(n)) for n in multi_names),
        num_multi_vals=tuple(put(seg.num_multi[n][1]) for n in multi_names),
        facet_offsets=tuple(put(seg.facet_columns[n][0]) for n in facet_names),
        facet_value_ids=tuple(put(seg.facet_columns[n][1]) for n in facet_names),
        str_sort_columns=tuple(put(seg.str_sort_columns[n]) for n in str_sort_names),
        # large vector fields store bf16: halves HBM traffic for the scan
        # (the usual bottleneck) at ~1e-3 distance error; small corpora
        # keep f32 exactness (hnswlib stores f32, index.h:379-388 — bf16
        # is the TPU trade, recall measured against an f32 oracle in bench)
        vectors=tuple(
            jax.device_put(jnp.asarray(seg.vectors[n], jnp.bfloat16))
            if seg.vectors[n].shape[0] >= 100_000
            else put(seg.vectors[n])
            for n in vec_names),
        geo_columns=tuple(put(seg.geo_columns[n]) for n in geo_names),
        geopoly_verts=tuple(put(seg.geopoly_columns[n][0]) for n in geopoly_names),
        geopoly_counts=tuple(put(seg.geopoly_columns[n][1]) for n in geopoly_names),
    )
    names = {
        "num": num_names, "multi": multi_names, "facet": facet_names,
        "str_sort": str_sort_names, "vec": vec_names, "geo": geo_names,
        "geopoly": geopoly_names, "head_map": head_map,
        "plane_cache_rows": n_cache, "plane_meta_ab": plane_meta,
    }
    return dev, names
