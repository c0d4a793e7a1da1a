"""Host-side query executor: the Index::search / run_search equivalent
(/root/reference/src/index.cpp:2488,3451) orchestrating device kernels.

The host does only O(query) work per request — token lookup in the term map,
candidate/bucket selection, kernel dispatch — then trims the device's top-K.
All O(corpus) work happens on the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401  (must precede jax use)
import jax
import jax.numpy as jnp

from typesense_tpu.core.errors import BadRequest
from typesense_tpu.index.artifacts import SegmentArrays, to_device
from typesense_tpu.schema.field import Field
from typesense_tpu.search import kernels

INT_MAX = 2**31 - 1
from typesense_tpu.search.batcher import QueryBatcher
from typesense_tpu.utils.buckets import bucket, bucket4

MAX_QUERY_TOKENS = 10   # proximity window is capped at WINDOW_SIZE anyway
MAX_POS_PER_POSTING = 16
TOPK = 256              # topster size ~ max(250, fetch) (index.cpp:3506-3514)
SCORE_CHUNK_MAX = 8192
SCORE_CHUNK_WIDE = 32768

# process-wide query coalescer: concurrent same-signature vector-kNN
# dispatches ride one batched program (TS_BATCH=0 disables). Brute kNN
# amortizes 7x batched (12.6ms solo -> 1.7ms/q at B=16 on-chip); dense2
# does NOT (per-query whole-N scan: B=8 measured 7.98ms/q vs 5.32 solo),
# so keyword batching is opt-in via TS_BATCH_DENSE2=1 and default-off.
import os as _os
QUERY_BATCHER = QueryBatcher(enabled=_os.environ.get("TS_BATCH", "1") != "0")
DENSE2_BATCH = _os.environ.get("TS_BATCH_DENSE2", "0") == "1"

# runtime plane-cache telemetry (bench/stats read these)
PLANE_CACHE_STATS = {"hits": 0, "misses": 0, "evictions": 0, "starved": 0}

# max runtime-cache rows gathered per query (n_pad caps at the next pow2):
# wider gathers compile per-width programs whose AOT HBM accounting scales
# with width x group size — n_pad=32 exceeded 16 GB at 2.2M docs
QPLANE_MAX = int(_os.environ.get("TS_QPLANE_MAX", "8"))


@jax.jit
def _geo_distance_keys(geo_col, lat, lng, exclude_radius_m, precision_m,
                       missing_key):
    """(N,2) [lat,lng] degrees -> int64 meter distances from (lat,lng).
    exclude_radius collapses nearby docs to 0; precision buckets distances
    (geo sort options, collection.cpp sort parsing)."""
    lat1 = jnp.radians(geo_col[:, 0])
    lng1 = jnp.radians(geo_col[:, 1])
    lat2 = jnp.radians(lat)
    lng2 = jnp.radians(lng)
    d = 2.0 * 6371008.8 * jnp.arcsin(jnp.sqrt(
        jnp.sin((lat2 - lat1) / 2) ** 2 +
        jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin((lng2 - lng1) / 2) ** 2))
    d = jnp.where(d <= exclude_radius_m, 0.0, d)
    d = jnp.where(precision_m > 0, jnp.floor(d / jnp.maximum(precision_m, 1e-9))
                  * precision_m, d)
    keys = jnp.round(d).astype(jnp.int64)
    return jnp.where(jnp.isnan(geo_col[:, 0]), missing_key, keys)


def float32_sortable_int64(x: np.ndarray) -> np.ndarray:
    """Order-preserving float32 -> int64 via the radix trick: flip the sign
    bit for positives, all bits for negatives. Missing (NaN) -> very small."""
    u = x.view(np.uint32).astype(np.int64)
    mask = np.where(u >> 31 == 1, np.int64(0xFFFFFFFF), np.int64(0x80000000))
    keys = u ^ mask
    return np.where(np.isnan(x), np.int64(-(2**61)), keys)


@dataclass
class SortSpec:
    """One parsed sort_by component."""
    kind: int                  # kernels.SLOT_*
    sign: int = 1              # +1 desc(better=larger), -1 asc
    column: str | None = None
    custom_col: object = None  # precomputed device column (geo/_eval/_rand/missing)
    geo_field: str | None = None   # set for geo-distance sorts (response needs meters)
    geo_target: tuple | None = None  # (lat, lng)
    buckets: int = 0           # _text_match/_vector_distance(buckets: N)
    bucket_size: int = 0       # ...(bucket_size: N) — collection.cpp:2895


@dataclass
class RawResult:
    doc_ids: np.ndarray        # (k,) matched top docs (trimmed, valid only)
    scores: np.ndarray         # (k, 3) int64 sort keys (slot order)
    found: int
    facet_counts: dict = dc_field(default_factory=dict)  # field -> (values, counts)
    out_of: int = 0


class IndexEngine:
    def __init__(self, segment: SegmentArrays, fields: list[Field]):
        import time as _time
        _t0 = _time.time()
        self.seg = segment
        self.fields = {f.name: f for f in fields}
        self.search_fields = segment.search_fields
        self.field_idx = {n: i for i, n in enumerate(segment.search_fields)}
        self.T = max(segment.num_terms, 1)
        self.N = segment.num_docs

        self.dev, self.names = to_device(segment)
        self._num_col_idx = {n: i for i, n in enumerate(self.names["num"])}
        self._multi_idx = {n: i for i, n in enumerate(self.names["multi"])}
        self._facet_idx = {n: i for i, n in enumerate(self.names["facet"])}
        self._vec_idx = {n: i for i, n in enumerate(self.names["vec"])}
        self._geo_idx = {n: i for i, n in enumerate(self.names["geo"])}
        self._geopoly_idx = {n: i for i, n in enumerate(self.names["geopoly"])}

        # sort-ready int64 device columns; _col_pack_ok marks columns whose
        # key magnitude fits the dense kernel's packed 2-key merge
        # (|key| < 2^39, kernels.PACK2_BIAS)
        self._sort_cols: dict[str, jax.Array] = {}
        self._col_pack_ok: dict[str, bool] = {}
        self._col32_ok: dict[str, bool] = {}
        self._ftc_cache: dict = {}        # fis tuple -> (N, Fq) int32
        # host mirrors of the sort keys: the heavy host-rescore reads its
        # few hundred docs' keys here instead of paying a device gather +
        # readback round trip (~28 ms over the axon tunnel)
        self._sort_cols_host: dict[str, np.ndarray] = {}
        for name, col in segment.num_columns.items():
            if col.dtype == np.float32:
                keys = float32_sortable_int64(col)
            else:
                keys = np.clip(col, -(2**61), 2**61)
            mx = int(np.abs(keys).max(initial=0))
            self._col_pack_ok[name] = mx < (1 << 39)
            self._col32_ok[name] = mx < (1 << 31) - 1
            self._sort_cols_host[name] = np.asarray(keys, np.int64)
            self._sort_cols[name] = jax.device_put(jnp.asarray(keys, jnp.int64))
        for name, col in segment.str_sort_columns.items():
            # string ranks ascend with lexicographic order; missing (INT64_MAX)
            # must sort last both ways -> clamp into range
            keys = np.clip(col, -(2**61), 2**61)
            mx = int(np.abs(keys).max(initial=0))
            self._col_pack_ok[name] = mx < (1 << 39)
            self._col32_ok[name] = mx < (1 << 31) - 1
            self._sort_cols_host[name] = np.asarray(keys, np.int64)
            self._sort_cols[name] = jax.device_put(
                jnp.asarray(keys, jnp.int64))

        self._zero_col = jax.device_put(jnp.zeros(max(self.N, 1), jnp.int64))
        self._live = jax.device_put(jnp.asarray(segment.live))
        self._live_count = int(segment.live.sum())
        # binary-search depth: rows are searched within [row_start, row_end),
        # so convergence needs log2(LONGEST ROW), not log2(total postings) —
        # ~20% fewer gathers in the probe/heavy passes at 2.2M docs
        max_row = int(np.diff(segment.post_offsets).max(initial=1))
        self._iters = max(int(np.ceil(np.log2(max(max_row, 2)))) + 1, 2)

        # facet device metadata
        self._facet_caps = {}
        for name in self.names["facet"]:
            offs = segment.facet_columns[name][0]
            cap = int(max((offs[1:] - offs[:-1]).max(initial=0), 1))
            # exact counting: the unroll width must cover the TRUE max
            # values-per-doc (the round-1 min(cap, 16) silently under-counted
            # docs with >16 facet values); round up to a power of two so
            # compile shapes bucket
            self._facet_caps[name] = 1 << (cap - 1).bit_length() if cap > 1 else 1
        # ---- runtime LRU plane cache (all-head everywhere) ----
        # Extra rows in dev.head_a/head_b are filled on demand with dense
        # (A, B) meta planes for tokens a dense2 query needs: the per-query
        # scatter-plane path costs ~19 ms/query at 2.2M docs in plane
        # memset + merge-convert alone, while a cached row costs a one-time
        # ~1-5 ms on-device densification and makes the query take the
        # all-head kernel signature (SCB == SCBB == 0). Zipf query mixes
        # repeat tokens heavily, so the hit rate dominates.
        import threading
        from collections import OrderedDict
        self._plane_lock = threading.RLock()
        n_cache = self.names.get("plane_cache_rows", 0)
        self._plane_meta = self.names.get("plane_meta_ab")
        self._plane_cache_on = n_cache > 0 and self._plane_meta is not None
        # cache slot numbering starts at the kernel's H_rows
        # (head_a.shape[0]) — with no real head rows the placeholder still
        # occupies row index 0
        self._plane_H = int(self.dev.head_a.shape[0]) \
            if self._plane_cache_on else len(self.names.get("head_map", {}))
        self._cache_groups_a: list = []
        self._cache_groups_b: list = []
        n_slots = 0
        if self._plane_cache_on:
            from typesense_tpu.index.artifacts import (MA_EMPTY,
                                                       PLANE_GROUP_ROWS)
            NPW = -(-max(self.N, 1) // 128) * 128
            g = PLANE_GROUP_ROWS
            G = max((n_cache + g - 1) // g, 1)
            n_slots = G * g
            for _ in range(G):
                self._cache_groups_a.append(
                    jax.device_put(jnp.full((g, NPW), MA_EMPTY, jnp.int32)))
                self._cache_groups_b.append(
                    jax.device_put(jnp.zeros((g, NPW), jnp.int32)))
            self._plane_NPW = NPW
            self._plane_g = g
        self._plane_free = list(range(self._plane_H,
                                      self._plane_H + n_slots))
        self._plane_lru: OrderedDict[int, int] = OrderedDict()  # row -> slot
        self._plane_slot_row: dict[int, int] = {}               # slot -> row
        self._plane_row_len: dict[int, int] = {}                # slot -> len
        self._plane_pins: dict[int, int] = {}                   # slot -> pins
        import random as _random
        self._plane_rng = _random.Random(0xC0FFEE)
        from typesense_tpu.index import builder as _b
        _b.BUILD_TIMINGS["device_upload_s"] = round(_time.time() - _t0, 1)

    # ------------------------------------------------------------------
    def _plane_slot_for(self, row: int, start: int, end: int) -> int | None:
        """Return the plane-cache slot holding posting row `row`, densifying
        it into a free/evicted slot on a miss. Caller must hold
        self._plane_lock. Returns None when every slot is pinned (caller
        falls back to the scatter path). The densify+write dispatch is
        ASYNC — device program order guarantees any later query kernel
        reads the completed row."""
        slot = self._plane_lru.get(row)
        if slot is not None:
            self._plane_lru.move_to_end(row)
            PLANE_CACHE_STATS["hits"] += 1
            return slot
        if self._plane_free:
            slot = self._plane_free.pop()
        else:
            # RANDOM-SAMPLE eviction, not LRU: a query mix whose distinct-
            # row working set exceeds the slot count turns LRU into a
            # cyclic scan with a 0% hit rate (measured: 2688 evictions /
            # 359 hits over one bench pass); random eviction degrades to
            # ~slots/set hits. Among an 8-slot sample, evict the SHORTEST
            # row: rebuild cost is ~linear in postings (a 1M-row densify
            # costs ~5-7 ms, a 10k row ~0.3 ms), so keeping long rows
            # resident minimizes expected rebuild time (GreedyDual-Size)
            slot = None
            cands = [s for s in self._plane_slot_row
                     if not self._plane_pins.get(s)]
            if cands:
                sample = [cands[self._plane_rng.randrange(len(cands))]
                          for _ in range(min(8, len(cands)))]
                slot = min(sample, key=lambda s: self._plane_row_len.get(
                    s, 0))
                del self._plane_lru[self._plane_slot_row.pop(slot)]
                self._plane_row_len.pop(slot, None)
                PLANE_CACHE_STATS["evictions"] += 1
            if slot is None:
                PLANE_CACHE_STATS["starved"] += 1
                return None
        PLANE_CACHE_STATS["misses"] += 1
        from typesense_tpu.index.artifacts import make_group_row_writer
        writer = make_group_row_writer(self._plane_NPW, self._plane_g)
        ma, mb = self._plane_meta
        gi = (slot - self._plane_H) // self._plane_g
        ri = (slot - self._plane_H) % self._plane_g
        ga, gb = writer(self._cache_groups_a[gi], self._cache_groups_b[gi],
                        jnp.int32(ri), jnp.int64(start), jnp.int64(end),
                        self.dev.post_doc_ids, ma, mb)
        self._cache_groups_a[gi] = ga
        self._cache_groups_b[gi] = gb
        self._plane_lru[row] = slot
        self._plane_slot_row[slot] = row
        self._plane_row_len[slot] = end - start
        return slot

    def release_plane_cache(self):
        """Free the runtime plane cache's device memory (bench releases it
        before memory-hungry phases like the 2M x 768 vector config).
        Subsequent dense2 queries fall back to the scatter path."""
        with self._plane_lock:
            self._plane_cache_on = False
            self._cache_groups_a = []
            self._cache_groups_b = []
            self._plane_free = []
            self._plane_lru.clear()
            self._plane_slot_row.clear()
            self._plane_row_len.clear()
            self._plane_meta = None

    def _plane_pin(self, slots):
        for s in slots:
            self._plane_pins[s] = self._plane_pins.get(s, 0) + 1

    def _plane_unpin(self, slots):
        with self._plane_lock:
            for s in slots:
                n = self._plane_pins.get(s, 0) - 1
                if n <= 0:
                    self._plane_pins.pop(s, None)
                else:
                    self._plane_pins[s] = n

    # ------------------------------------------------------------------
    def mark_deleted(self, seq_ids: list[int]):
        """Tombstone docs without rebuilding: flip live bits host+device
        (the reference removes postings in place; we mask and compact later)."""
        for s in seq_ids:
            if 0 <= s < self.N:
                self.seg.live[s] = False
        self._live = jax.device_put(jnp.asarray(self.seg.live))
        self._live_count = int(self.seg.live.sum())
        self._vec_masks = {}

    # ------------------------------------------------------------------
    def exact_term_rows(self, token: str, field_names: list[str]) -> np.ndarray:
        """Posting-row ids (field-major) for an exact token; -1 if absent."""
        tid = self.seg.term_to_id.get(token, -1)
        rows = np.full(len(field_names), -1, dtype=np.int64)
        if tid >= 0:
            for i, fn in enumerate(field_names):
                fi = self.field_idx.get(fn)
                if fi is not None:
                    rows[i] = fi * self.T + tid
        return rows

    def _row_bounds(self, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        po = self.seg.post_offsets
        starts = np.where(rows >= 0, po[np.clip(rows, 0, len(po) - 2)], 0)
        ends = np.where(rows >= 0, po[np.clip(rows, 0, len(po) - 2) + 1], 0)
        return starts.astype(np.int32), ends.astype(np.int32)

    # ------------------------------------------------------------------
    def prepare_keyword_dispatch(
            self, token_candidates: list[tuple[np.ndarray, np.ndarray]],
            field_names: list[str], field_weights: list[int],
            k: int = TOPK,
            phrase_pairs: tuple = (),
            exclude_flags: tuple = (),
            field_num_typos: list[int] | None = None,
            field_prefixes: list[bool] | None = None,
            force: dict | None = None,
            dense_ok: bool = True) -> dict | None:
        """Host-side O(query) planning: candidate row bounds, driver stream,
        chunk descriptors, static shape selection, packed query buffer.

        Returns None when the query is provably empty — UNLESS `force` pins
        the static shapes (the sharded engine forces identical statics on
        every shard so all shards run one SPMD program and participate in
        the collectives even when locally empty).

        token_candidates: per query token, (term_ids (C_i,), costs (C_i,)).
        field_num_typos: per-field typo budgets (num_typos=2,0 maps onto
        query_by fields, collection.h:65-341) — candidate rows whose typo
        cost exceeds a field's budget are masked out for that field."""
        force = force or {}
        Fq = len(field_names)
        Qn = min(len(token_candidates), MAX_QUERY_TOKENS)
        # normalize entries to (ids, costs, kinds); kind 1 = prefix-derived
        token_candidates = [
            (tc[0], tc[1], tc[2] if len(tc) > 2 else
             np.zeros(len(tc[0]), np.int64))
            for tc in token_candidates[:Qn]]
        if Qn == 0 or Fq == 0:
            return None

        Q = max(Qn, 1)
        # C tops out at 256: the default expansion is max_candidates=4 and
        # typo/prefix posting budgets keep real queries far below 64; only
        # an explicit max_candidates/exhaustive_search request reaches the
        # 256 shape (collection.h:928 allows up to 10000 — candidates beyond
        # 256 are frequency-ranked away in candidates.prefix_candidates)
        C = force.get("C") or bucket4(
            max((len(tc[0]) for tc in token_candidates), default=1),
            lo=1, hi=256)

        cand_rows = np.full((Q, Fq, C), -1, dtype=np.int64)
        cand_costs = np.full((Q, C), 255, dtype=np.int32)
        cand_kinds = np.zeros((Q, C), dtype=np.int32)
        token_valid = np.zeros(Q, dtype=bool)
        fis = [self.field_idx.get(fn, -1) for fn in field_names]
        for qi, (tids, costs, kinds) in enumerate(token_candidates):
            token_valid[qi] = True
            for ci, (tid, cost) in enumerate(zip(tids[:C], costs[:C])):
                if tid < 0:
                    continue
                cand_costs[qi, ci] = cost
                cand_kinds[qi, ci] = int(kinds[ci]) if ci < len(kinds) else 0
                for fslot, fi in enumerate(fis):
                    if fi >= 0:
                        cand_rows[qi, fslot, ci] = fi * self.T + tid

        if field_num_typos is not None and any(
                b < 255 for b in field_num_typos):
            for fslot in range(Fq):
                budget = field_num_typos[fslot] if fslot < len(field_num_typos) \
                    else field_num_typos[-1]
                for qi in range(Q):
                    for ci in range(C):
                        # cand_costs hold next_suggestion2's actual_cost
                        # (2*typos + prefix bit); the per-field num_typos
                        # budget gates TYPO count only
                        if cand_costs[qi, ci] < 255 and \
                                (cand_costs[qi, ci] >> 1) > budget:
                            cand_rows[qi, fslot, ci] = -1
        if field_prefixes is not None and not all(field_prefixes):
            # prefix=true,false maps onto query_by fields: prefix-derived
            # candidates only match in prefix-enabled fields
            for fslot in range(Fq):
                pfx = field_prefixes[fslot] if fslot < len(field_prefixes) \
                    else field_prefixes[-1]
                if pfx:
                    continue
                for qi in range(Q):
                    for ci in range(C):
                        if cand_kinds[qi, ci] == 1:
                            cand_rows[qi, fslot, ci] = -1

        cand_starts, cand_ends = self._row_bounds(cand_rows.reshape(-1))
        cand_starts = cand_starts.reshape(Q, Fq, C)
        cand_ends = cand_ends.reshape(Q, Fq, C)
        row_lens = (cand_ends - cand_starts).astype(np.int64)

        # driver token: valid INCLUDE token with smallest total postings
        # (reference picks the lowest-frequency token to lead the intersect)
        totals = row_lens.sum(axis=(1, 2))
        totals[~token_valid[:Q]] = np.iinfo(np.int64).max
        for qi, ex in enumerate(exclude_flags[:Q]):
            if ex:
                totals[qi] = np.iinfo(np.int64).max
        drv = int(np.argmin(totals))
        if totals[drv] == 0 and not force:
            # driver token matches nothing anywhere -> no results (AND semantics)
            return None

        # the driver token's (field, candidate) rows form ONE logical stream:
        # the kernel remaps lane -> (row, offset) via cumulative lengths, so
        # the sequential scan-chunk count is ceil(total/S) regardless of C.
        drv_total = int(row_lens[drv].sum())
        drows_start = cand_starts[drv].reshape(-1).astype(np.int64)  # (F*C,)
        drows_cum = np.zeros(Fq * C + 1, dtype=np.int64)
        np.cumsum(row_lens[drv].reshape(-1), out=drows_cum[1:])
        # driver chunk size S: few chunks (each pays a sequential top-k
        # merge + position gather), power-of-4 tiers bound recompiles.
        if force.get("S"):
            S = force["S"]
        else:
            # the match pass is cheap per lane (plane gathers + cumsum),
            # so size its chunk for <= ~4 sequential trips
            # two tiers only (compile diversity costs ~40s/shape through
            # the tunnel): small drivers in ONE 1024-lane chunk, larger in
            # 16384-lane chunks (the cost model sends big drivers to dense2)
            S = 1024 if drv_total <= 4096 else 16384
        n_chunks = (drv_total + S - 1) // S
        # scoring pass runs over ONLY the matched docs in (SB,) chunks; the
        # compacted buffer CAP must hold every possible survivor
        SB = force.get("SB") or min(S, 8192)
        CAP = force.get("CAP") or bucket4(max(drv_total, 1), lo=256,
                                          hi=1 << 25)

        # strategy by PREDICTED DEVICE MS, calibrated on-chip (v5e via axon,
        # 2.2M docs, round-4 profq cmd_06/cmd_09): the probe kernel's random
        # plane gathers stream at ~7M lanes/s — NOT the 60-90M/s the round-3
        # model assumed, which misrouted ~75% of queries to probe (measured
        # 1-token probe 1568ms vs dense2 6.3ms; typo-2tok 1036ms vs 21ms).
        #   probe   — drv_total * (Q*F*C) * iters random gathers at ~7M/s;
        #             wins only for genuinely rare drivers.
        #   dense2  — whole-corpus fused scan: ~2.85ms per Mdoc per token
        #             plane + ~2.0ms/Mdoc per extra token of proximity
        #             (fit: 1/2/3-token = 6.26/16.93/26.95ms at 2.2M), plus
        #             mid-row scatters at ~25M postings/s.
        #   scatter — driver-stream kernel; kept for phrase queries (exact
        #             CSR adjacency), multi-value/high-cardinality facets,
        #             and the sharded force path.
        head_map = self.names.get("head_map", {})
        # runtime plane cache routes every eligible dense2 query through
        # the all-head kernel signature; sharded force paths, phrase
        # queries and the (opt-in) dense2 batcher keep the scatter path
        cache_route = (self._plane_cache_on and not force
                       and not DENSE2_BATCH and dense_ok
                       and not phrase_pairs)
        total_postings = int(row_lens.sum())
        # postings covered by the head planes / runtime plane cache
        head_post = 0
        uncached_post = 0
        n_uncached_rows = 0
        for q in range(Q):
            for f in range(Fq):
                for c in range(C):
                    rl = int(row_lens[q, f, c])
                    if rl <= 0:
                        continue
                    rid = int(cand_rows[q, f, c])
                    if rid in head_map or \
                            (cache_route and rid in self._plane_lru):
                        head_post += rl
                    elif cache_route:
                        uncached_post += rl
                        n_uncached_rows += 1
        q_valid = int(token_valid.sum()) or 1
        probe_ms = drv_total * (Q * Fq * C) * self._iters / 7e3
        if cache_route:
            # all-head scan plus one-time densification of uncached rows:
            # each miss costs a plane memset + sorted-unique scatter
            # (~2.5 ms fixed + ~150M postings/s) AND pressures the cache,
            # so rare-token queries (cheap probes) must stay on the probe
            # path rather than churn slots they will never reuse
            dense_ms = (self.N / 1e6) * (0.5 + 0.25 * q_valid) \
                + n_uncached_rows * 2.5 + uncached_post / 150e3
        else:
            dense_ms = (self.N / 1e6) * (2.85 * q_valid
                                         + 2.0 * max(q_valid - 1, 0)) \
                + (total_postings - head_post) / 25e3
        use_probe = probe_ms < dense_ms
        plane_bytes = Q * Fq * self.N * 8
        if plane_bytes > 900_000_000 and not cache_route:
            use_probe = True  # plane memory guard (many tokens x fields)
        if "use_probe" in force:
            use_probe = force["use_probe"]
        mode = "probe" if use_probe else \
            ("scatter" if (phrase_pairs or force or not dense_ok)
             else "dense2")
        if force.get("mode"):
            mode = force["mode"]   # sharded engine pins one SPMD mode
        forced_mode = getattr(self, "_force_mode", None)  # tests/benchmarks
        if forced_mode and not force and not phrase_pairs:
            mode = forced_mode

        # scatter chunks: EVERY (token, field, cand) row in fixed (SS,)
        # slices (min-scatter makes write order irrelevant)
        SS = 2048
        # big-row slice width (sequential DMA path), clamped so
        # dynamic_slice stays inside small segments' posting arrays
        import math
        _posts = getattr(self.seg, "post_doc_ids", None)
        _plen = getattr(self.seg, "post_len", None) or \
            (len(_posts) if _posts is not None else (1 << 31))  # shard views
        SSB = min(131072, 1 << int(math.log2(max(_plen, 1))))
        BIG_ROW_MIN = 16384   # rows at least this long use big descriptors
        HPF_MAX = 8           # head-plane slots per (token, field)
        s_starts: list[int] = []
        s_lens: list[int] = []
        s_qf: list[int] = []
        s_c: list[int] = []
        s_rel0: list[int] = []   # scatter mode: chunk offset within its row
        # (packs into the plane value's low 25 bits; the kernel reconstructs
        # the absolute posting index as cand_starts[q,f,c] + rel)
        b_starts: list[int] = []
        b_lens: list[int] = []
        b_qf: list[int] = []
        b_c: list[int] = []
        head_slots: dict[int, list[tuple[int, int]]] = {}  # qf -> [(h, cost)]
        # heavy-posting slice descriptors per (q, f, c): the kernel streams
        # these precomputed CSR slices instead of selecting heavy docs with
        # whole-N passes (artifacts.build_heavy_lists). hv_flag marks rows
        # on the head-plane path (meta64 heaviness tier).
        hv_starts = np.zeros(Q * Fq * C, dtype=np.int64)
        hv_lens = np.zeros(Q * Fq * C, dtype=np.int64)
        hv_flag = np.zeros(Q * Fq * C, dtype=np.int64)
        hoffs = getattr(self.seg, "heavy_offsets", None)

        def add_hv(q, f, c, row, is_head):
            if hoffs is None:
                return
            i = (q * Fq + f) * C + c
            hv_starts[i] = hoffs[row]
            hv_lens[i] = hoffs[row + 1] - hoffs[row]
            hv_flag[i] = 1 if is_head else 0

        pinned_slots: list[int] = []
        qplane_pos: dict[int, int] = {}   # absolute cache slot -> position
        use_cache = cache_route and mode == "dense2"
        if use_cache:
            self._plane_lock.acquire()
        try:
            if mode in ("scatter", "dense2") and drv_total > 0:
                for c in range(C):
                    for q in range(Q):
                        for f in range(Fq):
                            s0, e0 = int(cand_starts[q, f, c]), \
                                int(cand_ends[q, f, c])
                            if e0 <= s0 or cand_costs[q, c] >= 255:
                                continue
                            if mode == "dense2":
                                # excluded (-token) rows never drive
                                # heaviness (inc_member masks them)
                                excl_q = (q < len(exclude_flags)
                                          and bool(exclude_flags[q]))
                                rid = int(cand_rows[q, f, c])
                                h = head_map.get(rid)
                                # cap gathered rows per query: the plane
                                # gather's AOT footprint grows with n_pad
                                # (each group arg pins 2*g*NP bytes of HBM
                                # accounting) — a 32-wide typo gather
                                # compile OOMed a 16 GB chip. Beyond the
                                # cap, rows spill to the scatter path.
                                if h is None and use_cache and \
                                        len(qplane_pos) < QPLANE_MAX:
                                    # densify + cache the row; the slot is
                                    # pinned (self-eviction guard) until
                                    # the query's dispatch. hrow carries
                                    # H + per-query POSITION — the kernel
                                    # reads the private gathered buffer,
                                    # not the groups
                                    aslot = self._plane_slot_for(rid, s0, e0)
                                    if aslot is not None:
                                        self._plane_pin([aslot])
                                        pinned_slots.append(aslot)
                                        pos = qplane_pos.setdefault(
                                            aslot, len(qplane_pos))
                                        h = self._plane_H + pos
                                slots = head_slots.setdefault(q * Fq + f, [])
                                if h is not None and len(slots) < HPF_MAX:
                                    slots.append((h, int(cand_costs[q, c])))
                                    if not excl_q:
                                        add_hv(q, f, c,
                                               int(cand_rows[q, f, c]), True)
                                    continue
                                if not excl_q:
                                    add_hv(q, f, c, int(cand_rows[q, f, c]),
                                           False)
                                if e0 - s0 >= BIG_ROW_MIN:
                                    # long rows stream as contiguous slices
                                    for off in range(s0, e0, SSB):
                                        b_starts.append(off)
                                        b_lens.append(min(SSB, e0 - off))
                                        b_qf.append(q * Fq + f)
                                        b_c.append(c)
                                    continue
                            for off in range(s0, e0, SS):
                                s_starts.append(off)
                                s_lens.append(min(SS, e0 - off))
                                s_qf.append(q * Fq + f)
                                s_c.append(c)
                                s_rel0.append(off - s0)
        finally:
            if use_cache:
                self._plane_lock.release()
        n_sc = len(s_starts)
        n_big = len(b_starts)
        if mode == "dense2":
            # descriptor pads are FREE at run time (trip counts are dynamic:
            # ceil(n_sc/G) and n_big), so use ONE wide tier per buffer —
            # each extra (SCB, SCBB) combination is another ~40s compile.
            # EXCEPT all-head queries (n_sc == n_big == 0, every candidate
            # row pre-densified in the head planes): the (0, 0) signature
            # drops the scatter plane entirely — measured on the axon v5e,
            # the plane memset + merge-convert costs ~19 ms per Q=2 query
            # at 2.2M docs even when the scatter loops run ZERO iterations,
            # vs 3.6 ms without the plane. One extra compile signature per
            # shape buys a ~6x speedup on the most common (all-frequent-
            # token) queries.
            if n_sc == 0 and n_big == 0:
                SCB, SCBB = 0, 0
            else:
                SCB = bucket4(max(n_sc, 1), lo=1024, hi=1 << 22)
                SCBB = bucket4(max(n_big, 1), lo=64, hi=1 << 16)
            HPF = max((len(v) for v in head_slots.values()), default=0)
            HPF = 1 << (HPF - 1).bit_length() if HPF > 1 else HPF
            # head-plane slot width: collapsing 0 -> 1 costs one masked
            # plane pass for the rare no-head query; a distinct signature
            # costs a whole compile
            HPF = max(HPF, 1)
        else:
            SCB = bucket4(max(n_sc, 1), lo=64, hi=1 << 22)
            SCBB = bucket4(max(n_big, 1), lo=8, hi=1 << 16)
            HPF = 0
        # the sharded engine pins identical statics on every shard so one
        # SPMD program serves the mesh
        if force.get("SCB") is not None:
            SCB = force["SCB"]
        if force.get("SCBB") is not None:
            SCBB = force["SCBB"]
        if force.get("HPF") is not None:
            HPF = force["HPF"]
            # drop head slots past the forced width (stay within hrow pad)
            head_slots = {qf: v[:HPF] for qf, v in head_slots.items()}
        spad = SCB - n_sc
        sc_starts = np.asarray(s_starts + [0] * spad, dtype=np.int64)
        sc_lens = np.asarray(s_lens + [0] * spad, dtype=np.int64)
        sc_qf = np.asarray(s_qf + [0] * spad, dtype=np.int64)
        sc_c = np.asarray(s_c + [0] * spad, dtype=np.int64)
        sc_rel0 = np.asarray(s_rel0 + [0] * spad, dtype=np.int64)
        K = force.get("K") or bucket(k, lo=16, hi=1 << 14)

        weights = np.zeros(Fq, dtype=np.int64)
        weights[:len(field_weights)] = field_weights[:Fq]

        if mode == "probe":
            qbuf = kernels.pack_probe_buf(drows_start, drows_cum,
                                          n_chunks, drv,
                                          cand_starts.astype(np.int64),
                                          cand_ends.astype(np.int64),
                                          cand_costs.astype(np.int64),
                                          token_valid, weights)
        elif mode == "dense2":
            bpad = SCBB - n_big
            hrow = np.full(Q * Fq * HPF, -1, dtype=np.int64)
            hcost = np.zeros(Q * Fq * HPF, dtype=np.int64)
            for qf, slots in head_slots.items():
                for si, (h, cost) in enumerate(slots):
                    hrow[qf * HPF + si] = h
                    hcost[qf * HPF + si] = min(cost, 63)
            qbuf = kernels.pack_dense2_buf(
                sc_starts, sc_lens, sc_qf, sc_c, n_sc,
                np.asarray(b_starts + [0] * bpad, dtype=np.int64),
                np.asarray(b_lens + [0] * bpad, dtype=np.int64),
                np.asarray(b_qf + [0] * bpad, dtype=np.int64),
                np.asarray(b_c + [0] * bpad, dtype=np.int64), n_big,
                hrow, hcost,
                cand_starts.astype(np.int64),
                cand_ends.astype(np.int64),
                cand_costs.astype(np.int64),
                token_valid, weights,
                hv_starts, hv_lens, hv_flag)
        else:
            qbuf = kernels.pack_query_buf(sc_starts, sc_lens, sc_qf, sc_c,
                                          sc_rel0, n_sc,
                                          drows_start, drows_cum,
                                          n_chunks, drv,
                                          cand_starts.astype(np.int64),
                                          cand_costs.astype(np.int64),
                                          token_valid, weights)
        total_hv = int(hv_lens.sum())
        CAP_H = force.get("CAP_H") or bucket4(max(total_hv, 1), lo=1024,
                                              hi=1 << 22)
        # matched-lane compaction bucket: every doc in the matched set m
        # carries EVERY included token, so |m| <= min over included tokens
        # of that token's total candidate postings (head rows included —
        # row_lens covers them). Proximity scoring then runs on CAP_M
        # compacted lanes instead of N (kernels.dense2_kernel_body).
        # OPT-IN (TS_DENSE2_COMPACT=1): measured on the axon v5e, the
        # compacted gather (va/vb at ~1M random indices for CAP_M=256K)
        # costs more than the whole-N proximity it saves — this rig's
        # gather throughput is ~50M/s. Kept for gather-fast targets.
        import os as _os
        CAP_M = 0
        if mode == "dense2" and Q > 1 and \
                _os.environ.get("TS_DENSE2_COMPACT") == "1":
            bound = None
            for q in range(Q):
                if not token_valid[q]:
                    continue
                if q < len(exclude_flags) and exclude_flags[q]:
                    continue
                bq = 0
                for f in range(Fq):
                    for c in range(C):
                        if cand_costs[q, c] < 255:
                            bq += int(row_lens[q, f, c])
                bound = bq if bound is None else min(bound, bq)
            if bound is not None and 0 < bound < self.N:
                CAP_M = bucket4(max(bound, 1), lo=1 << 14, hi=1 << 22)
                if CAP_M >= self.N:
                    CAP_M = 0
        if force.get("CAP_M") is not None:
            CAP_M = force["CAP_M"]
        if getattr(self, "_force_capm", None) is not None:
            CAP_M = self._force_capm     # tests/benchmarks A/B the paths
        prep = {"Q": Q, "Fq": Fq, "C": C, "S": S, "SS": SS, "SCB": SCB,
                "CAP": CAP, "SB": SB, "mode": mode, "SCBB": SCBB,
                "SSB": SSB, "n_big": n_big, "HPF": HPF, "CAP_H": CAP_H,
                "K": K, "use_probe": use_probe, "qbuf": qbuf,
                "n_sc": n_sc, "n_chunks": n_chunks, "drv_total": drv_total,
                "fis": tuple(fis), "CAP_M": CAP_M,
                "pinned_slots": pinned_slots,
                "qplane_slots": list(qplane_pos)}
        if mode == "dense2":
            prep["hrow"] = hrow if HPF else np.zeros(0, np.int64)
            prep["hcost"] = hcost if HPF else np.zeros(0, np.int64)
            prep["token_valid"] = token_valid
            # host-rescore protocol inputs (heavy docs come back as ids;
            # the engine rescores them exactly on the host)
            prep["cand_starts"] = cand_starts
            prep["cand_ends"] = cand_ends
            prep["cand_costs"] = cand_costs
            prep["weights"] = weights
            prep["exclude_flags"] = tuple(exclude_flags)
        return prep

    def _host_rescore_heavy(self, prep, doc_ids, slot_kinds, slot_signs,
                            cols, match_type, ptp, prioritize_exact,
                            prioritize_num_fields, exclude_flags,
                            sort_slots=()):
        """Exact rescore of heavy docs on the HOST — the other half of the
        dense2 kernel's heavy-out protocol. Heavy docs (meta64 can't hold
        all their positions) are ~0.04% of postings; walking their CSR
        positions here costs microseconds where the in-kernel walk cost
        ~9.5 ms of device time per query (two ~21-step sequential wide
        binary-search chains). Scoring reuses the SAME ops.match functions
        as the device kernels (bit-identical packing), run on the CPU
        backend. Returns (k0, k1, k2) int64 arrays aligned with doc_ids.
        """
        seg = self.seg
        d = np.asarray(doc_ids, np.int64)
        H = len(d)
        cs, ce = prep["cand_starts"], prep["cand_ends"]
        cc = prep["cand_costs"]
        Q, Fq, C = cs.shape
        P = MAX_POS_PER_POSTING
        post = seg.post_doc_ids
        fnd = np.zeros((Q, Fq, C, H), bool)
        pidx = np.zeros((Q, Fq, C, H), np.int64)
        for q in range(Q):
            for f in range(Fq):
                for c in range(C):
                    s0, e0 = int(cs[q, f, c]), int(ce[q, f, c])
                    if e0 <= s0 or cc[q, c] >= 255:
                        continue
                    ix = s0 + np.searchsorted(post[s0:e0], d)
                    ok = ix < e0
                    ok &= post[np.minimum(ix, len(post) - 1)] == d
                    pidx[q, f, c] = ix
                    fnd[q, f, c] = ok
        excl = np.zeros((Q, 1), bool)
        for qi, ex in enumerate(exclude_flags[:Q]):
            excl[qi, 0] = bool(ex)
        tvalid = np.asarray(prep["token_valid"][:Q], bool)
        tv = tvalid[:, None] & ~excl
        tok_field = fnd.any(axis=2)                    # (Q, Fq, H)
        tok_any = tok_field.any(axis=1)                # (Q, H)
        tok_field = tok_field & ~excl[:, :, None]
        cost_qc = np.where(fnd, cc[:, None, :, None], 255)
        mc = cost_qc.min(axis=(1, 2))                  # (Q, H)
        tc = np.where(tok_any & tv, mc, 0).sum(axis=0)
        first_c = fnd.argmax(axis=2)
        sp = np.take_along_axis(pidx, first_c[:, :, None, :],
                                axis=2)[:, :, 0]       # (Q, Fq, H)
        query_len = (tok_any & tv).sum(axis=0)

        from typesense_tpu.index.artifacts import MAX_POS, POS_BITS
        from typesense_tpu.ops.match import (
            np_match_components, np_pack_aggregated_score,
            np_pack_field_score)
        pos_offsets, positions = seg.pos_offsets, seg.positions
        post_flags = seg.post_flags
        fis = prep["fis"]
        ftc = seg.field_token_counts[
            np.clip(d, 0, self.N - 1)][:, [max(fi, 0) for fi in fis]]
        weights = prep["weights"]
        single_token = Q == 1
        best_score = np.zeros(H, np.int64)
        best_weight = np.zeros(H, np.int64)
        for f in range(Fq):
            mf = tok_field[:, f]                   # (Q, H)
            gp = np.clip(sp[:, f], 0, len(pos_offsets) - 2)
            base = pos_offsets[gp]
            cnt = pos_offsets[gp + 1] - base
            cnt = np.where(mf, cnt, 0)
            moff = np.zeros(H, np.int32)
            if single_token:
                wp = np.ones(H, np.int32)
                dist = np.zeros(H, np.int32)
                banchor = None
                if ptp:
                    lidx = np.clip(base + cnt - 1, 0, len(positions) - 1)
                    moff = np.where(
                        mf, np.minimum(positions[lidx], 255),
                        255).min(axis=0).astype(np.int32)
            else:
                pidx2 = base[:, :, None] + np.arange(P)
                pvalid = np.arange(P)[None, None, :] < cnt[:, :, None]
                pos = np.where(
                    pvalid,
                    positions[np.clip(pidx2, 0, len(positions) - 1)], 0)
                pos = pos.transpose(1, 0, 2)       # (H, Q, P)
                pv = pvalid.transpose(1, 0, 2)
                wp, dist, moff_m, banchor = np_match_components(
                    pos.astype(np.int32), pv, mf.T)
                if ptp:
                    moff = moff_m
            uw = mf.sum(axis=0).astype(np.int32)
            single = uw <= 1
            wp = np.where(single, 1, wp)
            dist = np.where(single, 0, dist)
            flags = post_flags[np.clip(sp[:, f], 0, len(post_flags) - 1)]
            last_q = ((flags & 1) > 0) & mf
            has_last = last_q.any(axis=0)
            total_off = np.where(mf, cnt, 0).sum(axis=0)
            ftc_f = ftc[:, f]
            if prioritize_exact:
                exact_multi = (has_last & (ftc_f == uw) &
                               (((total_off == uw) & (dist == uw - 1)) |
                                (dist < uw - 1)))
                if not single_token:
                    belem = (banchor >> POS_BITS)[:, None, None]
                    occ_e = pv & ((pos >> POS_BITS) == belem) & \
                        mf.T[:, :, None]
                    tok_e = occ_e.any(axis=2)
                    n_e = tok_e.sum(axis=1).astype(np.int32)
                    total_e = occ_e.sum(axis=(1, 2)).astype(np.int32)
                    off_e = np.where(occ_e, pos & MAX_POS, -1)
                    maxoff_e = off_e.max(axis=2).max(axis=1)
                    minoff_e = np.where(occ_e, pos & MAX_POS,
                                        1 << 30).min(axis=2).min(axis=1)
                    mo_q = off_e.max(axis=2)
                    flag_ok = (tok_e & last_q.T &
                               (mo_q == (n_e - 1)[:, None])).any(axis=1)
                    exact_elem = ((minoff_e == 0) & (total_e == n_e) &
                                  (maxoff_e == n_e - 1) & flag_ok &
                                  (n_e == wp) & (dist == n_e - 1))
                    exact_multi = exact_multi | exact_elem
                exact_single = (has_last & (ftc_f == 1) & (tc == 0) &
                                (tv.sum() == 1))
                exact = np.where(single, exact_single,
                                 exact_multi).astype(np.int32)
            else:
                exact = np.zeros(H, np.int32)
            off_score = (255 - np.clip(moff, 0, 255)) if ptp else \
                np.zeros(H, np.int32)
            fs = np_pack_field_score(wp, uw, tc.astype(np.int32), dist,
                                     exact, off_score,
                                     np.ones(H, np.int32))
            fs = np.where(mf.any(axis=0), fs, 0)
            w64 = np.int64(int(weights[f]))
            if match_type == 1:
                better = (fs > 0) & (w64 > best_weight)
                best_score = np.where(better, fs, best_score)
                best_weight = np.where(better, w64, best_weight)
            elif match_type == 2:
                best_score = best_score + w64 * fs
            else:
                better = fs > best_score
                best_weight = np.where(better, w64, best_weight)
                best_score = np.maximum(best_score, fs)
        if prioritize_num_fields:
            nmf = tok_field.any(axis=0).sum(axis=0).astype(np.int32)
        else:
            nmf = np.zeros(H, np.int32)
        ql = np.where(best_score > 0, np.minimum(query_len, 15), 0)
        text_match = np_pack_aggregated_score(ql, best_score, best_weight,
                                              nmf, match_type)

        def slot_key(i):
            kind, sign = slot_kinds[i], slot_signs[i]
            if kind == kernels.SLOT_TEXT:
                return text_match
            if kind == kernels.SLOT_COLUMN:
                s = sort_slots[i] if i < len(sort_slots) else None
                host = None
                if s is not None and s.custom_col is None and s.column:
                    host = self._sort_cols_host.get(s.column)
                if host is not None:
                    vals = host[np.clip(d, 0, self.N - 1)]
                else:
                    # custom device columns (geo/_eval/_rand) fall back to
                    # a device gather + readback
                    vals = np.asarray(jax.device_get(
                        cols[i][jnp.asarray(np.clip(d, 0, self.N - 1))]))
                return np.clip(vals, -(2**61), 2**61) * sign
            if kind == kernels.SLOT_SEQ_ID:
                return d * sign
            return np.zeros(H, np.int64)

        return slot_key(0), slot_key(1), slot_key(2)

    def keyword_search(self, *args, **kwargs) -> RawResult:
        """Single-device keyword search: plan on host, dispatch ONE kernel.

        With the runtime plane cache active, planning + dispatch run under
        the plane lock: a cache insert DONATES dev.head_a/head_b (the old
        buffers die), so no thread may dispatch with refs captured across
        another thread's insert. The lock is dropped right after the async
        dispatch — never held across the device sync. Slots a query plans
        with stay pinned (evict-proof) until its last re-dispatch."""
        use_lock = self._plane_cache_on and not DENSE2_BATCH
        pins: list[int] = []
        released = [not use_lock]
        if use_lock:
            self._plane_lock.acquire()

        def release():
            if not released[0]:
                released[0] = True
                self._plane_lock.release()
        try:
            return self._keyword_search_impl(
                *args, _release=release, _pins_out=pins, **kwargs)
        finally:
            release()
            if pins:
                self._plane_unpin(pins)

    def _keyword_search_impl(self, token_candidates: list[tuple[np.ndarray, np.ndarray]],
                       field_names: list[str], field_weights: list[int],
                       sort_slots: list[SortSpec], filter_mask=None,
                       facet_fields: list[str] | None = None,
                       k: int = TOPK, prioritize_exact: bool = True,
                       prioritize_num_fields: bool = True,
                       phrase_pairs: tuple = (),
                       exclude_flags: tuple = (),
                       field_num_typos: list[int] | None = None,
                       field_prefixes: list[bool] | None = None,
                       match_type: int = 0,
                       prioritize_token_position: bool = False,
                       _release=None, _pins_out=None) -> RawResult:
        facet_fields = [f for f in (facet_fields or []) if f in self._facet_idx]
        # dense2 counts facets by fused one-hot over single-value columns;
        # multi-value or high-cardinality facet fields need the CSR
        # scatter-add path
        dense_ok = all(
            self.dev.facet_single[self._facet_idx[f]] is not None
            and len(self.seg.facet_values[f]) <= 128
            for f in facet_fields)
        prep = self.prepare_keyword_dispatch(
            token_candidates, field_names, field_weights, k=k,
            phrase_pairs=phrase_pairs, exclude_flags=exclude_flags,
            field_num_typos=field_num_typos, field_prefixes=field_prefixes,
            dense_ok=dense_ok)
        if prep is None:
            return RawResult(np.empty(0, np.int32), np.empty((0, 3), np.int64),
                             0, out_of=self._live_count)
        if _pins_out is not None:
            _pins_out.extend(prep.get("pinned_slots", ()))
        Q, Fq, C, S, SS, SCB, K = (prep["Q"], prep["Fq"], prep["C"], prep["S"],
                                   prep["SS"], prep["SCB"], prep["K"])

        slot_kinds, slot_signs, cols = self._prepare_slots(sort_slots)
        f_offs = tuple(self.dev.facet_offsets[self._facet_idx[f]] for f in facet_fields)
        f_vals = tuple(self.dev.facet_value_ids[self._facet_idx[f]] for f in facet_fields)
        f_caps = tuple(self._facet_caps[f] for f in facet_fields)
        f_sizes = tuple(len(self.seg.facet_values[f]) for f in facet_fields)
        fmask = filter_mask if filter_mask is not None else self._live

        # kernels index token counts by query-field POSITION — gather the
        # queried columns (cached per query_by combination) so slot f reads
        # field_names[f]'s counts, not segment column f
        ftc_dev = self._ftc_for_fields(prep["fis"])

        mode = prep.get("mode", "probe" if prep["use_probe"] else "scatter")
        if mode != "dense2" and _release is not None:
            _release()   # probe/scatter kernels never read the head planes
        if mode == "probe":
            kern = kernels.build_probe_kernel(
                Q, Fq, C, S, K, MAX_POS_PER_POSTING, self._iters,
                tuple(slot_kinds), tuple(slot_signs), prioritize_exact,
                prioritize_num_fields, len(facet_fields), f_caps, f_sizes,
                tuple(phrase_pairs), tuple(exclude_flags), match_type,
                prioritize_token_position)
        elif mode == "dense2":
            pack2 = self._pack2_ok(sort_slots, slot_kinds, slot_signs)
            f_single = tuple(self.dev.facet_single[self._facet_idx[f]]
                             for f in facet_fields)
            # CAP_H is pinned: the cumsum-rank heavy rescore ignores it
            # (kernels.dense2_kernel_body uses HC only), so letting the
            # per-query heavy-length bucket into the statics forked up to
            # 7 spurious compile signatures per Q (each ~40-90s through
            # the tunnel) for byte-identical programs.
            # per-field array-ness lets the kernel skip the per-element
            # verbatim pass for single-value fields (where whole-field
            # coverage already implies it)
            fia = tuple(bool(self.fields[fn].is_array)
                        if fn in self.fields else True
                        for fn in field_names)
            static = (Q, Fq, C, prep["HPF"], SCB, prep["SCBB"], prep["SSB"],
                      K, 1024, MAX_POS_PER_POSTING, self._iters,
                      tuple(slot_kinds), tuple(slot_signs), prioritize_exact,
                      prioritize_num_fields, len(facet_fields), f_sizes,
                      tuple(exclude_flags), self.N, pack2, match_type,
                      prioritize_token_position, 1024,
                      prep["CAP_M"], fia, True)
            kern = kernels.build_dense2_kernel(*static)
            pre = (self.dev.post_doc_ids, self.dev.post_meta,
                   self.dev.pos_offsets, self.dev.positions, ftc_dev,
                   self.dev.head_a, self.dev.head_b, fmask)
            post = (cols[0], cols[1], cols[2], f_single)
            heavy = self.dev.heavy_ids
            # per-query plane gather: copy the runtime-cache rows this
            # query needs into a private (n_pad, NP) pair. Groups resolve
            # HOST-side (we know each slot's group), the pad bucket keeps
            # compile shapes few, and the private copy makes the dispatch
            # immune to later evictions (paging re-uses it as-is)
            c_a = c_b = None
            qslots = prep.get("qplane_slots") or []
            if qslots:
                from typesense_tpu.index.artifacts import make_plane_gather
                n_pad = 1 << (len(qslots) - 1).bit_length() \
                    if len(qslots) > 1 else 1
                g = self._plane_g
                gis = [(s - self._plane_H) // g for s in qslots]
                ris = [(s - self._plane_H) % g for s in qslots]
                while len(gis) < n_pad:
                    gis.append(gis[0])
                    ris.append(ris[0])
                gat = make_plane_gather(self._plane_NPW, n_pad)
                c_a, c_b = gat(
                    jnp.asarray(np.asarray(ris, np.int32)),
                    *[self._cache_groups_a[i] for i in gis],
                    *[self._cache_groups_b[i] for i in gis])

            def solo_call(qb):
                return kern(*pre, jnp.asarray(qb), *post, heavy_ids=heavy,
                            cache_a=c_a, cache_b=c_b)

            def build_batched(B):
                bk = kernels.build_dense2_batched_kernel(*static)
                warm = jnp.stack([jnp.asarray(prep["qbuf"])] * B)
                jax.block_until_ready(
                    bk(*pre, warm, *post, heavy_ids=heavy,
                       cache_a=c_a, cache_b=c_b))
                return bk

            def batched_call(fn, qbufs):
                stacked = jnp.stack([jnp.asarray(q) for q in qbufs])
                out = fn(*pre, stacked, *post, heavy_ids=heavy,
                         cache_a=c_a, cache_b=c_b)
                return [out[i] for i in range(len(qbufs))]

            _rep = int(_os.environ.get("TS_PROF_REPEAT", "0"))
            if _rep:
                import time as _t
                jax.block_until_ready(solo_call(prep["qbuf"]))
                t0 = _t.perf_counter()
                for _ in range(_rep):
                    buf = solo_call(prep["qbuf"])
                jax.block_until_ready(buf)
                import typesense_tpu.search.engine as _E
                _E.LAST_DEV_MS = (_t.perf_counter() - t0) * 1000 / _rep
            if DENSE2_BATCH:
                # same-signature concurrent queries coalesce into one
                # batched dispatch; arrays ride by identity (index-cached
                # objects), so the key only needs the static tuple + ids
                bkey = static + tuple(id(a) for a in pre) + \
                    tuple(id(a) for a in post[:3]) + \
                    tuple(id(a) for a in f_single) + (id(heavy),)
                buf = QUERY_BATCHER.run(bkey, prep["qbuf"], solo_call,
                                        build_batched, batched_call)
            else:
                buf = solo_call(prep["qbuf"])
            if _release is not None:
                _release()   # dispatched: drop the lock before the sync
            HKT = min(max(K, 256), self.N)
            rid, r0, r1, r2, found, f_acc, h_ids, nh = \
                kernels.unpack_result(buf, K, f_sizes, heavy_k=HKT)
            if nh > len(h_ids):
                # heavy-out paging: re-dispatch the SAME program with the
                # cursor below the last returned id until all nh eligible
                # heavy docs are in hand (h_ids come back id-descending)
                coll = [h_ids]
                got = len(h_ids)
                while got < nh and len(coll[-1]):
                    qb = np.array(prep["qbuf"], copy=True)
                    qb[-1] = int(coll[-1].min())
                    # the private gathered plane buffer makes this
                    # re-dispatch insensitive to cache churn
                    buf2 = solo_call(qb)
                    _, _, _, _, _, _, h2, nh2 = kernels.unpack_result(
                        buf2, K, f_sizes, heavy_k=HKT)
                    if not len(h2):
                        break
                    coll.append(h2)
                    got += len(h2)
                h_ids = np.concatenate(coll)
            if len(h_ids):
                hk0, hk1, hk2 = self._host_rescore_heavy(
                    prep, h_ids, slot_kinds, slot_signs, cols,
                    match_type, prioritize_token_position,
                    prioritize_exact, prioritize_num_fields,
                    exclude_flags, sort_slots=sort_slots)
                keep = rid >= 0
                ids_all = np.concatenate([rid[keep].astype(np.int64),
                                          h_ids])
                k0a = np.concatenate([r0[keep], hk0])
                k1a = np.concatenate([r1[keep], hk1])
                k2a = np.concatenate([r2[keep], hk2])
                order = np.lexsort((-ids_all, -k2a, -k1a, -k0a))[:K]
                rid = ids_all[order].astype(np.int32)
                r0, r1, r2 = k0a[order], k1a[order], k2a[order]
            return self._collect(rid, r0, r1, r2, found, f_acc,
                                 facet_fields, k)
        else:
            kern = kernels.build_keyword_kernel(
                Q, Fq, C, SCB, SS, S, prep["CAP"], prep["SB"],
                K, MAX_POS_PER_POSTING, self._iters,
                tuple(slot_kinds), tuple(slot_signs), prioritize_exact,
                prioritize_num_fields, len(facet_fields), f_caps, f_sizes,
                tuple(phrase_pairs), tuple(exclude_flags), match_type,
                prioritize_token_position)

        buf = kern(self.dev.post_doc_ids, self.dev.post_flags, self.dev.pos_offsets,
                   self.dev.positions, ftc_dev, fmask,
                   jnp.asarray(prep["qbuf"]), cols[0], cols[1], cols[2],
                   f_offs, f_vals)
        _rep = int(_os.environ.get("TS_PROF_REPEAT", "0"))
        if _rep:
            import time as _t
            jax.block_until_ready(buf)
            t0 = _t.perf_counter()
            for _ in range(_rep):
                buf = kern(self.dev.post_doc_ids, self.dev.post_flags,
                           self.dev.pos_offsets, self.dev.positions,
                           ftc_dev, fmask, jnp.asarray(prep["qbuf"]),
                           cols[0], cols[1], cols[2], f_offs, f_vals)
            jax.block_until_ready(buf)
            import typesense_tpu.search.engine as _E
            _E.LAST_DEV_MS = (_t.perf_counter() - t0) * 1000 / _rep
        rid, r0, r1, r2, found, f_acc = kernels.unpack_result(buf, K, f_sizes)
        return self._collect(rid, r0, r1, r2, found, f_acc, facet_fields, k)

    def _pack2_ok(self, sort_slots, slot_kinds, slot_signs) -> bool:
        """The dense kernel's 2-key packed merge is valid when the sort
        tuple is (text, small-magnitude column | none | seq, seq-desc | none)
        and doc ids fit the 22-bit id field."""
        if self.N >= (1 << 22):
            return False
        if slot_kinds[0] != kernels.SLOT_TEXT:
            return False
        if slot_kinds[2] == kernels.SLOT_SEQ_ID:
            if slot_signs[2] != 1:
                return False
        elif slot_kinds[2] != kernels.SLOT_NONE:
            return False
        k1 = slot_kinds[1]
        if k1 in (kernels.SLOT_NONE, kernels.SLOT_SEQ_ID):
            return True
        if k1 != kernels.SLOT_COLUMN:
            return False
        s1 = sort_slots[1] if len(sort_slots) > 1 else None
        if s1 is None or s1.custom_col is not None or s1.column is None:
            return False
        return self._col_pack_ok.get(s1.column, False)

    # ------------------------------------------------------------------
    def _ftc_for_fields(self, fis: tuple):
        """(N, Fq) token counts for the queried fields, cached per query_by
        combination — kernels index by query-field position (slot f must
        read field_names[f]'s counts)."""
        p = self._ftc_cache.get(fis)
        if p is None:
            cols = [max(fi, 0) for fi in fis]
            p = self._ftc_cache[fis] = jax.device_put(
                self.dev.field_token_counts[:, jnp.asarray(cols)])
        return p

    # ------------------------------------------------------------------
    def infix_term_ids(self, token: str, limit: int = 64,
                       max_extra_prefix: int = INT_MAX,
                       max_extra_suffix: int = INT_MAX) -> np.ndarray:
        """Term ids containing `token` as a substring (do_infix_search,
        index.cpp:3289) — one device sliding-window scan over the term table,
        trimmed to the most frequent `limit` terms. max_extra_prefix /
        max_extra_suffix bound the extra characters allowed before/after
        the query inside a matching term (index.cpp:3306)."""
        from typesense_tpu.ops.infix import infix_term_mask
        mask = np.asarray(infix_term_mask(self.dev.term_chars,
                                          self.dev.term_lens, token))
        ids = np.flatnonzero(mask)
        if len(ids) and (max_extra_prefix < INT_MAX or
                         max_extra_suffix < INT_MAX):
            keep = []
            for tid in ids:
                L = int(self.seg.term_lens[tid])
                term = bytes(self.seg.term_chars[tid, :L]).decode(
                    "utf-8", "ignore")
                at = term.find(token)
                if at >= 0 and at <= max_extra_prefix and \
                        (len(term) - at - len(token)) <= max_extra_suffix:
                    keep.append(tid)
            ids = np.asarray(keep, dtype=ids.dtype)
        if len(ids) > limit:
            freq = self.seg.term_doc_freq[ids]
            ids = ids[np.argsort(-freq, kind="stable")][:limit]
        return ids

    def term_rank_max_score(self, sort_field: str) -> np.ndarray | None:
        """Per-term max of the default sorting field across every posting —
        the ART leaf MAX_SCORE ordering (art.h:143-148) selected by
        rank_tokens_by=DEFAULT_SORTING_FIELD (collection.cpp:8706-8711).
        Candidate caps rank by this column instead of doc frequency. Lazy
        (one O(P) host pass) and cached per segment."""
        cached = getattr(self, "_term_max_score", None)
        if cached is not None and cached[0] == sort_field:
            return cached[1]
        col = self.seg.num_columns.get(sort_field)
        if col is None:
            return None
        T = self.seg.num_terms
        F = len(self.seg.search_fields)
        offs = self.seg.post_offsets[:F * T + 1]
        tid_per_post = np.repeat(np.arange(F * T, dtype=np.int64) % T,
                                 np.diff(offs))
        out = np.full(T, np.finfo(np.float64).min)
        np.maximum.at(out, tid_per_post,
                      col[self.seg.post_doc_ids[:offs[-1]]]
                      .astype(np.float64))
        self._term_max_score = (sort_field, out)
        return out

    # ------------------------------------------------------------------
    def wildcard_search(self, sort_slots: list[SortSpec], filter_mask=None,
                        facet_fields: list[str] | None = None,
                        k: int = TOPK) -> RawResult:
        K = bucket(k, lo=16, hi=1 << 14)
        slot_kinds, slot_signs, cols = self._prepare_slots(sort_slots)
        facet_fields = [f for f in (facet_fields or []) if f in self._facet_idx]
        f_offs = tuple(self.dev.facet_offsets[self._facet_idx[f]] for f in facet_fields)
        f_vals = tuple(self.dev.facet_value_ids[self._facet_idx[f]] for f in facet_fields)
        f_caps = tuple(self._facet_caps[f] for f in facet_fields)
        f_sizes = tuple(len(self.seg.facet_values[f]) for f in facet_fields)

        kern = kernels.build_wildcard_kernel(
            K, tuple(slot_kinds), tuple(slot_signs),
            len(facet_fields), f_caps, f_sizes)
        fmask = filter_mask if filter_mask is not None else self._live
        buf = kern(fmask, cols[0], cols[1], cols[2], f_offs, f_vals)
        rid, r0, r1, r2, found, f_acc = kernels.unpack_result(buf, K, f_sizes)
        return self._collect(rid, r0, r1, r2, found, f_acc, facet_fields, k)

    # ------------------------------------------------------------------
    IVF_MIN_N = 300_000   # below this a brute bf16/f32 scan is already fast

    def _vec_mask(self, field_name: str):
        vmask = getattr(self, "_vec_masks", {}).get(field_name)
        if vmask is None:
            norms = np.linalg.norm(self.seg.vectors[field_name], axis=1)
            m = (norms > 0) & self.seg.live
            vmask = jax.device_put(jnp.asarray(m))
            if not hasattr(self, "_vec_masks"):
                self._vec_masks = {}
            self._vec_masks[field_name] = vmask
        return vmask

    def _ivf_for(self, field_name: str):
        """Build (once) the IVF index for a large vector field. A 2M x 768
        bf16 brute scan moves ~3.4 GB HBM (~40 ms on this rig); IVF probes
        ~5% of it (index.h:356-389 hnsw_index_t territory)."""
        ivfs = getattr(self, "_ivf", None)
        if ivfs is None:
            ivfs = self._ivf = {}
        if field_name in ivfs:
            return ivfs[field_name]
        vecs = self.seg.vectors.get(field_name)
        if vecs is None or vecs.shape[0] < self.IVF_MIN_N:
            ivfs[field_name] = None
            return None
        from typesense_tpu.ops.ivf import build_ivf
        ivfs[field_name] = build_ivf(vecs)
        return ivfs[field_name]

    def vector_search(self, field_name: str, query_vec: np.ndarray, k: int,
                      filter_mask=None, distance_threshold: float = 3.4e38,
                      ef: int = 0, flat_search_cutoff: int = 0,
                      ) -> tuple[np.ndarray, np.ndarray]:
        """kNN over the vector field: IVF probe at scale, exact brute scan
        otherwise. Returns (ids, distances) trimmed to valid entries
        (dist <= threshold, filter passed). A filtered IVF probe that comes
        back short of k falls back to the exact scan — the reference's
        brute-force-under-selective-filters contract (index.cpp:3345
        flat_search_cutoff) without needing a host-side filter count."""
        ivf = self._ivf_for(field_name)
        if ivf is not None:
            vmask = self._vec_mask(field_name)
            mask = vmask if filter_mask is None else (vmask & filter_mask)
            from typesense_tpu.ops.ivf import ivf_search
            nprobe = max(32, min(ef * 8, ivf.n_cells)) if ef else 64
            # fetch a 4x margin so the exact f32 host re-rank below can
            # reorder bf16 near-ties without losing true top-k members
            KF = min(bucket(min(4 * k + 32, self.N), lo=16, hi=1 << 14),
                     self.N)
            handles = ivf_search(ivf, query_vec, KF, nprobe=nprobe,
                                 mask=mask,
                                 dist_threshold=distance_threshold)
            ids, dists = self.vector_search_collect(handles, KF)
            if len(ids) >= k or filter_mask is None:
                # exact re-rank: device scans bf16 (HBM half-traffic); the
                # final ordering is f32-exact over the candidate margin
                q = np.asarray(query_vec, np.float32)
                rows = self.seg.vectors[field_name][ids]
                d32 = 1.0 - rows.astype(np.float32) @ q
                keep = d32 <= distance_threshold
                ids, d32 = ids[keep], d32[keep]
                o = np.argsort(d32, kind="stable")[:k]
                return ids[o], d32[o]
            # selective filter starved the probe: exact scan fallback
        return self.vector_search_collect(
            self._brute_dispatch(field_name, query_vec, k, filter_mask,
                                 distance_threshold), k)

    def _brute_dispatch(self, field_name: str, query_vec: np.ndarray,
                        k: int, filter_mask, distance_threshold: float):
        from typesense_tpu.ops.vector import build_knn_kernel
        vi = self._vec_idx.get(field_name)
        if vi is None:
            raise BadRequest(f"Field `{field_name}` does not have a vector index.")
        vecs = self.dev.vectors[vi]
        vmask = self._vec_mask(field_name)
        mask = vmask if filter_mask is None else (vmask & filter_mask)
        K = min(bucket(min(k, self.N), lo=16, hi=1 << 14), self.N)
        kern = build_knn_kernel(K, 1)
        thr = jnp.float32(distance_threshold)

        def solo_call(qv):
            q = jnp.asarray(qv, jnp.float32)[None, :]
            return kern(vecs, q, mask, thr)

        def build_batched(B):
            bk = build_knn_kernel(K, B)
            warm = jnp.stack([jnp.asarray(query_vec, jnp.float32)] * B)
            jax.block_until_ready(bk(vecs, warm, mask, thr))
            return bk

        def batched_call(fn, qvs):
            qs = jnp.stack([jnp.asarray(q, jnp.float32) for q in qvs])
            idxs, dists = fn(vecs, qs, mask, thr)
            return [(idxs[i:i + 1], dists[i:i + 1])
                    for i in range(len(qvs))]

        # concurrent same-(index, mask, K) kNNs ride one batched matmul —
        # measured 12.6 ms solo vs 1.7 ms/query at B=16 for 2M x 768 bf16
        bkey = ("brute_knn", id(vecs), id(mask), K,
                float(distance_threshold))
        return QUERY_BATCHER.run(bkey, query_vec, solo_call, build_batched,
                                 batched_call)

    def vector_search_dispatch(self, field_name: str, query_vec: np.ndarray,
                               k: int, filter_mask=None,
                               distance_threshold: float = 3.4e38,
                               ef: int = 0):
        """Async half of vector_search: enqueue the kNN program and return
        device handles WITHOUT blocking — lets hybrid search overlap the
        vector and keyword programs in one device round trip. Uses the IVF
        probe at scale (no short-result fallback here; hybrid fusion only
        consumes the top ranks)."""
        ivf = self._ivf_for(field_name)
        if ivf is not None:
            vmask = self._vec_mask(field_name)
            mask = vmask if filter_mask is None else (vmask & filter_mask)
            from typesense_tpu.ops.ivf import ivf_search
            nprobe = max(32, min(ef * 8, ivf.n_cells)) if ef else 64
            K = min(bucket(min(k, self.N), lo=16, hi=1 << 14), self.N)
            return ivf_search(ivf, query_vec, K, nprobe=nprobe, mask=mask,
                              dist_threshold=distance_threshold)
        return self._brute_dispatch(field_name, query_vec, k, filter_mask,
                                    distance_threshold)

    @staticmethod
    def vector_search_collect(handles, k: int):
        # ONE batched device_get — two sequential np.asarray readbacks pay
        # the tunnel RTT twice (~28 ms each)
        idxs, dists = jax.device_get(handles)
        idxs = np.asarray(idxs[0])
        dists = np.asarray(dists[0])
        valid = np.isfinite(dists)
        return idxs[valid][:k], dists[valid][:k]

    # ------------------------------------------------------------------
    # dynamic sort columns (geo distance, _eval, _rand, missing_values)
    # ------------------------------------------------------------------
    def geo_sort_column(self, field_name: str, lat: float, lng: float,
                        exclude_radius_m: float = 0.0,
                        precision_m: float = 0.0, sign: int = -1):
        """Haversine distance in meters from (lat, lng) to every doc, as an
        int64 column (ascending with distance; missing docs always sort
        last for the given order sign). Computed on device from the resident
        geo column (geo sort, index.h:651 — S2LatLng distance per doc)."""
        gi = self._geo_idx.get(field_name)
        if gi is None:
            raise BadRequest(f"Could not find a geo field named `{field_name}`.")
        missing_key = np.int64(-(2**61)) * sign  # worst after *sign in kernel
        gm = self.seg.geo_multi.get(field_name)
        if gm is not None:
            # geopoint[]: the doc's sort key is its CLOSEST point
            # (GeoPointArraySorting, collection_sorting_test.cpp:1041) —
            # per-entry distances scatter-min onto docs
            docs_e, coords = gm
            ek = np.asarray(_geo_distance_keys(
                jnp.asarray(coords), float(lat), float(lng),
                float(exclude_radius_m), float(precision_m), missing_key))
            out = np.full(self.N, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(out, docs_e, ek)
            out = np.where(out == np.iinfo(np.int64).max, missing_key, out)
            return jnp.asarray(out)
        return _geo_distance_keys(self.dev.geo_columns[gi], float(lat), float(lng),
                                  float(exclude_radius_m), float(precision_m),
                                  missing_key)

    def geo_distances_host(self, field_name: str, lat: float, lng: float,
                           doc_ids: np.ndarray) -> np.ndarray:
        """Meters for a small id list (page hydration of geo_distance_meters).
        geopoint[] docs report their CLOSEST point's distance."""
        gm = self.seg.geo_multi.get(field_name)
        if gm is not None:
            import math
            docs_e, coords = gm
            lat1 = np.radians(coords[:, 0]); lng1 = np.radians(coords[:, 1])
            lat2, lng2 = math.radians(lat), math.radians(lng)
            de = 2 * 6371008.8 * np.arcsin(np.sqrt(
                np.sin((lat2 - lat1) / 2) ** 2 +
                np.cos(lat1) * math.cos(lat2) *
                np.sin((lng2 - lng1) / 2) ** 2))
            best = np.full(self.N, np.inf)
            np.minimum.at(best, docs_e, de)
            out = best[np.clip(doc_ids, 0, self.N - 1)]
            return np.where(np.isinf(out), -1, np.round(out)).astype(np.int64)
        col = self.seg.geo_columns[field_name][np.clip(doc_ids, 0, self.N - 1)]
        lat1 = np.radians(col[:, 0]); lng1 = np.radians(col[:, 1])
        import math
        lat2, lng2 = math.radians(lat), math.radians(lng)
        d = 2 * 6371008.8 * np.arcsin(np.sqrt(
            np.sin((lat2 - lat1) / 2) ** 2 +
            np.cos(lat1) * math.cos(lat2) * np.sin((lng2 - lng1) / 2) ** 2))
        return np.where(np.isnan(d), -1, np.round(d)).astype(np.int64)

    def missing_values_column(self, name: str, policy: str, sign: int):
        """Sort column with explicit missing-value placement (`missing_values:
        first|last` — collection.cpp sort param parsing). Default sentinel
        already makes missing smallest (first on asc / last on desc)."""
        key = (name, policy, sign)
        cached = self._sort_cols.get(key)
        if cached is not None:
            return cached
        col = self.seg.num_columns.get(name)
        if col is None:
            src = self.seg.str_sort_columns.get(name)
            if src is None:
                raise BadRequest(f"Could not find a field named `{name}` in the "
                                 f"schema for sorting.")
            missing = src == np.iinfo(np.int64).max
            base = np.clip(src, -(2**61), 2**61)
        elif col.dtype == np.float32:
            missing = np.isnan(col)
            base = float32_sortable_int64(col)
        else:
            missing = col == np.iinfo(np.int64).min
            base = np.clip(col, -(2**61), 2**61)
        # final key is base*sign, larger = better; "first" => missing best
        sentinel = np.int64(2**61) * (1 if policy == "first" else -1) * sign
        adj = np.where(missing, sentinel, base)
        dev = jax.device_put(jnp.asarray(adj, jnp.int64))
        self._sort_cols[key] = dev
        return dev

    def decay_sort_column(self, name: str, func: str, origin: int,
                          scale: int, offset: int, decay: float,
                          sign: int = 1):
        """Decay-function sort keys (Index::compute_decay_function_score,
        index.cpp:8925-8957): distance from origin (minus offset, clamped at
        0) through gauss/exp/linear/diff, as order-preserving int64 keys.
        Missing docs always sort last for the given order sign."""
        col = self.seg.num_columns.get(name)
        if col is None:
            raise BadRequest(f"Could not find a field named `{name}` in the "
                             f"schema for sorting.")
        key = (name, func, origin, scale, offset, decay, sign)
        cached = self._sort_cols.get(key)
        if cached is not None:
            return cached
        if col.dtype == np.float32:
            missing = np.isnan(col)
            vals = np.where(missing, 0.0, col).astype(np.float64)
        else:
            missing = col == np.iinfo(np.int64).min
            vals = np.where(missing, 0, col).astype(np.float64)
        d = np.maximum(np.abs(float(origin) - vals) - float(offset), 0.0)
        if func == "gauss":
            # reference computes exp(d^2 / (2*var)) with var < 0 (log decay)
            variance = (float(scale) ** 2) / (2.0 * np.log(max(decay, 1e-9)))
            res = np.exp(np.square(d) / (2.0 * variance))
        elif func == "exp":
            variance = np.log(max(decay, 1e-9)) / float(scale)
            res = np.exp(variance * d)
        elif func == "linear":
            variance = float(scale) / (1.0 - decay) if decay < 1.0 else 1e18
            res = np.maximum(0.0, (variance - d) / variance)
        else:  # diff
            res = d
        keys = float32_sortable_int64(res.astype(np.float32))
        # kernel multiplies by sign; pre-multiplying the sentinel keeps
        # missing docs last under BOTH orders (same trick as geo sort)
        keys = np.where(missing, np.int64(-(2**61)) * sign, keys)
        dev = jax.device_put(jnp.asarray(keys, jnp.int64))
        self._sort_cols[key] = dev
        return dev

    def rand_column(self, seed: int):
        """_rand(seed) sort: a seeded pseudo-random key per doc id.

        A stateless splitmix64-style hash of (seed, doc_id) — NOT a
        permutation of [0, N): the key for a given doc must be identical in
        every segment regardless of that segment's N, or cross-segment merge
        ordering would be inconsistent.
        """
        x = (np.arange(max(self.N, 1), dtype=np.uint64)
             + np.uint64((seed & 0xFFFFFFFFFFFFFFFF) ^ 0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        # positive int64 (engine sort keys clip to +-2^61)
        return jax.device_put(jnp.asarray((x >> np.uint64(3)).astype(np.int64)))

    def mask_to_column(self, masks_and_weights: list[tuple]):
        """_eval([(filter):w, ...]) sort: weighted sum of filter masks."""
        col = jnp.zeros(max(self.N, 1), jnp.int64)
        for mask, w in masks_and_weights:
            col = col + jnp.where(mask, jnp.int64(w), jnp.int64(0))
        return col

    # ------------------------------------------------------------------
    def _prepare_slots(self, sort_slots: list[SortSpec]):
        kinds, signs, cols = [], [], []
        for i in range(3):
            if i < len(sort_slots):
                s = sort_slots[i]
                kinds.append(s.kind)
                signs.append(s.sign)
                if s.kind == kernels.SLOT_COLUMN:
                    if s.custom_col is not None:
                        cols.append(s.custom_col)
                        continue
                    col = self._sort_cols.get(s.column)
                    if col is None:
                        raise BadRequest(
                            f"Could not find a field named `{s.column}` in the schema "
                            f"for sorting.")
                    cols.append(col)
                else:
                    cols.append(self._zero_col)
            else:
                kinds.append(kernels.SLOT_NONE)
                signs.append(1)
                cols.append(self._zero_col)
        return kinds, signs, cols

    def _collect(self, rid, r0, r1, r2, found, f_acc, facet_fields, k) -> RawResult:
        scores = np.stack([r0, r1, r2], axis=1)
        valid = rid >= 0
        rid, scores = rid[valid][:k], scores[valid][:k]
        facets = {}
        for i, fname in enumerate(facet_fields):
            facets[fname] = (self.seg.facet_values[fname], f_acc[i])
        return RawResult(doc_ids=rid, scores=scores, found=int(found),
                         facet_counts=facets, out_of=self._live_count)
