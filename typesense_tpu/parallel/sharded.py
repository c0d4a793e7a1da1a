"""Multi-chip sharded search over a jax.sharding.Mesh.

The reference scales reads by full-copy Raft replicas (SURVEY.md §2.4) —
every node holds the whole index. On TPU the natural scale-out inside a pod
is DOCUMENT SHARDING over ICI: each device holds the complete index arrays
for a slice of the corpus (the same flat artifacts as single-chip), executes
the identical search program on its shard, and the per-shard top-k / facet /
found results reduce across the mesh with XLA collectives:

    top-k merge  : all_gather(k per shard) -> re-top-k     (O(k * n_dev))
    found        : psum
    facet counts : psum

This mirrors the reference's intra-request fan-out (search_wildcard windows
+ aggregate_topster, index.cpp:6653; facet batches + aggregate_facet) with
the thread pool replaced by the device mesh. Replication across pods for HA
remains a host-level concern (api layer), orthogonal to this axis.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from typesense_tpu.index.builder import build_segment
from typesense_tpu.schema.field import Field

DOC_AXIS = "docs"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"Requested {n}-device mesh but only {len(devs)} "
                         f"devices are visible (set JAX_PLATFORMS=cpu + "
                         f"XLA_FLAGS=--xla_force_host_platform_device_count=N).")
    return Mesh(np.array(devs[:n]), (DOC_AXIS,))


# ---------------------------------------------------------------------------
# sharded index build: n_shards independent segments with identical shapes
# ---------------------------------------------------------------------------

def build_sharded_arrays(docs: list[tuple[int, dict]], fields: list[Field],
                         n_shards: int):
    """Partition docs round-robin into shards, build one segment per shard,
    pad all segments to common shapes and stack on a leading mesh axis.

    Returns (stacked dict of arrays, per-shard doc id base offsets).
    Local seq ids are renumbered 0..len(shard)-1; global id = shard_base + local.
    """
    shards: list[list[tuple[int, dict]]] = [[] for _ in range(n_shards)]
    globals_per_shard: list[list[int]] = [[] for _ in range(n_shards)]
    for i, (seq, doc) in enumerate(docs):
        s = i % n_shards
        globals_per_shard[s].append(seq)
        shards[s].append((len(shards[s]), doc))

    per_docs = max(max((len(s) for s in shards), default=1), 1)
    segs = [build_segment(s, fields, num_docs=per_docs) for s in shards]

    T = max(max(s.num_terms for s in segs), 1)
    P_len = max(max(len(s.post_doc_ids) for s in segs), 1)
    PP = max(max(len(s.positions) for s in segs), 1)
    F = max(len(segs[0].search_fields), 1)

    def pad(a, n, fill=0):
        if a.shape[0] >= n:
            return a[:n]
        return np.concatenate([a, np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)])

    out = {
        "term_chars": np.stack([pad(s.term_chars, T) for s in segs]),
        "term_lens": np.stack([pad(s.term_lens, T) for s in segs]),
        "post_offsets": np.stack([
            # re-express offsets over padded (F, T) row space
            _pad_offsets(s, F, T, P_len) for s in segs]),
        "post_doc_ids": np.stack([pad(s.post_doc_ids, P_len) for s in segs]),
        "live": np.stack([pad(s.live, per_docs) for s in segs]),
        # local seq id -> global doc id (padding rows map to themselves; they
        # are never live so they can't surface in results)
        "doc_base": np.array([(list(g) + list(range(len(g), per_docs)))[:per_docs]
                              for g in globals_per_shard], dtype=np.int32),
    }
    # vector fields
    for name in segs[0].vectors:
        out[f"vec_{name}"] = np.stack([s.vectors[name] for s in segs])
    # numeric sort columns
    for name in segs[0].num_columns:
        col0 = segs[0].num_columns[name]
        out[f"col_{name}"] = np.stack([s.num_columns[name] for s in segs]).astype(col0.dtype)
    return out, segs


def _pad_offsets(seg, F, T, P_len):
    """Remap a segment's (F_s*T_s+1,) offsets onto the padded (F*T+1,) space."""
    return _pad_offsets_arr(seg.post_offsets,
                            max(len(seg.search_fields), 1),
                            max(seg.num_terms, 1), F, T)


def _pad_offsets_arr(src, Fs, Ts, F, T):
    dst = np.zeros(F * T + 1, dtype=np.int64)
    for f in range(F):
        for_block = np.full(T + 1, src[min(f, Fs - 1) * Ts + Ts] if f < Fs else src[-1],
                            dtype=np.int64)
        if f < Fs:
            for_block[:Ts + 1] = src[f * Ts:f * Ts + Ts + 1]
            for_block[Ts + 1:] = src[f * Ts + Ts]
        dst[f * T:(f + 1) * T + 1] = for_block
    return dst


def token_row_bounds(segs, arrays, tokens: list[str], field_idx: int = 0):
    """Resolve tokens against every shard's (independent) term dictionary,
    returning per-shard posting row bounds (n, Q) — empty rows for absent."""
    n = len(segs)
    Q = len(tokens)
    T = arrays["term_chars"].shape[1]
    starts = np.zeros((n, Q), np.int64)
    ends = np.zeros((n, Q), np.int64)
    for s, seg in enumerate(segs):
        po = arrays["post_offsets"][s]
        for qi, tok in enumerate(tokens):
            tid = seg.term_to_id.get(tok, -1)
            if tid >= 0:
                row = field_idx * T + tid
                starts[s, qi] = po[row]
                ends[s, qi] = po[row + 1]
    return starts, ends


# ---------------------------------------------------------------------------
# sharded search step
# ---------------------------------------------------------------------------

def build_sharded_search_step(mesh: Mesh, Q: int, D: int, K: int, iters: int,
                              vec_dim: int):
    """A full sharded hybrid search step: exact-AND keyword scoring + brute
    kNN on each doc shard, cross-shard top-k merge. in/out via shard_map."""

    def local_step(post_doc_ids, post_offsets, live, doc_base, vectors, col,
                   tok_starts, tok_ends, token_valid, qvec):
        # shapes arrive with a leading local-shard axis of 1.
        # tok_starts/tok_ends are PER-SHARD posting row bounds — term ids are
        # shard-local (each shard owns an independent dictionary), so the
        # host resolves tokens against every shard's term map; a token absent
        # from a shard gets an empty row (start == end), which correctly
        # yields zero local matches under AND semantics.
        post_doc_ids = post_doc_ids[0]
        post_offsets = post_offsets[0]
        live = live[0]
        doc_base = doc_base[0]
        vectors = vectors[0]
        col = col[0]

        starts = tok_starts[0]                                # (Q,)
        ends = tok_ends[0]
        lens = jnp.where(token_valid, ends - starts, jnp.int64(1 << 40))
        drv = jnp.argmin(lens)
        dstart = starts[drv].astype(jnp.int32)
        dend = ends[drv].astype(jnp.int32)

        idx = dstart + jnp.arange(D, dtype=jnp.int32)
        valid = idx < dend
        docs = jnp.where(valid, post_doc_ids[jnp.minimum(idx, post_doc_ids.shape[0] - 1)],
                         jnp.int32(2**31 - 1))

        # membership of driver docs in every other token's row
        def probe(q, acc):
            lo = jnp.full((D,), starts[q], jnp.int64)
            hi = jnp.full((D,), ends[q], jnp.int64)

            def body(_, st):
                lo, hi = st
                mid = (lo + hi) >> 1
                v = post_doc_ids[jnp.clip(mid, 0, post_doc_ids.shape[0] - 1)]
                less = v < docs
                return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

            lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
            found = (lo < ends[q]) & (post_doc_ids[jnp.clip(lo, 0, post_doc_ids.shape[0] - 1)] == docs)
            return acc & (found | ~token_valid[q])

        matched = lax.fori_loop(0, Q, probe, valid)
        matched = matched & live[jnp.clip(docs, 0, live.shape[0] - 1)]
        found = jnp.sum(matched, dtype=jnp.int64)

        # rank matched docs by the sort column, local top-k
        keys = jnp.where(matched, col[jnp.clip(docs, 0, col.shape[0] - 1)], jnp.int64(-(2**62)))
        kv, ki = lax.top_k(keys, K)
        kw_ids = jnp.where(kv > -(2**62),
                           doc_base[jnp.clip(docs[ki], 0, doc_base.shape[0] - 1)], -1)

        # vector kNN on the shard
        sims = jax.lax.dot_general(qvec[None, :], vectors,
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)[0]
        dist = jnp.where(live, 1.0 - sims, jnp.inf)
        nv, ni = lax.top_k(-dist, K)
        vec_ids = jnp.where(jnp.isfinite(nv), doc_base[ni], -1)

        # cross-shard merge over ICI
        found = lax.psum(found, DOC_AXIS)
        all_kv = lax.all_gather(kv, DOC_AXIS, tiled=True)
        all_kid = lax.all_gather(kw_ids, DOC_AXIS, tiled=True)
        all_nv = lax.all_gather(nv, DOC_AXIS, tiled=True)
        all_vid = lax.all_gather(vec_ids, DOC_AXIS, tiled=True)
        gk, gi = lax.top_k(all_kv, K)
        gv, gvi = lax.top_k(all_nv, K)
        return (all_kid[gi][None], gk[None], all_vid[gvi][None], -gv[None],
                jnp.full((1,), found))

    n = mesh.devices.size
    spec_sharded = P(DOC_AXIS)
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_sharded,) * 8 + (P(), P()),
        out_specs=(spec_sharded, spec_sharded, spec_sharded, spec_sharded, spec_sharded),
        check_vma=False)

    @jax.jit
    def search_step(post_doc_ids, post_offsets, live, doc_base, vectors, col,
                    tok_starts, tok_ends, token_valid, qvec):
        kid, kk, vid, vd, found = step(post_doc_ids, post_offsets, live, doc_base,
                                       vectors, col, tok_starts, tok_ends,
                                       token_valid, qvec)
        # replicated identical outputs per shard — take the first row
        return kid[0], kk[0], vid[0], vd[0], found[0]

    return search_step


# ---------------------------------------------------------------------------
# The REAL sharded engine: the full keyword kernel (typo candidates,
# scatter/scan intersection, proximity scoring, facets, filters) runs per
# doc shard under shard_map; shards merge with ICI collectives
# (all_gather top-k re-merge, psum found/facets). This is the production
# mapping of the reference's windowed scoring fan-out + aggregate_topster
# (/root/reference/src/index.cpp:6653-6655, include/index.h:525) onto a
# device mesh (SURVEY.md §2.4).
# ---------------------------------------------------------------------------

from types import SimpleNamespace

from jax.sharding import NamedSharding

from typesense_tpu.search import kernels
from typesense_tpu.search.engine import (
    IndexEngine, MAX_POS_PER_POSTING, RawResult, float32_sortable_int64,
)


class _ShardView:
    """Host-side view of one shard for O(query) planning: term dictionary,
    prefix ranges, fuzzy tables, PADDED posting offsets. Exposes exactly the
    attribute surface that token_candidate_sets / fuzzy_candidates_batch /
    IndexEngine.prepare_keyword_dispatch touch, so the single-device planner
    runs unchanged per shard."""

    def __init__(self, seg, padded_offsets, field_idx, T):
        self._iters = max(
            int(np.ceil(np.log2(max(len(seg.post_doc_ids), 2)))) + 1, 2)
        self.names = {}  # no head-plane cache on shard views (scatter path)
        self._plane_cache_on = False  # runtime plane cache is single-device
        self.seg = SimpleNamespace(
            term_to_id=seg.term_to_id,
            term_doc_freq=seg.term_doc_freq,
            num_terms=seg.num_terms,
            term_chars=seg.term_chars,
            term_lens=seg.term_lens,
            post_offsets=padded_offsets,
        )
        self.field_idx = field_idx
        self.T = T
        self.N = seg.num_docs

    _row_bounds = IndexEngine._row_bounds
    prepare_keyword_dispatch = IndexEngine.prepare_keyword_dispatch


class ShardedEngine:
    """Doc-sharded index over a Mesh running the SAME kernel body as the
    single-device engine (kernels.keyword_kernel_body) per shard.

    Semantics note: each shard owns an independent term dictionary, so
    frequency-ranked candidate CAPS (max_candidates) rank by shard-local
    frequency. With caps that don't bind (or exact tokens), results are
    identical to the single-device engine on the same corpus — asserted by
    tests/dryrun. Facet value ids are remapped to one GLOBAL dictionary at
    build time so facet psum merges are exact."""

    def __init__(self, docs: list[tuple[int, dict]], fields: list[Field],
                 mesh: Mesh):
        self.mesh = mesh
        self.fields = fields
        n = mesh.devices.size
        self.n_shards = n

        shards: list[list[tuple[int, dict]]] = [[] for _ in range(n)]
        globals_per_shard: list[list[int]] = [[] for _ in range(n)]
        for i, (seq, doc) in enumerate(docs):
            s = i % n
            globals_per_shard[s].append(seq)
            shards[s].append((len(shards[s]), doc))
        per_docs = max(max((len(s) for s in shards), default=1), 1)
        segs = [build_segment(s, fields, num_docs=per_docs) for s in shards]
        self.segs = segs

        # global facet dictionaries (exact cross-shard psum counting)
        self.facet_values: dict[str, list[str]] = {}
        facet_names = [f.name for f in fields if f.facet]
        for name in facet_names:
            seen: dict[str, int] = {}
            vals: list[str] = []
            for seg in segs:
                for v in seg.facet_values.get(name, []):
                    if v not in seen:
                        seen[v] = len(vals)
                        vals.append(v)
            self.facet_values[name] = vals
            for seg in segs:
                local_vals = seg.facet_values.get(name, [])
                offs, ids = seg.facet_columns[name]
                if len(local_vals):
                    remap = np.asarray([seen[v] for v in local_vals],
                                       dtype=np.int32)
                    ids = remap[ids] if len(ids) else ids.astype(np.int32)
                seg.facet_columns[name] = (offs, ids)

        T = max(max(s.num_terms for s in segs), 1)
        P_len = max(max(len(s.post_doc_ids) for s in segs), 1)
        PP = max(max(len(s.positions) for s in segs), 1)
        self.T = T
        self.N_local = per_docs
        self.field_idx = {nm: i for i, nm in enumerate(segs[0].search_fields)}
        self._iters = max(int(np.ceil(np.log2(max(P_len, 2)))) + 1, 2)

        def pad(a, ln, fill=0):
            if a.shape[0] >= ln:
                return a[:ln]
            return np.concatenate(
                [a, np.full((ln - a.shape[0],) + a.shape[1:], fill, a.dtype)])

        def pad_offsets_tail(a, ln):
            # monotone offsets: pad by repeating the last value
            if a.shape[0] >= ln:
                return a[:ln]
            return np.concatenate(
                [a, np.full(ln - a.shape[0], a[-1], a.dtype)])

        padded_po = [_pad_offsets(s, max(len(segs[0].search_fields), 1), T,
                                  P_len) for s in segs]
        self.views = [
            _ShardView(seg, po, self.field_idx, T)
            for seg, po in zip(segs, padded_po)]

        shard = NamedSharding(mesh, P(DOC_AXIS))
        self._shard = shard

        def put(stacked):
            return jax.device_put(stacked, shard)

        self.post_doc_ids = put(np.stack(
            [pad(s.post_doc_ids, P_len) for s in segs]).astype(np.int32))
        self.post_flags = put(np.stack(
            [pad(s.post_flags, P_len) for s in segs]))
        self.pos_offsets = put(np.stack(
            [pad_offsets_tail(s.pos_offsets, P_len + 1) for s in segs]))
        self.positions = put(np.stack(
            [pad(s.positions, PP) for s in segs]).astype(np.int32))
        self.field_token_counts = put(np.stack(
            [s.field_token_counts for s in segs]))
        self.live = put(np.stack([s.live for s in segs]))
        self.doc_base = put(np.stack(
            [np.asarray((list(g) + list(range(len(g), per_docs)))[:per_docs],
                        dtype=np.int32)
             for g in globals_per_shard]))
        self._zero_col = put(np.zeros((n, per_docs), np.int64))

        # sort-ready int64 columns (same key transform as IndexEngine)
        self.sort_cols: dict[str, jax.Array] = {}
        for name in segs[0].num_columns:
            stacked = []
            for s in segs:
                col = s.num_columns[name]
                if col.dtype == np.float32:
                    stacked.append(float32_sortable_int64(col))
                else:
                    stacked.append(np.clip(col, -(2**61), 2**61))
            self.sort_cols[name] = put(np.stack(stacked).astype(np.int64))
        for name in segs[0].str_sort_columns:
            self.sort_cols[name] = put(np.stack(
                [np.clip(s.str_sort_columns[name], -(2**61), 2**61)
                 for s in segs]).astype(np.int64))
        self._raw_cols = {name: put(np.stack(
            [s.num_columns[name] for s in segs]))
            for name in segs[0].num_columns}

        # facet CSR (global value ids)
        self.facet_offs: dict[str, jax.Array] = {}
        self.facet_vals: dict[str, jax.Array] = {}
        for name in facet_names:
            vmax = max(max((len(s.facet_columns[name][1]) for s in segs),
                           default=1), 1)
            self.facet_offs[name] = put(np.stack(
                [s.facet_columns[name][0] for s in segs]).astype(np.int64))
            self.facet_vals[name] = put(np.stack(
                [pad(s.facet_columns[name][1].astype(np.int32), vmax)
                 for s in segs]))
            caps = [int(max((s.facet_columns[name][0][1:]
                             - s.facet_columns[name][0][:-1]).max(initial=0),
                            1)) for s in segs]
            cap = max(caps)
            setattr(self, "_cap_" + name,
                    1 << (cap - 1).bit_length() if cap > 1 else 1)

        self._kern_cache: dict = {}

        # ---- dense2 artifacts: meta32 postings, head planes, heavy
        # lists, facet cols
        from typesense_tpu.index.artifacts import (
            MA_EMPTY, build_head_planes, build_heavy_lists,
            pack_post_meta32_device,
        )
        metas, heads_a, heads_b, heavies = [], [], [], []
        F_pad = max(len(segs[0].search_fields), 1)
        for vi, seg in enumerate(segs):
            pd = jax.device_put(
                pad(seg.post_doc_ids, P_len).astype(np.int32))
            m32 = np.asarray(pack_post_meta32_device(
                seg.post_flags, seg.pos_offsets, seg.positions))
            metas.append(pad(m32.astype(np.uint32), P_len))
            ha, hb, hm = build_head_planes(seg, pd)
            heads_a.append(np.asarray(ha))
            heads_b.append(np.asarray(hb))
            hp, ho = build_heavy_lists(seg)
            heavies.append(hp)
            self.views[vi].names = {"head_map": hm}
            self.views[vi].seg.post_len = P_len
            self.views[vi].seg.heavy_offsets = _pad_offsets_arr(
                ho, max(len(seg.search_fields), 1),
                max(seg.num_terms, 1), F_pad, T)
        Hmax = max(h.shape[0] for h in heads_a)
        HP_len = max(max((len(h) for h in heavies), default=1), 1)
        self.heavy_ids = put(np.stack(
            [pad(h if len(h) else np.zeros(1, np.int32), HP_len)
             for h in heavies]))

        def pad_plane(h, fill):
            out = np.full((Hmax, per_docs), fill, np.int32)
            if h.shape[1] >= per_docs:
                out[:h.shape[0], :] = h[:, :per_docs]
            else:
                out[:h.shape[0], :h.shape[1]] = h
            return out

        self.post_meta = put(np.stack(metas))
        self.head_a = put(np.stack([pad_plane(h, MA_EMPTY)
                                    for h in heads_a]))
        self.head_b = put(np.stack([pad_plane(h, 0) for h in heads_b]))
        # dense one-hot facet columns (GLOBAL value ids; sentinel = V)
        self.facet_single: dict[str, jax.Array | None] = {}
        for name in facet_names:
            V = len(self.facet_values[name])
            cols = []
            ok = True
            for seg in segs:
                offs, vals = seg.facet_columns[name]
                counts = np.diff(offs)
                if counts.max(initial=0) > 1:
                    ok = False
                    break
                col = np.full(per_docs, V, np.int32)
                has = counts == 1
                col[has] = vals[offs[:-1][has]]
                cols.append(col)
            self.facet_single[name] = put(np.stack(cols)) if ok else None
        # vector fields (bf16 at scale, like the single-chip engine)
        self.vectors: dict[str, jax.Array] = {}
        for name in segs[0].vectors:
            stacked = np.stack([s.vectors[name] for s in segs])
            if per_docs >= 100_000:
                self.vectors[name] = jax.device_put(
                    jnp.asarray(stacked, jnp.bfloat16), shard)
            else:
                self.vectors[name] = put(stacked)

    # ------------------------------------------------------------------
    def _sharded_kernel(self, statics: tuple):
        kern = self._kern_cache.get(statics)
        if kern is not None:
            return kern
        (Q, F, C, SCB, SS, S, CAP, SB, K, Pp, iters, slot_kinds, slot_signs,
         pe, pnf, n_facets, f_caps, f_sizes, phrase_pairs, excl) = statics

        def local(pd, pf, po, pos, ftc, fm, qbuf, c0, c1, c2, db,
                  f_offs, f_vals):
            buf = kernels.keyword_kernel_body(
                Q, F, C, SCB, SS, S, CAP, SB, K, Pp, iters, slot_kinds,
                slot_signs,
                pe, pnf, n_facets, f_caps, f_sizes, phrase_pairs, excl,
                pd[0], pf[0], po[0], pos[0], ftc[0], fm[0], qbuf[0],
                c0[0], c1[0], c2[0],
                tuple(x[0] for x in f_offs), tuple(x[0] for x in f_vals),
                doc_base=db[0])
            rid = buf[:K]
            r0, r1, r2 = buf[K:2 * K], buf[2 * K:3 * K], buf[3 * K:4 * K]
            found = buf[4 * K]
            o = 4 * K + 1
            # cross-shard merges over ICI
            gid = lax.all_gather(rid, DOC_AXIS, tiled=True)
            g0 = lax.all_gather(r0, DOC_AXIS, tiled=True)
            g1 = lax.all_gather(r1, DOC_AXIS, tiled=True)
            g2 = lax.all_gather(r2, DOC_AXIS, tiled=True)
            m0, m1, m2, mid = kernels.topk_merge(
                g0, g1, g2, gid.astype(jnp.int32), gid >= 0, K)
            found = lax.psum(found, DOC_AXIS)
            out = [mid.astype(jnp.int64), m0, m1, m2, found[None]]
            for sz in f_sizes:
                out.append(lax.psum(buf[o:o + sz], DOC_AXIS))
                o += sz
            return jnp.concatenate(out)[None]

        spec = P(DOC_AXIS)
        kern = jax.jit(shard_map(
            local, mesh=self.mesh,
            in_specs=(spec,) * 13,
            out_specs=spec, check_vma=False))
        self._kern_cache[statics] = kern
        return kern

    # ------------------------------------------------------------------
    def _sharded_dense2(self, statics: tuple):
        """Sharded dense2: each shard runs the whole-corpus fused scan over
        its OWN doc slice (head planes + meta32 scatter + block-select
        cascade, kernels.dense2_kernel_body), then top-k/facets/found merge
        over ICI — the production path for high-volume queries on a mesh."""
        key = ("dense2",) + statics
        kern = self._kern_cache.get(key)
        if kern is not None:
            return kern
        (Q, F, C, HPF, SCB, SCBB, SSB, K, HC, Pp, iters, slot_kinds,
         slot_signs, pe, pnf, n_facets, f_sizes, excl, N_local, match_type,
         ptp, CAP_H) = statics

        def local(pd, pm, po, pos, ftc, ha, hb, hv, fm, qbuf, c0, c1, c2,
                  db, f_cols):
            buf = kernels.dense2_kernel_body(
                Q, F, C, HPF, SCB, SCBB, SSB, K, HC, Pp, iters, slot_kinds,
                slot_signs, pe, pnf, n_facets, f_sizes, excl, N_local,
                False, match_type, ptp,
                pd[0], pm[0], po[0], pos[0], ftc[0], ha[0], hb[0], fm[0],
                qbuf[0], c0[0], c1[0], c2[0],
                tuple(x[0] for x in f_cols), doc_base=db[0],
                heavy_ids=hv[0], CAP_H=CAP_H)
            rid = buf[:K]
            r0, r1, r2 = buf[K:2 * K], buf[2 * K:3 * K], buf[3 * K:4 * K]
            found = buf[4 * K]
            o = 4 * K + 1
            gid = lax.all_gather(rid, DOC_AXIS, tiled=True)
            g0 = lax.all_gather(r0, DOC_AXIS, tiled=True)
            g1 = lax.all_gather(r1, DOC_AXIS, tiled=True)
            g2 = lax.all_gather(r2, DOC_AXIS, tiled=True)
            m0, m1, m2, mid = kernels.topk_merge(
                g0, g1, g2, gid.astype(jnp.int32), gid >= 0, K)
            found = lax.psum(found, DOC_AXIS)
            out = [mid.astype(jnp.int64), m0, m1, m2, found[None]]
            for sz in f_sizes:
                out.append(lax.psum(buf[o:o + sz], DOC_AXIS))
                o += sz
            return jnp.concatenate(out)[None]

        spec = P(DOC_AXIS)
        kern = jax.jit(shard_map(
            local, mesh=self.mesh,
            in_specs=(spec,) * 15,
            out_specs=spec, check_vma=False))
        self._kern_cache[key] = kern
        return kern

    # ------------------------------------------------------------------
    def vector_search(self, field_name: str, query_vec, k: int = 10,
                      distance_threshold: float = 3.4e38):
        """Sharded brute kNN: fused matmul + local top-k per doc shard,
        all_gather + re-top-k over ICI (the mesh mapping of
        index.cpp:3345's flat scan). Returns (global ids, distances)."""
        vecs = self.vectors[field_name]
        K = min(int(k), self.N_local)
        key = ("knn", field_name, K)
        kern = self._kern_cache.get(key)
        if kern is None:
            def local(v, live, db, q, thr):
                q1 = q.astype(v.dtype)
                sims = jax.lax.dot_general(
                    q1[None, :], v[0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
                dist = jnp.where(live[0], 1.0 - sims, jnp.inf)
                dist = jnp.where(dist <= thr, dist, jnp.inf)
                nv, ni = lax.top_k(-dist, K)
                ids = jnp.where(jnp.isfinite(nv), db[0][ni], -1)
                av = lax.all_gather(nv, DOC_AXIS, tiled=True)
                ai = lax.all_gather(ids, DOC_AXIS, tiled=True)
                gv, gi = lax.top_k(av, K)
                return ai[gi][None], (-gv)[None]

            spec = P(DOC_AXIS)
            kern = jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(spec, spec, spec, P(), P()),
                out_specs=(spec, spec), check_vma=False))
            self._kern_cache[key] = kern
        ids, dists = kern(vecs, self.live, self.doc_base,
                          jnp.asarray(query_vec, jnp.float32),
                          jnp.float32(distance_threshold))
        ids = np.asarray(ids)[0]
        dists = np.asarray(dists)[0]
        valid = np.isfinite(dists)
        return ids[valid][:k], dists[valid][:k]

    # ------------------------------------------------------------------
    def search(self, tokens: list[str], field_names: list[str],
               field_weights: list[int] | None = None,
               sort_specs: list[tuple] | None = None,
               facet_fields: list[str] | None = None,
               num_typos: list[int] | None = None,
               prefixes: list[bool] | None = None,
               max_candidates: int = 64,
               filter_range: tuple | None = None,
               k: int = 16, mode: str = "scatter") -> RawResult:
        """Typo-tolerant faceted filtered search over the mesh.

        sort_specs: up to 3 of (kind, sign, column_name_or_None) using
        kernels.SLOT_* kinds. filter_range: (num_field, lo, hi) inclusive.
        mode: "scatter" (driver-stream kernel) or "dense2" (whole-corpus
        fused scan with head planes + block-select cascade)."""
        from typesense_tpu.search.candidates import token_candidate_sets

        num_typos = num_typos or [0]
        prefixes = prefixes if prefixes is not None else [False]
        field_weights = field_weights or [1] * len(field_names)
        facet_fields = [f for f in (facet_fields or [])
                        if f in self.facet_values]
        if mode == "dense2" and any(self.facet_single.get(f) is None
                                    for f in facet_fields):
            mode = "scatter"   # multi-value facets need the CSR path

        # per-shard planning with the single-device planner
        mode_force = {"mode": "dense2"} if mode == "dense2" else {}
        preps = []
        per_shard_cands = []
        for view in self.views:
            cands = token_candidate_sets(
                view, tokens, field_names, num_typos, prefixes,
                max_candidates, typo_tokens_threshold=1)
            per_shard_cands.append(cands)
            preps.append(IndexEngine.prepare_keyword_dispatch(
                view, cands, field_names, field_weights, k=k,
                force=dict(mode_force) or None))
        if all(p is None for p in preps):
            return RawResult(np.empty(0, np.int32),
                             np.empty((0, 3), np.int64), 0)
        if mode == "dense2":
            return self._search_dense2(preps, per_shard_cands, field_names,
                                       field_weights, sort_specs,
                                       facet_fields, filter_range, k)
        # one SPMD program: every shard re-plans with the SAME statics
        force = {
            "C": max(p["C"] for p in preps if p),
            "S": max(p["S"] for p in preps if p),
            "K": max(p["K"] for p in preps if p),
            "CAP": max(p["CAP"] for p in preps if p),
            "SB": max(p["SB"] for p in preps if p),
            "use_probe": False,
        }
        preps = [IndexEngine.prepare_keyword_dispatch(
            view, cands, field_names, field_weights, k=k, force=force)
            for view, cands in zip(self.views, per_shard_cands)]
        force["SCB"] = max(p["SCB"] for p in preps)
        if any(p["SCB"] != force["SCB"] for p in preps):
            preps = [IndexEngine.prepare_keyword_dispatch(
                view, cands, field_names, field_weights, k=k,
                force=force)
                for view, cands in zip(self.views, per_shard_cands)]
        qbuf = jax.device_put(
            np.stack([p["qbuf"] for p in preps]), self._shard)

        # sort slots
        kinds, signs, cols = [], [], []
        sort_specs = list(sort_specs or [(kernels.SLOT_TEXT, 1, None)])
        for i in range(3):
            if i < len(sort_specs):
                kd, sg, nm = sort_specs[i]
                kinds.append(kd)
                signs.append(sg)
                cols.append(self.sort_cols[nm] if nm else self._zero_col)
            else:
                kinds.append(kernels.SLOT_NONE)
                signs.append(1)
                cols.append(self._zero_col)

        # filter mask (elementwise on sharded arrays — sharding propagates)
        if filter_range is not None:
            fname, lo, hi = filter_range
            col = self._raw_cols[fname]
            fmask = _range_mask(col, self.live, lo, hi)
        else:
            fmask = self.live

        f_offs = tuple(self.facet_offs[f] for f in facet_fields)
        f_vals = tuple(self.facet_vals[f] for f in facet_fields)
        f_caps = tuple(getattr(self, "_cap_" + f) for f in facet_fields)
        f_sizes = tuple(len(self.facet_values[f]) for f in facet_fields)
        p0 = preps[0]
        statics = (p0["Q"], p0["Fq"], force["C"], force["SCB"], p0["SS"],
                   force["S"], force["CAP"], force["SB"],
                   force["K"], MAX_POS_PER_POSTING, self._iters,
                   tuple(kinds), tuple(signs), True, True,
                   len(facet_fields), f_caps, f_sizes, (), ())
        kern = self._sharded_kernel(statics)
        buf = np.asarray(kern(
            self.post_doc_ids, self.post_flags, self.pos_offsets,
            self.positions, self.field_token_counts, fmask, qbuf,
            cols[0], cols[1], cols[2], self.doc_base,
            f_offs, f_vals))[0]
        K = force["K"]
        rid, r0, r1, r2, found, f_acc = kernels.unpack_result(buf, K, f_sizes)
        scores = np.stack([r0, r1, r2], axis=1)
        valid = rid >= 0
        rid, scores = rid[valid][:k], scores[valid][:k]
        facets = {f: (self.facet_values[f], f_acc[i])
                  for i, f in enumerate(facet_fields)}
        return RawResult(doc_ids=rid, scores=scores, found=int(found),
                         facet_counts=facets,
                         out_of=int(sum(s.live.sum() for s in self.segs)))


    def _search_dense2(self, preps, per_shard_cands, field_names,
                       field_weights, sort_specs, facet_fields,
                       filter_range, k) -> RawResult:
        from typesense_tpu.search.engine import MAX_POS_PER_POSTING
        force = {
            "mode": "dense2",
            "C": max(p["C"] for p in preps),
            "K": max(p["K"] for p in preps),
            "HPF": max(p["HPF"] for p in preps),
            "SCB": max(p["SCB"] for p in preps),
            "SCBB": max(p["SCBB"] for p in preps),
            "CAP_H": max(p["CAP_H"] for p in preps),
        }
        preps = [IndexEngine.prepare_keyword_dispatch(
            view, cands, field_names, field_weights, k=k, force=force)
            for view, cands in zip(self.views, per_shard_cands)]
        qbuf = jax.device_put(
            np.stack([p["qbuf"] for p in preps]), self._shard)

        kinds, signs, cols = [], [], []
        sort_specs = list(sort_specs or [(kernels.SLOT_TEXT, 1, None)])
        for i in range(3):
            if i < len(sort_specs):
                kd, sg, nm = sort_specs[i]
                kinds.append(kd)
                signs.append(sg)
                cols.append(self.sort_cols[nm] if nm else self._zero_col)
            else:
                kinds.append(kernels.SLOT_NONE)
                signs.append(1)
                cols.append(self._zero_col)

        if filter_range is not None:
            fname, lo, hi = filter_range
            fmask = _range_mask(self._raw_cols[fname], self.live, lo, hi)
        else:
            fmask = self.live

        f_cols = tuple(self.facet_single[f] for f in facet_fields)
        f_sizes = tuple(len(self.facet_values[f]) for f in facet_fields)
        p0 = preps[0]
        K = force["K"]
        statics = (p0["Q"], p0["Fq"], force["C"], force["HPF"],
                   force["SCB"], force["SCBB"], p0["SSB"], K, 512,
                   MAX_POS_PER_POSTING, self._iters,
                   tuple(kinds), tuple(signs), True, True,
                   len(facet_fields), f_sizes, (), self.N_local, 0, False,
                   force["CAP_H"])
        kern = self._sharded_dense2(statics)
        buf = np.asarray(kern(
            self.post_doc_ids, self.post_meta, self.pos_offsets,
            self.positions, self.field_token_counts, self.head_a,
            self.head_b, self.heavy_ids, fmask, qbuf, cols[0], cols[1],
            cols[2], self.doc_base, f_cols))[0]
        rid, r0, r1, r2, found, f_acc = kernels.unpack_result(buf, K,
                                                              f_sizes)
        scores = np.stack([r0, r1, r2], axis=1)
        valid = rid >= 0
        rid, scores = rid[valid][:k], scores[valid][:k]
        facets = {f: (self.facet_values[f], f_acc[i])
                  for i, f in enumerate(facet_fields)}
        return RawResult(doc_ids=rid, scores=scores, found=int(found),
                         facet_counts=facets,
                         out_of=int(sum(s.live.sum() for s in self.segs)))


@partial(jax.jit, static_argnums=())
def _range_mask(col, live, lo, hi):
    if col.dtype == jnp.float32:
        return live & (col >= lo) & (col <= hi)
    return live & (col >= jnp.int64(lo)) & (col <= jnp.int64(hi))
