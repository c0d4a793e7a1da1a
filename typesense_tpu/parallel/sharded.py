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
    Fs = max(len(seg.search_fields), 1)
    Ts = max(seg.num_terms, 1)
    src = seg.post_offsets
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
