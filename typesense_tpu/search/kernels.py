"""Jitted query kernels.

The keyword search step is ONE XLA program per static shape signature
(query-token count Q, candidate bucket C, field count F, chunk size S,
top-k K — posting-list LENGTH is dynamic, streamed through fixed chunks
with traced trip counts). It replaces the reference's per-doc iterator loop
(/root/reference/src/index.cpp:5385 search_across_fields +
or_iterator.h:61-182) with two host-selected strategies:

  build_keyword_kernel — scatter every candidate row into dense
      (tokens x fields, docs) membership planes (sequential writes), then
      scan the driver rows with single plane gathers; best for frequent
      driver tokens.
  build_probe_kernel   — binary-search each driver element against every
      candidate row; best when the driver is rare (cost model in
      engine.keyword_search).

Both share _score_and_merge: positions gather + vectorized proximity Match,
Typesense-parity score packing (ops/match.py), 3-slot sort keys, a running
multi-key lax.sort top-K merge, and facet scatter-adds. Nothing returns to
the host except the final top-K rows, found count, and facet counts.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401  (enable x64 before jnp use)
import jax
import jax.numpy as jnp
from jax import lax

from typesense_tpu.ops.match import (
    match_components, pack_field_score, pack_aggregated_score,
)
from typesense_tpu.ops.postings import lower_bound, lower_bound_wide

# module-level scalars are NUMPY (not jnp): an eager jnp scalar lives on
# the TPU and gets captured as a device-array constant in every kernel
# trace — MLIR lowering then blocks on a device->host readback through
# the axon tunnel (measured 190+ s on first lowering). numpy scalars
# lower to inline MLIR constants with zero device traffic.
INT32_INF = np.int32(2**31 - 1)
KEY_MIN = np.int64(-(2**62))

# sort slot kinds (static)
SLOT_TEXT = 0
SLOT_COLUMN = 1
SLOT_SEQ_ID = 2
SLOT_NONE = 3
SLOT_VECTOR = 4  # vector distance (hybrid/vector searches), ascending


def _slot_keys(kind: int, sign: int, text_match, doc_ids, col, vec_dist=None,
               key_ids=None):
    """Build one int64 sort key vector for a slot. Higher key = better.
    doc_ids index per-shard columns (LOCAL ids); key_ids are the ids used as
    sort keys themselves (GLOBAL ids under sharding; defaults to doc_ids)."""
    if key_ids is None:
        key_ids = doc_ids
    if kind == SLOT_TEXT:
        k = text_match  # packed score is non-negative and < 2**63; sign always +1
    elif kind == SLOT_COLUMN:
        safe = jnp.clip(doc_ids, 0, col.shape[0] - 1)
        # clip so negation for descending sort can't overflow int64
        k = jnp.clip(col[safe], -(2**61), 2**61)
    elif kind == SLOT_SEQ_ID:
        k = key_ids.astype(jnp.int64)
    elif kind == SLOT_VECTOR and vec_dist is not None:
        # distances are float in [-1, 2]; scale to preserve order in int64
        k = (vec_dist * jnp.float32(1e9)).astype(jnp.int64)
    else:
        k = jnp.zeros_like(doc_ids, dtype=jnp.int64)
    return k * sign


def topk_merge(keys0, keys1, keys2, doc_ids, valid, k: int):
    """Descending lexicographic top-k on (k0, k1, k2, doc_id) with doc-id
    descending tie-break (topster.h:146-149 KV::is_greater)."""
    nk0 = jnp.where(valid, -keys0, jnp.int64(2**62))
    nk1 = jnp.where(valid, -keys1, jnp.int64(2**62))
    nk2 = jnp.where(valid, -keys2, jnp.int64(2**62))
    nid = jnp.where(valid, -doc_ids.astype(jnp.int64), jnp.int64(2**62))
    s0, s1, s2, sid = lax.sort((nk0, nk1, nk2, nid), num_keys=4)
    take = min(k, keys0.shape[0])
    out_ids = jnp.where(sid[:take] == 2**62, -1, -sid[:take]).astype(jnp.int32)
    pad = k - take
    if pad > 0:
        out_ids = jnp.pad(out_ids, (0, pad), constant_values=-1)
        s0 = jnp.pad(s0[:take], (0, pad), constant_values=2**62)
        s1 = jnp.pad(s1[:take], (0, pad), constant_values=2**62)
        s2 = jnp.pad(s2[:take], (0, pad), constant_values=2**62)
    return -s0[:k], -s1[:k], -s2[:k], out_ids


def pack_query_buf(sc_starts, sc_lens, sc_qf, sc_c, sc_rel0, n_sc,
                   drows_start, drows_cum, n_chunks, drv,
                   cand_starts, cand_costs, token_valid, field_weights):
    """Single host->device upload per query: the tunnel charges per transfer,
    so every small per-query array rides in one int64 buffer."""
    import numpy as np
    return np.concatenate([
        sc_starts.ravel(), sc_lens.ravel(), sc_qf.ravel(), sc_c.ravel(),
        sc_rel0.ravel(),
        np.array([n_sc], dtype=np.int64),
        drows_start.ravel(), drows_cum.ravel(),
        np.array([n_chunks, drv], dtype=np.int64),
        cand_starts.ravel(), cand_costs.ravel(),
        token_valid.astype(np.int64).ravel(), field_weights.ravel(),
    ]).astype(np.int64)


def _score_and_merge(carry, d, m, tc, tok_field, ta, sp, tv,
                     post_flags, pos_offsets, positions, field_token_counts,
                     field_weights, sort_col0, sort_col1, sort_col2,
                     facet_offs, facet_vals,
                     Q, F, S, K, P, slot_kinds, slot_signs, prioritize_exact,
                     prioritize_num_fields, n_facets, facet_caps, facet_sizes,
                     phrase_pairs, gid=None, last_flag_mask=1,
                     match_type: int = 0, prioritize_token_position=False):
    """Shared per-chunk scoring tail: proximity Match + packed text score,
    3-slot sort keys, running top-K merge, facet scatter-add (used by both
    the scatter-plane and probe kernels). gid: GLOBAL doc ids for sort keys
    and result ids under sharding (d stays the local index for gathers).
    last_flag_mask: bit in post_flags marking last-token-of-value (the dense
    kernel's heavy pass passes post_meta with its bit-25 last flag)."""
    if gid is None:
        gid = d
    query_len = jnp.sum(ta & tv, axis=0).astype(jnp.int32)  # (S,)
    dsafe = jnp.clip(d, 0, field_token_counts.shape[0] - 1)

    # when no sort slot reads the text score, skip ALL proximity work
    # (positions gathers + window math) — found/facets/sort keys are
    # unaffected (index.cpp skips Match when sort has no _text_match)
    need_text = SLOT_TEXT in slot_kinds or bool(phrase_pairs)

    best_score = jnp.zeros(S, jnp.int64)
    best_weight = jnp.zeros(S, jnp.int64)
    phrase_ok = jnp.zeros(S, bool) if phrase_pairs else None
    single_token = Q == 1 and not phrase_pairs
    for f in range(F) if need_text else ():
        mf = tok_field[:, f, :]                               # (Q, S) token in field
        gp = jnp.clip(sp[:, f, :], 0, pos_offsets.shape[0] - 2)
        base = pos_offsets[gp]                         # (Q, S) int64
        cnt = pos_offsets[gp + 1] - base
        cnt = jnp.where(mf, cnt, 0)
        if single_token:
            # one query token: proximity is degenerate (wp=1, dist=0,
            # match_score.h single-token path) — skip the position
            # gather entirely, the chunk's HBM hot spot
            wp = jnp.ones(S, jnp.int32)
            dist = jnp.zeros(S, jnp.int32)
            if prioritize_token_position:
                # single-token offset = LAST occurrence position
                # (posting_list_t::get_last_offset)
                lidx = jnp.clip(base + cnt - 1, 0, positions.shape[0] - 1)
                moff = jnp.min(jnp.where(
                    mf, jnp.minimum(positions[lidx], 255), 255),
                    axis=0).astype(jnp.int32)
        else:
            # positions (S, Q, P)
            pidx2 = base[:, :, None] + jnp.arange(P, dtype=jnp.int64)[None, None, :]
            pvalid = jnp.arange(P)[None, None, :] < cnt[:, :, None]
            psafe = jnp.clip(pidx2, 0, positions.shape[0] - 1)
            pos = jnp.where(pvalid, positions[psafe], 0)
            pos = jnp.transpose(pos, (1, 0, 2))        # (S, Q, P)
            pv = jnp.transpose(pvalid, (1, 0, 2))
            wp, dist, moff, banchor = match_components(
                pos, pv, jnp.transpose(mf))

        if phrase_pairs:
            # adjacency within this field: token j at position i+1
            ok_f = jnp.ones(S, bool)
            for (pi, pj) in phrase_pairs:
                a = jnp.where(pv[:, pi, :], pos[:, pi, :], -10)
                bpos = jnp.where(pv[:, pj, :], pos[:, pj, :], -20)
                adj = jnp.any(bpos[:, None, :] == a[:, :, None] + 1,
                              axis=(1, 2))
                ok_f = ok_f & adj
            phrase_ok = phrase_ok | ok_f

        uw = jnp.sum(mf, axis=0).astype(jnp.int32)     # (S,) unique words
        single = uw <= 1
        wp = jnp.where(single, 1, wp)
        dist = jnp.where(single, 0, dist)

        # exact match (match_score.h:242-274)
        flags = post_flags[jnp.clip(sp[:, f, :], 0, post_flags.shape[0] - 1)]
        last_q = ((flags & post_flags.dtype.type(last_flag_mask)) > 0) & mf
        has_last = jnp.any(last_q, axis=0)  # (S,)
        total_off = jnp.sum(jnp.where(mf, cnt, 0), axis=0).astype(jnp.int32)
        ftc = field_token_counts[dsafe, f]
        if prioritize_exact:
            exact_multi = (has_last & (ftc == uw) &
                           (((total_off == uw) & (dist == uw - 1)) | (dist < uw - 1)))
            if not single_token:
                # per-ELEMENT verbatim for array fields (score_results2's
                # element loop + Match exact_match, index.cpp:5351): the
                # winning window's element is fully covered — matched
                # occurrences are exactly offsets 0..n_e-1 and a
                # last-of-value-flagged token sits at n_e-1. OR-ed in:
                # whole-FIELD coverage (ftc == uw) can never fire for a
                # multi-element array.
                from typesense_tpu.index.artifacts import POS_BITS, MAX_POS
                belem = (banchor >> POS_BITS)[:, None, None]
                occ_e = pv & ((pos >> POS_BITS) == belem) & \
                    jnp.transpose(mf)[:, :, None]            # (S, Q, P)
                tok_e = jnp.any(occ_e, axis=2)               # (S, Q)
                n_e = jnp.sum(tok_e, axis=1).astype(jnp.int32)
                total_e = jnp.sum(occ_e, axis=(1, 2)).astype(jnp.int32)
                off_e = jnp.where(occ_e, pos & MAX_POS, -1)
                maxoff_e = jnp.max(jnp.max(off_e, axis=2), axis=1)
                minoff_e = jnp.min(jnp.min(
                    jnp.where(occ_e, pos & MAX_POS, 1 << 30), axis=2),
                    axis=1)
                mo_q = jnp.max(off_e, axis=2)                # (S, Q)
                flag_ok = jnp.any(tok_e & jnp.transpose(last_q) &
                                  (mo_q == (n_e - 1)[:, None]), axis=1)
                exact_elem = ((minoff_e == 0) & (total_e == n_e) &
                              (maxoff_e == n_e - 1) & flag_ok &
                              (n_e == wp) & (dist == n_e - 1))
                exact_multi = exact_multi | exact_elem
            exact_single = (has_last & (ftc == 1) & (tc == 0) &
                            (jnp.sum(tv) == 1))
            exact = jnp.where(single, exact_single, exact_multi).astype(jnp.int32)
        else:
            exact = jnp.zeros(S, jnp.int32)

        if prioritize_token_position:
            off_score = 255 - jnp.clip(moff, 0, 255)
        else:
            off_score = jnp.zeros(S, jnp.int32)
        fs = pack_field_score(wp, uw, tc, dist, exact,
                              off_score, jnp.ones(S, jnp.int32))
        fs = jnp.where(jnp.any(mf, axis=0), fs, 0)
        w64 = field_weights[f].astype(jnp.int64)
        if match_type == 1:      # max_weight: first matching higher-weight field wins
            better = (fs > 0) & (w64 > best_weight)
            best_score = jnp.where(better, fs, best_score)
            best_weight = jnp.where(better, w64, best_weight)
        elif match_type == 2:    # sum_score: weighted sum across fields
            best_score = best_score + w64 * fs
        else:
            better = fs > best_score
            best_weight = jnp.where(better, w64, best_weight)
            best_score = jnp.maximum(best_score, fs)

    if prioritize_num_fields:
        nmf = jnp.sum(jnp.any(tok_field, axis=0), axis=0).astype(jnp.int32)
    else:
        nmf = jnp.zeros(S, jnp.int32)
    ql = jnp.where(best_score > 0, jnp.minimum(query_len, 15), 0)
    text_match = pack_aggregated_score(ql, best_score, best_weight, nmf,
                                       match_type)

    if phrase_pairs:
        m = m & phrase_ok

    k0 = _slot_keys(slot_kinds[0], slot_signs[0], text_match, d, sort_col0,
                    key_ids=gid)
    k1 = _slot_keys(slot_kinds[1], slot_signs[1], text_match, d, sort_col1,
                    key_ids=gid)
    k2 = _slot_keys(slot_kinds[2], slot_signs[2], text_match, d, sort_col2,
                    key_ids=gid)

    t0, t1, t2, tid = topk_merge(k0, k1, k2, gid, m, K)
    r0, r1, r2, rid, fnd, f_acc = carry
    fnd = fnd + jnp.sum(m, dtype=jnp.int64)
    mk0 = jnp.concatenate([r0, t0])
    mk1 = jnp.concatenate([r1, t1])
    mk2 = jnp.concatenate([r2, t2])
    mid = jnp.concatenate([rid, tid])
    r0, r1, r2, rid = topk_merge(mk0, mk1, mk2, mid, mid >= 0, K)

    # facet counting over the chunk's matched docs
    new_f = []
    for fa in range(n_facets):
        offs, vals = facet_offs[fa], facet_vals[fa]
        cap = facet_caps[fa]
        fb = offs[dsafe]
        fcnt = offs[dsafe + 1] - fb
        vidx = fb[:, None] + jnp.arange(cap, dtype=jnp.int64)[None, :]
        vv = (jnp.arange(cap)[None, :] < fcnt[:, None]) & m[:, None]
        vsafe = jnp.clip(vidx, 0, vals.shape[0] - 1)
        fv = jnp.where(vv, vals[vsafe], facet_sizes[fa])
        upd = f_acc[fa].at[fv.reshape(-1)].add(
            vv.reshape(-1).astype(jnp.int32), mode="drop")
        new_f.append(upd)
    return (r0, r1, r2, rid, fnd, tuple(new_f))


@lru_cache(maxsize=512)
def build_keyword_kernel(Q: int, F: int, C: int, SCB: int, SS: int, S: int,
                         CAP: int, SB: int,
                         K: int, P: int, iters: int, slot_kinds: tuple,
                         slot_signs: tuple, prioritize_exact: bool,
                         prioritize_num_fields: bool, n_facets: int,
                         facet_caps: tuple, facet_sizes: tuple,
                         phrase_pairs: tuple = (), exclude_flags: tuple = (),
                         match_type: int = 0,
                         prioritize_token_position: bool = False):
    """Compile-cached keyword search kernel factory — scatter + dynamic scan.

    Two phases inside ONE XLA program, both with DYNAMIC trip counts so a
    single compiled program serves every posting-list length:

      1. SCATTER: every (token, field, candidate) posting row streams through
         fixed-size (SS,) chunks; G chunks at a time scatter-MIN a packed
         uint32 (cand+1)<<25 | row-relative-offset into dense (Q*F, N)
         membership planes. Min-scatter is order-independent, so the phase
         is ~n_sc/G parallel super-steps (the round-1 version looped n_sc
         sequential steps — >1000 for typo queries). uint32 matters: TPU
         int64 scatter-min measures ~9x slower than 32-bit.
      2. DRIVER SCAN: the driver token's rows form ONE logical stream
         (device-side lane -> (row, offset) remap via cumulative row
         lengths), so the chunk count is ceil(total/S) regardless of how
         many (field, candidate) rows the driver has — the round-1 version
         paid >= F*C chunks x ~4.5 ms even for tiny rows. Membership/cost/
         position lookups are single plane gathers; docs are deduped by
         ownership (first driver (field, cand) row containing the doc);
         proximity scoring, filter mask, 3-slot sort keys, running top-K
         merge, facet scatter-add.

    Q: query token count; F: searched fields; C: candidate bucket;
    SCB: scatter chunk-descriptor pad; SS: scatter chunk size; S: driver
    chunk size; K: top-k; P: positions cap.
    phrase_pairs: static (i, j) token index pairs that must be adjacent in
    the same field value (do_phrase_search, index.cpp:5909). exclude_flags:
    per-token `-token` negation (collection.cpp:4544).

    All outputs pack into ONE int64 array [ids K | k0 K | k1 K | k2 K |
    found | facet counts...] — one device->host readback per query.
    """
    @jax.jit
    def kernel(post_doc_ids, post_flags, pos_offsets, positions,
               field_token_counts, filter_mask, qbuf,
               sort_col0, sort_col1, sort_col2, facet_offs, facet_vals):
        return keyword_kernel_body(
            Q, F, C, SCB, SS, S, CAP, SB, K, P, iters, slot_kinds, slot_signs,
            prioritize_exact, prioritize_num_fields, n_facets, facet_caps,
            facet_sizes, phrase_pairs, exclude_flags,
            post_doc_ids, post_flags, pos_offsets, positions,
            field_token_counts, filter_mask, qbuf,
            sort_col0, sort_col1, sort_col2, facet_offs, facet_vals,
            match_type=match_type,
            prioritize_token_position=prioritize_token_position)

    return kernel


def keyword_kernel_body(Q, F, C, SCB, SS, S, CAP, SB, K, P, iters, slot_kinds,
                        slot_signs, prioritize_exact, prioritize_num_fields,
                        n_facets, facet_caps, facet_sizes, phrase_pairs,
                        exclude_flags,
                        post_doc_ids, post_flags, pos_offsets, positions,
                        field_token_counts, filter_mask,
                        qbuf,                           # packed per-query scalars
                        sort_col0, sort_col1, sort_col2,  # (N,) int64 columns (dummies ok)
                        facet_offs, facet_vals,         # tuples of facet CSR arrays
                        doc_base=None,   # (N,) local->GLOBAL doc id (sharded)
                        match_type: int = 0,
                        prioritize_token_position: bool = False):
    """Traceable scatter+scan program shared by the single-chip jit wrapper
    (build_keyword_kernel) and the shard_map'd multi-chip engine
    (parallel/sharded.py), which calls it per shard and merges the packed
    result buffers with ICI collectives."""
    if True:
        exclude = tuple(bool(x) for x in exclude_flags) + \
            (False,) * (Q - len(exclude_flags))
        DR = F * C   # driver stream rows
        # unpack qbuf (layout mirrors pack_query_buf)
        o = 0
        sc_starts = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_lens = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_qf = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_c = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_rel0 = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        n_sc = qbuf[o].astype(jnp.int32); o += 1
        drows_start = qbuf[o:o + DR].astype(jnp.int32); o += DR
        drows_cum = qbuf[o:o + DR + 1].astype(jnp.int32); o += DR + 1
        n_chunks = qbuf[o].astype(jnp.int32); o += 1
        drv = qbuf[o].astype(jnp.int32); o += 1
        cand_starts = qbuf[o:o + Q * F * C].reshape(Q, F, C).astype(jnp.int32)
        o += Q * F * C
        cand_costs = qbuf[o:o + Q * C].reshape(Q, C).astype(jnp.int32); o += Q * C
        token_valid = qbuf[o:o + Q].astype(bool); o += Q
        field_weights = qbuf[o:o + F].astype(jnp.int32); o += F

        N = filter_mask.shape[0]
        excl = jnp.asarray(exclude, bool)[:, None]             # (Q, 1)
        tv = token_valid[:, None] & ~excl                      # include tokens
        tve = token_valid[:, None] & excl                      # exclude tokens

        # ---- phase 1: scatter membership planes ----
        G = max(1, min((1 << 17) // SS, SCB))
        EMPTY32 = jnp.uint32(0xFFFFFFFF)
        ss_lane = jnp.arange(SS, dtype=jnp.int32)

        def scatter_step(i, plane):
            base = lax.dynamic_slice(sc_starts, (i * G,), (G,))
            ln = lax.dynamic_slice(sc_lens, (i * G,), (G,))
            qf = lax.dynamic_slice(sc_qf, (i * G,), (G,))
            c = lax.dynamic_slice(sc_c, (i * G,), (G,))
            rel0 = lax.dynamic_slice(sc_rel0, (i * G,), (G,))
            idx = base[:, None] + ss_lane[None, :]              # (G, SS)
            valid = ss_lane[None, :] < ln[:, None]
            docs = post_doc_ids[jnp.clip(idx, 0, post_doc_ids.shape[0] - 1)]
            flat = jnp.where(valid, qf[:, None] * N + docs,
                             jnp.int32(Q * F * N))              # OOB -> drop
            val = (((c[:, None] + 1) << 25) |
                   (rel0[:, None] + ss_lane[None, :])).astype(jnp.uint32)
            return plane.at[flat.reshape(-1)].min(val.reshape(-1), mode="drop")

        n_steps = (n_sc + G - 1) // G   # dynamic; min-scatter is idempotent,
        # so the clamped re-read of the final partial step is harmless
        plane = lax.fori_loop(0, n_steps, scatter_step,
                              jnp.full((Q * F * N,), EMPTY32, jnp.uint32))
        dense_val = plane.reshape(Q * F, N)

        # ---- phase 2a: MATCH over the driver stream, compact survivors ----
        # The AND-intersection is usually a small fraction of the driver
        # stream; positions/facets/sort-key work (the per-lane HBM hot spots)
        # runs in phase 2b over ONLY the matched docs. This pass is plane
        # gathers + a cumsum-compaction scatter per chunk.
        lane = jnp.arange(S, dtype=jnp.int32)
        total_drv = drows_cum[DR]

        def match_chunk(chunk_i, carry):
            matched, comp = carry
            g = chunk_i * S + lane                             # (S,) global
            in_range = g < total_drv
            # lane -> (row, offset) remap: row = searchsorted(cum, g)
            row = jnp.sum(g[:, None] >= drows_cum[None, 1:],
                          axis=1).astype(jnp.int32)            # (S,) in [0, DR)
            rsafe = jnp.clip(row, 0, DR - 1)
            idx = drows_start[rsafe] + (g - drows_cum[rsafe])
            d = jnp.where(in_range,
                          post_doc_ids[jnp.clip(idx, 0,
                                                post_doc_ids.shape[0] - 1)], 0)

            val = dense_val[:, d].reshape(Q, F, S)             # (Q, F, S)
            member = val != EMPTY32
            cand_id = jnp.where(member,
                                (val >> 25).astype(jnp.int32), 0)
            tok_any = jnp.any(member, axis=1)                  # (Q, S)
            all_match = (jnp.all(tok_any | ~tv, axis=0)
                         & jnp.any(tok_any & tv, axis=0)
                         & ~jnp.any(tok_any & tve, axis=0))

            # ownership: first driver (field, cand) row containing d
            zero = jnp.int32(0)
            drv_cand = lax.dynamic_slice(cand_id, (drv, zero, zero),
                                         (1, F, S))[0]         # (F, S)
            has_f = drv_cand > 0
            first_f = jnp.argmax(has_f, axis=0).astype(jnp.int32)  # (S,)
            f_of_row = rsafe // C                              # (S,)
            c_of_row = rsafe % C
            c_sel = jnp.take_along_axis(drv_cand, f_of_row[None, :],
                                        axis=0)[0]             # (S,)
            own = (first_f == f_of_row) & (c_sel == c_of_row + 1)

            fmask = filter_mask[jnp.clip(d, 0, filter_mask.shape[0] - 1)]
            m = all_match & in_range & own & fmask
            mi = m.astype(jnp.int32)
            out_idx = jnp.where(m, matched + jnp.cumsum(mi) - mi,
                                jnp.int32(CAP))
            comp = comp.at[out_idx].set(d, mode="drop")
            return matched + jnp.sum(mi, dtype=jnp.int32), comp

        matched, comp = lax.fori_loop(
            0, n_chunks, match_chunk,
            (jnp.int32(0), jnp.zeros((CAP,), jnp.int32)))

        # ---- phase 2b: score ONLY the matched docs ----
        lane2 = jnp.arange(SB, dtype=jnp.int32)

        def score_chunk(chunk_i, carry):
            g = chunk_i * SB + lane2
            in_range = g < matched
            d = jnp.where(in_range, comp[jnp.clip(g, 0, CAP - 1)], 0)

            val = dense_val[:, d].reshape(Q, F, SB)            # (Q, F, SB)
            member = val != EMPTY32
            cand_id = jnp.where(member,
                                (val >> 25).astype(jnp.int32), 0)
            rel = (val & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
            row_base = jnp.take_along_axis(
                cand_starts, jnp.clip(cand_id - 1, 0, C - 1), axis=2)
            pidx = row_base + rel
            tok_any = jnp.any(member, axis=1)                  # (Q, SB)
            tok_field = member & ~excl[:, :, None]

            # typo cost of the selected (lowest) candidate per (token, field)
            cc = cand_costs[jnp.arange(Q)[:, None, None],
                            jnp.clip(cand_id - 1, 0, C - 1)]   # (Q, F, SB)
            cc = jnp.where(tok_field, cc, 255)
            min_cost_q = jnp.min(cc, axis=1)                   # (Q, SB)
            tc = jnp.sum(jnp.where(tok_any & tv, min_cost_q, 0), axis=0)

            gid = None if doc_base is None else \
                doc_base[jnp.clip(d, 0, doc_base.shape[0] - 1)]

            return _score_and_merge(
                carry, d, in_range, tc, tok_field, tok_any, pidx, tv,
                post_flags, pos_offsets, positions, field_token_counts,
                field_weights, sort_col0, sort_col1, sort_col2,
                facet_offs, facet_vals,
                Q, F, SB, K, P, slot_kinds, slot_signs, prioritize_exact,
                prioritize_num_fields, n_facets, facet_caps, facet_sizes,
                phrase_pairs, gid=gid, match_type=match_type,
                prioritize_token_position=prioritize_token_position)

        init_f = tuple(jnp.zeros(facet_sizes[fa], jnp.int32) for fa in range(n_facets))
        init = (jnp.full((K,), KEY_MIN), jnp.full((K,), KEY_MIN),
                jnp.full((K,), KEY_MIN), jnp.full((K,), -1, jnp.int32),
                jnp.int64(0), init_f)
        n2 = (matched + SB - 1) // SB
        r0, r1, r2, rid, found_count, f_acc = lax.fori_loop(
            0, n2, score_chunk, init)
        out = [rid.astype(jnp.int64), r0, r1, r2, found_count[None]]
        out.extend(f.astype(jnp.int64) for f in f_acc)
        return jnp.concatenate(out)


def topk_merge2(key0, kpacked, valid, k: int, id_bits: int = 22):
    """Two-key variant of topk_merge for the packed-key fast path: kpacked
    already folds (sort key 1, doc id tie-break) into one int64, so the sort
    runs on half the key material. Returns (k0, kp, ids)."""
    nk0 = jnp.where(valid, -key0, jnp.int64(2**62))
    nkp = jnp.where(valid, -kpacked, jnp.int64(2**62))
    s0, sp = lax.sort((nk0, nkp), num_keys=2)
    take = min(k, key0.shape[0])
    pad = k - take
    s0, sp = s0[:take], sp[:take]
    if pad > 0:
        s0 = jnp.pad(s0, (0, pad), constant_values=2**62)
        sp = jnp.pad(sp, (0, pad), constant_values=2**62)
    kp = -sp
    ids = jnp.where(sp == 2**62, -1,
                    kp & ((1 << id_bits) - 1)).astype(jnp.int32)
    return -s0, kp, ids


PACK2_BIAS = np.int64(1) << 39  # |slot-1 keys| must stay below this

# Whole-N selection switches from direct lax.top_k to BLOCK-MAX selection
# above this corpus size: measured on the axon v5e, ONE int32/int64 top_k
# over 2.2M lanes costs ~3.4 ms of device time while fused elementwise
# N-lane chains are ~free — a per-32-lane block max (elementwise), a top_k
# over N/32 block maxes, and a small pool sort select the same candidates
# EXACTLY for ~0.5 ms. (Proof of exactness in block_stage.)
BLOCK_SELECT_MIN_N = 1 << 18


def _block_params(N: int, KT: int):
    """Static (use_block, BW, NB, PADN) for block-max selection."""
    if N < BLOCK_SELECT_MIN_N:
        return False, 0, 0, 0
    BW = 32 if KT <= 2048 else 8
    NB = (N + BW - 1) // BW
    if NB < KT:
        return False, 0, 0, 0
    return True, BW, NB, NB * BW - N


def block_stage(key, mask, KT: int, N: int, BW: int, NB: int, PADN: int):
    """Exact top-KT stage via block-max selection.

    Returns (cand lanes (2*KT,) int32 with -1 padding, exact KT-th largest
    key value under `mask`, KEY_MIN if fewer than KT).

    Exactness: let t be the true KT-th largest masked element. If an
    element y > t lived in an unselected block, every one of the KT
    selected blocks would have max >= y's block max >= y > t, giving KT
    distinct elements > t — contradicting t's rank. So the pool (all lanes
    of the top-KT blocks by block max) contains every element > t; and
    when >= KT blocks reach max >= t the pool holds >= KT elements >= t,
    pinning the pool's KT-th largest to exactly t (pool is a sub-multiset
    of the masked elements). Ties at t beyond the pool are recovered by
    the NEXT stage's tie mask, exactly as with the direct-top_k stages."""
    km = jnp.where(mask, key, KEY_MIN)
    kp_ = jnp.pad(km, (0, PADN), constant_values=KEY_MIN) if PADN else km
    bm = jnp.max(kp_.reshape(NB, BW), axis=1)
    _, ib = lax.top_k(bm, KT)
    idx = (ib[:, None] * BW +
           jnp.arange(BW, dtype=jnp.int32)[None, :]).reshape(-1)
    ck = kp_[idx]                          # (KT*BW,) distinct lanes
    nidx = jnp.where(ck == KEY_MIN, jnp.int64(2**62), idx.astype(jnp.int64))
    sk, sidx = lax.sort((-ck, nidx), num_keys=2)
    t = -sk[KT - 1]
    take = min(2 * KT, KT * BW)
    cand = jnp.where(sidx[:take] == 2**62, -1, sidx[:take]).astype(jnp.int32)
    if take < 2 * KT:
        cand = jnp.pad(cand, (0, 2 * KT - take), constant_values=-1)
    return cand, t


def cascade_topk(k0, k1, k2, gid, mask, K: int, slot_kinds=None):
    """Whole-corpus exact lexicographic top-K: block-max stages for large N
    (a 4-key lax.sort over 2.2M lanes measures ~100 ms on this chip; the
    cascade does the same selection in ~1 ms), direct topk_merge below
    BLOCK_SELECT_MIN_N. Tie-break by doc id descending, matching topk_merge
    (topster.h:146-149 KV::is_greater)."""
    N = k0.shape[0]
    KT = min(K, N)
    use_block, BW, NB, PADN = _block_params(N, KT)
    if not use_block:
        return topk_merge(k0, k1, k2, gid, mask, K)
    cands = []
    c0, t0 = block_stage(k0, mask, KT, N, BW, NB, PADN)
    cands.append(c0)
    tie = mask & (k0 == t0)
    for i, key in ((1, k1), (2, k2)):
        if slot_kinds is not None and slot_kinds[i] == SLOT_NONE:
            continue  # NONE keys are all zero: universal tie, skip stage
        ci, ti = block_stage(key, tie, KT, N, BW, NB, PADN)
        cands.append(ci)
        tie = tie & (key == ti)
    c3, _ = block_stage(gid.astype(jnp.int64), tie, KT, N, BW, NB, PADN)
    cands.append(c3)
    cand = jnp.concatenate(cands)
    csafe = jnp.clip(cand, 0, N - 1)
    cv = (cand >= 0) & mask[csafe]
    cid = jnp.where(cv, gid[csafe], -1)
    ck0 = jnp.where(cv, k0[csafe], KEY_MIN)
    ck1 = jnp.where(cv, k1[csafe], KEY_MIN)
    ck2 = jnp.where(cv, k2[csafe], KEY_MIN)
    return _dedup_sorted_ids(ck0, ck1, ck2, cid, K)


def pack_dense2_buf(sc_starts, sc_lens, sc_qf, sc_c, n_sc,
                    b_starts, b_lens, b_qf, b_c, n_big,
                    hrow, hcost,
                    cand_starts, cand_ends, cand_costs, token_valid,
                    field_weights, hv_starts=None, hv_lens=None,
                    hv_flag=None):
    """Query buffer for the dense2 kernel: small-row scatter descriptors,
    big-row slice descriptors, head-plane slot assignments, candidate row
    bounds (heavy-doc exact rescore), and the heavy-posting CSR slice
    descriptors (hv_*, per (q, f, c) row)."""
    import numpy as np
    if hv_starts is None:
        hv_starts = np.zeros(cand_starts.size, np.int64)
        hv_lens = np.zeros(cand_starts.size, np.int64)
        hv_flag = np.zeros(cand_starts.size, np.int64)
    return np.concatenate([
        sc_starts.ravel(), sc_lens.ravel(), sc_qf.ravel(), sc_c.ravel(),
        np.array([n_sc], dtype=np.int64),
        b_starts.ravel(), b_lens.ravel(), b_qf.ravel(), b_c.ravel(),
        np.array([n_big], dtype=np.int64),
        hrow.ravel(), hcost.ravel(),
        cand_starts.ravel(), cand_ends.ravel(), cand_costs.ravel(),
        token_valid.astype(np.int64).ravel(), field_weights.ravel(),
        hv_starts.ravel(), hv_lens.ravel(), hv_flag.ravel(),
        np.array([2**62], dtype=np.int64),   # h_cursor (heavy-out paging:
        # eligibility is gid < cursor; ids return descending)
    ]).astype(np.int64)


# A-word bit layout (artifacts.pack_post_meta_ab_device)
MA_CNT_SHIFT = 21
MA_LAST_SHIFT = 23
MA_HEAVY_SHIFT = 24
MA_COST_SHIFT = 25
MA_EMPTY = np.int32(2**31 - 1)


def _dedup_sorted_ids(k0, k1, k2, ids, K):
    """Sort candidate tuples descending, drop duplicate ids (duplicates have
    identical keys so they sort adjacent), return top-K columns + ids."""
    nk0 = jnp.where(ids >= 0, -k0, jnp.int64(2**62))
    nk1 = jnp.where(ids >= 0, -k1, jnp.int64(2**62))
    nk2 = jnp.where(ids >= 0, -k2, jnp.int64(2**62))
    nid = jnp.where(ids >= 0, -ids.astype(jnp.int64), jnp.int64(2**62))
    s0, s1, s2, sid = lax.sort((nk0, nk1, nk2, nid), num_keys=4)
    dup = jnp.concatenate([jnp.zeros(1, bool), sid[1:] == sid[:-1]]) & \
        (sid != 2**62)
    s0 = jnp.where(dup, jnp.int64(2**62), s0)
    s1 = jnp.where(dup, jnp.int64(2**62), s1)
    s2 = jnp.where(dup, jnp.int64(2**62), s2)
    sid = jnp.where(dup, jnp.int64(2**62), sid)
    s0, s1, s2, sid = lax.sort((s0, s1, s2, sid), num_keys=4)
    take = min(K, s0.shape[0])
    out_ids = jnp.where(sid[:take] == 2**62, -1,
                        -sid[:take]).astype(jnp.int32)
    pad = K - take
    if pad > 0:
        out_ids = jnp.pad(out_ids, (0, pad), constant_values=-1)
        s0 = jnp.pad(s0[:take], (0, pad), constant_values=2**62)
        s1 = jnp.pad(s1[:take], (0, pad), constant_values=2**62)
        s2 = jnp.pad(s2[:take], (0, pad), constant_values=2**62)
    return -s0[:K], -s1[:K], -s2[:K], out_ids


@lru_cache(maxsize=512)
def build_dense2_kernel(Q: int, F: int, C: int, HPF: int, SCB: int,
                        SCBB: int, SSB: int, K: int, HC: int, P: int,
                        iters: int, slot_kinds: tuple, slot_signs: tuple,
                        prioritize_exact: bool, prioritize_num_fields: bool,
                        n_facets: int, facet_sizes: tuple,
                        exclude_flags: tuple, N: int, pack2: bool,
                        match_type: int = 0,
                        prioritize_token_position: bool = False,
                        CAP_H: int = 1024, CAP_M: int = 0,
                        field_is_array: tuple = (), heavy_out: bool = False):
    """Dense whole-corpus keyword kernel — the TPU-native path for
    high-volume queries (common tokens, large intersections).

    Design (replaces the round-2 chunked dense kernel, whose per-chunk
    multi-key lax.sort and 5%-of-docs CSR heavy pass measured ~260 ms for a
    two-common-token query at 2.2M docs):

      1. HEAD PLANES: the highest-volume posting rows are pre-densified at
         index build (artifacts.build_head_planes) — the kernel reads them
         as sequential (N,) slices instead of scattering millions of
         postings per query. Only mid-size candidate rows still scatter
         (small descriptors gather-scatter; big descriptors stream
         contiguous slices).
      2. FUSED WHOLE-N SCAN: one un-chunked pass over all N docs computes
         membership, typo costs, and the packed text score from meta64's
         four positions per posting (ops/match.match_components_p4) — no
         positions-CSR gathers, no chunk loop.
      3. EXACT TOP-K WITHOUT SORT: lax.top_k is ~RTT-free on TPU where a
         262K-lane 2-key lax.sort costs ~8 ms. The lexicographic
         (k0, k1, k2, id) order is selected exactly by a cascade of top_k
         passes — each stage masks to the ties of the previous stage's K-th
         value — then a tiny candidate sort assembles the final K
         (duplicates removed by adjacent-id masking). With pack2 (small
         slot-1 keys, id fits 22 bits) the cascade is two stages.
      4. HEAVY RESCORE: meta64 covers up to four occurrences per
         (token, field) posting, so docs needing CSR-exact rescoring are
         rare (~0.04% at 2.2M). A while_loop walks them in descending-id
         batches of HC via top_k selection (no compaction scatter),
         rescoring through the shared _score_and_merge tail.
      5. FACETS: single-value facet fields count via fused one-hot
         reduction over the dense value column — no scatter, no matched-id
         compaction. (Multi-value / high-cardinality facet fields route to
         the scatter kernel in the engine.)

    Replaces: or_iterator intersection + topster merge
    (/root/reference/src/index.cpp:5385, or_iterator.h:61-182,
    include/topster.h).
    """
    @jax.jit
    def kernel(post_doc_ids, post_meta, pos_offsets, positions,
               field_token_counts, head_a, head_b, filter_mask, qbuf,
               sort_col0, sort_col1, sort_col2, facet_cols, doc_base=None,
               heavy_ids=None, cache_a=None, cache_b=None):
        return dense2_kernel_body(
            Q, F, C, HPF, SCB, SCBB, SSB, K, HC, P, iters, slot_kinds,
            slot_signs, prioritize_exact, prioritize_num_fields, n_facets,
            facet_sizes, exclude_flags, N, pack2, match_type,
            prioritize_token_position,
            post_doc_ids, post_meta, pos_offsets, positions,
            field_token_counts, head_a, head_b, filter_mask, qbuf,
            sort_col0, sort_col1, sort_col2, facet_cols, doc_base=doc_base,
            heavy_ids=heavy_ids, CAP_H=CAP_H, CAP_M=CAP_M,
            field_is_array=field_is_array, heavy_out=heavy_out,
            cache_a=cache_a, cache_b=cache_b)

    return kernel


def build_dense2_batched_kernel(Q: int, F: int, C: int, HPF: int, SCB: int,
                                SCBB: int, SSB: int, K: int, HC: int,
                                P: int, iters: int, slot_kinds: tuple,
                                slot_signs: tuple, prioritize_exact: bool,
                                prioritize_num_fields: bool, n_facets: int,
                                facet_sizes: tuple, exclude_flags: tuple,
                                N: int, pack2: bool, match_type: int = 0,
                                prioritize_token_position: bool = False,
                                CAP_H: int = 1024, CAP_M: int = 0,
                                field_is_array: tuple = (),
                                heavy_out: bool = False):
    """Batched dense2: B same-signature queries vmapped over the query
    buffer in ONE whole-corpus program. The index planes (head planes,
    postings, sort/facet columns, filter mask) are shared across the batch,
    so their HBM reads amortize B-fold — on this rig the plane passes are
    latency/bandwidth-bound at ~7-20 GB/s while per-lane compute is nearly
    free, making a batch of B cost far less than B serial dispatches
    (SURVEY §2.4: the reference fans a query across vCPUs,
    /root/reference/src/index.cpp:6653-6655; on TPU concurrent queries are
    just another batch dimension). qbufs has a leading batch dim; the
    result is the stacked per-query packed buffer."""
    @jax.jit
    def kernel(post_doc_ids, post_meta, pos_offsets, positions,
               field_token_counts, head_a, head_b, filter_mask, qbufs,
               sort_col0, sort_col1, sort_col2, facet_cols,
               heavy_ids=None, cache_a=None, cache_b=None):
        def one(qbuf):
            return dense2_kernel_body(
                Q, F, C, HPF, SCB, SCBB, SSB, K, HC, P, iters, slot_kinds,
                slot_signs, prioritize_exact, prioritize_num_fields,
                n_facets, facet_sizes, exclude_flags, N, pack2, match_type,
                prioritize_token_position,
                post_doc_ids, post_meta, pos_offsets, positions,
                field_token_counts, head_a, head_b, filter_mask, qbuf,
                sort_col0, sort_col1, sort_col2, facet_cols,
                heavy_ids=heavy_ids, CAP_H=CAP_H, CAP_M=CAP_M,
                field_is_array=field_is_array, heavy_out=heavy_out,
                cache_a=cache_a, cache_b=cache_b)
        return jax.vmap(one)(qbufs)

    return kernel


def dense2_kernel_body(Q, F, C, HPF, SCB, SCBB, SSB, K, HC, P, iters,  # noqa: C901
                       slot_kinds, slot_signs, prioritize_exact,
                       prioritize_num_fields, n_facets, facet_sizes,
                       exclude_flags, N, pack2, match_type,
                       prioritize_token_position,
                       post_doc_ids, post_meta, pos_offsets, positions,
                       field_token_counts, head_a, head_b, filter_mask,
                       qbuf, sort_col0, sort_col1, sort_col2, facet_cols,
                       doc_base=None, heavy_ids=None, CAP_H: int = 1024,
                       CAP_M: int = 0, field_is_array: tuple = (),
                       heavy_out: bool = False, cache_a=None, cache_b=None):
    """Traceable dense2 program shared by the single-chip jit wrapper
    (build_dense2_kernel) and the shard_map'd multi-chip engine
    (parallel/sharded.py), which calls it per doc shard and merges the
    packed result buffers with ICI collectives.

    cache_a/cache_b: the query's PRIVATE plane buffer — (n, NP) int32
    pairs holding the runtime-cache rows this query needs, gathered by the
    engine right before dispatch (artifacts.make_plane_gather; group
    selection is host-side — an in-kernel lax.switch over group operands
    pushed XLA compiles past 19 minutes). The backing cache itself lives
    in small (g, NP) groups because this backend's buffer donation does
    not alias: a donated row write into one monolithic (H+E, NP) pair
    copied the whole ~4.8 GB cache (~25 ms/insert); per-group copies cost
    ~0.2 ms. hrow values >= head_a.shape[0] index cache_a/cache_b by
    position."""
    exclude = tuple(bool(x) for x in exclude_flags) + \
        (False,) * (Q - len(exclude_flags))
    has_scatter = SCB > 0 or SCBB > 0
    need_text = SLOT_TEXT in slot_kinds
    ptp = prioritize_token_position
    # profiling-only component toggles (TS_PROF_SKIP=a,b,...) — read at
    # trace time; callers must build_dense2_kernel.cache_clear() after
    # changing. NEVER set in production (alters scoring).
    import os as _prof_os
    _skip = set(_prof_os.environ.get("TS_PROF_SKIP", "").split(","))
    # token-position scoring reads offsets even for single-token queries,
    # so heavy docs (meta can't hold all positions) must rescore then too
    need_heavy = need_text and (Q > 1 or ptp) and "heavy" not in _skip
    HSLOTS = Q * F * HPF
    if True:
        o = 0
        sc_starts = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_lens = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_qf = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        sc_c = qbuf[o:o + SCB].astype(jnp.int32); o += SCB
        n_sc = qbuf[o].astype(jnp.int32); o += 1
        b_starts = qbuf[o:o + SCBB].astype(jnp.int32); o += SCBB
        b_lens = qbuf[o:o + SCBB].astype(jnp.int32); o += SCBB
        b_qf = qbuf[o:o + SCBB].astype(jnp.int32); o += SCBB
        b_c = qbuf[o:o + SCBB].astype(jnp.int32); o += SCBB
        n_big = qbuf[o].astype(jnp.int32); o += 1
        hrow = qbuf[o:o + HSLOTS].astype(jnp.int32); o += HSLOTS
        hcost = qbuf[o:o + HSLOTS]; o += HSLOTS
        cand_starts = qbuf[o:o + Q * F * C].reshape(Q, F, C).astype(jnp.int32)
        o += Q * F * C
        cand_ends = qbuf[o:o + Q * F * C].reshape(Q, F, C).astype(jnp.int32)
        o += Q * F * C
        cand_costs = qbuf[o:o + Q * C].reshape(Q, C).astype(jnp.int32)
        o += Q * C
        token_valid = qbuf[o:o + Q].astype(bool); o += Q
        field_weights = qbuf[o:o + F].astype(jnp.int32); o += F
        HV = Q * F * C
        hv_starts = qbuf[o:o + HV].astype(jnp.int32); o += HV
        hv_lens = qbuf[o:o + HV].astype(jnp.int32); o += HV
        hv_flag = qbuf[o:o + HV].astype(jnp.int32); o += HV
        h_cursor = qbuf[o]; o += 1    # heavy-out paging cursor (gid <)

        excl = jnp.asarray(exclude, bool)[:, None]             # (Q, 1)
        tv = token_valid[:, None] & ~excl
        tve = token_valid[:, None] & excl
        # scatter path carries the 4-bit meta32 cost field; head planes get
        # the 6-bit meta64 field
        cc_flat = jnp.minimum(cand_costs, 14).reshape(-1)      # (Q*C,)

        # ---- phase 1: scatter mid-size rows into meta32 planes ----
        # uint32 scatter-min: TPU int64 scatter measures ~9x slower, so the
        # per-query path scatters the 2-position meta32 packing and the scan
        # converts winning cells to meta64 form (docs with >2 occurrences of
        # a scattered token go through the heavy rescore, exactly as before)
        EMPTY32 = jnp.uint32(0xFFFFFFFF)
        if has_scatter:
            SS = 2048
            G = max(1, min((1 << 15) // SS, max(SCB, 1)))
            ss_lane = jnp.arange(SS, dtype=jnp.int32)

            def scatter_step(i, plane):
                base = lax.dynamic_slice(sc_starts, (i * G,), (G,))
                ln = lax.dynamic_slice(sc_lens, (i * G,), (G,))
                qf = lax.dynamic_slice(sc_qf, (i * G,), (G,))
                c = lax.dynamic_slice(sc_c, (i * G,), (G,))
                idx = base[:, None] + ss_lane[None, :]         # (G, SS)
                valid = ss_lane[None, :] < ln[:, None]
                safe = jnp.clip(idx, 0, post_doc_ids.shape[0] - 1)
                docs = post_doc_ids[safe]
                meta = post_meta[safe]
                q = qf // F
                cost = cc_flat[jnp.clip(q * C + c, 0, Q * C - 1)]
                val = (cost.astype(jnp.uint32)[:, None] << 28) | meta
                flat = jnp.where(valid, qf[:, None] * N + docs,
                                 jnp.int32(Q * F * N))
                return plane.at[flat.reshape(-1)].min(val.reshape(-1),
                                                      mode="drop")

            plane = jnp.full((Q * F * N,), EMPTY32, jnp.uint32)
            if SCB > 0:
                n_steps = (n_sc + G - 1) // G
                plane = lax.fori_loop(0, n_steps, scatter_step, plane)

            if SCBB > 0:
                blane = jnp.arange(SSB, dtype=jnp.int32)
                P_total = post_doc_ids.shape[0]

                def big_step(i, plane):
                    start = b_starts[i]
                    blen = b_lens[i]
                    actual = jnp.clip(start, 0, max(P_total - SSB, 0))
                    off = start - actual
                    docs = lax.dynamic_slice(post_doc_ids, (actual,), (SSB,))
                    meta = lax.dynamic_slice(post_meta, (actual,), (SSB,))
                    valid = (blane >= off) & (blane < off + blen)
                    q = b_qf[i] // F
                    cost = cc_flat[jnp.clip(q * C + b_c[i], 0, Q * C - 1)]
                    val = (cost.astype(jnp.uint32) << 28) | meta
                    flat = jnp.where(valid, b_qf[i] * N + docs,
                                     jnp.int32(Q * F * N))
                    return plane.at[flat].min(val, mode="drop")

                plane = lax.fori_loop(0, n_big, big_step, plane)
            plane2d = plane.reshape(Q * F, N)

        # ---- phase 2: fused whole-N scan over A/B word planes ----
        # A carries cost/heavy/last/cnt/pos0 (everything membership and
        # ranking prefilters need); B carries pos1/pos2 and is only read
        # when proximity actually matters (multi-token text-scored query)
        need_pos = need_text and (Q > 1 or ptp)
        va_list, vb_list = [], []
        H_rows = head_a.shape[0]
        HW = head_a.shape[1]
        for qf in range(Q * F):
            if has_scatter:
                m32 = plane2d[qf]
                sc_ok = m32 != EMPTY32
                a32 = ((m32 & jnp.uint32(0xFFF)).astype(jnp.int32)
                       | (((m32 >> 24) & 1).astype(jnp.int32)
                          << MA_CNT_SHIFT)
                       | (((m32 >> 25) & 1).astype(jnp.int32)
                          << MA_LAST_SHIFT)
                       | (((m32 >> 26) & 1).astype(jnp.int32)
                          << MA_HEAVY_SHIFT)
                       | ((m32 >> 28).astype(jnp.int32) << MA_COST_SHIFT))
                va = jnp.where(sc_ok, a32, MA_EMPTY)
                vb = jnp.where(sc_ok,
                               ((m32 >> 12) & jnp.uint32(0xFFF)).astype(
                                   jnp.int32), 0) if need_pos else None
            else:
                va = jnp.full((N,), MA_EMPTY, jnp.int32)
                vb = jnp.zeros((N,), jnp.int32) if need_pos else None
            for s in range(HPF):
                slot = qf * HPF + s
                row = hrow[slot]
                rsafe = jnp.clip(row, 0, H_rows - 1)
                ha = lax.dynamic_slice(head_a, (rsafe, jnp.int32(0)),
                                       (1, HW))[0][:N]
                if cache_a is not None:
                    # hrow values >= H_rows index the per-query plane
                    # buffer (engine gathered the needed runtime-cache
                    # rows into a private (n, NP) pair before dispatch —
                    # host-side group resolution, no control flow here)
                    QW = cache_a.shape[0]
                    crow = jnp.clip(row - H_rows, 0, QW - 1)
                    ca = lax.dynamic_slice(
                        cache_a, (crow, jnp.int32(0)),
                        (1, cache_a.shape[1]))[0][:N]
                    ha = jnp.where(row >= H_rows, ca, ha)
                ha = jnp.where(
                    (row >= 0) & (ha != MA_EMPTY),
                    ha | (hcost[slot].astype(jnp.int32) << MA_COST_SHIFT),
                    MA_EMPTY)
                take = ha < va
                if need_pos:
                    hb = lax.dynamic_slice(head_b, (rsafe, jnp.int32(0)),
                                           (1, HW))[0][:N]
                    if cache_b is not None:
                        cb = lax.dynamic_slice(
                            cache_b, (crow, jnp.int32(0)),
                            (1, cache_b.shape[1]))[0][:N]
                        hb = jnp.where(row >= H_rows, cb, hb)
                    vb = jnp.where(take, hb, vb)
                va = jnp.minimum(va, ha)
            va_list.append(va)
            vb_list.append(vb)
        va = jnp.stack(va_list).reshape(Q, F, N)
        vb = jnp.stack(vb_list).reshape(Q, F, N) if need_pos else None

        member = va != MA_EMPTY
        inc_member = member & ~excl[:, :, None]
        tok_any = jnp.any(member, axis=1)                      # (Q, N)
        all_match = (jnp.all(tok_any | ~tv, axis=0)
                     & jnp.any(tok_any & tv, axis=0)
                     & ~jnp.any(tok_any & tve, axis=0))
        m = all_match & filter_mask
        if need_heavy:
            heavy = jnp.any(
                inc_member & ((va >> MA_HEAVY_SHIFT) & 1).astype(bool),
                axis=(0, 1))
            m_light = m & ~heavy
        else:
            m_light = m

        costs_qf = jnp.where(
            inc_member, (va >> MA_COST_SHIFT) & 63, 255)
        min_cost_q = jnp.min(costs_qf, axis=1)                 # (Q, N)
        tc = jnp.sum(jnp.where(tok_any & tv, min_cost_q, 0), axis=0)
        query_len = jnp.sum(tok_any & tv, axis=0).astype(jnp.int32)

        # upper-bound text score for heavy docs (best possible proximity):
        # used to SKIP the exact CSR rescore for heavy docs that provably
        # cannot reach the stage-1 threshold (the rescore loop measured
        # ~6.6 ms of a 19.6 ms 2-token query before this gate)
        need_ub = need_heavy and slot_kinds[0] == SLOT_TEXT and \
            "ub" not in _skip

        fia = tuple(bool(x) for x in field_is_array) + \
            (True,) * (F - len(field_is_array))

        def field_comp(f, va_l, vb_l, incm_l, tc_l, ftc_l):
            """Per-field Match components for L lanes (all int32):
            (wp, uw, dist, exact, any_mf, moff)."""
            L = va_l.shape[-1]
            from typesense_tpu.ops.match import (INF as MATCH_INF,
                                                 match_components_p4)
            mf = incm_l[:, f]                              # (Q, L)
            cntf = ((va_l[:, f] >> MA_CNT_SHIFT) & 3) + 1
            uw = jnp.sum(mf, axis=0).astype(jnp.int32)
            single = uw <= 1
            moff = jnp.zeros(L, jnp.int32)
            if Q == 1:
                wp = jnp.ones(L, jnp.int32)
                dist = jnp.zeros(L, jnp.int32)
                if ptp:
                    # last occurrence from the meta positions
                    # (cnt > 3 is heavy -> exact rescore)
                    p0 = va_l[0, f] & 0xFFF
                    p1 = vb_l[0, f] & 0xFFF
                    p2 = (vb_l[0, f] >> 12) & 0xFFF
                    last = jnp.where(cntf[0] > 2, p2,
                                     jnp.where(cntf[0] > 1, p1, p0))
                    moff = jnp.where(mf[0], jnp.minimum(last, 255), 0)
            else:
                pos = [[jnp.where(mf[q], va_l[q, f] & 0xFFF, MATCH_INF),
                        jnp.where(mf[q] & (cntf[q] > 1),
                                  vb_l[q, f] & 0xFFF, MATCH_INF),
                        jnp.where(mf[q] & (cntf[q] > 2),
                                  (vb_l[q, f] >> 12) & 0xFFF, MATCH_INF)]
                       for q in range(Q)]
                if "prox" in _skip:
                    wp, dist = uw, jnp.zeros(L, jnp.int32)
                elif ptp:
                    wp, dist, moff = match_components_p4(
                        pos, want_offset=True)
                else:
                    wp, dist = match_components_p4(pos)
                wp = jnp.where(single, 1, wp)
                dist = jnp.where(single, 0, dist)
            total_off = jnp.sum(jnp.where(mf, cntf, 0),
                                axis=0).astype(jnp.int32)
            has_last = jnp.any(
                mf & ((va_l[:, f] >> MA_LAST_SHIFT) & 1).astype(bool),
                axis=0)
            ftc_f = ftc_l[:, f]
            if prioritize_exact and "exact" not in _skip:
                exact_multi = (has_last & (ftc_f == uw) &
                               (((total_off == uw) & (dist == uw - 1)) |
                                (dist < uw - 1)))
                if Q > 1 and fia[f] and "exact_elem" not in _skip:
                    # per-ELEMENT verbatim, ARRAY fields only (single-value
                    # fields: the element IS the field, and full coverage
                    # there implies ftc == uw with a last flag at uw-1 —
                    # already exact_multi). Reference: score_results2
                    # element loop + Match exact_match, index.cpp:5351.
                    # Some element whose matched occurrences are exactly
                    # offsets 0..n_e-1 with a last-of-value token at n_e-1.
                    # Meta positions are (elem:5 << 7 | off:7); anchors =
                    # occurrences at local offset 0. Heavy docs (>3
                    # positions) take the CSR rescore, same rule.
                    lastq = [mf[q] & ((va_l[q, f] >> MA_LAST_SHIFT) & 1)
                             .astype(bool) for q in range(Q)]
                    exact_elem = jnp.zeros(L, bool)
                    for qa in range(Q):
                        for ka in range(3):
                            pa = pos[qa][ka]
                            aok = (pa < MATCH_INF) & ((pa & 127) == 0)
                            e = pa >> 7
                            per_q = []
                            for q in range(Q):
                                inn = [(pos[q][k] < MATCH_INF) &
                                       ((pos[q][k] >> 7) == e)
                                       for k in range(3)]
                                any_in = inn[0] | inn[1] | inn[2]
                                cnt_in = (inn[0].astype(jnp.int32) +
                                          inn[1].astype(jnp.int32) +
                                          inn[2].astype(jnp.int32))
                                moq = jnp.maximum(
                                    jnp.maximum(
                                        jnp.where(inn[0],
                                                  pos[q][0] & 127, -1),
                                        jnp.where(inn[1],
                                                  pos[q][1] & 127, -1)),
                                    jnp.where(inn[2],
                                              pos[q][2] & 127, -1))
                                per_q.append((any_in, cnt_in, moq))
                            n_e = sum(a.astype(jnp.int32)
                                      for a, _, _ in per_q)
                            tot = sum(cq for _, cq, _ in per_q)
                            mx = per_q[0][2]
                            for _, _, moq in per_q[1:]:
                                mx = jnp.maximum(mx, moq)
                            fok = jnp.zeros(L, bool)
                            for q in range(Q):
                                a_in, _, moq = per_q[q]
                                fok = fok | (lastq[q] & a_in &
                                             (moq == n_e - 1))
                            # the covering element must BE the winning
                            # window (the reference maxes full packed
                            # per-element scores — a fully-covered
                            # 1-token element loses to a 2-word window
                            # elsewhere and must not donate its bit)
                            exact_elem = exact_elem | (
                                aok & (tot == n_e) & (mx == n_e - 1) &
                                fok & (n_e == wp) & (dist == n_e - 1))
                    exact_multi = exact_multi | exact_elem
                exact_single = (has_last & (ftc_f == 1) & (tc_l == 0) &
                                (jnp.sum(tv) == 1))
                exact = jnp.where(single, exact_single,
                                  exact_multi).astype(jnp.int32)
            else:
                exact = jnp.zeros(L, jnp.int32)
            any_mf = jnp.any(mf, axis=0)
            return wp, uw, dist, exact, any_mf, moff

        def text_score_lanes(va_l, vb_l, incm_l, tc_l, qlen_l, ftc_l):
            """Packed int64 text_match (+ ub when need_heavy) for L lanes.
            va_l/vb_l (Q, F, L), incm_l (Q, F, L) bool, tc_l/qlen_l (L,),
            ftc_l (L, F). L is N (whole-corpus), CAP_M (compacted matched
            lanes), or the cascade candidate pool — identical math."""
            L = va_l.shape[-1]
            best_score = jnp.zeros(L, jnp.int64)
            best_weight = jnp.zeros(L, jnp.int64)
            best_ub = jnp.zeros(L, jnp.int64)
            for f in range(F):
                wp, uw, dist, exact, any_mf, moff = field_comp(
                    f, va_l, vb_l, incm_l, tc_l, ftc_l)
                off_sc = (255 - jnp.clip(moff, 0, 255)) if ptp else \
                    jnp.zeros(L, jnp.int32)
                fs = pack_field_score(wp, uw, tc_l, dist, exact,
                                      off_sc, jnp.ones(L, jnp.int32))
                fs = jnp.where(any_mf, fs, 0)
                w64 = field_weights[f].astype(jnp.int64)
                if need_ub:
                    # best window with uw words has dist >= uw - 1
                    fs_ub = pack_field_score(
                        uw, uw, tc_l, jnp.clip(uw - 1, 0, 100),
                        jnp.full(L, 1 if prioritize_exact else 0,
                                 jnp.int32),
                        jnp.full(L, 255 if ptp else 0, jnp.int32),
                        jnp.ones(L, jnp.int32))
                    fs_ub = jnp.where(any_mf, fs_ub, 0)
                if match_type == 1:
                    better = (fs > 0) & (w64 > best_weight)
                    best_score = jnp.where(better, fs, best_score)
                    best_weight = jnp.where(better, w64, best_weight)
                    if need_ub:
                        best_ub = jnp.where(better, fs_ub, best_ub)
                elif match_type == 2:
                    best_score = best_score + w64 * fs
                    if need_ub:
                        best_ub = best_ub + w64 * fs_ub
                else:
                    better = fs > best_score
                    best_weight = jnp.where(better, w64, best_weight)
                    best_score = jnp.maximum(best_score, fs)
                    if need_ub:
                        best_ub = jnp.maximum(best_ub, fs_ub)
            if prioritize_num_fields:
                nmf = jnp.sum(jnp.any(incm_l, axis=0),
                              axis=0).astype(jnp.int32)
            else:
                nmf = jnp.zeros(L, jnp.int32)
            ql = jnp.where(best_score > 0, jnp.minimum(qlen_l, 15), 0)
            tm = pack_aggregated_score(ql, best_score, best_weight,
                                       nmf, match_type)
            if need_ub:
                # weight/nmf forced to max so ub >= any exact packing
                ub = pack_aggregated_score(
                    ql, best_ub, jnp.full(L, 127, jnp.int64),
                    jnp.full(L, 7, jnp.int32), match_type)
            else:
                ub = None
            return tm, ub

        def text_keys32(va_l, vb_l, incm_l, tc_l, qlen_l, ftc_l):
            """int32 selection keys, order-equivalent to the int64 packed
            text_match (khi, klo lexicographic == pack_aggregated_score
            order). The whole-N scoring chain runs ENTIRELY in int32 — the
            int64 packing (2x VPU cost per op on this chip) happens later,
            on the few-thousand-lane candidate pool only.

            Layouts (match_type 0 / max_score):
              khi = ql(4b) << 24 | wp(4b) << 20 | uw(4b) << 16 |
                    (255-tc)(8b) << 8 | (100-dist)(7b) << 1 | ex(1b)
              klo = weight(7b) << 3 | nmf(3b)
            (match_type 1 / max_weight):
              khi = ql(4b) << 7 | weight(7b)
              klo = fs32(24b) << 3 | nmf(3b)
            Valid because wp/uw <= Q <= 10 < 16, weight <= 15 (collection
            FIELD_MAX_WEIGHT), dist/tc clipped exactly as the int64 pack,
            and off/syn are constants when not ptp (fast32 excludes ptp).
            Returns (khi, klo, ub_khi) — ub_khi is the best-possible-
            proximity upper bound used to gate the heavy CSR rescore."""
            L = va_l.shape[-1]
            best32 = jnp.zeros(L, jnp.int32)
            bw32 = jnp.zeros(L, jnp.int32)
            bub32 = jnp.zeros(L, jnp.int32)
            bwub32 = jnp.zeros(L, jnp.int32)
            tc32 = jnp.clip(255 - tc_l, 0, 255)
            for f in range(F):
                wp, uw, dist, exact, any_mf, _ = field_comp(
                    f, va_l, vb_l, incm_l, tc_l, ftc_l)
                fs32 = ((jnp.clip(wp, 0, 15) << 20)
                        | (jnp.clip(uw, 0, 15) << 16)
                        | (tc32 << 8)
                        | ((100 - jnp.clip(dist, 0, 100)) << 1) | exact)
                fs32 = jnp.where(any_mf, fs32, 0)
                w32 = field_weights[f]
                if need_ub:
                    # TIGHT per-doc upper bound: the best window with
                    # wp == uw words has dist == uw - 1 (adjacent), not 0 —
                    # an optimistic dist of 0 lifted EVERY tie-heavy doc
                    # strictly above the stage threshold and the heavy-out
                    # tuple gate never reached the k1 tie-break (measured
                    # nh 537 vs the handful the gate is meant to keep)
                    ubf = ((jnp.clip(uw, 0, 15) << 20)
                           | (jnp.clip(uw, 0, 15) << 16)
                           | (tc32 << 8)
                           | ((100 - jnp.clip(uw - 1, 0, 100)) << 1)
                           | (1 if prioritize_exact else 0))
                    ubf = jnp.where(any_mf, ubf, 0)
                if match_type == 1:
                    better = (fs32 > 0) & (w32 > bw32)
                    best32 = jnp.where(better, fs32, best32)
                    bw32 = jnp.where(better, w32, bw32)
                    if need_ub:
                        bub32 = jnp.where(better, ubf, bub32)
                else:
                    better = fs32 > best32
                    bw32 = jnp.where(better, w32, bw32)
                    best32 = jnp.maximum(best32, fs32)
                    if need_ub:
                        bub32 = jnp.maximum(bub32, ubf)
                if need_ub:
                    # the winning field's weight can't exceed the max
                    # weight among fields the doc matched — exact, so klo
                    # ties resolve through to the k1/k2 comparison
                    bwub32 = jnp.maximum(bwub32,
                                         jnp.where(any_mf, w32, 0))
            if prioritize_num_fields:
                nmf = jnp.sum(jnp.any(incm_l, axis=0),
                              axis=0).astype(jnp.int32)
                nmf = jnp.clip(nmf, 0, 7)
            else:
                nmf = jnp.zeros(L, jnp.int32)
            ql = jnp.where(best32 > 0, jnp.minimum(qlen_l, 15), 0)
            if match_type == 1:
                khi = (ql << 7) | jnp.clip(bw32, 0, 127)
                klo = (best32 << 3) | nmf
                ub_khi = (jnp.where(bub32 > 0, jnp.minimum(qlen_l, 15), 0)
                          << 7) | jnp.clip(bwub32, 0, 127) \
                    if need_ub else None
                ub_klo = (bub32 << 3) | nmf if need_ub else None
            else:
                khi = (ql << 24) | best32
                klo = (jnp.clip(bw32, 0, 127) << 3) | nmf
                ub_khi = ((jnp.where(bub32 > 0, jnp.minimum(qlen_l, 15), 0)
                           << 24) | bub32) if need_ub else None
                ub_klo = ((jnp.clip(bwub32, 0, 127) << 3) | nmf) \
                    if need_ub else None
            return khi, klo, ub_khi, ub_klo

        # MATCHED-LANE COMPACTION: proximity + int64 packing are the VPU
        # bottleneck of this kernel (measured ~15 ms of a ~20 ms 2-token
        # query at 2.2M docs; membership min-merge is HBM-bound and cheap).
        # The matched set m is bounded by the smallest included token's
        # candidate postings (engine computes the bound host-side and picks
        # the CAP_M bucket), so scoring runs on a cumsum-compacted gather of
        # the matched lanes — typically 10-100x fewer than N — and the
        # packed scores scatter back for the unchanged whole-N selection
        # cascade. CAP_M == 0 disables (bound >= N, or single-token queries
        # whose scoring is already trivial).
        use_compact = CAP_M > 0 and CAP_M < N and need_text and need_pos
        # FAST32 whole-N scoring: when the sort tuple leads with the text
        # score (and no text slot elsewhere), match_type packs into int32
        # keys, and ptp is off, the whole-N chain computes ONLY the two
        # int32 selection keys (text_keys32). The exact int64 packed score
        # is recomputed on the few-thousand-lane candidate pool after the
        # cascade — int64 whole-N VPU chains (2x op cost) disappear from
        # the hot path.
        use_fast32 = (need_text and not use_compact and not ptp
                      and match_type in (0, 1)
                      and slot_kinds[0] == SLOT_TEXT
                      and SLOT_TEXT not in slot_kinds[1:]
                      and "fast32" not in _skip)
        khi32 = klo32 = ub_khi32 = ub_klo32 = None
        if need_text and use_fast32:
            khi32, klo32, ub_khi32, ub_klo32 = text_keys32(
                va, vb, inc_member, tc, query_len, field_token_counts)
            text_match = None
        elif need_text and use_compact:
            mi32 = m.astype(jnp.int32)
            cpos = jnp.cumsum(mi32) - mi32
            lane_ids = jnp.arange(N, dtype=jnp.int32)
            tgt = jnp.where(m, cpos, CAP_M)
            cbuf = jnp.full((CAP_M,), N, jnp.int32).at[tgt].set(
                lane_ids, mode="drop")
            nm = jnp.sum(mi32)
            valid_c = jnp.arange(CAP_M, dtype=jnp.int32) < nm
            safe_c = jnp.clip(cbuf, 0, N - 1)
            va_c = va[:, :, safe_c]
            vb_c = vb[:, :, safe_c]
            incm_c = inc_member[:, :, safe_c] & valid_c[None, None, :]
            tm_c, ub_c = text_score_lanes(
                va_c, vb_c, incm_c, tc[safe_c], query_len[safe_c],
                field_token_counts[safe_c, :])
            back = jnp.where(valid_c, cbuf, N)
            text_match = jnp.zeros(N, jnp.int64).at[back].set(
                jnp.where(valid_c, tm_c, 0), mode="drop")
            if need_ub:
                text_ub = jnp.zeros(N, jnp.int64).at[back].set(
                    jnp.where(valid_c, ub_c, 0), mode="drop")
        elif need_text:
            text_match, _ub = text_score_lanes(va, vb, inc_member, tc,
                                               query_len,
                                               field_token_counts)
            if need_ub:
                text_ub = _ub
        else:
            text_match = jnp.zeros(N, jnp.int64)

        gid = jnp.arange(N, dtype=jnp.int32) if doc_base is None else \
            doc_base[:N]

        def whole_key(kind, sign, col):
            if kind == SLOT_TEXT:
                return text_match
            if kind == SLOT_COLUMN:
                return jnp.clip(col[:N], -(2**61), 2**61) * sign
            if kind == SLOT_SEQ_ID:
                return gid.astype(jnp.int64) * sign
            return jnp.zeros(N, jnp.int64)

        k0 = None if use_fast32 else \
            whole_key(slot_kinds[0], slot_signs[0], sort_col0)
        k1 = whole_key(slot_kinds[1], slot_signs[1], sort_col1)
        k2 = whole_key(slot_kinds[2], slot_signs[2], sort_col2)

        # ---- phase 3: exact top-K select via int32 top_k cascade ----
        # int64 lax.top_k costs ~6.4ms at 2.2M lanes on v5e where int32
        # top_k is bandwidth-free, so each int64 stage key is selected via
        # TWO int32 top_k passes (high word, then low word among high-word
        # ties). The 2*KT pool provably contains the stage's true top-KT
        # docs; the exact stage threshold (the KT-th distinct key) comes
        # from a tiny deduped sort of the pool, and the next stage masks to
        # exact ties of that threshold. The final assembly re-sorts
        # candidates by their exact int64 tuples, so pools being supersets
        # is always safe.
        KT = min(K, N)       # tiny corpora: top_k k must not exceed N
        HMIN32 = jnp.int32(-(2**31))
        use_block, BW, NB, PADN = _block_params(N, KT)

        def kth_distinct(keys, idxs):
            """KT-th largest key among distinct-index pool entries
            (KEY_MIN when fewer)."""
            nk = jnp.where(idxs >= 0, -keys, jnp.int64(2**62))
            ni = jnp.where(idxs >= 0, idxs.astype(jnp.int64),
                           jnp.int64(2**62))
            sk, si = lax.sort((nk, ni), num_keys=2)
            dup = jnp.concatenate(
                [jnp.zeros(1, bool), (si[1:] == si[:-1]) & (si[1:] != 2**62)])
            sk = lax.sort(jnp.where(dup, jnp.int64(2**62), sk))
            return -sk[KT - 1]

        def stage_direct(key, mask):
            """2*KT candidate pool + exact KT-th threshold of `key` under
            `mask`, using only int32 top_k (small-N path: block selection
            needs NB >= KT blocks)."""
            hi = (key >> 32).astype(jnp.int32)
            him = jnp.where(mask, hi, HMIN32)
            vh, ih = lax.top_k(him, KT)
            thrh = vh[KT - 1]
            lo = ((key & 0xFFFFFFFF).astype(jnp.uint32)
                  ^ jnp.uint32(0x80000000)).astype(jnp.int32)
            lom = jnp.where(mask & (hi == thrh), lo, HMIN32)
            vl, il = lax.top_k(lom, KT)
            cand = jnp.concatenate([ih, il]).astype(jnp.int32)
            cm = mask[jnp.clip(cand, 0, N - 1)]
            ck = jnp.where(cm, key[jnp.clip(cand, 0, N - 1)], KEY_MIN)
            return cand, kth_distinct(ck, jnp.where(cm, cand, -1))

        def stage(key, mask):
            if use_block:
                return block_stage(key, mask, KT, N, BW, NB, PADN)
            return stage_direct(key, mask)

        KEY_MIN32 = np.int32(-(2**31))

        def stage32(key, mask):
            """int32 stage: exact KT-th threshold + candidate pool. Block
            selection (int32 block max + int32 top_k — the cheap kind on
            this chip) above BLOCK_SELECT_MIN_N; one direct int32 top_k
            below (top_k lane indices are distinct, so its KT-th value IS
            the exact distinct threshold)."""
            if use_block:
                km = jnp.where(mask, key, KEY_MIN32)
                kp_ = jnp.pad(km, (0, PADN), constant_values=KEY_MIN32) \
                    if PADN else km
                bm = jnp.max(kp_.reshape(NB, BW), axis=1)
                _, ib = lax.top_k(bm, KT)
                idx = (ib[:, None] * BW +
                       jnp.arange(BW, dtype=jnp.int32)[None, :]).reshape(-1)
                ck = kp_[idx].astype(jnp.int64)
                nidx = jnp.where(ck == int(KEY_MIN32), jnp.int64(2**62),
                                 idx.astype(jnp.int64))
                sk, sidx = lax.sort((-ck, nidx), num_keys=2)
                t = (-sk[KT - 1]).astype(jnp.int32)
                take = min(2 * KT, KT * BW)
                cand = jnp.where(sidx[:take] == 2**62, -1,
                                 sidx[:take]).astype(jnp.int32)
                if take < 2 * KT:
                    cand = jnp.pad(cand, (0, 2 * KT - take),
                                   constant_values=-1)
                return cand, t
            km = jnp.where(mask, key, KEY_MIN32)
            vh, ih = lax.top_k(km, KT)
            return ih.astype(jnp.int32), vh[KT - 1]

        cand_all = []
        if use_fast32:
            cand0, t_hi = stage32(khi32, m_light)
            cand_all.append(cand0)
            tie0 = m_light & (khi32 == t_hi)
            cand0b, t_lo = stage32(klo32, tie0)
            cand_all.append(cand0b)
            tie0 = tie0 & (klo32 == t_lo)
        else:
            cand0, t0 = stage(k0, m_light)
            cand_all.append(cand0)
            tie0 = m_light & (k0 == t0)
        if pack2:
            kp = ((k1 + PACK2_BIAS) << 22) | gid.astype(jnp.int64)
            cand1, _ = stage(kp, tie0)
            cand_all.append(cand1)
        else:
            # NONE slots tie universally — statically skip their stage
            # (their keys are all zero, so the tie mask is unchanged)
            tie = tie0
            for kind, key in ((slot_kinds[1], k1), (slot_kinds[2], k2)):
                if kind == SLOT_NONE:
                    continue
                cand_i, t_i = stage(key, tie)
                cand_all.append(cand_i)
                tie = tie & (key == t_i)
            # id tie-break: ids are unique, so the stage threshold is moot —
            # only the candidate pool matters
            if use_block:
                i3, _ = stage(gid.astype(jnp.int64), tie)
            else:
                _, i3 = lax.top_k(jnp.where(tie, gid, jnp.int32(-1)), KT)
                i3 = i3.astype(jnp.int32)
            cand_all.append(i3)
        cand = jnp.concatenate(cand_all)

        csafe = jnp.clip(cand, 0, N - 1)
        cvalidm = (cand >= 0) & m_light[csafe]
        cid = jnp.where(cvalidm, gid[csafe], -1)
        if use_fast32:
            # exact int64 packed text score, recomputed on the candidate
            # pool only (a few thousand lanes — the int64 chain is off the
            # whole-N path entirely)
            va_p = va[:, :, csafe]
            vb_p = vb[:, :, csafe] if vb is not None else None
            incm_p = inc_member[:, :, csafe] & cvalidm[None, None, :]
            tm_p, _ub_p = text_score_lanes(
                va_p, vb_p, incm_p, tc[csafe], query_len[csafe],
                field_token_counts[csafe, :])
            ck0 = jnp.where(cvalidm, tm_p, KEY_MIN)
        else:
            ck0 = jnp.where(cvalidm, k0[csafe], KEY_MIN)
        ck1 = jnp.where(cvalidm, k1[csafe], KEY_MIN)
        ck2 = jnp.where(cvalidm, k2[csafe], KEY_MIN)

        found_count = jnp.sum(m, dtype=jnp.int64)

        # ---- phase 4: heavy-doc exact rescore via PRECOMPUTED heavy
        # posting lists (artifacts.build_heavy_lists). The per-query heavy
        # candidates are contiguous CSR slices of the candidate rows, so
        # selection is a streamed gather + small-chunk compaction — NO
        # whole-N passes (the previous while_loop's per-round N-lane
        # selection measured ~4.5 ms at 2.2M docs).
        #
        # Correctness: the stream is a SUPERSET of plane-heavy matched
        # docs (tier mask matches each row's meta64/meta32 path; wider
        # entries rescore to identical exact scores and the final
        # _dedup_sorted_ids collapses duplicates). The threshold gate
        # (ub0 >= t0) soundly skips docs that cannot reach the top-K.
        if need_heavy and not heavy_out:
            cs = cand_starts.reshape(-1, 1)
            ce = cand_ends.reshape(-1, 1)
            cvalid = (cand_costs < 255)[:, None, :, None]
            HCT = min(HC, N)
            if use_fast32:
                # int32 gate on the stage-1 threshold: khi-only is coarser
                # than the (khi, klo) pair — a sound superset
                eligible = m & (ub_khi32 >= t_hi) if need_ub else m
            else:
                ub0 = text_ub if need_ub else k0
                eligible = m & (ub0 >= t0)   # gathered per candidate below

            # phase 4a: rank the eligible heavy lanes by cumsum; each
            # rescore round recovers its lane ids by lower_bound into the
            # cumsum (the k-th eligible lane is the first index with
            # ecum >= k+1). Every vector the selection needs (m, heavy, ub,
            # t0) is already whole-N resident, so eligibility is exactly
            # m & heavy & (ub >= t0) — no heavy posting-stream walk (the
            # previous scanA cost ~8 ms of a 20 ms two-head-token query at
            # 2.2M docs: ~3 random gathers per heavy posting entry), and no
            # N-source compaction scatter (measured ~13 ms at 2.2M — this
            # rig serializes scatters per source element). The per-round
            # cumsum search rides the SAME wide-fanout machinery as the
            # round's posting lower_bound, so a typical single-round query
            # pays one extra wide search (~12 throughput-bound gather
            # steps), not a stream walk.
            eligible_h = eligible & heavy
            ei32 = eligible_h.astype(jnp.int32)
            ecum = jnp.cumsum(ei32)                   # inclusive, (N,)
            nh = ecum[N - 1]
            import math as _math
            ecum_iters = max(2, _math.ceil(_math.log2(max(N, 2))) + 1)

            # phase 4b: exact CSR rescore of survivors in HCT chunks
            hlane = jnp.arange(HCT, dtype=jnp.int32)

            def rescore_round(i, carry):
                h0, h1, h2, hid = carry
                g = i * HCT + hlane
                ok = g < nh
                lanes = lower_bound_wide(ecum, 0, N, g + 1, ecum_iters)
                d = jnp.where(ok, jnp.clip(lanes, 0, N - 1), 0)
                x = d[None, :]
                pidx = lower_bound_wide(post_doc_ids,
                                   jnp.broadcast_to(cs, (Q * F * C, HCT)),
                                   jnp.broadcast_to(ce, (Q * F * C, HCT)), x,
                                   iters)
                safe = jnp.clip(pidx, 0, post_doc_ids.shape[0] - 1)
                fnd = (pidx < ce) & (post_doc_ids[safe] == x)
                fnd = fnd.reshape(Q, F, C, HCT) & cvalid
                pidx = pidx.reshape(Q, F, C, HCT)
                tok_field = jnp.any(fnd, axis=2)
                tok_any2 = jnp.any(tok_field, axis=1)
                tok_field = tok_field & ~excl[:, :, None]
                cost_qc = jnp.where(
                    fnd, cand_costs[:, None, :, None].astype(jnp.int32), 255)
                mc = jnp.min(cost_qc, axis=(1, 2))
                tch = jnp.sum(jnp.where(tok_any2 & tv, mc, 0), axis=0)
                first_c = jnp.argmax(fnd, axis=2)
                sp = jnp.take_along_axis(pidx, first_c[:, :, None, :],
                                         axis=2)[:, :, 0, :]
                gidh = None if doc_base is None else \
                    doc_base[jnp.clip(d, 0, doc_base.shape[0] - 1)]
                h0, h1, h2, hid, _f, _a = _score_and_merge(
                    (h0, h1, h2, hid, jnp.int64(0), tuple()),
                    d, ok, tch, tok_field, tok_any2, sp, tv,
                    post_meta, pos_offsets, positions, field_token_counts,
                    field_weights, sort_col0, sort_col1, sort_col2, (), (),
                    Q, F, HCT, K, P, slot_kinds, slot_signs,
                    prioritize_exact,
                    prioritize_num_fields, 0, (), (), (), gid=gidh,
                    last_flag_mask=1 << 25,  # post_meta is meta32
                    match_type=match_type,
                    prioritize_token_position=ptp)
                return (h0, h1, h2, hid)

            init_h = (jnp.full((K,), KEY_MIN), jnp.full((K,), KEY_MIN),
                      jnp.full((K,), KEY_MIN), jnp.full((K,), -1, jnp.int32))
            n_b = (nh + HCT - 1) // HCT
            h0, h1, h2, hid = lax.fori_loop(0, n_b, rescore_round, init_h)
            cid = jnp.concatenate([cid, hid])
            ck0 = jnp.concatenate([ck0, h0])
            ck1 = jnp.concatenate([ck1, h1])
            ck2 = jnp.concatenate([ck2, h2])

        r0, r1, r2, rid = _dedup_sorted_ids(ck0, ck1, ck2, cid, K)

        if need_heavy and heavy_out:
            # HOST-RESCORE PROTOCOL (single-chip fast path): heavy docs are
            # excluded from the cascade (m_light); the kernel returns the
            # doc ids of heavy candidates that could still reach the top-K,
            # and the engine rescores them exactly on the host (numpy CSR
            # walk + the same ops.match scoring) and merges.
            #
            # Eligibility gate — the K-th LIGHT result's FULL sort tuple:
            # a heavy doc D belongs to the true top-K only if fewer than K
            # docs beat it, so exact(D) >= tuple(light_K); with
            # ub(D) >= exact(D), gating on ub(D) >= tuple(light_K) is a
            # sound superset. Comparing the WHOLE tuple (text, k1, k2) —
            # not just the text key — is what collapses tie-heavy corpora:
            # thousands of heavy docs tie the text threshold, but only the
            # handful above the K-th result's k1/k2 tie-break survive.
            #
            # Selection: int32 block-max + top_k + small sort over the
            # selected blocks, ids descending (the cumsum-rank alternative
            # costs ~9 ms/query at 2.2M — cumulative scans and 1024-lane
            # wide binary searches are latency-poison on this chip, the
            # same lesson as the retired in-kernel rescore). With the
            # tuple gate holding nh to a handful, the 256-slot page makes
            # paging (h_cursor re-dispatch, gate gid < cursor) rare.
            dK = rid[K - 1]
            have = dK >= 0
            ds = jnp.clip(dK, 0, N - 1)
            t3 = jnp.where(have, k1[ds], KEY_MIN)
            t4 = jnp.where(have, k2[ds], KEY_MIN)
            ge34 = (k1 > t3) | ((k1 == t3) & (k2 >= t4))
            if use_fast32:
                a1 = ub_khi32 if need_ub else khi32
                a2 = ub_klo32 if need_ub else klo32
                # exact-bit bump: a1's LSB is the optimistic exact flag
                # (mt 0); raising the threshold's LSB turns "ub strictly
                # beats every inexact light doc" into a TIE, so
                # eligibility falls through to the klo/k1/k2 tie-break.
                # Sound: a1 is odd, so a1 >= t implies a1 >= t|1.
                bump = 1 if (match_type == 0 and prioritize_exact
                             and need_ub) else 0
                t1 = jnp.where(have, khi32[ds] | bump, KEY_MIN32)
                t2 = jnp.where(have, klo32[ds], KEY_MIN32)
                ge = (a1 > t1) | ((a1 == t1) &
                                  ((a2 > t2) | ((a2 == t2) & ge34)))
            else:
                a1 = text_ub if need_ub else k0
                t1 = jnp.where(have, k0[ds], KEY_MIN)
                ge = (a1 > t1) | ((a1 == t1) & ge34)
            elig = heavy & m & ge & (gid.astype(jnp.int64) < h_cursor)
            nh64 = jnp.sum(elig, dtype=jnp.int64)
            HKT = min(max(K, 256), N)
            use_bh, BWH, NBH, PADNH = _block_params(N, HKT)
            if use_bh:
                km = jnp.where(elig, gid, KEY_MIN32)
                kp_ = jnp.pad(km, (0, PADNH), constant_values=KEY_MIN32) \
                    if PADNH else km
                bm = jnp.max(kp_.reshape(NBH, BWH), axis=1)
                _, ib = lax.top_k(bm, HKT)
                idx = (ib[:, None] * BWH +
                       jnp.arange(BWH, dtype=jnp.int32)[None, :]).reshape(-1)
                ck_h = kp_[idx]
                sh = lax.sort(jnp.where(ck_h == KEY_MIN32, jnp.int64(2**62),
                                        -ck_h.astype(jnp.int64)))
                h_ids = jnp.where(sh[:HKT] == 2**62, jnp.int64(-1),
                                  -sh[:HKT])
            else:
                tk = min(HKT, N)
                vh, _ih = lax.top_k(jnp.where(elig, gid, jnp.int32(-1)), tk)
                h_ids = jnp.where(vh >= 0, vh.astype(jnp.int64),
                                  jnp.int64(-1))
                if tk < HKT:
                    h_ids = jnp.pad(h_ids, (0, HKT - tk),
                                    constant_values=-1)

        # ---- phase 5: facet counts (single-value fused one-hot) ----
        f_acc = []
        for fa in range(n_facets):
            col = facet_cols[fa]                               # (N,) int32
            vrange = jnp.arange(facet_sizes[fa], dtype=jnp.int32)
            cnt = jnp.sum((col[None, :] == vrange[:, None]) & m[None, :],
                          axis=1, dtype=jnp.int32)
            f_acc.append(cnt)

        out = [rid.astype(jnp.int64), r0, r1, r2, found_count[None]]
        out.extend(f.astype(jnp.int64) for f in f_acc)
        if heavy_out:
            if need_heavy:
                out.append(h_ids)
                out.append(nh64[None])
            else:
                out.append(jnp.full((min(max(K, 256), N),), -1, jnp.int64))
                out.append(jnp.zeros((1,), jnp.int64))
        return jnp.concatenate(out)


def pack_probe_buf(drows_start, drows_cum, n_chunks, drv,
                   cand_starts, cand_ends, cand_costs, token_valid,
                   field_weights):
    """Query buffer for the probe-path kernel (small drivers)."""
    import numpy as np
    return np.concatenate([
        drows_start.ravel(), drows_cum.ravel(),
        np.array([n_chunks, drv], dtype=np.int64),
        cand_starts.ravel(), cand_ends.ravel(), cand_costs.ravel(),
        token_valid.astype(np.int64).ravel(), field_weights.ravel(),
    ]).astype(np.int64)


@lru_cache(maxsize=512)
def build_probe_kernel(Q: int, F: int, C: int, S: int,
                       K: int, P: int, iters: int, slot_kinds: tuple,
                       slot_signs: tuple, prioritize_exact: bool,
                       prioritize_num_fields: bool, n_facets: int,
                       facet_caps: tuple, facet_sizes: tuple,
                       phrase_pairs: tuple = (), exclude_flags: tuple = (),
                       match_type: int = 0,
                       prioritize_token_position: bool = False):
    """Probe-path kernel for SMALL drivers: per-driver-element binary-search
    membership (the or_iterator-style intersect, or_iterator.h:61-182). For a
    rare driver token the probe count (drv_len * QFC * log P random gathers)
    is tiny and beats the scatter planes, which would scan every candidate
    row in full. Large drivers take build_keyword_kernel (scatter planes).
    The driver's rows form one logical stream (lane -> (row, offset) remap
    via cumulative lengths) so the chunk count is ceil(total/S) regardless
    of the number of (field, candidate) rows."""
    exclude = tuple(bool(x) for x in exclude_flags) + (False,) * (Q - len(exclude_flags))
    DR = F * C

    @jax.jit
    def kernel(post_doc_ids, post_flags, pos_offsets, positions,
               field_token_counts, filter_mask, qbuf,
               sort_col0, sort_col1, sort_col2, facet_offs, facet_vals):
        o = 0
        drows_start = qbuf[o:o + DR].astype(jnp.int32); o += DR
        drows_cum = qbuf[o:o + DR + 1].astype(jnp.int32); o += DR + 1
        n_chunks = qbuf[o].astype(jnp.int32); o += 1
        drv = qbuf[o].astype(jnp.int32); o += 1
        cand_starts = qbuf[o:o + Q * F * C].reshape(Q, F, C).astype(jnp.int32); o += Q * F * C
        cand_ends = qbuf[o:o + Q * F * C].reshape(Q, F, C).astype(jnp.int32); o += Q * F * C
        cand_costs = qbuf[o:o + Q * C].reshape(Q, C).astype(jnp.int32); o += Q * C
        token_valid = qbuf[o:o + Q].astype(bool); o += Q
        field_weights = qbuf[o:o + F].astype(jnp.int32); o += F

        excl = jnp.asarray(exclude, bool)[:, None]
        tv = token_valid[:, None] & ~excl
        tve = token_valid[:, None] & excl
        cs = cand_starts.reshape(-1, 1)
        ce = cand_ends.reshape(-1, 1)
        cvalid = (cand_costs < 255)[:, None, :, None]
        lane = jnp.arange(S, dtype=jnp.int32)
        total_drv = drows_cum[DR]

        def score_chunk(chunk_i, carry):
            g = chunk_i * S + lane
            in_range = g < total_drv
            row = jnp.sum(g[:, None] >= drows_cum[None, 1:],
                          axis=1).astype(jnp.int32)
            rsafe = jnp.clip(row, 0, DR - 1)
            idx = drows_start[rsafe] + (g - drows_cum[rsafe])
            d = jnp.where(in_range,
                          post_doc_ids[jnp.clip(idx, 0,
                                                post_doc_ids.shape[0] - 1)],
                          INT32_INF)

            x = d[None, :]
            pidx = lower_bound_wide(post_doc_ids,
                               jnp.broadcast_to(cs, (Q * F * C, S)),
                               jnp.broadcast_to(ce, (Q * F * C, S)), x, iters)
            safe = jnp.clip(pidx, 0, post_doc_ids.shape[0] - 1)
            found = (pidx < ce) & (post_doc_ids[safe] == x)
            found = found.reshape(Q, F, C, S) & cvalid
            pidx = pidx.reshape(Q, F, C, S)

            tok_field = jnp.any(found, axis=2)
            tok_any = jnp.any(tok_field, axis=1)
            all_match = (jnp.all(tok_any | ~tv, axis=0)
                         & jnp.any(tok_any & tv, axis=0)
                         & ~jnp.any(tok_any & tve, axis=0))
            tok_field = tok_field & ~excl[:, :, None]

            zero = jnp.int32(0)
            drv_member = lax.dynamic_slice(
                found, (drv, zero, zero, zero), (1, F, C, S)).reshape(F * C, S)
            # row index within drv_member is f*C+c == the stream row id
            first_row = jnp.argmax(drv_member, axis=0).astype(jnp.int32)
            own = first_row == rsafe

            fmask = filter_mask[jnp.clip(d, 0, filter_mask.shape[0] - 1)]
            m = all_match & in_range & own & fmask & (d < INT32_INF)

            cost_qc = jnp.where(found,
                                cand_costs[:, None, :, None].astype(jnp.int32), 255)
            min_cost_q = jnp.min(cost_qc, axis=(1, 2))
            tc = jnp.sum(jnp.where(tok_any & tv, min_cost_q, 0), axis=0)

            first_c = jnp.argmax(found, axis=2)
            sp = jnp.take_along_axis(pidx, first_c[:, :, None, :],
                                     axis=2)[:, :, 0, :]
            return _score_and_merge(
                carry, d, m, tc, tok_field, tok_any, sp, tv,
                post_flags, pos_offsets, positions, field_token_counts,
                field_weights, sort_col0, sort_col1, sort_col2,
                facet_offs, facet_vals,
                Q, F, S, K, P, slot_kinds, slot_signs, prioritize_exact,
                prioritize_num_fields, n_facets, facet_caps, facet_sizes,
                phrase_pairs, match_type=match_type,
                prioritize_token_position=prioritize_token_position)

        init_f = tuple(jnp.zeros(facet_sizes[fa], jnp.int32) for fa in range(n_facets))
        init = (jnp.full((K,), KEY_MIN), jnp.full((K,), KEY_MIN),
                jnp.full((K,), KEY_MIN), jnp.full((K,), -1, jnp.int32),
                jnp.int64(0), init_f)
        r0, r1, r2, rid, found_count, f_acc = lax.fori_loop(0, n_chunks, score_chunk, init)
        out = [rid.astype(jnp.int64), r0, r1, r2, found_count[None]]
        out.extend(f.astype(jnp.int64) for f in f_acc)
        return jnp.concatenate(out)

    return kernel


def unpack_result(buf, K: int, facet_sizes: tuple, heavy_k: int = 0):
    """Host-side unpacking of the single packed result buffer. With
    heavy_k > 0 (the dense2 host-rescore protocol: heavy_k =
    min(max(K, 256), N)), also returns (heavy_ids valid-only, nh_total)."""
    import numpy as np
    buf = np.asarray(buf)
    rid = buf[:K].astype(np.int32)
    r0, r1, r2 = buf[K:2 * K], buf[2 * K:3 * K], buf[3 * K:4 * K]
    found = int(buf[4 * K])
    o = 4 * K + 1
    facets = []
    for sz in facet_sizes:
        facets.append(buf[o:o + sz])
        o += sz
    if heavy_k:
        h_ids = buf[o:o + heavy_k]
        o += heavy_k
        nh = int(buf[o])
        return rid, r0, r1, r2, found, facets, \
            h_ids[h_ids >= 0].astype(np.int64), nh
    return rid, r0, r1, r2, found, facets


@lru_cache(maxsize=128)
def build_wildcard_kernel(K: int, slot_kinds: tuple, slot_signs: tuple,
                          n_facets: int, facet_caps: tuple, facet_sizes: tuple):
    """q=* path: rank all docs passing the filter by sort columns only
    (index.cpp:6616 search_wildcard; the scan is one data-parallel pass)."""

    @jax.jit
    def kernel(filter_mask, sort_col0, sort_col1, sort_col2,
               facet_offs, facet_vals):
        N = filter_mask.shape[0]
        doc_ids = jnp.arange(N, dtype=jnp.int32)
        zero_text = jnp.zeros(N, jnp.int64)
        k0 = _slot_keys(slot_kinds[0], slot_signs[0], zero_text, doc_ids, sort_col0)
        k1 = _slot_keys(slot_kinds[1], slot_signs[1], zero_text, doc_ids, sort_col1)
        k2 = _slot_keys(slot_kinds[2], slot_signs[2], zero_text, doc_ids, sort_col2)
        found = jnp.sum(filter_mask, dtype=jnp.int64)
        r0, r1, r2, rid = cascade_topk(k0, k1, k2, doc_ids, filter_mask, K,
                                       slot_kinds)

        out = [rid.astype(jnp.int64), r0, r1, r2, found[None]]
        for fa in range(n_facets):
            offs, vals = facet_offs[fa], facet_vals[fa]
            cap = facet_caps[fa]
            fb = offs[:-1]
            fcnt = offs[1:] - fb
            vidx = fb[:, None] + jnp.arange(cap, dtype=jnp.int64)[None, :]
            vv = (jnp.arange(cap)[None, :] < fcnt[:, None]) & filter_mask[:, None]
            vsafe = jnp.clip(vidx, 0, vals.shape[0] - 1)
            fv = jnp.where(vv, vals[vsafe], facet_sizes[fa])
            acc = jnp.zeros(facet_sizes[fa], jnp.int32).at[fv.reshape(-1)].add(
                vv.reshape(-1).astype(jnp.int32), mode="drop")
            out.append(acc.astype(jnp.int64))
        return jnp.concatenate(out)

    return kernel
