"""Host-side index build pipeline: documents -> SegmentArrays.

Replaces the reference's Index::batch_memory_index / index_field_in_memory
(/root/reference/src/index.cpp:575-1054): instead of mutating an ART and
block-chained posting lists per document, we accumulate flat occurrence
triples (term, doc, position) per field, then sort once into CSR arrays —
a build shaped like a data pipeline (tokenize → bin → sort → compress)
rather than pointer surgery, so the output is directly device-loadable.

Terms are sorted lexicographically so prefix matching becomes a contiguous
id range and the fuzzy kernel scans a coherent table.
"""

from __future__ import annotations

import re

import numpy as np

from typesense_tpu.index.artifacts import (
    MAX_TERM_LEN, POS_BITS, MAX_POS, SegmentArrays, fold_token,
    pack_position,
)
from typesense_tpu.schema.field import Field
from typesense_tpu.text.tokenizer import Tokenizer

_ASCII_SEP_RE = re.compile(r"[ \n]+")
_ASCII_DROP_RE = re.compile(r"[^a-z0-9]+")

# Fields eligible for the `:=`/facet value index are capped to avoid blowing
# host memory on long-text fields (reference facets carry whole values too —
# facet_index.h fvalue_seq_ids).
MAX_VALUE_INDEX_DISTINCT = 1_000_000


def fast_tokenize(text: str) -> list[str]:
    """ASCII fast path equivalent to Tokenizer with default symbols
    (tokenizer.cpp:232-289 stream modes): SEPARATE = space/newline emits the
    pending token; every other non-alnum ASCII char is SKIP — dropped
    in-place, NOT a split point ("ice-cream" -> "icecream", matching the
    native builder fast path and Tokenizer)."""
    out = []
    for run in _ASCII_SEP_RE.split(text.lower()):
        tok = _ASCII_DROP_RE.sub("", run)
        if tok:
            out.append(tok)
    return out


def tokenize_value(text: str, field: Field, stemmers=None) -> list[str]:
    if not isinstance(text, str):
        text = str(text)
    if (not field.locale and not field.symbols_to_index and not field.token_separators
            and not field.stem and not field.stem_dictionary and text.isascii()):
        return fast_tokenize(text)
    stemmer = None
    if field.stem or field.stem_dictionary:
        from typesense_tpu.text.stemmer import Stemmer, active_manager
        mgr = stemmers or active_manager()
        if mgr is not None:
            stemmer = mgr.get_stemmer(field.locale or "en",
                                      field.stem_dictionary)
        else:
            stemmer = Stemmer(field.locale or "en")
    return Tokenizer(text, locale=field.locale,
                     symbols_to_index=field.symbols_to_index,
                     separators=field.token_separators,
                     stemmer=stemmer).tokenize()


def _as_values(raw) -> list:
    """Field value(s) as a list (arrays keep order; scalars wrap)."""
    if raw is None:
        return []
    if isinstance(raw, list):
        return raw
    return [raw]


# Gap between consecutive string ranks: delta-segment values that
# lexicographically interleave between two main-segment values bisect the
# gap, so ranks stay comparable ACROSS segments (the round-1 per-segment
# ordinal ranks compared a delta rank 3 against a main rank 250,000
# numerically — wrong order). ~20 interleaving inserts between one pair
# exhaust the gap and tie; compaction (full rebuild) restores the gaps.
STR_RANK_GAP = 1 << 20


def _string_sort_ranks(values: dict[int, str], num_docs: int,
                       base_dict: tuple[list, np.ndarray] | None = None,
                       ) -> tuple[np.ndarray, tuple[list, np.ndarray]]:
    """Order-preserving rank column (adi_tree_t::rank equivalent,
    /root/reference/include/adi_tree.h:30-33). Missing docs sort last.

    Returns (column, (sorted_values, ranks)) — the dictionary is handed to
    delta-segment builds so their ranks land inside the main segment's gaps
    and cross-segment sort-key comparison stays exact.
    """
    import bisect

    col = np.full(num_docs, np.iinfo(np.int64).max, dtype=np.int64)
    if base_dict is None:
        distinct = sorted(set(values.values()))
        ranks = np.arange(len(distinct), dtype=np.int64) * STR_RANK_GAP
        lookup = dict(zip(distinct, ranks.tolist()))
        for d, v in values.items():
            col[d] = lookup[v]
        return col, (distinct, ranks)
    vals_list = list(base_dict[0])
    ranks_list = [int(r) for r in base_dict[1]]
    lookup = dict(zip(vals_list, ranks_list))
    for v in sorted(set(values.values())):
        if v in lookup:
            continue
        i = bisect.bisect_left(vals_list, v)
        if i > 0:
            lo = ranks_list[i - 1]
        elif ranks_list:
            lo = ranks_list[0] - 2 * STR_RANK_GAP
        else:
            lo = -STR_RANK_GAP
        if i < len(ranks_list):
            hi = ranks_list[i]
        elif ranks_list:
            hi = ranks_list[-1] + 2 * STR_RANK_GAP
        else:
            hi = STR_RANK_GAP
        mid = (lo + hi) // 2
        vals_list.insert(i, v)
        ranks_list.insert(i, mid)
        lookup[v] = mid
    for d, v in values.items():
        col[d] = lookup[v]
    return col, (vals_list, np.asarray(ranks_list, dtype=np.int64))


# last build's stage timings (seconds) — bench.py reports these as the
# build_s breakdown (validate/store live in Collection.add_many; these
# cover the index build proper)
BUILD_TIMINGS: dict = {}


def build_segment(docs: list[tuple[int, dict]], fields: list[Field],
                  num_docs: int, use_native: bool = True,
                  str_sort_dicts: dict | None = None) -> SegmentArrays:
    """Build one immutable segment.

    docs: [(seq_id, document_json)] — seq ids must be < num_docs.
    The occurrence-accumulation hot loop runs in native code
    (native/builder.cpp) when available; Python otherwise.
    str_sort_dicts: the MAIN segment's string-sort dictionaries, passed when
    building a delta segment so ranks are cross-segment comparable.
    """
    import time as _time
    _t0 = _time.time()
    BUILD_TIMINGS.clear()
    search_fields = [f for f in fields if f.index and f.is_string and not f.is_vector]
    field_idx = {f.name: i for i, f in enumerate(search_fields)}
    F = len(search_fields)

    nb = None
    if use_native:
        try:
            from typesense_tpu.index.native import NativeBuilder
            nb = NativeBuilder(F, num_docs)
        except (RuntimeError, ImportError):
            nb = None

    # occurrence accumulation per field: parallel python lists -> numpy
    occ_terms: list[list[int]] = [[] for _ in range(F)]
    occ_docs: list[list[int]] = [[] for _ in range(F)]
    occ_pos: list[list[int]] = [[] for _ in range(F)]
    occ_last: list[list[int]] = [[] for _ in range(F)]
    term_ids: dict[str, int] = {}

    live = np.zeros(num_docs, dtype=bool)
    ftc = np.zeros((num_docs, max(F, 1)), dtype=np.int32)

    numeric_fields = [f for f in fields if f.index and (f.is_numeric or f.is_bool) and not f.is_vector and not f.is_array]
    numeric_multi = [f for f in fields if f.index and (f.is_numeric or f.is_bool) and not f.is_vector and f.is_array]
    facet_fields = [f for f in fields if f.facet]
    vector_fields = [f for f in fields if f.is_vector]
    geo_fields = [f for f in fields if f.is_geo]
    geopoly_fields = [f for f in fields if f.type == "geopolygon"]
    str_sort_fields = [f for f in fields if f.is_string and f.sort and not f.is_array]

    num_cols: dict[str, np.ndarray] = {}
    for f in numeric_fields:
        if f.is_float:
            num_cols[f.name] = np.full(num_docs, np.nan, dtype=np.float32)
        else:
            num_cols[f.name] = np.full(num_docs, np.iinfo(np.int64).min, dtype=np.int64)

    multi_acc: dict[str, tuple[list, list]] = {f.name: ([], []) for f in numeric_multi}
    facet_acc: dict[str, tuple[list, list]] = {f.name: ([], []) for f in facet_fields}
    facet_vals: dict[str, dict[str, int]] = {f.name: {} for f in facet_fields}
    str_sort_acc: dict[str, dict[int, str]] = {f.name: {} for f in str_sort_fields}
    vec_acc: dict[str, dict[int, np.ndarray]] = {f.name: {} for f in vector_fields}
    geo_cols: dict[str, np.ndarray] = {
        f.name: np.full((num_docs, 2), np.nan, dtype=np.float32) for f in geo_fields
    }
    # geopoint[] entries: (doc seq ids, coords) pairs; geo_cols keeps the
    # FIRST point so missing-detection/sort defaults still work
    geo_multi_acc: dict[str, tuple[list, list]] = {
        f.name: ([], []) for f in geo_fields if f.is_array}
    geopoly_acc: dict[str, dict[int, list]] = {f.name: {} for f in geopoly_fields}
    value_index_acc: dict[str, dict[str, list[int]]] = {}
    for f in fields:
        if f.index and f.is_string and not f.is_vector:
            value_index_acc[f.name] = {}

    # Column sweeps: one pass over the docs PER FIELD instead of a per-doc
    # loop touching every field — keeps each inner loop monomorphic (the
    # hot path is a few list appends) and lets the native accumulator take
    # whole value batches through one ctypes crossing. Docs are visited
    # seq-ascending so the native side can finalize with a counting sort.
    docs = sorted(docs, key=lambda x: x[0])
    if docs:
        live[np.fromiter((s for s, _ in docs), np.int64, len(docs))] = True

    for f in search_fields:
        name = f.name
        fi = field_idx[name]
        vindex = value_index_acc.get(name)
        fast_ok = (not f.locale and not f.symbols_to_index
                   and not f.token_separators and not f.stem
                   and not f.stem_dictionary)
        bdocs: list[int] = []
        belems: list[int] = []
        bvals: list[str] = []

        def _flush():
            if bvals:
                nb.add_values_batch(fi, bdocs, belems, bvals)
                bdocs.clear()
                belems.clear()
                bvals.clear()

        for seq_id, doc in docs:
            raw = doc.get(name)
            if raw is None:
                continue
            if type(raw) is str:
                vals = (raw,)
            elif isinstance(raw, list):
                vals = raw
            else:
                vals = (raw,)
            tok_total = 0
            for elem_idx, value in enumerate(vals):
                if type(value) is not str:
                    value = str(value)
                if vindex is not None and len(vindex) < MAX_VALUE_INDEX_DISTINCT:
                    vindex.setdefault(value, []).append(seq_id)
                if nb is not None:
                    if fast_ok and value.isascii():
                        bdocs.append(seq_id)
                        belems.append(elem_idx)
                        bvals.append(value)
                        if len(bvals) >= 200_000:
                            _flush()
                    else:
                        # flush first: keeps the native occurrence stream
                        # doc-monotone (counting-sort finalize eligibility)
                        _flush()
                        toks = tokenize_value(value, f)
                        n = len(toks)
                        for pos, tok in enumerate(toks):
                            packed = (min(elem_idx, (1 << 18) - 1) << POS_BITS) | \
                                min(pos, MAX_POS)
                            nb.add_token(fi, seq_id, tok[:MAX_TERM_LEN], packed,
                                         pos == n - 1)
                        nb.bump_count(fi, seq_id, n)
                    continue
                toks = tokenize_value(value, f)
                n = len(toks)
                tok_total += n
                ot, od, op, ol = occ_terms[fi], occ_docs[fi], occ_pos[fi], occ_last[fi]
                for pos, tok in enumerate(toks):
                    tid = term_ids.setdefault(tok[:MAX_TERM_LEN], len(term_ids))
                    ot.append(tid)
                    od.append(seq_id)
                    op.append((min(elem_idx, (1 << 18) - 1) << POS_BITS) | min(pos, MAX_POS))
                    ol.append(1 if pos == n - 1 else 0)
            if nb is None:
                ftc[seq_id, fi] = tok_total
        if nb is not None:
            _flush()

    for f in numeric_fields:
        name = f.name
        col = num_cols[name]
        pairs = [(s, v) for s, d in docs if (v := d.get(name)) is not None]
        if pairs:
            idx = np.fromiter((p[0] for p in pairs), np.int64, len(pairs))
            if f.is_float:
                vals = np.fromiter((p[1] for p in pairs), np.float32,
                                   len(pairs))
            else:
                vals = np.fromiter((int(p[1]) for p in pairs), np.int64,
                                   len(pairs))
            col[idx] = vals

    for f in numeric_multi:
        name = f.name
        dlist, vlist = multi_acc[name]
        conv = float if f.is_float else int
        for seq_id, doc in docs:
            vals = _as_values(doc.get(name))
            if vals:
                for v in vals:
                    dlist.append(seq_id)
                    vlist.append(conv(v))

    for f in facet_fields:
        name = f.name
        vmap = facet_vals[name]
        dlist, vlist = facet_acc[name]
        dap, vap, vget = dlist.append, vlist.append, vmap.get
        for seq_id, doc in docs:
            v0 = doc.get(name)
            if v0 is None:
                continue
            if type(v0) is str:
                vid = vget(v0)
                if vid is None:
                    vid = vmap[v0] = len(vmap)
                dap(seq_id)
                vap(vid)
                continue
            for v in _as_values(v0):
                s = v if isinstance(v, str) else (
                    format(v, ".2f") if isinstance(v, float) else str(v).lower() if isinstance(v, bool) else str(v))
                vid = vmap.setdefault(s, len(vmap))
                dap(seq_id)
                vap(vid)

    for f in str_sort_fields:
        name = f.name
        acc = str_sort_acc[name]
        for seq_id, doc in docs:
            v = doc.get(name)
            if isinstance(v, str):
                acc[seq_id] = v.lower()

    for f in vector_fields:
        name = f.name
        acc = vec_acc[name]
        nd = f.num_dim
        for seq_id, doc in docs:
            v = doc.get(name)
            if isinstance(v, list) and len(v) == nd:
                acc[seq_id] = np.asarray(v, dtype=np.float32)

    for f in geo_fields:
        name = f.name
        col = geo_cols[name]
        if f.is_array:
            gacc = geo_multi_acc[name]
            for seq_id, doc in docs:
                v = doc.get(name)
                if isinstance(v, list) and v and all(
                        isinstance(x, (list, tuple)) and len(x) == 2
                        for x in v):
                    col[seq_id] = v[0]
                    d, cc = gacc
                    for pt in v:
                        d.append(seq_id)
                        cc.append([float(pt[0]), float(pt[1])])
            continue
        for seq_id, doc in docs:
            v = doc.get(name)
            if isinstance(v, list) and len(v) == 2:
                col[seq_id] = v
            elif isinstance(v, dict) and "lat" in v:
                col[seq_id] = [v["lat"], v["lng"]]

    for f in geopoly_fields:
        name = f.name
        acc = geopoly_acc[name]
        for seq_id, doc in docs:
            v = doc.get(name)
            if isinstance(v, list) and len(v) >= 6 and len(v) % 2 == 0:
                acc[seq_id] = v

    if nb is not None:
        BUILD_TIMINGS["sweep_s"] = round(_time.time() - _t0, 1)
        _t1 = _time.time()
        res = nb.finalize()
        BUILD_TIMINGS["native_finalize_s"] = round(_time.time() - _t1, 1)
        _t1 = _time.time()
        T = res["num_terms"]
        term_chars = res["term_chars"]
        term_lens = res["term_lens"]
        if T and (term_chars >= 128).any():
            # non-ASCII terms: re-encode codepoint-folded (fold_token) so
            # fuzzy distances are per character, not per UTF-8 byte; the
            # pure-ASCII fast path keeps the native builder's bytes
            term_chars = np.zeros((max(T, 1), MAX_TERM_LEN), dtype=np.uint8)
            term_lens = np.zeros(max(T, 1), dtype=np.int32)
            for i, t in enumerate(res["terms"]):
                b = fold_token(t)
                term_chars[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
                term_lens[i] = len(b)
        post_offsets = res["post_offsets"]
        post_doc_ids = res["post_doc_ids"]
        post_flags = res["post_flags"]
        pos_offsets = res["pos_offsets"]
        positions = res["positions"]
        term_doc_freq = np.zeros(max(T, 1), dtype=np.int32)
        if T:
            per_row = (post_offsets[1:] - post_offsets[:-1]).reshape(max(F, 1), max(T, 1))
            term_doc_freq[:] = per_row.sum(axis=0)
        ftc = res["field_token_counts"]
        new_ids = {t: i for i, t in enumerate(res["terms"])}
        seg = _assemble_segment(
            docs, fields, num_docs, search_fields, T, term_chars, term_lens,
            term_doc_freq, post_offsets, post_doc_ids, post_flags, pos_offsets,
            positions, live, ftc, num_cols, multi_acc, facet_acc, facet_vals,
            str_sort_acc, vec_acc, geo_cols, geopoly_acc, value_index_acc,
            new_ids, numeric_multi, facet_fields, vector_fields,
            str_sort_dicts, geo_multi_acc=geo_multi_acc)
        BUILD_TIMINGS["assemble_s"] = round(_time.time() - _t1, 1)
        return seg

    # ---- term table (sorted lexicographically; remap ids) ----
    terms = sorted(term_ids)
    T = len(terms)
    remap = np.zeros(max(len(term_ids), 1), dtype=np.int64)
    new_ids = {}
    for new_id, t in enumerate(terms):
        remap[term_ids[t]] = new_id
        new_ids[t] = new_id

    term_chars = np.zeros((max(T, 1), MAX_TERM_LEN), dtype=np.uint8)
    term_lens = np.zeros(max(T, 1), dtype=np.int32)
    for i, t in enumerate(terms):
        b = fold_token(t)   # codepoint-folded: fuzzy distance = per CHAR
        term_chars[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        term_lens[i] = len(b)

    # ---- postings CSR: row = field * T + term ----
    n_rows = max(F, 1) * max(T, 1)
    row_counts = np.zeros(n_rows, dtype=np.int64)
    per_field = []
    total_postings = 0
    for fi in range(F):
        if not occ_terms[fi]:
            per_field.append(None)
            continue
        t = remap[np.asarray(occ_terms[fi], dtype=np.int64)]
        d = np.asarray(occ_docs[fi], dtype=np.int64)
        p = np.asarray(occ_pos[fi], dtype=np.int32)
        lt = np.asarray(occ_last[fi], dtype=np.uint8)
        order = np.lexsort((p, d, t))
        t, d, p, lt = t[order], d[order], p[order], lt[order]
        # group identical (t, d) into one posting
        boundary = np.ones(len(t), dtype=bool)
        boundary[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        per_field.append((t, d, p, lt, boundary))
        group_tids = t[boundary]
        np.add.at(row_counts, fi * T + group_tids, 1)
        total_postings += int(boundary.sum())

    post_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_counts, out=post_offsets[1:])

    post_doc_ids = np.zeros(max(total_postings, 1), dtype=np.int32)
    post_flags = np.zeros(max(total_postings, 1), dtype=np.uint8)
    pos_counts = np.zeros(max(total_postings, 1), dtype=np.int64)
    pos_chunks = []
    write = 0
    for fi in range(F):
        pf = per_field[fi]
        if pf is None:
            continue
        t, d, p, lt, boundary = pf
        n_groups = int(boundary.sum())
        starts = np.flatnonzero(boundary)
        ends = np.concatenate([starts[1:], [len(t)]])
        post_doc_ids[write:write + n_groups] = d[starts]
        # flag: any occurrence in the group is a last-token occurrence
        flag_csum = np.concatenate([[0], np.cumsum(lt.astype(np.int64))])
        post_flags[write:write + n_groups] = (flag_csum[ends] - flag_csum[starts] > 0).astype(np.uint8)
        pos_counts[write:write + n_groups] = ends - starts
        pos_chunks.append(p)
        write += n_groups

    pos_offsets = np.zeros(max(total_postings, 1) + 1, dtype=np.int64)
    np.cumsum(pos_counts, out=pos_offsets[1:])
    positions = (np.concatenate(pos_chunks) if pos_chunks
                 else np.zeros(1, dtype=np.int32))

    term_doc_freq = np.zeros(max(T, 1), dtype=np.int32)
    if T:
        per_row = (post_offsets[1:] - post_offsets[:-1]).reshape(max(F, 1), max(T, 1))
        term_doc_freq[:] = per_row.sum(axis=0)

    return _assemble_segment(
        docs, fields, num_docs, search_fields, T, term_chars, term_lens,
        term_doc_freq, post_offsets, post_doc_ids, post_flags, pos_offsets,
        positions, live, ftc, num_cols, multi_acc, facet_acc, facet_vals,
        str_sort_acc, vec_acc, geo_cols, geopoly_acc, value_index_acc,
        new_ids, numeric_multi, facet_fields, vector_fields, str_sort_dicts,
        geo_multi_acc=geo_multi_acc)


def _assemble_segment(docs, fields, num_docs, search_fields, T, term_chars,
                      term_lens, term_doc_freq, post_offsets, post_doc_ids,
                      post_flags, pos_offsets, positions, live, ftc, num_cols,
                      multi_acc, facet_acc, facet_vals, str_sort_acc, vec_acc,
                      geo_cols, geopoly_acc, value_index_acc, new_ids,
                      numeric_multi, facet_fields, vector_fields,
                      str_sort_dicts=None, geo_multi_acc=None) -> SegmentArrays:
    # ---- columns ----
    num_multi = {}
    for f in numeric_multi:
        dlist, vlist = multi_acc[f.name]
        d = np.asarray(dlist, dtype=np.int64)
        v = (np.asarray(vlist, dtype=np.float32) if f.is_float
             else np.asarray(vlist, dtype=np.int64))
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        offs = np.zeros(num_docs + 1, dtype=np.int64)
        np.add.at(offs, d + 1, 1)
        np.cumsum(offs, out=offs)
        num_multi[f.name] = (offs, v)

    facet_columns = {}
    facet_value_lists = {}
    for f in facet_fields:
        dlist, vlist = facet_acc[f.name]
        d = np.asarray(dlist, dtype=np.int64)
        v = np.asarray(vlist, dtype=np.int32)
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        offs = np.zeros(num_docs + 1, dtype=np.int64)
        if len(d):
            np.add.at(offs, d + 1, 1)
        np.cumsum(offs, out=offs)
        facet_columns[f.name] = (offs, v)
        facet_value_lists[f.name] = list(facet_vals[f.name])

    str_sort_columns = {}
    str_sort_dicts_out = {}
    for name, vals in str_sort_acc.items():
        base = (str_sort_dicts or {}).get(name)
        col, rdict = _string_sort_ranks(vals, num_docs, base)
        str_sort_columns[name] = col
        str_sort_dicts_out[name] = rdict

    vectors = {}
    for f in vector_fields:
        mat = np.zeros((num_docs, f.num_dim), dtype=np.float32)
        for seq_id, v in vec_acc[f.name].items():
            mat[seq_id] = v
        if f.vec_dist == "cosine":
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = np.where(norms > 0, mat / np.maximum(norms, 1e-30), mat)
        vectors[f.name] = mat

    geopoly_columns = {}
    for name, per_doc in geopoly_acc.items():
        # vmax = TRUE max vertex count (the round-1 silent 64-vertex
        # truncation mis-filtered polygons; geopolygon_index.cpp keeps every
        # vertex)
        vmax = max((len(v) // 2 for v in per_doc.values()), default=3)
        verts = np.full((num_docs, vmax, 2), np.nan, dtype=np.float32)
        counts = np.zeros(num_docs, dtype=np.int32)
        for seq, flat in per_doc.items():
            pts = np.asarray(flat, dtype=np.float32).reshape(-1, 2)
            verts[seq, :len(pts)] = pts
            counts[seq] = len(pts)
        geopoly_columns[name] = (verts, counts)

    value_index = {
        fname: {v: np.asarray(sorted(set(ids)), dtype=np.int32)
                for v, ids in vals.items()}
        for fname, vals in value_index_acc.items()
        if len(vals) < MAX_VALUE_INDEX_DISTINCT
    }

    return SegmentArrays(
        num_docs=num_docs,
        num_terms=T,
        search_fields=[f.name for f in search_fields],
        term_chars=term_chars,
        term_lens=term_lens,
        term_doc_freq=term_doc_freq,
        post_offsets=post_offsets,
        post_doc_ids=post_doc_ids,
        post_flags=post_flags,
        pos_offsets=pos_offsets,
        positions=positions,
        live=live,
        field_token_counts=ftc,
        num_columns=num_cols,
        num_multi=num_multi,
        facet_columns=facet_columns,
        facet_values=facet_value_lists,
        str_sort_columns=str_sort_columns,
        str_sort_dicts=str_sort_dicts_out,
        vectors=vectors,
        geo_columns=geo_cols,
        geo_multi={name: (np.asarray(d, np.int64),
                          np.asarray(cc, np.float32).reshape(-1, 2))
                   for name, (d, cc) in (geo_multi_acc or {}).items() if d},
        geopoly_columns=geopoly_columns,
        term_to_id=new_ids,
        facet_value_to_id=facet_vals,
        value_index=value_index,
    )
