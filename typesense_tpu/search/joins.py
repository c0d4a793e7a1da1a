"""Join engine: relations between collections via `reference` fields.

Behavior contract: /root/reference/include/join.h:70-207 (Join:: statics,
negate/left-excluding joins), src/join.cpp — `$Coll(filter)` filter syntax,
reference resolution in both directions, `$Coll(fields)` include_fields
hydration, `$Coll(field):order` reference sorting.

TPU mapping: joins are host-side metadata ops that compile down to boolean
doc masks (filter pushdown) or int64 sort columns fed to the same device
kernels as everything else — the device never chases references.
"""

from __future__ import annotations

import numpy as np

from typesense_tpu.core.errors import BadRequest, NotFound


def _key_map(coll, key_field: str) -> dict:
    """value-of-key-field -> seq_id map for a collection, cached on the
    collection and invalidated with its index (reference_index equivalent,
    index.h:446)."""
    cache = getattr(coll, "_join_key_maps", None)
    if cache is None or getattr(coll, "_join_cache_dirty", True):
        coll._join_key_maps = cache = {}
        coll._join_cache_dirty = False
    if key_field not in cache:
        m: dict = {}
        if key_field == "id":
            m = {doc_id: seq for doc_id, seq in coll.id_to_seq.items()}
        else:
            for seq, doc in coll.docs.items():
                v = doc.get(key_field)
                if isinstance(v, list):
                    for x in v:
                        m.setdefault(x, []).append(seq)
                elif v is not None:
                    m.setdefault(v, []).append(seq)
        cache[key_field] = m
    return cache[key_field]


def find_reference(local_coll, target_coll):
    """Locate the reference linking local->target or target->local.

    Returns (direction, ref_field_name, key_field_name):
      direction 'forward': local field references `Target.key`
      direction 'reverse': target field references `Local.key`
    """
    for f in local_coll.fields:
        if f.reference:
            cname, _, kfield = f.reference.partition(".")
            if cname == target_coll.name:
                return "forward", f.name, kfield or "id"
    for f in target_coll.fields:
        if f.reference:
            cname, _, kfield = f.reference.partition(".")
            if cname == local_coll.name:
                return "reverse", f.name, kfield or "id"
    raise BadRequest(f"Failed to join on `{target_coll.name}`: No reference "
                     f"field found.")


def _matching_target_mask(target_coll, expr: str) -> np.ndarray:
    """Evaluate a filter expression on the target collection -> bool mask."""
    from typesense_tpu.search.filters import parse_filter_query, DeviceFilterEvaluator
    node = parse_filter_query(expr) if expr.strip() else None
    engine = target_coll._ensure_index()
    if node is None:
        return np.asarray(engine.seg.live, bool)
    resolver = make_join_resolver(target_coll)
    mask = DeviceFilterEvaluator(engine, join_resolver=resolver,
                                 id_resolver=target_coll.id_to_seq).evaluate(
        node, target_coll.field_map)
    return np.asarray(mask, bool)


def _ref_csr(local_coll, target, direction, ref_field, key_field):
    """CSR mapping local seq -> referenced TARGET seq ids (the reference
    keeps these as in-index reference postings, include/join.h:77 +
    index.h:446 reference_index). Built once per write-version of either
    collection; per-query `$Coll(...)` filters then reduce to one vectorized
    gather + segment-any instead of a Python loop over the corpus.

    Returns (row_of_elem (E,) int64 local seq per element, tseqs (E,) int64).
    """
    cache = getattr(local_coll, "_ref_csr_cache", None)
    if cache is None:
        local_coll._ref_csr_cache = cache = {}
    key = (target.name, direction, ref_field, key_field)
    ver = (getattr(local_coll, "_write_version", 0),
           getattr(target, "_write_version", 0))
    ent = cache.get(key)
    if ent is not None and ent[0] == ver:
        return ent[1], ent[2]

    rows: list[int] = []
    tseqs: list[int] = []
    if direction == "forward":
        kmap = _key_map(target, key_field)
        for seq, doc in local_coll.docs.items():
            v = doc.get(ref_field)
            vals = v if isinstance(v, list) else ([v] if v is not None else [])
            for x in vals:
                tsq = kmap.get(x if key_field != "id" else str(x))
                if tsq is None:
                    continue
                for t in (tsq if isinstance(tsq, list) else [tsq]):
                    rows.append(seq)
                    tseqs.append(t)
    else:
        kmap = _key_map(local_coll, key_field)
        for tseq, tdoc in target.docs.items():
            v = tdoc.get(ref_field)
            vals = v if isinstance(v, list) else ([v] if v is not None else [])
            for x in vals:
                lsq = kmap.get(x if key_field != "id" else str(x))
                if lsq is None:
                    continue
                for s in (lsq if isinstance(lsq, list) else [lsq]):
                    rows.append(s)
                    tseqs.append(tseq)
    ent = (ver, np.asarray(rows, np.int64), np.asarray(tseqs, np.int64))
    cache[key] = ent
    return ent[1], ent[2]


def resolve_join_mask(local_coll, coll_name: str, expr: str) -> np.ndarray:
    """Boolean mask over local docs that satisfy `$Coll(expr)`
    (do_reference_filtering_with_lock, index.h:856). Per query: evaluate the
    target filter, gather it through the cached reference CSR, scatter-any
    back to local docs — O(edges) numpy, no Python doc loop."""
    manager = local_coll.manager
    target = manager.get_collection(coll_name) if manager is not None else None
    if target is None:
        raise NotFound(f"Referenced collection `{coll_name}` not found.")

    direction, ref_field, key_field = find_reference(local_coll, target)
    tmask = _matching_target_mask(target, expr)
    rows, tseqs = _ref_csr(local_coll, target, direction, ref_field, key_field)
    N = max(local_coll.next_seq_id, 1)
    mask = np.zeros(N, dtype=bool)
    if len(rows):
        hit = tmask[np.clip(tseqs, 0, len(tmask) - 1)] & (tseqs < len(tmask))
        mask[rows[hit]] = True
    return mask


def make_join_resolver(coll):
    def resolver(coll_name: str, expr: str) -> np.ndarray:
        return resolve_join_mask(coll, coll_name, expr)
    return resolver


def referenced_docs(local_coll, doc: dict, coll_name: str) -> list[dict]:
    """All target docs referenced by (or referencing) `doc`."""
    manager = local_coll.manager
    target = manager.get_collection(coll_name) if manager is not None else None
    if target is None:
        raise NotFound(f"Referenced collection `{coll_name}` not found.")
    direction, ref_field, key_field = find_reference(local_coll, target)
    out: list[dict] = []
    if direction == "forward":
        kmap = _key_map(target, key_field)
        v = doc.get(ref_field)
        vals = v if isinstance(v, list) else ([v] if v is not None else [])
        for x in vals:
            tsq = kmap.get(x if key_field != "id" else str(x))
            if tsq is None:
                continue
            for t in (tsq if isinstance(tsq, list) else [tsq]):
                tdoc = target.docs.get(t)
                if tdoc is not None:
                    out.append(tdoc)
    else:
        key = doc.get(key_field) if key_field != "id" else doc.get("id")
        if key is not None:
            for tseq, tdoc in sorted(target.docs.items()):
                v = tdoc.get(ref_field)
                vals = v if isinstance(v, list) else ([v] if v is not None else [])
                if key in vals:
                    out.append(tdoc)
    return out


def join_sort_column(local_coll, coll_name: str, sort_field: str) -> np.ndarray:
    """`$Coll(field):order` reference sort: per-local-doc int64 keys from the
    referenced doc's column (reference-aware sorting, join.h:77). Missing
    references sort as smallest."""
    from typesense_tpu.search.engine import float32_sortable_int64
    manager = local_coll.manager
    target = manager.get_collection(coll_name) if manager is not None else None
    if target is None:
        raise NotFound(f"Referenced collection `{coll_name}` not found.")
    direction, ref_field, key_field = find_reference(local_coll, target)
    N = max(local_coll.next_seq_id, 1)
    col = np.full(N, -(2**61), dtype=np.int64)

    tf = target.field_map.get(sort_field)
    if tf is None or not tf.sort:
        raise BadRequest(f"Referenced field `{sort_field}` in `{coll_name}` "
                         f"is not sortable.")

    # the target engine's sort columns already hold the int64 key transform
    tengine = target._ensure_index()
    tcol = tengine.seg.num_columns.get(sort_field)
    if tcol is None:
        tcol_keys = np.full(max(target.next_seq_id, 1), -(2**61), np.int64)
    elif tcol.dtype == np.float32:
        tcol_keys = np.where(np.isnan(tcol), -(2**61),
                             float32_sortable_int64(tcol))
    else:
        missing = tcol == np.iinfo(np.int64).min
        tcol_keys = np.where(missing, -(2**61),
                             np.clip(tcol, -(2**61), 2**61))

    rows, tseqs = _ref_csr(local_coll, target, direction, ref_field, key_field)
    if len(rows):
        keys = tcol_keys[np.clip(tseqs, 0, len(tcol_keys) - 1)]
        np.maximum.at(col, rows, keys)
    return col
