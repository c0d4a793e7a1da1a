"""Collection: schema + document CRUD + search orchestration.

Behavior contract: /root/reference/include/collection.h (Collection class),
src/collection.cpp — search param semantics (~90 params, collection.h:65-341),
default sort assembly (collection.cpp:1735-1825), field weight defaults
(collection.cpp:4210-4262 — max(0, 15-i)), hit JSON shape
(collection.cpp:3100-3200), text_match_info (collection.cpp:4295),
highlighting (collection.cpp:3527).

TPU mapping: the collection owns one immutable device segment (rebuilt after
write batches — the reference also rebuilds all in-memory state on boot, we
just do it per commit) plus the host doc store for hydration.
"""

from __future__ import annotations

import json as _json
import threading
import time

# store-value encoder: compact separators, raw unicode, no circular check
# (documents are plain data; the check costs ~25% of encode time at import)
_STORE_ENC = _json.JSONEncoder(ensure_ascii=False, check_circular=False,
                               separators=(",", ":"))

import numpy as np

from typesense_tpu.core.errors import BadRequest, NotFound, Conflict
from typesense_tpu.index.builder import build_segment, tokenize_value
from typesense_tpu.schema import field as ftypes
from typesense_tpu.schema.field import Field
from typesense_tpu.schema.validator import validate_document, COERCE_OR_REJECT
from typesense_tpu.search import kernels
from typesense_tpu.search.engine import (INT_MAX, IndexEngine, SortSpec,
                                         RawResult)
from typesense_tpu.search.filters import parse_filter_query, FilterEvaluator
from typesense_tpu.search.highlight import (_edit_distance_le,
                                             highlight_doc)

FIELD_MAX_WEIGHT = 15    # index.h:667
DROP_TOKENS_THRESHOLD = 1
TYPO_TOKENS_THRESHOLD = 1

_DEFAULT_EMBEDDERS = None  # lazy EmbedderManager for manager-less collections


def _as_list(v, sep=","):
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    return [s.strip() for s in str(v).split(sep) if s.strip() != ""]


def _as_bool(v, default=False):
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


_QSEG_RE = __import__("re").compile(r'-?"[^"]*"|\S+')


def parse_query_text(q: str, field: Field):
    """Split q into (tokens, phrase_pairs, exclude_flags): quoted spans are
    phrases (adjacent-in-order, collection.cpp:4544 parse_search_query),
    `-token` / `-"phrase"` are exclusions."""
    tokens: list[str] = []
    excludes: list[bool] = []
    pairs: list[tuple[int, int]] = []
    # `-` listed in symbols_to_index is a real token character, not the
    # exclusion operator (collection_specific_more_test.cpp:1156)
    minus_indexed = "-" in (field.symbols_to_index or [])
    for seg in _QSEG_RE.findall(q):
        neg = (not minus_indexed) and seg.startswith("-") and len(seg) > 1
        if neg:
            seg = seg[1:]
        if len(seg) >= 2 and seg[0] == '"' and seg[-1] == '"':
            toks = tokenize_value(seg[1:-1], field)
            start = len(tokens)
            tokens.extend(toks)
            excludes.extend([neg] * len(toks))
            if not neg:
                pairs.extend((i, i + 1) for i in range(start, start + len(toks) - 1))
        else:
            toks = tokenize_value(seg, field)
            tokens.extend(toks)
            excludes.extend([neg] * len(toks))
    tokens, excludes = tokens[:10], excludes[:10]
    pairs = [(i, j) for i, j in pairs if j < len(tokens)]
    return tokens, tuple(pairs), tuple(excludes)


class Collection:
    def __init__(self, name: str, fields: list[Field],
                 default_sorting_field: str = "", store=None,
                 collection_id: int = 0, created_at: int | None = None,
                 enable_nested_fields: bool = False,
                 symbols_to_index: list[str] | None = None,
                 token_separators: list[str] | None = None,
                 metadata: dict | None = None,
                 voice_query_model: dict | None = None):
        self.name = name
        self.fields = fields
        # schema guards (collection_manager.cpp create_collection):
        # duplicate names rejected unless one side is a wildcard/dynamic
        # pattern resolving the other; `id` is reserved
        seen: set[str] = set()
        for f in fields:
            if f.name == "id":
                raise BadRequest("Invalid schema: field name `id` is "
                                 "reserved.")
            if f.name in seen and not any(
                    g.name == f.name and (("*" in g.type) or ("*" in f.type)
                                          or getattr(g, "is_dynamic", False)
                                          or getattr(f, "is_dynamic", False))
                    for g in fields if g is not f):
                raise BadRequest(
                    "There are duplicate field names in the schema.")
            seen.add(f.name)
        if not enable_nested_fields and any(
                getattr(f, "is_object", False) for f in fields):
            # collection_nested_fields_test.cpp
            # ErrorWhenObjectTypeUsedWithoutEnablingNestedFields
            raise BadRequest(
                "Type `object` or `object[]` can be used only when nested "
                "fields are enabled by setting` enable_nested_fields` to "
                "true.")
        self.field_map = {f.name: f for f in fields}
        self.default_sorting_field = default_sorting_field
        self.store = store
        self.collection_id = collection_id
        self.created_at = created_at or int(time.time())
        self.enable_nested_fields = enable_nested_fields
        # single-character symbols only (collection_manager.cpp schema
        # validation; CustomSeparators test asserts the message)
        for pname, plist in (("symbols_to_index", symbols_to_index),
                             ("token_separators", token_separators)):
            if plist and any(not isinstance(x, str) or len(x) != 1
                             for x in plist):
                raise BadRequest(f"`{pname}` should be an array of "
                                 f"character symbols.")
        self.symbols_to_index = symbols_to_index or []
        self.token_separators = token_separators or []
        self.metadata = metadata or {}
        # voice_query_model: {"model_name": "ts/whisper-tiny"} enables
        # `voice_query` base64-wav transcription (collection.h:730)
        self.voice_query_model = voice_query_model or {}

        if default_sorting_field:
            f = self.field_map.get(default_sorting_field)
            if f is None:
                raise BadRequest(f"Default sorting field is defined as `{default_sorting_field}` "
                                 f"but is not found in the schema.")
            if not (f.is_numeric or f.is_bool):
                raise BadRequest(f"Default sorting field `{default_sorting_field}` must be a single valued numerical field.")

        # schema-derived per-document plans (dynamic-field list, validator
        # field list) are cached and invalidated by stamp bumps at every
        # fields-list mutation site — the write pipeline is per-doc hot
        self._schema_stamp = 0
        self._schema_plan_cache: tuple | None = None
        self.next_seq_id = 0
        self.docs: dict[int, dict] = {}        # seq_id -> document
        self.id_to_seq: dict[str, int] = {}    # doc id -> seq_id
        self._engine: IndexEngine | None = None
        self._dirty = True
        self._join_cache_dirty = True
        self._write_version = getattr(self, "_write_version", 0) + 1
        # incremental writes: docs with seq >= _delta_start live in a small
        # delta segment searched alongside the main one (the reference
        # mutates postings in place, index.cpp:700; we batch into segments)
        self._delta_start = 0
        self._delta_engine: IndexEngine | None = None
        self._delta_dirty = False
        self._deleted_since_build: set[int] = set()
        # write/build concurrency: HTTP handlers run on a thread pool and
        # the boot precompile + replication catch-up threads write/search
        # concurrently. _mutate_lock serializes document mutations (the
        # reference funnels writes through a per-collection batched indexer,
        # batched_indexer.h); _build_lock serializes index builds, and
        # builds install only if _write_version is unchanged since their
        # docs snapshot — otherwise a mid-build write would be silently
        # pinned out of the index (the delta window [_delta_start, ...)
        # would skip it forever).
        self._mutate_lock = threading.RLock()
        self._build_lock = threading.RLock()
        self.manager = None                     # set by CollectionManager

        # apply per-collection symbols to string fields lacking their own
        for f in self.fields:
            if f.is_string:
                f.symbols_to_index = f.symbols_to_index or self.symbols_to_index
                f.token_separators = f.token_separators or self.token_separators

    # ------------------------------------------------------------------
    # document CRUD (collection.cpp:515 add_many / to_doc)
    # ------------------------------------------------------------------
    def _doc_key(self, seq_id: int) -> str:
        return f"{self.collection_id}_{seq_id}"

    def _id_key(self, doc_id: str) -> str:
        return f"{self.collection_id}_$DI_{doc_id}"

    def add(self, doc: dict, operation: str = "create",
            dirty_values: str = COERCE_OR_REJECT) -> dict:
        with self._mutate_lock:
            return self._add_locked(doc, operation, dirty_values)

    def _add_locked(self, doc: dict, operation: str,
                    dirty_values: str) -> dict:
        if not isinstance(doc, dict):
            raise BadRequest("Document is not a valid JSON object.")
        doc_id = doc.get("id")
        if doc_id is not None and not isinstance(doc_id, str):
            raise BadRequest("Document's `id` field should be a string.")

        exists = doc_id is not None and doc_id in self.id_to_seq
        if operation == "create" and exists:
            raise Conflict(f"A document with id {doc_id} already exists.")
        if operation == "update" and not exists:
            raise NotFound(f"Could not find a document with id: {doc_id}")

        # $operations.increment: numeric deltas applied against the stored
        # value (0 when absent) — powers popularity counters
        # (collection_operations_test.cpp IncrementInt32Value; unknown
        # fields are silently skipped, the rest of the update proceeds)
        ops = doc.pop("$operations", None) if isinstance(doc, dict) else None

        def _apply_increments(d: dict):
            if not (isinstance(ops, dict) and
                    isinstance(ops.get("increment"), dict)):
                return
            for fn, dv in ops["increment"].items():
                f = self.field_map.get(fn)
                if f is None or not f.is_numeric or f.is_bool:
                    continue
                base = d.get(fn, 0)
                if not isinstance(base, (int, float)):
                    base = 0
                d[fn] = base + dv

        # auto/dynamic schema: materialize concrete fields from this doc
        # (.* / pattern fields, collection.cpp auto schema handling) —
        # skipped outright for static schemas (plan caches the check)
        has_dynamic, _ = self._schema_plan()
        if has_dynamic:
            from typesense_tpu.schema.nested import materialize_dynamic_fields
            new_fields = materialize_dynamic_fields(self, doc)
            for nf in new_fields:
                if nf.name in self.field_map:   # concrete-named auto/string*
                    self.fields = [f for f in self.fields
                                   if f.name != nf.name]
                self.fields.append(nf)
                self.field_map[nf.name] = nf
            if new_fields:
                self._schema_stamp += 1
        else:
            new_fields = []

        old_seq = None
        if exists and operation in ("upsert", "update", "emplace"):
            seq_id = self.id_to_seq[doc_id]
            if operation in ("update", "emplace"):
                merged = dict(self.docs[seq_id])
                merged.update(doc)
                doc = merged
            _apply_increments(doc)
            self._validate(doc, dirty_values)
            if (self._engine is not None and not self._dirty and not new_fields
                    and seq_id < self._delta_start):
                # RELOCATE a main-segment doc into the delta: tombstone the
                # old seq and reinsert under a fresh one. Updates stay
                # O(delta) instead of forcing a full O(corpus) rebuild (the
                # reference mutates postings in place, index.cpp remove+add;
                # we append — same observable behavior).
                old_seq = seq_id
                self._engine.mark_deleted([old_seq])
                self._deleted_since_build.add(old_seq)
                del self.docs[old_seq]
                seq_id = self.next_seq_id
                self.next_seq_id += 1
                self.id_to_seq[doc_id] = seq_id
            self.docs[seq_id] = doc
        else:
            if doc_id is None:
                doc_id = str(self.next_seq_id)
                doc["id"] = doc_id
            _apply_increments(doc)
            self._validate(doc, dirty_values)
            seq_id = self.next_seq_id
            self.next_seq_id += 1
            self.docs[seq_id] = doc
            self.id_to_seq[doc_id] = seq_id

        if self.store is not None:
            # one record per doc: the id -> seq mapping is derived from the
            # stored doc's own "id" at load time (load_from_store), halving
            # import's store-write volume; check_circular off saves the
            # per-call circular-ref bookkeeping (~25% of encode time)
            puts = {self._doc_key(seq_id): _STORE_ENC.encode(doc)}
            dels = [self._doc_key(old_seq)] if old_seq is not None else []
            pend = getattr(self, "_pending_store", None)
            if pend is not None:
                # add_many batches one store write per import chunk — the
                # same durability unit as the reference's RocksDB write
                # batch per import batch (batched_indexer.cpp)
                pend[0].update(puts)
                pend[1].extend(dels)
            else:
                self.store.batch_write(puts, deletes=dels or None)
        if (self._engine is not None and not self._dirty and not new_fields
                and seq_id >= self._delta_start):
            self._delta_dirty = True          # new doc -> delta segment only
            if (self.next_seq_id - self._delta_start) > \
                    max(256, len(self.docs) // 10):
                self._dirty = True            # compaction threshold
        else:
            self._dirty = True
        self._join_cache_dirty = True
        self._write_version += 1   # set in __init__ before any add
        return doc

    def _schema_plan(self) -> tuple[bool, list[Field]]:
        """(has_dynamic_fields, validator field list) — derived from the
        schema once per stamp; both are consulted per imported document."""
        key = (self._schema_stamp, len(self.fields))
        cached = self._schema_plan_cache
        if cached is not None and cached[0] == key:
            return cached[1], cached[2]
        has_dynamic = any(f.is_dynamic for f in self.fields) or (
            self.enable_nested_fields and any(f.is_object for f in self.fields))
        vplan = [f for f in self.fields
                 if not (f.name == ".*" or f.is_dynamic or f.is_object)]
        self._schema_plan_cache = (key, has_dynamic, vplan)
        return has_dynamic, vplan

    def _validate(self, doc: dict, dirty_values: str):
        """Validate against the flattened view so dotted/nested fields resolve
        (validator_t::validate_index_in_memory over flattened fields)."""
        _, vplan = self._schema_plan()
        if not self._needs_flatten():
            validate_document(doc, vplan, dirty_values, prefiltered=True)
            return
        flat = self._flat_doc(doc)
        validate_document(flat, vplan, dirty_values, prefiltered=True)
        for k, v in flat.items():
            if "." not in k:
                doc[k] = v

    def add_many(self, docs: list[dict], operation: str = "create",
                 dirty_values: str = COERCE_OR_REJECT) -> list[dict]:
        """Returns per-doc result objects like the import response. Store
        writes batch into ONE WAL append + flush for the whole call (the
        per-doc path paid a flush each: 33% of import wall time at 2.2M)."""
        import gc
        results = []
        with self._mutate_lock:
            self._pending_store = ({}, [])
            # bulk import allocates heavily (coerced values, JSON strings)
            # while the doc heap grows to millions of tracked dicts; pausing
            # the cyclic collector for the chunk avoids repeated full-heap
            # gen-2 traversals (the reference's C++ import has no GC — this
            # restores linear-time import at the 2.2M bench scale)
            gc_was_on = gc.isenabled()
            if gc_was_on:
                gc.disable()
            try:
                for doc in docs:
                    try:
                        # lock already held for the whole chunk — skip the
                        # per-doc RLock reentry in add()
                        self._add_locked(doc, operation, dirty_values)
                        results.append({"success": True})
                    except Exception as e:  # noqa: BLE001 — per-doc isolation
                        results.append({"success": False,
                                        "error": getattr(e, "message", str(e)),
                                        "document": doc})
            finally:
                if gc_was_on:
                    gc.enable()
                puts, dels = self._pending_store
                self._pending_store = None
                if self.store is not None and (puts or dels):
                    self.store.batch_write(puts, deletes=dels or None)
        return results

    def get(self, doc_id: str) -> dict:
        seq = self.id_to_seq.get(doc_id)
        if seq is None:
            raise NotFound(f"Could not find a document with id: {doc_id}")
        return self.docs[seq]

    def remove(self, doc_id: str) -> dict:
        with self._mutate_lock:
            return self._remove_locked(doc_id)

    def _remove_locked(self, doc_id: str) -> dict:
        seq = self.id_to_seq.pop(doc_id, None)
        if seq is None:
            raise NotFound(f"Could not find a document with id: {doc_id}")
        doc = self.docs.pop(seq)
        if self.store is not None:
            self.store.batch_write({}, deletes=[self._doc_key(seq), self._id_key(doc_id)])
        if self._engine is not None and not self._dirty:
            # tombstone: flip the live bit on the owning segment, no rebuild
            self._deleted_since_build.add(seq)
            if seq < self._delta_start:
                self._engine.mark_deleted([seq])
            elif self._delta_engine is not None and not self._delta_dirty:
                self._delta_engine.mark_deleted([seq])
            else:
                self._delta_dirty = True
        else:
            self._dirty = True
        self._join_cache_dirty = True
        self._write_version = getattr(self, "_write_version", 0) + 1
        return doc

    @property
    def num_documents(self) -> int:
        return len(self.docs)

    def load_from_store(self):
        """Startup rebuild (CollectionManager::load path): docs are the
        checkpoint of record; indices are derived (SURVEY.md §5)."""
        import json
        if self.store is None:
            return
        prefix = f"{self.collection_id}_"
        max_seq = -1
        for k, v in self.store.scan(prefix):
            rest = k[len(prefix):]
            if rest.startswith("$DI_"):
                # legacy stores persisted id -> seq records; newer imports
                # derive the mapping from each doc's own "id" below
                self.id_to_seq[rest[4:]] = int(v)
            elif rest.isdigit():
                seq = int(rest)
                doc = json.loads(v)
                self.docs[seq] = doc
                did = doc.get("id")
                if did is not None:
                    self.id_to_seq[str(did)] = seq
                max_seq = max(max_seq, seq)
        self.next_seq_id = max_seq + 1
        self._dirty = True
        self._join_cache_dirty = True
        self._write_version = getattr(self, "_write_version", 0) + 1

    # ------------------------------------------------------------------
    # index lifecycle
    # ------------------------------------------------------------------
    def _needs_flatten(self) -> bool:
        # cached per schema size — fields are append-only, so a new dotted
        # field always changes len(self.fields); called once per imported doc
        cache = getattr(self, "_flatten_cache", None)
        key = (self.enable_nested_fields, len(self.fields))
        if cache is not None and cache[0] == key:
            return cache[1]
        val = self.enable_nested_fields or any("." in f.name for f in self.fields)
        self._flatten_cache = (key, val)
        return val

    def _flat_doc(self, doc: dict) -> dict:
        """Dotted-path view for indexing/highlighting of nested fields
        (field::flatten_doc, src/field.cpp)."""
        if not self._needs_flatten():
            return doc
        from typesense_tpu.schema.nested import flatten_paths
        flat = dict(doc)
        flat.update(flatten_paths(doc))
        return flat

    def _embedder_manager(self):
        from typesense_tpu.models.embedder import EmbedderManager
        own = getattr(self, "embedders", None)
        if own is not None:
            return own
        if self.manager is not None:
            return self.manager.embedders
        global _DEFAULT_EMBEDDERS
        if _DEFAULT_EMBEDDERS is None:
            _DEFAULT_EMBEDDERS = EmbedderManager()
        return _DEFAULT_EMBEDDERS

    def _get_embedder(self, f: Field):
        return self._embedder_manager().get(
            (f.embed or {}).get("model_config", {}))

    @staticmethod
    def _remote_kw(params: dict) -> dict:
        """Search-level remote embedding knobs (collection.h:238-239:
        remote_embedding_timeout_ms default 30000, num_tries default 2)
        forwarded to the provider client; local encoders ignore them."""
        kw = {}
        if params.get("remote_embedding_timeout_ms") is not None:
            kw["remote_embedding_timeout_ms"] = float(
                params["remote_embedding_timeout_ms"])
        if params.get("remote_embedding_num_tries") is not None:
            kw["remote_embedding_num_tries"] = int(
                params["remote_embedding_num_tries"])
        return kw

    def _auto_embed(self):
        """Generate embeddings for `embed.from` fields on docs lacking them
        (batched — index.cpp:1009-1054 embeds at index time; ours runs the
        JAX encoder on the same TPU that serves the search)."""
        for f in self.fields:
            if not f.embed or not f.embed.get("from"):
                continue
            src_fields = f.embed["from"]
            img_srcs = [sf for sf in src_fields
                        if self.field_map.get(sf) is not None
                        and self.field_map[sf].type == ftypes.IMAGE]
            txt_srcs = [sf for sf in src_fields if sf not in img_srcs]
            if img_srcs and not txt_srcs:
                # image-only embed field: dims come from the VISION tower
                # (a converted CLIP checkpoint may differ from the text
                # tower's builtin spec)
                emb = self._embedder_manager().get_image(
                    (f.embed or {}).get("model_config", {}))
            else:
                emb = self._get_embedder(f)
            if not f.num_dim:
                f.num_dim = emb.num_dim
                f.type = ftypes.FLOAT_ARRAY
            todo_seqs, todo_texts, todo_imgs = [], [], []
            for seq, doc in self.docs.items():
                if isinstance(doc.get(f.name), list):
                    continue
                if img_srcs and isinstance(doc.get(img_srcs[0]), str):
                    todo_imgs.append((seq, doc[img_srcs[0]]))
                    continue
                parts = []
                for sf in txt_srcs:
                    v = doc.get(sf)
                    if isinstance(v, list):
                        parts.extend(str(x) for x in v)
                    elif v is not None:
                        parts.append(str(v))
                todo_seqs.append(seq)
                todo_texts.append(" ".join(parts))
            if todo_seqs:
                vecs = emb.embed_batch(
                    todo_texts, **getattr(self, "_remote_embed_params", {}))
                for seq, vec in zip(todo_seqs, vecs):
                    self.docs[seq][f.name] = [float(x) for x in vec]
            if todo_imgs:
                # image docs embed through the CLIP-vision tower
                # (image_embedder.h; same space as the text tower)
                ienc = self._embedder_manager().get_image(
                    (f.embed or {}).get("model_config", {}))
                vecs = ienc.embed_images_base64([b for _, b in todo_imgs])
                if vecs.shape[1] != f.num_dim:
                    # pad/trim into the field's space (mismatched towers)
                    out = np.zeros((len(vecs), f.num_dim), np.float32)
                    d = min(f.num_dim, vecs.shape[1])
                    out[:, :d] = vecs[:, :d]
                    vecs = out
                for (seq, _), vec in zip(todo_imgs, vecs):
                    self.docs[seq][f.name] = [float(x) for x in vec]

    def _ensure_index(self) -> IndexEngine:
        if self._engine is not None and not self._dirty:
            return self._engine
        with self._build_lock:
            # another searcher may have finished the build while we waited
            attempts = 0
            while self._engine is None or self._dirty:
                attempts += 1
                self._auto_embed()
                # after a few optimistic retries, hold the write lock for
                # the whole build so sustained writes can't starve searches
                # (writes stall for one build, bounded)
                hold_writes = attempts > 3
                lock = self._mutate_lock
                if hold_writes:
                    lock.acquire()
                try:
                    with self._mutate_lock:
                        ver = self._write_version
                        snap_next = self.next_seq_id
                        items = sorted(self.docs.items())
                    if self._needs_flatten():
                        items = [(s, self._flat_doc(d)) for s, d in items]
                    seg = build_segment(items, self.fields,
                                        max(snap_next, 1))
                    eng = IndexEngine(seg, self.fields)
                    with self._mutate_lock:
                        if self._write_version != ver:
                            continue  # a write landed mid-build — go again
                        self._engine = eng
                        self._dirty = False
                        # full build compacts the delta (checkpoint, §5)
                        self._delta_start = snap_next
                        self._delta_engine = None
                        self._delta_dirty = False
                        self._deleted_since_build.clear()
                finally:
                    if hold_writes:
                        lock.release()
            self._prewarm_joins()
        return self._engine

    def _prewarm_joins(self):
        """Build reference CSR maps right after an index rebuild instead of
        on the first `$Coll(...)` query (reference_index is maintained
        inline at index time, index.h:446): the key-map dict build is
        O(corpus) host work, a multi-second stall when it lands inside a
        query at 2.2M docs. No-op for collections without references."""
        mgr = self.manager
        if mgr is None:
            return
        from typesense_tpu.search.joins import _ref_csr
        try:
            for f in self.fields:
                if not f.reference:
                    continue
                cname, _, kfield = f.reference.partition(".")
                target = mgr.get_collection(cname)
                if target is not None:
                    _ref_csr(self, target, "forward", f.name, kfield or "id")
            for other in list(mgr.collections.values()):
                if other is self:
                    continue
                for f in other.fields:
                    if not f.reference:
                        continue
                    cname, _, kfield = f.reference.partition(".")
                    if cname == self.name:
                        _ref_csr(self, other, "reverse", f.name,
                                 kfield or "id")
        except Exception:  # noqa: BLE001 — prewarm is best-effort
            pass

    def warmup(self, log=None) -> float:
        """Precompile the common kernel-shape grid so first queries don't
        stall on ~40 s tunnel compiles (TPU-native debt; no reference
        equivalent). Runs representative searches — Q in {1,2,3} exact,
        typo+prefix (wide candidate tier), facet and filter+sort variants —
        against the real index; results are discarded, the jit cache (and
        the persistent compilation cache) keeps the programs."""
        import time as _t
        t_all = _t.time()
        try:
            eng = self._ensure_index()
        except Exception:  # noqa: BLE001 — empty/broken schema: nothing to warm
            return 0.0
        ranked = sorted(self.seg_top_terms(eng), key=lambda kv: -kv[1])
        terms = [t for t, _ in ranked][:4]
        if not terms:
            return 0.0
        # mid-band terms (frequent but below the head-plane floor) drive
        # the dense2 wide-scatter variant; top terms alone would only warm
        # the all-head (SCB=0) signature added for them
        n_docs = max(eng.N, 1)
        head_floor = min(65536, max(n_docs // 8, 4096))
        mids = [t for t, fr in ranked
                if 2048 <= fr < head_floor and t not in terms][:2]
        string_fields = [f.name for f in self.fields
                         if f.type in ("string", "string[]") and f.index]
        if not string_fields:
            return 0.0
        qb = ",".join(string_fields[:2])
        facet_f = next((f.name for f in self.fields if f.facet), None)
        sort_f = next((f.name for f in self.fields
                       if f.type in ("int32", "int64", "float")), None)
        base = {"query_by": qb, "per_page": 10}
        mixes = [
            {"q": terms[0], "prefix": "false", "num_typos": "0"},
            {"q": " ".join(terms[:2]), "prefix": "false", "num_typos": "0"},
            {"q": " ".join((terms * 3)[:3]), "prefix": "false",
             "num_typos": "0"},
            {"q": terms[0][:-1] + "x" if len(terms[0]) > 3 else terms[0],
             "prefix": "true", "num_typos": "2"},
            {"q": " ".join((terms * 2)[:2]), "prefix": "true",
             "num_typos": "2"},
        ]
        if mids:
            mixes.append({"q": f"{terms[0]} {mids[0]}", "prefix": "false",
                          "num_typos": "0"})
            mixes.append({"q": f"{terms[0]} {terms[1]} {mids[0]}"
                          if len(terms) > 1 else f"{terms[0]} {mids[0]}",
                          "prefix": "false", "num_typos": "0"})
        if facet_f:
            mixes.append({"q": terms[0], "prefix": "false", "num_typos": "0",
                          "facet_by": facet_f})
        if sort_f:
            mixes.append({"q": " ".join(terms[:2]), "prefix": "false",
                          "num_typos": "0", "sort_by": f"{sort_f}:desc",
                          "filter_by": f"{sort_f}:>0"})
        for mix in mixes:
            t0 = _t.time()
            try:
                self.search({**base, **mix})
            except Exception:  # noqa: BLE001 — warmup must never break boot
                continue
            if log is not None:
                log(f"warmup {self.name} {mix.get('q', '')!r} "
                    f"typos={mix.get('num_typos')} "
                    f"{_t.time() - t0:.1f}s")
        # batch tiers: fire concurrent same-signature searches so the query
        # coalescer starts its background tier compiles, then wait — first
        # real concurrent traffic then finds batched programs ready (the
        # persistent compilation cache makes this a fast load after the
        # first-ever boot)
        from typesense_tpu.search import engine as _eng
        if _eng.QUERY_BATCHER.enabled and _eng.DENSE2_BATCH \
                and eng.N > 100_000:
            import concurrent.futures as _cf
            t0 = _t.time()
            try:
                with _cf.ThreadPoolExecutor(4) as ex:
                    for mix in mixes[:2]:
                        list(ex.map(
                            lambda _m: self.search({**base, **_m}),
                            [mix] * 4))
                _eng.QUERY_BATCHER.wait_tiers(timeout=1800)
                if log is not None:
                    log(f"warmup {self.name} batch tiers "
                        f"{_t.time() - t0:.1f}s")
            except Exception:  # noqa: BLE001 — warmup must never break boot
                pass

        # dense2 matched-lane compaction tiers (CAP_M buckets): each tier is
        # a distinct compile shape; force the grid for the multi-token mixes
        # so real queries of any intersection size start warm. _force_capm
        # is a boot-time knob — warmup runs before traffic in server boot.
        import os as _os
        tiers = [t for t in (1 << 14, 1 << 16, 1 << 18, 1 << 20)
                 if t < eng.N] if \
            _os.environ.get("TS_DENSE2_COMPACT") == "1" else []
        if tiers and len(terms) >= 2:
            try:
                for mix in (mixes[1], mixes[2]):
                    for t in tiers:
                        t0 = _t.time()
                        eng._force_capm = t
                        self.search({**base, **mix})
                        if log is not None:
                            log(f"warmup {self.name} capm={t} "
                                f"q={mix['q']!r} {_t.time() - t0:.1f}s")
            except Exception:  # noqa: BLE001
                pass
            finally:
                eng._force_capm = None
        return _t.time() - t_all

    @staticmethod
    def seg_top_terms(eng) -> list[tuple[str, int]]:
        seg = eng.seg
        out = []
        for term, tid in list(seg.term_to_id.items())[:50000]:
            if len(term) >= 3 and term.isalpha():
                out.append((term, int(seg.term_doc_freq[tid])))
        out.sort(key=lambda kv: -kv[1])
        return out[:8]

    def _engines(self) -> list[IndexEngine]:
        '''Live segments: the main one plus (when recent writes exist) a
        small delta segment, searched together and merged by sort keys.'''
        main = self._ensure_index()
        if self._delta_start >= self.next_seq_id:
            return [main]
        if self._delta_engine is not None and not self._delta_dirty:
            return [main, self._delta_engine]
        with self._build_lock:
            attempts = 0
            while True:
                attempts += 1
                main = self._ensure_index()
                if self._delta_start >= self.next_seq_id:
                    return [main]
                if self._delta_engine is not None and not self._delta_dirty:
                    return [main, self._delta_engine]
                self._auto_embed()
                hold_writes = attempts > 3   # bound retries (see above)
                lock = self._mutate_lock
                if hold_writes:
                    lock.acquire()
                try:
                    with self._mutate_lock:
                        ver = self._write_version
                        snap_next = self.next_seq_id
                        items = [(s, d) for s, d in sorted(self.docs.items())
                                 if s >= self._delta_start]
                    if self._needs_flatten():
                        items = [(s, self._flat_doc(d)) for s, d in items]
                    seg = build_segment(items, self.fields,
                                        max(snap_next, 1),
                                        str_sort_dicts=main.seg.str_sort_dicts)
                    deng = IndexEngine(seg, self.fields)
                    with self._mutate_lock:
                        if self._write_version != ver:
                            continue  # mid-build write — rebuild the delta
                        self._delta_engine = deng
                        self._delta_dirty = False
                        return [main, self._delta_engine]
                finally:
                    if hold_writes:
                        lock.release()

    # ------------------------------------------------------------------
    # mesh serving path (opt-in): TS_MESH=1 with >1 visible device routes
    # supported searches through the doc-sharded ShardedEngine
    # (SURVEY §2.4: intra-request fan-out -> sharded SPMD execution,
    # /root/reference/src/index.cpp:6653-6655)
    # ------------------------------------------------------------------
    def _mesh_engine(self):
        import os
        if os.environ.get("TS_MESH") != "1":
            return None
        import jax
        if len(jax.devices()) < 2:
            return None
        if getattr(self, "_sharded", None) is None or self._dirty or \
            getattr(self, "_sharded_seq", -1) != self.next_seq_id:
            from typesense_tpu.parallel.sharded import ShardedEngine, make_mesh
            items = sorted(self.docs.items())
            if self._needs_flatten():
                items = [(s, self._flat_doc(d)) for s, d in items]
            self._sharded = ShardedEngine(items, self.fields, make_mesh())
            self._sharded_seq = self.next_seq_id
        return self._sharded

    def _mesh_search(self, params: dict):
        """Serve via the mesh when the query fits the sharded interface
        (keyword + typo + range filter + single-value facets + column
        sorts). Returns a response dict, or None to fall through to the
        single-device path (hybrid/joins/groups/etc)."""
        import re as _re
        from typesense_tpu.search import kernels as _k
        q = params.get("q", "")
        if q in ("", "*") or params.get("vector_query") or \
                params.get("group_by") or "$" in str(params.get("filter_by",
                                                                "")):
            return None
        sharded = self._mesh_engine()
        if sharded is None:
            return None
        query_by = _as_list(params.get("query_by"))
        if not query_by or any(f not in sharded.field_idx
                               for f in query_by):
            return None
        filter_by = str(params.get("filter_by", "") or "")
        filter_range = None
        if filter_by:
            m = _re.fullmatch(r"\s*(\w+)\s*:\s*(>=?|<=?)\s*(-?\d+)\s*",
                              filter_by)
            m2 = _re.fullmatch(r"\s*(\w+)\s*:\s*\[(-?\d+)\.\.(-?\d+)\]\s*",
                               filter_by)
            if m and m.group(1) in sharded.sort_cols:
                v = int(m.group(3))
                op = m.group(2)
                lo = v + (1 if op == ">" else 0) if op.startswith(">") \
                    else -(2**60)
                hi = v - (1 if op == "<" else 0) if op.startswith("<") \
                    else (2**60)
                filter_range = (m.group(1), lo, hi)
            elif m2 and m2.group(1) in sharded.sort_cols:
                filter_range = (m2.group(1), int(m2.group(2)),
                                int(m2.group(3)))
            else:
                return None
        # default sort assembly mirrors _parse_sort_by (collection.cpp
        # :1735-1825): text desc then default_sorting_field / seq id
        sort_by = str(params.get("sort_by", "") or "")
        if sort_by:
            sort_specs = []
            have_text = False
            for part in sort_by.split(","):
                part = part.strip()
                mm = _re.fullmatch(r"(\w+):(asc|desc)", part)
                if not mm:
                    return None
                name, order = mm.group(1), mm.group(2)
                if name == "_text_match":
                    sort_specs.append((_k.SLOT_TEXT, 1, None))
                    have_text = True
                    continue
                if name not in sharded.sort_cols:
                    return None
                sort_specs.append((_k.SLOT_COLUMN,
                                   1 if order == "desc" else -1, name))
            if not have_text and len(sort_specs) < 3:
                sort_specs.append((_k.SLOT_TEXT, 1, None))
            sort_specs = sort_specs[:3]
        else:
            sort_specs = [(_k.SLOT_TEXT, 1, None)]
            if self.default_sorting_field:
                sort_specs.append((_k.SLOT_COLUMN, 1,
                                   self.default_sorting_field))
            else:
                sort_specs.append((_k.SLOT_SEQ_ID, 1, None))
        facet_by = [f for f in _as_list(params.get("facet_by"))
                    if f in sharded.facet_values]
        tokens, phrase_pairs, excl = parse_query_text(
            str(q), self.field_map.get(query_by[0]) or self.fields[0])
        if not tokens or len(tokens) > 10 or phrase_pairs or any(excl):
            return None
        num_typos = [int(x) for x in
                     _as_list(params.get("num_typos")) or ["2"]]
        prefixes = [x.lower() == "true" for x in
                    _as_list(params.get("prefix")) or ["true"]]
        per_page = int(params.get("per_page", 10))
        page = max(int(params.get("page", 1)), 1)
        k = min(max(per_page * page, 16), 1024)
        mode = "dense2"
        weights = [max(0, FIELD_MAX_WEIGHT - i)
                   for i in range(len(query_by))]
        raw = sharded.search(
            tokens, query_by, weights, sort_specs=sort_specs,
            facet_fields=facet_by, num_typos=num_typos, prefixes=prefixes,
            filter_range=filter_range, k=k, mode=mode)
        hits = []
        start = (page - 1) * per_page
        text_slot = next((i for i, s in enumerate(sort_specs)
                          if s[0] == _k.SLOT_TEXT), None)
        for i, did in enumerate(raw.doc_ids[start:start + per_page]):
            doc = self.docs.get(int(did))
            if doc is None:
                continue
            tm = int(raw.scores[start + i][text_slot]) \
                if text_slot is not None else 0
            hits.append({
                "document": dict(doc),
                "text_match": tm,
                "text_match_info": {"score": str(tm)},
            })
        facet_counts = []
        for fname in facet_by:
            vals, cnts = raw.facet_counts[fname]
            counts = [{"value": v, "count": int(c)}
                      for v, c in zip(vals, cnts) if int(c) > 0]
            counts.sort(key=lambda x: -x["count"])
            facet_counts.append({"field_name": fname, "counts": counts})
        return {"found": raw.found, "out_of": raw.out_of,
                "page": page, "hits": hits, "facet_counts": facet_counts,
                "search_cutoff": False, "request_params": {
                    "collection_name": self.name, "q": q,
                    "per_page": per_page}}

    # ------------------------------------------------------------------
    # search (collection.cpp:2807 Collection::search)
    # ------------------------------------------------------------------
    def search(self, params: dict) -> dict:
        t0 = time.monotonic()
        if params.get("q") not in (None, "", "*"):
            try:
                mesh_res = self._mesh_search(params)
            except Exception:  # noqa: BLE001 — mesh is opt-in best-effort
                mesh_res = None
            if mesh_res is not None:
                return mesh_res
        # bounded search budget (thread_local_vars.h:5-9 search_stop_us;
        # kernels are fixed-trip so the budget gates optional passes instead)
        cutoff_ms = int(params.get("search_cutoff_ms", 30000) or 30000)
        self._deadline = t0 + cutoff_ms / 1000.0
        q = params.get("q")
        if q is None:
            raise BadRequest("Parameter `q` is required.")
        raw_query_by = _as_list(params.get("query_by"))
        if q != "*" and not raw_query_by:
            raise BadRequest("No search fields specified for the query.")

        engines = self._engines()
        engine = engines[0]

        # --- resolve search fields + weights ---
        # embedding fields in query_by trigger hybrid/semantic search
        # (collection.cpp hybrid search detection for embed fields)
        # validate_field_names=false also covers query_by: unknown fields
        # are dropped instead of 404 (IgnoreMissingQueryByFields)
        vfn = _as_bool(params.get("validate_field_names"), True)
        # prefix-expansion cap for loose string filters (collection.h:162
        # MAX_FILTER_BY_CANDIDATES, filter.h:15 default 4)
        mfbc = int(params.get("max_filter_by_candidates", 4))
        search_fields: list[str] = []
        embed_fields: list[str] = []
        for fname in raw_query_by:
            if fname == "id":
                # collection.cpp:1822 validate_and_standardize_sort_fields
                raise BadRequest("Cannot use `id` as a query by field.")
            f = self.field_map.get(fname)
            if f is None:
                if not vfn:
                    continue
                raise NotFound(f"Could not find a field named `{fname}` in the schema.")
            if not f.index:
                raise BadRequest(f"Field `{fname}` is marked as a non-indexed field in the schema.")
            if f.embed:
                embed_fields.append(fname)
                continue
            if not f.is_string:
                raise BadRequest(f"Field `{fname}` should be a string or a string array.")
            search_fields.append(fname)

        raw_weights = [int(w) for w in _as_list(params.get("query_by_weights"))]
        if raw_weights and len(raw_weights) != len(search_fields):
            raise BadRequest("Number of weights in `query_by_weights` does not match "
                             "number of `query_by` fields.")
        if raw_weights:
            weights = [min(w, FIELD_MAX_WEIGHT) for w in raw_weights]
        else:
            weights = [max(0, FIELD_MAX_WEIGHT - i) for i in range(len(search_fields))]

        # --- pagination ---
        per_page = int(params.get("per_page", params.get("limit", 10)))
        if per_page > 250:
            raise BadRequest("Only upto 250 hits can be fetched per page.")
        page = int(params.get("page", 0) or 0)
        offset = int(params.get("offset", 0) or 0)
        if page == 0 and offset == 0:
            page = 1
        start = (page - 1) * per_page if page > 0 else offset
        fetch = start + per_page
        # limit_hits caps how deep pagination can reach (collection.h:47
        # default 1000000; scoped API keys embed it to bound data exposure)
        limit_hits = int(params.get("limit_hits", 1000000) or 1000000)
        fetch = min(fetch, limit_hits)

        # --- filters (parsed now, evaluated per segment) ---
        filter_by = params.get("filter_by", "")
        if filter_by:
            parse_filter_query(filter_by)  # surface syntax errors up front
        # (vfn also gates filter fields: unknown ones match nothing
        # instead of raising, filter.cpp:497-506)

        # --- facets ---
        facet_specs = self._parse_facet_by(params.get("facet_by"))
        facet_fields = [fs["name"] for fs in facet_specs]
        max_facet_values = int(params.get("max_facet_values", 10))
        # facet_strategy is accepted for API parity (collection.h
        # FACET_STRATEGY); the engine picks dense one-hot vs scatter-add
        # itself by cost model, so exhaustive/top_values map onto the same
        # kernels — only validate the value
        fstrat = str(params.get("facet_strategy", "automatic") or
                     "automatic")
        if fstrat not in ("automatic", "exhaustive", "top_values"):
            raise BadRequest("Invalid facet strategy "
                             f"`{fstrat}`.")
        facet_query = str(params.get("facet_query", "") or "")
        if facet_query:
            if ":" not in facet_query:
                raise BadRequest("Facet query must be in the `facet_field: value` format.")
            fq_field, fq_value = (s.strip() for s in facet_query.split(":", 1))
            if fq_field not in facet_fields:
                raise BadRequest("The `facet_query` parameter is supplied without "
                                 "a `facet_by` parameter.")

        # --- sort spec (validated here; re-bound per segment below) ---
        # `_group_found` sorts GROUPS by their member count (SortingOnGroupCount,
        # collection_grouping_test.cpp:826) — strip it before slot parsing and
        # apply during grouped-response assembly
        _sb = str(params.get("sort_by", "") or "")
        if "_group_found" in _sb and params.get("group_by"):
            kept, gf_order = [], None
            for comp in _sb.split(","):
                name = comp.split(":")[0].strip()
                if name == "_group_found":
                    gf_order = comp.split(":")[-1].strip().lower()
                else:
                    kept.append(comp)
            params = {**params, "sort_by": ",".join(kept),
                      "_group_found_order": gf_order}
        sort_slots = self._parse_sort_by(params.get("sort_by", ""),
                                         is_wildcard=(q == "*"), engine=engine)

        prioritize_exact = _as_bool(params.get("prioritize_exact_match"), True)
        prioritize_num_fields = _as_bool(params.get("prioritize_num_matching_fields"), True)
        drop_tokens_threshold = int(params.get("drop_tokens_threshold", DROP_TOKENS_THRESHOLD))
        drop_tokens_mode = str(params.get("drop_tokens_mode", "right_to_left"))
        _dm_parts = drop_tokens_mode.split(":")
        if _dm_parts[0] not in ("right_to_left", "left_to_right",
                                "both_sides") or \
                (len(_dm_parts) == 2 and not _dm_parts[1].isdigit()) or \
                len(_dm_parts) > 2:
            raise BadRequest("Invalid format for drop tokens mode.")
        num_typos = [int(t) for t in _as_list(params.get("num_typos"))] or [2]
        mt_name = str(params.get("text_match_type", "max_score"))
        if mt_name not in ("max_score", "max_weight", "sum_score"):
            raise BadRequest("text_match_type must be max_score, max_weight "
                             "or sum_score.")
        match_type = {"max_score": 0, "max_weight": 1,
                      "sum_score": 2}[mt_name]
        ptp = _as_bool(params.get("prioritize_token_position"), False)
        typo_opts = (
            int(params.get("min_len_1typo", 4)),
            int(params.get("min_len_2typo", 7)),
            _as_bool(params.get("enable_typos_for_numerical_tokens"), True),
            _as_bool(params.get("enable_typos_for_alpha_numerical_tokens"),
                     True),
        )
        prefixes = [_as_bool(p) for p in _as_list(params.get("prefix"))] or [True]
        # rank_tokens_by (collection.cpp:8706-8711): how candidate caps rank
        # competing typo/prefix expansions. FREQUENCY (our default — the
        # device kernel evaluates every candidate in the cost band within a
        # posting budget, so the cap ordering matters later than in the
        # reference's leaf traversal) or DEFAULT_SORTING_FIELD (ART
        # MAX_SCORE leaf order, art.h:143-148).
        rtb = str(params.get("rank_tokens_by", "") or "").upper()
        if rtb and rtb not in ("DEFAULT_SORTING_FIELD", "FREQUENCY"):
            raise BadRequest("rank_tokens_by must be `DEFAULT_SORTING_FIELD`"
                             " or `FREQUENCY`.")
        # enable_lazy_filter (index.cpp:2522, tsconfig.cpp:274) picks lazy
        # vs materialized filter iteration in the reference — a perf-only
        # strategy knob. Our filters always compile to fused device masks
        # (one strategy), so both values are accepted and yield identical
        # results; validate the type so typos don't pass silently.
        if params.get("enable_lazy_filter") is not None:
            _as_bool(params.get("enable_lazy_filter"))
        max_candidates = int(params.get("max_candidates", 0) or 0)
        if _as_bool(params.get("exhaustive_search")) and not max_candidates:
            # collection.h:928: exhaustive_search lifts max_candidates to
            # 10,000 (device candidate bucket clamps at 64 per token)
            max_candidates = 10000

        # top-K depth: the reference sizes its topster max(250, fetch)
        # because one search serves every page up to 250 (index.cpp:3506);
        # our engine re-dispatches per request with the page's own fetch, so
        # shallow pages use a small K (top_k cascade cost scales with K) and
        # deep pages grow it automatically. Diversity re-ranks a 3x pool.
        k = max(fetch, 16)
        if params.get("diversity"):
            k = max(k, fetch * 3, 48)

        # --- group_by (parsed early: grouping changes the dispatch) ---
        group_fields = _as_list(params.get("group_by"))
        for gf in group_fields:
            f = self.field_map.get(gf)
            if f is None:
                raise NotFound(f"Could not find a field named `{gf}` in the schema.")
            if not f.facet:
                raise BadRequest(f"Group by field `{gf}` should be a faceted field.")
        dispatch_facet_fields = facet_fields
        if group_fields:
            # per-group counts and the total group count come EXACTLY from
            # facet counting over the full matched set (the reference
            # estimates them with LogLogBeta + CMS, topster.h:252-264); the
            # collector also fetches a deeper ranked list so page groups
            # fill up to group_limit, escalating when truncated
            k = int(params.get("_group_k", max(k, 1024)))
            dispatch_facet_fields = facet_fields + [
                gf for gf in group_fields if gf not in facet_fields]

        # --- vector / hybrid ---
        vec_dist_map: dict[int, float] = {}
        vq = None
        if params.get("vector_query"):
            from typesense_tpu.search.vector_query import parse_vector_query
            vq = parse_vector_query(str(params["vector_query"]), is_wildcard_query=(q == "*"))
            if vq.query_doc_id is not None and not vq.values:
                ref_doc = self.get(vq.query_doc_id)
                vals = ref_doc.get(vq.field_name)
                if not isinstance(vals, list):
                    raise BadRequest(f"Document referenced in vector query does not have "
                                     f"a vector field named `{vq.field_name}`.")
                vq.values = vals
            vf = self.field_map.get(vq.field_name)
            if vf is None:
                raise BadRequest(f"Field `{vq.field_name}` does not have a "
                                 f"vector query index.")
            # embed fields resolve num_dim lazily at first index build
            if vf.num_dim and vq.values and len(vq.values) != vf.num_dim:
                raise BadRequest(
                    f"Query field `{vq.field_name}` must have "
                    f"{vf.num_dim} dimensions.")
            # multi-query personalization: embed each query string with the
            # field's model and weight-average (collection.cpp:8032-8092);
            # a non-empty `queries` list overrides explicit values, matching
            # the reference's unconditional assignment
            if vq.queries:
                if not getattr(vf, "embed", None):
                    raise BadRequest("`queries` parameter is only supported "
                                     "for auto-embedding fields.")
                self._ensure_index()
                emb = self._get_embedder(vf)
                embs = emb.embed_batch(vq.queries, **self._remote_kw(params))
                ws = vq.query_weights or [1.0 / len(vq.queries)] * len(vq.queries)
                acc = np.zeros(len(embs[0]), np.float32)
                for w, e in zip(ws, embs):
                    acc += w * np.asarray(e, np.float32)
                vq.values = [float(x) for x in acc]
            # in-query image embedding (vector_query_ops.cpp `image` param)
            if vq.image_query is not None and not vq.values:
                if not getattr(vf, "embed", None):
                    raise BadRequest("Malformed vector query string: `image` "
                                     "parameter is not supported for this field.")
                self._ensure_index()
                try:
                    ienc = self._embedder_manager().get_image(
                        (vf.embed or {}).get("model_config", {}))
                    vecs = ienc.embed_images_base64([vq.image_query])
                except Exception:
                    raise BadRequest("Malformed vector query string: "
                                     "could not embed image.")
                vq.values = [float(x) for x in vecs[0]]

        if embed_fields and q != "*":
            # hybrid / semantic search: embed q with the field's model
            from typesense_tpu.search.vector_query import VectorQuery
            ef = embed_fields[0]
            self._ensure_index()  # resolves embed field num_dim
            emb = self._get_embedder(self.field_map[ef])
            qvec = emb.embed_one(str(q), **self._remote_kw(params))
            if vq is None:
                vq = VectorQuery(field_name=ef)
            if not vq.values:
                vq.values = [float(x) for x in qvec]
            if not vq.k:
                vq.k = max(fetch, 10)

        if (q == "*" or not search_fields) and vq is not None:
            if not vq.values:
                raise BadRequest("When a vector query value is empty, either `q` or `id` "
                                 "parameter must be present.")
            vk = vq.k or max(fetch, 10)
            pairs = []
            out_of = 0
            for eng in engines:
                fm = self._filter_mask_for(eng, filter_by, validate=vfn,
                                           max_filter_by_candidates=mfbc)
                e_ids, e_d = eng.vector_search(
                    vq.field_name, np.asarray(vq.values, np.float32), vk,
                    filter_mask=fm, distance_threshold=vq.distance_threshold,
                    ef=vq.ef, flat_search_cutoff=vq.flat_search_cutoff)
                pairs.extend(zip((int(x) for x in e_ids),
                                 (float(x) for x in e_d)))
                out_of += eng._live_count
            pairs.sort(key=lambda t: t[1])
            pairs = pairs[:vk]
            ids = np.asarray([i for i, _ in pairs], dtype=np.int32)
            dists = np.asarray([d for _, d in pairs], dtype=np.float32)
            if vq.query_doc_id is not None:
                own = self.id_to_seq.get(vq.query_doc_id)
                keep = ids != own
                ids, dists = ids[keep], dists[keep]
            vec_dist_map = {int(i): float(d) for i, d in zip(ids, dists)}
            raw = RawResult(doc_ids=ids, scores=np.zeros((len(ids), 3), np.int64),
                            found=len(ids),
                            facet_counts=self._host_facets(engine, ids, facet_fields),
                            out_of=out_of)
            resp = self._build_response(raw, q, [], search_fields, params,
                                        page if page > 0 else 1, per_page, start,
                                        facet_fields, max_facet_values,
                                        vec_dist_map=vec_dist_map,
                                        sort_slots=sort_slots,
                                        facet_specs=facet_specs)
            resp["search_time_ms"] = int((time.monotonic() - t0) * 1000)
            return resp

        # --- curation rules (override_t semantics) ---
        pinned_ids: list[str] = []
        hidden_ids: set[str] = set()
        # explicit per-request pins/hides (collection.cpp:877-878
        # pinned_hits `id:pos,...` / hidden_hits `id,...`)
        for part in _as_list(params.get("pinned_hits")):
            if ":" not in part:
                raise BadRequest("Parameter `pinned_hits` is malformed.")
            did, pos = part.rsplit(":", 1)
            try:
                pinned_ids.append((int(pos), did.strip()))
            except ValueError:
                raise BadRequest("Parameter `pinned_hits` is malformed.")
        for did in _as_list(params.get("hidden_hits")):
            hidden_ids.add(did.strip())
        # enable_curations is the newer alias of enable_overrides
        # (collection.h ENABLE_CURATIONS); either disables curation rules
        curated_sort_by = None
        curation_metadata = None
        curated_filter_flag = False
        if self.manager is not None and \
                _as_bool(params.get("enable_overrides"), True) and \
                _as_bool(params.get("enable_curations"), True):
            cur_sets = _as_list(params.get("curation_sets")) or \
                _as_list(self.metadata.get("curation_sets"))
            if cur_sets:
                ctags = tuple(_as_list(params.get("curation_tags")) or
                              _as_list(params.get("override_tags")))
                from typesense_tpu.search import curation as cur_mod
                q_norm = cur_mod.normalize_rule_query(str(q))
                q_tokens = q_norm.split()
                known_fields = set(self.field_map)
                for it in self.manager.curations.candidate_rules(
                        cur_sets, tags=ctags):
                    rule = it.get("rule", {})
                    rq = cur_mod.normalize_rule_query(rule.get("query", ""))
                    match = rule.get("match")
                    rfb = str(rule.get("filter_by", "") or "")
                    tags_only = bool(rule.get("tags")) and not rq and not rfb
                    dynamic = "{" in rq and "}" in rq
                    bound: dict = {}
                    absorbed: set = set()
                    if tags_only and ctags:
                        matched = True
                    elif dynamic:
                        res = cur_mod.resolve_dynamic_query(
                            engine, rq.split(), q_tokens,
                            exact=(match == "exact"),
                            known_fields=known_fields)
                        matched = res is not None
                        if matched:
                            bound, absorbed = res
                    else:
                        fb_match = (not rq and not match and rfb
                                    and rfb == str(filter_by or ""))
                        query_match = (
                            (match == "exact" and q_norm == rq) or
                            (match == "contains"
                             and cur_mod.contains_word(q_norm, rq)))
                        matched = fb_match or query_match
                        # a rule-level filter_by is a CONDITION on the
                        # incoming filter param (does_curation_match,
                        # collection.cpp:919)
                        if matched and rfb and rfb != str(filter_by or ""):
                            matched = False
                    if not matched:
                        continue
                    for inc in it.get("includes", []):
                        pinned_ids.append((inc.get("position", 1), inc["id"]))
                    for exc in it.get("excludes", []):
                        hidden_ids.add(exc["id"])
                    if it.get("filter_by"):
                        extra = cur_mod.substitute_placeholders(
                            it["filter_by"], bound) if dynamic \
                            else it["filter_by"]
                        if extra:
                            filter_by = (f"({filter_by}) && ({extra})"
                                         if filter_by else extra)
                    if it.get("sort_by"):
                        sb = cur_mod.substitute_placeholders(
                            it["sort_by"], bound) if dynamic \
                            else it["sort_by"]
                        if sb:
                            curated_sort_by = sb
                    if it.get("replace_query"):
                        q = it["replace_query"]
                        q_norm = cur_mod.normalize_rule_query(str(q))
                        q_tokens = q_norm.split()
                    elif it.get("remove_matched_tokens"):
                        strip = absorbed if dynamic else set(rq.split())
                        q_tokens = cur_mod.remove_matched_tokens(
                            q_tokens, strip)
                        q = "*" if q_tokens == ["*"] else " ".join(q_tokens)
                        q_norm = cur_mod.normalize_rule_query(str(q))
                    if it.get("filter_curated_hits"):
                        curated_filter_flag = True
                    if curation_metadata is None and it.get("metadata"):
                        curation_metadata = it["metadata"]
                    # first matching rule halts further processing unless
                    # explicitly told otherwise (curation_t stop_processing
                    # defaults true, curation.h:40)
                    if it.get("stop_processing", True):
                        break
                if curated_sort_by:
                    sort_slots = self._parse_sort_by(
                        curated_sort_by, is_wildcard=(q == "*"),
                        engine=engine)
                    params = {**params, "sort_by": curated_sort_by}
        pinned_ids = [d for _, d in sorted(pinned_ids, key=lambda x: x[0])] \
            if pinned_ids else []

        def run_pass(eng, slots):
            """One segment's full keyword/wildcard/hybrid execution."""
            fm = self._filter_mask_for(eng, filter_by, validate=vfn,
                                       max_filter_by_candidates=mfbc)
            vdm: dict[int, float] = {}
            if not search_fields and not embed_fields and q != "*":
                # every query_by field was dropped by
                # validate_field_names=false: zero results
                return (RawResult(np.empty(0, np.int32),
                                  np.empty((0, 3), np.int64), 0,
                                  out_of=eng._live_count), vdm, [])
            # hybrid: enqueue the kNN program NOW so it overlaps the keyword
            # kernel on device — one round trip instead of two
            vec_handles = None
            if vq is not None and vq.values and q != "*" and search_fields:
                vec_handles = eng.vector_search_dispatch(
                    vq.field_name, np.asarray(vq.values, np.float32),
                    vq.k or k, filter_mask=fm,
                    distance_threshold=vq.distance_threshold, ef=vq.ef)
            if q == "*":
                return (eng.wildcard_search(slots, filter_mask=fm,
                                            facet_fields=dispatch_facet_fields,
                                            k=k if group_fields else (fetch or 10)),
                        vdm, [])
            first_field = self.field_map[search_fields[0]]
            if _as_bool(params.get("pre_segmented_query")):
                # client already segmented the query (CJK locales,
                # collection.h pre_segmented_query): split on whitespace only
                q_toks = [t.lower() for t in str(q).split()][:10]
                phrase_pairs, exclude_flags = (), tuple([False] * len(q_toks))
            else:
                q_toks, phrase_pairs, exclude_flags = parse_query_text(
                    str(q), first_field)
            # stopword removal (stopwords_manager.h)
            sw_set = params.get("stopwords") or self.metadata.get("stopwords")
            if sw_set and self.manager is not None and not phrase_pairs \
                    and not any(exclude_flags):
                q_toks = self.manager.stopwords.apply(q_toks, str(sw_set))
                exclude_flags = tuple([False] * len(q_toks))
                if not q_toks:
                    # every token was a stopword: zero results, NOT a
                    # wildcard (stopwords_manager_test.cpp StopwordsBasics)
                    return (RawResult(np.empty(0, np.int32),
                                      np.empty((0, 3), np.int64), 0,
                                      out_of=eng._live_count), vdm, [])
            if not q_toks:
                return (eng.wildcard_search(slots, filter_mask=fm,
                                            facet_fields=dispatch_facet_fields,
                                            k=k if group_fields else (fetch or 10)),
                        vdm, [])
            typo_thresh = int(params.get("typo_tokens_threshold",
                                         TYPO_TOKENS_THRESHOLD))
            rank_scores = (eng.term_rank_max_score(self.default_sorting_field)
                           if rtb == "DEFAULT_SORTING_FIELD"
                           and self.default_sorting_field else None)
            raw_e = self._keyword_with_drop_tokens(
                eng, q_toks, search_fields, weights, slots,
                fm, dispatch_facet_fields, k, num_typos, prefixes,
                max_candidates, drop_tokens_threshold,
                prioritize_exact, prioritize_num_fields, typo_thresh,
                phrase_pairs=phrase_pairs, exclude_flags=exclude_flags,
                drop_tokens_mode=drop_tokens_mode, typo_opts=typo_opts,
                match_type=match_type, prioritize_token_position=ptp,
                split_join_mode=str(params.get("split_join_tokens",
                                               "fallback") or "fallback"),
                rank_scores=rank_scores)
            # synonym expansion (do_synonym_search, index.cpp:6088)
            if self.manager is not None and _as_bool(params.get("enable_synonyms"), True):
                syn_sets = _as_list(params.get("synonym_sets")) or \
                    _as_list(self.metadata.get("synonym_sets"))
                if syn_sets:
                    alts = self.manager.synonyms.expand(
                        q_toks, syn_sets,
                        prefix=_as_bool(params.get("synonym_prefix")),
                        num_typos=int(params.get("synonym_num_typos", 0)
                                      or 0))
                    demote_syn = _as_bool(
                        params.get("demote_synonym_match"))
                    merged = [raw_e]
                    for alt in alts:
                        r_alt = self._keyword_with_drop_tokens(
                            eng, alt, search_fields, weights, slots,
                            fm, dispatch_facet_fields, k, num_typos, prefixes,
                            max_candidates, 1, prioritize_exact,
                            prioritize_num_fields, typo_thresh,
                            typo_opts=typo_opts, match_type=match_type)
                        merged.append(self._rescale_synonym_scores(
                            r_alt, len(q_toks), len(alt), slots,
                            match_type, demote=demote_syn))
                    raw_e = self._merge_results(merged)
            # infix search (do_infix_search, index.cpp:6144): substring
            # term matches, `always` or `fallback` (only when 0 results)
            infix_modes = [m.lower() for m in _as_list(params.get("infix"))] \
                or ["off"]
            # modes map onto query_by fields, last one padding the rest
            # (InfixSpecificField, collection_infix_search_test.cpp:385)
            while len(infix_modes) < len(search_fields):
                infix_modes.append(infix_modes[-1])
            active = [fn for fn, m in zip(search_fields, infix_modes)
                      if m == "always" or (m == "fallback" and
                                           raw_e.found == 0)]
            if active:
                for fn in active:
                    if not self.field_map[fn].infix:
                        raise BadRequest(
                            f"Could not find `{fn}` in the infix index. "
                            f"Make sure to enable infix search by "
                            f"specifying `infix: true` in the schema.")
                infix_fields = active
                icands = []
                mep = int(params.get("max_extra_prefix", INT_MAX) or INT_MAX)
                mes = int(params.get("max_extra_suffix", INT_MAX) or INT_MAX)
                for tok in q_toks:
                    tids = eng.infix_term_ids(tok, limit=max_candidates or 64,
                                              max_extra_prefix=mep,
                                              max_extra_suffix=mes)
                    icands.append((tids, np.full(len(tids), 2, np.int64)))
                raw_i = eng.keyword_search(
                    icands, infix_fields,
                    weights[:len(infix_fields)], slots,
                    filter_mask=fm, facet_fields=dispatch_facet_fields,
                    k=k, prioritize_exact=prioritize_exact,
                    prioritize_num_fields=prioritize_num_fields)
                raw_e = self._merge_results([raw_e, raw_i])
            if vq is not None and vq.values:
                raw_e, vdm = self._hybrid_fuse(
                    eng, raw_e, vq, k, fm, facet_fields,
                    vec_handles=vec_handles,
                    rerank=_as_bool(params.get("rerank_hybrid_matches")))
            return raw_e, vdm, q_toks

        raws = []
        q_tokens: list[str] = []
        for ei, eng in enumerate(engines):
            slots = sort_slots if ei == 0 else self._parse_sort_by(
                params.get("sort_by", ""), is_wildcard=(q == "*"), engine=eng)
            raw_e, vdm_e, q_tokens = run_pass(eng, slots)
            raws.append(raw_e)
            vec_dist_map.update(vdm_e)
        raw = raws[0] if len(raws) == 1 else self._merge_segments(raws)

        # _text_match(buckets)/_vector_distance(buckets) re-ranking
        raw = self._apply_score_buckets(raw, sort_slots)

        # apply curation pins/hides; filter_curated_hits=true also applies
        # filter_by to pinned docs (collection.h filter_curated_hits)
        if pinned_ids or hidden_ids:
            eff_pinned = pinned_ids
            if pinned_ids and filter_by and \
                    (curated_filter_flag or
                     _as_bool(params.get("filter_curated_hits"))):
                fm0 = self._filter_mask_for(engines[0], filter_by,
                                            max_filter_by_candidates=mfbc,
                                            validate=vfn)
                n0 = engines[0].N
                seqs = [self.id_to_seq.get(d, -1) for d in pinned_ids]
                import jax.numpy as jnp
                ok = np.asarray(fm0[jnp.asarray(
                    [min(max(s, 0), n0 - 1) for s in seqs], jnp.int32)])
                # docs outside segment 0 (delta writes) pass conservatively
                eff_pinned = [d for d, s, o in zip(pinned_ids, seqs, ok)
                              if s >= 0 and (s >= n0 or bool(o))]
            raw = self._apply_curation(raw, eff_pinned, hidden_ids)

        # diversity (MMR) reranking (diversity.h:14-39, applied in
        # populate_result_kvs): lambda trades relevance vs. pairwise
        # similarity computed per configured field
        if params.get("diversity"):
            dspec = params["diversity"]
            if params.get("diversity_lambda") is not None:
                import json as _json
                if isinstance(dspec, str):
                    try:
                        dspec = _json.loads(dspec)
                    except _json.JSONDecodeError:
                        raise BadRequest(
                            "The `diversity` parameter is malformed.")
                dspec = {**dspec,
                         "_lambda_override": params["diversity_lambda"]}
            raw = self._apply_diversity(raw, dspec, fetch)

        # group_by (topster.h:252 group_kv_map; grouped over the ranked set)
        group_limit = int(params.get("group_limit", 3)) if group_fields else 0
        group_missing_values = _as_bool(params.get("group_missing_values"), True)

        # --- hydrate + respond ---
        if group_fields:
            resp = self._build_grouped_response(
                raw, q, q_tokens, search_fields, params, page if page > 0 else 1,
                per_page, start, facet_fields, max_facet_values, group_fields,
                group_limit, group_missing_values, vec_dist_map, sort_slots,
                facet_specs)
        else:
            resp = self._build_response(raw, q, q_tokens, search_fields, params,
                                        page if page > 0 else 1, per_page, start,
                                        facet_fields, max_facet_values,
                                        vec_dist_map=vec_dist_map,
                                        sort_slots=sort_slots,
                                        facet_specs=facet_specs)
        # grouped-search escalation: when the page's groups need hits that
        # lie beyond the ranked list, re-run ONCE with the max-depth
        # collector (per-group topsters over the full scan, topster.h:252).
        # Jumping straight to the cap bounds a pathological group query at
        # TWO whole-corpus dispatches (the previous 4x ladder could run
        # three) — block-select keeps the deep top-K cheap.
        if resp.pop("_groups_truncated", False) and k < 16384 \
                and time.monotonic() <= self._deadline:
            return self.search({**params, "_group_k": 16384})
        resp["search_time_ms"] = int((time.monotonic() - t0) * 1000)
        resp["search_cutoff"] = time.monotonic() > self._deadline
        if curation_metadata is not None:
            resp["metadata"] = curation_metadata
        # exclude_fields can also drop response-level meta keys
        # (MustExcludeOutOf: exclude_fields=out_of)
        for meta in ("out_of", "search_time_ms", "found"):
            if meta in set(_as_list(params.get("exclude_fields"))):
                resp.pop(meta, None)
        return resp

    # ------------------------------------------------------------------
    @staticmethod
    def _drop_tokens_limit(mode: str) -> int:
        parts = str(mode).split(":")
        if len(parts) == 2 and parts[1].isdigit():
            return int(parts[1])
        return 1000  # reference default drop_tokens_token_limit

    def _drop_tokens_plan(self, toks: list, mode: str) -> list:
        """Ordered truncated-token variants (index.cpp:3930-3985): drop one
        token at a time from the starting side; when that side exhausts,
        swap direction once. both_sides:N starts from the left when the
        query has <= N tokens, else degrades to right_to_left."""
        n = min(len(toks), 20)   # reference caps droppable tokens at 20
        toks = list(toks[:n])
        if n <= 1:
            return []
        base = str(mode).split(":")[0]
        if base == "both_sides" and n <= self._drop_tokens_limit(mode):
            first = "left"       # both_sides enters the left-drop branch
        elif base == "left_to_right":
            first = "left"
        else:
            first = "right"

        def seq(direction):
            return [toks[:n - d] if direction == "right" else toks[d:]
                    for d in range(1, n)]

        return seq(first) + seq("left" if first == "right" else "right")

    def _keyword_with_drop_tokens(self, engine, q_tokens, search_fields, weights,
                                  sort_slots, filter_mask, facet_fields, k,
                                  num_typos, prefixes, max_candidates,
                                  drop_tokens_threshold, prioritize_exact,
                                  prioritize_num_fields, typo_tokens_threshold,
                                  phrase_pairs: tuple = (),
                                  exclude_flags: tuple = (),
                                  drop_tokens_mode: str = "right_to_left",
                                  typo_opts: tuple = (4, 7, True, True),
                                  match_type: int = 0,
                                  prioritize_token_position: bool = False,
                                  split_join_mode: str = "fallback",
                                  rank_scores=None,
                                  ) -> RawResult:
        """Run keyword search; drop tokens while below threshold
        (index.cpp:3925-3990 drop_tokens loop: one token at a time from the
        configured side; when a direction exhausts, swap once —
        `right_to_left` (default), `left_to_right`, `both_sides:N`). Phrase
        queries and exclusions never drop tokens (reference behavior)."""
        from typesense_tpu.search.candidates import token_candidate_sets

        from typesense_tpu.search.candidates import bounded_typo_cost

        tokens = list(q_tokens)
        excludes = list(exclude_flags) or [False] * len(tokens)
        # drop_tokens_threshold: 0 disables dropping entirely (reference-
        # documented contract); phrase/exclusion queries never drop
        can_drop = (not phrase_pairs and not any(excludes)
                    and drop_tokens_threshold > 0)
        drop_plan = self._drop_tokens_plan(list(q_tokens), drop_tokens_mode)
        results: list[RawResult] = []
        cand_memo: dict = {}
        max_typos = num_typos[0] if num_typos else 2
        threshold = max(typo_tokens_threshold, 1)
        empty_raw = RawResult(np.empty(0, np.int32),
                              np.empty((0, 3), np.int64), 0,
                              out_of=engine._live_count)
        while True:
            exact_only = [excludes[i] or any(i in p for p in phrase_pairs)
                          for i in range(len(tokens))]
            # prefix applies to the ORIGINAL query's last token only: when a
            # drop pass removed it, the reduced query's new last token must
            # stay exact (DroppedTokensShouldNotBeUsedForPrefixSearch,
            # collection_specific_test.cpp:2069)
            pass_prefixes = prefixes
            if list(tokens) != list(q_tokens) and \
                    (not tokens or not q_tokens or
                     tokens[-1] != q_tokens[-1]):
                pass_prefixes = [False for _ in (prefixes or [True])]

            def dispatch(cands):
                # host-side short circuit: an include token with zero
                # candidates makes the AND impossible — skip the round trip
                if any(len(cands[i][0]) == 0 and not excludes[i]
                       for i in range(len(cands))):
                    return None
                return engine.keyword_search(
                    cands, search_fields, weights, sort_slots,
                    filter_mask=filter_mask, facet_fields=facet_fields, k=k,
                    prioritize_exact=prioritize_exact,
                    prioritize_num_fields=prioritize_num_fields,
                    phrase_pairs=phrase_pairs,
                    exclude_flags=tuple(excludes[:len(tokens)]),
                    field_num_typos=num_typos,
                    field_prefixes=pass_prefixes, match_type=match_type,
                    prioritize_token_position=prioritize_token_position)

            # staged typo expansion, mirroring the reference's ascending
            # cost-combination loop (index.cpp:4860-4870) gated by
            # typo_tokens_threshold: (1) cost-0 candidates only, (2) typos
            # on tokens with no cost-0 candidates, (3) typos everywhere.
            # Each stage's candidate set is a superset of the previous one,
            # so the latest dispatch supersedes earlier ones.
            budgets = [0 if exact_only[i]
                       else bounded_typo_cost(
                           max_typos, len(tokens[i]), typo_opts[0],
                           typo_opts[1], tokens[i], typo_opts[2],
                           typo_opts[3])
                       for i in range(len(tokens))]
            mask = [False] * len(tokens)
            cands = token_candidate_sets(
                engine, tokens, search_fields, num_typos, pass_prefixes,
                max_candidates, typo_tokens_threshold, exact_only=exact_only,
                memo=cand_memo, typo_tokens=mask, typo_opts=typo_opts,
                rank_scores=rank_scores)
            raw = dispatch(cands)
            if raw is None or raw.found < threshold:
                mask2 = [budgets[i] > 0 and len(cands[i][0]) == 0
                         for i in range(len(tokens))]
                if any(mask2):
                    cands = token_candidate_sets(
                        engine, tokens, search_fields, num_typos,
                        pass_prefixes, max_candidates, typo_tokens_threshold,
                        exact_only=exact_only, memo=cand_memo,
                        typo_tokens=mask2, typo_opts=typo_opts,
                        rank_scores=rank_scores)
                    raw = dispatch(cands) or raw
                    mask = mask2
            if raw is None or raw.found < threshold:
                mask3 = [budgets[i] > 0 for i in range(len(tokens))]
                if mask3 != mask and any(mask3):
                    cands = token_candidate_sets(
                        engine, tokens, search_fields, num_typos,
                        pass_prefixes, max_candidates, typo_tokens_threshold,
                        exact_only=exact_only, memo=cand_memo,
                        typo_tokens=mask3, typo_opts=typo_opts,
                        rank_scores=rank_scores)
                    raw = dispatch(cands) or raw
            raw = raw if raw is not None else empty_raw
            if raw.found > 0 and len(tokens) < len(q_tokens):
                # dropped tokens still present in a hit count toward its
                # text score (compute_aggregated_score walks
                # dropped_token_its, index.cpp:5271-5290) — a doc matching
                # more of the ORIGINAL query outranks one that only matches
                # the reduced query
                from collections import Counter
                dropped = list((Counter(list(q_tokens)) -
                                Counter(tokens)).elements())
                raw = self._boost_dropped_token_hits(
                    engine, raw, dropped, search_fields, sort_slots,
                    weights=weights, cands=cands, tokens=tokens,
                    match_type=match_type)
            results.append(raw)
            both_sides = drop_tokens_mode.startswith("both_sides") and \
                len(q_tokens) <= self._drop_tokens_limit(drop_tokens_mode)
            if ((raw.found >= max(drop_tokens_threshold, 1) and not both_sides)
                    or not can_drop or not drop_plan
                    or time.monotonic() > getattr(self, "_deadline", float("inf"))):
                break
            tokens = drop_plan.pop(0)
            excludes = [False] * len(tokens)

        merged = self._merge_results(results)
        # split_join_tokens (index.cpp:3851): `fallback` (default) only
        # when zero results, `always` unconditionally, `off` never
        sj_go = split_join_mode == "always" or \
            (split_join_mode == "fallback" and merged.found == 0)
        if sj_go and can_drop and len(q_tokens) >= 1:
            # try joining adjacent tokens ("ice cream" -> "icecream") and
            # splitting unknown tokens into two dictionary words
            for alt in self._split_join_alternatives(engine, list(q_tokens)):
                cands = token_candidate_sets(
                    engine, alt, search_fields, num_typos, prefixes,
                    max_candidates, typo_tokens_threshold,
                    rank_scores=rank_scores)
                raw = engine.keyword_search(
                    cands, search_fields, weights, sort_slots,
                    filter_mask=filter_mask, facet_fields=facet_fields, k=k,
                    prioritize_exact=prioritize_exact,
                    prioritize_num_fields=prioritize_num_fields)
                if raw.found > 0:
                    return raw
        return merged

    @staticmethod
    def _boost_dropped_token_hits(engine, raw: RawResult,
                                  dropped: list[str],
                                  search_fields: list[str],
                                  sort_slots, weights=None, cands=None,
                                  tokens=None, match_type: int = 0
                                  ) -> RawResult:
        """Host rescore of a drop-pass page: dropped query tokens still
        present in a hit join its Match — tokens_matched, the field score's
        words/cost/proximity, everything (compute_aggregated_score walks
        dropped_token_its, index.cpp:5271-5290). The hit set is tiny (<=K),
        so this is host binary searches into the per-(field,term) posting
        rows + the positions CSR; no device round trip. Dropped tokens
        match exact-term only (their expansions were never searched)."""
        from typesense_tpu.ops.match import WINDOW_SIZE
        if not dropped or raw.found == 0:
            return raw
        ti = next((i for i, s in enumerate(sort_slots)
                   if s.kind == kernels.SLOT_TEXT and s.sign == 1), None)
        if ti is None:
            return raw
        seg = engine.seg
        fis = [engine.field_idx.get(fn, -1) for fn in search_fields]
        if weights is None:
            weights = [max(1, 8 - i) for i in range(len(search_fields))]

        def row_positions(row: int, doc: int):
            """Sorted positions of a (field,term) row in doc, or None."""
            s0, e0 = int(seg.post_offsets[row]), int(seg.post_offsets[row + 1])
            if e0 <= s0:
                return None
            rowids = seg.post_doc_ids[s0:e0]
            j = int(np.searchsorted(rowids, doc))
            if j >= e0 - s0 or int(rowids[j]) != doc:
                return None
            p0 = int(seg.pos_offsets[s0 + j])
            p1 = int(seg.pos_offsets[s0 + j + 1])
            return np.sort(seg.positions[p0:p1].astype(np.int64)) \
                if p1 > p0 else np.zeros(1, np.int64)

        def host_match(pos_lists):
            """Mirror of ops/match.match_components (Match semantics)."""
            arrs = [a for a in pos_lists if a is not None and len(a)]
            if len(arrs) < 2:
                return 1, 0, 0
            anchors = np.sort(np.concatenate(arrs))
            bestkey, best = -1, (1, 0, 0)
            for a in anchors:
                nxt = []
                for arr in arrs:
                    j = int(np.searchsorted(arr, a))
                    if j < len(arr):
                        nxt.append(int(arr[j]))
                if len(nxt) < 2:
                    continue
                in_win = [x for x in nxt if x - a <= WINDOW_SIZE]
                words = len(in_win)
                disp = (max(in_win) - a) if in_win else 0
                key = words * (1 << 32) - disp
                if key > bestkey:
                    bestkey = key
                    best = (words, disp, min(max(nxt), 255))
            return best

        dropped_tids = [(t, seg.term_to_id.get(t)) for t in set(dropped)]
        scores = raw.scores.copy()
        for hi, did in enumerate(raw.doc_ids):
            doc = int(did)
            matched_q = set()       # query token keys matched anywhere
            best_fs, best_w, nmf = 0, 0, 0
            sum_fs = 0
            for fslot, fi in enumerate(fis):
                if fi < 0:
                    continue
                pos_lists, costs = [], []
                # reduced-pass tokens via their candidate expansions.
                # Budget guard: wide expansions (max_candidates/exhaustive)
                # would make K*Q*C*F host lookups explode — cap the per-
                # token candidate walk; candidates are frequency-ranked so
                # the head covers real matches
                cand_cap = max(4, 200_000 // max(
                    1, len(raw.doc_ids) * len(fis) * max(len(tokens or ()),
                                                         1)))
                if cands is not None and tokens is not None:
                    for qi, tok in enumerate(tokens):
                        tids, tcosts = cands[qi][0], cands[qi][1]
                        got = None
                        for tid, cost in zip(tids[:cand_cap],
                                             tcosts[:cand_cap]):
                            if tid < 0:
                                continue
                            p = row_positions(fi * engine.T + int(tid), doc)
                            if p is not None and \
                                    (got is None or cost < got[1]):
                                got = (p, int(cost))
                        if got is not None:
                            pos_lists.append(got[0])
                            costs.append(got[1])
                            matched_q.add(("r", qi))
                # dropped tokens: exact term, cost 0
                for tok, tid in dropped_tids:
                    if tid is None:
                        continue
                    p = row_positions(fi * engine.T + int(tid), doc)
                    if p is not None:
                        pos_lists.append(p)
                        costs.append(0)
                        matched_q.add(("d", tok))
                if not pos_lists:
                    continue
                nmf += 1
                words, dist, max_off = host_match(pos_lists)
                uw = len(pos_lists)
                tc = sum(costs)
                fs = ((min(words, 255) << 40) | (min(uw, 255) << 32) |
                      (max(0, 255 - tc) << 24) |
                      ((100 - min(dist, 100)) << 16) |
                      ((255 - min(max_off, 255)) << 4))
                w = weights[fslot] if fslot < len(weights) else 1
                sum_fs += fs * w
                if (fs, w) > (best_fs, best_w) if match_type != 1 else \
                        (w, fs) > (best_w, best_fs):
                    best_fs, best_w = fs, w
            if not matched_q:
                continue
            ql = min(len(matched_q), 15)
            if match_type == 1:
                agg = (ql << 59) | (min(best_w, 127) << 51) | \
                    (best_fs << 3) | min(nmf, 7)
            elif match_type == 2:
                agg = (ql << 59) | (min(sum_fs, (1 << 56) - 1) << 3) | \
                    min(nmf, 7)
            else:
                agg = (ql << 59) | (best_fs << 11) | \
                    (min(best_w, 127) << 3) | min(nmf, 7)
            scores[hi, ti] = max(int(scores[hi, ti]), agg)
        return RawResult(raw.doc_ids, scores, raw.found, raw.facet_counts,
                         raw.out_of)

    @staticmethod
    def _split_join_alternatives(engine, tokens: list[str]) -> list[list[str]]:
        """Candidate token lists from joining adjacent tokens and splitting
        unknown tokens at dictionary boundaries (index.cpp:3851)."""
        alts: list[list[str]] = []
        vocab = engine.seg.term_to_id
        # join adjacent pairs
        for i in range(len(tokens) - 1):
            joined = tokens[i] + tokens[i + 1]
            if joined in vocab:
                alts.append(tokens[:i] + [joined] + tokens[i + 2:])
        # split tokens absent from the dictionary
        for i, tok in enumerate(tokens):
            if tok in vocab or len(tok) < 4:
                continue
            for cut in range(2, len(tok) - 1):
                a, b = tok[:cut], tok[cut:]
                if a in vocab and b in vocab:
                    alts.append(tokens[:i] + [a, b] + tokens[i + 1:])
                    break
        return alts[:3]

    def _apply_diversity(self, raw: RawResult, spec, fetch: int) -> RawResult:
        """Greedy MMR over the ranked candidates (diversity_t, diversity.h:
        14-39; similarity_t::calculate — equality or jaccard per field,
        weighted). score_i = lambda*relevance - (1-lambda)*max_sim(selected)."""
        import json as _json
        if isinstance(spec, str):
            try:
                spec = _json.loads(spec)
            except _json.JSONDecodeError:
                raise BadRequest("The `diversity` parameter is malformed.")
        lam = float(spec.get("lambda", 0.5))
        # diversity_lambda query param overrides the spec's lambda when in
        # [0, 1]; out-of-range values are silently ignored
        # (collection.cpp:8609-8616 DIVERSITY_LAMBDA stof + range check)
        if spec.get("_lambda_override") is not None:
            try:
                lo = float(spec["_lambda_override"])
                if 0.0 <= lo <= 1.0:
                    lam = lo
            except (TypeError, ValueError):
                pass
        eq = spec.get("similarity_equation", [])
        if not eq:
            raise BadRequest("`diversity.similarity_equation` is required.")
        metrics = []
        for m in eq:
            f = self.field_map.get(m.get("field", ""))
            if f is None:
                raise BadRequest(f"Unknown diversity field `{m.get('field')}`.")
            metrics.append((m["field"], m.get("method", "equality"),
                            float(m.get("weight", 1.0))))
        total_w = sum(w for _, _, w in metrics) or 1.0

        def sim(da: dict, db: dict) -> float:
            s = 0.0
            for fname, method, w in metrics:
                va, vb = da.get(fname), db.get(fname)
                if method == "jaccard" and isinstance(va, list) and \
                        isinstance(vb, list):
                    sa, sb = set(va), set(vb)
                    u = len(sa | sb)
                    s += w * (len(sa & sb) / u if u else 0.0)
                else:
                    s += w * (1.0 if va == vb and va is not None else 0.0)
            return s / total_w

        n = min(len(raw.doc_ids), max(fetch, 10) * 3)
        cands = [(int(raw.doc_ids[i]), i) for i in range(n)]
        docs = {seq: self.docs.get(seq, {}) for seq, _ in cands}
        selected: list[int] = []
        remaining = list(range(n))
        order: list[int] = []
        while remaining:
            best_j, best_score = remaining[0], -1e18
            for j in remaining:
                seq = cands[j][0]
                rel = 1.0 - j / max(n, 1)
                max_sim = max((sim(docs[seq], docs[cands[sj][0]])
                               for sj in selected), default=0.0)
                score = lam * rel - (1.0 - lam) * max_sim
                if score > best_score:
                    best_score, best_j = score, j
            selected.append(best_j)
            order.append(best_j)
            remaining.remove(best_j)
        idx = order + list(range(n, len(raw.doc_ids)))
        out = RawResult(doc_ids=raw.doc_ids[idx], scores=raw.scores[idx],
                        found=raw.found, facet_counts=raw.facet_counts,
                        out_of=raw.out_of)
        out.curated_seqs = getattr(raw, "curated_seqs", set())
        return out

    def _filter_mask_for(self, engine, filter_by: str,
                         validate: bool = True,
                         max_filter_by_candidates: int = 4):
        """Evaluate the (final) filter string against one segment's columns.

        Masks cache by (filter string, engine, write version) — the
        reference keeps a filter_result cache for the same reason
        (filter_result_iterator reuse). A stable mask OBJECT also lets the
        query coalescer batch concurrent identically-filtered searches
        (the batch signature keys on the mask's identity)."""
        if not filter_by:
            return None
        # join filters ($Coll(...)) depend on OTHER collections' state that
        # this collection's write version cannot see — never cache those
        cacheable = "$" not in filter_by
        cache = self.__dict__.setdefault("_filter_mask_cache", {})
        key = (filter_by, id(engine), validate, max_filter_by_candidates)
        if cacheable:
            hit = cache.get(key)
            if hit is not None and hit[0] == self._write_version:
                return hit[1]
        from typesense_tpu.search.filters import DeviceFilterEvaluator
        from typesense_tpu.search.joins import make_join_resolver
        node = parse_filter_query(filter_by)
        mask = DeviceFilterEvaluator(
            engine, join_resolver=make_join_resolver(self),
            id_resolver=self.id_to_seq,
            validate_field_names=validate,
            max_filter_by_candidates=max_filter_by_candidates,
        ).evaluate(node, self.field_map)
        if cacheable:
            if len(cache) > 64:
                cache.clear()
            cache[key] = (self._write_version, mask)
        return mask

    @staticmethod
    def _merge_segments(raws: list[RawResult]) -> RawResult:
        """Merge DISJOINT segments (main + delta): found/out_of sum, facet
        counts sum by value, ranked lists merge by sort keys (sort keys are
        absolute quantities, so cross-segment comparison is exact)."""
        best: dict[int, np.ndarray] = {}
        for r in raws:
            for i, d in enumerate(r.doc_ids):
                best[int(d)] = r.scores[i]
        if best:
            ids = np.array(list(best.keys()), dtype=np.int32)
            sc = np.stack([best[int(d)] for d in ids])
            order = np.lexsort((-ids.astype(np.int64), -sc[:, 2], -sc[:, 1],
                                -sc[:, 0]))
            ids, sc = ids[order], sc[order]
        else:
            ids = np.empty(0, np.int32)
            sc = np.empty((0, 3), np.int64)
        facets: dict = {}
        for r in raws:
            for fname, (values, counts) in r.facet_counts.items():
                if fname not in facets:
                    facets[fname] = {}
                for v, c in zip(values, np.asarray(counts)):
                    if c > 0:
                        facets[fname][v] = facets[fname].get(v, 0) + int(c)
        facet_counts = {f: (list(m.keys()),
                            np.asarray(list(m.values()), dtype=np.int64))
                        for f, m in facets.items()}
        return RawResult(doc_ids=ids, scores=sc,
                         found=sum(r.found for r in raws),
                         facet_counts=facet_counts,
                         out_of=sum(r.out_of for r in raws))

    @staticmethod
    def _merge_results(results: list[RawResult]) -> RawResult:
        """Dedupe by doc id keeping best sort keys, re-rank (topster union)."""
        if len(results) == 1:
            return results[0]
        best: dict[int, np.ndarray] = {}
        for r in results:
            for i, d in enumerate(r.doc_ids):
                cur = best.get(int(d))
                key = r.scores[i]
                if cur is None or tuple(key) > tuple(cur):
                    best[int(d)] = key
        if not best:
            return results[-1]
        ids = np.array(list(best.keys()), dtype=np.int32)
        sc = np.stack([best[int(d)] for d in ids])
        order = np.lexsort((-ids.astype(np.int64), -sc[:, 2], -sc[:, 1], -sc[:, 0]))
        return RawResult(doc_ids=ids[order], scores=sc[order],
                         found=max(max(r.found for r in results), len(best)),
                         facet_counts=results[0].facet_counts,
                         out_of=results[0].out_of)

    def _apply_curation(self, raw: RawResult, pinned_ids: list[str],
                        hidden_ids: set[str]) -> RawResult:
        """Pin/hide curated docs (process_curated_ids, index.cpp:3520)."""
        hidden_seqs = {self.id_to_seq[d] for d in hidden_ids if d in self.id_to_seq}
        pin_seqs = [self.id_to_seq[d] for d in pinned_ids if d in self.id_to_seq]
        keep = [i for i, d in enumerate(raw.doc_ids)
                if int(d) not in hidden_seqs and int(d) not in pin_seqs]
        ids = list(raw.doc_ids[keep])
        scores = list(raw.scores[keep])
        curated = set()
        for pos, seq in enumerate(pin_seqs):
            ids.insert(min(pos, len(ids)), np.int32(seq))
            scores.insert(min(pos, len(scores)), np.zeros(3, np.int64))
            curated.add(seq)
        found = raw.found - sum(1 for i, d in enumerate(raw.doc_ids)
                                if int(d) in hidden_seqs) \
            + sum(1 for s in pin_seqs
                  if s not in set(int(x) for x in raw.doc_ids))
        out = RawResult(doc_ids=np.array(ids, dtype=np.int32),
                        scores=(np.stack(scores) if scores
                                else np.empty((0, 3), np.int64)),
                        found=found, facet_counts=raw.facet_counts,
                        out_of=raw.out_of)
        out.curated_seqs = curated
        return out

    # ------------------------------------------------------------------
    def _hybrid_fuse(self, engine, raw_text: RawResult, vq, k, filter_mask,
                     facet_fields, vec_handles=None, rerank: bool = False
                     ) -> tuple[RawResult, dict[int, float]]:
        """Reciprocal-rank fusion (index.cpp:4093-4178): text results get
        (1/dense_text_rank)*(1-alpha); vector results add (1/(rank+1))*alpha;
        vector-only docs join the result set. rerank_hybrid_matches
        (index.cpp:4234 compute_aux_scores): keyword-matched docs outside
        the kNN candidate list also get exact vector distances, joining
        the vector ranking."""
        alpha = vq.alpha
        vk = vq.k or k
        if vec_handles is not None:
            ids, dists = engine.vector_search_collect(vec_handles, vk)
        else:
            ids, dists = engine.vector_search(
                vq.field_name, np.asarray(vq.values, np.float32), vk,
                filter_mask=filter_mask,
                distance_threshold=vq.distance_threshold)
        vec_dist_map = {int(i): float(d) for i, d in zip(ids, dists)}
        if rerank and len(raw_text.doc_ids):
            rows = engine.seg.vectors.get(vq.field_name)
            missing = [int(d) for d in raw_text.doc_ids
                       if int(d) not in vec_dist_map]
            if rows is not None and missing:
                qv = np.asarray(vq.values, np.float32)
                dm = 1.0 - rows[missing].astype(np.float32) @ qv
                for m, dd in zip(missing, dm):
                    vec_dist_map[m] = float(dd)
                # re-rank the vector component over the widened set
                ranked = sorted(vec_dist_map.items(), key=lambda kv: kv[1])
                ids = np.array([d for d, _ in ranked], dtype=np.int64)

        fused: dict[int, float] = {}
        text_rank = 0
        last_score = None
        for i, d in enumerate(raw_text.doc_ids):
            s = tuple(raw_text.scores[i])
            if s != last_score:
                text_rank += 1
            last_score = s
            fused[int(d)] = (1.0 / text_rank) * (1.0 - alpha)
        for rank, d in enumerate(ids):
            fused[int(d)] = fused.get(int(d), 0.0) + (1.0 / (rank + 1)) * alpha

        order = sorted(fused.items(), key=lambda kv: (-kv[1], -kv[0]))
        out_ids = np.array([d for d, _ in order], dtype=np.int32)
        # order-preserving float->int64 (index.cpp:266-274) for text_match slot
        fvals = np.array([v for _, v in order], dtype=np.float32)
        ints = fvals.view(np.int32).astype(np.int64)
        ints = np.where(ints < 0, ints ^ np.int64(2**31 - 1), ints)
        scores = np.zeros((len(out_ids), 3), dtype=np.int64)
        scores[:, 0] = ints
        found = max(raw_text.found, len(fused))
        facets = self._host_facets(engine, out_ids, facet_fields) if facet_fields \
            else raw_text.facet_counts
        return RawResult(doc_ids=out_ids, scores=scores, found=found,
                         facet_counts=facets, out_of=raw_text.out_of), vec_dist_map

    def _host_facets(self, engine, doc_ids: np.ndarray, facet_fields) -> dict:
        """Facet counting over an explicit (small) result id list."""
        out = {}
        for fname in facet_fields or []:
            col = engine.seg.facet_columns.get(fname)
            if col is None:
                continue
            offs, vals = col
            values = engine.seg.facet_values[fname]
            counts = np.zeros(len(values), dtype=np.int64)
            for d in doc_ids:
                for v in vals[offs[d]:offs[d + 1]]:
                    counts[v] += 1
            out[fname] = (values, counts)
        return out

    # ------------------------------------------------------------------
    def _parse_facet_by(self, facet_by) -> list[dict]:
        """Parse facet_by specs: `name`, `name(sort_by: _alpha:asc)`,
        range facets `price(Economy:[0,100], Luxury:[100,500])`
        (facet parsing, collection.cpp parse_facet — ranges are
        [inclusive_start, exclusive_end))."""
        from typesense_tpu.search.filters import _split_top_level
        specs: list[dict] = []
        for fspec in (s.strip() for s in _split_top_level(str(facet_by or ""), ",")):
            if not fspec:
                continue
            name, args = fspec, None
            if "(" in fspec and fspec.endswith(")"):
                name, argstr = fspec.split("(", 1)
                name = name.strip()
                args = argstr[:-1]
            f = self.field_map.get(name)
            if f is None:
                raise NotFound(f"Could not find a facet field named `{name}` in the schema.")
            if not f.facet:
                raise BadRequest(f"Field `{name}` is not a facet field in the schema.")
            spec = {"name": name, "ranges": [], "sort_field": "count",
                    "sort_order": "desc", "field": f}
            if args:
                for part in (p.strip() for p in _split_top_level(args, ",")):
                    if not part or ":" not in part:
                        continue
                    key, val = part.split(":", 1)
                    key, val = key.strip(), val.strip()
                    if key == "sort_by":
                        sb = [x.strip() for x in val.split(":")]
                        spec["sort_field"] = sb[0]
                        spec["sort_order"] = sb[1].lower() if len(sb) > 1 else "asc"
                    elif val.startswith("[") and val.endswith("]"):
                        if not (f.is_numeric and not f.is_bool):
                            raise BadRequest(f"Range facets can only be applied to "
                                             f"numerical fields (`{name}`).")
                        lo, hi = (x.strip() for x in val[1:-1].split(",", 1))
                        conv = float if f.is_float else int
                        spec["ranges"].append((key, conv(lo), conv(hi)))
                    else:
                        raise BadRequest(f"Invalid facet param `{key}` for `{name}`.")
            specs.append(spec)
        return specs

    # ------------------------------------------------------------------
    _DIST_UNIT_M = {"km": 1000.0, "mi": 1609.34, "m": 1.0}

    @classmethod
    def _parse_dist_m(cls, s: str) -> float:
        s = s.strip()
        for u in ("km", "mi"):
            if s.endswith(u):
                return float(s[:-len(u)]) * cls._DIST_UNIT_M[u]
        return float(s)

    def _parse_sort_by(self, sort_by: str, is_wildcard: bool,
                       engine=None) -> list[SortSpec]:
        """collection.cpp:1735-1825 default sort assembly. Supports
        `field:asc|desc`, `_text_match:desc`, `_vector_distance:asc`,
        geo `loc(48.8, 2.3, precision: 2km, exclude_radius: 1km):asc`,
        `_eval(filter):desc` / `_eval([(f1):3,(f2):1]):desc`, `_rand(seed)`,
        and `field(missing_values: first|last):asc`."""
        from typesense_tpu.search.filters import _split_top_level
        slots: list[SortSpec] = []
        specs = [s.strip() for s in _split_top_level(str(sort_by or ""), ",")
                 if s.strip()]
        if len(specs) > 3:
            raise BadRequest("Only upto 3 sort_by fields can be specified.")
        found_text_match = False
        for spec in specs:
            if ":" not in spec:
                raise BadRequest(f"Parameter `sort_by` is malformed.")
            name, order = spec.rsplit(":", 1)
            name, order = name.strip(), order.strip().lower()
            if order not in ("asc", "desc"):
                raise BadRequest(f"Order for field` {name}` should be either ASC or DESC.")
            sign = 1 if order == "desc" else -1

            args = None
            if "(" in name and name.endswith(")"):
                base, argstr = name.split("(", 1)
                args = argstr[:-1]
                name = base.strip()

            if name == "_text_match":
                slots.append(self._bucketed_slot(
                    kernels.SLOT_TEXT, sign, args, "_text_match"))
                found_text_match = True
            elif name == "_seq_id" or name == "id":
                slots.append(SortSpec(kernels.SLOT_SEQ_ID, sign))
            elif name == "_vector_distance":
                slots.append(self._bucketed_slot(
                    kernels.SLOT_VECTOR, -sign, args, "_vector_distance"))
            elif name == "_rand":
                seed = int(args) if args and args.strip() else 42
                col = engine.rand_column(seed) if engine is not None else None
                slots.append(SortSpec(kernels.SLOT_COLUMN, sign, custom_col=col))
            elif name == "_eval":
                if engine is None or args is None:
                    raise BadRequest("sort_by `_eval` requires a filter expression.")
                slots.append(self._eval_sort_slot(engine, args, sign))
            elif name.startswith("$"):
                # reference sort `$Coll(field):order` (join.h:77)
                from typesense_tpu.search.joins import join_sort_column
                import jax
                import jax.numpy as jnp
                if args is None:
                    raise BadRequest("Reference sort must be `$Coll(field):order`.")
                col_np = join_sort_column(self, name[1:], args.strip())
                slots.append(SortSpec(kernels.SLOT_COLUMN, sign,
                                      custom_col=jax.device_put(
                                          jnp.asarray(col_np))))
            else:
                f = self.field_map.get(name)
                if f is None:
                    raise NotFound(f"Could not find a field named `{name}` in the schema for sorting.")
                if f.is_geo:
                    slots.append(self._geo_sort_slot(engine, name, args, sign))
                    continue
                if not f.sort:
                    raise BadRequest(f"Field `{name}` is not a sortable type or `sort` has not "
                                     f"been enabled in the schema.")
                if args and "func" in args:
                    slots.append(self._decay_sort_slot(engine, name, args,
                                                       sign))
                    continue
                if args and "missing_values" in args:
                    policy = args.split(":", 1)[1].strip().lower()
                    if policy not in ("first", "last"):
                        raise BadRequest("missing_values must be `first` or `last`.")
                    col = engine.missing_values_column(name, policy, sign) \
                        if engine is not None else None
                    slots.append(SortSpec(kernels.SLOT_COLUMN, sign, column=name,
                                          custom_col=col))
                else:
                    slots.append(SortSpec(kernels.SLOT_COLUMN, sign, column=name))

        if not specs:
            if not is_wildcard:
                slots.append(SortSpec(kernels.SLOT_TEXT, 1))
                found_text_match = True
            if self.default_sorting_field:
                slots.append(SortSpec(kernels.SLOT_COLUMN, 1, column=self.default_sorting_field))
            else:
                slots.append(SortSpec(kernels.SLOT_SEQ_ID, 1))
        elif not found_text_match and not is_wildcard and len(slots) < 3:
            slots.append(SortSpec(kernels.SLOT_TEXT, 1))
        return slots[:3]

    def _geo_sort_slot(self, engine, name: str, args: str | None, sign: int) -> SortSpec:
        """`loc(48.8, 2.3[, precision: 2km][, exclude_radius: 1km]):asc`."""
        if args is None:
            raise BadRequest(f"Geopoint field `{name}` sort must specify "
                             f"coordinates, e.g. {name}(48.853, 2.344):asc.")
        from typesense_tpu.search.filters import _split_top_level
        parts = [p.strip() for p in _split_top_level(args, ",") if p.strip()]
        coords = []
        exclude_m = 0.0
        precision_m = 0.0
        for p in parts:
            if ":" in p:
                k, v = p.split(":", 1)
                k = k.strip().lower()
                if k == "exclude_radius":
                    exclude_m = self._parse_dist_m(v)
                elif k == "precision":
                    precision_m = self._parse_dist_m(v)
                else:
                    raise BadRequest(f"Invalid geo sort option `{k}`.")
            else:
                coords.append(float(p))
        if len(coords) != 2:
            raise BadRequest(f"Geopoint sort on `{name}` needs (lat, lng).")
        col = engine.geo_sort_column(name, coords[0], coords[1], exclude_m,
                                     precision_m, sign) if engine is not None else None
        return SortSpec(kernels.SLOT_COLUMN, sign, custom_col=col,
                        geo_field=name, geo_target=(coords[0], coords[1]))

    def _decay_sort_slot(self, engine, name: str, args: str,
                         sign: int) -> SortSpec:
        """Decay-function sort `field(func: gauss|exp|linear|diff,
        origin: X, scale: S[, offset: O][, decay: D]):order`
        (collection.cpp:1515-1550 parsing; Index::compute_decay_function_
        score, index.cpp:8925-8957) — computed as one fused device kernel
        over the sort column."""
        from typesense_tpu.search.filters import _split_top_level
        params = {}
        for p in _split_top_level(args, ","):
            if ":" not in p:
                raise BadRequest(f"Bad syntax for sorting field `{name}`")
            k, v = p.split(":", 1)
            params[k.strip().lower()] = v.strip()
        func = params.get("func", "")
        if func not in ("gauss", "exp", "linear", "diff"):
            raise BadRequest(f"Bad syntax. Not a valid decay function key "
                             f"`{func}`.")
        try:
            origin = int(params["origin"])
        except (KeyError, ValueError):
            raise BadRequest("sort_by: origin param should be integer.")
        offset = int(params.get("offset", 0))
        scale = 1
        if func != "diff":
            try:
                scale = int(params["scale"])
            except (KeyError, ValueError):
                raise BadRequest("sort_by: scale param should be non-zero "
                                 "integer.")
            if scale == 0:
                raise BadRequest("sort_by: scale param should be non-zero "
                                 "integer.")
        decay = float(params.get("decay", 0.5))
        if not 0.0 <= decay <= 1.0:
            raise BadRequest("sort_by: decay param should be float in range "
                             "[0.0, 1.0].")
        col = None
        if engine is not None:
            col = engine.decay_sort_column(name, func, origin, scale, offset,
                                           decay, sign)
        return SortSpec(kernels.SLOT_COLUMN, sign, custom_col=col)

    @staticmethod
    def _bucketed_slot(kind: int, sign: int, args, which: str) -> SortSpec:
        """`_text_match(buckets: N)` / `(bucket_size: N)` sort config
        (collection.cpp:1295-1315; same grammar for _vector_distance)."""
        spec = SortSpec(kind, sign)
        if args is None or not args.strip():
            return spec
        parts = args.split(":")
        key = parts[0].strip()
        if len(parts) != 2 or key not in ("buckets", "bucket_size"):
            raise BadRequest(
                f"Invalid sorting parameter passed for {which}.")
        val = parts[1].strip()
        if not val.isdigit():
            raise BadRequest(f"Invalid value passed for {which} `buckets` "
                             f"or `bucket_size` configuration.")
        if key == "buckets":
            spec.buckets = int(val)
        else:
            spec.bucket_size = int(val)
        return spec

    def _apply_score_buckets(self, raw: RawResult,
                             sort_slots: list[SortSpec]) -> RawResult:
        """Re-rank the top <=250 results with the text-match / vector
        scores collapsed into bucket sequence numbers, then restore the
        original scores (collection.cpp:2885-2933). Later sort components
        break ties within a bucket."""
        import math
        for si, s in enumerate(sort_slots):
            if not (s.buckets or s.bucket_size):
                continue
            n = min(250, len(raw.doc_ids))
            if n == 0:
                continue
            if not ((s.buckets > 0 and n >= s.buckets) or
                    (s.bucket_size > 0 and n >= s.bucket_size)):
                continue
            block = math.ceil(n / s.buckets) if s.buckets > 0 \
                else s.bucket_size
            scores = raw.scores.copy()
            orig = scores[:n, si].copy()
            for i in range(0, n, block):
                scores[i:i + block, si] = -i
            order = sorted(range(n),
                           key=lambda i: tuple(scores[i]), reverse=True)
            ids = raw.doc_ids.copy()
            ids[:n] = raw.doc_ids[order]
            scores[:n] = raw.scores[order]
            scores[:n, si] = orig[order]
            raw = RawResult(ids, scores, raw.found, raw.facet_counts,
                            raw.out_of)
        return raw

    def _eval_sort_slot(self, engine, args: str, sign: int) -> SortSpec:
        """`_eval(filter)` -> 1/0; `_eval([(f1):3, (f2):1])` -> weighted sum
        (sort_by_eval_t, collection.cpp sort parsing)."""
        from typesense_tpu.search.filters import DeviceFilterEvaluator, _split_top_level
        args = args.strip()
        pairs: list[tuple[str, int]] = []
        if args.startswith("[") and args.endswith("]"):
            for part in _split_top_level(args[1:-1], ","):
                part = part.strip()
                if not part:
                    continue
                if part.endswith(")") or ":" not in part.rsplit(")", 1)[-1]:
                    pairs.append((part, 1))
                else:
                    expr, w = part.rsplit(":", 1)
                    pairs.append((expr.strip(), int(w)))
        else:
            pairs.append((args, 1))
        from typesense_tpu.search.joins import make_join_resolver
        ev = DeviceFilterEvaluator(engine, join_resolver=make_join_resolver(self),
                                   id_resolver=self.id_to_seq)
        mw = []
        for expr, w in pairs:
            expr = expr.strip()
            if expr.startswith("(") and expr.endswith(")"):
                expr = expr[1:-1]
            node = parse_filter_query(expr)
            mask = ev.evaluate(node, self.field_map)
            mw.append((mask, w))
        return SortSpec(kernels.SLOT_COLUMN, sign,
                        custom_col=engine.mask_to_column(mw))

    # ------------------------------------------------------------------
    def _build_response(self, raw: RawResult, q, q_tokens, search_fields, params,
                        page, per_page, start, facet_fields, max_facet_values,
                        vec_dist_map: dict[int, float] | None = None,
                        sort_slots: list[SortSpec] | None = None,
                        facet_specs: list[dict] | None = None) -> dict:
        from typesense_tpu.search.filters import _split_top_level
        include_fields: set[str] = set()
        join_includes: list[tuple[str, list[str], str]] = []  # (coll, fields, strategy)
        for inc in (s.strip() for s in
                    _split_top_level(str(params.get("include_fields") or ""), ",")):
            if not inc:
                continue
            if inc.startswith("$") and "(" in inc and inc.endswith(")"):
                cname, argstr = inc[1:-1].split("(", 1)
                strategy = "nest"
                flds: list[str] = []
                for p in (x.strip() for x in _split_top_level(argstr, ",")):
                    if p.startswith("strategy"):
                        strategy = p.split(":", 1)[1].strip()
                    elif p and p != "*":
                        flds.append(p)
                join_includes.append((cname.strip(), flds, strategy))
            else:
                include_fields.add(inc)
        exclude_fields = set(_as_list(params.get("exclude_fields")))
        highlight_full = set(_as_list(params.get("highlight_full_fields")))
        hl_fields = _as_list(params.get("highlight_fields"))
        hl_start = params.get("highlight_start_tag", "<mark>")
        hl_end = params.get("highlight_end_tag", "</mark>")
        snippet_threshold = int(params.get("snippet_threshold", 30))
        affix_tokens = int(params.get("highlight_affix_num_tokens", 4))

        # limit_hits bounds retrievable depth (collection.cpp:2463
        # fetch_size = min(offset+per_page, limit_hits)); the engine may
        # over-fetch past `fetch` (top-K bucket rounding), so clamp here too
        page_end = min(start + per_page,
                       int(params.get("limit_hits", 1000000) or 1000000))
        hits = []
        page_ids = raw.doc_ids[start:page_end]
        page_scores = raw.scores[start:page_end]
        text_slot = None
        # find which slot carries text match for text_match_info
        if sort_slots is None:
            sort_slots = self._parse_sort_by(params.get("sort_by", ""),
                                             is_wildcard=(q == "*"))
        for i, s in enumerate(sort_slots):
            if s.kind == kernels.SLOT_TEXT:
                text_slot = i
                break

        # geo sorts expose per-hit distance (geo_distance_meters, collection.cpp
        # hit assembly for geopoint sorts)
        geo_dists: dict[str, np.ndarray] = {}
        for s in sort_slots:
            if s.geo_field is not None and len(page_ids):
                engine = self._ensure_index()
                geo_dists[s.geo_field] = engine.geo_distances_host(
                    s.geo_field, s.geo_target[0], s.geo_target[1],
                    np.asarray(page_ids))

        # one typo-match memo for the whole page of hits (highlight.py
        # TokenMatcher) — hit tokens repeat heavily across docs
        from typesense_tpu.search.highlight import TokenMatcher
        hl_matcher = TokenMatcher(q_tokens) if q_tokens else None

        for rank, seq_id in enumerate(page_ids):
            doc = self.docs.get(int(seq_id))
            if doc is None:
                continue
            out_doc = dict(doc)
            if include_fields:
                out_doc = self._include_paths(out_doc, include_fields)
            for ex in exclude_fields:
                self._exclude_path(out_doc, ex)

            # join hydration: $Coll(fields) include (join.h ref_include)
            for cname, flds, strategy in join_includes:
                from typesense_tpu.search.joins import referenced_docs
                refs = referenced_docs(self, doc, cname)
                if flds:
                    refs = [{k: v for k, v in r.items() if k in flds}
                            for r in refs]
                if strategy == "merge":
                    for r in refs:
                        out_doc.update(r)
                elif len(refs) == 1:
                    out_doc[cname] = refs[0]
                elif refs:
                    out_doc[cname] = refs

            # enable_highlight_v1 (collection.h:142, default true) gates the
            # LEGACY `highlights` array; the v2 `highlight` object always
            # ships (collection.cpp:3545 wrapper_doc["highlights"])
            ehv1 = _as_bool(params.get("enable_highlight_v1"), True)
            hit = {"document": out_doc, "highlight": {}}
            if ehv1:
                hit["highlights"] = []
            if q != "*" and q_tokens:
                hl_targets = hl_fields or search_fields
                hl, legacy = highlight_doc(self._flat_doc(doc), hl_targets,
                                           q_tokens, self.field_map,
                                           hl_start, hl_end, snippet_threshold,
                                           affix_tokens, highlight_full,
                                           matcher=hl_matcher)
                hit["highlight"] = hl
                if ehv1:
                    hit["highlights"] = legacy
            if text_slot is not None and q != "*":
                score = int(page_scores[rank][text_slot])
                hit["text_match"] = score
                hit["text_match_info"] = self._text_match_info(score, len(q_tokens))
            if vec_dist_map and int(seq_id) in vec_dist_map:
                hit["vector_distance"] = vec_dist_map[int(seq_id)]
            if geo_dists:
                hit["geo_distance_meters"] = {
                    f: int(d[rank]) for f, d in geo_dists.items() if d[rank] >= 0}
            if int(seq_id) in getattr(raw, "curated_seqs", ()):
                hit["curated"] = True
            hits.append(hit)

        facet_counts = self._assemble_facets(raw, facet_fields, max_facet_values,
                                             params, facet_specs)

        resp = {
            "facet_counts": facet_counts,
            "found": raw.found,
            "hits": hits,
            "out_of": raw.out_of,
            "page": page,
            "request_params": {
                "collection_name": self.name,
                "first_q": q,
                "per_page": per_page,
                "q": q,
            },
            "search_cutoff": False,
        }
        if "out_of" in exclude_fields:
            # exclude_fields also hides top-level meta keys
            # (collection_specific_more_test.cpp MustExcludeOutOf)
            resp.pop("out_of")
        return resp

    def _build_grouped_response(self, raw: RawResult, q, q_tokens, search_fields,
                                params, page, per_page, start, facet_fields,
                                max_facet_values, group_fields, group_limit,
                                group_missing_values, vec_dist_map,
                                sort_slots=None, facet_specs=None) -> dict:
        """grouped_hits assembly (collection.cpp:3078-3206). Groups are keyed
        by the tuple of group field values; group order = best-hit order;
        each group keeps up to group_limit hits."""
        groups: dict = {}
        order: list = []
        for i, seq in enumerate(raw.doc_ids):
            doc = self.docs.get(int(seq))
            if doc is None:
                continue
            key_vals = []
            missing = False
            for gf in group_fields:
                v = doc.get(gf)
                if v is None:
                    missing = True
                key_vals.append(tuple(v) if isinstance(v, list) else v)
            gk = tuple(key_vals) if (group_missing_values or not missing) \
                else ("__uniq__", int(seq))
            if gk not in groups:
                groups[gk] = []
                order.append(gk)
            if len(groups[gk]) < max(group_limit, 1):
                groups[gk].append(i)

        # EXACT per-group counts + total group count when grouping on one
        # scalar facet field: the dispatch counted the group field over the
        # FULL matched set (the reference instead estimates with LogLogBeta
        # + CountMinSketch, topster.h:252-264)
        exact_counts = None
        single_scalar = (len(group_fields) == 1 and
                         not self.field_map[group_fields[0]].is_array)
        if single_scalar and group_fields[0] in raw.facet_counts:
            vals, counts = raw.facet_counts[group_fields[0]]
            counts = np.asarray(counts)
            exact_counts = {v: int(c) for v, c in zip(vals, counts) if c}

        # `_group_found` sort: order groups by member count
        # (SortingOnGroupCount, collection_grouping_test.cpp:826)
        gf_order = params.get("_group_found_order")
        if gf_order:
            def _found_of(gk):
                idxs = groups[gk]
                if exact_counts is not None and gk and gk[0] is not None \
                        and gk[0] != "__uniq__":
                    d0 = self.docs.get(int(raw.doc_ids[idxs[0]]))
                    v = d0.get(group_fields[0]) if d0 else None
                    return exact_counts.get(str(v), len(idxs))
                return len(idxs)
            order.sort(key=_found_of, reverse=(gf_order == "desc"))

        # hydrate page of groups through the normal hit builder
        page_keys = order[start:min(
            start + per_page,
            int(params.get("limit_hits", 1000000) or 1000000))]
        base = self._build_response(raw, q, q_tokens, search_fields,
                                    {**params, "limit_hits": None,
                                     "per_page": len(raw.doc_ids)},
                                    1, max(len(raw.doc_ids), 1), 0,
                                    facet_fields, max_facet_values,
                                    vec_dist_map=vec_dist_map,
                                    sort_slots=sort_slots,
                                    facet_specs=facet_specs)
        hit_by_rank = {i: h for i, h in enumerate(base["hits"])}

        truncated = False
        grouped = []
        for gk in page_keys:
            idxs = groups[gk]
            doc0 = self.docs.get(int(raw.doc_ids[idxs[0]]))
            gkey = []
            for gf in group_fields:
                v = doc0.get(gf)
                gkey.append(v)
            gfound = len(idxs)
            if exact_counts is not None and gk[0] is not None:
                gfound = exact_counts.get(str(gkey[0]), gfound)
            if len(idxs) < min(max(group_limit, 1), gfound):
                truncated = True   # deeper hits exist beyond the ranked list
            grouped.append({
                "group_key": gkey,
                "found": gfound,
                "hits": [hit_by_rank[i] for i in idxs if i in hit_by_rank],
            })
        if exact_counts is not None:
            n_groups = len(exact_counts)
            if not group_missing_values or any(
                    gk[0] is None for gk in order):
                # missing-value groups aren't facet-counted; add what we saw
                n_groups += sum(1 for gk in order
                                if gk and (gk[0] is None
                                           or gk[0] == "__uniq__"))
        else:
            n_groups = len(order)
            if raw.found > len(raw.doc_ids) and len(raw.doc_ids):
                n_groups = int(raw.found * n_groups / len(raw.doc_ids))
        if len(order) < start + per_page and n_groups > len(order) and \
                raw.found > len(raw.doc_ids):
            truncated = True       # groups exist beyond the ranked list
        base.pop("hits", None)
        base["grouped_hits"] = grouped
        base["found"] = n_groups
        base["found_docs"] = raw.found
        base["page"] = page
        if truncated and len(raw.doc_ids) < raw.found:
            base["_groups_truncated"] = True
        return base

    def _assemble_facets(self, raw: RawResult, facet_fields, max_facet_values,
                         params, facet_specs: list[dict] | None) -> list[dict]:
        """Facet response assembly: value counts (with facet_query narrowing +
        highlighting), range facets over distinct numeric values, and numeric
        stats min/max/sum/avg (do_facets + Collection facet JSON,
        collection.cpp facet_counts assembly)."""
        # facet_sample_percent/threshold (Index::search facet sampling,
        # index.cpp do_facets sampling): the reference estimates counts from
        # a sample when the match set is large. Our facet counting is FUSED
        # into the scoring scan (one-hot reduce over dense value columns) —
        # a sample mask would cost more than it saves — so counts stay
        # EXACT; the `sampled` flag reports whether the reference would
        # have sampled under these params (API-compatible superset:
        # exact >= estimated accuracy).
        sample_pct = int(params.get("facet_sample_percent", 100))
        sample_thresh = int(params.get("facet_sample_threshold", 0))
        if not (0 <= sample_pct <= 100):
            raise BadRequest("Value of `facet_sample_percent` must be "
                             "less than 100.")
        # facet_sample_slope: dynamic percent from corpus size
        # (collection.cpp:2660-2662 — percent = max(5, 100 - slope/100 *
        # (num_docs - threshold) / threshold))
        sample_slope = int(params.get("facet_sample_slope", 0))
        if sample_slope > 100:
            raise BadRequest("Value of `facet_sample_slope` must be less "
                             "than 100.")
        if sample_slope > 0 and sample_thresh == 0:
            raise BadRequest("Value of `facet_sample_threshold` must be "
                             "greater than 0 with `facet_sample_slope`.")
        if sample_slope > 0 and sample_thresh > 0:
            sample_pct = int(max(
                5.0, 100 - (sample_slope / 100.0)
                * (len(self.docs) - sample_thresh) / sample_thresh))
        would_sample = 0 < sample_pct < 100 and raw.found > sample_thresh
        if facet_specs is None:
            facet_specs = [{"name": n, "ranges": [], "sort_field": "count",
                            "sort_order": "desc", "field": self.field_map.get(n)}
                           for n in facet_fields]
        fq_field = fq_value = None
        facet_query = str(params.get("facet_query", "") or "")
        if facet_query and ":" in facet_query:
            fq_field, fq_value = (s.strip() for s in facet_query.split(":", 1))

        hl_start = params.get("highlight_start_tag", "<mark>")
        hl_end = params.get("highlight_end_tag", "</mark>")

        out = []
        for spec in facet_specs:
            fname = spec["name"]
            f = spec.get("field") or self.field_map.get(fname)
            values, counts = raw.facet_counts.get(fname, ([], np.zeros(0, np.int64)))
            counts = np.asarray(counts)

            # numeric stats over distinct (value, count) pairs
            stats = {"total_values": int((counts > 0).sum())}
            if f is not None and f.is_numeric and not f.is_bool and len(values):
                present = counts > 0
                if present.any():
                    nums = np.array([float(v) for v in values])
                    pv, pc = nums[present], counts[present]
                    stats.update({
                        "min": float(pv.min()), "max": float(pv.max()),
                        "sum": float((pv * pc).sum()),
                        "avg": float((pv * pc).sum() / pc.sum()),
                    })

            if spec["ranges"]:
                nums = np.array([float(v) for v in values]) if len(values) else \
                    np.zeros(0)
                entries = []
                for label, lo, hi in spec["ranges"]:
                    inb = (nums >= lo) & (nums < hi)
                    c = int(counts[inb].sum()) if len(values) else 0
                    if c > 0:
                        entries.append({"count": c, "highlighted": label,
                                        "value": label})
                out.append({"field_name": fname, "sampled": would_sample,
                            "counts": entries, "stats": stats})
                continue

            idx = [i for i in range(len(values)) if counts[i] > 0]
            highlighted = {i: values[i] for i in idx}
            if fq_field == fname and fq_value:
                fql = fq_value.lower()
                # facet_query_num_typos (collection.h:932, default 2):
                # words in a facet value also match the query within N
                # edits on the same-length prefix
                fq_typos = int(params.get("facet_query_num_typos", 2) or 0)
                kept = []
                for i in idx:
                    v = values[i]
                    pos = v.lower().find(fql) if isinstance(v, str) else -1
                    if pos == 0 or (pos > 0 and not v[pos - 1].isalnum()):
                        highlighted[i] = (v[:pos] + hl_start + v[pos:pos + len(fql)]
                                          + hl_end + v[pos + len(fql):])
                        kept.append(i)
                    elif fq_typos > 0 and isinstance(v, str) and \
                            len(fql) >= 4:
                        # typo budget gated by query length like keyword
                        # search (min_len_1typo=4 / min_len_2typo=7)
                        budget = min(fq_typos, 1 if len(fql) < 7 else 2)
                        for w in v.split():
                            if _edit_distance_le(w.lower()[:len(fql)],
                                                 fql, budget):
                                at = v.find(w)
                                end = at + min(len(fql), len(w))
                                highlighted[i] = (v[:at] + hl_start +
                                                  v[at:end] + hl_end +
                                                  v[end:])
                                kept.append(i)
                                break
                idx = kept

            if spec["sort_field"] not in ("count", "_alpha", "_value"):
                # facet values ordered by ANOTHER field's value
                # (FacetSortByOtherField, collection_faceting_test.cpp:2949:
                # `receipe.name(sort_by: receipe.calories:desc)`)
                sf = spec["sort_field"]
                sfield = self.field_map.get(sf)
                if sfield is None:
                    raise BadRequest(f"Could not find a field named `{sf}` "
                                     f"in the schema for sorting facet "
                                     f"values.")
                if not sfield.is_numeric:
                    raise BadRequest(f"Facet field `{fname}` can only be "
                                     f"sorted by a numerical field.")
                keymap = self._facet_sort_keymap(fname, sf)
                idx.sort(key=lambda i: -counts[i])        # count tie-break
                idx.sort(key=lambda i: keymap.get(values[i], float("-inf")))
                if spec["sort_order"] == "desc":
                    idx.reverse()   # reference flips ties with direction
            elif spec["sort_field"] == "_alpha":
                idx.sort(key=lambda i: str(values[i]).lower(),
                         reverse=(spec["sort_order"] == "desc"))
            elif spec["sort_field"] == "_value" and f is not None and f.is_numeric:
                idx.sort(key=lambda i: float(values[i]),
                         reverse=(spec["sort_order"] == "desc"))
            else:
                idx.sort(key=lambda i: (-int(counts[i]), str(values[i])))
            idx = idx[:max_facet_values]

            # facet_return_parent=a.b,...: counts carry the IMMEDIATE
            # parent object of the dotted facet field
            # (FacetingReturnParent, collection_faceting_test.cpp:2288)
            ret_parent = {x.strip() for x in
                          str(params.get("facet_return_parent", ""))
                          .split(",") if x.strip()}
            pmap = self._facet_parent_map(fname) \
                if (fname in ret_parent and "." in fname) else None

            def entry(i):
                e = {"count": int(counts[i]),
                     "highlighted": highlighted[i],
                     "value": values[i]}
                if pmap is not None:
                    p = pmap.get(str(values[i]))
                    if p is not None:
                        e["parent"] = p
                return e

            out.append({
                "field_name": fname,
                "sampled": would_sample,
                "counts": [entry(i) for i in idx],
                "stats": stats,
            })
        return out

    @staticmethod
    def _rescale_synonym_scores(raw: RawResult, orig_len: int, alt_len: int,
                                sort_slots, match_type: int = 0,
                                demote: bool = False) -> RawResult:
        """A synonym match must score exactly like the ROOT query
        (SynonymsTextMatchSameAsRootQuery): query_len is forced to the
        original token count and every field-score component scales by
        orig/alt with truncation (score_results2 rel_factor,
        index.cpp; compute_aggregated_score forces query_len).
        demote_synonym_match (index.cpp:6994) zeroes the synonym_score
        bits so synonym hits rank below otherwise-equal root hits."""
        if raw.found == 0 or alt_len == 0 or match_type == 2 or \
                (orig_len == alt_len and not demote):
            return raw
        ti = next((i for i, s in enumerate(sort_slots)
                   if s.kind == kernels.SLOT_TEXT and s.sign == 1), None)
        if ti is None:
            return raw
        if orig_len == alt_len:
            # demote-only path: clear the synonym bits (field score sits at
            # bit 11 in MAX_SCORE / bit 3 in MAX_WEIGHT; syn = fs bits 0-3)
            shift = 3 if match_type == 1 else 11
            s = raw.scores[:, ti].copy()
            s = np.where(s != 0, s & ~(np.int64(0xF) << shift), s)
            scores = raw.scores.copy()
            scores[:, ti] = s
            return RawResult(raw.doc_ids, scores, raw.found,
                             raw.facet_counts, raw.out_of)
        rel = orig_len / alt_len
        s = raw.scores[:, ti].copy()
        nonzero = s != 0
        if match_type == 1:      # [ql(4) | weight(8) | fs(48) | nmf(3)]
            fs = (s >> 3) & ((1 << 48) - 1)
            rest = s & 0b111 | (((s >> 51) & 0xFF) << 51)
            fs_shift = 3
        else:                    # [ql(4) | fs(48) | weight(8) | nmf(3)]
            fs = (s >> 11) & ((1 << 48) - 1)
            rest = s & ((1 << 11) - 1)
            fs_shift = 11
        wp = (fs >> 40) & 0xFF
        uw = (fs >> 32) & 0xFF
        cost = 255 - ((fs >> 24) & 0xFF)
        dist = 100 - ((fs >> 16) & 0xFF)
        ex = (fs >> 12) & 0xF
        off_rev = 255 - ((fs >> 4) & 0xFF)
        syn = fs & 0xF
        if alt_len == 1 and orig_len > 1:
            # single-token synonym (compression, e.g. 'laughing out loud'
            # -> 'lol'): the reference's single-token branch assigns
            # words = orig_len and distance = orig_len - 1 — the score the
            # ORIGINAL adjacent-token match would get
            # (score_results2 posting_lists.size() <= 1 branch)
            wp2 = np.full_like(wp, min(orig_len, 255))
            uw2 = np.full_like(uw, min(orig_len, 255))
            cost2 = cost
            dist2 = np.full_like(dist, min(orig_len - 1, 100))
        else:
            wp2 = np.minimum((wp * rel).astype(np.int64), 255)
            uw2 = np.minimum((uw * rel).astype(np.int64), 255)
            cost2 = np.minimum((cost * rel).astype(np.int64), 255)
            dist2 = np.minimum((dist * rel).astype(np.int64), 100)
        offr2 = np.minimum((off_rev * rel).astype(np.int64), 255)
        off_byte = (fs >> 4) & 0xFF
        off2 = np.where(off_byte == 0, 0, 255 - offr2)  # 0 unless ptp set it
        if demote:
            syn = np.zeros_like(syn)
        fs2 = ((wp2 << 40) | (uw2 << 32) | ((255 - cost2) << 24) |
               ((100 - dist2) << 16) | (ex << 12) |
               (off2 << 4) | syn)
        ql2 = np.int64(min(orig_len, 15))
        s2 = (ql2 << 59) | (fs2 << fs_shift) | rest
        scores = raw.scores.copy()
        scores[:, ti] = np.where(nonzero, s2, s)
        return RawResult(raw.doc_ids, scores, raw.found, raw.facet_counts,
                         raw.out_of)

    @classmethod
    def _include_paths(cls, doc: dict, paths: set, prefix: str = "") -> dict:
        """Keep only the listed (possibly dotted) paths, descending into
        objects and object arrays (prune_doc, collection.cpp;
        IncludeExcludeFieldsPruning)."""
        out = {}
        for k, v in doc.items():
            p = f"{prefix}{k}"
            if p in paths or (not prefix and k == "id"):
                out[k] = v
                continue
            has_sub = any(x.startswith(p + ".") for x in paths)
            if not has_sub:
                continue
            if isinstance(v, dict):
                sub = cls._include_paths(v, paths, p + ".")
                if sub:
                    out[k] = sub
            elif isinstance(v, list) and v and all(
                    isinstance(x, dict) for x in v):
                out[k] = [cls._include_paths(x, paths, p + ".") for x in v]
        return out

    @classmethod
    def _exclude_path(cls, doc: dict, path: str):
        """Remove a (possibly dotted) path in place."""
        head, _, rest = path.partition(".")
        if not rest:
            doc.pop(head, None)
            return
        v = doc.get(head)
        if isinstance(v, dict):
            cls._exclude_path(v, rest)
        elif isinstance(v, list):
            for x in v:
                if isinstance(x, dict):
                    cls._exclude_path(x, rest)

    def _facet_parent_map(self, facet_field: str) -> dict:
        """facet value -> the IMMEDIATE parent object of the dotted facet
        field (facet_return_parent, FacetingReturnParent,
        collection_faceting_test.cpp:2288). Cached per write version."""
        cache = self.__dict__.setdefault("_facet_parent_cache", {})
        hit = cache.get(facet_field)
        if hit is not None and hit[0] == self._write_version:
            return hit[1]
        parent_path = facet_field.rsplit(".", 1)[0]
        m: dict = {}
        for doc in self.docs.values():
            node = doc
            for part in parent_path.split("."):
                node = node.get(part) if isinstance(node, dict) else None
                if node is None:
                    break
            if not isinstance(node, dict):
                continue
            leaf = node.get(facet_field.rsplit(".", 1)[1])
            if leaf is None:
                continue
            for v in (leaf if isinstance(leaf, list) else [leaf]):
                m.setdefault(str(v), node)
        cache[facet_field] = (self._write_version, m)
        return m

    def _facet_sort_keymap(self, facet_field: str, sort_field: str) -> dict:
        """facet value -> companion sort-field value (facet sort_by another
        field; the reference keeps this mapping in its facet index). Cached
        per (facet, sort) pair, invalidated by _write_version."""
        cache = self.__dict__.setdefault("_facet_sortkey_cache", {})
        key = (facet_field, sort_field)
        hit = cache.get(key)
        if hit is not None and hit[0] == self._write_version:
            return hit[1]
        flatten = self._needs_flatten()
        m: dict = {}
        for doc in self.docs.values():
            d = self._flat_doc(doc) if flatten else doc
            fv = d.get(facet_field)
            sv = d.get(sort_field)
            if fv is None or sv is None:
                continue
            for v in (fv if isinstance(fv, list) else [fv]):
                m.setdefault(v, sv)
        cache[key] = (self._write_version, m)
        return m

    @staticmethod
    def _text_match_info(score: int, total_tokens: int) -> dict:
        """collection.cpp:4295 populate_text_match_info (max_score layout)."""
        def bits(v, pos, n):
            return (v >> pos) & ((1 << n) - 1)
        tokens_matched = bits(score, 59, 4)
        return {
            "best_field_score": str(bits(score, 11, 48)),
            "best_field_weight": bits(score, 3, 8),
            "fields_matched": bits(score, 0, 3),
            "num_tokens_dropped": max(0, total_tokens - tokens_matched),
            "score": str(score),
            "tokens_matched": tokens_matched,
            "typo_prefix_score": 255 - bits(score, 35, 8),
        }

    # ------------------------------------------------------------------
    def get_summary_json(self) -> dict:
        return {
            "name": self.name,
            "num_documents": self.num_documents,
            "fields": [f.to_json() for f in self.fields],
            "default_sorting_field": self.default_sorting_field,
            "created_at": self.created_at,
            "enable_nested_fields": self.enable_nested_fields,
            "symbols_to_index": self.symbols_to_index,
            "token_separators": self.token_separators,
            **({"voice_query_model": self.voice_query_model}
               if self.voice_query_model else {}),
        }
