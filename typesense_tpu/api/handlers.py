"""REST API handlers.

Behavior contract: /root/reference/src/core_api.cpp — handler per route,
same response shapes (e.g. import returns JSONL of per-doc results,
export streams JSONL, delete-by-filter returns {"num_deleted": N}).
Handlers run on the server's worker pool; `server` is the HttpServer.
"""

from __future__ import annotations

import json
import time

from typesense_tpu import __version__
from typesense_tpu.core.errors import BadRequest, NotFound


# ---------------------------------------------------------------------------
# collections
# ---------------------------------------------------------------------------

def get_collections(server, req):
    """GET /collections with limit/offset pagination and exclude_fields
    (core_api.cpp:230-266 get_collections)."""
    out = server.manager.list_collections()
    offset = int(req.query.get("offset", 0) or 0)
    limit = int(req.query.get("limit", 0) or 0)
    if offset:
        out = out[offset:]
    if limit:
        out = out[:limit]
    excl = [x.strip() for x in str(req.query.get("exclude_fields", ""))
            .split(",") if x.strip()]
    if excl:
        out = [{k: v for k, v in c.items() if k not in excl} for c in out]
    return out


def post_create_collection(server, req):
    """POST /collections; with ?src_name=<coll> clones the source schema
    (+ documents when ?copy_documents=true) — core_api.cpp:279-293
    clone_collection."""
    body = req.json()
    src = req.query.get("src_name")
    if src:
        source = server.manager.get_collection(src)
        schema = source.get_summary_json()
        for drop in ("num_documents", "created_at"):
            schema.pop(drop, None)
        schema.update(body or {})
        if not schema.get("name") or schema["name"] == src:
            raise BadRequest("Invalid collection name.")
        coll = server.manager.create_collection(schema)
        if str(req.query.get("copy_documents", "")).lower() == "true":
            coll.add_many([dict(d) for _, d in sorted(source.docs.items())],
                          operation="upsert")
        return 201, coll.get_summary_json()
    coll = server.manager.create_collection(body)
    return 201, coll.get_summary_json()


def get_collection_summary(server, req):
    return server.manager.get_collection(req.params["collection"]).get_summary_json()


def patch_update_collection(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    body = req.json()
    if "fields" not in body:
        raise BadRequest("Only `fields` and `metadata` can be updated at the moment.")
    from typesense_tpu.schema.field import Field
    if not isinstance(body["fields"], list) or not all(
            isinstance(fj, dict) and fj.get("name") and
            (fj.get("drop") or fj.get("type"))
            for fj in body["fields"]):
        raise BadRequest("Wrong format for `fields`. It should be an array "
                         "of objects containing `name`, `type`, `optional` "
                         "and `facet` properties.")
    drops = {fj["name"] for fj in body["fields"] if fj.get("drop")}
    adds = [fj for fj in body["fields"] if not fj.get("drop")]
    # validation pass BEFORE mutating (alter is atomic in the reference)
    for name in drops:
        if name not in coll.field_map:
            raise BadRequest(f"Field `{name}` is not part of collection "
                             f"schema.")
    for fj in adds:
        # modifying an existing field requires drop + re-add — allowed in
        # the SAME alter, order-independent (collection.cpp validate_alter,
        # AbilityToDropAndReAddIndexAtTheSameTime / OrderOfDropShouldNotMatter)
        if fj["name"] in coll.field_map and fj["name"] not in drops:
            raise BadRequest(
                f"Field `{fj['name']}` is already part of the schema: To "
                f"change this field, drop it first before adding it back "
                f"to the schema.")
    # every added embed field's `from` sources must exist in the POST-alter
    # schema (reference alter validation rejects dangling embed sources;
    # otherwise later document indexing fails on the missing source)
    post_names = ({f.name for f in coll.fields} - drops) | \
        {fj["name"] for fj in adds}
    for fj in adds:
        emb = fj.get("embed")
        if isinstance(emb, dict):
            for src in emb.get("from", []):
                if src not in post_names:
                    raise BadRequest(
                        f"Field `{src}` referenced in `embed.from` of field "
                        f"`{fj['name']}` does not exist in the schema.")
    # existing stored data must be coercible into every ADDED field's type
    # (the reference's validate_alter_payload re-validates stored docs,
    # collection.cpp — DropIntegerFieldAndAddStringValues pins the error)
    new_fields = [Field.from_json(fj) for fj in adds]
    check = [f for f in new_fields
             if f.index and f.type not in ("auto", "string*")
             and not (f.name == ".*" or f.is_dynamic
                      or f.is_object or f.embed or f.is_vector)]
    if check and coll.docs:
        from typesense_tpu.schema.validator import validate_document
        for _seq, doc in coll.docs.items():
            for f in check:
                v = doc.get(f.name)
                if v is None:
                    continue
                try:
                    validate_document({f.name: v}, [f], "coerce_or_reject")
                except BadRequest:
                    art = "an" if f.type[:1] in "aio" else "a"
                    raise BadRequest(
                        "Schema change is incompatible with the type of "
                        "documents already stored in this collection. "
                        f"Existing data for field `{f.name}` cannot be "
                        f"coerced into {art} {f.type}.") from None
    for name in drops:
        coll.fields = [f for f in coll.fields if f.name != name]
        coll.field_map.pop(name, None)
    for f in new_fields:
        coll.fields.append(f)
        coll.field_map[f.name] = f
    # an alter-added dynamic pattern / auto field materializes concrete
    # fields from every STORED doc, not just future ones
    # (collection_schema_change_test.cpp AddDynamicFieldMatchingMultipleFields)
    if coll.docs and any(f.is_dynamic or f.name == ".*" or f.type == "auto"
                         for f in new_fields):
        from typesense_tpu.schema.nested import materialize_dynamic_fields
        for _seq, doc in coll.docs.items():
            for nf in materialize_dynamic_fields(coll, doc):
                if nf.name in coll.field_map:   # concrete-named auto/string*
                    coll.fields = [f for f in coll.fields
                                   if f.name != nf.name]
                coll.fields.append(nf)
                coll.field_map[nf.name] = nf
    # dropping a source field prunes it from dependent embed `from` lists;
    # an embed field whose last source drops is dropped with it
    # (schema_change_test.cpp DropFieldUsedForEmbedding)
    re_added = {fj["name"] for fj in adds}
    doomed = []
    for f in coll.fields:
        if f.embed and f.name not in re_added:
            srcs = [s for s in f.embed.get("from", [])
                    if s not in drops or s in re_added]
            if srcs != f.embed.get("from"):
                if srcs:
                    f.embed["from"] = srcs
                else:
                    doomed.append(f.name)
    for name in doomed:
        coll.fields = [f for f in coll.fields if f.name != name]
        coll.field_map.pop(name, None)
    coll._schema_stamp += 1   # invalidate cached per-doc schema plans
    coll._dirty = True
    server.manager.persist_collection_meta(coll)
    return body


def del_drop_collection(server, req):
    return server.manager.drop_collection(req.params["collection"])


# ---------------------------------------------------------------------------
# documents
# ---------------------------------------------------------------------------

def _apply_preset(server, params: dict) -> dict:
    """Merge a named preset under explicit request params
    (collection_search_args_t::init preset handling,
    collection_manager.cpp:1421 — request params win)."""
    pname = params.get("preset")
    if not pname:
        return params
    try:
        preset = server.manager.get_preset(str(pname))
    except Exception:  # noqa: BLE001 — unknown preset is ignored like reference
        return params
    if isinstance(preset, dict):
        merged = dict(preset)
        merged.update(params)
        return merged
    return params


def _apply_personalization(server, coll, params):
    """Recommendation search (collection.cpp:8117-8246
    parse_and_validate_personalization_query): `q=*` plus
    personalization_* params → pull the user's recent events, read each
    event doc's user_field vector, run the personalization tower into one
    query vector on item_field, and exclude already-seen docs."""
    pkeys = ("personalization_user_id", "personalization_model_id",
             "personalization_type", "personalization_user_field",
             "personalization_item_field", "personalization_event_name")
    n_events = int(params.get("personalization_n_events", 0) or 0)
    if not any(params.get(k) for k in pkeys) and n_events <= 0:
        return params
    q = str(params.get("q", "") or "")
    if q not in ("", "*"):
        raise BadRequest("Personalization is not allowed when query is "
                         "used. It should be only `*` or empty.")
    if params.get("vector_query"):
        raise BadRequest("Vector query is not allowed when personalization "
                         "is done.")
    if not params.get("personalization_model_id"):
        raise BadRequest("Personalization model ID is required when "
                         "recommendation is done.")
    if not params.get("personalization_type"):
        raise BadRequest("Personalization type is required when "
                         "recommendation is done.")
    if not params.get("personalization_user_field"):
        raise BadRequest("Personalization user field is required when "
                         "recommendation is done.")
    if not params.get("personalization_item_field"):
        raise BadRequest("Personalization item field is required when "
                         "recommendation is done.")
    if n_events <= 0:
        raise BadRequest("Personalization n_events must be greater than 0 "
                         "when recommendation is done.")
    if params["personalization_type"] != "recommendation":
        raise BadRequest("Personalization type must be only "
                         "`recommendation`.")
    if not params.get("personalization_event_name"):
        raise BadRequest("Personalization event name is required when "
                         "recommendation is done.")
    try:
        server.pers_models.get(params["personalization_model_id"])
    except NotFound as e:
        raise BadRequest(e.message)
    evs = server.analytics.get_events(
        params.get("personalization_user_id", ""),
        params["personalization_event_name"], n_events)
    if not evs:
        raise BadRequest("No events found for the user.")
    doc_ids = []
    for e in evs:
        d = e.get("data", {})
        if "doc_ids" in d:
            raise BadRequest("Try using an event only with doc_id instead "
                             "of doc_ids")
        doc_ids.append(str(d.get("doc_id")))
    user_field = params["personalization_user_field"]
    embs = []
    for did in doc_ids:
        seq = coll.id_to_seq.get(did)
        if seq is None:
            continue
        doc = coll.docs.get(seq)
        if doc is None:
            raise BadRequest("Document id referenced in event is not "
                             "found.")
        v = doc.get(user_field)
        if not isinstance(v, list) or \
                not all(isinstance(x, (int, float)) for x in v):
            raise BadRequest("Document referenced in event does not "
                             "contain a valid vector field.")
        embs.append([float(x) for x in v])
    uvec = server.pers_models.user_vector_from_embeddings(
        params["personalization_model_id"], embs)
    out = {k: v for k, v in params.items()
           if k not in pkeys and k != "personalization_n_events"}
    item_field = params["personalization_item_field"]
    out["vector_query"] = (
        f"{item_field}:([" + ",".join(f"{x:.8f}" for x in uvec) + "])")
    excl = "id:!=[" + ",".join(doc_ids) + "]"
    fb = out.get("filter_by", "")
    out["filter_by"] = f"{fb} && {excl}" if fb else excl
    return out


def _apply_nl_query(server, coll, params):
    """nl_query=true: translate the free-form `q` into structured search
    params through the collection's NL model and merge them — generated
    filter_by ANDs onto any caller filter, q/sort_by replace
    (natural_language_search_model_manager.cpp:345-430). On model failure
    the original q serves as-is and the error rides parsed_nl_query.
    Returns the response fragment to attach, or None."""
    if str(params.get("nl_query", "false")).lower() != "true" \
            or not params.get("q") or params["q"] == "*":
        return None
    import time as _t
    t0 = _t.time()
    original_q = str(params["q"])
    mid = params.get("nl_model_id", "default")
    schema_prompt = "\n".join(
        f"- {f.name}: {f.type}" + (" (facet)" if f.facet else "")
        for f in coll.fields)
    try:
        gen = server.nl_models.generate_params(mid, original_q,
                                               schema_prompt)
    except Exception as e:  # noqa: BLE001 — fallback: raw q searches as-is
        return {"parse_time_ms": int((_t.time() - t0) * 1000),
                "generated_params": {},
                "augmented_params": {"q": original_q},
                "error": getattr(e, "message", str(e)),
                "_original_q": original_q}
    generated = {}
    for key, val in gen.items():
        if key == "llm_response":
            continue
        if key == "filter_by":
            generated["filter_by"] = val
            existing = str(params.get("filter_by", "")).strip()
            newf = str(val).strip()
            params["filter_by"] = (f"{existing} && {newf}"
                                   if existing and newf
                                   else existing or newf)
        elif key in ("q", "sort_by") or isinstance(val, (str, int, float)):
            generated[key] = val
            params[key] = str(val)
    return {"parse_time_ms": int((_t.time() - t0) * 1000),
            "generated_params": generated,
            "augmented_params": {k: params[k] for k in
                                 ("q", "filter_by", "sort_by")
                                 if params.get(k)},
            "_original_q": original_q}


def _attach_nl(res, nl):
    if nl is None:
        return
    original_q = nl.pop("_original_q", None)
    res["parsed_nl_query"] = nl
    if original_q is not None:
        res.setdefault("request_params", {})["q"] = original_q
        if "search_time_ms" in res:
            res["search_time_ms"] += nl.get("parse_time_ms", 0)


def get_search(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    params = _apply_preset(server, dict(req.query))

    # voice query (vq_model.h:39-51; collection.cpp:2137-2148): transcribe
    # base64 WAV through the collection's whisper model, the transcript
    # becomes `q` and is echoed in request_params
    transcribed = None
    if params.get("voice_query"):
        vq_cfg = getattr(coll, "voice_query_model", None) or {}
        if not vq_cfg.get("model_name"):
            raise BadRequest("Voice query is not enabled. Please set "
                             "`voice_query_model` for this collection.")
        vqm = getattr(server, "vq_models", None)
        if vqm is None:
            from typesense_tpu.models.voice import VQModelManager
            vqm = server.vq_models = VQModelManager(
                getattr(getattr(server, "config", None), "models_dir", ""))
        transcribed = vqm.get(vq_cfg["model_name"]).transcribe(
            params.pop("voice_query"))
        params["q"] = transcribed

    # response cache (core_api.cpp:573-601 LRU with use_cache + cache_ttl)
    cache = getattr(server, "res_cache", None)
    use_cache = str(params.get("use_cache", "false")).lower() == "true"
    key = None
    if cache is not None and use_cache:
        import time as _t
        key = (coll.name, tuple(sorted(
            (k, v) for k, v in params.items() if k != "use_cache")))
        hit = cache.get(key)
        if hit is not None and hit[0] > _t.time():
            return hit[1]

    params = _apply_personalization(server, coll, params)
    nl = _apply_nl_query(server, coll, params)
    res = coll.search(params)
    _attach_nl(res, nl)
    if transcribed is not None:
        # reference echoes the transcript (collection.cpp transcribed_query)
        res.setdefault("request_params", {})["voice_query"] = {
            "transcribed_query": transcribed}

    if key is not None:
        import time as _t
        ttl = int(params.get("cache_ttl", 60))
        cache[key] = (_t.time() + ttl, res)
        while len(cache) > 1000:
            cache.pop(next(iter(cache)))

    # RAG conversation (core_api.cpp:633-688 conversation augmentation)
    if str(params.get("conversation", "false")).lower() == "true":
        model_id = params.get("conversation_model_id")
        if not model_id:
            raise BadRequest("Parameter `conversation_model_id` is required "
                             "for conversational search.")
        if str(params.get("conversation_stream", "false")).lower() == "true":
            # SSE streaming (core_api.cpp:613-764): first event carries the
            # search results, then answer deltas, then [DONE]
            from typesense_tpu.api.http import SSEResponse

            def events():
                yield "data: " + json.dumps(
                    res, ensure_ascii=False) + "\n\n"
                yield from server.conv_models.converse_stream(
                    str(model_id), str(params.get("q", "")),
                    res.get("hits", []), params.get("conversation_id"))
            return SSEResponse(events())
        res["conversation"] = server.conv_models.converse(
            str(model_id), str(params.get("q", "")), res.get("hits", []),
            params.get("conversation_id"))

    analytics = getattr(server, "analytics", None)
    # enable_analytics=false opts a query out of popular/nohits
    # aggregation; analytics_tag labels the recorded query (collection.h
    # ENABLE_ANALYTICS / ANALYTICS_TAG)
    if analytics is not None and \
            str(params.get("enable_analytics", "true")).lower() != "false":
        analytics.record_search(coll.name, str(params.get("q", "")),
                                res.get("found", 0),
                                tag=params.get("analytics_tag"))
    return res


def post_add_document(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    action = req.query.get("action", "create")
    doc = coll.add(req.json(), operation=action,
                   dirty_values=req.query.get("dirty_values", "coerce_or_reject"))
    return 201, doc


def post_import_documents(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    action = req.query.get("action", "create")
    dirty = req.query.get("dirty_values", "coerce_or_reject")
    # import-level remote embedding knobs (collection.cpp:519-520:
    # remote_embedding_batch_size default 200, timeout 60000 ms, 2 tries)
    # — consumed by _auto_embed at the next index build
    rkw = {}
    if req.query.get("remote_embedding_batch_size") is not None:
        rkw["remote_embedding_batch_size"] = int(
            req.query["remote_embedding_batch_size"])
    if req.query.get("remote_embedding_timeout_ms") is not None:
        rkw["remote_embedding_timeout_ms"] = float(
            req.query["remote_embedding_timeout_ms"])
    if req.query.get("remote_embedding_num_tries") is not None:
        rkw["remote_embedding_num_tries"] = int(
            req.query["remote_embedding_num_tries"])
    if rkw:
        coll._remote_embed_params = rkw
    # core_api.cpp:1528 RETURN_ID / RETURN_DOC import response options
    return_id = req.query.get("return_id") == "true"
    return_doc = req.query.get("return_doc") == "true"
    out = []
    for line in req.iter_lines():
        line = line.strip()
        if not line:
            continue
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            out.append(json.dumps({"success": False, "error": "Bad JSON."}))
            continue
        try:
            added = coll.add(doc, operation=action, dirty_values=dirty)
            if return_doc:
                out.append(json.dumps(
                    {"success": True, "document": added},
                    ensure_ascii=False))
            elif return_id:
                out.append(json.dumps(
                    {"success": True, "id": added.get("id")}))
            else:
                out.append('{"success":true}')
        except Exception as e:  # noqa: BLE001 — per-line isolation like import
            out.append(json.dumps({
                "success": False, "error": getattr(e, "message", str(e)),
                "document": json.dumps(doc)}))
    return 200, ("\n".join(out) + "\n").encode()


def get_export_documents(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    include = set(filter(None, req.query.get("include_fields", "").split(",")))
    exclude = set(filter(None, req.query.get("exclude_fields", "").split(",")))
    filter_by = req.query.get("filter_by", "")
    keep = None
    if filter_by:
        import numpy as np
        engine = coll._ensure_index()
        mask = coll._filter_mask_for(engine, filter_by)
        keep = set(int(s) for s in np.flatnonzero(np.asarray(mask)))
    lines = []
    for seq in sorted(coll.docs):
        if keep is not None and seq not in keep:
            continue
        doc = coll.docs[seq]
        if include:
            doc = {k: v for k, v in doc.items() if k in include or k == "id"}
        if exclude:
            doc = {k: v for k, v in doc.items() if k not in exclude}
        lines.append(json.dumps(doc, ensure_ascii=False))
    return 200, ("\n".join(lines) + "\n").encode()


def get_fetch_document(server, req):
    """Single-doc fetch with include/exclude_fields pruning
    (core_api.cpp:1897 populate_include_exclude + prune_doc)."""
    coll = server.manager.get_collection(req.params["collection"])
    doc = dict(coll.get(req.params["id"]))
    inc = [x.strip() for x in str(req.query.get("include_fields", ""))
           .split(",") if x.strip()]
    exc = [x.strip() for x in str(req.query.get("exclude_fields", ""))
           .split(",") if x.strip()]
    if inc:
        doc = {k: v for k, v in doc.items() if k in inc or k == "id"}
    for e in exc:
        doc.pop(e, None)
    return doc


def patch_update_document(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    body = req.json()
    body["id"] = req.params["id"]
    return coll.add(body, operation="update")


def del_remove_document(server, req):
    coll = server.manager.get_collection(req.params["collection"])
    return coll.remove(req.params["id"])


def del_remove_documents(server, req):
    """Delete by filter (core_api.cpp del_remove_documents:1971-2048).
    Param precedence mirrors the reference: `top_k_by=field:k` truncates
    to the top-k docs by a numeric field; `truncate=true` removes ALL
    docs (no filter needed); otherwise `filter_by` is required."""
    coll = server.manager.get_collection(req.params["collection"])
    top_k_by = req.query.get("top_k_by", "")
    if top_k_by:
        parts = top_k_by.split(":")
        if len(parts) != 2 or not parts[1].isdigit():
            raise BadRequest("The `top_k_by` parameter is not valid.")
        fname, keep = parts[0], int(parts[1])
        fld = next((f for f in coll.fields if f.name == fname), None)
        if fld is None or fld.type not in ("int32", "int64", "float"):
            raise BadRequest(f"Field `{fname}` must be a numeric field.")
        ranked = sorted(
            coll.docs.items(),
            key=lambda kv: (kv[1].get(fname) is not None,
                            kv[1].get(fname) or 0),
            reverse=True)
        for _, doc in ranked[keep:]:
            try:
                coll.remove(str(doc.get("id")))
            except NotFound:
                pass
        return {"ok": True}
    if req.query.get("truncate", "false") == "true":
        doomed = list(coll.id_to_seq.keys())
        for did in doomed:
            try:
                coll.remove(did)
            except NotFound:
                pass
        return {"num_deleted": len(doomed)}
    filter_by = req.query.get("filter_by", "")
    if not filter_by:
        raise BadRequest("Parameter `filter_by` must be provided.")
    res = coll.search({"q": "*", "filter_by": filter_by, "per_page": 250,
                       "page": 1})
    doomed = []
    total = res["found"]
    page = 1
    while True:
        doomed.extend(h["document"]["id"] for h in res["hits"])
        if len(doomed) >= total or not res["hits"]:
            break
        page += 1
        res = coll.search({"q": "*", "filter_by": filter_by, "per_page": 250,
                           "page": page})
    for did in doomed:
        try:
            coll.remove(did)
        except NotFound:
            pass
    return {"num_deleted": len(doomed)}


def patch_update_documents(server, req):
    """Update by filter (core_api.cpp patch_update_documents): apply the
    body's fields to every doc matching filter_by; {"num_updated": N}."""
    coll = server.manager.get_collection(req.params["collection"])
    filter_by = req.query.get("filter_by", "")
    if not filter_by:
        raise BadRequest("Parameter `filter_by` must be provided.")
    patch = req.json()
    if not isinstance(patch, dict) or not patch:
        raise BadRequest("The document body must be a non-empty object.")
    ids: list[str] = []
    page = 1
    while True:
        res = coll.search({"q": "*", "filter_by": filter_by,
                           "per_page": 250, "page": page})
        ids.extend(h["document"]["id"] for h in res["hits"])
        if len(ids) >= res["found"] or not res["hits"]:
            break
        page += 1
    for did in ids:
        body = dict(patch)
        body["id"] = did
        coll.add(body, operation="update")
    return {"num_updated": len(ids)}


def _item_set_manager(server, req):
    kind = "synonym" if "/synonym_sets/" in req.path else "curation"
    mgr = server.manager.synonyms if kind == "synonym" else \
        server.manager.curations
    return mgr, kind


def get_set_items(server, req):
    mgr, _ = _item_set_manager(server, req)
    return mgr.get(req.params["name"])["items"]


def get_set_item(server, req):
    mgr, kind = _item_set_manager(server, req)
    for it in mgr.get(req.params["name"])["items"]:
        if it.get("id") == req.params["id"]:
            return it
    raise NotFound(f"Could not find a {kind} item with id "
                   f"`{req.params['id']}`.")


def put_set_item(server, req):
    """Upsert ONE item inside a synonym/curation set
    (typesense_server.cpp item-level routes)."""
    mgr, _ = _item_set_manager(server, req)
    body = req.json()
    body["id"] = req.params["id"]
    try:
        existing = mgr.get(req.params["name"])["items"]
    except NotFound:
        existing = []
    items = [it for it in existing if it.get("id") != body["id"]] + [body]
    mgr.upsert(req.params["name"], {"items": items})
    return body


def del_set_item(server, req):
    mgr, kind = _item_set_manager(server, req)
    items = mgr.get(req.params["name"])["items"]
    kept = [it for it in items if it.get("id") != req.params["id"]]
    if len(kept) == len(items):
        raise NotFound(f"Could not find a {kind} item with id "
                       f"`{req.params['id']}`.")
    mgr.upsert(req.params["name"], {"items": kept})
    return {"id": req.params["id"]}


def get_schema_changes(server, req):
    """In-flight alter operations (core_api.cpp get_schema_changes); our
    alters apply synchronously, so the list is always empty."""
    return []


def post_db_compact(server, req):
    """Compact the doc store (POST /operations/db/compact)."""
    if server.manager.store is not None:
        server.manager.store.compact(wait=True)
    meta = getattr(server, "meta_store", None)
    if meta is not None:
        meta.compact(wait=True)
    return 201, {"success": True}


def post_reset_peers(server, req):
    """Force-refresh cluster membership from the nodes file
    (raft_server reset_peers; --reset-peers-on-error)."""
    repl = getattr(server, "replication", None)
    if repl is not None:
        repl.refresh_leader()
    return 201, {"success": True}


def get_health_with_rusage(server, req):
    from typesense_tpu.utils.sysmetrics import system_metrics
    h = get_health(server, req)
    if isinstance(h, tuple):
        code, body = h
        return code, {**body, "system": system_metrics()}
    return {**h, "system": system_metrics()}


def post_aggregate_events(server, req):
    """Bulk analytics event ingest (POST /analytics/aggregate_events)."""
    analytics = getattr(server, "analytics", None)
    if analytics is None:
        raise BadRequest("Analytics is not enabled.")
    body = req.json()
    events = body if isinstance(body, list) else body.get("events", [])
    n = 0
    for ev in events:
        analytics.add_event(ev)
        n += 1
    return 201, {"success": True, "num_imported": n}


def post_multi_search(server, req):
    """core_api.cpp:855 post_multi_search: batched searches in one call."""
    body = req.json()
    searches = body.get("searches")
    if not isinstance(searches, list):
        raise BadRequest("`searches` parameter should be an array of objects.")
    union = bool(body.get("union"))
    common = {k: v for k, v in req.query.items()
              if k not in ("x-typesense-api-key",)}
    # conversation rides the QUERY params only — q / model id / conv id are
    # common across searches (core_api_utils.cpp:118
    # multi_search_validate_and_add_params)
    conversation = str(common.get("conversation", "false")).lower() == "true"
    for s in searches:
        if not isinstance(s, dict):
            raise BadRequest("The value of `searches` must be an array of "
                             "objects.")
        if "conversation" in s:
            raise BadRequest(
                "`conversation` cannot be used in POST body. Please set "
                "`conversation` as a query parameter in the request, instead "
                "of inside the POST body")
        if conversation and "q" in s:
            raise BadRequest(
                "`q` parameter cannot be used in POST body if `conversation` "
                "is enabled. Please set `q` as a query parameter in the "
                "request, instead of inside the POST body")
        if conversation and "conversation_model_id" in s:
            raise BadRequest(
                "`conversation_model_id` cannot be used in POST body. Please "
                "set `conversation_model_id` as a query parameter in the "
                "request, instead of inside the POST body")
        if conversation and "conversation_id" in s:
            raise BadRequest(
                "`conversation_id` cannot be used in POST body. Please set "
                "`conversation_id` as a query parameter in the request, "
                "instead of inside the POST body")
    conv_model_id = common.get("conversation_model_id")
    conv_id = common.get("conversation_id")
    conv_query = str(common.get("q", ""))
    if conversation:
        if not conv_model_id:
            raise BadRequest("Conversation is enabled but no conversation "
                             "model ID is provided.")
        if not conv_query:
            raise BadRequest("`q` parameter has to be set as a query "
                             "parameter when `conversation` is enabled.")
        server.conv_models.get(str(conv_model_id))  # 404/400 early
    for ck in ("conversation", "conversation_model_id", "conversation_id",
               "conversation_stream"):
        common.pop(ck, None)
    # scoped-key embedded params override every per-search body
    # (core_api.cpp post_multi_search applies embedded params with
    # overwrite=true after merging the search object)
    embedded = {k: (v if isinstance(v, str) else json.dumps(v))
                for k, v in (req.embedded_params or {}).items()
                if k not in ("expires_at", "limit_multi_searches")}
    limit = (req.embedded_params or {}).get("limit_multi_searches")
    if limit is not None and len(searches) > int(limit):
        raise BadRequest("Number of multi searches exceeds "
                         "`limit_multi_searches` parameter.")
    if union:
        # per-search pagination has no effect under union (union_test.cpp
        # Pagination): every search fetches deep enough for the merged page
        u_pp = int(common.get("per_page", 10))
        u_page = int(common.get("page", 1) or 1)
        u_fetch = min(250, max(u_pp * u_page, 10))
    results = []
    search_cnames = []  # collection resolved from the MERGED params per
    # search (common/body/embedded), so downstream consumers (conversation
    # vector-field stripping) see the same collection the search ran on
    for s in searches:
        params = _apply_preset(server, {**common, **s, **embedded})
        if union:
            for k in ("page", "per_page", "offset", "limit"):
                params.pop(k, None)
            params["per_page"] = u_fetch
            params["page"] = 1
        cname = params.pop("collection", None)
        search_cnames.append(cname)
        if cname is None:
            results.append({"error": "`collection` is required", "code": 400})
            continue
        try:
            coll = server.manager.get_collection(cname)
            params = _apply_personalization(server, coll, params)
            nl = _apply_nl_query(server, coll, params)
            r = coll.search(params)
            _attach_nl(r, nl)
            results.append(r)
        except Exception as e:  # noqa: BLE001 — per-search error isolation
            results.append({"error": getattr(e, "message", str(e)),
                            "code": getattr(e, "http_code", 500)})
    if union:
        # do_union (collection_manager.cpp:1513): merge ranked lists across
        # collections into one result (Union_KV merge, topster.h:169).
        # Top-level pagination wins; hits carry search_index + collection;
        # duplicates (same collection + id) are removed unless
        # remove_duplicates=false (union_test.cpp RemoveDuplicatesWithUnion)
        per_page = int(common.get("per_page", 10))
        page = int(common.get("page", 1) or 1)
        remove_dup = str(common.get(
            "remove_duplicates",
            body.get("remove_duplicates", "true"))).lower() != "false"
        merged = []
        found = 0
        out_of = 0
        urp = []
        for si, (r, s) in enumerate(zip(results, searches)):
            if "error" in r:
                return 400, {"message": r["error"]}
            found += r.get("found", 0)
            out_of += r.get("out_of", 0)
            cname = s.get("collection")
            urp.append({"collection_name": cname,
                        "found": r.get("found", 0),
                        "per_page": per_page, "page": page})
            for rank, h in enumerate(r.get("hits", [])):
                h = {**h, "search_index": si, "collection": cname}
                merged.append((h.get("text_match", 0), -rank, si, h))
        merged.sort(key=lambda t: (-t[0], t[1], t[2]))
        if remove_dup:
            seen = set()
            kept = []
            for t in merged:
                h = t[3]
                key = (h["collection"], h.get("document", {}).get("id"))
                if key in seen:
                    found -= 1
                    continue
                seen.add(key)
                kept.append(t)
            merged = kept
        start = (page - 1) * per_page
        return {"found": found, "out_of": out_of, "page": page,
                "hits": [t[3] for t in merged[start:start + per_page]],
                "union_request_params": urp,
                "search_time_ms": sum(r.get("search_time_ms", 0)
                                      for r in results)}
    out = {"results": results}
    if conversation:
        # one RAG answer over the combined result docs (core_api.cpp
        # multi_search conversation block): vector fields stripped, every
        # result echoes the common q
        ctx_hits = []
        for si, r in enumerate(results):
            if "error" in r:
                continue
            r.setdefault("request_params", {})["q"] = conv_query
            cname = search_cnames[si]
            vec_fields = set()
            try:
                c = server.manager.get_collection(cname)
                vec_fields = {f.name for f in c.fields
                              if f.type == "float[]"}
            except Exception:  # noqa: BLE001
                pass
            hit_lists = [g.get("hits", []) for g in r["grouped_hits"]] \
                if "grouped_hits" in r else [r.get("hits", [])]
            for hl in hit_lists:
                for h in hl:
                    doc = {k: v for k, v in h.get("document", {}).items()
                           if k not in vec_fields}
                    ctx_hits.append({"document": doc})
        out["conversation"] = server.conv_models.converse(
            str(conv_model_id), conv_query, ctx_hits, conv_id)
    return out


# ---------------------------------------------------------------------------
# aliases / keys / presets / stopwords / synonym & curation sets
# ---------------------------------------------------------------------------

def get_aliases(server, req):
    return {"aliases": [{"name": a, "collection_name": c}
                        for a, c in server.manager.aliases.items()]}


def put_upsert_alias(server, req):
    body = req.json()
    if "collection_name" not in body:
        raise BadRequest("Parameter `collection_name` is required.")
    server.manager.upsert_alias(req.params["alias"], body["collection_name"])
    return {"name": req.params["alias"], "collection_name": body["collection_name"]}


def get_alias(server, req):
    return {"name": req.params["alias"],
            "collection_name": server.manager.get_alias(req.params["alias"])}


def del_alias(server, req):
    name = req.params["alias"]
    cname = server.manager.get_alias(name)
    server.manager.delete_alias(name)
    return {"name": name, "collection_name": cname}


def get_keys(server, req):
    return {"keys": server.auth.list_keys()}


def post_create_key(server, req):
    key = server.auth.create_key(req.json())
    out = key.to_json(masked=False)
    out["value"] = key.value
    return 201, out


def get_key(server, req):
    return server.auth.get_key(int(req.params["id"])).to_json()


def del_key(server, req):
    k = server.auth.delete_key(int(req.params["id"]))
    return {"id": k.id}


def get_presets(server, req):
    return {"presets": [{"name": n, "value": v}
                        for n, v in server.manager.presets.items()]}


def get_preset(server, req):
    return {"name": req.params["name"],
            "value": server.manager.get_preset(req.params["name"])}


def put_upsert_preset(server, req):
    body = req.json()
    if "value" not in body:
        raise BadRequest("Parameter `value` is required.")
    server.manager.upsert_preset(req.params["name"], body["value"])
    return {"name": req.params["name"], "value": body["value"]}


def del_preset(server, req):
    v = server.manager.get_preset(req.params["name"])
    server.manager.delete_preset(req.params["name"])
    return {"name": req.params["name"], "value": v}


def get_stopwords(server, req):
    return {"stopwords": server.manager.stopwords.list()}


def get_stopword(server, req):
    return {"stopwords": server.manager.stopwords.get(req.params["name"])}


def put_upsert_stopword(server, req):
    return server.manager.stopwords.upsert(req.params["name"], req.json())


def del_stopword(server, req):
    server.manager.stopwords.delete(req.params["name"])
    return {"id": req.params["name"]}


def get_synonym_sets(server, req):
    return server.manager.synonyms.list()


def get_synonym_set(server, req):
    return server.manager.synonyms.get(req.params["name"])


def put_upsert_synonym_set(server, req):
    return server.manager.synonyms.upsert(req.params["name"], req.json())


def del_synonym_set(server, req):
    server.manager.synonyms.delete(req.params["name"])
    return {"name": req.params["name"]}


def get_curation_sets(server, req):
    return server.manager.curations.list()


def get_curation_set(server, req):
    return server.manager.curations.get(req.params["name"])


def put_upsert_curation_set(server, req):
    return server.manager.curations.upsert(req.params["name"], req.json())


def del_curation_set(server, req):
    server.manager.curations.delete(req.params["name"])
    return {"name": req.params["name"]}


# ---------------------------------------------------------------------------
# meta / ops
# ---------------------------------------------------------------------------

def get_health(server, req):
    repl = getattr(server, "replication", None)
    if repl is None:
        return {"ok": True}
    ok, body = repl.health()
    return (200 if ok else 503), body


def get_debug(server, req):
    return {"state": 1, "version": __version__}


def get_status(server, req):
    repl = getattr(server, "replication", None)
    if repl is None:
        return {"state": "LEADER", "committed_index": 0, "queued_writes": 0}
    return repl.status()


def get_stats(server, req):
    return server.metrics.stats_json() if hasattr(server, "metrics") else {}


def get_metrics(server, req):
    from typesense_tpu.utils.sysmetrics import system_metrics
    return system_metrics()


def post_snapshot(server, req):
    """Checkpoint BOTH stores (docs+collections, and meta: keys/analytics/
    limits) into <snapshot_path>/db and /meta so the snapshot restores a
    complete node (raft_server.cpp:616-631 checkpoints every store)."""
    import os
    path = req.query.get("snapshot_path", "")
    if not path:
        raise BadRequest("Parameter `snapshot_path` is required.")
    if server.manager.store is not None:
        server.manager.store.create_check_point(os.path.join(path, "db"))
    meta = getattr(server, "meta_store", None)
    if meta is not None:
        meta.create_check_point(os.path.join(path, "meta"))
    return 201, {"success": True}


def post_vote(server, req):
    repl = getattr(server, "replication", None)
    if repl is not None:
        repl.refresh_leader()
    return {"success": True}


def post_cache_clear(server, req):
    return {"success": True}


# ---------------------------------------------------------------------------
# analytics (typesense_server.cpp:88-98)
# ---------------------------------------------------------------------------

def get_analytics_rules(server, req):
    return {"rules": server.analytics.list_rules()}


def get_analytics_rule(server, req):
    return server.analytics.get_rule(req.params["name"])


def post_create_analytics_rules(server, req):
    body = req.json()
    rules = body if isinstance(body, list) else [body]
    created = [server.analytics.upsert_rule(r) for r in rules]
    return 201, (created[0] if not isinstance(body, list) else created)


def put_upsert_analytics_rules(server, req):
    return server.analytics.upsert_rule(req.json(), name=req.params["name"])


def del_analytics_rules(server, req):
    return server.analytics.delete_rule(req.params["name"])


def post_create_event(server, req):
    return 201, server.analytics.add_event(req.json())


def get_analytics_events(server, req):
    return {"events": server.analytics.list_events(
        req.query.get("name"), int(req.query.get("limit", 100)))}


def do_analytics_flush(server):
    """Leader-side flush: destination writes ALSO append to the replication
    log as ordinary document ops, so followers converge (reference flushes
    through raft, include/analytics_manager.h:24-80). Single-node: plain
    local flush."""
    repl = server.replication

    def write(dest, doc, operation):
        coll = server.manager.get_collection(dest)
        coll.add(doc, operation=operation)
        if repl is not None and repl.is_leader:
            repl.log_write({"method": "POST",
                            "path": f"/collections/{dest}/documents",
                            "query": {"action": operation},
                            "body": json.dumps(doc)})
    return server.analytics.flush(write_fn=write)


def post_analytics_flush(server, req):
    if "x-ts-replicated" in req.headers:
        # follower replay: the doc writes arrived as separate replicated
        # ops just before this one — only the buffers clear here
        return server.analytics.clear_buffers()
    return do_analytics_flush(server)


def get_analytics_status(server, req):
    return server.analytics.status()


# ---------------------------------------------------------------------------
# rate limits (typesense_server.cpp:134-142)
# ---------------------------------------------------------------------------

def get_rate_limits(server, req):
    return {"limits": server.ratelimits.list_rules()}


def get_rate_limit(server, req):
    return server.ratelimits.get_rule(int(req.params["id"]))


def post_rate_limit(server, req):
    return 201, server.ratelimits.create_rule(req.json())


def put_rate_limit(server, req):
    return server.ratelimits.update_rule(int(req.params["id"]), req.json())


def del_rate_limit(server, req):
    return server.ratelimits.delete_rule(int(req.params["id"]))


def get_active_throttles(server, req):
    return {"active_throttles": server.ratelimits.active_throttles()}


def get_limit_exceed_counts(server, req):
    return {"exceed_counts": server.ratelimits.exceed_counts()}


def del_throttle(server, req):
    server.ratelimits.delete_throttle(req.params["id"])
    return {"success": True}


def del_exceed(server, req):
    server.ratelimits.delete_exceed(req.params["id"])
    return {"success": True}


# ---------------------------------------------------------------------------
# stemming dictionaries (typesense_server.cpp:101-104)
# ---------------------------------------------------------------------------

def post_import_stemming_dictionary(server, req):
    dict_id = req.query.get("id")
    if not dict_id:
        raise BadRequest("Parameter `id` is required.")
    return server.manager.stemmers.import_dictionary(
        dict_id, req.body.decode("utf-8", errors="replace"))


def get_stemming_dictionaries(server, req):
    return server.manager.stemmers.list_dictionaries()


def get_stemming_dictionary(server, req):
    return server.manager.stemmers.get_dictionary(req.params["id"])


def del_stemming_dictionary(server, req):
    return server.manager.stemmers.delete_dictionary(req.params["id"])


# ---------------------------------------------------------------------------
# conversation / NL search / personalization models (typesense_server.cpp:122-154)
# ---------------------------------------------------------------------------

def post_conversation_model(server, req):
    return 201, server.conv_models.create(req.json())


def get_conversation_models(server, req):
    return server.conv_models.list()


def get_conversation_model(server, req):
    return server.conv_models.get(req.params["id"])


def put_conversation_model(server, req):
    return server.conv_models.update(req.params["id"], req.json())


def del_conversation_model(server, req):
    return server.conv_models.delete(req.params["id"])


def post_nl_search_model(server, req):
    return 201, server.nl_models.create(req.json())


def get_nl_search_models(server, req):
    return server.nl_models.list()


def get_nl_search_model(server, req):
    return server.nl_models.get(req.params["id"])


def put_nl_search_model(server, req):
    return server.nl_models.update(req.params["id"], req.json())


def delete_nl_search_model(server, req):
    return server.nl_models.delete(req.params["id"])


def post_personalization_model(server, req):
    return 201, server.pers_models.create(req.json())


def get_personalization_models(server, req):
    return server.pers_models.list()


def get_personalization_model(server, req):
    return server.pers_models.get(req.params["id"])


def put_personalization_model(server, req):
    return server.pers_models.update(req.params["id"], req.json())


def del_personalization_model(server, req):
    return server.pers_models.delete(req.params["id"])


def post_personalization_model_train(server, req):
    """Fit the tyrec-equivalent tower on per-user event histories (body:
    {"histories": [[event text, ... newest last], ...], "steps", "lr"}).
    The reference ships pretrained ONNX (personalization_model.h); training
    on the serving accelerator is the TPU-native equivalent."""
    body = req.json()
    hists = body.get("histories")
    if not isinstance(hists, list):
        raise BadRequest("Property `histories` must be a list of event "
                         "text lists.")
    return server.pers_models.train(
        req.params["id"], hists, steps=int(body.get("steps", 200)),
        lr=float(body.get("lr", 1e-3)))


# ---------------------------------------------------------------------------
# replication control plane
# ---------------------------------------------------------------------------

def get_replication_log(server, req):
    repl = server.replication
    if repl is None:
        return {"ops": []}
    return {"ops": repl.log_since(int(req.query.get("from", 0)))}


def get_replication_status(server, req):
    repl = server.replication
    if repl is None:
        return {"applied_seq": -1, "state": "LEADER", "term": 0,
                "oldest_seq": 0}
    return repl.status() | {"applied_seq": repl.applied_seq}


def get_replication_snapshot(server, req):
    """Full store image for gapped-follower catch-up (on_snapshot_save)."""
    repl = server.replication
    if repl is None:
        raise BadRequest("Not clustered.")
    return repl.snapshot_dump()


def post_request_vote(server, req):
    repl = server.replication
    if repl is None:
        raise BadRequest("Not clustered.")
    return repl.handle_request_vote(req.json())


def post_heartbeat(server, req):
    repl = server.replication
    if repl is None:
        raise BadRequest("Not clustered.")
    return repl.handle_heartbeat(req.json())


def post_append_entries(server, req):
    """Leader push replication (quorum-ack write path): persist + apply
    in-order ops, ack persistence (braft AppendEntries equivalent)."""
    repl = server.replication
    if repl is None:
        raise BadRequest("Not clustered.")
    return repl.handle_append(req.json())


# ---------------------------------------------------------------------------
# runtime config + proxy (core_api.cpp post_config / post_proxy)
# ---------------------------------------------------------------------------

def post_config(server, req):
    body = req.json()
    if not hasattr(server, "runtime_config"):
        server.runtime_config = {}
    MUTABLE = {"log-slow-requests-time-ms", "log-slow-searches-time-ms",
               "healthy-read-lag", "healthy-write-lag", "cache-num-entries",
               "skip-writes"}
    for k, v in body.items():
        if k not in MUTABLE:
            raise BadRequest(f"Unable to update `{k}` at runtime.")
        server.runtime_config[k] = v
    return 201, {"success": True}


def get_config(server, req):
    return getattr(server, "runtime_config", {})


def post_proxy(server, req):
    """Egress proxy for remote model providers (core_api.cpp post_proxy)."""
    import urllib.request
    body = req.json()
    url = body.get("url")
    method = body.get("method", "GET").upper()
    if not url or method not in ("GET", "POST", "PUT", "DELETE"):
        raise BadRequest("Parameters `url` and `method` are required.")
    data = body.get("body")
    headers = body.get("headers", {})
    r = urllib.request.Request(url, method=method,
                               data=data.encode() if data else None,
                               headers=headers)
    try:
        with urllib.request.urlopen(r, timeout=30) as resp:
            return resp.status, resp.read()
    except Exception as e:  # noqa: BLE001 — egress-gated environment
        raise BadRequest(f"Proxy request failed: {e}")


def post_proxy_sse(server, req):
    """SSE-streaming egress proxy (core_api.cpp:3303 post_proxy_sse): the
    upstream response streams back to the client chunk-by-chunk as
    server-sent events instead of buffering — used by conversational
    models talking to streaming LLM providers."""
    import urllib.request
    from typesense_tpu.api.http import SSEResponse
    body = req.json()
    url = body.get("url")
    method = str(body.get("method", "")).upper()
    if not url or not method:
        raise BadRequest("Missing required fields.")
    if not isinstance(url, str) or not isinstance(body.get("method"), str):
        raise BadRequest("URL and method must be non-empty strings.")
    data = body.get("body")
    if data is not None and not isinstance(data, str):
        raise BadRequest("Body must be a string.")
    headers = body.get("headers", {})
    if not isinstance(headers, dict):
        raise BadRequest("Headers must be a JSON object.")

    def events():
        r = urllib.request.Request(
            url, method=method, data=data.encode() if data else None,
            headers={str(k): str(v) for k, v in headers.items()})
        try:
            with urllib.request.urlopen(r, timeout=60) as resp:
                for raw in resp:
                    line = raw.decode("utf-8", errors="replace").rstrip("\n")
                    if not line:
                        continue
                    # upstream SSE lines pass through verbatim; raw payload
                    # lines get the `data:` framing
                    if line.startswith(("data:", "event:", "id:", "retry:")):
                        yield line + "\n\n"
                    else:
                        yield f"data: {line}\n\n"
        except Exception as e:  # noqa: BLE001 — egress-gated environment
            yield ("data: " + json.dumps(
                {"error": f"Proxy request failed: {e}"}) + "\n\n")
    return SSEResponse(events())
