"""HTTP API server + route table.

Behavior contract: route surface from /root/reference/src/main/
typesense_server.cpp:22-155 and handlers in src/core_api.cpp — collections
CRUD, documents CRUD/import/export/search, multi_search, aliases, keys,
presets, stopwords, health/stats/metrics/debug, operations. Auth via
`x-typesense-api-key` header or `x-typesense-api-key` query param
(core_api.cpp:78 handle_authentication).

Implementation: asyncio HTTP/1.1 server (keep-alive, chunked export / JSONL
import streaming). Search execution is dispatched to a thread pool so the
event loop stays responsive while device programs run.
"""

from __future__ import annotations

import asyncio
import json
import time
import traceback
import urllib.parse
from concurrent.futures import ThreadPoolExecutor

from typesense_tpu import __version__
from typesense_tpu.api.auth import AuthManager
from typesense_tpu.core.errors import BadRequest, NotFound, TypesenseError, Unauthorized
from typesense_tpu.manager import CollectionManager

MAX_BODY = 1 << 30


def _json_bytes(obj) -> bytes:
    return json.dumps(obj, ensure_ascii=False, separators=(",", ":")).encode()


class BodyStream:
    """Bounded cross-thread byte-chunk pipe: the event loop produces chunks
    (content-length or chunked transfer decoding) while the handler thread
    consumes lines — a 1 GB JSONL import never holds more than
    maxsize x chunk bytes in RAM (h2o async_req streaming equivalent,
    /root/reference/include/http_server.h:262-277)."""

    _EOF = object()

    def __init__(self, maxsize: int = 32):
        import queue
        self.q = queue.Queue(maxsize=maxsize)
        self.aborted = False

    def put(self, chunk: bytes):       # event-loop side (via executor)
        import queue
        while not self.aborted:
            try:
                self.q.put(chunk, timeout=0.2)
                return
            except queue.Full:
                continue

    def close(self):
        import queue
        while True:
            try:
                self.q.put(self._EOF, timeout=0.2)
                return
            except queue.Full:
                if self.aborted:   # consumer is gone; EOF is moot
                    return

    def iter_lines(self):
        """Yield complete decoded lines as they arrive (handler thread)."""
        tail = b""
        while True:
            chunk = self.q.get()
            if chunk is self._EOF:
                break
            tail += chunk
            *lines, tail = tail.split(b"\n")
            for ln in lines:
                yield ln.decode("utf-8", errors="replace")
        if tail:
            yield tail.decode("utf-8", errors="replace")


class SSEResponse:
    """Marker a handler returns to stream server-sent events: `events` is a
    generator of pre-formatted `data: ...\\n\\n` strings, written to the
    socket as chunked transfer encoding while the generator runs
    (stream_response, /root/reference/src/core_api.cpp:111)."""

    def __init__(self, events, status: int = 200):
        self.events = events
        self.status = status


class Request:
    def __init__(self, method: str, path: str, query: dict, headers: dict,
                 body: bytes):
        self.method = method
        self.path = path
        self.query = query
        self.headers = headers
        self.body = body
        self.body_stream: BodyStream | None = None
        self.params: dict[str, str] = {}
        self.embedded_params: dict = {}

    def iter_lines(self):
        """Lines of the request body — streamed when a BodyStream is
        attached (import route), otherwise from the buffered body."""
        if self.body_stream is not None:
            return self.body_stream.iter_lines()
        return iter(self.body.decode("utf-8", errors="replace").splitlines())

    def json(self):
        if not self.body:
            raise BadRequest("Bad JSON.")
        try:
            return json.loads(self.body)
        except json.JSONDecodeError:
            raise BadRequest("Bad JSON.")

    @property
    def api_key(self) -> str:
        return (self.headers.get("x-typesense-api-key")
                or self.query.get("x-typesense-api-key", ""))


class HttpServer:
    """Route registration mirrors HttpServer::get/post/put/patch/del
    (http_server.h:144-147)."""

    def __init__(self, manager: CollectionManager, auth: AuthManager,
                 host: str = "0.0.0.0", port: int = 8108,
                 num_threads: int = 8):
        self.manager = manager
        self.auth = auth
        self.host = host
        self.port = port
        self.routes: list[tuple[str, list[str], callable, str]] = []
        self.executor = ThreadPoolExecutor(max_workers=num_threads)
        self.start_time = time.time()
        self.res_cache: dict = {}  # response LRU (core_api.cpp init_api cache)
        self.replication = None    # ReplicationState when clustered
        self._register_routes()

    # ------------------------------------------------------------------
    def route(self, method: str, pattern: str, handler, action: str):
        self.routes.append((method, pattern.strip("/").split("/"), handler, action))

    def _register_routes(self):
        from typesense_tpu.api import handlers as h
        r = self.route
        # collections (typesense_server.cpp:25-33)
        r("GET", "/collections", h.get_collections, "collections:list")
        r("POST", "/collections", h.post_create_collection, "collections:create")
        r("GET", "/collections/:collection", h.get_collection_summary, "collections:get")
        r("PATCH", "/collections/:collection", h.patch_update_collection, "collections:update")
        r("DELETE", "/collections/:collection", h.del_drop_collection, "collections:delete")
        # documents
        r("GET", "/collections/:collection/documents/search", h.get_search, "documents:search")
        r("POST", "/collections/:collection/documents", h.post_add_document, "documents:create")
        r("POST", "/collections/:collection/documents/import", h.post_import_documents, "documents:import")
        r("GET", "/collections/:collection/documents/export", h.get_export_documents, "documents:export")
        r("DELETE", "/collections/:collection/documents", h.del_remove_documents, "documents:delete")
        r("GET", "/collections/:collection/documents/:id", h.get_fetch_document, "documents:get")
        r("PATCH", "/collections/:collection/documents/:id", h.patch_update_document, "documents:update")
        r("PATCH", "/collections/:collection/documents", h.patch_update_documents, "documents:update")
        r("DELETE", "/collections/:collection/documents/:id", h.del_remove_document, "documents:delete")
        # multi search
        r("POST", "/multi_search", h.post_multi_search, "documents:search")
        # aliases
        r("GET", "/aliases", h.get_aliases, "aliases:list")
        r("PUT", "/aliases/:alias", h.put_upsert_alias, "aliases:upsert")
        r("GET", "/aliases/:alias", h.get_alias, "aliases:get")
        r("DELETE", "/aliases/:alias", h.del_alias, "aliases:delete")
        # keys
        r("GET", "/keys", h.get_keys, "keys:list")
        r("POST", "/keys", h.post_create_key, "keys:create")
        r("GET", "/keys/:id", h.get_key, "keys:get")
        r("DELETE", "/keys/:id", h.del_key, "keys:delete")
        # presets
        r("GET", "/presets", h.get_presets, "presets:list")
        r("GET", "/presets/:name", h.get_preset, "presets:get")
        r("PUT", "/presets/:name", h.put_upsert_preset, "presets:upsert")
        r("DELETE", "/presets/:name", h.del_preset, "presets:delete")
        # stopwords
        r("GET", "/stopwords", h.get_stopwords, "stopwords:list")
        r("GET", "/stopwords/:name", h.get_stopword, "stopwords:get")
        r("PUT", "/stopwords/:name", h.put_upsert_stopword, "stopwords:upsert")
        r("DELETE", "/stopwords/:name", h.del_stopword, "stopwords:delete")
        # synonym sets
        r("GET", "/synonym_sets", h.get_synonym_sets, "synonyms:list")
        r("GET", "/synonym_sets/:name", h.get_synonym_set, "synonyms:get")
        r("PUT", "/synonym_sets/:name", h.put_upsert_synonym_set, "synonyms:upsert")
        r("DELETE", "/synonym_sets/:name", h.del_synonym_set, "synonyms:delete")
        r("GET", "/synonym_sets/:name/items", h.get_set_items, "synonyms:get")
        r("GET", "/synonym_sets/:name/items/:id", h.get_set_item, "synonyms:get")
        r("PUT", "/synonym_sets/:name/items/:id", h.put_set_item, "synonyms:upsert")
        r("DELETE", "/synonym_sets/:name/items/:id", h.del_set_item, "synonyms:delete")
        # curation sets
        r("GET", "/curation_sets", h.get_curation_sets, "curation:list")
        r("GET", "/curation_sets/:name", h.get_curation_set, "curation:get")
        r("PUT", "/curation_sets/:name", h.put_upsert_curation_set, "curation:upsert")
        r("DELETE", "/curation_sets/:name", h.del_curation_set, "curation:delete")
        r("GET", "/curation_sets/:name/items", h.get_set_items, "curation:get")
        r("GET", "/curation_sets/:name/items/:id", h.get_set_item, "curation:get")
        r("PUT", "/curation_sets/:name/items/:id", h.put_set_item, "curation:upsert")
        r("DELETE", "/curation_sets/:name/items/:id", h.del_set_item, "curation:delete")
        # meta / ops
        r("GET", "/health", h.get_health, "public")
        r("GET", "/debug", h.get_debug, "debug:list")
        r("GET", "/stats.json", h.get_stats, "stats:get")
        r("GET", "/metrics.json", h.get_metrics, "metrics:get")
        r("GET", "/status", h.get_status, "public")
        r("GET", "/health_with_rusage", h.get_health_with_rusage, "public")
        r("POST", "/health", h.get_health, "public")
        r("GET", "/stats", h.get_stats, "stats:get")
        r("GET", "/metrics", h.get_metrics, "metrics:get")
        r("POST", "/operations/snapshot", h.post_snapshot, "operations:snapshot")
        r("POST", "/operations/vote", h.post_vote, "operations:vote")
        r("POST", "/operations/cache/clear", h.post_cache_clear, "operations:cache_clear")
        r("POST", "/operations/db/compact", h.post_db_compact, "operations:compact")
        r("POST", "/operations/reset_peers", h.post_reset_peers, "operations:reset_peers")
        r("GET", "/operations/schema_changes", h.get_schema_changes, "operations:get")
        r("POST", "/config", h.post_config, "config:update")
        r("GET", "/config", h.get_config, "config:get")
        r("POST", "/proxy", h.post_proxy, "proxy:create")
        r("POST", "/proxy_sse", h.post_proxy_sse, "proxy:create")
        # replication control plane (raft_server.h equivalents). These serve
        # raw oplog entries (full write bodies, incl. key payloads) so they
        # REQUIRE auth — ReplicationState sends X-TYPESENSE-API-KEY when
        # pulling, so followers keep working.
        r("GET", "/replication/log", h.get_replication_log, "replication:list")
        r("GET", "/replication/status", h.get_replication_status, "replication:list")
        r("GET", "/replication/snapshot", h.get_replication_snapshot, "replication:list")
        r("POST", "/replication/request_vote", h.post_request_vote, "replication:vote")
        r("POST", "/replication/heartbeat", h.post_heartbeat, "replication:vote")
        r("POST", "/replication/append", h.post_append_entries, "replication:vote")
        # conversation / nl search / personalization models
        r("POST", "/conversations/models", h.post_conversation_model, "conversations:create")
        r("GET", "/conversations/models", h.get_conversation_models, "conversations:list")
        r("GET", "/conversations/models/:id", h.get_conversation_model, "conversations:get")
        r("PUT", "/conversations/models/:id", h.put_conversation_model, "conversations:upsert")
        r("DELETE", "/conversations/models/:id", h.del_conversation_model, "conversations:delete")
        r("POST", "/nl_search_models", h.post_nl_search_model, "nl_search_models:create")
        r("GET", "/nl_search_models", h.get_nl_search_models, "nl_search_models:list")
        r("GET", "/nl_search_models/:id", h.get_nl_search_model, "nl_search_models:get")
        r("PUT", "/nl_search_models/:id", h.put_nl_search_model, "nl_search_models:upsert")
        r("DELETE", "/nl_search_models/:id", h.delete_nl_search_model, "nl_search_models:delete")
        r("POST", "/personalization/models", h.post_personalization_model, "personalization:create")
        r("GET", "/personalization/models", h.get_personalization_models, "personalization:list")
        r("GET", "/personalization/models/:id", h.get_personalization_model, "personalization:get")
        r("PUT", "/personalization/models/:id", h.put_personalization_model, "personalization:upsert")
        r("DELETE", "/personalization/models/:id", h.del_personalization_model, "personalization:delete")
        r("POST", "/personalization/models/:id/train", h.post_personalization_model_train, "personalization:upsert")
        # stemming dictionaries (typesense_server.cpp:101-104)
        r("POST", "/stemming/dictionaries/import", h.post_import_stemming_dictionary, "stemming:create")
        r("GET", "/stemming/dictionaries", h.get_stemming_dictionaries, "stemming:list")
        r("GET", "/stemming/dictionaries/:id", h.get_stemming_dictionary, "stemming:get")
        r("DELETE", "/stemming/dictionaries/:id", h.del_stemming_dictionary, "stemming:delete")
        # analytics (typesense_server.cpp:88-98)
        r("GET", "/analytics/rules", h.get_analytics_rules, "analytics:list")
        r("GET", "/analytics/rules/:name", h.get_analytics_rule, "analytics:get")
        r("POST", "/analytics/rules", h.post_create_analytics_rules, "analytics:create")
        r("PUT", "/analytics/rules/:name", h.put_upsert_analytics_rules, "analytics:upsert")
        r("DELETE", "/analytics/rules/:name", h.del_analytics_rules, "analytics:delete")
        r("POST", "/analytics/events", h.post_create_event, "analytics:events")
        r("POST", "/analytics/aggregate_events", h.post_aggregate_events, "analytics:events")
        r("GET", "/analytics/events", h.get_analytics_events, "analytics:list")
        r("POST", "/analytics/flush", h.post_analytics_flush, "analytics:flush")
        r("GET", "/analytics/status", h.get_analytics_status, "analytics:get")
        # rate limits (typesense_server.cpp:134-142)
        r("GET", "/limits", h.get_rate_limits, "limits:list")
        r("GET", "/limits/active", h.get_active_throttles, "limits:list")
        r("GET", "/limits/exceeds", h.get_limit_exceed_counts, "limits:list")
        r("GET", "/limits/:id", h.get_rate_limit, "limits:get")
        r("POST", "/limits", h.post_rate_limit, "limits:create")
        r("PUT", "/limits/:id", h.put_rate_limit, "limits:upsert")
        r("DELETE", "/limits/:id", h.del_rate_limit, "limits:delete")
        r("DELETE", "/limits/active/:id", h.del_throttle, "limits:delete")
        r("DELETE", "/limits/exceeds/:id", h.del_exceed, "limits:delete")

    # ------------------------------------------------------------------
    def match(self, method: str, path: str):
        parts = path.strip("/").split("/")
        for m, pat, handler, action in self.routes:
            if m != method or len(pat) != len(parts):
                continue
            params = {}
            ok = True
            for p, actual in zip(pat, parts):
                if p.startswith(":"):
                    params[p[1:]] = urllib.parse.unquote(actual)
                elif p != actual:
                    ok = False
                    break
            if ok:
                return handler, params, action
        return None, None, None

    # ------------------------------------------------------------------
    async def handle_conn(self, reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter):
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                try:
                    method, target, _version = line.decode().split()
                except ValueError:
                    break
                headers = {}
                while True:
                    hline = await reader.readline()
                    if hline in (b"\r\n", b"\n", b""):
                        break
                    k, _, v = hline.decode().partition(":")
                    headers[k.strip().lower()] = v.strip()
                parsed = urllib.parse.urlsplit(target)
                chunked = "chunked" in headers.get("transfer-encoding", "").lower()
                length = int(headers.get("content-length", 0))
                # import bodies stream through a bounded pipe instead of
                # buffering (typesense_server.cpp:33 async_req routes)
                # (clustered nodes buffer: the oplog/forwarding needs the
                # full body; single nodes stream with bounded memory)
                streaming = (method == "POST"
                             and parsed.path.rstrip("/").endswith("/documents/import")
                             and (chunked or length > (1 << 22))
                             and self.replication is None)
                query = {k: v[-1] for k, v in
                         urllib.parse.parse_qs(parsed.query, keep_blank_values=True).items()}
                req = Request(method, parsed.path, query, headers, b"")
                peer = writer.get_extra_info("peername")
                req.remote_ip = peer[0] if peer else ""
                if streaming:
                    req.body_stream = BodyStream()
                    task = asyncio.ensure_future(self.dispatch(req))
                    try:
                        await self._pump_body(reader, req.body_stream,
                                              chunked, length, task=task)
                    finally:
                        loop = asyncio.get_running_loop()
                        req.body_stream.aborted = req.body_stream.aborted or \
                            task.done()
                        await loop.run_in_executor(None, req.body_stream.close)
                    status, payload, ctype = await task
                else:
                    if chunked:
                        body = b"".join([c async for c in
                                         self._chunked_reader(reader)])
                    else:
                        body = await reader.readexactly(length) if length else b""
                    req.body = body
                    status, payload, ctype = await self.dispatch(req)
                if isinstance(payload, SSEResponse):
                    await self._write_sse(writer, payload)
                    break   # SSE responses end the connection
                resp = (f"HTTP/1.1 {status} {_reason(status)}\r\n"
                        f"content-type: {ctype}\r\n"
                        f"content-length: {len(payload)}\r\n"
                        f"connection: keep-alive\r\n\r\n").encode() + payload
                writer.write(resp)
                await writer.drain()
                if headers.get("connection", "").lower() == "close":
                    break
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        finally:
            writer.close()


    async def _write_sse(self, writer, sse: SSEResponse):
        """Stream SSE events with chunked transfer encoding; the blocking
        generator (LLM HTTP reads) runs on executor threads."""
        loop = asyncio.get_running_loop()
        writer.write((f"HTTP/1.1 {sse.status} {_reason(sse.status)}\r\n"
                      "content-type: text/event-stream\r\n"
                      "cache-control: no-cache\r\n"
                      "transfer-encoding: chunked\r\n"
                      "connection: close\r\n\r\n").encode())
        await writer.drain()
        sentinel = object()
        it = iter(sse.events)
        while True:
            ev = await loop.run_in_executor(None, next, it, sentinel)
            if ev is sentinel:
                break
            data = ev.encode() if isinstance(ev, str) else ev
            writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            await writer.drain()
        writer.write(b"0\r\n\r\n")
        await writer.drain()

    async def _chunked_reader(self, reader):
        """Decode Transfer-Encoding: chunked request bodies."""
        while True:
            size_line = await reader.readline()
            try:
                size = int(size_line.split(b";")[0].strip() or b"0", 16)
            except ValueError:
                raise asyncio.IncompleteReadError(b"", 0)
            if size == 0:
                # consume trailers until blank line
                while True:
                    t = await reader.readline()
                    if t in (b"\r\n", b"\n", b""):
                        break
                return
            data = await reader.readexactly(size)
            await reader.readexactly(2)  # CRLF
            yield data

    async def _pump_body(self, reader, stream: BodyStream, chunked: bool,
                         length: int, task=None, chunk_size: int = 1 << 20):
        """Feed request-body bytes into the handler's BodyStream without
        buffering the whole payload (queue backpressure bounds memory).
        If the handler finishes early (e.g. auth rejection) the remaining
        body is read and DISCARDED so keep-alive framing stays intact and
        the blocking put can't deadlock the event loop."""
        loop = asyncio.get_running_loop()

        async def feed(data):
            if stream.aborted or (task is not None and task.done()):
                stream.aborted = True
                return
            putf = loop.run_in_executor(None, stream.put, data)
            waits = {putf} | ({task} if task is not None else set())
            await asyncio.wait(waits, return_when=asyncio.FIRST_COMPLETED)
            if not putf.done():
                stream.aborted = True   # unblocks the spinning put
            await putf

        if chunked:
            async for data in self._chunked_reader(reader):
                await feed(data)
        else:
            remaining = length
            while remaining > 0:
                data = await reader.read(min(chunk_size, remaining))
                if not data:
                    raise asyncio.IncompleteReadError(b"", remaining)
                remaining -= len(data)
                await feed(data)

    # ------------------------------------------------------------------
    WRITE_EXEMPT = ("replication", "operations", "health", "status", "debug",
                    "stats.json", "metrics.json", "multi_search")

    def is_write_route(self, method: str, path: str) -> bool:
        """Mutating data-plane routes that must replicate (is_write_request,
        http_server.h:199). Search/multi_search GET/POSTs are reads."""
        if method in ("GET", "HEAD"):
            return False
        head = path.strip("/").split("/", 1)[0]
        if head in self.WRITE_EXEMPT:
            return False
        if path.rstrip("/").endswith("/documents/search"):
            return False
        return True

    def forward_to_leader(self, req):
        """Follower -> leader HTTP write forwarding (raft_server.cpp:387)."""
        import urllib.parse
        import urllib.request
        host, port = self.replication.leader
        qs = urllib.parse.urlencode(req.query)
        url = f"http://{host}:{port}{req.path}" + (f"?{qs}" if qs else "")
        fr = urllib.request.Request(url, data=req.body or None,
                                    method=req.method, headers={
                                        "X-TYPESENSE-API-KEY": req.api_key,
                                        "Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(fr, timeout=30) as resp:
                return resp.status, resp.read(), \
                    resp.headers.get("content-type", "application/json")
        except urllib.error.HTTPError as e:
            return e.code, e.read(), \
                e.headers.get("content-type", "application/json")

    def apply_replicated(self, op: dict):
        """Apply one replicated write locally (BatchedIndexer::run re-invoking
        the route handler, batched_indexer.cpp:195-330)."""
        handler, params, _action = self.match(op["method"], op["path"])
        if handler is None:
            return
        req = Request(op["method"], op["path"], dict(op.get("query") or {}),
                      {"x-ts-replicated": "1"},
                      op.get("body", "").encode())
        req.params = params or {}
        try:
            handler(self, req)
        except TypesenseError:
            pass  # deterministic rejections replay identically on every node

    async def dispatch(self, req: Request) -> tuple[int, bytes, str]:
        handler, params, action = self.match(req.method, req.path)
        if handler is None:
            return 404, _json_bytes({"message": "Not Found"}), "application/json"
        req.params = params or {}
        # rate limiting pre-hook (typesense_server_utils.cpp:593 auth/limit
        # handler chain)
        rl = getattr(self, "ratelimits", None)
        if rl is not None and rl.rules and not rl.check(
                req.api_key, req.headers.get("x-forwarded-for",
                                             getattr(req, "remote_ip", ""))):
            return 429, _json_bytes({"message": "Rate limit exceeded or blocked."}), \
                "application/json"
        # --skip-writes recovery mode: the node serves reads but ignores all
        # writes, so an operator can boot past poison requests
        # (typesense_server_utils.cpp --skip-writes flag)
        if getattr(self, "skip_writes", False) and \
                self.is_write_route(req.method, req.path):
            return 422, _json_bytes(
                {"message": "Skipping write as `--skip-writes` is enabled "
                            "on this node."}), "application/json"
        # clustered writes: followers forward to the leader BEFORE executing
        # anything locally (is_write_request routing, http_server.h:199 +
        # raft_server.cpp:387); the leader authenticates + applies first and
        # only appends to the oplog after the handler succeeds, so
        # unauthorized or rejected writes never replicate.
        repl = self.replication
        is_repl_write = (repl is not None
                         and self.is_write_route(req.method, req.path)
                         and "x-ts-replicated" not in req.headers)
        if is_repl_write and not repl.is_leader:
            if repl.leader is None or repl.leader == \
                    getattr(repl, "self_addr", None):
                # no elected leader / lost lease: reject instead of looping
                # the forward back to ourselves (term-fenced ex-leader)
                return 503, _json_bytes(
                    {"message": "Not Ready or Lagging: no elected leader."}), \
                    "application/json"
            try:
                return await asyncio.get_running_loop().run_in_executor(
                    self.executor, self.forward_to_leader, req)
            except Exception as e:  # noqa: BLE001 — leader unreachable
                return 503, _json_bytes(
                    {"message": f"Could not reach leader: {e}"}), \
                    "application/json"
        try:
            if action != "public":
                colls = [params.get("collection")] if params and params.get("collection") else []
                if req.path == "/multi_search" and not colls:
                    # authenticate against the collections named in the body
                    # (core_api.cpp:78 handle_authentication collects them
                    # from the searches array)
                    try:
                        colls = [s["collection"] for s in
                                 req.json().get("searches", [])
                                 if isinstance(s, dict) and "collection" in s]
                    except TypesenseError:
                        colls = []
                embedded = self.auth.authenticate(req.api_key, action, colls)
                if embedded:
                    # scoped-key embedded params OVERRIDE client params
                    # (collection_manager.cpp apply_embedded_params uses
                    # overwrite=true) — a tenant filter_by embedded in the key
                    # must not be bypassable from the query string
                    req.embedded_params = embedded
                    for k, v in embedded.items():
                        req.query[k] = v if isinstance(v, str) else json.dumps(v)
            loop = asyncio.get_running_loop()
            t0 = time.monotonic()
            try:
                result = await loop.run_in_executor(
                    self.executor, handler, self, req)
            except RuntimeError as e:
                if "shutdown" in str(e):  # server stopping; request in flight
                    return 503, _json_bytes({"message": "Server is shutting "
                                             "down."}), "application/json"
                raise
            metrics = getattr(self, "metrics", None)
            if metrics is not None:
                label = "search" if req.path.endswith("/documents/search") or \
                    req.path == "/multi_search" else \
                    ("write" if req.method not in ("GET", "HEAD") else "read")
                metrics.record(label, (time.monotonic() - t0) * 1000)
            if isinstance(result, SSEResponse):
                return result.status, result, "text/event-stream"
            if isinstance(result, tuple):
                status, obj = result
            else:
                status, obj = 200, result
            if is_repl_write and status < 400:
                repl.log_write({"method": req.method, "path": req.path,
                                "query": req.query, "body":
                                req.body.decode("utf-8", errors="replace")})
            if isinstance(obj, (bytes, bytearray)):
                return status, bytes(obj), "text/plain; charset=utf-8"
            return status, _json_bytes(obj), "application/json"
        except TypesenseError as e:
            return e.http_code, _json_bytes(e.to_json()), "application/json"
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            return 500, _json_bytes({"message": str(e)}), "application/json"

    # ------------------------------------------------------------------
    def _build_ssl(self):
        """SSLContext from ssl_certificate / ssl_certificate_key config
        (h2o SSL serving, /root/reference/include/http_server.h:118).
        Returns (ctx, cert_path, key_path) or (None, None, None)."""
        import ssl
        cfg = getattr(self, "config", None)
        cert = getattr(cfg, "ssl_certificate", "") if cfg else ""
        key = getattr(cfg, "ssl_certificate_key", "") if cfg else ""
        if not cert or not key:
            return None, None, None
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(cert, key)
        return ctx, cert, key

    async def _ssl_refresh_loop(self, ctx, cert, key):
        """Reload the cert chain when the files change on disk (the
        reference refreshes every ssl_refresh_interval_seconds; we also
        poll mtimes so a renewed cert is picked up without restart).
        New connections handshake with the refreshed chain."""
        import os
        interval = min(getattr(self.config, "ssl_refresh_interval_seconds",
                               28800) or 28800, 3600)
        last = None
        while True:
            await asyncio.sleep(max(min(interval, 60), 1))
            try:
                mt = (os.path.getmtime(cert), os.path.getmtime(key))
                if last is None:
                    last = mt
                elif mt != last:
                    ctx.load_cert_chain(cert, key)
                    last = mt
            except OSError:
                pass  # files temporarily missing mid-renewal

    async def serve(self):
        ctx, cert, key = self._build_ssl()
        server = await asyncio.start_server(self.handle_conn, self.host,
                                            self.port, ssl=ctx)
        if ctx is not None:
            asyncio.ensure_future(self._ssl_refresh_loop(ctx, cert, key))
        async with server:
            await server.serve_forever()

    def run(self):
        asyncio.run(self.serve())


def _reason(status: int) -> str:
    return {200: "OK", 201: "Created", 400: "Bad Request", 401: "Unauthorized",
            403: "Forbidden", 404: "Not Found", 409: "Conflict",
            422: "Unprocessable Entity", 429: "Too Many Requests",
            500: "Internal Server Error", 503: "Service Unavailable"}.get(status, "OK")
