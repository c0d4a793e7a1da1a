"""Analytics subsystem: rules + event aggregation + flush.

Behavior contract: /root/reference/include/analytics_manager.h:24-80,
src/analytics_manager.cpp, search_analytics.h:118-119 (rule types
`popular_queries`, `nohits_queries`, `counter`; log_* event types), and
doc_analytics.h:106. Rules aggregate search queries / events in memory and
flush them into a destination collection periodically or on demand
(POST /analytics/flush)."""

from __future__ import annotations

import json
import threading
import time

from typesense_tpu.core.errors import BadRequest, NotFound

RULE_PREFIX = "$AR"

VALID_RULE_TYPES = {"popular_queries", "nohits_queries", "counter",
                    "log", "popular_clicks"}


class AnalyticsManager:
    def __init__(self, store=None, collection_manager=None):
        self.store = store
        self.collections = collection_manager
        self.rules: dict[str, dict] = {}
        # aggregation buffers
        self.query_counts: dict[str, dict[str, int]] = {}   # rule -> q -> count
        self.counter_counts: dict[str, dict[str, int]] = {} # rule -> doc_id -> weight
        self.events_log: list[dict] = []
        self._lock = threading.Lock()
        self.last_flush = int(time.time())

    # -- persistence ----------------------------------------------------
    def load(self):
        if self.store is None:
            return
        for _k, v in self.store.scan(RULE_PREFIX + "_"):
            rule = json.loads(v)
            self.rules[rule["name"]] = rule

    def _persist(self, rule: dict):
        if self.store is not None:
            self.store.batch_write({f"{RULE_PREFIX}_{rule['name']}":
                                    json.dumps(rule)})

    # -- rule CRUD (analytics_manager.h create_rule/remove_rule) --------
    def upsert_rule(self, rule: dict, name: str | None = None) -> dict:
        if name is not None:
            rule = {**rule, "name": name}
        if "name" not in rule:
            raise BadRequest("Request payload is missing `name`.")
        rtype = rule.get("type")
        if rtype not in VALID_RULE_TYPES:
            raise BadRequest(f"Invalid analytics rule type `{rtype}`.")
        params = rule.get("params", {})
        if rtype in ("popular_queries", "nohits_queries", "counter"):
            if not params.get("destination", {}).get("collection"):
                raise BadRequest("Property `params.destination.collection` is required.")
        self.rules[rule["name"]] = rule
        self._persist(rule)
        return rule

    def list_rules(self) -> list[dict]:
        return list(self.rules.values())

    def get_rule(self, name: str) -> dict:
        r = self.rules.get(name)
        if r is None:
            raise NotFound(f"Rule `{name}` not found.")
        return r

    def delete_rule(self, name: str) -> dict:
        r = self.rules.pop(name, None)
        if r is None:
            raise NotFound(f"Rule `{name}` not found.")
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"{RULE_PREFIX}_{name}"])
        self.query_counts.pop(name, None)
        self.counter_counts.pop(name, None)
        return r

    # -- capture ---------------------------------------------------------
    def record_search(self, collection: str, query: str, found: int,
                      tag: str | None = None):
        """Called on every search (core_api.cpp get_search analytics hook).
        `analytics_tag` labels the query in the aggregation key the way
        the reference's query_analytics tag dimension does."""
        if not query or query == "*":
            return
        if tag:
            query = f"{query}\t#{tag}"
        with self._lock:
            for rule in self.rules.values():
                src = rule.get("params", {}).get("source", {})
                colls = src.get("collections", [])
                if colls and collection not in colls:
                    continue
                if rule["type"] == "popular_queries" and found > 0:
                    # reference records POPULAR only when found != 0
                    # (collection_manager.cpp:1452-1457)
                    self.query_counts.setdefault(rule["name"], {})
                    self.query_counts[rule["name"]][query] = \
                        self.query_counts[rule["name"]].get(query, 0) + 1
                elif rule["type"] == "nohits_queries" and found == 0:
                    self.query_counts.setdefault(rule["name"], {})
                    self.query_counts[rule["name"]][query] = \
                        self.query_counts[rule["name"]].get(query, 0) + 1

    def add_event(self, body: dict) -> dict:
        """POST /analytics/events: click/conversion/visit events feed counter
        rules (doc_analytics.h counter events)."""
        etype = body.get("type")
        name = body.get("name")
        data = body.get("data", {})
        if not etype or not name:
            raise BadRequest("`type` and `name` are required.")
        # the event `name` refers to a NAMED EVENT declared inside a rule's
        # params.source.events (analytics event schema); rule-name match
        # kept as a fallback for legacy payloads
        rule = None
        w = 1
        for r in self.rules.values():
            for ev in r.get("params", {}).get("source", {}).get(
                    "events", []) or []:
                if ev.get("name") == name:
                    rule = r
                    if ev.get("type") in (etype, None):
                        w = int(ev.get("weight", 1))
                    break
            if rule is not None:
                break
        if rule is None:
            rule = self.rules.get(name)
        with self._lock:
            self.events_log.append({**body, "ts": int(time.time())})
            if rule is not None and rule["type"] == "counter":
                for we in rule.get("params", {}).get("counter_events", []):
                    if we.get("type") == etype:
                        w = int(we.get("weight", 1))
                doc_id = data.get("doc_id")
                if doc_id is not None:
                    # buffers key by RULE name (flush resolves the rule's
                    # destination from it)
                    cc = self.counter_counts.setdefault(rule["name"], {})
                    cc[doc_id] = cc.get(doc_id, 0) + w
        return {"ok": True}

    def get_events(self, user_id: str, name: str, n: int) -> list[dict]:
        """Most recent `n` events named `name` for `user_id` (newest last) —
        feeds personalization search (analytics_manager get_events)."""
        evs = [e for e in self.events_log
               if e.get("name") == name
               and e.get("data", {}).get("user_id") == user_id]
        return evs[-n:]

    def list_events(self, name: str | None = None, limit: int = 100) -> list[dict]:
        evs = self.events_log[-limit:]
        if name:
            evs = [e for e in evs if e.get("name") == name]
        return evs

    # -- flush -----------------------------------------------------------
    def flush(self, write_fn=None) -> dict:
        """Aggregate buffers into destination collections
        (analytics flush through the write path, analytics_manager.cpp).

        write_fn(dest, doc, operation): override the destination write —
        clustered leaders pass a function that ALSO appends the document op
        to the replication log, so followers converge on identical
        destination collections (the reference flushes through the raft log,
        /root/reference/include/analytics_manager.h:24-80)."""
        if self.collections is None:
            raise BadRequest("Analytics flush requires the collection manager.")
        flushed = 0

        def default_write(dest, doc, operation):
            coll = self.collections.get_collection(dest)
            coll.add(doc, operation=operation)
        write = write_fn or default_write
        with self._lock:
            for rname, counts in list(self.query_counts.items()):
                rule = self.rules.get(rname)
                if rule is None:
                    continue
                dest = rule["params"]["destination"]["collection"]
                limit = int(rule["params"].get("limit", 1000))
                try:
                    self.collections.get_collection(dest)
                except Exception:  # noqa: BLE001 — destination may not exist yet
                    continue
                top = sorted(counts.items(), key=lambda kv: -kv[1])[:limit]
                for q, cnt in top:
                    doc = {"id": str(abs(hash(q)) % (10**12)), "q": q,
                           "count": cnt}
                    if "\t#" in q:
                        # (query, analytics_tag) aggregation key — split
                        # the tag into its own field (search_analytics.cpp
                        # serialize_as_docs analytics_tag)
                        doc["q"], doc["analytics_tag"] = q.split("\t#", 1)
                    write(dest, doc, "upsert")
                    flushed += 1
                counts.clear()
            for rname, counts in list(self.counter_counts.items()):
                rule = self.rules.get(rname)
                if rule is None:
                    continue
                dest = rule["params"]["destination"]["collection"]
                cfield = rule["params"].get("counter_field", "popularity")
                try:
                    coll = self.collections.get_collection(dest)
                except Exception:  # noqa: BLE001
                    continue
                for doc_id, w in counts.items():
                    try:
                        coll.get(doc_id)   # skip deleted docs (NotFound)
                        # $operations.increment applies against the stored
                        # value — replicated followers converge on the same
                        # delta regardless of local state
                        # (collection_specific_more_test.cpp IncrementingCount)
                        write(dest, {"id": doc_id, "$operations":
                                     {"increment": {cfield: int(w)}}},
                              "update")
                        flushed += 1
                    except NotFound:
                        pass
                counts.clear()
        self.last_flush = int(time.time())
        return {"ok": True, "flushed": flushed}

    def clear_buffers(self) -> dict:
        """Follower-side flush replay: the destination document writes
        arrive as separate replicated ops, so the local buffers just clear
        (keeps leader/follower buffers aligned across the flush point)."""
        with self._lock:
            for counts in self.query_counts.values():
                counts.clear()
            for counts in self.counter_counts.values():
                counts.clear()
        self.last_flush = int(time.time())
        return {"ok": True, "flushed": 0}

    def status(self) -> dict:
        return {
            "rules": len(self.rules),
            "pending_queries": {k: len(v) for k, v in self.query_counts.items()},
            "pending_counters": {k: len(v) for k, v in self.counter_counts.items()},
            "last_flush": self.last_flush,
        }
