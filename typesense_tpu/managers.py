"""Aux managers: stopwords, synonym sets, curation (override) sets.

Behavior contracts:
- StopwordsManager (/root/reference/include/stopwords_manager.h): named sets
  `{"stopwords": [...], "locale": ...}`; tokens in the set are dropped from
  queries that pass `stopwords=<set>`.
- SynonymIndex (/root/reference/include/synonym_index.h): synonym groups
  `{"synonyms": [...], "root": optional}`; multi-way expansion of matching
  query token spans (root => one-way). Search integration mirrors
  do_synonym_search (index.cpp:6088): each expansion is an alternate query
  whose results merge into the same top-k.
- CurationIndex (/root/reference/include/curation_index.h, override_t in
  include/override.h): rules with a query+match condition that pin/hide
  docs, add filters, or replace the query.
"""

from __future__ import annotations

import json

from typesense_tpu.core.errors import BadRequest, NotFound

STOPWORDS_PREFIX = "$SW"
SYNONYM_PREFIX = "$SY"
CURATION_PREFIX = "$CU"


class StopwordsManager:
    def __init__(self, store=None):
        self.store = store
        self.sets: dict[str, dict] = {}

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan(STOPWORDS_PREFIX + "_"):
            self.sets[k[len(STOPWORDS_PREFIX) + 1:]] = json.loads(v)

    def upsert(self, name: str, body: dict) -> dict:
        if "stopwords" not in body or not isinstance(body["stopwords"], list):
            raise BadRequest("Parameter `stopwords` is required as an array of strings.")
        from typesense_tpu.text.tokenizer import tokenize
        tokens = set()
        for phrase in body["stopwords"]:
            tokens.update(tokenize(str(phrase), locale=body.get("locale", "")))
        entry = {"id": name, "stopwords": sorted(tokens),
                 "locale": body.get("locale", "")}
        self.sets[name] = entry
        if self.store is not None:
            self.store.insert(f"{STOPWORDS_PREFIX}_{name}", json.dumps(entry))
        return entry

    def get(self, name: str) -> dict:
        if name not in self.sets:
            raise NotFound(f"Stopword `{name}` not found.")
        return self.sets[name]

    def list(self) -> list[dict]:
        return list(self.sets.values())

    def delete(self, name: str):
        if name not in self.sets:
            raise NotFound(f"Stopword `{name}` not found.")
        self.sets.pop(name)
        if self.store is not None:
            self.store.remove(f"{STOPWORDS_PREFIX}_{name}")

    def apply(self, tokens: list[str], set_name: str) -> list[str]:
        s = self.sets.get(set_name)
        if s is None:
            return tokens
        sw = set(s["stopwords"])
        # an all-stopword query drops to EMPTY and matches nothing
        # (stopwords_manager_test.cpp StopwordsBasics)
        return [t for t in tokens if t not in sw]


class SynonymSetManager:
    def __init__(self, store=None):
        self.store = store
        self.sets: dict[str, dict] = {}   # set name -> {"items": [group...]}

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan(SYNONYM_PREFIX + "_"):
            self.sets[k[len(SYNONYM_PREFIX) + 1:]] = json.loads(v)

    def upsert(self, name: str, body: dict) -> dict:
        items = body.get("items", body.get("synonyms"))
        if not isinstance(items, list):
            raise BadRequest("Parameter `items` is required as an array of synonym objects.")
        from typesense_tpu.text.tokenizer import tokenize
        norm_items = []
        for it in items:
            if "synonyms" not in it or not isinstance(it["synonyms"], list) or not it["synonyms"]:
                raise BadRequest("Could not find a valid string array of `synonyms`.")
            norm_items.append({
                "id": it.get("id", f"{name}-{len(norm_items)}"),
                "root": it.get("root", ""),
                "synonyms": it["synonyms"],
                "_root_tokens": tokenize(it.get("root", "")) if it.get("root") else [],
                "_syn_tokens": [tokenize(str(s)) for s in it["synonyms"]],
            })
        entry = {"name": name, "items": norm_items}
        self.sets[name] = entry
        if self.store is not None:
            self.store.insert(f"{SYNONYM_PREFIX}_{name}", json.dumps(entry))
        return {"name": name, "items": [
            {"id": i["id"], "root": i["root"], "synonyms": i["synonyms"]}
            for i in norm_items]}

    def get(self, name: str) -> dict:
        if name not in self.sets:
            raise NotFound("Not Found")
        e = self.sets[name]
        return {"name": name, "items": [
            {"id": i["id"], "root": i["root"], "synonyms": i["synonyms"]}
            for i in e["items"]]}

    def list(self) -> list[dict]:
        return [self.get(n) for n in self.sets]

    def delete(self, name: str):
        if name not in self.sets:
            raise NotFound("Not Found")
        self.sets.pop(name)
        if self.store is not None:
            self.store.remove(f"{SYNONYM_PREFIX}_{name}")

    def expand(self, tokens: list[str], set_names: list[str],
               max_expansions: int = 10, prefix: bool = False,
               num_typos: int = 0) -> list[list[str]]:
        """Alternate token sequences for the query (SynonymIndex::
        synonym_reduction equivalent — contiguous span replacement).
        synonym_prefix / synonym_num_typos (synonym_index.cpp:5-29): query
        tokens may prefix-match or typo-match (length-gated budget) the
        synonym's source tokens."""
        from typesense_tpu.search.highlight import _edit_distance_le

        def tok_match(qt: str, st: str) -> bool:
            if qt == st:
                return True
            if prefix and st.startswith(qt):
                return True
            if num_typos > 0 and len(qt) >= 4:
                budget = min(num_typos, 1 if len(qt) < 7 else 2)
                return _edit_distance_le(qt, st, budget)
            return False

        groups = []
        for name in set_names:
            s = self.sets.get(name)
            if s:
                groups.extend(s["items"])
        expansions: list[list[str]] = []
        for g in groups:
            variants = [g["_root_tokens"]] + g["_syn_tokens"] if g["_root_tokens"] \
                else g["_syn_tokens"]
            sources = [g["_root_tokens"]] if g["_root_tokens"] else g["_syn_tokens"]
            for src in sources:
                if not src:
                    continue
                n = len(src)
                for start in range(len(tokens) - n + 1):
                    if all(tok_match(tokens[start + j], src[j])
                           for j in range(n)):
                        for var in variants:
                            # replacing the span with the source itself is
                            # meaningful under prefix/typo matching
                            # (cellpho -> cellphone); the alt != tokens
                            # check below drops true no-ops
                            if not var or (var == src and
                                           tokens[start:start + n] == src):
                                continue
                            alt = tokens[:start] + var + tokens[start + n:]
                            if alt != tokens and alt not in expansions:
                                expansions.append(alt)
                                if len(expansions) >= max_expansions:
                                    return expansions
        return expansions


class CurationSetManager:
    def __init__(self, store=None):
        self.store = store
        self.sets: dict[str, dict] = {}

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan(CURATION_PREFIX + "_"):
            self.sets[k[len(CURATION_PREFIX) + 1:]] = json.loads(v)

    def upsert(self, name: str, body: dict) -> dict:
        items = body.get("items")
        if not isinstance(items, list):
            raise BadRequest("Parameter `items` is required as an array of curation objects.")
        for it in items:
            rule = it.get("rule", {})
            if not ("query" in rule or "filter_by" in rule or "tags" in rule):
                raise BadRequest("The `rule` definition must contain a `query` and "
                                 "`match`, or a `filter_by`.")
            if "query" in rule and rule.get("match") not in ("exact", "contains"):
                raise BadRequest("The `rule` definition must contain a `match`.")
        entry = {"name": name, "items": items}
        self.sets[name] = entry
        if self.store is not None:
            self.store.insert(f"{CURATION_PREFIX}_{name}", json.dumps(entry))
        return entry

    def get(self, name: str) -> dict:
        if name not in self.sets:
            raise NotFound("Not Found")
        return self.sets[name]

    def list(self) -> list[dict]:
        return list(self.sets.values())

    def delete(self, name: str):
        if name not in self.sets:
            raise NotFound("Not Found")
        self.sets.pop(name)
        if self.store is not None:
            self.store.remove(f"{CURATION_PREFIX}_{name}")

    def candidate_rules(self, set_names: list[str],
                        tags: tuple = ()) -> list[dict]:
        """Tag- and activity-window-filtered rule items in set order; query
        matching (static/dynamic) happens in the collection, which owns the
        engine needed for placeholder binding (curate_results tag selection,
        collection.cpp:1056-1124)."""
        import time as _time
        now = int(_time.time())
        tag_set = set(tags)
        items = []
        for name in set_names:
            s = self.sets.get(name)
            if s:
                items.extend(s["items"])
        if tag_set:
            exact = [it for it in items
                     if set(it.get("rule", {}).get("tags", [])) == tag_set]
            if len(tag_set) > 1 and exact:
                items = exact
            else:
                items = [it for it in items
                         if set(it.get("rule", {}).get("tags", [])) & tag_set
                         or it.get("rule", {}).get("tags") == ["*"]]
        else:
            items = [it for it in items
                     if not it.get("rule", {}).get("tags")
                     or it["rule"]["tags"] == ["*"]]
        out = []
        for it in items:
            frm = it.get("effective_from_ts", -1)
            to = it.get("effective_to_ts")
            if (frm is not None and frm >= 0 and now < int(frm)) or \
                    (to is not None and now > int(to)):
                continue
            out.append(it)
        return out

    def matching_rules(self, q: str, set_names: list[str],
                       tags: tuple = ()) -> list[dict]:
        """Rules whose query condition matches `q` (override_t semantics,
        incl. the effective_from_ts/effective_to_ts activity window,
        collection_curation_test.cpp WindowForRule).

        Tag selection (collection.cpp curate_results:92-160): with
        `curation_tags` given, only rules whose tags overlap apply — and
        when multiple tags are sent, an exact full-set match wins over
        partial overlaps; with no tags, only untagged rules and rules
        tagged `*` apply."""
        import time as _time
        ql = q.lower().strip()
        now = int(_time.time())
        tag_set = set(tags)
        items = []
        for name in set_names:
            s = self.sets.get(name)
            if not s:
                continue
            items.extend(s["items"])
        if tag_set:
            exact = [it for it in items
                     if set(it.get("rule", {}).get("tags", [])) == tag_set]
            if len(tag_set) > 1 and exact:
                items = exact
            else:
                items = [it for it in items
                         if set(it.get("rule", {}).get("tags", [])) & tag_set]
        else:
            items = [it for it in items
                     if not it.get("rule", {}).get("tags")
                     or it["rule"]["tags"] == ["*"]]
        out = []
        for it in items:
            frm = it.get("effective_from_ts", -1)
            to = it.get("effective_to_ts")
            if (frm is not None and frm >= 0 and now < int(frm)) or \
                    (to is not None and now > int(to)):
                continue
            rule = it.get("rule", {})
            rq = str(rule.get("query", "")).lower()
            match = rule.get("match")
            if rq:
                if match == "exact" and ql == rq:
                    out.append(it)
                elif match == "contains" and rq in ql:
                    out.append(it)
            elif rule.get("filter_by"):
                out.append(it)
        return out
