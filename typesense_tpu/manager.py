"""CollectionManager: global registry, aliases, presets, persistence.

Behavior contract: /root/reference/include/collection_manager.h and
src/collection_manager.cpp — create_collection (meta under `$CM` keys),
load() startup rebuild, symlinks (aliases, `$SL` keys), presets (`$PS`).
"""

from __future__ import annotations

import json
import threading
import time

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, Conflict, NotFound
from typesense_tpu.core.store import Store
from typesense_tpu.schema.field import Field

COLLECTION_META_PREFIX = "$CM"
SYMLINK_PREFIX = "$SL"
PRESET_PREFIX = "$PS"
NEXT_COLLECTION_ID_KEY = "$CI"


class CollectionManager:
    def __init__(self, store: Store | None = None):
        from typesense_tpu.managers import (
            CurationSetManager, StopwordsManager, SynonymSetManager,
        )
        self.store = store
        self.collections: dict[str, Collection] = {}
        self.aliases: dict[str, str] = {}
        self.presets: dict[str, dict] = {}
        self.stopwords = StopwordsManager(store)
        self.synonyms = SynonymSetManager(store)
        self.curations = CurationSetManager(store)
        from typesense_tpu.models.embedder import EmbedderManager
        self.embedders = EmbedderManager()
        from typesense_tpu.text.stemmer import StemmerManager
        self.stemmers = StemmerManager(store)
        self._lock = threading.RLock()
        self._next_collection_id = 0

    # ------------------------------------------------------------------
    def load(self):
        """Startup: rebuild all collections from the store (SURVEY.md §3.1,
        collection_manager.cpp:407 parallel load)."""
        if self.store is None:
            return
        with self._lock:
            nid = self.store.get(NEXT_COLLECTION_ID_KEY)
            self._next_collection_id = int(nid) if nid else 0
            for key, meta_json in self.store.scan(COLLECTION_META_PREFIX + "_"):
                meta = json.loads(meta_json)
                coll = self._instantiate(meta)
                coll.load_from_store()
                self.collections[coll.name] = coll
            for key, target in self.store.scan(SYMLINK_PREFIX + "_"):
                self.aliases[key[len(SYMLINK_PREFIX) + 1:]] = target
            for key, preset in self.store.scan(PRESET_PREFIX + "_"):
                self.presets[key[len(PRESET_PREFIX) + 1:]] = json.loads(preset)
            self.stopwords.load()
            self.synonyms.load()
            self.curations.load()

    def _instantiate(self, meta: dict) -> Collection:
        fields = [Field.from_json(fj) for fj in meta["fields"]]
        coll = Collection(
            name=meta["name"], fields=fields,
            default_sorting_field=meta.get("default_sorting_field", ""),
            store=self.store, collection_id=meta.get("id", 0),
            created_at=meta.get("created_at"),
            enable_nested_fields=meta.get("enable_nested_fields", False),
            symbols_to_index=meta.get("symbols_to_index", []),
            token_separators=meta.get("token_separators", []),
            metadata=meta.get("metadata", {}),
            voice_query_model=meta.get("voice_query_model"),
        )
        coll.manager = self
        return coll

    # ------------------------------------------------------------------
    def create_collection(self, schema: dict) -> Collection:
        if "name" not in schema or not isinstance(schema["name"], str) or not schema["name"]:
            raise BadRequest("Parameter `name` is required.")
        if "fields" not in schema or not isinstance(schema["fields"], list) or not schema["fields"]:
            raise BadRequest("Parameter `fields` must be an array of objects.")
        name = schema["name"]
        with self._lock:
            if name in self.collections:
                raise Conflict(f"A collection with name `{name}` already exists.")
            fields = [Field.from_json(fj) for fj in schema["fields"]]
            meta = {
                "name": name,
                "fields": [f.to_json() for f in fields],
                "default_sorting_field": schema.get("default_sorting_field", ""),
                "enable_nested_fields": schema.get("enable_nested_fields", False),
                "symbols_to_index": schema.get("symbols_to_index", []),
                "token_separators": schema.get("token_separators", []),
                "metadata": schema.get("metadata", {}),
                "voice_query_model": schema.get("voice_query_model"),
                "created_at": int(time.time()),
                "id": self._next_collection_id,
            }
            coll = self._instantiate(meta)
            self.collections[name] = coll
            self._next_collection_id += 1
            if self.store is not None:
                self.store.batch_write({
                    f"{COLLECTION_META_PREFIX}_{name}": json.dumps(meta),
                    NEXT_COLLECTION_ID_KEY: str(self._next_collection_id),
                })
            return coll

    def persist_collection_meta(self, coll: Collection):
        """Re-write a collection's $CM meta after a schema alter so the
        change survives restart (collection_manager.cpp update_collection)."""
        if self.store is None:
            return
        meta = {
            "name": coll.name,
            "fields": [f.to_json() for f in coll.fields],
            "default_sorting_field": coll.default_sorting_field,
            "enable_nested_fields": coll.enable_nested_fields,
            "symbols_to_index": coll.symbols_to_index,
            "token_separators": coll.token_separators,
            "metadata": coll.metadata,
            "voice_query_model": coll.voice_query_model or None,
            "created_at": coll.created_at,
            "id": coll.collection_id,
        }
        self.store.insert(f"{COLLECTION_META_PREFIX}_{coll.name}",
                          json.dumps(meta))

    def get_collection(self, name: str) -> Collection:
        with self._lock:
            resolved = self.aliases.get(name, name)
            coll = self.collections.get(resolved)
            if coll is None:
                raise NotFound(f"No collection with name `{name}` found.")
            return coll

    def drop_collection(self, name: str) -> dict:
        with self._lock:
            coll = self.collections.pop(name, None)
            if coll is None:
                raise NotFound(f"No collection with name `{name}` found.")
            if self.store is not None:
                self.store.remove(f"{COLLECTION_META_PREFIX}_{name}")
                self.store.delete_range(f"{coll.collection_id}_",
                                        f"{coll.collection_id}`")
            return coll.get_summary_json()

    def list_collections(self) -> list[dict]:
        with self._lock:
            return [c.get_summary_json() for c in self.collections.values()]

    # ------------------------------------------------------------------
    def upsert_alias(self, alias: str, collection_name: str):
        with self._lock:
            self.aliases[alias] = collection_name
            if self.store is not None:
                self.store.insert(f"{SYMLINK_PREFIX}_{alias}", collection_name)

    def get_alias(self, alias: str) -> str:
        with self._lock:
            if alias not in self.aliases:
                raise NotFound("Not found.")
            return self.aliases[alias]

    def delete_alias(self, alias: str):
        with self._lock:
            self.aliases.pop(alias, None)
            if self.store is not None:
                self.store.remove(f"{SYMLINK_PREFIX}_{alias}")

    def upsert_preset(self, name: str, value: dict):
        with self._lock:
            self.presets[name] = value
            if self.store is not None:
                self.store.insert(f"{PRESET_PREFIX}_{name}", json.dumps(value))

    def get_preset(self, name: str) -> dict:
        with self._lock:
            if name not in self.presets:
                raise NotFound("Not found.")
            return self.presets[name]

    def delete_preset(self, name: str):
        with self._lock:
            self.presets.pop(name, None)
            if self.store is not None:
                self.store.remove(f"{PRESET_PREFIX}_{name}")
