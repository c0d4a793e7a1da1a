"""API key auth: bootstrap key, stored keys with ACLs, scoped keys.

Behavior contract: /root/reference/include/auth_manager.h (api_key_t: value,
description, actions, collections, expires_at, autodelete; PREFIX_LEN=4) and
src/auth_manager.cpp:259-310 (scoped keys: base64 of
<HMAC-SHA256-base64(params, parent_key)><parent_key[:4]><params_json>,
search-only, embedded params merged into the request).
"""

from __future__ import annotations

import base64
import fnmatch
import hashlib
import hmac
import json
import secrets
import time

from typesense_tpu.core.errors import BadRequest, NotFound, Unauthorized

HMAC_BASE64_LEN = 44
PREFIX_LEN = 4
FAR_FUTURE_TIMESTAMP = 64723363199

KEY_PREFIX = "$KP"  # store prefix (auth_manager.h API_KEYS_PREFIX equivalent)

DOCUMENTS_SEARCH_ACTION = "documents:search"


class ApiKey:
    def __init__(self, value: str, description: str = "",
                 actions: list[str] | None = None,
                 collections: list[str] | None = None,
                 expires_at: int = FAR_FUTURE_TIMESTAMP,
                 key_id: int = 0, autodelete: bool = False):
        self.id = key_id
        self.value = value
        self.description = description
        self.actions = actions or []
        self.collections = collections or []
        self.expires_at = expires_at
        self.autodelete = autodelete

    def to_json(self, masked: bool = True) -> dict:
        return {
            "id": self.id,
            "value_prefix" if masked else "value":
                (self.value[:PREFIX_LEN] if masked else self.value),
            "description": self.description,
            "actions": self.actions,
            "collections": self.collections,
            "expires_at": self.expires_at,
            "autodelete": self.autodelete,
        }


def _match_any(patterns: list[str], target: str) -> bool:
    for p in patterns:
        if p == "*" or p == target or fnmatch.fnmatch(target, p):
            return True
    return False


class AuthManager:
    def __init__(self, store=None, bootstrap_key: str = ""):
        self.store = store
        self.bootstrap_key = bootstrap_key
        self.keys: dict[str, ApiKey] = {}
        self.next_id = 0

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan(KEY_PREFIX + "_"):
            obj = json.loads(v)
            key = ApiKey(obj["value"], obj.get("description", ""),
                         obj.get("actions"), obj.get("collections"),
                         obj.get("expires_at", FAR_FUTURE_TIMESTAMP),
                         obj.get("id", 0), obj.get("autodelete", False))
            self.keys[key.value] = key
            self.next_id = max(self.next_id, key.id + 1)

    def create_key(self, body: dict) -> ApiKey:
        # auth_manager.cpp:338-360 api_key_t::validate — description is
        # optional but must be a string; actions/collections must be
        # arrays OF STRINGS
        if "description" in body and not isinstance(body["description"], str):
            raise BadRequest("Key description must be a string.")
        if "actions" not in body or not isinstance(body["actions"], list) \
                or not all(isinstance(a, str) for a in body["actions"]):
            raise BadRequest("Wrong format for `actions`. It should be an array of string.")
        if "collections" not in body or \
                not isinstance(body["collections"], list) or \
                not all(isinstance(c, str) for c in body["collections"]):
            raise BadRequest("Wrong format for `collections`. It should be an array of string.")
        value = body.get("value") or secrets.token_urlsafe(32)
        key = ApiKey(value, body.get("description", ""), body["actions"],
                     body["collections"],
                     body.get("expires_at", FAR_FUTURE_TIMESTAMP),
                     self.next_id, body.get("autodelete", False))
        self.keys[value] = key
        self.next_id += 1
        if self.store is not None:
            self.store.insert(f"{KEY_PREFIX}_{key.id}",
                              json.dumps({**key.to_json(masked=False), "value": value}))
        return key

    def list_keys(self) -> list[dict]:
        return [k.to_json() for k in self.keys.values()]

    def get_key(self, key_id: int) -> ApiKey:
        for k in self.keys.values():
            if k.id == key_id:
                return k
        raise NotFound("Not Found")

    def delete_key(self, key_id: int) -> ApiKey:
        k = self.get_key(key_id)
        self.keys.pop(k.value, None)
        if self.store is not None:
            self.store.remove(f"{KEY_PREFIX}_{key_id}")
        return k

    # ------------------------------------------------------------------
    def authenticate(self, api_key: str, action: str,
                     collections: list[str]) -> dict:
        """Returns embedded params (possibly empty) or raises Unauthorized.
        Mirrors AuthManager::authenticate: direct key -> ACL check; otherwise
        try scoped-key verification."""
        if not api_key:
            raise Unauthorized("Forbidden - a valid `x-typesense-api-key` header "
                               "must be sent.")
        if self.bootstrap_key and hmac.compare_digest(api_key, self.bootstrap_key):
            return {}
        key = self.keys.get(api_key)
        if key is not None:
            if key.expires_at < time.time():
                raise Unauthorized("Forbidden - key has expired.")
            if not _match_any(key.actions, action) and "*" not in key.actions:
                raise Unauthorized("Forbidden - key does not have access to this action.")
            for coll in collections or ["*"]:
                if not _match_any(key.collections, coll):
                    raise Unauthorized("Forbidden - key does not have access to this "
                                       "collection.")
            return {}
        # scoped key path (search-only)
        params = self._verify_scoped(api_key, action, collections)
        if params is None:
            raise Unauthorized("Forbidden - a valid `x-typesense-api-key` header "
                               "must be sent.")
        return params

    @staticmethod
    def generate_scoped_key(parent_key: str, params: dict) -> str:
        payload = json.dumps(params)
        digest = base64.b64encode(
            hmac.new(parent_key.encode(), payload.encode(), hashlib.sha256).digest()
        ).decode()
        raw = digest + parent_key[:PREFIX_LEN] + payload
        return base64.b64encode(raw.encode()).decode()

    def _verify_scoped(self, scoped_key: str, action: str,
                       collections: list[str]) -> dict | None:
        if action != DOCUMENTS_SEARCH_ACTION and action != "documents:search":
            return None
        try:
            payload = base64.b64decode(scoped_key).decode()
        except Exception:
            return None
        if len(payload) < HMAC_BASE64_LEN + PREFIX_LEN:
            return None
        digest = payload[:HMAC_BASE64_LEN]
        prefix = payload[HMAC_BASE64_LEN:HMAC_BASE64_LEN + PREFIX_LEN]
        params_str = payload[HMAC_BASE64_LEN + PREFIX_LEN:]
        candidates = [k for k in self.keys.values() if k.value.startswith(prefix)]
        if self.bootstrap_key and self.bootstrap_key.startswith(prefix):
            candidates.append(ApiKey(self.bootstrap_key, actions=["*"],
                                     collections=["*"]))
        for root in candidates:
            if root.expires_at < time.time():
                continue
            if root.actions and not _match_any(root.actions, action) and "*" not in root.actions:
                continue
            # the parent key's collections ACL must cover every requested
            # collection, exactly like the direct-key path (reference
            # auth_manager.cpp authenticate_parse_params -> auth_against_key
            # with the queried collection)
            if any(not _match_any(root.collections, coll)
                   for coll in (collections or ["*"])):
                continue
            calc = base64.b64encode(
                hmac.new(root.value.encode(), params_str.encode(),
                         hashlib.sha256).digest()).decode()
            if hmac.compare_digest(calc, digest):
                try:
                    params = json.loads(params_str)
                except json.JSONDecodeError:
                    return None
                exp = params.get("expires_at")
                if exp is not None and exp < time.time():
                    return None
                return params
        return None
