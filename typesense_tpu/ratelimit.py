"""Rate limiting: per api-key / per-IP rules with allow/block/throttle and
auto-ban.

Behavior contract: /root/reference/include/ratelimit_manager.h:22-50
(RateLimitAction allow/block/throttle, RateLimitedEntityType api_key/ip,
max_requests per minute/hour, auto_ban_threshold/auto_ban_duration),
src/ratelimit_manager.cpp. Rules persist in the meta store."""

from __future__ import annotations

import json
import threading
import time

from typesense_tpu.core.errors import BadRequest, NotFound

RULE_PREFIX = "$RL_RULE"


class RateLimitManager:
    def __init__(self, store=None):
        self.store = store
        self.rules: dict[int, dict] = {}
        self.next_id = 0
        # sliding window counters: (entity_kind, entity) -> [timestamps]
        self._minute: dict[tuple, list[float]] = {}
        self._hour: dict[tuple, list[float]] = {}
        self._bans: dict[tuple, float] = {}        # -> ban expiry epoch
        self._exceeds: dict[tuple, int] = {}       # throttle-exceed counts
        self._lock = threading.Lock()

    # -- persistence ------------------------------------------------------
    def load(self):
        if self.store is None:
            return
        for _k, v in self.store.scan(RULE_PREFIX + "_"):
            rule = json.loads(v)
            self.rules[rule["id"]] = rule
            self.next_id = max(self.next_id, rule["id"] + 1)

    def _persist(self, rule: dict):
        if self.store is not None:
            self.store.batch_write({f"{RULE_PREFIX}_{rule['id']}":
                                    json.dumps(rule)})

    # -- rule CRUD ----------------------------------------------------------
    def create_rule(self, body: dict) -> dict:
        action = body.get("action")
        if action not in ("allow", "block", "throttle"):
            raise BadRequest("Invalid action.")
        if not body.get("api_keys") and not body.get("ip_addresses"):
            raise BadRequest("Either `api_keys` or `ip_addresses` is required.")
        if action == "throttle" and not (body.get("max_requests_1m") or
                                         body.get("max_requests_1h")):
            raise BadRequest("At least one of `max_requests_1m` or "
                             "`max_requests_1h` is required for a throttle rule.")
        rule = {"id": self.next_id, **body}
        self.next_id += 1
        self.rules[rule["id"]] = rule
        self._persist(rule)
        return rule

    def update_rule(self, rule_id: int, body: dict) -> dict:
        if rule_id not in self.rules:
            raise NotFound("Not found.")
        rule = {**self.rules[rule_id], **body, "id": rule_id}
        self.rules[rule_id] = rule
        self._persist(rule)
        return rule

    def list_rules(self) -> list[dict]:
        return list(self.rules.values())

    def get_rule(self, rule_id: int) -> dict:
        if rule_id not in self.rules:
            raise NotFound("Not found.")
        return self.rules[rule_id]

    def delete_rule(self, rule_id: int) -> dict:
        r = self.rules.pop(rule_id, None)
        if r is None:
            raise NotFound("Not found.")
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"{RULE_PREFIX}_{rule_id}"])
        return r

    # -- enforcement --------------------------------------------------------
    def _matching_rules(self, api_key: str, ip: str):
        for rule in self.rules.values():
            keys = rule.get("api_keys") or []
            ips = rule.get("ip_addresses") or []
            if keys and (api_key in keys or ".*" in keys):
                yield ("api_key", api_key), rule
            elif ips and (ip in ips or ".*" in ips):
                yield ("ip", ip), rule

    def check(self, api_key: str, ip: str, now: float | None = None) -> bool:
        """True = allowed. Applies allow > block > throttle precedence
        (ratelimit_manager.cpp is_rate_limited)."""
        now = now if now is not None else time.time()
        with self._lock:
            matched = list(self._matching_rules(api_key, ip))
            for ent, rule in matched:
                if rule["action"] == "allow":
                    return True
            for ent, rule in matched:
                if rule["action"] == "block":
                    return False
            for ent, rule in matched:
                ban_until = self._bans.get(ent, 0)
                if ban_until > now:
                    return False
                m = self._minute.setdefault(ent, [])
                h = self._hour.setdefault(ent, [])
                m[:] = [t for t in m if now - t < 60]
                h[:] = [t for t in h if now - t < 3600]
                lm = rule.get("max_requests_1m") or 0
                lh = rule.get("max_requests_1h") or 0
                if (lm and len(m) >= lm) or (lh and len(h) >= lh):
                    self._exceeds[ent] = self._exceeds.get(ent, 0) + 1
                    thresh = rule.get("auto_ban_threshold") or 0
                    if thresh and self._exceeds[ent] >= thresh:
                        mins = rule.get("auto_ban_1m_duration_hours", 1) * 3600
                        self._bans[ent] = now + mins
                    return False
                m.append(now)
                h.append(now)
            return True

    def active_throttles(self, now: float | None = None) -> list[dict]:
        now = now if now is not None else time.time()
        return [{"entity_type": k[0], "entity": k[1],
                 "banned_until": int(v)}
                for k, v in self._bans.items() if v > now]

    def exceed_counts(self) -> list[dict]:
        return [{"entity_type": k[0], "entity": k[1], "count": v}
                for k, v in self._exceeds.items()]

    def delete_throttle(self, entity: str):
        for k in list(self._bans):
            if k[1] == entity:
                del self._bans[k]

    def delete_exceed(self, entity: str):
        for k in list(self._exceeds):
            if k[1] == entity:
                del self._exceeds[k]
