"""Rate-limit manager scenarios ported from the reference suite
(/root/reference/test/ratelimit_test.cpp): rule CRUD, allow/block
precedence, minute/hour throttles on api keys and IPs, auto-ban with
temporary expiry, wildcard entities, exceed counters and throttle
listing/removal. Time is injected via `now` so windows are deterministic."""

import pytest

from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.ratelimit import RateLimitManager


@pytest.fixture()
def rl():
    return RateLimitManager()


def _throttle_key(rl, key="k1", per_min=2, **kw):
    return rl.create_rule({"action": "throttle", "api_keys": [key],
                           "max_requests_1m": per_min, **kw})


# ---- rule CRUD (TestAddRateLimitApiKey / Ip, TestGetAllRules*) ----

def test_add_rule_api_key(rl):
    r = rl.create_rule({"action": "block", "api_keys": ["k1"]})
    assert r["id"] == 0 and r["action"] == "block"
    assert rl.get_rule(0)["api_keys"] == ["k1"]


def test_add_rule_ip(rl):
    r = rl.create_rule({"action": "block", "ip_addresses": ["10.0.0.1"]})
    assert rl.get_rule(r["id"])["ip_addresses"] == ["10.0.0.1"]


def test_rule_ids_increment(rl):
    a = rl.create_rule({"action": "block", "api_keys": ["a"]})
    b = rl.create_rule({"action": "block", "api_keys": ["b"]})
    assert b["id"] == a["id"] + 1


def test_get_all_rules_empty(rl):
    assert rl.list_rules() == []


def test_get_all_rules(rl):
    rl.create_rule({"action": "block", "api_keys": ["a"]})
    rl.create_rule({"action": "allow", "ip_addresses": ["1.2.3.4"]})
    assert len(rl.list_rules()) == 2


def test_get_rule_not_found(rl):
    with pytest.raises(NotFound):
        rl.get_rule(99)


def test_delete_rule_by_id(rl):
    r = rl.create_rule({"action": "block", "api_keys": ["a"]})
    rl.delete_rule(r["id"])
    assert rl.list_rules() == []
    with pytest.raises(NotFound):
        rl.delete_rule(r["id"])


def test_update_rule(rl):
    r = rl.create_rule({"action": "block", "api_keys": ["a"]})
    u = rl.update_rule(r["id"], {"action": "allow"})
    assert u["action"] == "allow" and u["id"] == r["id"]


def test_invalid_action_rejected(rl):
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "nope", "api_keys": ["a"]})


def test_rule_requires_entity(rl):
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "block"})


def test_throttle_requires_limit(rl):
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "throttle", "api_keys": ["a"]})


# ---- allow / block precedence (TestAllowAPIKey/Ip, TestIsBanned*) ----

def test_block_api_key(rl):
    rl.create_rule({"action": "block", "api_keys": ["bad"]})
    assert rl.check("bad", "9.9.9.9") is False
    assert rl.check("good", "9.9.9.9") is True


def test_block_ip(rl):
    rl.create_rule({"action": "block", "ip_addresses": ["6.6.6.6"]})
    assert rl.check("any", "6.6.6.6") is False
    assert rl.check("any", "7.7.7.7") is True


def test_allow_overrides_block(rl):
    rl.create_rule({"action": "block", "ip_addresses": ["6.6.6.6"]})
    rl.create_rule({"action": "allow", "api_keys": ["vip"]})
    # allow rule wins over the ip block (is_rate_limited precedence)
    assert rl.check("vip", "6.6.6.6") is True
    assert rl.check("pleb", "6.6.6.6") is False


def test_allow_overrides_throttle(rl):
    _throttle_key(rl, "k1", per_min=1)
    rl.create_rule({"action": "allow", "api_keys": ["k1"]})
    for _ in range(10):
        assert rl.check("k1", "1.1.1.1") is True


def test_wildcard_api_key_blocks_all(rl):
    rl.create_rule({"action": "block", "api_keys": [".*"]})
    assert rl.check("anything", "1.1.1.1") is False


def test_wildcard_ip_blocks_all(rl):
    rl.create_rule({"action": "block", "ip_addresses": [".*"]})
    assert rl.check("k", "8.8.8.8") is False


# ---- throttling windows (TestMinute/HourRateLimit*) ----

def test_minute_rate_limit_api_key(rl):
    _throttle_key(rl, "k1", per_min=2)
    t = 1000.0
    assert rl.check("k1", "ip", now=t) is True
    assert rl.check("k1", "ip", now=t + 1) is True
    assert rl.check("k1", "ip", now=t + 2) is False


def test_minute_window_slides(rl):
    _throttle_key(rl, "k1", per_min=2)
    t = 1000.0
    rl.check("k1", "ip", now=t)
    rl.check("k1", "ip", now=t + 1)
    assert rl.check("k1", "ip", now=t + 2) is False
    # window expires -> allowed again
    assert rl.check("k1", "ip", now=t + 61) is True


def test_hour_rate_limit_api_key(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["k1"],
                    "max_requests_1h": 3})
    t = 5000.0
    assert all(rl.check("k1", "ip", now=t + i) for i in range(3))
    assert rl.check("k1", "ip", now=t + 10) is False
    assert rl.check("k1", "ip", now=t + 3601) is True


def test_minute_rate_limit_ip(rl):
    rl.create_rule({"action": "throttle", "ip_addresses": ["2.2.2.2"],
                    "max_requests_1m": 1})
    t = 100.0
    assert rl.check("ka", "2.2.2.2", now=t) is True
    assert rl.check("kb", "2.2.2.2", now=t + 1) is False
    assert rl.check("kb", "3.3.3.3", now=t + 1) is True


def test_throttle_entities_independent(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["a", "b"],
                    "max_requests_1m": 1})
    t = 50.0
    assert rl.check("a", "ip", now=t) is True
    assert rl.check("b", "ip", now=t) is True    # separate counter
    assert rl.check("a", "ip", now=t + 1) is False


def test_minute_and_hour_combined(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["k"],
                    "max_requests_1m": 10, "max_requests_1h": 2})
    t = 0.0
    assert rl.check("k", "ip", now=t) is True
    assert rl.check("k", "ip", now=t + 1) is True
    # hour cap trips first even though the minute cap has room
    assert rl.check("k", "ip", now=t + 70) is False


# ---- auto-ban (TestAutoBan, TestIsBannedAPIKeyTemp) ----

def test_auto_ban_after_threshold(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["k"],
                    "max_requests_1m": 1, "auto_ban_threshold": 2,
                    "auto_ban_1m_duration_hours": 1})
    t = 0.0
    assert rl.check("k", "ip", now=t) is True
    assert rl.check("k", "ip", now=t + 1) is False   # exceed 1
    assert rl.check("k", "ip", now=t + 2) is False   # exceed 2 -> ban
    # banned even after the minute window clears
    assert rl.check("k", "ip", now=t + 120) is False
    assert len(rl.active_throttles(now=t + 120)) == 1


def test_auto_ban_expires(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["k"],
                    "max_requests_1m": 1, "auto_ban_threshold": 1,
                    "auto_ban_1m_duration_hours": 1})
    t = 0.0
    rl.check("k", "ip", now=t)
    assert rl.check("k", "ip", now=t + 1) is False     # ban trips
    assert rl.check("k", "ip", now=t + 3700) is True   # ban expired


def test_exceed_counts_tracked(rl):
    _throttle_key(rl, "k", per_min=1)
    t = 0.0
    rl.check("k", "ip", now=t)
    rl.check("k", "ip", now=t + 1)
    rl.check("k", "ip", now=t + 2)
    counts = rl.exceed_counts()
    assert counts and counts[0]["count"] == 2
    rl.delete_exceed("k")
    assert rl.exceed_counts() == []


def test_delete_throttle_unbans(rl):
    rl.create_rule({"action": "throttle", "api_keys": ["k"],
                    "max_requests_1m": 1, "auto_ban_threshold": 1})
    t = 0.0
    rl.check("k", "ip", now=t)
    assert rl.check("k", "ip", now=t + 1) is False
    assert len(rl.active_throttles(now=t + 2)) == 1
    rl.delete_throttle("k")
    assert rl.active_throttles(now=t + 2) == []
    assert rl.check("k", "ip", now=t + 61) is True


# ---- persistence (rules survive a reload) ----

def test_rules_persist_via_store(tmp_store):
    rl1 = RateLimitManager(store=tmp_store)
    rl1.create_rule({"action": "block", "api_keys": ["a"]})
    rl1.create_rule({"action": "throttle", "ip_addresses": ["1.1.1.1"],
                     "max_requests_1m": 5})
    rl2 = RateLimitManager(store=tmp_store)
    rl2.load()
    assert len(rl2.list_rules()) == 2
    assert rl2.check("a", "x") is False
    assert rl2.next_id == 2


def test_deleted_rule_not_reloaded(tmp_store):
    rl1 = RateLimitManager(store=tmp_store)
    r = rl1.create_rule({"action": "block", "api_keys": ["a"]})
    rl1.delete_rule(r["id"])
    rl2 = RateLimitManager(store=tmp_store)
    rl2.load()
    assert rl2.list_rules() == []
