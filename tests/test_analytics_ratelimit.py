"""Analytics rules/events/flush + rate limiter tests (reference:
analytics_manager_test.cpp, ratelimit_manager_test.cpp)."""

import pytest

from typesense_tpu.analytics import AnalyticsManager
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.manager import CollectionManager
from typesense_tpu.ratelimit import RateLimitManager


@pytest.fixture()
def setup():
    mgr = CollectionManager(store=None)
    mgr.create_collection({"name": "products", "fields": [
        {"name": "title", "type": "string"},
        {"name": "popularity", "type": "int32"}]})
    mgr.create_collection({"name": "top_queries", "fields": [
        {"name": "q", "type": "string"},
        {"name": "count", "type": "int32"}]})
    am = AnalyticsManager(store=None, collection_manager=mgr)
    return mgr, am


def test_popular_queries_rule(setup):
    mgr, am = setup
    am.upsert_rule({"name": "pop", "type": "popular_queries",
                    "params": {"source": {"collections": ["products"]},
                               "destination": {"collection": "top_queries"},
                               "limit": 100}})
    for _ in range(3):
        am.record_search("products", "socks", 5)
    am.record_search("products", "hats", 2)
    am.record_search("other", "ignored", 1)
    st = am.status()
    assert st["pending_queries"]["pop"] == 2
    res = am.flush()
    assert res["flushed"] == 2
    tq = mgr.get_collection("top_queries")
    docs = {d["q"]: d["count"] for d in tq.docs.values()}
    assert docs == {"socks": 3, "hats": 1}


def test_nohits_rule(setup):
    mgr, am = setup
    am.upsert_rule({"name": "nh", "type": "nohits_queries",
                    "params": {"source": {"collections": []},
                               "destination": {"collection": "top_queries"}}})
    am.record_search("products", "zzz", 0)
    am.record_search("products", "found", 3)
    assert am.status()["pending_queries"]["nh"] == 1


def test_counter_rule(setup):
    mgr, am = setup
    prod = mgr.get_collection("products")
    prod.add({"id": "7", "title": "socks", "popularity": 10})
    am.upsert_rule({"name": "clicks", "type": "counter",
                    "params": {"source": {"collections": ["products"]},
                               "destination": {"collection": "products"},
                               "counter_field": "popularity",
                               "counter_events": [
                                   {"type": "click", "weight": 1},
                                   {"type": "conversion", "weight": 5}]}})
    am.add_event({"type": "click", "name": "clicks", "data": {"doc_id": "7"}})
    am.add_event({"type": "conversion", "name": "clicks", "data": {"doc_id": "7"}})
    am.flush()
    assert prod.get("7")["popularity"] == 16


def test_rule_validation(setup):
    _, am = setup
    with pytest.raises(BadRequest):
        am.upsert_rule({"name": "x", "type": "bogus"})
    with pytest.raises(BadRequest):
        am.upsert_rule({"name": "x", "type": "popular_queries", "params": {}})
    with pytest.raises(NotFound):
        am.get_rule("missing")


def test_ratelimit_block_allow():
    rl = RateLimitManager()
    rl.create_rule({"action": "block", "api_keys": ["badkey"]})
    assert not rl.check("badkey", "1.2.3.4")
    assert rl.check("goodkey", "1.2.3.4")
    rl.create_rule({"action": "allow", "api_keys": ["badkey"]})
    assert rl.check("badkey", "1.2.3.4")  # allow wins


def test_ratelimit_throttle():
    rl = RateLimitManager()
    rl.create_rule({"action": "throttle", "ip_addresses": ["9.9.9.9"],
                    "max_requests_1m": 3})
    now = 1000.0
    for i in range(3):
        assert rl.check("k", "9.9.9.9", now=now + i)
    assert not rl.check("k", "9.9.9.9", now=now + 3)
    # window slides
    assert rl.check("k", "9.9.9.9", now=now + 100)
    # other ips unaffected
    assert rl.check("k", "8.8.8.8", now=now)


def test_ratelimit_auto_ban():
    rl = RateLimitManager()
    rl.create_rule({"action": "throttle", "api_keys": ["k2"],
                    "max_requests_1m": 1, "auto_ban_threshold": 2,
                    "auto_ban_1m_duration_hours": 1})
    now = 5000.0
    assert rl.check("k2", "ip", now=now)
    assert not rl.check("k2", "ip", now=now + 1)  # exceed 1
    assert not rl.check("k2", "ip", now=now + 2)  # exceed 2 -> ban
    assert rl.active_throttles(now=now + 3)
    # banned even after window slides
    assert not rl.check("k2", "ip", now=now + 120)
    rl.delete_throttle("k2")
    assert rl.check("k2", "ip", now=now + 240)


def test_ratelimit_validation():
    rl = RateLimitManager()
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "bogus", "api_keys": ["x"]})
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "block"})
    with pytest.raises(BadRequest):
        rl.create_rule({"action": "throttle", "api_keys": ["x"]})
