"""Analytics manager scenarios ported from the reference suite
(/root/reference/test/analytics_manager_test.cpp: CreateRule, UpsertRule,
GetRule(s), DeleteRule, RuleValidation, PopularQueries, NoHitsQueries,
DocCounterEvents, SearchWithNoRule, QueryLogEventsGetInMemory): rule CRUD
+ validation, popular/no-hits aggregation semantics, counter events with
weights, event log retrieval, and flush into destination collections."""

import pytest

from typesense_tpu.analytics import AnalyticsManager
from typesense_tpu.core.errors import BadRequest, NotFound


def _pq_rule(name="top_q", dest="popular_dest", colls=("products",)):
    return {"name": name, "type": "popular_queries",
            "params": {"source": {"collections": list(colls)},
                       "destination": {"collection": dest}}}


@pytest.fixture()
def am():
    return AnalyticsManager()


# ---- rule CRUD (CreateRule / UpsertRule / GetRule / GetRules / Delete) ----

def test_create_rule(am):
    r = am.upsert_rule(_pq_rule())
    assert r["name"] == "top_q"
    assert am.get_rule("top_q")["type"] == "popular_queries"


def test_upsert_rule_overwrites(am):
    am.upsert_rule(_pq_rule())
    am.upsert_rule({**_pq_rule(), "params": {
        "source": {"collections": ["other"]},
        "destination": {"collection": "popular_dest"}}})
    assert am.get_rule("top_q")["params"]["source"]["collections"] == \
        ["other"]
    assert len(am.list_rules()) == 1


def test_upsert_rule_with_path_name(am):
    am.upsert_rule(_pq_rule(name="ignored"), name="override")
    assert am.get_rule("override")["name"] == "override"


def test_get_rules(am):
    am.upsert_rule(_pq_rule("a"))
    am.upsert_rule(_pq_rule("b"))
    assert {r["name"] for r in am.list_rules()} == {"a", "b"}


def test_get_rule_not_found(am):
    with pytest.raises(NotFound):
        am.get_rule("nope")


def test_delete_rule(am):
    am.upsert_rule(_pq_rule())
    am.delete_rule("top_q")
    assert am.list_rules() == []
    with pytest.raises(NotFound):
        am.delete_rule("top_q")


# ---- validation (RuleValidation) ----

def test_rule_requires_name(am):
    with pytest.raises(BadRequest):
        am.upsert_rule({"type": "popular_queries", "params": {
            "destination": {"collection": "d"}}})


def test_rule_requires_valid_type(am):
    with pytest.raises(BadRequest):
        am.upsert_rule({"name": "x", "type": "bogus", "params": {}})


def test_rule_requires_destination(am):
    with pytest.raises(BadRequest):
        am.upsert_rule({"name": "x", "type": "popular_queries",
                        "params": {"source": {"collections": ["c"]}}})


# ---- popular queries aggregation (PopularQueries) ----

def test_popular_queries_aggregate(am):
    am.upsert_rule(_pq_rule())
    am.record_search("products", "shoes", found=3)
    am.record_search("products", "shoes", found=5)
    am.record_search("products", "socks", found=1)
    assert am.query_counts["top_q"] == {"shoes": 2, "socks": 1}


def test_popular_queries_ignore_no_hits(am):
    am.upsert_rule(_pq_rule())
    am.record_search("products", "nothing", found=0)
    assert am.query_counts.get("top_q", {}) == {}


def test_popular_queries_scoped_to_source_collections(am):
    am.upsert_rule(_pq_rule())
    am.record_search("other_coll", "shoes", found=3)
    assert am.query_counts.get("top_q", {}) == {}


def test_wildcard_query_not_recorded(am):
    am.upsert_rule(_pq_rule())
    am.record_search("products", "*", found=9)
    am.record_search("products", "", found=9)
    assert am.query_counts.get("top_q", {}) == {}


def test_analytics_tag_dimension(am):
    am.upsert_rule(_pq_rule())
    am.record_search("products", "shoes", found=2, tag="mobile")
    assert list(am.query_counts["top_q"]) == ["shoes\t#mobile"]


# ---- no-hits queries (NoHitsQueries) ----

def test_nohits_queries_aggregate(am):
    am.upsert_rule({"name": "misses", "type": "nohits_queries",
                    "params": {"source": {"collections": ["products"]},
                               "destination": {"collection": "nohits"}}})
    am.record_search("products", "unicorn", found=0)
    am.record_search("products", "unicorn", found=0)
    am.record_search("products", "shoes", found=4)
    assert am.query_counts["misses"] == {"unicorn": 2}


def test_search_with_no_rule_is_noop(am):
    am.record_search("products", "shoes", found=3)
    assert am.query_counts == {}


# ---- counter events (DocCounterEvents) ----

def _counter_rule(am):
    am.upsert_rule({"name": "clicks", "type": "counter", "params": {
        "source": {"collections": ["products"],
                   "events": [{"name": "click_ev", "type": "click",
                               "weight": 2},
                              {"name": "conv_ev", "type": "conversion",
                               "weight": 5}]},
        "destination": {"collection": "products",
                        "counter_field": "popularity"}}})


def test_counter_event_weights(am):
    _counter_rule(am)
    am.add_event({"type": "click", "name": "click_ev",
                  "data": {"doc_id": "7", "user_id": "u1"}})
    am.add_event({"type": "conversion", "name": "conv_ev",
                  "data": {"doc_id": "7", "user_id": "u1"}})
    assert am.counter_counts["clicks"]["7"] == 7


def test_counter_event_distinct_docs(am):
    _counter_rule(am)
    am.add_event({"type": "click", "name": "click_ev",
                  "data": {"doc_id": "1"}})
    am.add_event({"type": "click", "name": "click_ev",
                  "data": {"doc_id": "2"}})
    assert am.counter_counts["clicks"] == {"1": 2, "2": 2}


def test_event_requires_type_and_name(am):
    with pytest.raises(BadRequest):
        am.add_event({"name": "click_ev"})
    with pytest.raises(BadRequest):
        am.add_event({"type": "click"})


# ---- event log retrieval (QueryLogEventsGetInMemory) ----

def test_events_log_in_memory(am):
    _counter_rule(am)
    for i in range(5):
        am.add_event({"type": "click", "name": "click_ev",
                      "data": {"doc_id": str(i), "user_id": "u9"}})
    evs = am.list_events("click_ev")
    assert len(evs) == 5
    assert am.get_events("u9", "click_ev", 2)[-1]["data"]["doc_id"] == "4"


def test_list_events_limit(am):
    _counter_rule(am)
    for i in range(10):
        am.add_event({"type": "click", "name": "click_ev",
                      "data": {"doc_id": str(i)}})
    assert len(am.list_events("click_ev", limit=3)) == 3


# ---- persistence ----

def test_rules_persist(tmp_store):
    a1 = AnalyticsManager(store=tmp_store)
    a1.upsert_rule(_pq_rule())
    a2 = AnalyticsManager(store=tmp_store)
    a2.load()
    assert a2.get_rule("top_q")["type"] == "popular_queries"


def test_deleted_rule_not_reloaded(tmp_store):
    a1 = AnalyticsManager(store=tmp_store)
    a1.upsert_rule(_pq_rule())
    a1.delete_rule("top_q")
    a2 = AnalyticsManager(store=tmp_store)
    a2.load()
    assert a2.list_rules() == []
