"""Analytics end-to-end over the HTTP surface — reference
analytics_manager flow: rules CRUD -> implicit search capture + explicit
events -> flush -> destination collections queryable (analytics_manager.h
popular_queries / nohits_queries / counter rules).
"""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    from typesense_tpu.analytics import AnalyticsManager
    s.analytics = AnalyticsManager(Store(str(tmp_path / "meta")), s.manager)
    s.analytics.load()
    call(s, "POST", "/collections", body={
        "name": "shop",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "popularity", "type": "int32"}],
        "default_sorting_field": "popularity"})
    call(s, "POST", "/collections/shop/documents",
         body={"id": "d1", "title": "wireless mouse", "popularity": 5})
    call(s, "POST", "/collections/shop/documents",
         body={"id": "d2", "title": "mechanical keyboard", "popularity": 3})
    # destination collections
    call(s, "POST", "/collections", body={
        "name": "top_queries",
        "fields": [{"name": "q", "type": "string"},
                   {"name": "count", "type": "int32"}]})
    call(s, "POST", "/collections", body={
        "name": "no_hits",
        "fields": [{"name": "q", "type": "string"},
                   {"name": "count", "type": "int32"}]})
    return s


def search(s, q):
    return call(s, "GET", "/collections/shop/documents/search",
                query={"q": q, "query_by": "title", "prefix": "false",
                       "num_typos": "0"})[1]


def test_popular_and_nohits_flush_e2e(srv):
    assert call(srv, "POST", "/analytics/rules", body={
        "name": "pop", "type": "popular_queries",
        "params": {"source": {"collections": ["shop"]},
                   "destination": {"collection": "top_queries"},
                   "limit": 10}})[0] in (200, 201)
    assert call(srv, "POST", "/analytics/rules", body={
        "name": "misses", "type": "nohits_queries",
        "params": {"source": {"collections": ["shop"]},
                   "destination": {"collection": "no_hits"},
                   "limit": 10}})[0] in (200, 201)

    for _ in range(3):
        assert search(srv, "mouse")["found"] == 1
    assert search(srv, "keyboard")["found"] == 1
    assert search(srv, "trackball")["found"] == 0

    code, st = call(srv, "GET", "/analytics/status")
    assert code == 200 and st["rules"] == 2

    code, res = call(srv, "POST", "/analytics/flush")
    assert code == 200 and res["flushed"] >= 3

    code, res = call(srv, "GET", "/collections/top_queries/documents/search",
                     query={"q": "*", "per_page": 10})
    counts = {h["document"]["q"]: h["document"]["count"]
              for h in res["hits"]}
    assert counts["mouse"] == 3
    assert counts["keyboard"] == 1
    assert "trackball" not in counts

    code, res = call(srv, "GET", "/collections/no_hits/documents/search",
                     query={"q": "*", "per_page": 10})
    miss = {h["document"]["q"]: h["document"]["count"] for h in res["hits"]}
    assert miss == {"trackball": 1}

    # second flush with no new traffic adds nothing
    code, res = call(srv, "POST", "/analytics/flush")
    assert res["flushed"] == 0


def test_counter_events_flush_e2e(srv):
    assert call(srv, "POST", "/analytics/rules", body={
        "name": "clicks", "type": "counter",
        "params": {"source": {"collections": ["shop"],
                              "events": [{"type": "click", "name": "click",
                                          "weight": 2}]},
                   "destination": {"collection": "shop",
                                   "counter_field": "popularity"}}})[0] \
        in (200, 201)
    for _ in range(2):
        code, _ = call(srv, "POST", "/analytics/events", body={
            "type": "click", "name": "click",
            "data": {"doc_id": "d1", "collection": "shop"}})
        assert code == 201
    code, res = call(srv, "POST", "/analytics/flush")
    assert code == 200
    code, doc = call(srv, "GET", "/collections/shop/documents/d1")
    assert doc["popularity"] == 5 + 2 * 2


def test_events_listing_and_rule_crud(srv):
    call(srv, "POST", "/analytics/rules", body={
        "name": "pop2", "type": "popular_queries",
        "params": {"source": {"collections": ["shop"]},
                   "destination": {"collection": "top_queries"}}})
    code, rules = call(srv, "GET", "/analytics/rules")
    assert code == 200 and any(r["name"] == "pop2"
                               for r in rules["rules"])
    code, one = call(srv, "GET", "/analytics/rules/pop2")
    assert code == 200 and one["type"] == "popular_queries"
    code, _ = call(srv, "PUT", "/analytics/rules/pop2", body={
        "name": "pop2", "type": "popular_queries",
        "params": {"source": {"collections": ["shop"]},
                   "destination": {"collection": "top_queries"},
                   "limit": 5}})
    assert code == 200
    assert call(srv, "DELETE", "/analytics/rules/pop2")[0] == 200
    assert call(srv, "GET", "/analytics/rules/pop2")[0] == 404
