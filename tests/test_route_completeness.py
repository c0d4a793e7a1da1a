"""New route surface: item-level synonym/curation CRUD, update-by-filter,
ops routes (db/compact, reset_peers, schema_changes), health/stats aliases
(reference route table, typesense_server.cpp:22-155)."""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "shoes", "fields": [
            {"name": "title", "type": "string"},
            {"name": "stock", "type": "int32"},
            {"name": "brand", "type": "string"}]})
    for i, (t, st, b) in enumerate([("air runner", 5, "nike"),
                                    ("gel walker", 0, "asics"),
                                    ("zoom flyer", 9, "nike")]):
        call(s, "POST", "/collections/shoes/documents",
             body={"id": str(i), "title": t, "stock": st, "brand": b})
    return s


def test_update_by_filter(srv):
    code, res = call(srv, "PATCH", "/collections/shoes/documents",
                     query={"filter_by": "brand:=nike"},
                     body={"stock": 100})
    assert code == 200 and res["num_updated"] == 2
    code, res = call(srv, "GET", "/collections/shoes/documents/0")
    assert res["stock"] == 100 and res["title"] == "air runner"
    code, res = call(srv, "GET", "/collections/shoes/documents/1")
    assert res["stock"] == 0


def test_update_by_filter_requires_filter(srv):
    code, res = call(srv, "PATCH", "/collections/shoes/documents",
                     body={"stock": 1})
    assert code == 400


def test_synonym_item_crud(srv):
    call(srv, "PUT", "/synonym_sets/s1", body={"items": [
        {"id": "a", "synonyms": ["sneaker", "trainer"]}]})
    code, res = call(srv, "PUT", "/synonym_sets/s1/items/b",
                     body={"synonyms": ["runner", "jogger"]})
    assert code == 200 and res["id"] == "b"
    code, res = call(srv, "GET", "/synonym_sets/s1/items")
    assert {i["id"] for i in res} == {"a", "b"}
    code, res = call(srv, "GET", "/synonym_sets/s1/items/b")
    assert code == 200 and res["synonyms"] == ["runner", "jogger"]
    code, _ = call(srv, "DELETE", "/synonym_sets/s1/items/a")
    assert code == 200
    code, res = call(srv, "GET", "/synonym_sets/s1/items")
    assert [i["id"] for i in res] == ["b"]
    code, _ = call(srv, "GET", "/synonym_sets/s1/items/zz")
    assert code == 404


def test_curation_item_crud(srv):
    call(srv, "PUT", "/curation_sets/c1", body={"items": [
        {"id": "promo", "rule": {"query": "air", "match": "contains"},
         "includes": [{"id": "2", "position": 1}]}]})
    code, res = call(srv, "GET", "/curation_sets/c1/items/promo")
    assert code == 200 and res["includes"][0]["id"] == "2"
    code, res = call(srv, "PUT", "/curation_sets/c1/items/promo2",
                     body={"rule": {"query": "gel", "match": "exact"},
                           "excludes": [{"id": "0"}]})
    assert code == 200
    code, res = call(srv, "GET", "/curation_sets/c1/items")
    assert len(res) == 2


def test_ops_routes(srv):
    code, res = call(srv, "POST", "/operations/db/compact")
    assert code == 201 and res["success"]
    code, res = call(srv, "POST", "/operations/reset_peers")
    assert code == 201 and res["success"]
    code, res = call(srv, "GET", "/operations/schema_changes")
    assert code == 200 and res == []


def test_health_and_alias_routes(srv):
    code, res = call(srv, "GET", "/health_with_rusage")
    assert code == 200 and res["ok"] and "system" in res
    code, res = call(srv, "POST", "/health")
    assert code == 200 and res["ok"]
    code, res = call(srv, "GET", "/stats")
    assert code == 200
    code, res = call(srv, "GET", "/metrics")
    assert code == 200
    code, res = call(srv, "POST", "/analytics/aggregate_events",
                     body={"events": []})
    assert code in (201, 400)  # 400 only if analytics unavailable
