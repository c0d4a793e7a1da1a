"""HTTP API tests: in-process dispatch (no socket) + persistence/restart.

Mirrors the reference's api_tests phase matrix (SINGLE_FRESH ->
SINGLE_RESTARTED) at unit scale.
"""

import asyncio
import json

import pytest

from typesense_tpu.api.auth import AuthManager
from typesense_tpu.api.http import HttpServer, Request
from typesense_tpu.core.store import Store
from typesense_tpu.manager import CollectionManager


def make_server(store):
    manager = CollectionManager(store)
    manager.load()
    auth = AuthManager(None, bootstrap_key="testkey")
    return HttpServer(manager, auth, port=0)


def call(server, method, path, body=None, query=None, key="testkey"):
    req = Request(method, path, dict(query or {}),
                  {"x-typesense-api-key": key},
                  json.dumps(body).encode() if body is not None else b"")
    status, payload, _ = asyncio.run(server.dispatch(req))
    try:
        return status, json.loads(payload)
    except json.JSONDecodeError:
        return status, payload.decode()


@pytest.fixture()
def server(tmp_store):
    return make_server(tmp_store)


SCHEMA = {"name": "books", "fields": [
    {"name": "title", "type": "string"},
    {"name": "year", "type": "int32", "facet": True}],
    "default_sorting_field": "year"}


def test_auth_rejected(server):
    assert call(server, "GET", "/collections", key="bad")[0] == 401
    assert call(server, "GET", "/collections", key="")[0] == 401


def test_collection_lifecycle(server):
    st, body = call(server, "POST", "/collections", SCHEMA)
    assert st == 201 and body["name"] == "books"
    st, _ = call(server, "POST", "/collections", SCHEMA)
    assert st == 409
    st, listing = call(server, "GET", "/collections")
    assert st == 200 and len(listing) == 1
    st, _ = call(server, "DELETE", "/collections/books")
    assert st == 200
    assert call(server, "GET", "/collections/books")[0] == 404


def test_documents_and_search(server):
    call(server, "POST", "/collections", SCHEMA)
    st, doc = call(server, "POST", "/collections/books/documents",
                   {"title": "war and peace", "year": 1869})
    assert st == 201 and doc["id"] == "0"
    st, res = call(server, "GET", "/collections/books/documents/search",
                   query={"q": "war", "query_by": "title", "prefix": "false"})
    assert st == 200 and res["found"] == 1
    st, doc2 = call(server, "GET", "/collections/books/documents/0")
    assert st == 200 and doc2["title"] == "war and peace"
    st, _ = call(server, "PATCH", "/collections/books/documents/0",
                 {"year": 1870})
    assert call(server, "GET", "/collections/books/documents/0")[1]["year"] == 1870
    st, _ = call(server, "DELETE", "/collections/books/documents/0")
    assert st == 200
    assert call(server, "GET", "/collections/books/documents/0")[0] == 404


def test_restart_persistence(tmp_store):
    server = make_server(tmp_store)
    call(server, "POST", "/collections", SCHEMA)
    call(server, "POST", "/collections/books/documents",
         {"title": "war and peace", "year": 1869})
    call(server, "PUT", "/aliases/current", {"collection_name": "books"})
    # simulate restart: fresh manager over the same store
    server2 = make_server(tmp_store)
    st, res = call(server2, "GET", "/collections/current/documents/search",
                   query={"q": "peace", "query_by": "title", "prefix": "false"})
    assert st == 200 and res["found"] == 1
    assert res["hits"][0]["document"]["title"] == "war and peace"


def test_scoped_key(server):
    call(server, "POST", "/collections", SCHEMA)
    call(server, "POST", "/collections/books/documents",
         {"title": "old book", "year": 1800})
    call(server, "POST", "/collections/books/documents",
         {"title": "new book", "year": 2020})
    st, key = call(server, "POST", "/keys",
                   {"description": "d", "actions": ["documents:search"],
                    "collections": ["*"]})
    assert st == 201
    scoped = AuthManager.generate_scoped_key(key["value"], {"filter_by": "year:>1900"})
    st, res = call(server, "GET", "/collections/books/documents/search",
                   query={"q": "book", "query_by": "title", "prefix": "false"},
                   key=scoped)
    assert st == 200 and res["found"] == 1
    assert res["hits"][0]["document"]["title"] == "new book"
    # scoped keys are search-only
    assert call(server, "POST", "/collections/books/documents",
                {"title": "x", "year": 1}, key=scoped)[0] == 401


def test_import_and_export(server):
    call(server, "POST", "/collections", SCHEMA)
    lines = "\n".join(json.dumps({"title": f"book {i}", "year": 2000 + i})
                      for i in range(5))
    req = Request("POST", "/collections/books/documents/import", {},
                  {"x-typesense-api-key": "testkey"}, lines.encode())
    status, payload, _ = asyncio.run(server.dispatch(req))
    assert status == 200
    assert payload.decode().count('{"success":true}') == 5
    st, out = call(server, "GET", "/collections/books/documents/export")
    assert st == 200 and out.strip().count("\n") == 4


def test_multi_search(server):
    call(server, "POST", "/collections", SCHEMA)
    call(server, "POST", "/collections/books/documents",
         {"title": "alpha", "year": 1})
    st, res = call(server, "POST", "/multi_search",
                   {"searches": [
                       {"collection": "books", "q": "alpha", "query_by": "title",
                        "prefix": "false"},
                       {"collection": "missing", "q": "x", "query_by": "title"}]})
    assert st == 200
    assert res["results"][0]["found"] == 1
    assert res["results"][1]["code"] == 404


def test_synonyms_and_curation(server):
    call(server, "POST", "/collections", SCHEMA)
    call(server, "POST", "/collections/books/documents",
         {"title": "sneakers on sale", "year": 1})
    call(server, "POST", "/collections/books/documents",
         {"title": "trainers on sale", "year": 2})
    st, _ = call(server, "PUT", "/synonym_sets/shoes",
                 {"items": [{"id": "s1", "synonyms": ["sneakers", "trainers"]}]})
    assert st == 200
    st, res = call(server, "GET", "/collections/books/documents/search",
                   query={"q": "sneakers", "query_by": "title", "prefix": "false",
                          "synonym_sets": "shoes"})
    assert res["found"] == 2
    # curation: pin doc 1 to position 1 for query "sale"
    st, _ = call(server, "PUT", "/curation_sets/promo",
                 {"items": [{"id": "c1",
                             "rule": {"query": "sneakers", "match": "exact"},
                             "includes": [{"id": "1", "position": 1}]}]})
    assert st == 200
    st, res = call(server, "GET", "/collections/books/documents/search",
                   query={"q": "sneakers", "query_by": "title", "prefix": "false",
                          "curation_sets": "promo"})
    assert res["hits"][0]["document"]["id"] == "1"
    assert res["hits"][0].get("curated") is True


def test_stopwords(server):
    call(server, "POST", "/collections", SCHEMA)
    call(server, "POST", "/collections/books/documents",
         {"title": "the great war", "year": 1})
    call(server, "PUT", "/stopwords/common", {"stopwords": ["the", "a"]})
    st, res = call(server, "GET", "/collections/books/documents/search",
                   query={"q": "the war", "query_by": "title", "prefix": "false",
                          "stopwords": "common"})
    assert res["found"] == 1


def test_health_and_misc(server):
    assert call(server, "GET", "/health", key="")[1] == {"ok": True}
    assert call(server, "GET", "/debug")[1]["state"] == 1
    assert call(server, "GET", "/metrics.json")[0] == 200
