"""Preset application + API key lifecycle, ported from
/root/reference/test/auth_manager_test.cpp and
collection_manager presets handling (collection_manager.cpp:1421)."""

import time

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "items",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "points", "type": "int32"}]})
    for i, t in enumerate(["alpha one", "alpha two", "beta three"]):
        call(s, "POST", "/collections/items/documents",
             body={"id": str(i), "title": t, "points": i})
    return s


def test_preset_crud_and_application(srv):
    code, _ = call(srv, "PUT", "/presets/small_page", body={
        "value": {"per_page": 1, "query_by": "title"}})
    assert code == 200
    code, res = call(srv, "GET", "/presets/small_page")
    assert code == 200
    code, res = call(srv, "GET", "/collections/items/documents/search",
                     query={"q": "alpha", "preset": "small_page"})
    assert code == 200
    assert res["found"] == 2 and len(res["hits"]) == 1

    # explicit request params override the preset
    code, res = call(srv, "GET", "/collections/items/documents/search",
                     query={"q": "alpha", "preset": "small_page",
                            "per_page": "10"})
    assert code == 200 and len(res["hits"]) == 2

    code, res = call(srv, "GET", "/presets")
    assert code == 200 and any(
        p.get("name") == "small_page" for p in res.get("presets", []))
    code, _ = call(srv, "DELETE", "/presets/small_page")
    assert code == 200
    # unknown preset is ignored, search still runs
    code, res = call(srv, "GET", "/collections/items/documents/search",
                     query={"q": "alpha", "preset": "small_page",
                            "query_by": "title"})
    assert code == 200 and res["found"] == 2


def test_expired_key_rejected(srv):
    code, res = call(srv, "POST", "/keys", body={
        "description": "short-lived", "actions": ["*"],
        "collections": ["*"], "value": "expkey",
        "expires_at": int(time.time()) - 10})
    assert code == 201
    code, res = call(srv, "GET", "/collections/items/documents/search",
                     query={"q": "alpha", "query_by": "title"},
                     key="expkey")
    assert code == 401


def test_key_actions_scope_enforced(srv):
    code, _ = call(srv, "POST", "/keys", body={
        "description": "search-only", "actions": ["documents:search"],
        "collections": ["items"], "value": "sokey"})
    assert code == 201
    code, res = call(srv, "GET", "/collections/items/documents/search",
                     query={"q": "alpha", "query_by": "title"}, key="sokey")
    assert code == 200
    code, _ = call(srv, "POST", "/collections/items/documents",
                   body={"id": "9", "title": "x", "points": 9}, key="sokey")
    assert code == 401
    code, _ = call(srv, "DELETE", "/collections/items", key="sokey")
    assert code == 401


def test_bad_key_properties_rejected(srv):
    """ValidateBadKeyProperties (auth_manager_test.cpp:422)."""
    for bad in ({"description": "d", "actions": ["*"]},           # no collections
                {"description": "d", "collections": ["*"]},       # no actions
                {"description": 7, "actions": ["*"],
                 "collections": ["*"]},                           # bad desc type
                {"description": "d", "actions": ["*"],
                 "collections": [1]},                             # non-string elem
                {"description": "d", "actions": "*",
                 "collections": ["*"]}):                          # wrong type
        code, _ = call(srv, "POST", "/keys", body=bad)
        assert code == 400, bad


def test_collections_listing_pagination_and_exclude(srv):
    """GET /collections limit/offset/exclude_fields
    (core_api.cpp:230-266)."""
    for n in ("aaa", "bbb"):
        call(srv, "POST", "/collections", body={
            "name": n, "fields": [{"name": "t", "type": "string"}]})
    code, res = call(srv, "GET", "/collections")
    assert code == 200 and len(res) == 3
    code, res = call(srv, "GET", "/collections", query={"limit": "2"})
    assert code == 200 and len(res) == 2
    code, res = call(srv, "GET", "/collections",
                     query={"offset": "2", "limit": "2"})
    assert code == 200 and len(res) == 1
    code, res = call(srv, "GET", "/collections",
                     query={"exclude_fields": "fields"})
    assert code == 200 and all("fields" not in c for c in res)


def test_fetch_document_include_exclude_fields(srv):
    """GET /collections/:c/documents/:id include/exclude_fields pruning
    (core_api.cpp:1897)."""
    code, res = call(srv, "GET", "/collections/items/documents/0",
                     query={"include_fields": "title"})
    assert code == 200 and set(res) == {"id", "title"}
    code, res = call(srv, "GET", "/collections/items/documents/0",
                     query={"exclude_fields": "points"})
    assert code == 200 and "points" not in res and res["title"]


def test_import_return_id_and_doc(srv):
    """import?return_id=true / return_doc=true (core_api.cpp:1528)."""
    import json as _json
    code, raw = call(srv, "POST",
                     "/collections/items/documents/import",
                     body={"title": "ret one", "points": 7},
                     query={"return_id": "true"})
    assert code == 200
    line = _json.loads(raw.strip().split("\n")[0]) if isinstance(raw, str) \
        else raw
    assert line["success"] is True and "id" in line
    code, raw = call(srv, "POST",
                     "/collections/items/documents/import",
                     body={"title": "ret two", "points": 8},
                     query={"return_doc": "true"})
    assert code == 200
    line = _json.loads(raw.strip().split("\n")[0]) if isinstance(raw, str) \
        else raw
    assert line["document"]["title"] == "ret two"


def test_clone_collection(srv):
    """CloneCollection (collection_manager_test.cpp:1522) via
    POST /collections?src_name= (core_api.cpp:279-293)."""
    code, res = call(srv, "POST", "/collections",
                     body={"name": "items2"}, query={"src_name": "items"})
    assert code == 201
    assert res["name"] == "items2"
    assert {f["name"] for f in res["fields"]} == {"title", "points"}
    # schema only — no documents
    code, res = call(srv, "GET", "/collections/items2/documents/search",
                     query={"q": "*"})
    assert code == 200 and res["found"] == 0
    # with documents
    code, res = call(srv, "POST", "/collections",
                     body={"name": "items3"},
                     query={"src_name": "items", "copy_documents": "true"})
    assert code == 201
    code, res = call(srv, "GET", "/collections/items3/documents/search",
                     query={"q": "*"})
    assert code == 200 and res["found"] == 3


def test_preset_applies_inside_multi_search(srv):
    """multi_search searches resolve presets like single searches
    (collection_manager.cpp:1421 preset handling)."""
    call(srv, "PUT", "/presets/alpha_only", body={
        "value": {"query_by": "title", "num_typos": "0",
                  "prefix": "false"}})
    code, res = call(srv, "POST", "/multi_search", body={
        "searches": [{"collection": "items", "q": "alpha",
                      "preset": "alpha_only"}]})
    assert code == 200
    assert res["results"][0]["found"] == 2
