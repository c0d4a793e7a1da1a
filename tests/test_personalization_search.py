"""Personalization (recommendation) SEARCH flow over the real HTTP server
— /root/reference/src/collection.cpp:8117-8246
parse_and_validate_personalization_query: q=* + personalization_* params
pull the user's recent events, embed their docs' user_field history into
one query vector on item_field, and exclude already-seen docs."""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

from typesense_tpu.server_main import make_server

PORT = 19472


def req(method, path, body=None, **params):
    if params:
        path += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else \
        (body.encode() if isinstance(body, str) else None)
    r = urllib.request.Request(f"http://127.0.0.1:{PORT}{path}", data=data,
                               headers={"X-TYPESENSE-API-KEY": "k",
                                        "Content-Type": "application/json"},
                               method=method)
    try:
        with urllib.request.urlopen(r, timeout=30) as resp:
            raw, status = resp.read().decode(), resp.status
    except urllib.error.HTTPError as e:
        raw, status = e.read().decode(), e.code
    try:
        return status, json.loads(raw)
    except json.JSONDecodeError:
        return status, [json.loads(l) for l in raw.splitlines() if l.strip()]


PRM = dict(personalization_user_id="u1", personalization_model_id="pm1",
           personalization_type="recommendation",
           personalization_user_field="user_vec",
           personalization_item_field="item_vec",
           personalization_event_name="click",
           personalization_n_events="2")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv_pers")
    s = make_server(["--data-dir", str(d), "--api-key", "k",
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    st, _ = req("POST", "/collections", {
        "name": "psearch", "fields": [
            {"name": "title", "type": "string"},
            {"name": "user_vec", "type": "float[]", "num_dim": 4},
            {"name": "item_vec", "type": "float[]", "num_dim": 4}]})
    assert st == 201
    docs = [
        {"id": "1", "title": "seen item", "user_vec": [1, 0, 0, 0],
         "item_vec": [1, 0, 0, 0]},
        {"id": "2", "title": "similar item", "user_vec": [0, 1, 0, 0],
         "item_vec": [0.9, 0.1, 0, 0]},
        {"id": "3", "title": "unrelated item", "user_vec": [0, 0, 1, 0],
         "item_vec": [0, 1, 0, 0]},
    ]
    st, res = req("POST", "/collections/psearch/documents/import",
                  "\n".join(json.dumps(x) for x in docs))
    assert st == 200 and all(r["success"] for r in res)
    st, _ = req("POST", "/personalization/models", {
        "id": "pm1", "type": "recommendation", "collection": "psearch"})
    assert st == 201
    st, _ = req("POST", "/analytics/events", {
        "type": "click", "name": "click",
        "data": {"doc_id": "1", "user_id": "u1"}})
    assert st in (200, 201)
    yield s


def test_recommendation_excludes_seen_and_ranks_by_history(server):
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="*", **PRM)
    assert st == 200, body
    ids = [h["document"]["id"] for h in body["hits"]]
    # clicked doc 1 is excluded; doc 2's item_vec is closest to the
    # user's history vector [1,0,0,0]
    assert "1" not in ids
    assert ids[0] == "2"


def test_personalization_validation_errors(server):
    # non-wildcard q
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="item", query_by="title", **PRM)
    assert st == 400 and "only `*` or empty" in body["message"]
    # missing model id
    bad = {**PRM}
    del bad["personalization_model_id"]
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="*", **bad)
    assert st == 400 and "model ID is required" in body["message"]
    # wrong type
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="*", **{**PRM, "personalization_type": "search"})
    assert st == 400 and "must be only `recommendation`" in body["message"]
    # no events for unknown user
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="*", **{**PRM, "personalization_user_id": "nobody"})
    assert st == 400 and "No events found" in body["message"]
    # vector_query forbidden
    st, body = req("GET", "/collections/psearch/documents/search",
                   q="*", vector_query="item_vec:([1,0,0,0])", **PRM)
    assert st == 400 and "Vector query is not allowed" in body["message"]
