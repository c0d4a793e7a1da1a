"""HTTP surface tests for routes not covered elsewhere: schema alter,
export with filter, snapshot, config, union, stats (reference: api_tests
SINGLE_FRESH phase)."""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

from typesense_tpu.server_main import make_server

PORT = 19460


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


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    s = make_server(["--data-dir", str(d), "--api-key", "k",
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    st, _ = req("POST", "/collections", {
        "name": "things", "fields": [
            {"name": "title", "type": "string"},
            {"name": "points", "type": "int32"}]})
    assert st == 201
    st, _ = req("POST", "/collections/things/documents/import",
                "\n".join(json.dumps({"title": f"thing number{i}",
                                      "points": i}) for i in range(8)))
    assert st == 200
    return s


def test_schema_alter_add_and_drop(server):
    st, b = req("PATCH", "/collections/things", {
        "fields": [{"name": "tag", "type": "string", "facet": True,
                    "optional": True}]})
    assert st == 200, (st, b)
    st, b = req("GET", "/collections/things")
    names = [f["name"] for f in b["fields"]]
    assert "tag" in names
    st, b = req("PATCH", "/collections/things", {
        "fields": [{"name": "tag", "drop": True, "type": "string"}]})
    assert st == 200
    st, b = req("GET", "/collections/things")
    assert "tag" not in [f["name"] for f in b["fields"]]


def test_export_with_filter(server):
    st, rows = req("GET", "/collections/things/documents/export",
                   filter_by="points:>5")
    assert st == 200 and len(rows) == 2, rows
    assert all(r["points"] > 5 for r in rows)


def test_snapshot_endpoint(server, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap") / "cp")
    st, b = req("POST", "/operations/snapshot", snapshot_path=snap)
    assert st == 201 and b["success"], (st, b)


def test_runtime_config(server):
    st, b = req("POST", "/config", {"healthy-read-lag": 2000})
    assert st == 201, (st, b)
    st, b = req("GET", "/config")
    assert b["healthy-read-lag"] == 2000
    st, b = req("POST", "/config", {"api-key": "nope"})
    assert st == 400


def test_multi_search_and_union(server):
    st, b = req("POST", "/multi_search", {
        "searches": [
            {"collection": "things", "q": "thing", "query_by": "title"},
            {"collection": "things", "q": "number7", "query_by": "title",
             "num_typos": "0", "prefix": "false"}]})
    assert st == 200 and len(b["results"]) == 2
    assert b["results"][0]["found"] == 8
    assert b["results"][1]["found"] == 1
    st, b = req("POST", "/multi_search", {
        "union": True,
        "searches": [
            {"collection": "things", "q": "number1", "query_by": "title",
             "num_typos": "0", "prefix": "false"},
            {"collection": "things", "q": "number2", "query_by": "title",
             "num_typos": "0", "prefix": "false"}]})
    assert st == 200 and b["found"] == 2 and len(b["hits"]) == 2


def test_stats_and_metrics(server):
    st, b = req("GET", "/stats.json")
    assert st == 200
    st, b = req("GET", "/metrics.json")
    assert st == 200 and any("memory" in k for k in b)


def test_alias_roundtrip(server):
    st, b = req("PUT", "/aliases/stuff", {"collection_name": "things"})
    assert st == 200, (st, b)
    st, b = req("GET", "/collections/stuff/documents/search", q="thing",
                query_by="title")
    assert st == 200 and b["found"] == 8, (st, b)
