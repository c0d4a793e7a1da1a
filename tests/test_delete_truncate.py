"""Delete-endpoint parity: truncate=true (no filter needed) and
top_k_by=field:k, mirroring /root/reference/src/core_api.cpp
del_remove_documents (1971-2048) and Collection::truncate_after_top_k
(src/collection.cpp:7849)."""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

from typesense_tpu.server_main import make_server

PORT = 19471


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
    d = tmp_path_factory.mktemp("srv_trunc")
    s = make_server(["--data-dir", str(d), "--api-key", "k",
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    yield s


def _fresh(name):
    st, _ = req("POST", "/collections", {
        "name": name, "fields": [
            {"name": "title", "type": "string"},
            {"name": "points", "type": "int32"}]})
    assert st == 201
    docs = "\n".join(json.dumps({"id": str(i), "title": f"doc {i}",
                                 "points": i}) for i in range(10))
    st, _ = req("POST", f"/collections/{name}/documents/import", docs)
    assert st == 200


def test_truncate_needs_no_filter(server):
    _fresh("tr1")
    st, body = req("DELETE", "/collections/tr1/documents", truncate="true")
    assert st == 200 and body["num_deleted"] == 10
    st, body = req("GET", "/collections/tr1")
    assert body["num_documents"] == 0
    # collection still usable after truncate
    st, _ = req("POST", "/collections/tr1/documents",
                {"id": "x", "title": "alive", "points": 1})
    assert st == 201
    st, body = req("GET", "/collections/tr1/documents/search",
                   q="alive", query_by="title")
    assert body["found"] == 1


def test_delete_without_filter_or_truncate_400(server):
    _fresh("tr2")
    st, body = req("DELETE", "/collections/tr2/documents")
    assert st == 400 and "filter_by" in body["message"]


def test_top_k_by_keeps_highest(server):
    _fresh("tr3")
    st, body = req("DELETE", "/collections/tr3/documents",
                   **{"top_k_by": "points:3"})
    assert st == 200 and body == {"ok": True}
    st, body = req("GET", "/collections/tr3")
    assert body["num_documents"] == 3
    st, body = req("GET", "/collections/tr3/documents/search",
                   q="*", query_by="title", sort_by="points:desc")
    pts = [h["document"]["points"] for h in body["hits"]]
    assert pts == [9, 8, 7]


def test_top_k_by_validation(server):
    _fresh("tr4")
    st, body = req("DELETE", "/collections/tr4/documents",
                   **{"top_k_by": "points"})
    assert st == 400
    st, body = req("DELETE", "/collections/tr4/documents",
                   **{"top_k_by": "title:3"})
    assert st == 400
    # top_k_by larger than the collection is a no-op
    st, body = req("DELETE", "/collections/tr4/documents",
                   **{"top_k_by": "points:100"})
    assert st == 200
    st, body = req("GET", "/collections/tr4")
    assert body["num_documents"] == 10
