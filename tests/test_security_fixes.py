"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. Scoped-key embedded params OVERRIDE client-supplied params (reference
   collection_manager.cpp apply_embedded_params, overwrite=true), both on
   /documents/search and inside /multi_search bodies.
2. Scoped keys inherit the parent key's collections ACL
   (auth_manager.cpp authenticate_parse_params -> auth_against_key).
3. Unauthorized writes never enter the replication oplog.
4. /replication/log and /replication/status require auth.
5. fast_tokenize drops intra-word punctuation in-place, matching the
   Tokenizer / native builder fast path (tokenizer.cpp SKIP semantics).
"""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

from typesense_tpu.api.auth import AuthManager
from typesense_tpu.core.errors import Unauthorized
from typesense_tpu.index.builder import fast_tokenize
from typesense_tpu.server_main import make_server
from typesense_tpu.text.tokenizer import Tokenizer

PORT = 19477
ADMIN = "adminkey123456789"


def req(method, path, body=None, key=ADMIN, **params):
    if params:
        path += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else \
        (body.encode() if isinstance(body, str) else None)
    r = urllib.request.Request(f"http://127.0.0.1:{PORT}{path}", data=data,
                               headers={"X-TYPESENSE-API-KEY": key,
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
    d = tmp_path_factory.mktemp("sec_srv")
    s = make_server(["--data-dir", str(d), "--api-key", ADMIN,
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    st, _ = req("POST", "/collections", {
        "name": "tenants", "fields": [
            {"name": "title", "type": "string"},
            {"name": "tenant", "type": "string"}]})
    assert st == 201
    st, _ = req("POST", "/collections/tenants/documents/import",
                "\n".join(json.dumps({"title": "hello world",
                                      "tenant": t})
                          for t in ["a", "a", "b"]))
    assert st == 200
    st, _ = req("POST", "/collections", {
        "name": "other", "fields": [{"name": "title", "type": "string"}]})
    assert st == 201
    return s


def _make_scoped(server, params, collections=("tenants",)):
    st, parent = req("POST", "/keys", {
        "description": "parent", "actions": ["documents:search"],
        "collections": list(collections)})
    assert st in (200, 201)
    return AuthManager.generate_scoped_key(parent["value"], params)


def test_embedded_filter_not_bypassable(server):
    scoped = _make_scoped(server, {"filter_by": "tenant:=a"})
    st, res = req("GET", "/collections/tenants/documents/search", key=scoped,
                  q="hello", query_by="title")
    assert st == 200 and res["found"] == 2
    # a client-supplied filter_by must NOT replace the embedded tenant filter
    st, res = req("GET", "/collections/tenants/documents/search", key=scoped,
                  q="hello", query_by="title", filter_by="tenant:=b")
    assert st == 200 and res["found"] == 2
    assert all(h["document"]["tenant"] == "a" for h in res["hits"])


def test_embedded_filter_overrides_multi_search_body(server):
    scoped = _make_scoped(server, {"filter_by": "tenant:=a"})
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "tenants", "q": "hello",
                                 "query_by": "title",
                                 "filter_by": "tenant:=b"}]},
                  key=scoped)
    assert st == 200
    assert res["results"][0]["found"] == 2
    assert all(h["document"]["tenant"] == "a"
               for h in res["results"][0]["hits"])


def test_scoped_limit_multi_searches(server):
    scoped = _make_scoped(server, {"limit_multi_searches": 1})
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "tenants", "q": "*"},
                                {"collection": "tenants", "q": "*"}]},
                  key=scoped)
    assert st == 400


def test_scoped_key_respects_parent_collections_acl(server):
    scoped = _make_scoped(server, {"filter_by": "tenant:=a"},
                          collections=("tenants",))
    st, _ = req("GET", "/collections/other/documents/search", key=scoped,
                q="hello", query_by="title")
    assert st == 401


def test_scoped_key_collections_acl_unit():
    auth = AuthManager(store=None, bootstrap_key="root12345678")
    parent = auth.create_key({"actions": ["documents:search"],
                              "collections": ["products"]})
    scoped = AuthManager.generate_scoped_key(parent.value, {"q": "x"})
    assert auth.authenticate(scoped, "documents:search", ["products"]) == \
        {"q": "x"}
    with pytest.raises(Unauthorized):
        auth.authenticate(scoped, "documents:search", ["orders"])


def test_replication_log_requires_auth(server):
    st, _ = req("GET", "/replication/log", key="")
    assert st == 401
    st, _ = req("GET", "/replication/status", key="wrong")
    assert st == 401
    st, _ = req("GET", "/replication/status", key=ADMIN)
    assert st == 200


def test_unauthorized_write_not_logged_to_oplog(server):
    # attach a fake replication state that records log_write calls
    class FakeRepl:
        is_leader = True
        logged = []

        def log_write(self, op):
            self.logged.append(op)

    fake = FakeRepl()
    server.replication = fake
    try:
        st, _ = req("POST", "/collections/tenants/documents",
                    {"title": "evil", "tenant": "z"}, key="badkey")
        assert st == 401
        assert fake.logged == []
        st, _ = req("POST", "/collections/tenants/documents",
                    {"title": "good", "tenant": "a"}, key=ADMIN)
        assert st in (200, 201)
        assert len(fake.logged) == 1
        # handler-rejected writes don't replicate either
        st, _ = req("POST", "/collections/nonexistent/documents",
                    {"title": "x"}, key=ADMIN)
        assert st == 404
        assert len(fake.logged) == 1
    finally:
        server.replication = None


def test_fast_tokenize_matches_tokenizer_skip_semantics():
    cases = ["ice-cream", "don't stop", "hello, world!", "a\tb c",
             "foo--bar baz_qux", "1,000 points", "trailing... dots"]
    for text in cases:
        assert fast_tokenize(text) == Tokenizer(text).tokenize(), text
    assert fast_tokenize("ice-cream") == ["icecream"]
    assert fast_tokenize("don't") == ["dont"]


def test_punctuated_index_and_query_agree(server):
    st, _ = req("POST", "/collections", {
        "name": "punct", "fields": [{"name": "title", "type": "string"}]})
    assert st == 201
    st, _ = req("POST", "/collections/punct/documents",
                {"title": "ice-cream don't"})
    assert st == 201
    st, res = req("GET", "/collections/punct/documents/search",
                  q="ice-cream", query_by="title", num_typos="0",
                  prefix="false")
    assert st == 200 and res["found"] == 1
    st, res = req("GET", "/collections/punct/documents/search",
                  q="don't", query_by="title", num_typos="0", prefix="false")
    assert st == 200 and res["found"] == 1
