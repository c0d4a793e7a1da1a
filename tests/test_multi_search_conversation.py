"""Conversation (RAG) over multi_search: one answer over the combined
result docs, with the reference's query-param-only placement rules
(core_api.cpp multi_search conversation block;
core_api_utils.cpp:118 multi_search_validate_and_add_params;
collection_vector_search_test.cpp InvalidMultiSearchConversation)."""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

import typesense_tpu.models.llm as llm_mod
from typesense_tpu.server_main import make_server

PORT = 19474


def req(method, path, body=None, **params):
    if params:
        path += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else None
    r = urllib.request.Request(f"http://127.0.0.1:{PORT}{path}", data=data,
                               headers={"X-TYPESENSE-API-KEY": "k",
                                        "Content-Type": "application/json"},
                               method=method)
    try:
        with urllib.request.urlopen(r, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("mcsrv")
    s = make_server(["--data-dir", str(d), "--api-key", "k",
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    for name in ("books", "films"):
        st, _ = req("POST", "/collections", {
            "name": name,
            "fields": [{"name": "title", "type": "string"},
                       {"name": "emb", "type": "float[]", "num_dim": 4}]})
        assert st == 201
    req("POST", "/collections/books/documents",
        {"id": "b1", "title": "space travel guide", "emb": [1, 0, 0, 0]})
    req("POST", "/collections/films/documents",
        {"id": "f1", "title": "space odyssey film", "emb": [0, 1, 0, 0]})
    st, m = req("POST", "/conversations/models",
                {"model_name": "openai/gpt-4o-mini", "api_key": "sk-x",
                 "history_collection": "convhist", "max_bytes": 16000})
    assert st == 201, m
    s._conv_id = m["id"]
    return s


@pytest.fixture()
def fake_llm(monkeypatch):
    calls = {}

    def fake_chat_complete(model, messages, **kw):
        calls["messages"] = messages
        return "an answer about space"
    monkeypatch.setattr(llm_mod, "chat_complete", fake_chat_complete)
    return calls


def test_multi_search_conversation_combined_answer(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books", "query_by": "title"},
                                {"collection": "films", "query_by": "title"}]},
                  q="space", conversation="true",
                  conversation_model_id=server._conv_id)
    assert st == 200, res
    assert res["conversation"]["answer"] == "an answer about space"
    assert res["conversation"]["query"] == "space"
    assert "conversation_id" in res["conversation"]
    # both collections' docs reached the LLM context; vector fields stripped
    ctx = fake_llm["messages"][-1]["content"]
    assert "space travel guide" in ctx and "space odyssey film" in ctx
    assert "emb" not in ctx
    # every result echoes the common q
    for r in res["results"]:
        assert r["request_params"]["q"] == "space"


def test_conversation_in_body_rejected(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books", "query_by": "title",
                                 "conversation": "true"}]}, q="space")
    assert st == 400
    assert "query parameter" in res["message"]


def test_q_in_body_rejected_when_conversation(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books", "query_by": "title",
                                 "q": "space"}]},
                  q="space", conversation="true",
                  conversation_model_id=server._conv_id)
    assert st == 400
    assert "`q` parameter cannot be used in POST body" in res["message"]


def test_model_id_in_body_rejected_when_conversation(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books", "query_by": "title",
                                 "conversation_model_id": "x"}]},
                  q="space", conversation="true",
                  conversation_model_id=server._conv_id)
    assert st == 400
    assert "conversation_model_id" in res["message"]


def test_conversation_requires_model_id(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books",
                                 "query_by": "title"}]},
                  q="space", conversation="true")
    assert st == 400
    assert "no conversation model ID" in res["message"]


def test_conversation_followup_uses_history(server, fake_llm):
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books",
                                 "query_by": "title"}]},
                  q="space", conversation="true",
                  conversation_model_id=server._conv_id)
    assert st == 200
    cid = res["conversation"]["conversation_id"]
    st, res2 = req("POST", "/multi_search",
                   {"searches": [{"collection": "books",
                                  "query_by": "title"}]},
                   q="more please", conversation="true",
                   conversation_model_id=server._conv_id,
                   conversation_id=cid)
    assert st == 200
    assert res2["conversation"]["conversation_id"] == cid


def test_conversation_requires_nonempty_q(server, fake_llm):
    # empty/missing common q with conversation=true is a 400, not an LLM
    # call with an empty question (core_api.cpp raw_query handling)
    st, res = req("POST", "/multi_search",
                  {"searches": [{"collection": "books",
                                 "query_by": "title"}]},
                  conversation="true",
                  conversation_model_id=server._conv_id)
    assert st == 400
    assert "`q` parameter" in res["message"]
    assert "messages" not in fake_llm


def test_conversation_vector_fields_stripped_common_collection(server,
                                                               fake_llm):
    # collection supplied via COMMON query params (not per-search body):
    # embedding vectors must still be stripped from the LLM context
    st, res = req("POST", "/multi_search",
                  {"searches": [{"query_by": "title"}]},
                  q="space", conversation="true",
                  collection="books",
                  conversation_model_id=server._conv_id)
    assert st == 200, res
    joined = " ".join(str(m) for m in fake_llm["messages"])
    assert "emb" not in joined
