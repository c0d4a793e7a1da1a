"""nl_query=true search integration: the free-form `q` runs through the
collection's NL search model and the generated {q, filter_by, sort_by}
augment the search params; results carry `parsed_nl_query` and the
original q echoes in request_params (reference:
natural_language_search_model_manager.cpp:345-430 augmentation,
:494 add_nl_query_data_to_results; core_api.cpp:687 wiring)."""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

import typesense_tpu.models.llm as llm_mod
from typesense_tpu.server_main import make_server

PORT = 19473


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
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("nlsrv")
    s = make_server(["--data-dir", str(d), "--api-key", "k",
                     "--api-address", "127.0.0.1", "--api-port", str(PORT)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    st, _ = req("POST", "/collections", {
        "name": "shoes",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "brand", "type": "string", "facet": True},
                   {"name": "price", "type": "int32"}]})
    assert st == 201
    for i, (t, b, p) in enumerate([("red running shoe", "nike", 120),
                                   ("blue running shoe", "adidas", 80),
                                   ("red walking shoe", "nike", 60)]):
        st, _ = req("POST", "/collections/shoes/documents",
                    {"id": str(i), "title": t, "brand": b, "price": p})
        assert st == 201
    st, m = req("POST", "/nl_search_models",
                {"model_name": "openai/gpt-4o-mini", "api_key": "sk-x",
                 "max_bytes": 16000})
    assert st == 201
    s._nl_model_id = m["id"]
    return s


@pytest.fixture()
def fake_llm(monkeypatch):
    """Stub the provider call: the 'LLM' extracts a brand filter."""
    def fake_chat_complete(model, messages, **kw):
        user_q = messages[-1]["content"]
        out = {"q": "shoe", "filter_by": "brand:=nike"}
        if "cheap" in user_q:
            out["filter_by"] += " && price:<100"
        if "sorted" in user_q:
            out["sort_by"] = "price:desc"
        return json.dumps(out)
    monkeypatch.setattr(llm_mod, "chat_complete", fake_chat_complete)


def test_nl_query_augments_and_reports(server, fake_llm):
    st, res = req("GET", "/collections/shoes/documents/search",
                  q="nike shoes please", query_by="title",
                  nl_query="true", nl_model_id=server._nl_model_id)
    assert st == 200, res
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"0", "2"}
    pn = res["parsed_nl_query"]
    assert pn["generated_params"]["filter_by"] == "brand:=nike"
    assert pn["augmented_params"]["q"] == "shoe"
    # the original free-form query echoes back
    assert res["request_params"]["q"] == "nike shoes please"


def test_nl_query_filter_ands_with_existing(server, fake_llm):
    st, res = req("GET", "/collections/shoes/documents/search",
                  q="cheap nike shoes", query_by="title",
                  filter_by="price:>50", nl_query="true",
                  nl_model_id=server._nl_model_id)
    assert st == 200, res
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"2"}  # nike && <100 && >50
    assert res["parsed_nl_query"]["augmented_params"]["filter_by"] == \
        "price:>50 && brand:=nike && price:<100"


def test_nl_query_sort_by(server, fake_llm):
    st, res = req("GET", "/collections/shoes/documents/search",
                  q="nike shoes sorted", query_by="title",
                  nl_query="true", nl_model_id=server._nl_model_id)
    assert st == 200, res
    prices = [h["document"]["price"] for h in res["hits"]]
    assert prices == sorted(prices, reverse=True)


def test_nl_query_model_failure_falls_back(server, monkeypatch):
    def boom(model, messages, **kw):
        raise RuntimeError("provider down")
    monkeypatch.setattr(llm_mod, "chat_complete", boom)
    st, res = req("GET", "/collections/shoes/documents/search",
                  q="running", query_by="title",
                  nl_query="true", nl_model_id=server._nl_model_id)
    # search still serves with the raw q; the NL error is reported
    assert st == 200, res
    assert res["found"] == 2
    assert "error" in res["parsed_nl_query"]
    assert res["parsed_nl_query"]["generated_params"] == {}


def test_nl_query_in_multi_search(server, fake_llm):
    st, res = req("POST", "/multi_search", {
        "searches": [{"collection": "shoes", "q": "nike shoes please",
                      "query_by": "title", "nl_query": "true",
                      "nl_model_id": server._nl_model_id}]})
    assert st == 200, res
    r = res["results"][0]
    assert {h["document"]["id"] for h in r["hits"]} == {"0", "2"}
    assert r["parsed_nl_query"]["generated_params"]["q"] == "shoe"


def test_nl_query_false_is_noop(server, fake_llm):
    st, res = req("GET", "/collections/shoes/documents/search",
                  q="running", query_by="title")
    assert st == 200
    assert "parsed_nl_query" not in res
