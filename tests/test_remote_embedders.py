"""Remote embedder provider parity (text_embedder_remote.h:73-232):
request shapes per provider (OpenAI / Azure / Google PaLM / GCP Vertex),
retry with backoff honoring remote_embedding_num_tries, per-request
timeout honoring remote_embedding_timeout_ms, GCP token refresh on auth
failure, and the search-param plumbing into the hybrid embed path."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from typesense_tpu.core.errors import BadRequest
from typesense_tpu.models.embedder import (
    AzureEmbedder, EmbedderManager, GCPEmbedder, GoogleEmbedder,
    OpenAIEmbedder, RemoteEmbedder)

PORT = 19870


class MockProvider(BaseHTTPRequestHandler):
    calls: list = []
    fail_next: int = 0
    delay_s: float = 0.0
    auth_fail_until_refresh = False
    refreshed = False

    def log_message(self, *a):
        pass

    def do_POST(self):
        cls = MockProvider
        body = json.loads(self.rfile.read(
            int(self.headers.get("Content-Length", 0)) or 0) or b"{}")
        cls.calls.append({"path": self.path, "body": body,
                          "headers": dict(self.headers)})
        if cls.delay_s:
            time.sleep(cls.delay_s)
        if self.path == "/token":
            cls.refreshed = True
            out = {"access_token": "fresh-token"}
        elif cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"{}")
            return
        elif cls.auth_fail_until_refresh and \
                self.headers.get("Authorization") != "Bearer fresh-token":
            self.send_response(401)
            self.end_headers()
            self.wfile.write(b"{}")
            return
        elif "embedText" in self.path:
            out = {"embedding": {"value": [0.5] * 768}}
        elif ":predict" in self.path:
            out = {"predictions": [
                {"embeddings": {"values": [0.25] * 768}}
                for _ in body.get("instances", [])]}
        else:  # openai / azure format
            out = {"data": [{"index": i, "embedding": [0.125] * 8}
                            for i in range(len(body.get("input", [])))]}
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps(out).encode())


@pytest.fixture(scope="module")
def mock():
    srv = ThreadingHTTPServer(("127.0.0.1", PORT), MockProvider)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield MockProvider
    srv.shutdown()


@pytest.fixture(autouse=True)
def reset(mock):
    mock.calls = []
    mock.fail_next = 0
    mock.delay_s = 0.0
    mock.auth_fail_until_refresh = False
    mock.refreshed = False


BASE = f"http://127.0.0.1:{PORT}"


def test_openai_request_shape_and_batching(mock):
    e = OpenAIEmbedder({"model_name": "openai/text-embedding-3-small",
                        "api_key": "sk-test", "url": BASE, "num_dim": 8})
    out = e.embed_documents(["a", "b", "c"], remote_embedding_batch_size=2)
    assert out.shape == (3, 8)
    assert len(mock.calls) == 2  # 2 + 1 under batch_size=2
    c0 = mock.calls[0]
    assert c0["path"] == "/v1/embeddings"   # custom URL gains /v1/embeddings
    assert c0["body"]["model"] == "text-embedding-3-small"
    assert c0["body"]["input"] == ["a", "b"]
    assert c0["body"]["dimensions"] == 8    # custom dims forwarded
    assert c0["headers"]["Authorization"] == "Bearer sk-test"


def test_openai_url_path_rules():
    # url already containing /v1/embeddings is kept; /v1 gains /embeddings
    assert OpenAIEmbedder({"model_name": "openai/x",
                           "url": "http://h/v1/embeddings"}).url == \
        "http://h/v1/embeddings"
    assert OpenAIEmbedder({"model_name": "openai/x",
                           "url": "http://h/v1"}).url == "http://h/v1/embeddings"
    assert OpenAIEmbedder({"model_name": "openai/x",
                           "url": "http://h"}).url == "http://h/v1/embeddings"


def test_azure_api_key_header(mock):
    e = AzureEmbedder({"model_name": "azure/dep1", "api_key": "az-key",
                       "url": BASE + "/azure-deployment", "num_dim": 8})
    out = e.embed_query("hi")
    assert out.shape == (8,)
    c = mock.calls[0]
    assert c["path"] == "/azure-deployment"
    hdrs = {k.lower(): v for k, v in c["headers"].items()}
    assert hdrs["api-key"] == "az-key"
    assert "authorization" not in hdrs


def test_google_palm_one_text_per_call(mock, monkeypatch):
    monkeypatch.setattr(GoogleEmbedder, "URL", BASE + "/embedText?key=")
    e = GoogleEmbedder({"model_name": "google/embedding-gecko-001",
                        "api_key": "g-key"})
    assert e.num_dim == 768
    out = e.embed_documents(["x", "y"])
    assert out.shape == (2, 768)
    assert len(mock.calls) == 2            # one text per request
    assert mock.calls[0]["body"] == {"text": "x"}
    assert "key=g-key" in mock.calls[0]["path"]


def test_google_rejects_other_models():
    with pytest.raises(BadRequest, match="embedding-gecko-001"):
        GoogleEmbedder({"model_name": "google/other-model", "api_key": "k"})


def test_gcp_vertex_instances_capped_and_task_split(mock, monkeypatch):
    e = GCPEmbedder({"model_name": "gcp/textembedding-gecko@003",
                     "project_id": "p1", "access_token": "fresh-token",
                     "region": "us-central1"})
    monkeypatch.setattr(GCPEmbedder, "url",
                        property(lambda self: BASE + "/v1:predict"))
    out = e.embed_documents(["a", "b", "c", "d", "e", "f", "g"])
    assert out.shape == (7, 768)
    assert len(mock.calls) == 2            # 5-instance cap -> 5 + 2
    assert len(mock.calls[0]["body"]["instances"]) == 5
    assert mock.calls[0]["body"]["instances"][0]["task_type"] == \
        "RETRIEVAL_DOCUMENT"
    mock.calls = []
    e.embed_query("q1")
    assert mock.calls[0]["body"]["instances"][0]["task_type"] == \
        "RETRIEVAL_QUERY"


def test_gcp_token_refresh_on_401(mock, monkeypatch):
    e = GCPEmbedder({"model_name": "gcp/textembedding-gecko@003",
                     "project_id": "p1", "access_token": "stale-token",
                     "refresh_token": "r1", "client_id": "c1",
                     "client_secret": "s1"})
    monkeypatch.setattr(GCPEmbedder, "url",
                        property(lambda self: BASE + "/v1:predict"))
    monkeypatch.setattr(GCPEmbedder, "AUTH_URL", BASE + "/token")
    mock.auth_fail_until_refresh = True
    out = e.embed_query("hello")
    assert out.shape == (768,)
    assert mock.refreshed
    assert e.access_token == "fresh-token"
    auth_calls = [c for c in mock.calls if c["path"] == "/token"]
    assert auth_calls[0]["body"]["grant_type"] == "refresh_token"


def test_retries_honor_num_tries(mock):
    e = OpenAIEmbedder({"model_name": "openai/m", "url": BASE,
                        "num_dim": 8})
    mock.fail_next = 2
    # 3 tries: two 500s then success
    out = e.embed_query("zz", remote_embedding_num_tries=3)
    assert out.shape == (8,)
    assert len(mock.calls) == 3
    mock.calls = []
    mock.fail_next = 2
    with pytest.raises(BadRequest, match="failed"):
        e.embed_query("yy", remote_embedding_num_tries=1)
    assert len(mock.calls) == 1            # num_tries=1 -> no retry


def test_timeout_honored(mock):
    e = OpenAIEmbedder({"model_name": "openai/m", "url": BASE,
                        "num_dim": 8})
    mock.delay_s = 1.0
    t0 = time.time()
    with pytest.raises(BadRequest):
        e.embed_query("slow", remote_embedding_timeout_ms=150,
                      remote_embedding_num_tries=1)
    assert time.time() - t0 < 0.9          # did not wait the full second


def test_query_cache(mock):
    e = OpenAIEmbedder({"model_name": "openai/m", "url": BASE,
                        "num_dim": 8})
    e.embed_query("cached")
    e.embed_query("cached")
    assert len(mock.calls) == 1            # LRU query cache hit


def test_manager_routing():
    m = EmbedderManager()
    assert isinstance(m.get({"model_name": "openai/m", "url": BASE}),
                      OpenAIEmbedder)
    assert isinstance(m.get({"model_name": "azure/m", "url": BASE}),
                      AzureEmbedder)
    assert isinstance(m.get({"model_name": "google/embedding-gecko-001",
                             "api_key": "k"}), GoogleEmbedder)
    assert isinstance(m.get({"model_name": "gcp/m", "project_id": "p",
                             "access_token": "t"}), GCPEmbedder)
    # plain url with no provider prefix -> OpenAI-format client
    assert isinstance(m.get({"model_name": "custom-model", "url": BASE}),
                      OpenAIEmbedder)


def test_search_params_flow_into_remote_query(mock):
    """remote_embedding_timeout_ms / num_tries search params reach the
    provider client on the hybrid embed path (collection.h:238-239)."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    c = Collection("rememb", [
        Field("title", "string"),
        Field("emb", "float[]", num_dim=8, embed={
            "from": ["title"],
            "model_config": {"model_name": "openai/m", "url": BASE,
                             "num_dim": 8, "api_key": "k"}})])
    c.add({"id": "0", "title": "hello world"})
    c._ensure_index()      # doc auto-embed happens here, not in the search
    mock.calls = []
    mock.fail_next = 1
    # num_tries=2 survives one 500; the search then succeeds
    r = c.search({"q": "hello", "query_by": "title,emb",
                  "remote_embedding_num_tries": "2",
                  "remote_embedding_timeout_ms": "5000"})
    assert r["found"] >= 1
    # the q embed call retried exactly once after the failure
    embed_calls = [x for x in mock.calls if "input" in x["body"]]
    assert len([x for x in embed_calls
                if x["body"]["input"] == ["hello"]]) == 2
