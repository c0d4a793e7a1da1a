"""SSE conversation streaming + replicated analytics flush.

Mirrors /root/reference/src/conversation_model.cpp get_answer_stream
(`stream: true` provider call re-emitted as `data: {...}` events with a
trailing `data: [DONE]`) and include/analytics_manager.h flush-through-raft.
"""

import json
import threading

from typesense_tpu.models.llm import ConversationModelManager


class FakeOpenAISSE:
    """Minimal local chat-completions endpoint that streams three deltas."""

    def __init__(self):
        import http.server

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self_h):
                body = json.loads(self_h.rfile.read(
                    int(self_h.headers["Content-Length"])))
                assert body.get("stream") is True
                self_h.send_response(200)
                self_h.send_header("Content-Type", "text/event-stream")
                self_h.end_headers()
                for word in ["Hello", " streamed", " world"]:
                    ev = {"choices": [{"delta": {"content": word}}]}
                    self_h.wfile.write(
                        f"data: {json.dumps(ev)}\n\n".encode())
                self_h.wfile.write(b"data: [DONE]\n\n")

            def log_message(self_h, *a):
                pass

        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def close(self):
        self.srv.shutdown()


def test_converse_stream_events():
    fake = FakeOpenAISSE()
    try:
        mgr = ConversationModelManager()
        m = mgr.create({
            "model_name": "openai/gpt-4", "api_key": "k",
            "history_collection": "hist", "max_bytes": 10000,
            "api_url": f"http://127.0.0.1:{fake.port}/v1/chat/completions"})
        events = list(mgr.converse_stream(
            m["id"], "what is this?",
            [{"document": {"title": "a doc"}}]))
        assert events[-1] == "data: [DONE]\n\n"
        deltas = []
        for ev in events[:-1]:
            assert ev.startswith("data: ") and ev.endswith("\n\n")
            payload = json.loads(ev[len("data: "):])
            deltas.append(payload["conversation"]["answer"])
        # three delta events + one final full-answer event
        assert deltas[:3] == ["Hello", " streamed", " world"]
        assert deltas[-1] == "Hello streamed world"
        assert json.loads(events[-2][6:])["conversation"]["complete"] is True
    finally:
        fake.close()


def test_analytics_flush_replicates_doc_ops(tmp_path):
    """Leader flush must append destination doc writes to the oplog; the
    flush replay on a follower only clears buffers."""
    from typesense_tpu.analytics import AnalyticsManager
    from typesense_tpu.manager import CollectionManager
    from typesense_tpu.core.store import Store
    from typesense_tpu.api.handlers import do_analytics_flush

    store = Store(str(tmp_path / "db"))
    mgr = CollectionManager(store)
    mgr.create_collection({"name": "popular_q", "fields": [
        {"name": "q", "type": "string"},
        {"name": "count", "type": "int32"}]})

    analytics = AnalyticsManager(Store(str(tmp_path / "meta")), mgr)
    analytics.upsert_rule({"name": "pop", "type": "popular_queries",
                           "params": {"source": {"collections": ["c"]},
                                      "destination": {"collection":
                                                      "popular_q"},
                                      "limit": 10}})
    analytics.record_search("c", "chicken soup", 5)
    analytics.record_search("c", "chicken soup", 3)

    logged = []

    class FakeRepl:
        is_leader = True

        def log_write(self, op):
            logged.append(op)

    class FakeServer:
        pass

    srv = FakeServer()
    srv.replication = FakeRepl()
    srv.manager = mgr
    srv.analytics = analytics
    res = do_analytics_flush(srv)
    assert res["flushed"] == 1
    # the destination write went to the oplog as a document op
    assert len(logged) == 1
    assert logged[0]["path"] == "/collections/popular_q/documents"
    assert json.loads(logged[0]["body"])["q"] == "chicken soup"
    # destination collection updated locally too
    docs = list(mgr.get_collection("popular_q").docs.values())
    assert docs and docs[0]["count"] == 2

    # follower replay: clear_buffers leaves destinations untouched
    analytics.record_search("c", "beef stew", 1)
    out = analytics.clear_buffers()
    assert out["flushed"] == 0
    assert all(not v for v in analytics.query_counts.values())


def test_proxy_sse_streams_upstream(tmp_path):
    """POST /proxy_sse (core_api.cpp:3303): the upstream SSE body streams
    back to the client as chunked server-sent events."""
    import http.client
    import time
    from typesense_tpu.server_main import make_server

    fake = FakeOpenAISSE()
    port = 19890
    s = make_server(["--data-dir", str(tmp_path), "--api-key", "pk",
                     "--api-address", "127.0.0.1", "--api-port", str(port)])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.8)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=15)
        conn.request("POST", "/proxy_sse", json.dumps({
            "url": f"http://127.0.0.1:{fake.port}/v1/chat/completions",
            "method": "POST",
            "body": json.dumps({"stream": True}),
            "headers": {"Content-Type": "application/json"}}),
            {"X-TYPESENSE-API-KEY": "pk",
             "Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert "text/event-stream" in resp.getheader("Content-Type", "")
        raw = resp.read().decode()
        events = [e for e in raw.split("\n\n") if e.strip()]
        assert events[-1].strip() == "data: [DONE]"
        assert any("streamed" in e for e in events)
        # validation errors surface as 400s
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=15)
        conn.request("POST", "/proxy_sse", json.dumps({"method": "POST"}),
                     {"X-TYPESENSE-API-KEY": "pk"})
        assert conn.getresponse().status == 400
    finally:
        fake.close()
