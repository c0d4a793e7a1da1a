"""Replication tests: leader election, write forwarding, follower catch-up,
health lag (reference strategy: api_tests MULTI_FRESH phase — real processes
on localhost, SURVEY.md §4.3; here in-process servers on localhost ports)."""

import json
import threading
import time
import urllib.request

import pytest

from typesense_tpu.server_main import make_server

BASE_PORT = 19310


def _req(port, method, path, body=None, **params):
    import urllib.parse
    if params:
        path += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else \
        (body.encode() if isinstance(body, str) else None)
    r = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                               headers={"X-TYPESENSE-API-KEY": "k",
                                        "Content-Type": "application/json"},
                               method=method)
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    nodes = f"127.0.0.1:{BASE_PORT},127.0.0.1:{BASE_PORT + 1}"
    servers = []
    for i in range(2):
        d = tmp_path_factory.mktemp(f"node{i}")
        s = make_server(["--data-dir", str(d), "--api-key", "k",
                        "--api-address", "127.0.0.1",
                         "--api-port", str(BASE_PORT + i),
                         "--nodes", nodes])
        threading.Thread(target=s.run, daemon=True).start()
        servers.append(s)
    time.sleep(1.0)
    for s in servers:
        s.replication.refresh_leader()
    return servers


def test_leader_election(cluster):
    leader, follower = cluster
    assert leader.replication.is_leader
    assert not follower.replication.is_leader
    st, b = _req(BASE_PORT, "GET", "/status")
    assert b["state"] == "LEADER"
    st, b = _req(BASE_PORT + 1, "GET", "/status")
    assert b["state"] == "FOLLOWER"


def test_write_forwarding_and_catchup(cluster):
    leader, follower = cluster
    # create collection ON THE FOLLOWER -> forwarded to leader
    st, b = _req(BASE_PORT + 1, "POST", "/collections", {
        "name": "repl", "fields": [{"name": "t", "type": "string"}]})
    assert st == 201, (st, b)
    # leader has it immediately
    st, b = _req(BASE_PORT, "GET", "/collections/repl")
    assert st == 200, (st, b)
    # add docs through the leader
    st, b = _req(BASE_PORT, "POST", "/collections/repl/documents",
                 {"t": "hello world"})
    assert st == 201, (st, b)

    # the quorum-ack push already replicated the ops — the follower is
    # current BEFORE any pull, and catch-up finds nothing new
    assert (follower.replication.applied_seq
            == leader.replication.applied_seq)
    assert follower.replication.catch_up_once() == 0
    st, b = _req(BASE_PORT + 1, "GET", "/collections/repl")
    assert st == 200 and b["num_documents"] == 1, (st, b)
    # and can serve the search locally (read-any-node)
    st, b = _req(BASE_PORT + 1, "GET", "/collections/repl/documents/search",
                 q="hello", query_by="t")
    assert st == 200 and b["found"] == 1, (st, b)


def test_health_and_lag(cluster):
    leader, follower = cluster
    follower.replication.catch_up_once()
    st, b = _req(BASE_PORT + 1, "GET", "/health")
    assert st == 200 and b["read_caught_up"], b
    # simulate lag beyond threshold
    follower.replication.healthy_read_lag = 0
    follower.replication.applied_seq -= 1
    st, b = _req(BASE_PORT, "POST", "/collections/repl/documents",
                 {"t": "more data"})
    st, b = _req(BASE_PORT + 1, "GET", "/health")
    assert st == 503 and not b["read_caught_up"], (st, b)
    follower.replication.healthy_read_lag = 1000
    follower.replication.catch_up_once()
    follower.replication.catch_up_once()
    st, b = _req(BASE_PORT + 1, "GET", "/health")
    assert st == 200, (st, b)


def test_replication_log_endpoint(cluster):
    st, b = _req(BASE_PORT, "GET", "/replication/log", **{"from": 0})
    assert st == 200 and len(b["ops"]) >= 2, b
    assert all("_seq" in op for op in b["ops"])


def test_oplog_survives_restart(tmp_path):
    """Leader restart: op log + applied seq reload from the store."""
    nodes = f"127.0.0.1:{BASE_PORT + 50}"
    s = make_server(["--data-dir", str(tmp_path), "--api-key", "k",
                     "--api-address", "127.0.0.1",
                     "--api-port", str(BASE_PORT + 50), "--nodes", nodes])
    s.replication.refresh_leader()
    s.replication.log_write({"method": "POST", "path": "/collections",
                             "query": {}, "body": "{}"})
    applied = s.replication.applied_seq
    s.manager.store  # keep store open reference

    s2 = make_server(["--data-dir", str(tmp_path), "--api-key", "k",
                      "--api-address", "127.0.0.1",
                      "--api-port", str(BASE_PORT + 51), "--nodes", nodes])
    assert s2.replication.applied_seq == applied
    assert s2.replication.next_seq == applied + 1
