"""Quorum consensus + snapshot install (reference: raft_server.cpp:292
quorum apply, on_snapshot_load store reload + rebuild):

- majority-vote elections with term safety
- leader lease fencing: an ex-leader cut from the majority rejects writes
- leader failover mid-import converges with no lost/duplicated docs
- a gapped follower (leader compacted its oplog) installs the snapshot
"""

import json
import threading
import time
import urllib.parse
import urllib.request

import pytest

from typesense_tpu.parallel.replication import ReplicationState, NodesFile
from typesense_tpu.server_main import make_server

BASE = 19700
KEY = "ck"


def req(port, method, path, body=None, **params):
    if params:
        path += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if isinstance(body, (dict, list)) else \
        (body.encode() if isinstance(body, str) else None)
    r = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                               headers={"X-TYPESENSE-API-KEY": KEY},
                               method=method)
    try:
        with urllib.request.urlopen(r, timeout=15) as resp:
            raw, status = resp.read().decode(), resp.status
    except urllib.error.HTTPError as e:
        raw, status = e.read().decode(), e.code
    try:
        return status, json.loads(raw)
    except json.JSONDecodeError:
        return status, [json.loads(l) for l in raw.splitlines() if l.strip()]


@pytest.fixture(scope="module")
def trio(tmp_path_factory):
    nodes = ",".join(f"127.0.0.1:{BASE + i}" for i in range(3))
    servers = []
    for i in range(3):
        d = tmp_path_factory.mktemp(f"cnode{i}")
        s = make_server(["--data-dir", str(d), "--api-key", KEY,
                         "--api-address", "127.0.0.1",
                         "--api-port", str(BASE + i), "--nodes", nodes])
        threading.Thread(target=s.run, daemon=True).start()
        servers.append(s)
    time.sleep(0.8)
    assert servers[0].replication.start_election()
    time.sleep(0.3)
    return servers


def test_election_is_majority_and_termed(trio):
    n0, n1, n2 = trio
    assert n0.replication.is_leader
    assert not n1.replication.is_leader
    term = n0.replication.term
    assert term >= 1
    assert n1.replication.term == term and n2.replication.term == term
    assert n1.replication.leader == n0.replication.self_addr


def test_vote_safety_unit():
    r = ReplicationState(None, lambda op: None, NodesFile(inline=""),
                         ("127.0.0.1", 1))
    r.applied_seq = 5
    r.term = 1
    # stale term denied
    assert not r.handle_request_vote({"term": 0, "candidate": "a:1",
                                      "last_seq": 9})["granted"]
    # behind-log candidate denied
    assert not r.handle_request_vote({"term": 2, "candidate": "a:1",
                                      "last_seq": 3})["granted"]
    # valid vote granted once per term
    assert r.handle_request_vote({"term": 3, "candidate": "a:1",
                                  "last_seq": 9})["granted"]
    assert not r.handle_request_vote({"term": 3, "candidate": "b:2",
                                      "last_seq": 9})["granted"]
    assert r.handle_request_vote({"term": 3, "candidate": "a:1",
                                  "last_seq": 9})["granted"]


def test_failover_mid_import_no_lost_or_duplicated(trio):
    n0, n1, n2 = trio
    st, _ = req(BASE, "POST", "/collections", {
        "name": "fo", "fields": [{"name": "t", "type": "string"}]})
    assert st == 201
    for i in range(10):
        st, _ = req(BASE, "POST", "/collections/fo/documents",
                    {"id": f"a{i}", "t": f"alpha doc{i}"})
        assert st == 201
    # followers catch up before the crash
    n1.replication.catch_up_once()
    n2.replication.catch_up_once()

    # leader "dies": loses its lease and leadership claim
    n0.replication._lease_until = 0.0
    n0.replication.leader = None

    # n1 takes over via majority election (n2 + n0 still answer votes)
    assert n1.replication.start_election()
    assert n1.replication.is_leader
    assert n1.replication.term > n2.replication.term - 1

    # resume the import through the NEW leader and through a follower
    for i in range(5):
        st, _ = req(BASE + 1, "POST", "/collections/fo/documents",
                    {"id": f"b{i}", "t": f"beta doc{i}"})
        assert st == 201
    for i in range(5):
        st, _ = req(BASE + 2, "POST", "/collections/fo/documents",
                    {"id": f"c{i}", "t": f"gamma doc{i}"})
        assert st == 201, st

    n2.replication.catch_up_once()
    # every doc exactly once on leader and follower
    for port in (BASE + 1, BASE + 2):
        st, b = req(port, "GET", "/collections/fo")
        assert st == 200 and b["num_documents"] == 20, (port, b)
        st, b = req(port, "GET", "/collections/fo/documents/export")
        got = sorted(d["id"] for d in b)
        assert got == sorted([f"a{i}" for i in range(10)]
                             + [f"b{i}" for i in range(5)]
                             + [f"c{i}" for i in range(5)]), got


def test_ex_leader_rejects_writes_when_fenced(trio):
    n0, _, _ = trio
    # n0 lost leadership in the failover test; it must refuse writes
    # instead of accepting them into a divergent log
    assert not n0.replication.is_leader
    if n0.replication.leader is None:
        st, b = req(BASE, "POST", "/collections/fo/documents",
                    {"id": "rogue", "t": "rogue"})
        assert st == 503, (st, b)


def test_snapshot_install_for_gapped_follower(tmp_path_factory):
    base = BASE + 20
    nodes = f"127.0.0.1:{base},127.0.0.1:{base + 1}"
    d0 = tmp_path_factory.mktemp("snap0")
    # s0 boots as a single-node cluster (quorum 1 — writes ack locally),
    # then the membership EXPANDS to two nodes when the blank follower
    # joins (nodes-file refresh, typesense_server_utils.cpp:425)
    s0 = make_server(["--data-dir", str(d0), "--api-key", KEY,
                      "--api-address", "127.0.0.1",
                      "--api-port", str(base),
                      "--nodes", f"127.0.0.1:{base}"])
    threading.Thread(target=s0.run, daemon=True).start()
    time.sleep(0.5)
    assert s0.replication.start_election()

    st, _ = req(base, "POST", "/collections", {
        "name": "snapc", "fields": [{"name": "t", "type": "string"}]})
    assert st == 201
    for i in range(8):
        st, _ = req(base, "POST", "/collections/snapc/documents",
                    {"id": str(i), "t": f"word number{i}"})
        assert st == 201
    # compact away the whole history -> any new follower has a GAP
    removed = s0.replication.compact_oplog(keep=0)
    assert removed >= 1

    # membership expands to include the (blank) replacement follower
    s0.replication.nodes.inline = nodes
    d1 = tmp_path_factory.mktemp("snap1")
    s1 = make_server(["--data-dir", str(d1), "--api-key", KEY,
                      "--api-address", "127.0.0.1",
                      "--api-port", str(base + 1), "--nodes", nodes])
    threading.Thread(target=s1.run, daemon=True).start()
    time.sleep(0.5)
    s1.replication.refresh_leader()
    assert s1.replication.leader == ("127.0.0.1", base)

    # catch-up detects the gap and installs the snapshot
    s1.replication.catch_up_once()
    assert s1.replication.applied_seq == s0.replication.applied_seq
    st, b = req(base + 1, "GET", "/collections/snapc")
    assert st == 200 and b["num_documents"] == 8, (st, b)
    st, b = req(base + 1, "GET", "/collections/snapc/documents/search",
                q="word", query_by="t")
    assert st == 200 and b["found"] == 8

    # incremental catch-up still works after the install
    st, _ = req(base, "POST", "/collections/snapc/documents",
                {"id": "9", "t": "word number9"})
    assert st == 201
    s1.replication.catch_up_once()
    st, b = req(base + 1, "GET", "/collections/snapc")
    assert b["num_documents"] == 9


def test_crash_poison_skip(tmp_path):
    """An op that crashes mid-apply leaves the $AP marker; the restarted
    node converts it to a $XP skip entry and advances past the poison op
    (crash_callback -> persist_applying_index -> BatchedIndexer skip,
    typesense_server.cpp:159-172, batched_indexer.h:82-88)."""
    from typesense_tpu.core.store import Store
    from typesense_tpu.parallel.replication import (
        APPLYING_KEY, ReplicationState, NodesFile,
    )

    store = Store(str(tmp_path / "meta"))
    applied = []

    def apply_fn(op):
        applied.append(op["body"])

    # build a 2-node-ish state and a fake leader log
    leader_store = Store(str(tmp_path / "leader"))
    leader = ReplicationState(leader_store, lambda op: None,
                              NodesFile(inline=""), ("127.0.0.1", 1))
    for i in range(4):
        leader.log_write({"method": "POST", "path": "/x", "query": {},
                          "body": f"op{i}"})

    follower = ReplicationState(store, apply_fn, NodesFile(inline=""),
                                ("127.0.0.1", 2))
    # simulate: follower crashed while applying op seq 2
    store.insert(APPLYING_KEY, "2")
    follower2 = ReplicationState(store, apply_fn, NodesFile(inline=""),
                                 ("127.0.0.1", 2))
    assert 2 in follower2.skip_seqs
    assert store.get(APPLYING_KEY) is None

    # replay the leader's log through the skip logic
    ops = leader.log_since(0)
    with follower2._lock:
        for op in ops:
            seq = op.pop("_seq")
            if seq != follower2.applied_seq + 1:
                continue
            follower2._persist_op(seq, op)
            if seq in follower2.skip_seqs:
                follower2.applied_seq = seq
                follower2.next_seq = seq + 1
                continue
            store.insert(APPLYING_KEY, str(seq))
            follower2.apply_fn(op)
            store.remove(APPLYING_KEY)
            follower2.applied_seq = seq
            follower2.next_seq = seq + 1
    assert applied == ["op0", "op1", "op3"]   # poison op2 skipped
    assert follower2.applied_seq == 3
    store.close()
    leader_store.close()


def test_skip_writes_mode(tmp_path):
    base = BASE + 40
    s = make_server(["--data-dir", str(tmp_path), "--api-key", KEY,
                     "--api-address", "127.0.0.1",
                     "--api-port", str(base), "--skip-writes", "true"])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.5)
    st, b = req(base, "POST", "/collections", {
        "name": "x", "fields": [{"name": "t", "type": "string"}]})
    assert st == 422, (st, b)
    st, _ = req(base, "GET", "/collections")
    assert st == 200


def test_quorum_ack_write_survives_leader_death(tmp_path_factory):
    """The write path acks the client only after a MAJORITY of nodes
    PERSISTED the op (raft_server.cpp:292 node->apply, on_apply at :507):
    killing the leader immediately after a 201 must not lose the write —
    it already lives on a quorum and the new leader serves it with no
    catch-up pull from the dead node."""
    base = BASE + 60
    nodes = ",".join(f"127.0.0.1:{base + i}" for i in range(3))
    servers = []
    for i in range(3):
        d = tmp_path_factory.mktemp(f"qnode{i}")
        s = make_server(["--data-dir", str(d), "--api-key", KEY,
                         "--api-address", "127.0.0.1",
                         "--api-port", str(base + i), "--nodes", nodes])
        threading.Thread(target=s.run, daemon=True).start()
        servers.append(s)
    time.sleep(0.8)
    n0, n1, n2 = servers
    assert n0.replication.start_election()
    st, _ = req(base, "POST", "/collections", {
        "name": "qa", "fields": [{"name": "t", "type": "string"}]})
    assert st == 201
    st, _ = req(base, "POST", "/collections/qa/documents",
                {"id": "precious", "t": "must survive"})
    assert st == 201

    # leader dies the instant the client got its ack — NO catch_up_once
    n0.replication._lease_until = 0.0
    n0.replication.leader = None
    n0.replication.stop()

    # push replication already placed the ops on n1/n2 — both are
    # up-to-date voters and either can lead
    assert n1.replication.applied_seq == n0.replication.applied_seq
    assert n2.replication.applied_seq == n0.replication.applied_seq
    assert n1.replication.start_election()
    assert n1.replication.is_leader

    st, b = req(base + 1, "GET", "/collections/qa/documents/precious")
    assert st == 200 and b["t"] == "must survive"
    st, b = req(base + 1, "GET", "/collections/qa/documents/search",
                q="survive", query_by="t")
    assert st == 200 and b["found"] == 1


def test_quorum_failure_rejects_write(tmp_path_factory):
    """With both followers down, a 3-node leader must 503 writes (cannot
    persist to a quorum) even while its lease is still warm."""
    base = BASE + 70
    nodes = ",".join(f"127.0.0.1:{base + i}" for i in range(3))
    d = tmp_path_factory.mktemp("qfnode0")
    s = make_server(["--data-dir", str(d), "--api-key", KEY,
                     "--api-address", "127.0.0.1",
                     "--api-port", str(base), "--nodes", nodes])
    threading.Thread(target=s.run, daemon=True).start()
    time.sleep(0.5)
    # hand-grant leadership + a warm lease (peers never existed, so no
    # elections can succeed — this models "followers just died")
    s.replication.leader = s.replication.self_addr
    s.replication._lease_until = time.time() + 30
    st, b = req(base, "POST", "/collections",
                {"name": "qf", "fields": [{"name": "t", "type": "string"}]})
    assert st == 503, (st, b)
    assert "quorum" in b["message"].lower()
