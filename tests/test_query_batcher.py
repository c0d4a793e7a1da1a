"""Query coalescing (search/batcher.py): concurrent same-signature dense2
dispatches ride one vmapped program (SURVEY §2.4 — the reference fans a
query across vCPUs, src/index.cpp:6653-6655; on TPU concurrent queries are
another batch dimension). Covers the dispatcher protocol with fake kernels
and end-to-end batched-vs-solo parity through Collection.search."""

import threading
import time

import pytest

import typesense_tpu.search.batcher as B
from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field
from typesense_tpu.search import engine as eng_mod


# ---------------------------------------------------------------- unit --

def test_solo_until_tiers_ready():
    qb = B.QueryBatcher()
    calls = []
    out = qb.run("k", 7, lambda q: ("solo", q),
                 lambda b: calls.append(b) or (lambda x: x),
                 lambda fn, qs: [("batch", q) for q in qs])
    assert out == ("solo", 7)
    assert calls == []  # single caller: no tier compile demand


def test_disabled_passthrough():
    qb = B.QueryBatcher(enabled=False)
    assert qb.run("k", 1, lambda q: q + 1, None, None) == 2


def test_concurrent_demand_compiles_tiers_then_batches():
    qb = B.QueryBatcher()
    built = []

    def build(b):
        built.append(b)
        return f"fn{b}"

    batched_calls = []

    def batched(fn, qs):
        batched_calls.append((fn, tuple(qs)))
        return [q * 10 for q in qs]

    barrier = threading.Barrier(4)
    results = {}

    def slow_solo(q):
        time.sleep(0.05)         # overlap so inflight demand registers
        return q * 10

    def worker(i):
        barrier.wait()
        results[i] = qb.run("k", i, slow_solo, build, batched)

    # wave 1: concurrent demand starts tier compilation (results solo)
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert results == {i: i * 10 for i in range(4)}
    assert qb.wait_tiers(10)
    assert built == list(B.TIERS)

    # wave 2: tiers ready -> coalesced batch dispatch
    results.clear()
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert results == {i: i * 10 for i in range(4)}
    assert batched_calls, "no batched dispatch happened"
    fn, qs = batched_calls[0]
    assert fn in ("fn4", "fn8")
    assert len(qs) in B.TIERS  # padded to a tier width


def test_batched_error_propagates():
    qb = B.QueryBatcher()
    st = qb._sig("k")
    st.tiers[4] = "fn4"       # pretend compiled
    st.dispatching = True     # workers enqueue; we dispatch manually

    def batched(fn, qs):
        raise RuntimeError("boom")

    errs = []

    def worker(i):
        try:
            qb.run("k", i, lambda q: q, lambda b: "f", batched)
        except RuntimeError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    deadline = time.time() + 5
    while len(st.queue) < 2 and time.time() < deadline:
        time.sleep(0.005)
    assert len(st.queue) == 2
    st.dispatching = False
    qb._dispatch(st, lambda q: q, batched, window=0.0)
    [t.join() for t in ts]
    assert errs == ["boom", "boom"]


# ---------------------------------------------------- integration (CPU) --

@pytest.fixture()
def coll():
    c = Collection("qbatch", [
        Field("title", "string"),
        Field("brand", "string", facet=True),
        Field("points", "int32"),
    ], default_sorting_field="points")
    words = ["amber", "bison", "cobalt", "dune", "ember"]
    for i in range(300):
        c.add({"id": str(i),
               "title": f"{words[i % 5]} widget {words[(i // 5) % 5]} "
                        f"series{i % 7}",
               "brand": f"b{i % 3}", "points": i})
    eng = c._ensure_index()
    eng._force_mode = "dense2"
    return c


def test_batched_dense2_matches_solo(coll, monkeypatch):
    params = {"q": "amber widget", "query_by": "title", "prefix": "false",
              "num_typos": "0", "per_page": 10}
    solo = coll.search(params)
    assert solo["found"] > 0

    fresh = B.QueryBatcher()
    monkeypatch.setattr(eng_mod, "QUERY_BATCHER", fresh)
    monkeypatch.setattr(eng_mod, "DENSE2_BATCH", True)

    def wave(n):
        out = [None] * n
        barrier = threading.Barrier(n)

        def worker(i):
            barrier.wait()
            out[i] = coll.search(params)
        ts = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        return out

    wave(4)                      # trigger tier compile
    assert fresh.wait_tiers(300), "tier compile did not finish"
    sig = next(iter(fresh._sigs.values()))
    assert sig.tiers, "no batch tiers compiled"

    for res in wave(6):          # coalesced dispatch
        assert res["found"] == solo["found"]
        assert [h["document"]["id"] for h in res["hits"]] == \
            [h["document"]["id"] for h in solo["hits"]]
        assert res.get("facet_counts") == solo.get("facet_counts")


def test_stress_mixed_signatures_no_deadlock():
    """Thread fuzz: many workers over several signatures with slow solo
    calls and tiers appearing mid-flight — must drain with correct results
    and no deadlock."""
    import random
    qb = B.QueryBatcher()
    rng = random.Random(7)

    def build(b):
        time.sleep(0.01)
        return f"fn{b}"

    def batched(fn, qs):
        time.sleep(0.002)
        return [q * 3 for q in qs]

    def solo(q):
        time.sleep(0.002)
        return q * 3

    results = {}
    lock = threading.Lock()

    def worker(i):
        key = f"sig{i % 3}"
        out = qb.run(key, i, solo, build, batched)
        with lock:
            results[i] = out

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(60)]
    for t in threads:
        t.start()
        if rng.random() < 0.3:
            time.sleep(0.001)
    for t in threads:
        t.join(30)
        assert not t.is_alive(), "worker deadlocked"
    assert results == {i: i * 3 for i in range(60)}
    assert qb.wait_tiers(20)
