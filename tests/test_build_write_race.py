"""Index-build vs concurrent-write race (regression).

The reference serializes writes through a per-collection batched indexer
(batched_indexer.h) while searches read a separately versioned index. Our
builds snapshot `docs` and install an engine; before the fix, a write that
landed mid-build was silently pinned out of the index forever: the build
set `_delta_start = next_seq_id` (read AFTER the write), so the delta
window skipped the new doc while the main segment predated it. Observed in
the wild as a restarted raft node whose boot-precompile warmup raced the
catch-up import and then served stale counts indefinitely.

These tests force the interleaving deterministically by pausing
build_segment mid-build.
"""

import threading

import pytest

import typesense_tpu.collection as C
from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture()
def coll():
    c = Collection("race", [
        Field("title", "string"),
        Field("points", "int32"),
    ], default_sorting_field="points")
    for i in range(10):
        c.add({"id": str(i), "title": f"base event number{i}", "points": i})
    return c


def _paused_build(monkeypatch):
    """Patch build_segment so the FIRST call blocks until released."""
    orig = C.build_segment
    started = threading.Event()
    release = threading.Event()
    first = [True]

    def slow_build(*a, **k):
        if first[0]:
            first[0] = False
            started.set()
            assert release.wait(20), "test deadlock: build never released"
        return orig(*a, **k)

    monkeypatch.setattr(C, "build_segment", slow_build)
    return started, release


def test_write_during_main_build_not_lost(coll, monkeypatch):
    started, release = _paused_build(monkeypatch)
    res = {}

    def searcher():
        res["r"] = coll.search({"q": "event", "query_by": "title"})

    t = threading.Thread(target=searcher)
    t.start()
    assert started.wait(20)
    # the write lands while the build snapshot is already taken
    coll.add({"id": "mid", "title": "midbuild event doc", "points": 99})
    release.set()
    t.join(30)
    assert not t.is_alive()

    found = coll.search({"q": "event", "query_by": "title",
                         "per_page": 1})["found"]
    assert found == 11, f"mid-build write lost: found={found}"
    got = coll.search({"q": "midbuild", "query_by": "title"})["found"]
    assert got == 1


def test_delete_during_main_build_not_resurrected(coll, monkeypatch):
    started, release = _paused_build(monkeypatch)
    t = threading.Thread(
        target=lambda: coll.search({"q": "event", "query_by": "title"}))
    t.start()
    assert started.wait(20)
    coll.remove("3")
    release.set()
    t.join(30)
    assert not t.is_alive()

    found = coll.search({"q": "event", "query_by": "title",
                         "per_page": 1})["found"]
    assert found == 9, f"mid-build delete lost: found={found}"
    hits = coll.search({"q": "number3", "query_by": "title",
                        "num_typos": "0"})["found"]
    assert hits == 0


def test_write_during_delta_build_not_lost(coll, monkeypatch):
    coll._ensure_index()                      # main segment built
    coll.add({"id": "d1", "title": "delta event alpha", "points": 50})

    started, release = _paused_build(monkeypatch)
    t = threading.Thread(
        target=lambda: coll.search({"q": "event", "query_by": "title"}))
    t.start()
    assert started.wait(20)
    coll.add({"id": "d2", "title": "delta event beta", "points": 51})
    release.set()
    t.join(30)
    assert not t.is_alive()

    found = coll.search({"q": "event", "query_by": "title",
                         "per_page": 1})["found"]
    assert found == 12, f"mid-delta-build write lost: found={found}"
    assert coll.search({"q": "beta", "query_by": "title"})["found"] == 1
