"""Runtime LRU plane cache: every dense2 query rides the all-head kernel
signature (SCB == SCBB == 0) by densifying posting rows on demand into
preallocated head-plane slots (engine._plane_slot_for). Parity contract:
results must be identical to the scatter-plane path the cache replaces
(reference behavior contract: or_iterator.h:61-182 intersection +
index.cpp:3345 ranking)."""

import os
import random
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu").split()


def _docs(n=1500, seed=3):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        words = rng.sample(VOCAB, rng.randint(2, 6))
        # repeat a word sometimes (positions > 1, heavy-path coverage)
        if rng.random() < 0.2:
            words.append(words[0])
        docs.append({"title": " ".join(words),
                     "tags": rng.sample(VOCAB, 2),
                     "points": rng.randint(0, 10000)})
    return docs


def _build(docs, cache_rows=None, monkeypatch=None):
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    if cache_rows is not None:
        monkeypatch.setenv("TS_PLANE_CACHE_MIN_N", "1")
        monkeypatch.setenv("TS_PLANE_CACHE_ROWS", str(cache_rows))
    else:
        monkeypatch.setenv("TS_PLANE_CACHE_MIN_N", "999999999")
    c = Collection(f"pc_{cache_rows}", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("points", "int32"),
    ], default_sorting_field="points")
    for d in docs:
        c.docs[c.next_seq_id] = d
        c.id_to_seq[str(c.next_seq_id)] = c.next_seq_id
        c.next_seq_id += 1
    c._dirty = True
    # force dense2: at toy corpus sizes the honest cost model routes
    # everything to probe and the cache would sit untested
    c._ensure_index()._force_mode = "dense2"
    return c


def _hits(c, q, **kw):
    res = c.search({"q": q, "query_by": "title,tags", "prefix": "false",
                    "num_typos": "0", "per_page": 10, **kw})
    return (res["found"],
            [(h["document"]["title"], h["text_match"]) for h in res["hits"]])


QUERIES = ["alpha", "alpha bravo", "charlie delta echo", "zulu yankee",
           "mike", "alpha zulu", "november oscar papa", "tango uniform"]


def test_plane_cache_parity(monkeypatch):
    docs = _docs()
    base = _build(docs, cache_rows=None, monkeypatch=monkeypatch)
    cached = _build(docs, cache_rows=64, monkeypatch=monkeypatch)
    eng = cached._ensure_index()
    assert eng._plane_cache_on, "cache must be active in this test"
    from typesense_tpu.search.engine import PLANE_CACHE_STATS
    for q in QUERIES:
        assert _hits(base, q) == _hits(cached, q), q
    # run twice: second pass must hit
    h0 = PLANE_CACHE_STATS["hits"]
    for q in QUERIES:
        assert _hits(base, q) == _hits(cached, q), q
    assert PLANE_CACHE_STATS["hits"] > h0


def test_plane_cache_eviction_parity(monkeypatch):
    docs = _docs()
    base = _build(docs, cache_rows=None, monkeypatch=monkeypatch)
    # tiny budget -> very few slots -> constant eviction
    cached = _build(docs, cache_rows=3, monkeypatch=monkeypatch)
    eng = cached._ensure_index()
    assert eng._plane_cache_on
    slots = len(eng._plane_free) + len(eng._plane_lru)
    assert 0 < slots <= 8, slots
    from typesense_tpu.search.engine import PLANE_CACHE_STATS
    ev0 = PLANE_CACHE_STATS["evictions"]
    for _ in range(2):
        for q in QUERIES + ["%s %s" % (a, b) for a in VOCAB[:6]
                            for b in VOCAB[6:10]]:
            assert _hits(base, q) == _hits(cached, q), q
    assert PLANE_CACHE_STATS["evictions"] > ev0


def test_plane_cache_concurrent_parity(monkeypatch):
    docs = _docs()
    base = _build(docs, cache_rows=None, monkeypatch=monkeypatch)
    cached = _build(docs, cache_rows=4, monkeypatch=monkeypatch)
    qs = (QUERIES * 4)[:24]
    expected = {q: _hits(base, q) for q in set(qs)}

    def one(q):
        return q, _hits(cached, q)
    with ThreadPoolExecutor(max_workers=8) as ex:
        for q, got in ex.map(one, qs):
            assert got == expected[q], q


def test_plane_cache_with_filters_facets(monkeypatch):
    docs = _docs()
    base = _build(docs, cache_rows=None, monkeypatch=monkeypatch)
    cached = _build(docs, cache_rows=64, monkeypatch=monkeypatch)
    kw = {"filter_by": "points:>5000", "sort_by": "points:desc"}
    for q in QUERIES:
        assert _hits(base, q, **kw) == _hits(cached, q, **kw), q
