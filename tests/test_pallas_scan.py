"""Parity tests for the pallas fused dense2 scan (search/pallas_scan.py).

The (hi, lo) int32 pair packers must be bit-identical to the int64 packers
in ops/match.py, and the full fused path (run in pallas interpret mode on
the CPU test mesh) must reproduce the XLA dense2 kernel's results exactly —
hits, scores, found, and facet counts — across query shapes: 1-3 tokens,
typos, prefixes, filters, facets, exclusions, and sort variants.
"""

import os

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def test_pack_pair_matches_int64():
    import jax.numpy as jnp
    from typesense_tpu.ops.match import (
        pack_aggregated_score, pack_field_score,
    )
    from typesense_tpu.search.pallas_scan import (
        pack_pair_aggregated, pack_pair_field_score,
    )
    rng = np.random.default_rng(0)
    n = 4096
    wp = rng.integers(0, 300, n)
    uw = rng.integers(0, 300, n)
    tc = rng.integers(0, 300, n)
    dist = rng.integers(0, 150, n)
    ex = rng.integers(0, 20, n)
    off = rng.integers(0, 300, n)
    syn = rng.integers(0, 20, n)
    fs64 = np.asarray(pack_field_score(
        jnp.asarray(wp), jnp.asarray(uw), jnp.asarray(tc),
        jnp.asarray(dist), jnp.asarray(ex), jnp.asarray(off),
        jnp.asarray(syn)))
    hi, lo = pack_pair_field_score(
        jnp.asarray(wp, jnp.int32), jnp.asarray(uw, jnp.int32),
        jnp.asarray(tc, jnp.int32), jnp.asarray(dist, jnp.int32),
        jnp.asarray(ex, jnp.int32), jnp.asarray(off, jnp.int32),
        jnp.asarray(syn, jnp.int32))
    fs_pair = (np.asarray(hi, np.int64) << 24) | np.asarray(lo, np.int64)
    assert (fs_pair == fs64).all()

    ql = rng.integers(0, 30, n)
    w = rng.integers(0, 300, n)
    nmf = rng.integers(0, 16, n)
    agg64 = np.asarray(pack_aggregated_score(
        jnp.asarray(ql), fs64, jnp.asarray(w), jnp.asarray(nmf), 0))
    ahi, alo = pack_pair_aggregated(
        jnp.asarray(ql, jnp.int32), hi, lo,
        jnp.asarray(w, jnp.int32), jnp.asarray(nmf, jnp.int32))
    agg_pair = (np.asarray(ahi, np.int64) << 32) | \
        (np.asarray(alo, np.int64) & 0xFFFFFFFF)
    assert (agg_pair == agg64).all()


# ---------------------------------------------------------------------------


WORDS = ("chicken garlic pasta lemon butter cream roasted baked salt "
         "pepper onion tomato basil thyme honey apple walnut rice "
         "stew soup salad").split()


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    c = Collection("pal", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("cuisine", "string", facet=True),
        Field("points", "int32"),
    ], default_sorting_field="points")
    cuisines = ["a", "b", "c", "d"]
    docs = []
    for i in range(6000):
        # "the" rides in most docs -> becomes a head-plane row
        nt = rng.integers(2, 7)
        words = list(rng.choice(WORDS, nt))
        if rng.random() < 0.8:
            words.insert(int(rng.integers(0, len(words))), "the")
        if rng.random() < 0.1:
            words = words + words[:2]     # repeated tokens (proximity/heavy)
        docs.append({
            "id": str(i),
            "title": " ".join(words),
            "tags": list(rng.choice(WORDS, rng.integers(1, 4))),
            "cuisine": str(rng.choice(cuisines)),
            "points": int(rng.integers(0, 100000)),
        })
    c.add_many(docs)
    eng = c._ensure_index()
    eng._force_mode = "dense2"
    yield c
    eng._force_mode = None


QUERIES = [
    {"q": "chicken"},
    {"q": "the"},
    {"q": "chicken garlic"},
    {"q": "the chicken"},
    {"q": "the chicken garlic"},
    {"q": "chicken garlic pasta"},
    {"q": "chicken -garlic"},
    {"q": "chickem garlic", "num_typos": "1"},
    {"q": "chicke", "prefix": "true"},
    {"q": "the chicken", "filter_by": "points:>50000"},
    {"q": "the chicken", "facet_by": "cuisine"},
    {"q": "chicken garlic", "sort_by": "points:desc"},
    {"q": "chicken garlic", "sort_by": "points:asc"},
    {"q": "the garlic", "query_by": "title,tags"},
    {"q": "the chicken", "facet_by": "cuisine",
     "filter_by": "points:<80000", "sort_by": "points:desc"},
]


def _norm(res):
    return {
        "found": res["found"],
        "hits": [(h["document"]["id"], h.get("text_match", 0),
                  tuple(h.get("text_match_info", {}).items())
                  if isinstance(h.get("text_match_info"), dict) else ())
                 for h in res["hits"]],
        "facets": [(fc["field_name"],
                    sorted((v["value"], v["count"])
                           for v in fc["counts"]))
                   for fc in res.get("facet_counts", [])],
    }


def test_fused_path_parity(corpus, monkeypatch):
    from typesense_tpu.search import pallas_scan
    from typesense_tpu.search.engine import IndexEngine

    calls = {"n": 0}
    real = pallas_scan.build_pallas_dense2_kernel

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    base_params = {"query_by": "title", "prefix": "false", "num_typos": "0",
                   "per_page": 25}
    expected = []
    monkeypatch.setenv("TS_PALLAS", "0")
    for qp in QUERIES:
        expected.append(_norm(corpus.search({**base_params, **qp})))

    monkeypatch.setenv("TS_PALLAS", "1")
    monkeypatch.setattr(IndexEngine, "PALLAS_INTERPRET", True)
    monkeypatch.setattr(pallas_scan, "build_pallas_dense2_kernel", counting)
    got = []
    for qp in QUERIES:
        got.append(_norm(corpus.search({**base_params, **qp})))

    assert calls["n"] > 0, "pallas path never dispatched"
    for qp, e, g in zip(QUERIES, expected, got):
        assert e == g, f"mismatch for {qp}: {e} != {g}"
