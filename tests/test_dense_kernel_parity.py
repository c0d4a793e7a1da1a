"""Differential parity: the dense-scan keyword kernel must rank identically
to the probe kernel (the reference-parity baseline) on randomized corpora —
same doc ids, same scores, same found, same facet counts. Exercises the
heavy-doc CSR fallback (repeated tokens), typo candidates, exclusions,
filters, and custom sorts (pack2 on and off)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def build_corpus(seed, n_docs=400, vocab=30, heavy_fraction=0.1):
    rng = np.random.default_rng(seed)
    c = Collection(f"par{seed}", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("cat", "string", facet=True),
        Field("pts", "int32", sort=True),
    ], default_sorting_field="pts")
    words = [f"w{i}" for i in range(vocab)]
    for i in range(n_docs):
        n = rng.integers(2, 9)
        toks = list(rng.choice(words, n))
        if rng.random() < heavy_fraction:
            # repeated tokens -> >2 occurrences -> heavy meta path
            toks = toks + [toks[0]] * 3
        c.add({"id": str(i),
               "title": " ".join(toks),
               "tags": [str(x) for x in rng.choice(words, 2)],
               "cat": f"c{int(rng.integers(0, 5))}",
               "pts": int(rng.integers(0, 1000))})
    return c


def both_modes(c, params):
    eng = c._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        try:
            out[mode] = c.search(dict(params))
        finally:
            eng._force_mode = None
    return out["probe"], out["dense2"]


def assert_same(rp, rd):
    assert rp["found"] == rd["found"]
    assert [h["document"]["id"] for h in rp["hits"]] == \
        [h["document"]["id"] for h in rd["hits"]]
    tm_p = [h.get("text_match") for h in rp["hits"]]
    tm_d = [h.get("text_match") for h in rd["hits"]]
    assert tm_p == tm_d
    fp = {x["value"]: x["count"] for f in rp.get("facet_counts", [])
          for x in f["counts"]}
    fd = {x["value"]: x["count"] for f in rd.get("facet_counts", [])
          for x in f["counts"]}
    assert fp == fd


BASE = {"query_by": "title,tags", "num_typos": "0", "prefix": "false",
        "per_page": 50, "facet_by": "cat", "max_facet_values": 10}


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("q", ["w0", "w0 w1", "w0 w1 w2"])
def test_dense_matches_probe(seed, q):
    c = build_corpus(seed)
    assert_same(*both_modes(c, {**BASE, "q": q}))


def test_dense_with_filter_and_sort():
    c = build_corpus(7)
    assert_same(*both_modes(c, {**BASE, "q": "w0 w1",
                                "filter_by": "pts:>300",
                                "sort_by": "pts:desc"}))


def test_dense_sort_asc_no_pack2():
    # pts:asc makes slot2 unused and slot1 sign -1 — still packable; title
    # sort is rejected, so use _text_match last to break pack2 eligibility
    c = build_corpus(8)
    assert_same(*both_modes(c, {**BASE, "q": "w0 w1",
                                "sort_by": "pts:asc,_text_match:desc"}))


def test_dense_with_typos():
    c = build_corpus(9, vocab=20)
    rp, rd = both_modes(c, {**BASE, "q": "w0x w1", "num_typos": "1"})
    assert_same(rp, rd)
    assert rp["found"] > 0


def test_dense_with_exclusion():
    c = build_corpus(10)
    assert_same(*both_modes(c, {**BASE, "q": "w0 -w1"}))


def test_dense_prefix():
    c = build_corpus(11, vocab=12)
    assert_same(*both_modes(c, {**BASE, "q": "w1", "prefix": "true"}))


def test_dense_heavy_only_corpus():
    # every doc repeats tokens -> the heavy CSR pass scores everything
    c = Collection("heavyc", [Field("t", "string"),
                              Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    for i in range(60):
        c.add({"id": str(i), "t": f"a b a b a w{i % 5}", "pts": i})
    eng = c._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "a b", "query_by": "t", "num_typos": "0",
                              "prefix": "false", "per_page": 60})
        eng._force_mode = None
    assert out["probe"]["found"] == out["dense2"]["found"] == 60
    assert [h["document"]["id"] for h in out["probe"]["hits"]] == \
        [h["document"]["id"] for h in out["dense2"]["hits"]]
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]


def test_dense_long_value_overflow_meta():
    # positions beyond the 7-bit meta offset must fall back exactly
    c = Collection("longv", [Field("t", "string"),
                             Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    filler = " ".join(f"x{i}" for i in range(200))
    c.add({"id": "0", "t": "needle " + filler + " haystack", "pts": 1})
    c.add({"id": "1", "t": filler + " needle haystack", "pts": 2})
    c.add({"id": "2", "t": "needle haystack " + filler, "pts": 3})
    eng = c._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "needle haystack", "query_by": "t",
                              "num_typos": "0", "prefix": "false"})
        eng._force_mode = None
    assert out["probe"]["found"] == out["dense2"]["found"] == 3
    assert [h["document"]["id"] for h in out["probe"]["hits"]] == \
        [h["document"]["id"] for h in out["dense2"]["hits"]]
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]


def test_dense_head_plane_path():
    # a token frequent enough to be head-plane cached (row len above
    # min(65536, max(N//8, 4096))) must rank identically through the
    # prebuilt plane as through CSR probes
    c = Collection("headc", [Field("t", "string"),
                             Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    rng = np.random.default_rng(3)
    N = 12000
    for i in range(N):
        toks = ["common"] if i % 2 == 0 else []
        toks += [f"w{int(x)}" for x in rng.integers(0, 40, 3)]
        rng.shuffle(toks)
        c.add({"id": str(i), "t": " ".join(toks),
               "pts": int(rng.integers(0, 100))})
    eng = c._ensure_index()
    assert len(eng.names.get("head_map", {})) >= 1, "head planes not built"
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "common w1", "query_by": "t",
                              "num_typos": "0", "prefix": "false",
                              "per_page": 30})
        eng._force_mode = None
    assert out["probe"]["found"] == out["dense2"]["found"] > 0
    assert [h["document"]["id"] for h in out["probe"]["hits"]] == \
        [h["document"]["id"] for h in out["dense2"]["hits"]]
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]


def test_dense_mass_tie_id_order():
    # hundreds of docs with IDENTICAL text score and IDENTICAL sort column:
    # the cascade must resolve the final tie by doc id descending, exactly
    # like the probe path's topk_merge (topster.h:146-149)
    c = Collection("ties", [Field("t", "string"),
                            Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    for i in range(500):
        c.add({"id": str(i), "t": "alpha beta", "pts": 42})
    eng = c._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "alpha beta", "query_by": "t",
                              "num_typos": "0", "prefix": "false",
                              "per_page": 25, "page": 2})
        eng._force_mode = None
    ids_p = [h["document"]["id"] for h in out["probe"]["hits"]]
    ids_d = [h["document"]["id"] for h in out["dense2"]["hits"]]
    assert ids_p == ids_d
    assert ids_d == [str(i) for i in range(474, 449, -1)]  # id desc, page 2


def test_dense_big_magnitude_sort_column():
    # ms-epoch timestamps exceed the 39-bit pack2 budget -> the general
    # 4-stage cascade runs; ordering must still match probe exactly
    c = Collection("bigcol", [Field("t", "string"),
                              Field("ts", "int64", sort=True)])
    rng = np.random.default_rng(4)
    base = 1_700_000_000_000
    for i in range(300):
        c.add({"id": str(i), "t": "evt " + f"w{i % 7}",
               "ts": base + int(rng.integers(0, 10**9))})
    eng = c._ensure_index()
    assert not eng._col_pack_ok.get("ts", True)
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "evt", "query_by": "t",
                              "num_typos": "0", "prefix": "false",
                              "sort_by": "ts:desc", "per_page": 40})
        eng._force_mode = None
    assert [h["document"]["id"] for h in out["probe"]["hits"]] == \
        [h["document"]["id"] for h in out["dense2"]["hits"]]
    got = [h["document"]["ts"] for h in out["dense2"]["hits"]]
    assert got == sorted(got, reverse=True)


def test_dense_five_occurrence_proximity_exact():
    # >3 occurrences of a token: the A/B meta holds only the first three
    # positions, but the true best window uses the FIFTH -> the heavy
    # rescore must recover the exact proximity score
    c = Collection("prox5", [Field("t", "string"),
                             Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    # doc 0: best window is x(8) y(9) -> dist 1, but first three x are 0,2,4
    c.add({"id": "0", "t": "x f1 x f2 x f3 f4 f5 x y", "pts": 1})
    # doc 1: x once at distance 4 from y
    c.add({"id": "1", "t": "x f1 f2 f3 y", "pts": 1})
    eng = c._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = c.search({"q": "x y", "query_by": "t", "num_typos": "0",
                              "prefix": "false"})
        eng._force_mode = None
    assert [h["document"]["id"] for h in out["probe"]["hits"]] == \
        [h["document"]["id"] for h in out["dense2"]["hits"]]
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]
    # doc 0's adjacent window must beat doc 1's distance-4 window
    assert out["dense2"]["hits"][0]["document"]["id"] == "0"
