"""All-head dense2 fast path: queries whose candidate rows are ALL
pre-densified in the head planes compile the (SCB=0, SCBB=0) kernel
variant with no scatter plane (engine.prepare_keyword_dispatch) — measured
~6x cheaper on-chip at 2.2M docs. Parity: the fast variant must rank
identically to the probe kernel and to the forced wide-scatter variant.
"""

import numpy as np
import pytest

import typesense_tpu.search.engine as eng_mod
from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    """5k docs where `alpha`/`bravo` appear in (almost) every doc — their
    posting rows exceed the 4096-posting head-row floor
    (artifacts.select_head_rows), so exact queries over them are all-head.
    A sprinkle of rare terms provides non-head rows for mixed queries."""
    rng = np.random.default_rng(11)
    c = Collection("allhead", [
        Field("title", "string"),
        Field("cat", "string", facet=True),
        Field("pts", "int32", sort=True),
    ], default_sorting_field="pts")
    rare = [f"rare{i}" for i in range(50)]
    for i in range(5000):
        toks = ["alpha"]
        if rng.random() < 0.9:
            toks.append("bravo")
        if rng.random() < 0.02:
            toks.append(str(rng.choice(rare)))
        rng.shuffle(toks)
        c.add({"id": str(i), "title": " ".join(toks),
               "cat": f"c{int(rng.integers(0, 4))}",
               "pts": int(rng.integers(0, 1000))})
    c._ensure_index()
    return c


def capture_preps(coll, params):
    """Run a search, returning (response, [dense2 preps])."""
    eng = coll._ensure_index()
    preps = []
    orig = eng_mod.IndexEngine.prepare_keyword_dispatch

    def spy(self, *a, **kw):
        p = orig(self, *a, **kw)
        if p is not None and p.get("mode") == "dense2":
            preps.append(p)
        return p

    eng_mod.IndexEngine.prepare_keyword_dispatch = spy
    eng._force_mode = "dense2"
    try:
        res = coll.search(dict(params))
    finally:
        eng._force_mode = None
        eng_mod.IndexEngine.prepare_keyword_dispatch = orig
    return res, preps


BASE = {"query_by": "title", "prefix": "false", "num_typos": "0",
        "per_page": 10}


def test_allhead_query_takes_zero_scatter_variant(coll):
    res, preps = capture_preps(coll, {**BASE, "q": "alpha bravo"})
    assert preps, "query did not dispatch dense2"
    p = preps[0]
    assert p["n_sc"] == 0 and p["n_big"] == 0
    assert p["SCB"] == 0 and p["SCBB"] == 0
    assert res["found"] > 4000


def test_mixed_query_keeps_scatter_variant(coll):
    res, preps = capture_preps(coll, {**BASE, "q": "alpha rare3"})
    assert preps
    assert preps[0]["n_sc"] > 0
    assert preps[0]["SCB"] >= preps[0]["n_sc"]


@pytest.mark.parametrize("params", [
    {**BASE, "q": "alpha bravo"},
    {**BASE, "q": "alpha"},
    {**BASE, "q": "alpha bravo", "facet_by": "cat"},
    {**BASE, "q": "alpha bravo", "sort_by": "pts:desc",
     "filter_by": "pts:>100"},
])
def test_allhead_parity_vs_probe_and_wide(coll, params):
    eng = coll._ensure_index()

    def run(mode, force_wide=False):
        orig = eng_mod.IndexEngine.prepare_keyword_dispatch
        if force_wide:
            def wide(self, *a, **kw):
                kw.setdefault("force", {})
                kw["force"] = {**kw["force"], "SCB": 1024, "SCBB": 64}
                return orig(self, *a, **kw)
            eng_mod.IndexEngine.prepare_keyword_dispatch = wide
        eng._force_mode = mode
        try:
            return coll.search(dict(params))
        finally:
            eng._force_mode = None
            eng_mod.IndexEngine.prepare_keyword_dispatch = orig

    fast = run("dense2")
    probe = run("probe")
    wide = run("dense2", force_wide=True)
    for other in (probe, wide):
        assert fast["found"] == other["found"]
        assert [h["document"]["id"] for h in fast["hits"]] == \
            [h["document"]["id"] for h in other["hits"]]
        assert [h.get("text_match") for h in fast["hits"]] == \
            [h.get("text_match") for h in other["hits"]]
    f_fast = {x["value"]: x["count"]
              for f in fast.get("facet_counts", []) for x in f["counts"]}
    f_probe = {x["value"]: x["count"]
               for f in probe.get("facet_counts", []) for x in f["counts"]}
    assert f_fast == f_probe
