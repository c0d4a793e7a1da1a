"""Accurate group_by (round-1 VERDICT missing #7): per-group counts and the
total group count must come from the FULL matched set, not extrapolated from
the top-K candidates; page groups must fill to group_limit even when their
hits lie beyond the default collector depth (reference: per-group topsters,
include/topster.h:252-264)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field

N = 3000
BRANDS = [f"brand{i:02d}" for i in range(40)]


@pytest.fixture(scope="module")
def coll():
    rng = np.random.default_rng(11)
    c = Collection("prods", [
        Field("title", "string"),
        Field("brand", "string", facet=True),
        Field("points", "int32"),
    ], default_sorting_field="points")
    # skewed group sizes; one brand dominates the ranked list
    for i in range(N):
        b = BRANDS[0] if i % 3 == 0 else BRANDS[int(rng.integers(1, 40))]
        c.add({"id": str(i), "title": "widget common",
               "brand": b, "points": (N - i if b == BRANDS[0] else i % 500)})
    return c


def oracle_counts(coll):
    counts = {}
    for d in coll.docs.values():
        counts[d["brand"]] = counts.get(d["brand"], 0) + 1
    return counts


def test_group_counts_match_oracle(coll):
    res = coll.search({"q": "widget", "query_by": "title",
                       "group_by": "brand", "group_limit": 2,
                       "per_page": 10, "num_typos": "0", "prefix": "false"})
    oracle = oracle_counts(coll)
    # total distinct groups over the FULL matched set
    assert res["found"] == len(oracle), (res["found"], len(oracle))
    assert res["found_docs"] == N
    for g in res["grouped_hits"]:
        assert g["found"] == oracle[g["group_key"][0]], g["group_key"]
        assert 1 <= len(g["hits"]) <= 2


def test_groups_beyond_topk_are_counted(coll):
    # brand00 has 1000 docs all ranked first (highest points), so a naive
    # top-250 pass sees almost nothing but brand00 — the other 39 groups
    # must still be counted and be reachable
    res = coll.search({"q": "widget", "query_by": "title",
                       "group_by": "brand", "group_limit": 1,
                       "sort_by": "points:desc",
                       "per_page": 40, "num_typos": "0", "prefix": "false"})
    assert res["found"] == 40
    keys = [g["group_key"][0] for g in res["grouped_hits"]]
    assert keys[0] == "brand00"
    assert len(set(keys)) == len(keys) >= 30


def test_group_page_fills_to_group_limit(coll):
    res = coll.search({"q": "widget", "query_by": "title",
                       "group_by": "brand", "group_limit": 3,
                       "sort_by": "points:desc",
                       "per_page": 10, "num_typos": "0", "prefix": "false"})
    oracle = oracle_counts(coll)
    for g in res["grouped_hits"]:
        want = min(3, oracle[g["group_key"][0]])
        assert len(g["hits"]) == want, (g["group_key"], len(g["hits"]), want)
