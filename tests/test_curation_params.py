"""Per-request curation params: pinned_hits / hidden_hits /
filter_curated_hits (collection.cpp:877-878, 985-1010) and typo length
gates min_len_1typo / min_len_2typo (Index::get_bounded_typo_cost)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("cur", [Field("title", "string"),
                           Field("points", "int32")],
                   default_sorting_field="points")
    for i, t in enumerate(["alpha one", "alpha two", "alpha three",
                           "beta four", "beta five"]):
        c.add({"id": str(i), "title": t, "points": (i + 1) * 10})
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


BASE = {"query_by": "title", "prefix": "false", "num_typos": "0"}


def test_pinned_hits_positions(coll):
    res = coll.search({**BASE, "q": "alpha",
                       "pinned_hits": "4:1,3:2"})
    assert ids(res)[:2] == ["4", "3"]
    assert res["hits"][0]["curated"] is True


def test_hidden_hits_removed(coll):
    res = coll.search({**BASE, "q": "alpha", "hidden_hits": "2"})
    assert "2" not in ids(res)
    assert res["found"] == 2


def test_pinned_hits_malformed(coll):
    with pytest.raises(BadRequest):
        coll.search({**BASE, "q": "alpha", "pinned_hits": "4"})


def test_filter_curated_hits_applies_filter(coll):
    # doc 4 (points 50) fails points:<25; with filter_curated_hits=true
    # the pin is dropped; without it the pin bypasses the filter
    res = coll.search({**BASE, "q": "alpha", "filter_by": "points:<25",
                       "pinned_hits": "4:1"})
    assert ids(res)[0] == "4"
    res = coll.search({**BASE, "q": "alpha", "filter_by": "points:<25",
                       "pinned_hits": "4:1",
                       "filter_curated_hits": "true"})
    assert "4" not in ids(res)


def test_min_len_1typo_gate(coll):
    # "alphz" (len 5): typo allowed by default -> matches alpha
    res = coll.search({**BASE, "q": "alphz", "num_typos": "2"})
    assert res["found"] == 3
    # raising min_len_1typo above the token length disables typos
    res = coll.search({**BASE, "q": "alphz", "num_typos": "2",
                       "min_len_1typo": "6"})
    assert res["found"] == 0


def test_min_len_2typo_gate(coll):
    # "alpxz" needs 2 typos; len 5 < default min_len_2typo (7) -> no match
    res = coll.search({**BASE, "q": "alpxz", "num_typos": "2"})
    assert res["found"] == 0
    # lowering the gate enables the 2-typo correction
    res = coll.search({**BASE, "q": "alpxz", "num_typos": "2",
                       "min_len_2typo": "5"})
    assert res["found"] == 3


def test_numerical_typo_opt_out():
    c = Collection("nums", [Field("code", "string")])
    c.add({"id": "0", "code": "12345"})
    res = c.search({"query_by": "code", "prefix": "false", "q": "12395",
                    "num_typos": "2"})
    assert res["found"] == 1
    res = c.search({"query_by": "code", "prefix": "false", "q": "12395",
                    "num_typos": "2",
                    "enable_typos_for_numerical_tokens": "false"})
    assert res["found"] == 0
