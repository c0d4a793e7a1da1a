"""End-to-end engine tests over a small corpus (the reference's in-process
test style — test/collection_test.cpp: create collection, add docs, search,
assert exact hits)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("docs", [
        Field("title", "string"),
        Field("body", "string"),
        Field("points", "int32"),
        Field("tags", "string[]", facet=True, optional=True),
    ], default_sorting_field="points")
    docs = [
        {"id": "0", "title": "the quick brown fox", "body": "jumps over the lazy dog",
         "points": 10, "tags": ["animal", "classic"]},
        {"id": "1", "title": "quick brown foxes", "body": "a tale of many foxes",
         "points": 20, "tags": ["animal"]},
        {"id": "2", "title": "the slow green turtle", "body": "a quick nap helps",
         "points": 30, "tags": ["animal", "slow"]},
        {"id": "3", "title": "brown bread recipe", "body": "bake quick brown bread",
         "points": 5, "tags": ["food"]},
        {"id": "4", "title": "quick start guide", "body": "get started quickly",
         "points": 50, "tags": ["docs"]},
    ]
    for d in docs:
        c.add(d)
    return c


def hit_ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_exact_single_token(coll):
    res = coll.search({"q": "turtle", "query_by": "title", "prefix": "false"})
    assert res["found"] == 1
    assert hit_ids(res) == ["2"]


def test_and_semantics(coll):
    res = coll.search({"q": "quick brown", "query_by": "title", "prefix": "false"})
    # docs 0, 1 have both tokens in title; 3 has brown only in title
    assert res["found"] == 2
    assert set(hit_ids(res)) == {"0", "1"}


def test_multi_field_or_across_fields(coll):
    res = coll.search({"q": "quick brown", "query_by": "title,body",
                       "prefix": "false"})
    # doc 3: brown(title) + quick(body) matches across fields
    assert res["found"] == 3
    assert set(hit_ids(res)) == {"0", "1", "3"}


def test_proximity_ranking(coll):
    # "quick brown" adjacent in 0 and 1; both exact phrase; tie broken by points
    res = coll.search({"q": "quick brown", "query_by": "title", "prefix": "false"})
    assert hit_ids(res)[0] == "1"  # higher points (20 vs 10)


def test_wildcard(coll):
    res = coll.search({"q": "*"})
    assert res["found"] == 5
    # default sorting field points desc
    assert hit_ids(res) == ["4", "2", "1", "0", "3"]


def test_sort_by_points_asc(coll):
    res = coll.search({"q": "*", "sort_by": "points:asc"})
    assert hit_ids(res) == ["3", "0", "1", "2", "4"]


def test_filter_numeric(coll):
    res = coll.search({"q": "*", "filter_by": "points:>=20"})
    assert res["found"] == 3
    assert set(hit_ids(res)) == {"1", "2", "4"}


def test_filter_string_facet(coll):
    res = coll.search({"q": "*", "filter_by": "tags:=animal"})
    assert res["found"] == 3
    assert set(hit_ids(res)) == {"0", "1", "2"}


def test_filter_and_query(coll):
    res = coll.search({"q": "quick", "query_by": "title",
                       "filter_by": "points:<30", "prefix": "false"})
    assert set(hit_ids(res)) == {"0", "1"}


def test_facets(coll):
    res = coll.search({"q": "*", "facet_by": "tags"})
    fc = res["facet_counts"][0]
    assert fc["field_name"] == "tags"
    counts = {c["value"]: c["count"] for c in fc["counts"]}
    assert counts == {"animal": 3, "classic": 1, "slow": 1, "food": 1, "docs": 1}


def test_facets_with_filter(coll):
    res = coll.search({"q": "*", "filter_by": "points:>=20", "facet_by": "tags"})
    counts = {c["value"]: c["count"] for c in res["facet_counts"][0]["counts"]}
    assert counts == {"animal": 2, "slow": 1, "docs": 1}


def test_prefix_search(coll):
    res = coll.search({"q": "qui", "query_by": "title"})
    assert set(hit_ids(res)) >= {"0", "1", "4"}


def test_typo_search(coll):
    res = coll.search({"q": "quik brown", "query_by": "title", "prefix": "false"})
    assert set(hit_ids(res)) == {"0", "1"}


def test_highlight(coll):
    res = coll.search({"q": "turtle", "query_by": "title", "prefix": "false"})
    hl = res["hits"][0]["highlight"]
    assert hl["title"]["snippet"] == "the slow green <mark>turtle</mark>"
    assert hl["title"]["matched_tokens"] == ["turtle"]


def test_pagination(coll):
    res = coll.search({"q": "*", "per_page": 2, "page": 2})
    assert res["found"] == 5
    assert hit_ids(res) == ["1", "0"]


def test_text_match_info(coll):
    res = coll.search({"q": "quick brown", "query_by": "title", "prefix": "false"})
    info = res["hits"][0]["text_match_info"]
    assert info["tokens_matched"] == 2
    assert info["fields_matched"] >= 1


def test_exact_match_ranks_first(coll):
    c = Collection("em", [Field("title", "string")])
    c.add({"id": "0", "title": "blue shoes are nice"})
    c.add({"id": "1", "title": "blue shoes"})
    res = c.search({"q": "blue shoes", "query_by": "title", "prefix": "false"})
    assert hit_ids(res)[0] == "1"  # exact field match wins


def test_drop_tokens(coll):
    res = coll.search({"q": "turtle zebra", "query_by": "title", "prefix": "false"})
    # no doc has both; drop_tokens retries with "turtle"
    assert "2" in hit_ids(res)


def test_no_hits(coll):
    res = coll.search({"q": "zzzzqqq", "query_by": "title", "prefix": "false",
                       "num_typos": "0"})
    assert res["found"] == 0
    assert res["hits"] == []
