"""Curation long-tail parity — ports of reference
collection_curation_test.cpp behaviors not yet covered:
PinnedHitsWhenThereAreNotEnoughResults (:1654), PinnedHitsIdsHavingColon
(:1948), PinnedHitsWithWildCardQuery / HiddenHitsWithWildCardQuery
(:1912), PinnedHitsLargerThanPageSize, ReplaceWildcardQueryWithKeyword
(:910), DynamicFilteringWithNumericalFilter (:2495).
"""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def coll():
    c = Collection("cur3", [Field("title", "string"),
                            Field("points", "int32")],
                   default_sorting_field="points")
    docs = [
        {"id": "0", "title": "amazing shoes", "points": 30},
        {"id": "1", "title": "fast shoes", "points": 50},
        {"id": "2", "title": "comfortable socks", "points": 1},
        {"id": "6", "title": "burgundy shoes", "points": 5},
        {"id": "11", "title": "plain shirt", "points": 9},
    ]
    for d in docs:
        c.add(d)
    return c


BASE = {"query_by": "title", "prefix": "false", "num_typos": "0"}


def test_pinned_hits_query_with_no_results(coll):
    # reference :1658-1672 — pins surface even when the query matches
    # nothing; found counts the pinned docs, order follows positions
    res = coll.search({**BASE, "q": "notfoundquery",
                       "pinned_hits": "6:1,1:2,11:5"})
    assert res["found"] == 3
    assert ids(res) == ["6", "1", "11"]


def test_pinned_hits_single_organic_result(coll):
    # reference :1675-1688 — one organic hit slots between the pins and
    # the position-5 pin slides up to cover the missing slot
    res = coll.search({**BASE, "q": "amazing",
                       "pinned_hits": "6:1,1:2,11:5"})
    assert res["found"] == 4
    assert ids(res) == ["6", "1", "0", "11"]


def test_pinned_hits_wildcard_query(coll):
    res = coll.search({**BASE, "q": "*", "pinned_hits": "2:1,11:2"})
    assert ids(res)[:2] == ["2", "11"]
    # remaining docs follow default sort (points desc)
    assert ids(res)[2:] == ["1", "0", "6"]


def test_hidden_hits_wildcard_query(coll):
    # reference :1912 — hidden_hits applies to q=* scans too
    res = coll.search({**BASE, "q": "*", "hidden_hits": "1"})
    assert "1" not in ids(res)
    assert res["found"] == 4


def test_pinned_hits_larger_than_page_size(coll):
    # pins beyond per_page spill to later pages; page 1 is all pins
    res = coll.search({**BASE, "q": "*", "per_page": 2,
                       "pinned_hits": "2:1,11:2,6:3"})
    assert ids(res) == ["2", "11"]
    res2 = coll.search({**BASE, "q": "*", "per_page": 2, "page": 2,
                        "pinned_hits": "2:1,11:2,6:3"})
    assert ids(res2)[0] == "6"


def test_pinned_hits_ids_with_colon():
    # reference :1948 — ids may contain ':'; position splits on the LAST
    # colon and tolerates spaces after commas
    c = Collection("cur3c", [Field("url", "string"),
                             Field("points", "int32")],
                   default_sorting_field="points")
    for i in range(1, 11):
        c.add({"id": f"https://example.com/{i}",
               "url": f"https://example.com/{i}", "points": i})
    res = c.search({"q": "*", "query_by": "url", "per_page": 25,
                    "pinned_hits":
                        "https://example.com/1:1, https://example.com/3:2"})
    assert res["found"] == 10
    got = ids(res)
    assert got[0] == "https://example.com/1"
    assert got[1] == "https://example.com/3"
    assert got[2] == "https://example.com/10"
    assert got[3] == "https://example.com/9"
    assert got[9] == "https://example.com/2"


@pytest.fixture()
def srv_replace(tmp_path):
    from tests.test_http_api import call, make_server
    from typesense_tpu.core.store import Store
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "c1",
        "fields": [{"name": "name", "type": "string"},
                   {"name": "points", "type": "int32"}],
        "default_sorting_field": "points",
        "metadata": {"curation_sets": ["index"]}})
    for d in [{"id": "0", "name": "Amazing Shoes", "points": 30},
              {"id": "1", "name": "Fast Shoes", "points": 50},
              {"id": "2", "name": "Comfortable Socks", "points": 1}]:
        call(s, "POST", "/collections/c1/documents", body=d)
    return s, call


def test_replace_wildcard_query_with_keyword(srv_replace):
    # reference :910 — a rule on q='*' can replace the wildcard with a
    # keyword: wildcard searches then behave like keyword searches
    s, call = srv_replace
    code, _ = call(s, "PUT", "/curation_sets/index", body={"items": [{
        "id": "rule-1", "rule": {"query": "*", "match": "exact"},
        "replace_query": "shoes"}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/c1/documents/search",
                     query={"q": "*", "query_by": "name",
                            "sort_by": "points:desc"})
    assert code == 200
    assert len(res["hits"]) == 2
    assert ids(res) == ["1", "0"]


def test_dynamic_filtering_numerical_filter(tmp_path):
    # reference :2495 — placeholder + static numeric clause in one
    # filter_by; remove_matched_tokens=false keeps the query text intact
    from tests.test_http_api import call, make_server
    from typesense_tpu.core.store import Store
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "c2",
        "fields": [{"name": "name", "type": "string"},
                   {"name": "category", "type": "string", "facet": True},
                   {"name": "brand", "type": "string", "facet": True},
                   {"name": "points", "type": "int32"}],
        "default_sorting_field": "points",
        "metadata": {"curation_sets": ["index"]}})
    docs = [
        {"id": "0", "name": "Retro Shoes", "category": "shoes",
         "brand": "Nike", "points": 15},
        {"id": "1", "name": "Baseball Shoes", "category": "shoes",
         "brand": "Nike", "points": 5},
        {"id": "2", "name": "Running Shoes", "category": "sports",
         "brand": "Nike", "points": 5},
        {"id": "3", "name": "Running Shoes", "category": "sports",
         "brand": "Adidas", "points": 5},
    ]
    for d in docs:
        call(s, "POST", "/collections/c2/documents", body=d)
    code, _ = call(s, "PUT", "/curation_sets/index", body={"items": [{
        "id": "dyn-num", "rule": {"query": "popular {brand} shoes",
                                  "match": "contains"},
        "remove_matched_tokens": False,
        "filter_by": "brand: {brand} && points:> 10"}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/c2/documents/search",
                     query={"q": "popular nike shoes",
                            "query_by": "name,category,brand",
                            "prefix": "false", "num_typos": "2"})
    assert code == 200
    # only doc 0 is Nike with points > 10
    assert ids(res) == ["0"]
