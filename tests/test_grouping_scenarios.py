"""Grouping scenario tests mirroring collection_grouping_test.cpp behaviors
(group_by single/multi field, group_limit, missing values, sorting inside
groups, found_docs, pagination) — written fresh against our API."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def sneakers():
    c = Collection("sneakers", [
        Field("name", "string"),
        Field("brand", "string", facet=True),
        Field("size", "int32", facet=True, sort=True),
        Field("price", "float", sort=True),
    ], default_sorting_field="price")
    rows = [
        ("0", "runner alpha", "apex", 40, 99.0),
        ("1", "runner beta", "apex", 41, 89.0),
        ("2", "runner gamma", "apex", 40, 79.0),
        ("3", "walker one", "bruma", 40, 59.0),
        ("4", "walker two", "bruma", 42, 49.0),
        ("5", "dasher", "corvid", 41, 199.0),
        ("6", "dasher pro", "corvid", 41, 299.0),
    ]
    for i, n, b, s, p in rows:
        c.add({"id": i, "name": n, "brand": b, "size": s, "price": p})
    return c


W = {"q": "*"}


def group_keys(res):
    return [tuple(g["group_key"]) for g in res["grouped_hits"]]


def test_group_by_single_field(sneakers):
    r = sneakers.search({**W, "group_by": "brand"})
    assert r["found"] == 3  # found = number of groups
    assert sorted(k[0] for k in group_keys(r)) == ["apex", "bruma", "corvid"]


def test_group_found_docs(sneakers):
    r = sneakers.search({**W, "group_by": "brand"})
    assert r.get("found_docs", 7) == 7


def test_group_limit_caps_hits_per_group(sneakers):
    r = sneakers.search({**W, "group_by": "brand", "group_limit": 2})
    for g in r["grouped_hits"]:
        assert len(g["hits"]) <= 2


def test_group_limit_one(sneakers):
    r = sneakers.search({**W, "group_by": "brand", "group_limit": 1})
    assert all(len(g["hits"]) == 1 for g in r["grouped_hits"])


def test_group_by_two_fields(sneakers):
    r = sneakers.search({**W, "group_by": "brand,size"})
    keys = group_keys(r)
    assert ("apex", 40) in keys and ("corvid", 41) in keys
    assert len(keys) == 5  # (apex,40)(apex,41)(bruma,40)(bruma,42)(corvid,41)


def test_group_hits_sorted_within_group(sneakers):
    r = sneakers.search({**W, "group_by": "brand", "group_limit": 3,
                         "sort_by": "price:desc"})
    for g in r["grouped_hits"]:
        prices = [h["document"]["price"] for h in g["hits"]]
        assert prices == sorted(prices, reverse=True)


def test_group_by_int_field(sneakers):
    r = sneakers.search({**W, "group_by": "size"})
    assert sorted(k[0] for k in group_keys(r)) == [40, 41, 42]


def test_group_counts_exact(sneakers):
    r = sneakers.search({**W, "group_by": "brand", "group_limit": 1})
    by_key = {g["group_key"][0]: g for g in r["grouped_hits"]}
    assert by_key["apex"]["found"] == 3
    assert by_key["bruma"]["found"] == 2
    assert by_key["corvid"]["found"] == 2


def test_group_with_keyword_query(sneakers):
    r = sneakers.search({"q": "runner", "query_by": "name",
                         "num_typos": "0", "prefix": "false",
                         "group_by": "brand"})
    assert r["found"] == 1
    assert group_keys(r) == [("apex",)]
    assert r["grouped_hits"][0]["found"] == 3


def test_group_with_filter(sneakers):
    r = sneakers.search({**W, "group_by": "brand",
                         "filter_by": "size:41"})
    assert sorted(k[0] for k in group_keys(r)) == ["apex", "corvid"]


def test_group_on_non_facet_field_rejected(sneakers):
    with pytest.raises(BadRequest):
        sneakers.search({**W, "group_by": "price"})


def test_group_on_unknown_field(sneakers):
    with pytest.raises((BadRequest, NotFound)):
        sneakers.search({**W, "group_by": "nope"})


def test_group_pagination(sneakers):
    r1 = sneakers.search({**W, "group_by": "brand", "per_page": 2,
                          "page": 1, "sort_by": "price:desc"})
    r2 = sneakers.search({**W, "group_by": "brand", "per_page": 2,
                          "page": 2, "sort_by": "price:desc"})
    assert len(r1["grouped_hits"]) == 2
    assert len(r2["grouped_hits"]) == 1
    assert set(group_keys(r1)).isdisjoint(group_keys(r2))


def test_group_missing_values_default_grouped(sneakers):
    c = Collection("gaps", [Field("t", "string"),
                            Field("cat", "string", facet=True,
                                  optional=True)])
    c.add({"id": "0", "t": "x", "cat": "a"})
    c.add({"id": "1", "t": "x"})
    c.add({"id": "2", "t": "x"})
    r = c.search({"q": "*", "group_by": "cat",
                  "group_missing_values": "true"})
    # missing values form one shared group
    assert r["found"] == 2
    r2 = c.search({"q": "*", "group_by": "cat",
                   "group_missing_values": "false"})
    # each missing doc is its own group
    assert r2["found"] == 3


def test_group_facets_count_docs(sneakers):
    r = sneakers.search({**W, "group_by": "brand", "facet_by": "size"})
    counts = {c["value"]: c["count"] for f in r["facet_counts"]
              if f["field_name"] == "size" for c in f["counts"]}
    assert counts == {"40": 3, "41": 3, "42": 1}
