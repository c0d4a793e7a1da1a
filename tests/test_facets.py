"""Facet feature tests: facet_query narrowing, numeric stats, range facets,
facet sort options (reference: collection_faceting_test.cpp)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def shirts():
    c = Collection("shirts", [
        Field("title", "string"),
        Field("brand", "string", facet=True),
        Field("size", "string", facet=True),
        Field("price", "float", facet=True, sort=True),
        Field("rating", "int32", facet=True),
    ], default_sorting_field="rating")
    docs = [
        {"title": "blue shirt", "brand": "adidas", "size": "small", "price": 19.99, "rating": 4},
        {"title": "red shirt", "brand": "adidas", "size": "large", "price": 29.99, "rating": 5},
        {"title": "green shirt", "brand": "nike", "size": "small", "price": 24.99, "rating": 3},
        {"title": "black shirt", "brand": "puma", "size": "medium", "price": 49.99, "rating": 5},
        {"title": "white shirt", "brand": "new balance", "size": "small", "price": 99.99, "rating": 2},
    ]
    for d in docs:
        c.add(d)
    return c


def facet(res, name):
    for fc in res["facet_counts"]:
        if fc["field_name"] == name:
            return fc
    return None


def test_facet_counts_basic(shirts):
    res = shirts.search({"q": "*", "facet_by": "brand"})
    fc = facet(res, "brand")
    counts = {c["value"]: c["count"] for c in fc["counts"]}
    assert counts == {"adidas": 2, "nike": 1, "puma": 1, "new balance": 1}


def test_facet_query_prefix(shirts):
    res = shirts.search({"q": "*", "facet_by": "brand", "facet_query": "brand: n"})
    fc = facet(res, "brand")
    vals = sorted(c["value"] for c in fc["counts"])
    assert vals == ["new balance", "nike"]
    hl = {c["value"]: c["highlighted"] for c in fc["counts"]}
    assert hl["nike"] == "<mark>n</mark>ike"
    # word-boundary match inside a value
    res2 = shirts.search({"q": "*", "facet_by": "brand", "facet_query": "brand: balance"})
    fc2 = facet(res2, "brand")
    assert [c["value"] for c in fc2["counts"]] == ["new balance"]
    assert fc2["counts"][0]["highlighted"] == "new <mark>balance</mark>"


def test_facet_query_requires_facet_by(shirts):
    with pytest.raises(BadRequest):
        shirts.search({"q": "*", "facet_by": "brand", "facet_query": "size: s"})


def test_numeric_facet_stats(shirts):
    res = shirts.search({"q": "*", "facet_by": "price"})
    st = facet(res, "price")["stats"]
    assert st["min"] == pytest.approx(19.99)
    assert st["max"] == pytest.approx(99.99)
    assert st["sum"] == pytest.approx(224.95)
    assert st["avg"] == pytest.approx(44.99)
    assert st["total_values"] == 5


def test_range_facets(shirts):
    res = shirts.search({"q": "*",
                         "facet_by": "price(Economy:[0,30], Premium:[30,200])"})
    fc = facet(res, "price")
    counts = {c["value"]: c["count"] for c in fc["counts"]}
    assert counts == {"Economy": 3, "Premium": 2}


def test_range_facets_non_numeric_rejected(shirts):
    with pytest.raises(BadRequest):
        shirts.search({"q": "*", "facet_by": "brand(Cheap:[0,10])"})


def test_facet_sort_alpha(shirts):
    res = shirts.search({"q": "*", "facet_by": "brand(sort_by: _alpha:asc)"})
    vals = [c["value"] for c in facet(res, "brand")["counts"]]
    assert vals == sorted(vals)


def test_facets_respect_filter(shirts):
    res = shirts.search({"q": "*", "facet_by": "brand",
                         "filter_by": "rating:>=5"})
    counts = {c["value"]: c["count"] for c in facet(res, "brand")["counts"]}
    assert counts == {"adidas": 1, "puma": 1}


def test_facets_on_keyword_search(shirts):
    res = shirts.search({"q": "shirt", "query_by": "title", "facet_by": "size"})
    counts = {c["value"]: c["count"] for c in facet(res, "size")["counts"]}
    assert counts == {"small": 3, "large": 1, "medium": 1}
