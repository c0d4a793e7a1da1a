"""Nested-field scenario family — reference
collection_nested_fields_test.cpp: search/filter/facet/sort/highlight over
dotted paths and object arrays, end to end through Collection."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("orders", [
        Field("customer.name", "string"),
        Field("customer.tier", "string", facet=True),
        Field("items.sku", "string[]"),
        Field("items.qty", "int32[]"),
        Field("total", "int32"),
    ], enable_nested_fields=True, default_sorting_field="total")
    c.add({"id": "0", "total": 100,
           "customer": {"name": "alice smith", "tier": "gold"},
           "items": [{"sku": "apple", "qty": 2}, {"sku": "pear", "qty": 1}]})
    c.add({"id": "1", "total": 50,
           "customer": {"name": "bob jones", "tier": "silver"},
           "items": [{"sku": "apple", "qty": 5}]})
    c.add({"id": "2", "total": 200,
           "customer": {"name": "carol smith", "tier": "gold"},
           "items": [{"sku": "mango", "qty": 3}]})
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_search_nested_path(coll):
    res = coll.search({"q": "smith", "query_by": "customer.name",
                       "prefix": "false", "num_typos": "0"})
    assert set(ids(res)) == {"0", "2"}


def test_search_object_array_path(coll):
    res = coll.search({"q": "apple", "query_by": "items.sku",
                       "prefix": "false", "num_typos": "0"})
    assert set(ids(res)) == {"0", "1"}


def test_filter_nested_numeric_array(coll):
    res = coll.search({"q": "*", "filter_by": "items.qty:>2"})
    assert set(ids(res)) == {"1", "2"}


def test_facet_nested_path(coll):
    res = coll.search({"q": "*", "facet_by": "customer.tier"})
    fc = {x["value"]: x["count"] for x in res["facet_counts"][0]["counts"]}
    assert fc == {"gold": 2, "silver": 1}


def test_nested_filter_string_eq(coll):
    res = coll.search({"q": "*", "filter_by": "customer.tier:=silver"})
    assert ids(res) == ["1"]


def test_nested_highlight(coll):
    res = coll.search({"q": "mango", "query_by": "items.sku",
                       "prefix": "false", "num_typos": "0"})
    hl = res["hits"][0]["highlight"]
    assert "items.sku" in hl or "items" in hl


def test_nested_doc_returned_nested(coll):
    res = coll.search({"q": "bob", "query_by": "customer.name",
                       "prefix": "false", "num_typos": "0"})
    doc = res["hits"][0]["document"]
    assert doc["customer"]["name"] == "bob jones"
    assert doc["items"][0]["sku"] == "apple"


def test_nested_typo_search(coll):
    res = coll.search({"q": "smth", "query_by": "customer.name",
                       "prefix": "false", "num_typos": "2"})
    assert set(ids(res)) == {"0", "2"}


def test_nested_sort_combined(coll):
    res = coll.search({"q": "smith", "query_by": "customer.name",
                       "prefix": "false", "num_typos": "0",
                       "sort_by": "total:desc"})
    assert ids(res) == ["2", "0"]
