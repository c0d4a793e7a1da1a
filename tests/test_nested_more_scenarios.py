"""Nested-field behaviors ported from
/root/reference/test/collection_nested_fields_test.cpp — nested sorting,
dotted include/exclude pruning, nested search + filter, object arrays."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_sort_by_nested_field():
    """SortByNestedField (collection_nested_fields_test.cpp:1674)."""
    c = Collection("nm_sort", [Field("details", "object"),
                               Field("company.num_employees", "int32")],
                   enable_nested_fields=True)
    c.add({"id": "0", "details": {"count": 1000},
           "company": {"num_employees": 2000}})
    c.add({"id": "1", "details": {"count": 2000},
           "company": {"num_employees": 1000}})
    res = c.search({"q": "*", "sort_by": "company.num_employees:asc"})
    assert _ids(res) == ["1", "0"]
    res = c.search({"q": "*", "sort_by": "company.num_employees:desc"})
    assert _ids(res) == ["0", "1"]


def test_nested_include_exclude_pruning():
    """IncludeExcludeFieldsPruning (…:596): dotted include/exclude prunes
    inside objects."""
    c = Collection("nm_prune", [Field("company", "object"),
                                Field("name", "string")],
                   enable_nested_fields=True)
    c.add({"id": "0", "name": "acme",
           "company": {"city": "Reno", "size": 10}})
    res = c.search({"q": "*", "include_fields": "company.city"})
    doc = res["hits"][0]["document"]
    assert doc.get("company", {}).get("city") == "Reno"
    assert "size" not in doc.get("company", {})
    assert "name" not in doc
    res = c.search({"q": "*", "exclude_fields": "company.size"})
    doc = res["hits"][0]["document"]
    assert doc["name"] == "acme"
    assert doc["company"].get("city") == "Reno"
    assert "size" not in doc["company"]


def test_nested_object_array_search():
    """TestNestedArrayField (…:197): tokens inside object arrays match."""
    c = Collection("nm_arr", [Field("employees", "object[]"),
                              Field("name", "string")],
                   enable_nested_fields=True)
    c.add({"id": "0", "name": "acme",
           "employees": [{"name": "alice smith", "tags": ["lead"]},
                         {"name": "bob jones", "tags": ["intern"]}]})
    c.add({"id": "1", "name": "globex",
           "employees": [{"name": "carol white", "tags": ["manager"]}]})
    res = c.search({"q": "alice", "query_by": "employees.name",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res) == ["0"]
    res = c.search({"q": "manager", "query_by": "employees.tags",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res) == ["1"]


def test_nested_filter():
    """Filtering on dotted nested numeric fields."""
    c = Collection("nm_filter", [Field("company", "object"),
                                 Field("company.size", "int32")],
                   enable_nested_fields=True)
    c.add({"id": "0", "company": {"size": 10}})
    c.add({"id": "1", "company": {"size": 200}})
    res = c.search({"q": "*", "filter_by": "company.size:>100"})
    assert _ids(res) == ["1"]


def test_object_array_allows_empty():
    """ObjectArrayAllowEmpty (…:1962)."""
    c = Collection("nm_empty", [Field("items", "object[]",
                                      optional=True),
                                Field("name", "string")],
                   enable_nested_fields=True)
    c.add({"id": "0", "name": "x", "items": []})
    res = c.search({"q": "*"})
    assert res["found"] == 1


def test_explicit_dotted_field_precedence():
    """ExplicitDotSeparatedFieldsShouldHavePrecendence (…:1828): an
    explicit dotted field's type wins over object auto-inference."""
    c = Collection("nm_prec", [Field("data", "object"),
                               Field("data.code", "string")],
                   enable_nested_fields=True)
    c.add({"id": "0", "data": {"code": "12345", "other": "x"}})
    # code indexed as STRING: keyword search matches, numeric filter fails
    res = c.search({"q": "12345", "query_by": "data.code",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res) == ["0"]
    with pytest.raises(TypesenseError):
        c.search({"q": "*", "filter_by": "data.code:>100"})
