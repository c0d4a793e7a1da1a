"""Nested fields + auto schema tests (reference:
collection_nested_fields_test.cpp, collection_all_fields_test.cpp auto)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field
from typesense_tpu.schema.nested import flatten_paths, infer_type


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


def test_flatten_paths():
    doc = {"a": {"b": "x", "c": {"d": 3}},
           "items": [{"name": "p", "qty": 1}, {"name": "q", "qty": 2}],
           "plain": 5}
    flat = flatten_paths(doc)
    assert flat["a.b"] == "x"
    assert flat["a.c.d"] == 3
    assert flat["items.name"] == ["p", "q"]
    assert flat["items.qty"] == [1, 2]
    assert flat["plain"] == 5


def test_infer_type():
    assert infer_type(True) == "bool"
    assert infer_type(3) == "int64"
    assert infer_type(3.5) == "float"
    assert infer_type("x") == "string"
    assert infer_type(["a", "b"]) == "string[]"
    assert infer_type([1, 2]) == "int64[]"
    assert infer_type([]) is None
    assert infer_type({"a": 1}) is None


def test_nested_declared_fields():
    c = Collection("n", [
        Field("company.name", "string"),
        Field("company.size", "int32", optional=True),
    ], enable_nested_fields=True)
    c.add({"id": "0", "company": {"name": "acme corp", "size": 50}})
    c.add({"id": "1", "company": {"name": "globex inc"}})
    res = c.search({"q": "acme", "query_by": "company.name"})
    assert ids(res) == ["0"]
    # document returned in original nested shape
    assert res["hits"][0]["document"]["company"] == {"name": "acme corp", "size": 50}
    res = c.search({"q": "*", "filter_by": "company.size:>10"})
    assert ids(res) == ["0"]


def test_nested_object_arrays():
    c = Collection("orders", [
        Field("lines.product", "string[]"),
        Field("lines.qty", "int32[]", optional=True),
    ], enable_nested_fields=True)
    c.add({"id": "0", "lines": [{"product": "red sock", "qty": 2},
                                {"product": "blue hat", "qty": 1}]})
    c.add({"id": "1", "lines": [{"product": "green scarf", "qty": 5}]})
    res = c.search({"q": "hat", "query_by": "lines.product"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "lines.qty:>3"})
    assert ids(res) == ["1"]


def test_auto_schema():
    c = Collection("autoc", [Field(".*", "auto")])
    c.add({"id": "0", "title": "hello world", "points": 10, "tags": ["x", "y"]})
    c.add({"id": "1", "title": "goodbye world", "points": 5, "price": 9.5})
    # fields materialized with inferred types
    assert c.field_map["title"].type == "string"
    assert c.field_map["points"].type == "int64"
    assert c.field_map["tags"].type == "string[]"
    assert c.field_map["price"].type == "float"
    res = c.search({"q": "hello", "query_by": "title"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "points:>7"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "sort_by": "points:asc"})
    assert [h["document"]["id"] for h in res["hits"]] == ["1", "0"]


def test_pattern_dynamic_field():
    c = Collection("pat", [
        Field("title", "string"),
        Field("label_.*", "string", facet=True),
    ])
    c.add({"id": "0", "title": "a doc", "label_color": "red"})
    c.add({"id": "1", "title": "b doc", "label_color": "blue"})
    assert c.field_map["label_color"].facet
    res = c.search({"q": "*", "filter_by": "label_color:red"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "facet_by": "label_color"})
    counts = {x["value"]: x["count"] for x in res["facet_counts"][0]["counts"]}
    assert counts == {"red": 1, "blue": 1}


def test_auto_nested():
    c = Collection("an", [Field(".*", "auto")], enable_nested_fields=True)
    c.add({"id": "0", "user": {"name": "alice smith", "age": 30}})
    c.add({"id": "1", "user": {"name": "bob jones", "age": 25}})
    assert c.field_map["user.name"].type == "string"
    assert c.field_map["user.age"].type == "int64"
    res = c.search({"q": "alice", "query_by": "user.name"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "user.age:<28"})
    assert ids(res) == ["1"]
