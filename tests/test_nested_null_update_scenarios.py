"""Nested-field null-value and update semantics, ported from the reference
suite (/root/reference/test/collection_nested_fields_test.cpp:
EmplaceWithNullValueOnRequiredField / OnOptionalField, UpsertWithNullValue
ONestedField / ONestedArrayField, UpdateNestedDocument*, SortByNestedField,
ObjectArrayAllowEmpty, FieldsWithDotsButNotNested, IncludeExcludeFields
pruning, UnindexedNestedField): null handling on required vs optional
nested paths, updates that merge object subtrees, and dotted names without
nesting enabled."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.schema.field import Field


def _coll(name, fields, **kw):
    return Collection(name, fields, enable_nested_fields=True, **kw)


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


# ---- null values (EmplaceWithNullValue*, UpsertWithNullValue*) ----

def test_null_on_required_nested_field_rejected():
    c = _coll("nn1", [Field("company.name", "string")])
    with pytest.raises(BadRequest):
        c.add({"id": "0", "company": {"name": None}})


def test_null_on_optional_nested_field_ok():
    c = _coll("nn2", [Field("company.name", "string", optional=True),
                      Field("num", "int32")])
    c.add({"id": "0", "company": {"name": None}, "num": 1})
    assert c.get("0")["num"] == 1


def test_missing_optional_nested_object_ok():
    c = _coll("nn3", [Field("company.name", "string", optional=True),
                      Field("num", "int32")])
    c.add({"id": "0", "num": 5})
    res = c.search({"q": "*"})
    assert ids(res) == ["0"]


def test_null_on_required_top_level_rejected():
    c = _coll("nn4", [Field("title", "string")])
    with pytest.raises(BadRequest):
        c.add({"id": "0", "title": None})


def test_upsert_with_null_optional_nested_array():
    c = _coll("nn5", [Field("items.sku", "string[]", optional=True),
                      Field("n", "int32")])
    c.add({"id": "0", "items": [{"sku": "apple"}], "n": 1})
    c.add({"id": "0", "items": None, "n": 2}, operation="upsert")
    doc = c.get("0")
    assert doc["n"] == 2
    res = c.search({"q": "apple", "query_by": "items.sku",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == []


def test_emplace_missing_array_value_on_optional_field():
    c = _coll("nn6", [Field("items.sku", "string[]", optional=True),
                      Field("n", "int32")])
    c.add({"id": "0", "n": 1}, operation="emplace")
    assert c.get("0")["n"] == 1


# ---- updates over nested docs (UpdateNestedDocument*) ----

def test_update_nested_document_reindexes():
    c = _coll("nu1", [Field("customer.name", "string"),
                      Field("total", "int32")],
              default_sorting_field="total")
    c.add({"id": "0", "customer": {"name": "alice"}, "total": 10})
    c.add({"id": "0", "customer": {"name": "bob"}}, operation="update")
    res = c.search({"q": "alice", "query_by": "customer.name",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == []
    res = c.search({"q": "bob", "query_by": "customer.name",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == ["0"]


def test_update_preserves_sibling_nested_values():
    c = _coll("nu2", [Field("a.x", "string", optional=True),
                      Field("a.y", "string", optional=True),
                      Field("n", "int32")])
    c.add({"id": "0", "a": {"x": "foo", "y": "bar"}, "n": 1})
    c.add({"id": "0", "n": 2}, operation="update")
    doc = c.get("0")
    assert doc["a"]["x"] == "foo" and doc["a"]["y"] == "bar"
    assert doc["n"] == 2


def test_update_nested_auto_schema():
    c = Collection("nu3", [Field(".*", "auto")], enable_nested_fields=True)
    c.add({"id": "0", "meta": {"color": "red"}})
    c.add({"id": "0", "meta": {"color": "blue"}}, operation="upsert")
    res = c.search({"q": "blue", "query_by": "meta.color",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == ["0"]


def test_upsert_replaces_whole_doc():
    c = _coll("nu4", [Field("a.x", "string", optional=True),
                      Field("b", "string", optional=True)])
    c.add({"id": "0", "a": {"x": "foo"}, "b": "keep"})
    c.add({"id": "0", "a": {"x": "new"}}, operation="upsert")
    doc = c.get("0")
    assert doc["a"]["x"] == "new"
    assert "b" not in doc or doc.get("b") is None


# ---- sorting on nested fields (SortByNestedField) ----

def test_sort_by_nested_numeric():
    c = _coll("ns1", [Field("t", "string"),
                      Field("stats.rank", "int32")])
    c.add({"id": "0", "t": "doc", "stats": {"rank": 5}})
    c.add({"id": "1", "t": "doc", "stats": {"rank": 20}})
    c.add({"id": "2", "t": "doc", "stats": {"rank": 1}})
    res = c.search({"q": "*", "sort_by": "stats.rank:desc"})
    assert ids(res) == ["1", "0", "2"]
    res = c.search({"q": "*", "sort_by": "stats.rank:asc"})
    assert ids(res) == ["2", "0", "1"]


# ---- object arrays (ObjectArrayAllowEmpty, TestNestedArrayField) ----

def test_object_array_allow_empty():
    c = _coll("na1", [Field("items.sku", "string[]", optional=True),
                      Field("n", "int32")])
    c.add({"id": "0", "items": [], "n": 1})
    res = c.search({"q": "*"})
    assert ids(res) == ["0"]


def test_nested_array_field_multi_element_search():
    c = _coll("na2", [Field("lines.text", "string[]")])
    c.add({"id": "0", "lines": [{"text": "alpha beta"},
                                {"text": "gamma delta"}]})
    for tok in ("alpha", "gamma", "delta"):
        res = c.search({"q": tok, "query_by": "lines.text",
                        "prefix": "false", "num_typos": "0"})
        assert ids(res) == ["0"], tok


def test_deep_nested_optional_array_value():
    c = _coll("na3", [Field("a.b.c", "string[]", optional=True),
                      Field("n", "int32")])
    c.add({"id": "0", "a": {"b": {"c": ["deep token"]}}, "n": 1})
    c.add({"id": "1", "a": {}, "n": 2})
    res = c.search({"q": "deep", "query_by": "a.b.c",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == ["0"]


def test_float_inside_nested_object():
    c = _coll("na4", [Field("m.score", "float"), Field("t", "string")])
    c.add({"id": "0", "t": "x", "m": {"score": 1.5}})
    c.add({"id": "1", "t": "x", "m": {"score": 0.25}})
    res = c.search({"q": "*", "filter_by": "m.score:>1.0"})
    assert ids(res) == ["0"]


# ---- dots without nesting (FieldsWithDotsButNotNested) ----

def test_dotted_field_name_without_nested_enabled():
    c = Collection("nd1", [Field("org.name", "string")])
    c.add({"id": "0", "org.name": "acme corp"})
    res = c.search({"q": "acme", "query_by": "org.name",
                    "prefix": "false", "num_typos": "0"})
    assert ids(res) == ["0"]


# ---- error contracts ----

def test_object_type_requires_nested_enabled():
    with pytest.raises(BadRequest):
        Collection("ne1", [Field("meta", "object")])


def test_nested_numeric_array_type_mismatch_rejected():
    c = _coll("ne2", [Field("items.qty", "int32[]")])
    with pytest.raises(BadRequest):
        c.add({"id": "0", "items": [{"qty": "not a number"}]})


def test_unindexed_nested_field_not_searchable():
    c = _coll("ne3", [Field("meta.note", "string", index=False,
                            optional=True),
                      Field("t", "string")])
    c.add({"id": "0", "t": "hello", "meta": {"note": "secret"}})
    with pytest.raises(BadRequest):
        c.search({"q": "secret", "query_by": "meta.note"})


# ---- include/exclude pruning over nested docs ----

def test_include_fields_prunes_nested():
    c = _coll("np1", [Field("a.x", "string"), Field("b", "string")])
    c.add({"id": "0", "a": {"x": "foo"}, "b": "bar"})
    res = c.search({"q": "foo", "query_by": "a.x", "prefix": "false",
                    "num_typos": "0", "include_fields": "a"})
    doc = res["hits"][0]["document"]
    assert "a" in doc and "b" not in doc


def test_exclude_fields_prunes_nested():
    c = _coll("np2", [Field("a.x", "string"), Field("b", "string")])
    c.add({"id": "0", "a": {"x": "foo"}, "b": "bar"})
    res = c.search({"q": "foo", "query_by": "a.x", "prefix": "false",
                    "num_typos": "0", "exclude_fields": "a"})
    doc = res["hits"][0]["document"]
    assert "a" not in doc and doc["b"] == "bar"
