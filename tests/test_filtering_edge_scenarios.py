"""Filtering edges ported from
/root/reference/test/collection_filtering_test.cpp — backtick/comma string
values, mixed-comparator numeric OR lists, negatives, colon values, lazy
evaluation equivalence, multi-token exclusion."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture(scope="module")
def places():
    c = Collection("fe_places", [Field("place", "string", facet=True),
                                 Field("state", "string"),
                                 Field("points", "int32")],
                   default_sorting_field="points")
    rows = [("St. John's Cathedral, Denver, Colorado", "Colorado"),
            ("Crater Lake National Park, Oregon", "Oregon"),
            ("St. Patrick's Cathedral, Manhattan", "New York")]
    for i, (p, s) in enumerate(rows):
        c.add({"id": str(i), "place": p, "state": s, "points": i})
    return c


def test_filter_strings_with_comma_unquoted(places):
    """FilterStringsWithComma (collection_filtering_test.cpp:1973)."""
    res = places.search({"q": "*", "query_by": "place",
                         "filter_by": "place:= St. John's Cathedral, "
                                      "Denver, Colorado"})
    assert res["found"] == 1 and _ids(res) == ["0"]


def test_filter_strings_with_comma_backticks(places):
    res = places.search({"q": "*", "query_by": "place",
                         "filter_by": "place:= `St. John's Cathedral, "
                                      "Denver, Colorado`"})
    assert res["found"] == 1 and _ids(res) == ["0"]
    res = places.search({"q": "*", "query_by": "place",
                         "filter_by": "place:= [`St. John's Cathedral, "
                                      "Denver, Colorado`]"})
    assert res["found"] == 1 and _ids(res) == ["0"]
    res = places.search({"q": "*", "query_by": "place",
                         "filter_by": "place:= [`St. John's Cathedral, "
                                      "Denver, Colorado`, `St. Patrick's "
                                      "Cathedral, Manhattan`]"})
    assert res["found"] == 2 and set(_ids(res)) == {"0", "2"}


def test_filter_contains_with_backtick_comma(places):
    res = places.search({"q": "*", "query_by": "place",
                         "filter_by":
                             "place: [`Cathedral, Denver, Colorado`]"})
    assert res["found"] == 1 and _ids(res) == ["0"]


def test_filter_on_text_field_with_colon():
    """FilterOnTextFieldWithColon (…:617)."""
    c = Collection("fe_colon", [Field("url", "string", facet=True),
                                Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "1", "url": "https://example.com/1", "points": 1})
    res = c.search({"q": "*", "query_by": "url",
                    "filter_by": "url:= https://example.com/1"})
    assert res["found"] == 1 and _ids(res) == ["1"]


@pytest.fixture(scope="module")
def people():
    c = Collection("fe_people", [Field("name", "string"),
                                 Field("age", "int32"),
                                 Field("top_3", "float[]"),
                                 Field("rating", "float")],
                   default_sorting_field="age")
    rows = [("Jeremy Howard", 32, [5.0, 4.0], 4.4),
            ("Jeremy Fleming", 24, [4.5, 4.0], 4.5),
            ("Jeremy Clarkson", 44, [4.6, 4.2], 3.2),
            ("Jeremy Lin", 34, [4.0, 3.0], 4.0)]
    for i, (n, a, t, r) in enumerate(rows):
        c.add({"id": str(i), "name": n, "age": a, "top_3": t, "rating": r})
    return c


def test_numeric_or_list_mixed_comparators(people):
    """ComparatorsOnMultiValuedNumericalField (…:1435): `age: [24, >32]`
    is an OR of (age == 24) and (age > 32), sorted by rating desc."""
    res = people.search({"q": "Jeremy", "query_by": "name",
                         "filter_by": "age: [24, >32]",
                         "sort_by": "rating:desc"})
    assert _ids(res) == ["1", "0", "3"] if False else True
    # ids by rating desc among ages {24, 44, 34}: 1(4.5), 2(3.2), 3(4.0)
    assert [h["document"]["id"] for h in res["hits"]] == ["1", "3", "2"]

    res = people.search({"q": "Jeremy", "query_by": "name",
                         "filter_by": "age: [<=24, >=44]",
                         "sort_by": "rating:desc"})
    assert set(h["document"]["id"] for h in res["hits"]) == {"1", "2"}


def test_negative_numerical_filter():
    """FilterOnNegativeNumericalFields (…:1379)."""
    c = Collection("fe_neg", [Field("name", "string"),
                              Field("balance", "int32")],
                   default_sorting_field="balance")
    c.add({"id": "0", "name": "alpha", "balance": -100})
    c.add({"id": "1", "name": "beta", "balance": 50})
    c.add({"id": "2", "name": "gamma", "balance": -25})
    res = c.search({"q": "*", "filter_by": "balance:<0"})
    assert set(_ids(res)) == {"0", "2"}
    res = c.search({"q": "*", "filter_by": "balance:[-100]"})
    assert _ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "balance:>-50"})
    assert set(_ids(res)) == {"1", "2"}


def test_exclude_multiple_tokens():
    """ExcludeMultipleTokens (…:2445): several `-token` exclusions AND
    together."""
    c = Collection("fe_excl", [Field("title", "string")])
    c.add({"id": "0", "title": "alpha beta gamma"})
    c.add({"id": "1", "title": "alpha beta"})
    c.add({"id": "2", "title": "alpha"})
    res = c.search({"q": "alpha -beta -gamma", "query_by": "title",
                    "num_typos": "0", "prefix": "false"})
    assert _ids(res) == ["2"]
    res = c.search({"q": "alpha -gamma", "query_by": "title",
                    "num_typos": "0", "prefix": "false"})
    assert set(_ids(res)) == {"1", "2"}


def test_lazy_evaluation_equivalence():
    """LazyEvaluationOfFilterBy (…:303): enable_lazy_filter is a strategy
    hint — results must be identical either way."""
    c = Collection("fe_lazy", [Field("field", "string")])
    vals = {1: "foo", 2: "foo bar baz", 3: "foo bar", 4: "bar",
            5: "foo bar baz", 6: "baz", 7: "foo baz bar",
            8: "foo bar baz"}
    for i, v in vals.items():
        c.add({"id": str(i), "field": v})
    for lazy in ("true", "false"):
        res = c.search({"q": "foo", "query_by": "field",
                        "filter_by": 'field:"foo bar baz"',
                        "enable_lazy_filter": lazy})
        assert res["found"] == 3
        assert set(_ids(res)) == {"2", "5", "8"}


def test_large_filter_token():
    """LargeFilterToken (…:2754): filter values longer than the indexed
    token limit still match by prefix of the stored token."""
    c = Collection("fe_large", [Field("text", "string")])
    big = "a" * 260
    c.add({"id": "0", "text": big})
    res = c.search({"q": "*", "filter_by": f"text:{big}"})
    assert res["found"] == 1


def test_badly_formed_filter_rejected():
    """HandleBadlyFormedFilterQuery (…:651)."""
    c = Collection("fe_bad", [Field("name", "string"),
                              Field("age", "int32")],
                   default_sorting_field="age")
    c.add({"id": "0", "name": "x", "age": 3})
    for bad in ("age", "age:", "age:zz", "age:IN:&&", "age>300",
                "name:,hello"):
        with pytest.raises(TypesenseError):
            c.search({"q": "*", "filter_by": bad})


def test_filtering_via_document_ids():
    """FilteringViaDocumentIds (…:1641)."""
    c = Collection("fe_ids", [Field("title", "string")])
    for i in range(6):
        c.add({"id": str(i), "title": f"doc {i}"})
    res = c.search({"q": "*", "filter_by": "id: [0, 2, 4]"})
    assert set(_ids(res)) == {"0", "2", "4"}
    res = c.search({"q": "*", "filter_by": "id:!= [1, 3]"})
    assert set(_ids(res)) == {"0", "2", "4", "5"}


def test_query_bool_fields_and_sort():
    """QueryBoolFields (…:2107): bool filters compose with sorts."""
    c = Collection("fe_bool", [Field("name", "string"),
                               Field("popular", "bool"),
                               Field("rating", "float")],
                   default_sorting_field="rating")
    c.add({"id": "0", "name": "a", "popular": True, "rating": 4.0})
    c.add({"id": "1", "name": "b", "popular": False, "rating": 5.0})
    c.add({"id": "2", "name": "c", "popular": True, "rating": 3.0})
    res = c.search({"q": "*", "filter_by": "popular:true",
                    "sort_by": "rating:desc"})
    assert _ids(res) == ["0", "2"]
    res = c.search({"q": "*", "filter_by": "popular:false"})
    assert _ids(res) == ["1"]


def test_validate_field_names_false():
    """IgnoreFieldValidation (collection_filtering_test.cpp:3621-3672):
    with validate_field_names=false an unknown filter field matches
    NOTHING — AND with it yields 0, OR falls back to the other side."""
    c = Collection("fe_vfn", [Field("title", "string"),
                              Field("points", "int32")])
    c.add({"id": "8", "title": "the quick fox", "points": 75})
    c.add({"id": "9", "title": "lazy dog", "points": 30})

    # default: unknown field raises 404
    with pytest.raises(TypesenseError) as ei:
        c.search({"q": "*", "filter_by": "age: 100"})
    assert ei.value.http_code == 404

    res = c.search({"q": "*", "filter_by": "age: 100",
                    "validate_field_names": "false"})
    assert res["found"] == 0
    res = c.search({"q": "the", "query_by": "title",
                    "filter_by": "age: 100",
                    "validate_field_names": "false"})
    assert res["found"] == 0
    res = c.search({"q": "*", "filter_by": "age: 100 && points: 75",
                    "validate_field_names": "false"})
    assert res["found"] == 0
    res = c.search({"q": "*", "filter_by": "age: 100 || points: 75",
                    "validate_field_names": "false"})
    assert res["found"] == 1 and _ids(res) == ["8"]


def test_validate_field_names_false_query_by():
    """IgnoreMissingQueryByFields (collection_specific_more_test.cpp:3345):
    with validate_field_names=false an unknown query_by field is dropped
    instead of a 404; all-unknown query_by yields zero results."""
    c = Collection("fe_vfn_qb", [Field("title", "string")])
    c.add({"id": "0", "title": "hello world"})
    with pytest.raises(TypesenseError):
        c.search({"q": "hello", "query_by": "nope"})
    res = c.search({"q": "hello", "query_by": "nope",
                    "validate_field_names": "false"})
    assert res["found"] == 0
    res = c.search({"q": "hello", "query_by": "nope,title",
                    "validate_field_names": "false"})
    assert res["found"] == 1
