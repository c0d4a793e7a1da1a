"""Filtering scenario tests mirroring collection_filtering_test.cpp behaviors
(comparators, ranges, multi-value IN, negation, boolean logic, string
equals/contains/prefix, id filters, arrays, error cases) — written fresh
against our API."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.schema.field import Field


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


@pytest.fixture(scope="module")
def cars():
    c = Collection("cars", [
        Field("model", "string"),
        Field("maker", "string", facet=True),
        Field("desc", "string", optional=True),
        Field("year", "int32", sort=True),
        Field("price", "float", sort=True),
        Field("electric", "bool"),
        Field("colors", "string[]"),
        Field("ratings", "int32[]"),
    ], default_sorting_field="year")
    rows = [
        ("0", "falcon gt", "aquila", "a fast falcon car", 2020, 35000.0,
         False, ["red", "black"], [5, 4]),
        ("1", "falcon ev", "aquila", "electric falcon sedan", 2023, 45000.0,
         True, ["white"], [5, 5]),
        ("2", "sparrow", "bruma", "compact city car", 2018, 15000.5,
         False, ["blue", "red"], [3]),
        ("3", "sparrow ev", "bruma", "small electric hatch", 2022, 22000.0,
         True, ["green"], [4, 2]),
        ("4", "condor", "corvid", None, 2015, 55000.0, False,
         ["black"], [2]),
    ]
    for i, m, mk, d, y, p, e, cols, rats in rows:
        doc = {"id": i, "model": m, "maker": mk, "year": y, "price": p,
               "electric": e, "colors": cols, "ratings": rats}
        if d is not None:
            doc["desc"] = d
        c.add(doc)
    return c


W = {"q": "*"}


def test_int_equals(cars):
    assert ids(cars.search({**W, "filter_by": "year:2020"})) == ["0"]


def test_int_not_equals(cars):
    assert ids(cars.search({**W, "filter_by": "year:!=2020"})) == \
        ["1", "2", "3", "4"]


def test_int_greater(cars):
    assert ids(cars.search({**W, "filter_by": "year:>2020"})) == ["1", "3"]


def test_int_greater_equal(cars):
    assert ids(cars.search({**W, "filter_by": "year:>=2020"})) == \
        ["0", "1", "3"]


def test_int_less(cars):
    assert ids(cars.search({**W, "filter_by": "year:<2018"})) == ["4"]


def test_int_less_equal(cars):
    assert ids(cars.search({**W, "filter_by": "year:<=2018"})) == ["2", "4"]


def test_int_range_inclusive(cars):
    assert ids(cars.search({**W, "filter_by": "year:[2018..2022]"})) == \
        ["0", "2", "3"]


def test_float_compare(cars):
    assert ids(cars.search({**W, "filter_by": "price:<30000"})) == ["2", "3"]


def test_float_range(cars):
    assert ids(cars.search({**W, "filter_by": "price:[20000..50000]"})) == \
        ["0", "1", "3"]


def test_multi_value_in(cars):
    assert ids(cars.search({**W, "filter_by": "year:[2015,2023]"})) == \
        ["1", "4"]


def test_multi_value_not_in(cars):
    assert ids(cars.search({**W, "filter_by": "year:!=[2015,2023]"})) == \
        ["0", "2", "3"]


def test_bool_true(cars):
    assert ids(cars.search({**W, "filter_by": "electric:true"})) == ["1", "3"]


def test_bool_false(cars):
    assert ids(cars.search({**W, "filter_by": "electric:false"})) == \
        ["0", "2", "4"]


def test_and_conjunction(cars):
    assert ids(cars.search({**W, "filter_by":
                            "electric:true && price:<30000"})) == ["3"]


def test_or_disjunction(cars):
    assert ids(cars.search({**W, "filter_by":
                            "year:2015 || year:2023"})) == ["1", "4"]


def test_nested_parens(cars):
    got = ids(cars.search({**W, "filter_by":
                           "(year:>2019 && electric:true) || maker:corvid"}))
    assert got == ["1", "3", "4"]


def test_string_equals(cars):
    assert ids(cars.search({**W, "filter_by": "maker:=aquila"})) == ["0", "1"]


def test_string_equals_multi(cars):
    assert ids(cars.search({**W, "filter_by": "maker:=[aquila, corvid]"})) == \
        ["0", "1", "4"]


def test_string_not_equals(cars):
    assert ids(cars.search({**W, "filter_by": "maker:!=aquila"})) == \
        ["2", "3", "4"]


def test_string_contains_token(cars):
    # bare `field: value` token-level CONTAINS (filter.h:17-27 CONTAINS)
    assert ids(cars.search({**W, "filter_by": "desc:electric"})) == \
        ["1", "3"]


def test_string_contains_phrase(cars):
    got = ids(cars.search({**W, "filter_by": "desc:`electric falcon`"}))
    assert got == ["1"]


def test_string_prefix_star(cars):
    assert ids(cars.search({**W, "filter_by": "model:falc*"})) == ["0", "1"]


def test_array_contains_value(cars):
    assert ids(cars.search({**W, "filter_by": "colors:=red"})) == ["0", "2"]


def test_array_multi_value(cars):
    assert ids(cars.search({**W, "filter_by": "colors:=[white, green]"})) == \
        ["1", "3"]


def test_int_array_compare(cars):
    # any element matches (num arrays filter element-wise)
    assert ids(cars.search({**W, "filter_by": "ratings:5"})) == ["0", "1"]


def test_int_array_range(cars):
    assert ids(cars.search({**W, "filter_by": "ratings:<3"})) == ["3", "4"]


def test_id_filter(cars):
    assert ids(cars.search({**W, "filter_by": "id:=[0, 4]"})) == ["0", "4"]


def test_id_filter_negated(cars):
    assert ids(cars.search({**W, "filter_by": "id:!=[0, 4]"})) == \
        ["1", "2", "3"]


def test_filter_with_keyword_query(cars):
    r = cars.search({"q": "falcon", "query_by": "model",
                     "num_typos": "0", "prefix": "false",
                     "filter_by": "electric:true"})
    assert ids(r) == ["1"]


def test_filter_unknown_field(cars):
    with pytest.raises((BadRequest, NotFound)):
        cars.search({**W, "filter_by": "nonexistent:5"})


def test_filter_malformed_rejected(cars):
    with pytest.raises(BadRequest):
        cars.search({**W, "filter_by": "year:"})


def test_filter_bad_bool_value(cars):
    with pytest.raises(BadRequest):
        cars.search({**W, "filter_by": "electric:maybe"})


def test_filter_found_counts(cars):
    r = cars.search({**W, "filter_by": "year:>=2018"})
    assert r["found"] == 4 and r["out_of"] == 5


def test_filter_facets_respect_filter(cars):
    r = cars.search({**W, "filter_by": "electric:true", "facet_by": "maker"})
    counts = {c["value"]: c["count"] for f in r["facet_counts"]
              if f["field_name"] == "maker" for c in f["counts"]}
    assert counts == {"aquila": 1, "bruma": 1}


def test_filter_optional_field_missing_doc_excluded(cars):
    # doc 4 has no desc; CONTAINS on desc must not match it
    got = ids(cars.search({**W, "filter_by": "desc:car"}))
    assert got == ["0", "2"]


def test_string_not_equals_is_exact(cars):
    # != on strings is exact NOT_EQUALS (all ids minus equal ids,
    # filter_result_iterator NOT_EQUALS): no doc's desc EQUALS the single
    # token "electric", so every doc passes
    got = ids(cars.search({**W, "filter_by": "desc:!=electric"}))
    assert got == ["0", "1", "2", "3", "4"]
    # but a full exact value does exclude its doc
    got2 = ids(cars.search({**W,
                            "filter_by": "desc:!=`electric falcon sedan`"}))
    assert "1" not in got2


def test_max_filter_by_candidates_caps_prefix_expansion():
    """filter.h:15 DEFAULT_FILTER_BY_CANDIDATES=4: a loose prefix string
    filter expands to at most `max_filter_by_candidates` distinct terms,
    most-frequent first; raising the param widens the expansion."""
    c = Collection("mfbc", [Field("tag", "string"),
                            Field("n", "int32")])
    # 6 distinct tags sharing the prefix; tag5x most frequent
    for i in range(6):
        for _ in range(i + 1):
            c.add({"tag": f"tag{i}x", "n": i})
    # default cap 4: only the 4 most frequent tags (tag2x..tag5x) match
    r = c.search({"q": "*", "filter_by": "tag: tag*", "per_page": 50})
    assert r["found"] == 3 + 4 + 5 + 6
    # explicit higher cap: all 6 terms match
    r = c.search({"q": "*", "filter_by": "tag: tag*", "per_page": 50,
                  "max_filter_by_candidates": "100"})
    assert r["found"] == 21
    # cap of 1: only the most frequent term
    r = c.search({"q": "*", "filter_by": "tag: tag*", "per_page": 50,
                  "max_filter_by_candidates": "1"})
    assert r["found"] == 6
