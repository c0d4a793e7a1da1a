"""Grouping behaviors ported from
/root/reference/test/collection_grouping_test.cpp — _group_found sorting,
best-hit group ordering, empty/comma group values."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture()
def sized():
    c = Collection("gm_size", [Field("title", "string"),
                               Field("size", "int32", facet=True),
                               Field("points", "int32")],
                   default_sorting_field="points")
    i = 0
    for size, n in ((10, 7), (12, 3), (11, 2)):
        for _ in range(n):
            c.add({"id": str(i), "title": f"shoe {i}", "size": size,
                   "points": i})
            i += 1
    return c


def test_sorting_on_group_count_desc(sized):
    """SortingOnGroupCount (collection_grouping_test.cpp:826)."""
    res = sized.search({"q": "*", "group_by": "size", "group_limit": 2,
                        "sort_by": "_group_found:desc", "per_page": 50})
    assert res["found_docs"] == 12
    assert res["found"] == 3
    gh = res["grouped_hits"]
    assert [g["group_key"][0] for g in gh] == [10, 12, 11]
    assert [g["found"] for g in gh] == [7, 3, 2]


def test_sorting_on_group_count_asc(sized):
    res = sized.search({"q": "*", "group_by": "size", "group_limit": 2,
                        "sort_by": "_group_found:asc", "per_page": 50})
    gh = res["grouped_hits"]
    assert [g["found"] for g in gh] == [2, 3, 7]


def test_use_highest_value_in_group_for_ordering():
    """UseHighestValueInGroupForOrdering (…:563): a group ranks by its BEST
    member."""
    c = Collection("gm_best", [Field("title", "string"),
                               Field("group", "string", facet=True),
                               Field("points", "int32")],
                   default_sorting_field="points")
    # group "249" holds the best doc (300) and a weak one; "250" mid
    c.add({"id": "0", "title": "a", "group": "249", "points": 300})
    c.add({"id": "1", "title": "b", "group": "250", "points": 200})
    c.add({"id": "2", "title": "c", "group": "249", "points": 100})
    res = c.search({"q": "*", "group_by": "group", "group_limit": 10,
                    "sort_by": "points:desc"})
    gh = res["grouped_hits"]
    assert gh[0]["group_key"] == ["249"]
    assert len(gh[0]["hits"]) == 2
    assert gh[1]["group_key"] == ["250"]


def test_group_by_with_empty_value():
    """GroupByWithEmptyValue (…:1546): empty strings are valid group keys."""
    c = Collection("gm_empty", [Field("product_id", "string"),
                                Field("categories", "string[]",
                                      facet=True, optional=True)])
    c.add({"id": "0", "product_id": "a", "categories": ["shoes"]})
    c.add({"id": "1", "product_id": "b", "categories": [""]})
    c.add({"id": "2", "product_id": "c", "categories": [""]})
    res = c.search({"q": "*", "group_by": "categories", "group_limit": 3})
    assert res["found_docs"] == 3
    keys = {tuple(g["group_key"][0]) if isinstance(g["group_key"][0], list)
            else g["group_key"][0] for g in res["grouped_hits"]}
    assert any("" in (k if isinstance(k, tuple) else (k,)) for k in keys)


def test_group_by_with_comma_value():
    """GroupByWithCommaValue (…:1585)."""
    c = Collection("gm_comma", [Field("product_id", "string"),
                                Field("categories", "string[]",
                                      facet=True)])
    c.add({"id": "0", "product_id": "a",
           "categories": ["air force, one"]})
    c.add({"id": "1", "product_id": "b",
           "categories": ["air force, one"]})
    c.add({"id": "2", "product_id": "c", "categories": ["jordan"]})
    res = c.search({"q": "*", "group_by": "categories", "group_limit": 3})
    assert res["found_docs"] == 3
    found_by_key = {}
    for g in res["grouped_hits"]:
        k = g["group_key"][0]
        k = tuple(k) if isinstance(k, list) else k
        found_by_key[k] = len(g["hits"])
    assert found_by_key.get(("air force, one",),
                            found_by_key.get("air force, one")) == 2
