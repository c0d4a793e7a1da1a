"""String-sort missing_values config, ported from
/root/reference/test/collection_sorting_test.cpp
SortByStringEmptyValuesConfig{First,Second,Third}Field."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def coll():
    c = Collection("smv", [Field("title", "string", optional=True,
                                 sort=True),
                           Field("points1", "int32"),
                           Field("points2", "int32")],
                   default_sorting_field="points1")
    for i, t in enumerate(["alpha", "beta", None, "gamma"]):
        doc = {"id": str(i), "points1": 100, "points2": 100}
        if t is not None:
            doc["title"] = t
        c.add(doc)
    return c


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_missing_values_first(coll, direction):
    res = coll.search({"q": "*",
                       "sort_by": f"title(missing_values: first):"
                                  f"{direction}"})
    assert len(res["hits"]) == 4
    assert _ids(res)[0] == "2"


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_missing_values_last(coll, direction):
    res = coll.search({"q": "*",
                       "sort_by": f"title(missing_values: last):"
                                  f"{direction}"})
    assert len(res["hits"]) == 4
    assert _ids(res)[3] == "2"


def test_missing_values_default_largest(coll):
    """Without the arg, missing sorts as the LARGEST value (SQL-like):
    last under asc, first under desc."""
    res = coll.search({"q": "*", "sort_by": "title:asc"})
    assert _ids(res)[3] == "2"
    assert _ids(res)[:3] == ["0", "1", "3"]   # alpha beta gamma
    res = coll.search({"q": "*", "sort_by": "title:desc"})
    assert _ids(res)[0] == "2"
    assert _ids(res)[1:] == ["3", "1", "0"]


def test_missing_values_second_sort_field(coll):
    """SortByStringEmptyValuesConfigSecondField: config applies on a
    non-leading sort component (ties on points1 break by title)."""
    res = coll.search({"q": "*",
                       "sort_by": "points1:desc,"
                                  "title(missing_values: first):asc"})
    assert _ids(res)[0] == "2"
    res = coll.search({"q": "*",
                       "sort_by": "points1:desc,"
                                  "title(missing_values: last):asc"})
    assert _ids(res)[3] == "2"


def test_missing_values_third_sort_field(coll):
    res = coll.search({"q": "*",
                       "sort_by": "points1:desc,points2:desc,"
                                  "title(missing_values: first):asc"})
    assert _ids(res)[0] == "2"
    res = coll.search({"q": "*",
                       "sort_by": "points1:desc,points2:desc,"
                                  "title(missing_values: last):asc"})
    assert _ids(res)[3] == "2"
