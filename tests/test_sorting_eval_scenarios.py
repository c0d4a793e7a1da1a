"""Sorting behaviors ported from
/root/reference/test/collection_sorting_test.cpp — repeating-token ranking
(exact packed-score parity), text_match omission, _eval optional filtering."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_repeating_token_ranking():
    """RepeatingTokenRanking (collection_sorting_test.cpp:1800): the doc
    whose text is exactly the repeated query ranks first; the others tie
    and fall back to points desc. Packed text_match values must MATCH THE
    REFERENCE BIT FOR BIT (match_score.h:56-68 layout parity)."""
    c = Collection("rep", [Field("title", "string"),
                           Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "Mong Mong", "points": 100})
    c.add({"id": "1", "title": "Mong Spencer", "points": 200})
    c.add({"id": "2", "title": "Mong Mong Spencer", "points": 300})
    c.add({"id": "3", "title": "Spencer Mong Mong", "points": 400})
    res = c.search({"q": "mong mong", "query_by": "title",
                    "query_by_weights": "3", "prefix": "true",
                    "num_typos": "2",
                    "sort_by": "_text_match:desc,points:desc"})
    assert _ids(res) == ["0", "3", "2", "1"]
    scores = [h["text_match"] for h in res["hits"]]
    assert scores[0] == 1157451471583709209
    assert scores[1] == scores[2] == scores[3] == 1157451471575320601


def test_no_text_match_component_without_text_sort():
    """SortingDoesNotHaveTextMatchComponent (…:1857): with three explicit
    sort fields there is no text-match slot, so the response carries no
    text_match key."""
    c = Collection("notm", [Field("title", "string"),
                            Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "Test Title", "points": 100})
    res = c.search({"q": "test", "query_by": "title",
                    "sort_by": "points:desc,points:desc,points:desc"})
    assert len(res["hits"]) == 1
    assert "text_match" not in res["hits"][0]
    res = c.search({"q": "*",
                    "sort_by": "points:desc,points:desc,points:desc"})
    assert "text_match" not in res["hits"][0]


@pytest.fixture()
def brands():
    c = Collection("evalsort", [Field("title", "string"),
                                Field("brand", "string", infix=True),
                                Field("points", "int32")],
                   default_sorting_field="points")
    for i in range(5):
        c.add({"id": str(i), "title": f"Title {i}", "points": i,
               "brand": "Nike" if i in (0, 3) else "Adidas"})
    return c


def test_eval_sort_wildcard(brands):
    """OptionalFilteringViaSortingWildcard (…:2034)."""
    res = brands.search({"q": "*",
                         "sort_by": "_eval(brand:nike):desc,points:desc"})
    assert _ids(res) == ["3", "0", "4", "2", "1"]


def test_eval_sort_compound(brands):
    res = brands.search({"q": "*",
                         "sort_by": "_eval(brand:nike && points:0):desc,"
                                    "points:desc"})
    assert _ids(res) == ["0", "4", "3", "2", "1"]


def test_eval_sort_weighted(brands):
    """sort_by({brand:nike, points:1}, {2, 1}) — the weighted _eval list."""
    res = brands.search({"q": "*",
                         "sort_by": "_eval([(brand:nike):2, (points:1):1])"
                                    ":desc,points:desc"})
    assert _ids(res) == ["3", "0", "1", "4", "2"]


def test_eval_sort_no_matches(brands):
    res = brands.search({"q": "*",
                         "sort_by": "_eval(brand:foobar):desc,points:desc"})
    assert _ids(res) == ["4", "3", "2", "1", "0"]
