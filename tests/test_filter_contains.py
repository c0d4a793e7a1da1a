"""String filter completeness: CONTAINS (bare colon), CONTAINS_PHRASE
(quoted), trailing-* prefix, mixed arrays, and `id:` filters — mirroring
reference scenarios from test/collection_filtering_test.cpp and the
comparators in include/filter.h:17-27 / src/filter.cpp:675-726."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


@pytest.fixture(scope="module")
def coll():
    c = Collection("books", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("points", "int32"),
    ])
    rows = [
        ("0", "shoes for running fast", ["sport", "new arrival"], 10),
        ("1", "blue suede shoes", ["casual"], 20),
        ("2", "running belt", ["sport gear"], 30),
        ("3", "leather boots", ["formal", "leather goods"], 40),
        ("4", "fast shoes for walking", ["casual", "sport"], 50),
    ]
    for i, title, tags, pts in rows:
        c.add({"id": i, "title": title, "tags": tags, "points": pts})
    return c


def search(coll, filter_by, q="*"):
    return coll.search({"q": q, "query_by": "title", "filter_by": filter_by,
                        "per_page": 20})


def test_contains_single_token(coll):
    res = search(coll, "title: shoes")
    assert ids(res) == ["0", "1", "4"]


def test_contains_multi_token_is_and(coll):
    # CONTAINS tokenizes and intersects, no order requirement
    res = search(coll, "title: running shoes")
    assert ids(res) == ["0"]
    res = search(coll, "title: shoes fast")
    assert ids(res) == ["0", "4"]


def test_contains_phrase_requires_adjacency(coll):
    res = search(coll, 'title: "running fast"')
    assert ids(res) == ["0"]
    res = search(coll, 'title: "fast running"')
    assert ids(res) == []
    res = search(coll, 'title: "shoes for"')
    assert ids(res) == ["0", "4"]


def test_contains_prefix_star(coll):
    res = search(coll, "title: runn*")
    assert ids(res) == ["0", "2"]
    res = search(coll, "title: fast runn*")
    assert ids(res) == ["0"]


def test_exact_equals_still_whole_value(coll):
    res = search(coll, "title:= blue suede shoes")
    assert ids(res) == ["1"]
    res = search(coll, "title:= shoes")
    assert ids(res) == []


def test_contains_on_array_field(coll):
    res = search(coll, "tags: sport")
    # token-level: matches "sport" and "sport gear"
    assert ids(res) == ["0", "2", "4"]
    res = search(coll, 'tags: "new arrival"')
    assert ids(res) == ["0"]


def test_mixed_array_values(coll):
    # quoted phrase makes unquoted siblings EQUALS (filter.cpp:706-726)
    res = search(coll, 'tags: [casual, "leather goods"]')
    assert ids(res) == ["1", "3", "4"]


def test_not_equals_string(coll):
    res = search(coll, "title:!= blue suede shoes")
    assert ids(res) == ["0", "2", "3", "4"]


def test_id_filter(coll):
    res = search(coll, "id: [0, 3]")
    assert ids(res) == ["0", "3"]
    res = search(coll, "id:!= [0, 3]")
    assert ids(res) == ["1", "2", "4"]
    res = search(coll, "id: 2")
    assert ids(res) == ["2"]
    res = search(coll, "id: [0, 3] && points:>20")
    assert ids(res) == ["3"]


def test_contains_combines_with_numeric(coll):
    res = search(coll, "title: shoes && points:>=20")
    assert ids(res) == ["1", "4"]


def test_numeric_bare_colon_still_equality(coll):
    res = search(coll, "points: 30")
    assert ids(res) == ["2"]


def test_contains_keyword_query_combination(coll):
    res = coll.search({"q": "shoes", "query_by": "title",
                       "filter_by": "title: fast", "per_page": 20,
                       "num_typos": "0", "prefix": "false"})
    assert ids(res) == ["0", "4"]
