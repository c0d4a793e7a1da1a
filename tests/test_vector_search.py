"""Vector + hybrid search tests (reference: collection_vector_search_test.cpp)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("vec", [
        Field("title", "string"),
        Field("vec", "float[]", num_dim=4),
        Field("points", "int32"),
    ], default_sorting_field="points")
    docs = [
        {"id": "0", "title": "red apple", "vec": [1, 0, 0, 0], "points": 1},
        {"id": "1", "title": "green apple", "vec": [0.9, 0.1, 0, 0], "points": 2},
        {"id": "2", "title": "blue sky", "vec": [0, 1, 0, 0], "points": 3},
        {"id": "3", "title": "red car", "vec": [0, 0, 1, 0], "points": 4},
    ]
    for d in docs:
        c.add(d)
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_pure_vector(coll):
    res = coll.search({"q": "*", "vector_query": "vec:([1, 0, 0, 0], k: 3)"})
    assert ids(res)[:2] == ["0", "1"]
    assert res["hits"][0]["vector_distance"] == pytest.approx(0.0, abs=1e-5)
    assert res["hits"][1]["vector_distance"] < res["hits"][2]["vector_distance"]


def test_vector_with_filter(coll):
    res = coll.search({"q": "*", "vector_query": "vec:([1, 0, 0, 0], k: 4)",
                       "filter_by": "points:>1"})
    assert "0" not in ids(res)
    assert ids(res)[0] == "1"


def test_vector_by_doc_id(coll):
    res = coll.search({"q": "*", "vector_query": "vec:([], id: 0, k: 3)"})
    assert "0" not in ids(res)       # self excluded
    assert ids(res)[0] == "1"


def test_distance_threshold(coll):
    res = coll.search({"q": "*",
                       "vector_query": "vec:([1, 0, 0, 0], k: 4, distance_threshold: 0.5)"})
    assert set(ids(res)) == {"0", "1"}


def test_hybrid(coll):
    # keyword 'apple' matches 0,1; vector favors 2 — fusion should surface all
    res = coll.search({"q": "apple", "query_by": "title", "prefix": "false",
                       "vector_query": "vec:([0, 1, 0, 0], k: 2, alpha: 0.5)"})
    got = ids(res)
    assert "2" in got and "0" in got and "1" in got
    # doc appearing in both lists should outrank vector-only rank-2 doc
    res2 = coll.search({"q": "apple", "query_by": "title", "prefix": "false",
                        "vector_query": "vec:([0.9, 0.1, 0, 0], k: 2, alpha: 0.5)"})
    assert ids(res2)[0] == "1"  # text rank + vector rank 1


def test_malformed_vector_query(coll):
    from typesense_tpu.core.errors import TypesenseError
    with pytest.raises(TypesenseError):
        coll.search({"q": "*", "vector_query": "vec:bad"})
    with pytest.raises(TypesenseError):
        coll.search({"q": "*", "vector_query": "vec:([1,0,0,0], alpha: 7)"})
