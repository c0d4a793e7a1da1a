"""Vector behaviors ported from
/root/reference/test/collection_vector_search_test.cpp — query by doc id,
upsert/update reindex, deletion, missing vectors under filters."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def vc():
    c = Collection("vms", [Field("title", "string"),
                           Field("points", "int32"),
                           Field("vec", "float[]", num_dim=3)],
                   default_sorting_field="points")
    vecs = [[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [0, 0, 1]]
    for i, v in enumerate(vecs):
        c.add({"id": str(i), "title": f"doc {i}", "points": i, "vec": v})
    return c


def test_vector_query_by_doc_id(vc):
    """VectorQueryByIDWithZeroValuedFloat (…:310): `vec:([], id: 0)` uses
    doc 0's stored vector as the query; the doc itself is excluded."""
    res = vc.search({"q": "*", "vector_query": "vec:([], id: 0)"})
    assert res["found"] >= 1
    assert _ids(res)[0] == "1"     # nearest neighbor of doc 0
    assert "0" not in _ids(res)


def test_vector_changed_upsert_reindexes(vc):
    """VectorChangedUpsert (…:409): after upserting a new vector the doc
    ranks by its NEW position."""
    vc.add({"id": "3", "title": "doc 3", "points": 3,
            "vec": [0.95, 0.05, 0]}, operation="upsert")
    res = vc.search({"q": "*",
                     "vector_query": "vec:([1, 0, 0], k: 4)"})
    assert _ids(res)[:3] == ["0", "3", "1"]


def test_vector_deletion_removes_from_index(vc):
    """VectorSearchTestDeletion (…:1072)."""
    vc.remove("1")
    res = vc.search({"q": "*", "vector_query": "vec:([1, 0, 0], k: 4)"})
    assert "1" not in _ids(res)
    assert _ids(res)[0] == "0"


def test_missing_vector_values_with_filtering():
    """VecSearchWithFilteringWithMissingVectorValues (…:930): docs without
    a vector never appear in kNN results but still filter/search."""
    c = Collection("vms2", [Field("title", "string"),
                            Field("points", "int32"),
                            Field("vec", "float[]", num_dim=3,
                                  optional=True)],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "has vec", "points": 1, "vec": [1, 0, 0]})
    c.add({"id": "1", "title": "no vec", "points": 2})
    res = c.search({"q": "*", "vector_query": "vec:([1, 0, 0], k: 5)"})
    assert _ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "points:>0"})
    assert set(_ids(res)) == {"0", "1"}


def test_num_vector_dims_must_match(vc):
    """NumVectorGreaterThanNumDim (…:712)."""
    with pytest.raises(TypesenseError):
        vc.add({"id": "9", "title": "bad", "points": 9,
                "vec": [1, 0, 0, 0, 0]})
    with pytest.raises(TypesenseError):
        vc.search({"q": "*", "vector_query": "vec:([1, 0], k: 2)"})


def test_vector_partial_update_keeps_vector(vc):
    """VectorPartialUpdate (…:644): updating an unrelated field keeps the
    stored vector searchable."""
    vc.add({"id": "2", "title": "renamed"}, operation="update")
    res = vc.search({"q": "*", "vector_query": "vec:([0, 1, 0], k: 2)"})
    assert _ids(res)[0] == "2"
    assert vc.get("2")["title"] == "renamed"


def test_rerank_hybrid_matches():
    """rerank_hybrid_matches (index.cpp:4234 compute_aux_scores): keyword
    hits outside the kNN list still get exact vector distances."""
    c = Collection("vh_rerank", [Field("title", "string"),
                                 Field("v", "float[]", num_dim=4)])
    c.add({"id": "0", "title": "alpha beta", "v": [1, 0, 0, 0]})
    c.add({"id": "1", "title": "alpha gamma", "v": [0, 1, 0, 0]})
    c.add({"id": "2", "title": "unrelated words", "v": [0.95, 0.05, 0, 0]})
    params = {"q": "alpha", "query_by": "title",
              "vector_query": "v:([1,0,0,0], k:1)", "prefix": "false",
              "num_typos": "0", "rerank_hybrid_matches": "true"}
    res = c.search(params)
    by_id = {h["document"]["id"]: h for h in res["hits"]}
    # doc 1 is keyword-only (kNN k=1 returns doc 0 or 2) but still carries
    # an exact vector_distance when reranking is on
    assert "vector_distance" in by_id["1"]
    assert abs(by_id["1"]["vector_distance"] - 1.0) < 1e-3
    res2 = c.search({**params, "rerank_hybrid_matches": "false"})
    by_id2 = {h["document"]["id"]: h for h in res2["hits"]}
    assert "vector_distance" not in by_id2.get("1", {})
