"""Vector/hybrid scenario family — reference
collection_vector_search_test.cpp: filtered kNN, distance thresholds,
cosine pre-normalization, hybrid rank fusion with alpha, embed-field
auto-query, vector query validation errors, k exactness vs a numpy oracle."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field

DIM = 16


@pytest.fixture(scope="module")
def vc():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    c = Collection("v", [Field("title", "string"),
                         Field("group", "string", facet=True),
                         Field("points", "int32"),
                         Field("emb", "float[]", num_dim=DIM)])
    for i in range(200):
        c.add({"id": str(i), "title": f"doc number {i}",
               "group": "even" if i % 2 == 0 else "odd",
               "points": i, "emb": vecs[i].tolist()})
    c._oracle = vecs
    return c


def vq(v, extra=""):
    return "emb:([" + ",".join(f"{x:.6f}" for x in v) + "]" + extra + ")"


def test_knn_matches_numpy_oracle(vc):
    q = vc._oracle[5] * 0.9 + vc._oracle[9] * 0.1
    res = vc.search({"q": "*", "vector_query": vq(q, ", k: 10"),
                     "per_page": 10})
    got = [int(h["document"]["id"]) for h in res["hits"]]
    oracle = np.argsort(vc._oracle @ q)[::-1][:10]
    assert got == [int(x) for x in oracle]


def test_vector_distance_reported_and_sorted(vc):
    q = vc._oracle[3]
    res = vc.search({"q": "*", "vector_query": vq(q, ", k: 5")})
    dists = [h["vector_distance"] for h in res["hits"]]
    assert dists == sorted(dists)
    assert dists[0] == pytest.approx(0.0, abs=1e-3)   # itself


def test_filtered_knn_respects_filter(vc):
    q = vc._oracle[8]
    res = vc.search({"q": "*", "vector_query": vq(q, ", k: 10"),
                     "filter_by": "group:=odd", "per_page": 10})
    ids = [int(h["document"]["id"]) for h in res["hits"]]
    assert all(i % 2 == 1 for i in ids)
    oracle = [int(i) for i in np.argsort(vc._oracle @ q)[::-1]
              if i % 2 == 1][:10]
    assert ids == oracle


def test_distance_threshold_trims(vc):
    q = vc._oracle[2]
    res = vc.search({"q": "*",
                     "vector_query": vq(q, ", k: 50, "
                                        "distance_threshold: 0.4")})
    assert all(h["vector_distance"] <= 0.4 + 1e-6 for h in res["hits"])
    assert res["found"] < 50


def test_hybrid_alpha_extremes(vc):
    # alpha 0.0 -> pure keyword ordering; alpha 1.0 -> pure vector
    q = vc._oracle[11]
    kw = vc.search({"q": "number 11", "query_by": "title",
                    "vector_query": vq(q, ", k: 20, alpha: 0.0"),
                    "prefix": "false", "num_typos": "0"})
    assert kw["hits"][0]["document"]["id"] == "11"
    vec = vc.search({"q": "number 11", "query_by": "title",
                     "vector_query": vq(q, ", k: 20, alpha: 1.0"),
                     "prefix": "false", "num_typos": "0"})
    assert vec["hits"][0]["document"]["id"] == "11"


def test_hybrid_fusion_combines_both(vc):
    # the vector points at 40, the text matches all docs ("number");
    # fused top hits must include 40 even though text rank is uniform
    q = vc._oracle[40]
    res = vc.search({"q": "number", "query_by": "title",
                     "vector_query": vq(q, ", k: 10, alpha: 0.8"),
                     "prefix": "false", "num_typos": "0", "per_page": 10})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert "40" in ids


def test_facets_over_vector_results(vc):
    q = vc._oracle[0]
    res = vc.search({"q": "*", "vector_query": vq(q, ", k: 20"),
                     "facet_by": "group", "per_page": 10})
    fc = {c["value"]: c["count"] for c in res["facet_counts"][0]["counts"]}
    assert sum(fc.values()) == res["found"]


def test_vector_query_validation(vc):
    with pytest.raises(BadRequest):
        vc.search({"q": "*", "vector_query": "nope:([0.1], k: 3)"})
    with pytest.raises(BadRequest):
        vc.search({"q": "*",
                   "vector_query": "emb:([0.1, 0.2], k: 3)"})  # wrong dim


def test_wrong_dim_document_rejected(vc):
    with pytest.raises(BadRequest):
        vc.add({"id": "bad", "title": "x", "group": "even", "points": 0,
                "emb": [0.1] * (DIM - 1)})


def test_pagination_of_vector_results(vc):
    q = vc._oracle[7]
    p1 = vc.search({"q": "*", "vector_query": vq(q, ", k: 30"),
                    "per_page": 10, "page": 1})
    p2 = vc.search({"q": "*", "vector_query": vq(q, ", k: 30"),
                    "per_page": 10, "page": 2})
    ids1 = [h["document"]["id"] for h in p1["hits"]]
    ids2 = [h["document"]["id"] for h in p2["hits"]]
    assert not set(ids1) & set(ids2)
    oracle = [str(int(x)) for x in np.argsort(vc._oracle @ q)[::-1][:20]]
    assert ids1 + ids2 == oracle
