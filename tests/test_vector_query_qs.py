"""Multi-query vector search: `queries:[..]` + `query_weights:[..]` in
vector_query embed each string with the field's model and weight-average
the vectors (reference: vector_query_ops.cpp:206-298 parsing,
collection.cpp:8032-8092 weighted embedding; TestVectorQueryQs family in
collection_vector_search_test.cpp)."""

import os

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field
from typesense_tpu.search.vector_query import parse_vector_query

CKPT = os.path.join(
    os.path.dirname(__import__("typesense_tpu.models.embedder",
                               fromlist=["x"]).__file__),
    "checkpoints", "ts_ts-mini.npz")


# ---------- parsing (no model needed) ----------

def test_parse_queries_list():
    vq = parse_vector_query("emb:([], queries: [snake, lizard], k: 5)",
                            is_wildcard_query=False)
    assert vq.queries == ["snake", "lizard"]
    assert vq.k == 5


def test_parse_queries_with_backticked_commas():
    vq = parse_vector_query(
        "emb:([], queries: [`a, b`, plain], k: 5)", is_wildcard_query=False)
    assert vq.queries == ["a, b", "plain"]


def test_parse_query_weights():
    vq = parse_vector_query(
        "emb:([], queries: [a, b], query_weights: [0.7, 0.3])",
        is_wildcard_query=False)
    assert vq.query_weights == [0.7, 0.3]


def test_weights_length_mismatch_rejected():
    with pytest.raises(BadRequest, match="same length"):
        parse_vector_query(
            "emb:([], queries: [a, b], query_weights: [1.0])",
            is_wildcard_query=False)


def test_weights_must_sum_to_one():
    with pytest.raises(BadRequest, match="sum to 1.0"):
        parse_vector_query(
            "emb:([], queries: [a, b], query_weights: [0.7, 0.7])",
            is_wildcard_query=False)


def test_weights_not_floats_rejected():
    with pytest.raises(BadRequest, match="list of floats"):
        parse_vector_query(
            "emb:([], queries: [a, b], query_weights: [x, y])",
            is_wildcard_query=False)


def test_queries_not_list_rejected():
    with pytest.raises(BadRequest, match="list of strings"):
        parse_vector_query("emb:([], queries: snake)",
                           is_wildcard_query=False)


def test_explicit_vector_plus_params_still_parse():
    vq = parse_vector_query("emb:([0.1, 0.2], k: 3, alpha: 0.4)",
                            is_wildcard_query=False)
    assert vq.values == [pytest.approx(0.1), pytest.approx(0.2)]
    assert vq.alpha == pytest.approx(0.4)


def test_parse_image_param():
    vq = parse_vector_query("emb:([], image: aGVsbG8=)",
                            is_wildcard_query=False)
    assert vq.image_query == "aGVsbG8="


# ---------- end-to-end with the shipped checkpoint ----------

needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="ts-mini checkpoint not built")


@pytest.fixture(scope="module")
def qc():
    c = Collection("qsvec", [
        Field("title", "string"),
        Field("emb", "float[]", embed={
            "from": ["title"],
            "model_config": {"model_name": "ts/ts-mini"}}),
    ])
    c.add({"id": "0", "title": "chicken casserole"})
    c.add({"id": "1", "title": "bicycle repair"})
    c.add({"id": "2", "title": "happy student"})
    c._ensure_index()
    return c


@needs_ckpt
def test_queries_embed_and_average(qc):
    res = qc.search({"q": "*", "per_page": 3,
                     "vector_query":
                     "emb:([], queries: [poultry stew, chicken dinner], k: 3)"})
    assert res["hits"][0]["document"]["id"] == "0"


@needs_ckpt
def test_query_weights_skew_result(qc):
    # all weight on the vehicle query → vehicle doc wins despite the
    # second (weight-0) food query
    res = qc.search({"q": "*", "per_page": 3, "vector_query":
                     "emb:([], queries: [speedy vehicle fix, poultry stew],"
                     " query_weights: [1.0, 0.0], k: 3)"})
    assert res["hits"][0]["document"]["id"] == "1"


@needs_ckpt
def test_queries_match_manual_average(qc):
    from typesense_tpu.models.embedder import EmbedderManager
    enc = EmbedderManager().get({"model_name": "ts/ts-mini"})
    va, vb = enc.embed_batch(["glad pupil", "happy learner"])
    manual = (0.5 * np.asarray(va) + 0.5 * np.asarray(vb))
    r_manual = qc.search({"q": "*", "per_page": 3, "vector_query":
                          "emb:([" + ",".join(f"{x:.6f}" for x in manual) +
                          "], k: 3)"})
    r_qs = qc.search({"q": "*", "per_page": 3, "vector_query":
                      "emb:([], queries: [glad pupil, happy learner], k: 3)"})
    assert ([h["document"]["id"] for h in r_qs["hits"]] ==
            [h["document"]["id"] for h in r_manual["hits"]])
    assert r_qs["hits"][0]["document"]["id"] == "2"


def test_queries_on_plain_vector_field_rejected():
    c = Collection("plainvec", [Field("title", "string"),
                                Field("v", "float[]", num_dim=4)])
    c.add({"id": "0", "title": "x", "v": [0.1, 0.2, 0.3, 0.4]})
    with pytest.raises(BadRequest, match="auto-embedding"):
        c.search({"q": "*", "vector_query": "v:([], queries: [a], k: 1)"})


@needs_ckpt
def test_queries_override_explicit_values(qc):
    # reference collection.cpp:8032 applies a non-empty `queries` list
    # unconditionally, overwriting any explicit vector — an explicit
    # vehicle-ish vector must NOT survive when queries say food
    from typesense_tpu.models.embedder import EmbedderManager
    enc = EmbedderManager().get({"model_name": "ts/ts-mini"})
    bike = enc.embed_one("bicycle repair")
    vec = ",".join(f"{x:.6f}" for x in np.asarray(bike))
    res = qc.search({"q": "*", "per_page": 3, "vector_query":
                     "emb:([" + vec + "], queries: [poultry stew, "
                     "chicken dinner], k: 3)"})
    assert res["hits"][0]["document"]["id"] == "0"
