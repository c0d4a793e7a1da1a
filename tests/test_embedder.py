"""Embedding subsystem tests: JAX text encoder, auto-embedding fields,
semantic + hybrid search (reference: collection_vector_search_test.cpp
embedding cases, text_embedder_test.cpp)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.models.embedder import (
    EmbedderManager, TextEncoder, hash_tokenize,
)
from typesense_tpu.schema.field import Field


def test_hash_tokenize_deterministic():
    a = hash_tokenize("hello world")
    b = hash_tokenize("hello world")
    assert (a == b).all()
    assert a[0] == 1 and a[3] == 1 and a[4] == 0  # CLS, SEP, padding


def test_encoder_shapes_and_determinism():
    enc = TextEncoder("ts/all-MiniLM-L6-v2")
    assert enc.num_dim == 384
    e1 = enc.embed_batch(["the quick brown fox", "hello world"])
    assert e1.shape == (2, 384)
    # L2 normalized
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-3)
    e2 = enc.embed_batch(["the quick brown fox", "hello world"])
    assert np.allclose(e1, e2, atol=1e-3)
    # identical text -> identical embedding regardless of batch position
    e3 = enc.embed_one("hello world")
    assert np.allclose(e1[1], e3, atol=1e-3)


def test_token_overlap_similarity():
    enc = TextEncoder("ts/all-MiniLM-L6-v2")
    e = enc.embed_batch([
        "chocolate cake with chocolate frosting",
        "chocolate cake with vanilla frosting",
        "quantum entanglement experiments",
    ])
    sim_close = float(e[0] @ e[1])
    sim_far = float(e[0] @ e[2])
    assert sim_close > sim_far


def test_manager_caches_models():
    m = EmbedderManager()
    a = m.get({"model_name": "ts/e5-small"})
    b = m.get({"model_name": "ts/e5-small"})
    assert a is b


def test_auto_embedding_field_and_semantic_search():
    c = Collection("docs", [
        Field("title", "string"),
        Field("emb", "float[]",
              embed={"from": ["title"],
                     "model_config": {"model_name": "ts/all-MiniLM-L6-v2"}}),
    ])
    c.add({"id": "0", "title": "chocolate fudge cake"})
    c.add({"id": "1", "title": "vanilla sponge cake"})
    c.add({"id": "2", "title": "quantum field theory"})

    # embeddings generated at index time
    res = c.search({"q": "chocolate cake", "query_by": "emb", "per_page": 3})
    got = [h["document"]["id"] for h in res["hits"]]
    assert got[0] == "0", got
    assert "vector_distance" in res["hits"][0]
    # the embedding was stored on the document
    assert len(c.docs[0]["emb"]) == 384


def test_hybrid_search_embed_field():
    c = Collection("docs", [
        Field("title", "string"),
        Field("emb", "float[]",
              embed={"from": ["title"],
                     "model_config": {"model_name": "ts/all-MiniLM-L6-v2"}}),
    ])
    c.add({"id": "0", "title": "chocolate fudge cake"})
    c.add({"id": "1", "title": "vanilla sponge cake"})
    c.add({"id": "2", "title": "chocolate icecream sundae"})
    res = c.search({"q": "chocolate cake", "query_by": "title,emb"})
    got = [h["document"]["id"] for h in res["hits"]]
    # keyword AND gives doc 0; hybrid keeps it first and pulls in neighbors
    assert got[0] == "0"
    assert len(got) >= 2


def test_image_encoder():
    import base64
    import io
    from PIL import Image
    import numpy as np
    from typesense_tpu.models.embedder import ImageEncoder

    def img_b64(color):
        im = Image.new("RGB", (32, 32), color)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    enc = ImageEncoder("ts/clip-vit-b-p32")
    e = enc.embed_images_base64([img_b64("red"), img_b64("red"),
                                 img_b64("blue")])
    assert e.shape == (3, 512)
    assert np.allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-3)
    assert np.allclose(e[0], e[1], atol=1e-3)          # identical images
    assert float(e[0] @ e[2]) < 0.999                   # different images


def test_image_field_auto_embed():
    import base64
    import io
    from PIL import Image
    from typesense_tpu.collection import Collection

    def img_b64(color):
        im = Image.new("RGB", (16, 16), color)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    c = Collection("imgs", [
        Field("photo", "image", index=False, optional=True),
        Field("emb", "float[]",
              embed={"from": ["photo"],
                     "model_config": {"model_name": "ts/clip-vit-b-p32"}}),
    ])
    c.add({"id": "0", "photo": img_b64("red")})
    c.add({"id": "1", "photo": img_b64("green")})
    c._ensure_index()
    assert len(c.docs[0]["emb"]) == 512
    # image similarity search by doc reference
    res = c.search({"q": "*", "vector_query": "emb:([], id: 0)"})
    assert [h["document"]["id"] for h in res["hits"]][0] == "1"
