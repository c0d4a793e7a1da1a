"""The shipped ts/ts-mini checkpoint carries GENUINELY LEARNED semantics
(models/train_encoder.py: from-scratch contrastive training over a
synonym-clustered corpus; reference equivalent: pretrained ONNX text
embedders, /root/reference/include/text_embedder.h:4-51).

The key assertion: texts sharing MEANING but ZERO surface tokens embed
close — impossible for the hash-tokenize + seeded-weights fallback."""

import numpy as np
import pytest

from typesense_tpu.models.embedder import EmbedderManager

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("os").path.join(
            __import__("os").path.dirname(
                __import__("typesense_tpu.models.embedder",
                           fromlist=["x"]).__file__),
            "checkpoints", "ts_ts-mini.npz")),
    reason="ts-mini checkpoint not built")


@pytest.fixture(scope="module")
def enc():
    return EmbedderManager().get({"model_name": "ts/ts-mini"})


def _sim(enc, a, b):
    va, vb = enc.embed_batch([a, b])
    return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))


def test_checkpoint_loads_real_weights(enc):
    assert enc.tokenizer is not None, "WordPiece vocab missing — fell back"
    assert enc.num_dim == 128


def test_synonyms_embed_close_zero_token_overlap(enc):
    # disjoint surface forms, same concepts
    pairs = [("poultry stew", "chicken casserole"),
             ("quick automobile repair", "speedy vehicle fix"),
             ("glad pupil", "happy student"),
             ("frigid breeze", "chilly gust")]
    unrelated = [("poultry stew", "bicycle repair"),
                 ("glad pupil", "frigid gust"),
                 ("quick automobile repair", "moon blossom"),
                 ("chilly gust", "happy student")]
    pos = [_sim(enc, a, b) for a, b in pairs]
    neg = [_sim(enc, a, b) for a, b in unrelated]
    assert min(pos) > max(neg), (pos, neg)
    assert min(pos) > 0.6, pos


def test_semantic_hybrid_search_end_to_end(enc):
    """A semantic query with no token overlap retrieves the right doc
    through the auto-embedding + vector path."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    c = Collection("sem", [
        Field("title", "string"),
        Field("emb", "float[]", embed={
            "from": ["title"],
            "model_config": {"model_name": "ts/ts-mini"}}),
    ])
    c.add({"id": "0", "title": "chicken casserole"})
    c.add({"id": "1", "title": "bicycle repair"})
    c.add({"id": "2", "title": "happy student"})
    res = c.search({"q": "poultry stew", "query_by": "emb",
                    "per_page": 1})
    assert res["hits"][0]["document"]["id"] == "0"
    res = c.search({"q": "glad pupil", "query_by": "emb", "per_page": 1})
    assert res["hits"][0]["document"]["id"] == "2"


def test_jax_forward_matches_torch(tmp_path):
    """Parity of the shipped npz against a fresh torch forward (the same
    contract test_embed_convert.py asserts for converted HF models) —
    guarded to the HF model dir produced by the trainer when present."""
    import os
    hf_dir = "/tmp/ts_mini_model"
    if not os.path.exists(os.path.join(hf_dir, "config.json")):
        pytest.skip("trainer HF dir not present")
    import torch
    from transformers import BertModel, BertTokenizerFast
    model = BertModel.from_pretrained(hf_dir).eval()
    tok = BertTokenizerFast.from_pretrained(hf_dir)
    enc2 = EmbedderManager().get({"model_name": "ts/ts-mini"})
    texts = ["poultry stew", "quick automobile repair"]
    ours = enc2.embed_batch(texts)
    with torch.no_grad():
        t = tok(texts, padding=True, return_tensors="pt")
        out = model(**t).last_hidden_state
        m = t["attention_mask"].unsqueeze(-1).float()
        ref = ((out * m).sum(1) / m.sum(1)).numpy()
        ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    ours = ours / np.linalg.norm(ours, axis=1, keepdims=True)
    cos = (ours * ref).sum(axis=1)
    assert (cos > 0.995).all(), cos
