"""ts/clip-mini: the shipped from-scratch CLIP checkpoint (text + vision
towers trained jointly by models/train_clip.py) must load with REAL weights
by default and power image search end-to-end — the reference instead
auto-downloads pretrained CLIP ONNX by MD5 at runtime
(image_embedder.h, embedder_manager.h:36-60); this image has no egress, so
we ship genuinely trained weights the way ts-mini does for text.

Also asserts _clip_text_forward parity against transformers CLIPModel
.get_text_features on a randomly initialized tiny config (the text-tower
analogue of test_clip_convert.py's vision parity).
"""

import base64
import io
import random

import numpy as np
import pytest

from typesense_tpu.models.embedder import EmbedderManager


@pytest.fixture(scope="module")
def mgr():
    return EmbedderManager()


def _b64(img) -> str:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_clip_mini_ships_real_weights(mgr):
    txt = mgr.get({"model_name": "ts/clip-mini"})
    img = mgr.get_image({"model_name": "ts/clip-mini"})
    assert txt._arch == "clip_text" and txt.tokenizer is not None
    assert img._clip, "vision tower fell back to the seeded stand-in"
    assert txt.num_dim == img.num_dim == 128


def test_clip_mini_cross_modal_retrieval(mgr):
    """16 drawn (color, shape, background) images vs their captions:
    the learned joint space must align them far above 1/16 chance."""
    from typesense_tpu.models.train_clip import (caption, draw_image,
                                                 sample_concept)
    txt = mgr.get({"model_name": "ts/clip-mini"})
    img = mgr.get_image({"model_name": "ts/clip-mini"})
    rng = random.Random(99)
    pairs = [sample_concept(rng) for _ in range(16)]
    iv = img.embed_images_base64(
        [_b64(draw_image(c, s, b, rng)) for c, s, b in pairs])
    tv = txt.embed_batch([caption(c, s, b, rng) for c, s, b in pairs])
    sim = iv @ tv.T
    acc = float((sim.argmax(1) == np.arange(len(pairs))).mean())
    assert acc >= 0.5, f"cross-modal retrieval acc {acc} (chance 0.0625)"


def test_clip_mini_synonym_transfer(mgr):
    """Synonyms appear only in training captions, never in pixels: the
    query 'crimson disc on azure' must rank a drawn red circle on blue
    above unrelated shapes — evidence of a semantic space, not token
    matching."""
    from typesense_tpu.models.train_clip import draw_image
    txt = mgr.get({"model_name": "ts/clip-mini"})
    img = mgr.get_image({"model_name": "ts/clip-mini"})
    rng = random.Random(7)
    concepts = [("red", "circle", "blue"), ("green", "square", "white"),
                ("yellow", "triangle", "black"), ("blue", "ring", "pink")]
    iv = img.embed_images_base64(
        [_b64(draw_image(c, s, b, rng)) for c, s, b in concepts])
    q = txt.embed_batch(["crimson disc on azure"])[0]
    assert int((iv @ q).argmax()) == 0


def test_image_search_end_to_end_default_checkpoint():
    """Full production path: `image` field + embed-from field using
    ts/clip-mini (no models_dir override — the repo-shipped checkpoints
    load), then a HYBRID text query retrieves the matching image doc."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.models.train_clip import draw_image
    from typesense_tpu.schema.field import Field

    coll = Collection("shop", [
        Field("name", "string"),
        Field("img", "image", store=False),
        Field("emb", "float[]", embed={
            "from": ["img"],
            "model_config": {"model_name": "ts/clip-mini"}})])
    rng = random.Random(3)
    items = [("0", "item a", ("red", "circle", "blue")),
             ("1", "item b", ("green", "square", "white")),
             ("2", "item c", ("yellow", "stripe", "black")),
             ("3", "item d", ("purple", "diamond", "gray"))]
    for did, name, (c, s, b) in items:
        coll.add({"id": did, "name": name,
                  "img": _b64(draw_image(c, s, b, rng))})

    # q embeds through the ts/clip-mini TEXT tower; emb vectors came from
    # the VISION tower — retrieval works only if the towers share a space
    res = coll.search({"q": "scarlet disc", "query_by": "emb",
                       "per_page": 4})
    assert res["found"] >= 1
    assert res["hits"][0]["document"]["id"] == "0"

    res2 = coll.search({"q": "emerald box", "query_by": "emb",
                        "per_page": 4})
    assert res2["hits"][0]["document"]["id"] == "1"


def test_in_query_image_param_clip_mini():
    """vector_query `image:` param (vector_query_ops.cpp): a base64 image
    in the query embeds through the vision tower and matches like-images."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.models.train_clip import draw_image
    from typesense_tpu.schema.field import Field

    coll = Collection("pics", [
        Field("img", "image", store=False),
        Field("emb", "float[]", embed={
            "from": ["img"],
            "model_config": {"model_name": "ts/clip-mini"}})])
    rng = random.Random(11)
    coll.add({"id": "red", "img": _b64(draw_image("red", "circle", "white",
                                                  rng))})
    coll.add({"id": "blk", "img": _b64(draw_image("black", "cross", "pink",
                                                  rng))})
    probe = _b64(draw_image("red", "circle", "white", rng))
    res = coll.search({"q": "*",
                       "vector_query": f"emb:([], image: {probe}, k: 2)"})
    assert res["hits"][0]["document"]["id"] == "red"


def test_clip_text_forward_parity_vs_transformers(tmp_path):
    """convert_clip_text_state_dict + _clip_text_forward reproduce
    transformers CLIPModel.get_text_features (normalized) bit-closely."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    from typesense_tpu.models.convert import convert_clip_text_state_dict
    from typesense_tpu.models.embedder import TextEncoder

    vocab = ["[PAD]", "[BOS]", "[EOS]", "[UNK]"] + [f"t{i}"
                                                    for i in range(40)]
    cfg = transformers.CLIPConfig.from_text_vision_configs(
        text_config=transformers.CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=12, bos_token_id=1, eos_token_id=2),
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=128, image_size=32, patch_size=16),
        projection_dim=48)
    torch.manual_seed(5)
    model = transformers.CLIPModel(cfg).eval()

    arrays = convert_clip_text_state_dict(
        model.state_dict(), n_heads=2, vocab=vocab, bos_id=1, eos_id=2,
        unk_id=3, precision="f32")
    np.savez_compressed(str(tmp_path / "ts_txtclip.npz"), **arrays)
    enc = TextEncoder("ts/txtclip", models_dir=str(tmp_path))
    assert enc._arch == "clip_text" and enc.num_dim == 48

    texts = ["t1 t5 t9", "t20 t3"]
    got = enc.embed_batch(texts)

    ids = torch.zeros((2, 12), dtype=torch.long)
    eos_pos = torch.zeros(2, dtype=torch.long)
    for i, t in enumerate(texts):
        row = [1] + [vocab.index(w) for w in t.split()] + [2]
        ids[i, :len(row)] = torch.tensor(row)
        eos_pos[i] = len(row) - 1
    with torch.no_grad():
        # pool at the EOS position explicitly (train_clip.text_feats does
        # the same): with eos_token_id==2 transformers falls back to the
        # legacy OpenAI `input_ids.argmax(-1)` rule, which only equals the
        # EOS position when EOS is the LARGEST vocab id (true for public
        # CLIP BPE vocabs, false for this synthetic one)
        out = model.text_model(input_ids=ids,
                               attention_mask=(ids != 0).long())
        pooled = out.last_hidden_state[torch.arange(2), eos_pos]
        ref = model.text_projection(pooled).numpy()
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    np.testing.assert_allclose(got, ref, atol=3e-4)
