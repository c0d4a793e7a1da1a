"""CLIP vision conversion parity: transformers CLIPVisionModel ->
models/convert.convert_clip_state_dict -> embedder._clip_vision_forward
must reproduce the torch forward (pooled, projected, normalized) —
image_embedder.h's ONNX CLIP session, done the JAX way.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_clip():
    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16)
    torch.manual_seed(0)
    return transformers.CLIPVisionModel(cfg)


def test_clip_forward_parity(tiny_clip, tmp_path):
    from typesense_tpu.models.convert import convert_clip_state_dict
    from typesense_tpu.models.embedder import ImageEncoder

    arrays = convert_clip_state_dict(
        tiny_clip.state_dict(), n_heads=2, image_size=32, patch_size=16,
        precision="f32")
    path = str(tmp_path / "ts_tiny-clip.npz")
    np.savez_compressed(path, **arrays)

    enc = ImageEncoder("ts/tiny-clip", models_dir=str(tmp_path))
    assert enc._clip and enc.image_size == 32 and enc.num_dim == 64

    rng = np.random.default_rng(1)
    px = rng.random((2, 32, 32, 3)).astype(np.float32)

    # torch expects (B, C, H, W)
    with torch.no_grad():
        ref = tiny_clip(torch.tensor(px.transpose(0, 3, 1, 2)))
    ref_pooled = ref.pooler_output.numpy()           # post-LN class token
    ref_norm = ref_pooled / np.linalg.norm(ref_pooled, axis=1,
                                           keepdims=True)

    import jax.numpy as jnp
    got = np.asarray(enc._fwd(enc.params, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref_norm, atol=2e-4)


def test_clip_with_projection(tiny_clip, tmp_path):
    """visual_projection (CLIPModel checkpoints) maps to the shared
    text/image embedding space."""
    from typesense_tpu.models.convert import convert_clip_state_dict
    from typesense_tpu.models.embedder import ImageEncoder

    sd = dict(tiny_clip.state_dict())
    torch.manual_seed(1)
    proj = torch.nn.Linear(64, 48, bias=False)
    sd["visual_projection.weight"] = proj.weight.detach()
    arrays = convert_clip_state_dict(sd, n_heads=2, image_size=32,
                                     patch_size=16, precision="f32")
    np.savez_compressed(str(tmp_path / "ts_pclip.npz"), **arrays)
    enc = ImageEncoder("ts/pclip", models_dir=str(tmp_path))
    assert enc.num_dim == 48

    rng = np.random.default_rng(2)
    px = rng.random((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        pooled = tiny_clip(torch.tensor(px.transpose(0, 3, 1, 2))).pooler_output
        ref = proj(pooled).numpy()
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    import jax.numpy as jnp
    got = np.asarray(enc._fwd(enc.params, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_image_field_end_to_end_with_clip(tiny_clip, tmp_path):
    """An `image` field embeds through the converted CLIP checkpoint at
    index time and is searchable by vector query."""
    import base64
    import io

    from PIL import Image

    from typesense_tpu.models.convert import convert_clip_state_dict
    from typesense_tpu.models import embedder as emb_mod

    arrays = convert_clip_state_dict(
        tiny_clip.state_dict(), n_heads=2, image_size=32, patch_size=16,
        precision="f32")
    np.savez_compressed(str(tmp_path / "ts_clip-vit-b-p32.npz"), **arrays)

    def img_b64(color):
        img = Image.new("RGB", (32, 32), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field

    coll = Collection("imgs", [
        Field("img", "image", store=False),
        Field("emb", "float[]", embed={
            "from": ["img"],
            "model_config": {"model_name": "ts/clip-vit-b-p32"}})])
    coll.embedders = emb_mod.EmbedderManager(str(tmp_path))
    red, blue = img_b64((250, 10, 10)), img_b64((10, 10, 250))
    coll.add({"id": "r", "img": red})
    coll.add({"id": "b", "img": blue})

    enc = coll.embedders.get_image({"model_name": "ts/clip-vit-b-p32"})
    assert enc._clip  # real converted weights, not the seeded tower
    qv = enc.embed_images_base64([red])[0]
    res = coll.search({"q": "*", "vector_query":
                       "emb:([" + ",".join(f"{x:.5f}" for x in qv) +
                       "], k: 2)"})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids[0] == "r"
