"""Convert a HuggingFace BERT-family sentence-encoder checkpoint into the
engine's .npz layout (weights + WordPiece vocab + architecture meta).

Usage:
    python -m typesense_tpu.models.convert <hf_model_dir_or_name> <out.npz>

Reference contract: /root/reference/include/embedder_manager.h:36-60 — the
reference downloads MD5-verified public ONNX checkpoints (S-BERT/E-5/...)
into <data>/models. This environment has no network egress, so the
conversion runs wherever the checkpoint exists (one `transformers` download
at deploy time); the produced .npz drops into <data>/models/<name>.npz and
TextEncoder evaluates it on TPU via models/embedder.py:_bert_forward.
Numerical parity of forward + conversion is asserted against
transformers.BertModel in tests/test_embed_convert.py.
"""

from __future__ import annotations

import sys

import numpy as np


def convert_bert_state_dict(sd: dict, vocab_lines: list[str],
                            n_heads: int, lower: bool = True,
                            precision: str = "bf16") -> dict:
    """torch state_dict (BertModel layout) -> flat npz-ready dict."""
    def t(key):
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    out = {
        "arch": np.asarray("bert"),
        "precision": np.asarray(precision),
        "n_heads": np.asarray(n_heads, np.int32),
        "do_lower_case": np.asarray(1 if lower else 0, np.int32),
        "vocab": np.asarray("\n".join(vocab_lines)),
        "tok_emb": t("embeddings.word_embeddings.weight"),
        "pos_emb": t("embeddings.position_embeddings.weight"),
        "type_emb": t("embeddings.token_type_embeddings.weight"),
        "emb_ln_g": t("embeddings.LayerNorm.weight"),
        "emb_ln_b": t("embeddings.LayerNorm.bias"),
    }
    i = 0
    # torch nn.Linear stores (out, in); the engine's einsum "bld,de" wants
    # (in, out) -> transpose every projection
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"encoder.layer.{i}."
        out.update({
            f"blocks.{i}.wq": t(p + "attention.self.query.weight").T,
            f"blocks.{i}.bq": t(p + "attention.self.query.bias"),
            f"blocks.{i}.wk": t(p + "attention.self.key.weight").T,
            f"blocks.{i}.bk": t(p + "attention.self.key.bias"),
            f"blocks.{i}.wv": t(p + "attention.self.value.weight").T,
            f"blocks.{i}.bv": t(p + "attention.self.value.bias"),
            f"blocks.{i}.wo": t(p + "attention.output.dense.weight").T,
            f"blocks.{i}.bo": t(p + "attention.output.dense.bias"),
            f"blocks.{i}.ln1_g": t(p + "attention.output.LayerNorm.weight"),
            f"blocks.{i}.ln1_b": t(p + "attention.output.LayerNorm.bias"),
            f"blocks.{i}.w1": t(p + "intermediate.dense.weight").T,
            f"blocks.{i}.b1": t(p + "intermediate.dense.bias"),
            f"blocks.{i}.w2": t(p + "output.dense.weight").T,
            f"blocks.{i}.b2": t(p + "output.dense.bias"),
            f"blocks.{i}.ln2_g": t(p + "output.LayerNorm.weight"),
            f"blocks.{i}.ln2_b": t(p + "output.LayerNorm.bias"),
        })
        i += 1
    out["n_layers"] = np.asarray(i, np.int32)
    return out


def convert_hf(model_dir_or_name: str, out_path: str,
               precision: str = "bf16") -> str:
    """Load with transformers + torch (CPU) and write the .npz."""
    from transformers import AutoModel, AutoTokenizer
    model = AutoModel.from_pretrained(model_dir_or_name)
    tok = AutoTokenizer.from_pretrained(model_dir_or_name)
    vocab = tok.get_vocab()
    lines = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    sd = model.state_dict()
    # BertModel prefixes nothing; sentence-transformers exports may prefix
    # with "bert." — normalize
    if not any(k.startswith("embeddings.") for k in sd):
        sd = {k.split(".", 1)[1]: v for k, v in sd.items()
              if "." in k and k.split(".", 1)[1].startswith(
                  ("embeddings.", "encoder.", "pooler."))}
    arrays = convert_bert_state_dict(
        sd, lines, n_heads=model.config.num_attention_heads,
        lower=getattr(tok, "do_lower_case", True), precision=precision)
    np.savez_compressed(out_path, **arrays)
    return out_path


def convert_whisper_state_dict(sd: dict, vocab: list[str],
                               cfg: dict) -> dict:
    """torch state_dict (transformers WhisperForConditionalGeneration
    layout) -> models/voice.py .npz layout."""
    def t(key):
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    def has(key):
        return key in sd

    pre = "model." if has("model.encoder.conv1.weight") else ""
    out = {}
    # conv weights: torch Conv1d is (out, in, k) -> (k, in, out)
    out["enc.conv1.w"] = t(pre + "encoder.conv1.weight").transpose(2, 1, 0)
    out["enc.conv1.b"] = t(pre + "encoder.conv1.bias")
    out["enc.conv2.w"] = t(pre + "encoder.conv2.weight").transpose(2, 1, 0)
    out["enc.conv2.b"] = t(pre + "encoder.conv2.bias")
    out["enc.pos"] = t(pre + "encoder.embed_positions.weight")

    def attn(dst, src):
        out[f"{dst}.q.w"] = t(f"{src}.q_proj.weight").T
        out[f"{dst}.q.b"] = t(f"{src}.q_proj.bias")
        out[f"{dst}.k.w"] = t(f"{src}.k_proj.weight").T
        out[f"{dst}.v.w"] = t(f"{src}.v_proj.weight").T
        out[f"{dst}.v.b"] = t(f"{src}.v_proj.bias")
        out[f"{dst}.o.w"] = t(f"{src}.out_proj.weight").T
        out[f"{dst}.o.b"] = t(f"{src}.out_proj.bias")

    i = 0
    while has(pre + f"encoder.layers.{i}.self_attn.q_proj.weight"):
        p = pre + f"encoder.layers.{i}"
        attn(f"enc.{i}.attn", f"{p}.self_attn")
        out[f"enc.{i}.ln1.g"] = t(f"{p}.self_attn_layer_norm.weight")
        out[f"enc.{i}.ln1.b"] = t(f"{p}.self_attn_layer_norm.bias")
        out[f"enc.{i}.mlp.fc1.w"] = t(f"{p}.fc1.weight").T
        out[f"enc.{i}.mlp.fc1.b"] = t(f"{p}.fc1.bias")
        out[f"enc.{i}.mlp.fc2.w"] = t(f"{p}.fc2.weight").T
        out[f"enc.{i}.mlp.fc2.b"] = t(f"{p}.fc2.bias")
        out[f"enc.{i}.ln2.g"] = t(f"{p}.final_layer_norm.weight")
        out[f"enc.{i}.ln2.b"] = t(f"{p}.final_layer_norm.bias")
        i += 1
    n_enc = i
    out["enc.ln_post.g"] = t(pre + "encoder.layer_norm.weight")
    out["enc.ln_post.b"] = t(pre + "encoder.layer_norm.bias")

    out["dec.tok_emb"] = t(pre + "decoder.embed_tokens.weight")
    out["dec.pos"] = t(pre + "decoder.embed_positions.weight")
    i = 0
    while has(pre + f"decoder.layers.{i}.self_attn.q_proj.weight"):
        p = pre + f"decoder.layers.{i}"
        attn(f"dec.{i}.attn", f"{p}.self_attn")
        out[f"dec.{i}.ln1.g"] = t(f"{p}.self_attn_layer_norm.weight")
        out[f"dec.{i}.ln1.b"] = t(f"{p}.self_attn_layer_norm.bias")
        attn(f"dec.{i}.xattn", f"{p}.encoder_attn")
        out[f"dec.{i}.xln.g"] = t(f"{p}.encoder_attn_layer_norm.weight")
        out[f"dec.{i}.xln.b"] = t(f"{p}.encoder_attn_layer_norm.bias")
        out[f"dec.{i}.mlp.fc1.w"] = t(f"{p}.fc1.weight").T
        out[f"dec.{i}.mlp.fc1.b"] = t(f"{p}.fc1.bias")
        out[f"dec.{i}.mlp.fc2.w"] = t(f"{p}.fc2.weight").T
        out[f"dec.{i}.mlp.fc2.b"] = t(f"{p}.fc2.bias")
        out[f"dec.{i}.ln2.g"] = t(f"{p}.final_layer_norm.weight")
        out[f"dec.{i}.ln2.b"] = t(f"{p}.final_layer_norm.bias")
        i += 1
    n_dec = i
    out["dec.ln.g"] = t(pre + "decoder.layer_norm.weight")
    out["dec.ln.b"] = t(pre + "decoder.layer_norm.bias")

    d_a = out["enc.conv1.b"].shape[0]
    d_t = out["dec.tok_emb"].shape[1]
    out["cfg"] = np.asarray([
        out["enc.conv1.w"].shape[1], out["enc.pos"].shape[0], d_a,
        cfg["n_audio_head"], n_enc, out["dec.pos"].shape[0], d_t,
        cfg["n_text_head"], n_dec, out["dec.tok_emb"].shape[0],
        cfg["sot"], cfg["eot"], cfg.get("no_ts", -1),
        cfg.get("lang_en", -1), cfg.get("task_transcribe", -1),
    ], np.int64)
    out["vocab"] = np.asarray(vocab)
    return out


def convert_whisper(model_dir_or_name: str, out_path: str) -> str:
    """Local HF Whisper checkpoint -> models/voice.py .npz."""
    from transformers import WhisperForConditionalGeneration, WhisperTokenizer
    model = WhisperForConditionalGeneration.from_pretrained(model_dir_or_name)
    tok = WhisperTokenizer.from_pretrained(model_dir_or_name)
    vocab_map = tok.get_vocab()
    vocab = [""] * (max(vocab_map.values()) + 1)
    for s, i in vocab_map.items():
        vocab[i] = s
    c = model.config
    multilingual = "<|en|>" in vocab_map
    cfg = {
        "n_audio_head": c.encoder_attention_heads,
        "n_text_head": c.decoder_attention_heads,
        "sot": vocab_map.get("<|startoftranscript|>"),
        "eot": vocab_map.get("<|endoftext|>"),
        "no_ts": vocab_map.get("<|notimestamps|>", -1),
        "lang_en": vocab_map.get("<|en|>", -1) if multilingual else -1,
        "task_transcribe": vocab_map.get("<|transcribe|>", -1)
        if multilingual else -1,
    }
    arrays = convert_whisper_state_dict(model.state_dict(), vocab, cfg)
    np.savez_compressed(out_path, **arrays)
    return out_path


def convert_clip_state_dict(sd: dict, n_heads: int, image_size: int,
                            patch_size: int,
                            precision: str = "bf16") -> dict:
    """CLIPVisionModel state_dict -> flat npz dict for
    embedder._clip_vision_forward (reference: CLIP vision ONNX session,
    /root/reference/include/image_embedder.h)."""
    def t(key):
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    pfx = "vision_model."
    if not any(k.startswith(pfx) for k in sd):
        pfx = ""
    dim = t(pfx + "embeddings.class_embedding").shape[0]
    # Conv2d patch embedding (dim, 3, P, P) -> (P*P*3, dim) linear over
    # patches flattened (h, w, c) like the engine's patchify
    conv = t(pfx + "embeddings.patch_embedding.weight")
    lin = conv.transpose(2, 3, 1, 0).reshape(-1, dim)
    out = {
        "arch": np.asarray("clip_vision"),
        "precision": np.asarray(precision),
        "n_heads": np.asarray(n_heads, np.int32),
        "image_size": np.asarray(image_size, np.int32),
        "patch_size": np.asarray(patch_size, np.int32),
        "class_emb": t(pfx + "embeddings.class_embedding"),
        "patch_proj": lin,
        "pos_emb": t(pfx + "embeddings.position_embedding.weight"),
        "pre_ln_g": t(pfx + "pre_layrnorm.weight"),
        "pre_ln_b": t(pfx + "pre_layrnorm.bias"),
        "post_ln_g": t(pfx + "post_layernorm.weight"),
        "post_ln_b": t(pfx + "post_layernorm.bias"),
    }
    if "visual_projection.weight" in sd:
        out["visual_proj"] = t("visual_projection.weight").T
    i = 0
    while f"{pfx}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"{pfx}encoder.layers.{i}."
        out.update({
            f"blocks.{i}.wq": t(p + "self_attn.q_proj.weight").T,
            f"blocks.{i}.bq": t(p + "self_attn.q_proj.bias"),
            f"blocks.{i}.wk": t(p + "self_attn.k_proj.weight").T,
            f"blocks.{i}.bk": t(p + "self_attn.k_proj.bias"),
            f"blocks.{i}.wv": t(p + "self_attn.v_proj.weight").T,
            f"blocks.{i}.bv": t(p + "self_attn.v_proj.bias"),
            f"blocks.{i}.wo": t(p + "self_attn.out_proj.weight").T,
            f"blocks.{i}.bo": t(p + "self_attn.out_proj.bias"),
            f"blocks.{i}.ln1_g": t(p + "layer_norm1.weight"),
            f"blocks.{i}.ln1_b": t(p + "layer_norm1.bias"),
            f"blocks.{i}.w1": t(p + "mlp.fc1.weight").T,
            f"blocks.{i}.b1": t(p + "mlp.fc1.bias"),
            f"blocks.{i}.w2": t(p + "mlp.fc2.weight").T,
            f"blocks.{i}.b2": t(p + "mlp.fc2.bias"),
            f"blocks.{i}.ln2_g": t(p + "layer_norm2.weight"),
            f"blocks.{i}.ln2_b": t(p + "layer_norm2.bias"),
        })
        i += 1
    out["n_layers"] = np.asarray(i, np.int32)
    return out


def convert_clip_text_state_dict(sd: dict, n_heads: int, vocab: list[str],
                                 bos_id: int, eos_id: int, unk_id: int,
                                 precision: str = "bf16") -> dict:
    """CLIPTextModel state_dict (+ text_projection) -> flat npz dict for
    embedder._clip_text_forward. The vocab sidecar rides inside the npz the
    same way BERT checkpoints carry WordPiece (convert_hf)."""
    def t(key):
        return np.asarray(sd[key].detach().cpu().numpy(), np.float32)

    pfx = "text_model."
    if not any(k.startswith(pfx) for k in sd):
        pfx = ""
    out = {
        "arch": np.asarray("clip_text"),
        "precision": np.asarray(precision),
        "n_heads": np.asarray(n_heads, np.int32),
        "vocab": np.asarray("\n".join(vocab)),
        "bos_id": np.asarray(bos_id, np.int32),
        "eos_id": np.asarray(eos_id, np.int32),
        "unk_id": np.asarray(unk_id, np.int32),
        "tok_emb": t(pfx + "embeddings.token_embedding.weight"),
        "pos_emb": t(pfx + "embeddings.position_embedding.weight"),
        "final_ln_g": t(pfx + "final_layer_norm.weight"),
        "final_ln_b": t(pfx + "final_layer_norm.bias"),
        "text_proj": t("text_projection.weight").T,
    }
    i = 0
    while f"{pfx}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"{pfx}encoder.layers.{i}."
        out.update({
            f"blocks.{i}.wq": t(p + "self_attn.q_proj.weight").T,
            f"blocks.{i}.bq": t(p + "self_attn.q_proj.bias"),
            f"blocks.{i}.wk": t(p + "self_attn.k_proj.weight").T,
            f"blocks.{i}.bk": t(p + "self_attn.k_proj.bias"),
            f"blocks.{i}.wv": t(p + "self_attn.v_proj.weight").T,
            f"blocks.{i}.bv": t(p + "self_attn.v_proj.bias"),
            f"blocks.{i}.wo": t(p + "self_attn.out_proj.weight").T,
            f"blocks.{i}.bo": t(p + "self_attn.out_proj.bias"),
            f"blocks.{i}.ln1_g": t(p + "layer_norm1.weight"),
            f"blocks.{i}.ln1_b": t(p + "layer_norm1.bias"),
            f"blocks.{i}.w1": t(p + "mlp.fc1.weight").T,
            f"blocks.{i}.b1": t(p + "mlp.fc1.bias"),
            f"blocks.{i}.w2": t(p + "mlp.fc2.weight").T,
            f"blocks.{i}.b2": t(p + "mlp.fc2.bias"),
            f"blocks.{i}.ln2_g": t(p + "layer_norm2.weight"),
            f"blocks.{i}.ln2_b": t(p + "layer_norm2.bias"),
        })
        i += 1
    out["n_layers"] = np.asarray(i, np.int32)
    return out


def convert_clip(model_dir_or_name: str, out_path: str,
                 precision: str = "bf16") -> str:
    """Local HF CLIP checkpoint (CLIPModel or CLIPVisionModel) ->
    image-embedder .npz."""
    try:
        from transformers import CLIPModel
        model = CLIPModel.from_pretrained(model_dir_or_name)
        cfg = model.config.vision_config
    except Exception:  # noqa: BLE001 — vision-only checkpoints
        from transformers import CLIPVisionModel
        model = CLIPVisionModel.from_pretrained(model_dir_or_name)
        cfg = model.config
    arrays = convert_clip_state_dict(
        model.state_dict(), n_heads=cfg.num_attention_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        precision=precision)
    np.savez_compressed(out_path, **arrays)
    return out_path


def main():
    if len(sys.argv) == 4 and sys.argv[1] == "--whisper":
        print(f"wrote {convert_whisper(sys.argv[2], sys.argv[3])}")
        return
    if len(sys.argv) == 4 and sys.argv[1] == "--clip":
        print(f"wrote {convert_clip(sys.argv[2], sys.argv[3])}")
        return
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    path = convert_hf(sys.argv[1], sys.argv[2])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
