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


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    path = convert_hf(sys.argv[1], sys.argv[2])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
