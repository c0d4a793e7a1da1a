"""Real-checkpoint pipeline parity: models/convert.py + the JAX BERT forward
must reproduce transformers.BertModel (mean-pooled, L2-normalized) and the
pure-Python WordPiece must match transformers.BertTokenizer token ids.

The environment has no network egress, so the assertions run against a
SYNTHETIC BertModel checkpoint (random weights, real architecture): any
deviation in key mapping, transposes, layernorm placement, gelu flavor,
masking, or pooling fails these tests — which is exactly what certifies
that a production all-MiniLM/e5 checkpoint converted with the same script
produces faithful embeddings on TPU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from typesense_tpu.models.convert import convert_bert_state_dict  # noqa: E402
from typesense_tpu.text.wordpiece import WordPieceTokenizer  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ing", "over",
         "lazy", "dog", "##gy", "run", "##ner", "!", ",", "a", "b", "c",
         "hello", "world", "un", "##believ", "##able"]

SENTS = ["The quick brown fox jumps over the lazy dog!",
         "hello world, hello runner",
         "unbelievable jumping doggy",
         "a b c a b c",
         "Hello WORLD"]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf")
    vf = d / "vocab.txt"
    vf.write_text("\n".join(VOCAB))
    tok = transformers.BertTokenizer(str(vf), do_lower_case=True)
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_act="gelu")
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    return tok, model, d


def test_wordpiece_matches_bert_tokenizer(tiny):
    tok, _, _ = tiny
    wp = WordPieceTokenizer.from_lines(VOCAB, lower=True, max_len=32)
    for s in SENTS:
        ours = wp.encode(s)
        ref = tok(s, padding="max_length", truncation=True, max_length=32,
                  return_tensors="np")["input_ids"][0].astype(np.int32)
        assert ours.tolist() == ref.tolist(), (s, ours, ref)


def test_forward_parity_vs_transformers(tiny, tmp_path):
    tok, model, _ = tiny
    arrays = convert_bert_state_dict(
        model.state_dict(), VOCAB, n_heads=2, lower=True, precision="f32")
    out = tmp_path / "models"
    out.mkdir()
    np.savez_compressed(out / "ts_parity-test.npz", **arrays)

    import typesense_tpu.models.embedder as emb
    # register the synthetic arch so the catalog accepts the name
    emb.BUILTIN_MODELS["ts/parity-test"] = (32, 2, 2, 2)
    enc = emb.TextEncoder("ts/parity-test", models_dir=str(out))
    assert enc.tokenizer is not None and enc.num_dim == 32

    ours = enc.embed_batch(SENTS, batch_size=8)

    batch = tok(SENTS, padding="max_length", truncation=True, max_length=64,
                return_tensors="pt")
    with torch.no_grad():
        hid = model(**batch).last_hidden_state
    m = batch["attention_mask"].unsqueeze(-1).float()
    ref = (hid * m).sum(1) / m.sum(1).clamp(min=1.0)
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()

    cos = np.sum(ours * ref, axis=1)
    assert np.all(cos > 0.999), cos
    # embeddings discriminate: different sentences differ
    assert np.dot(ours[0], ours[3]) < 0.99


def test_bf16_serving_precision(tiny, tmp_path):
    """The bf16 serving path stays close to the f32 reference (>0.99)."""
    tok, model, _ = tiny
    arrays = convert_bert_state_dict(
        model.state_dict(), VOCAB, n_heads=2, lower=True, precision="bf16")
    out = tmp_path / "models"
    out.mkdir()
    np.savez_compressed(out / "ts_parity-test.npz", **arrays)
    import typesense_tpu.models.embedder as emb
    emb.BUILTIN_MODELS["ts/parity-test"] = (32, 2, 2, 2)
    enc = emb.TextEncoder("ts/parity-test", models_dir=str(out))
    ours = enc.embed_batch(SENTS, batch_size=8)

    batch = tok(SENTS, padding="max_length", truncation=True, max_length=64,
                return_tensors="pt")
    with torch.no_grad():
        hid = model(**batch).last_hidden_state
    m = batch["attention_mask"].unsqueeze(-1).float()
    ref = (hid * m).sum(1) / m.sum(1).clamp(min=1.0)
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    cos = np.sum(ours * ref, axis=1)
    assert np.all(cos > 0.99), cos
