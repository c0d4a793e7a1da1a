"""Local text embedding on TPU: a sentence-transformer-class encoder in pure
JAX, plus the embedder registry.

Reference contract: /root/reference/include/text_embedder.h:4-51 (ONNX
session + mean pooling), embedder_manager.h:36-60 (model registry keyed by
model name, `ts/` namespace for built-in public models). The TPU-native
design replaces the ONNX Runtime session with one jitted XLA program:
token-embedding gather -> N transformer blocks (bf16 matmuls on the MXU)
-> masked mean pooling -> L2 normalize, all fused by XLA.

Weights: real checkpoints load from `<data>/models/<name>.npz` when present
(same layout as state_dict keys below). Otherwise weights are derived
deterministically from the model name (seeded init) — the interface,
batching, and device path are identical either way, and token-overlap
similarity (a random-projection encoder is an LSH of the hashed bag of
tokens) keeps hybrid-search semantics exercisable end to end.
"""

from __future__ import annotations

import hashlib
import os
from functools import partial

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from typesense_tpu.core.errors import BadRequest

# built-in model catalog (embedder_manager.h public models list):
# name -> (dim, layers, heads, ff_mult)
BUILTIN_MODELS = {
    # genuine from-scratch contrastive encoder shipped with the repo
    # (models/train_encoder.py; checkpoint in models/checkpoints/)
    "ts/ts-mini": (128, 2, 4, 4),
    # from-scratch contrastive CLIP (models/train_clip.py; text+vision
    # checkpoints in models/checkpoints/) — image search runs with REAL
    # learned weights by default, like ts-mini does for text
    "ts/clip-mini": (128, 2, 4, 2),
    "ts/all-MiniLM-L12-v2": (384, 12, 6, 4),
    "ts/all-MiniLM-L6-v2": (384, 6, 6, 4),
    "ts/e5-small": (384, 6, 6, 4),
    "ts/e5-base": (768, 12, 12, 4),
    "ts/paraphrase-multilingual-mpnet-base-v2": (768, 12, 12, 4),
    "ts/clip-vit-b-p32": (512, 6, 8, 4),
}
DEFAULT_DIM = 384
VOCAB = 32768
MAX_LEN = 128
PAD_ID = 0


def _stable_hash(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "little")


def hash_tokenize(text: str, max_len: int = MAX_LEN) -> np.ndarray:
    """Hashing tokenizer: lowercase word pieces -> stable ids in [2, VOCAB).
    Replaces the reference's WordPiece/BPE files (text_embedder_tokenizer.h)
    with a vocabulary-free stable hash; real-checkpoint models may ship their
    own vocab (loaded from the .npz sidecar)."""
    from typesense_tpu.index.builder import fast_tokenize
    ids = [1]  # CLS
    for tok in fast_tokenize(text)[:max_len - 2]:
        ids.append(2 + _stable_hash(tok) % (VOCAB - 2))
    ids.append(1)
    out = np.full(max_len, PAD_ID, dtype=np.int32)
    out[:len(ids)] = ids[:max_len]
    return out


def _init_params(name: str, dim: int, layers: int, heads: int, ff_mult: int):
    """Deterministic init keyed by model name (seeded)."""
    seed = _stable_hash(name) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)

    def mat(*shape, scale=None):
        s = scale if scale is not None else (1.0 / np.sqrt(shape[0]))
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s,
                           jnp.bfloat16)

    params = {
        "tok_emb": mat(VOCAB, dim, scale=0.02),
        "pos_emb": mat(MAX_LEN, dim, scale=0.02),
        "blocks": [],
    }
    for _ in range(layers):
        params["blocks"].append({
            "wq": mat(dim, dim), "wk": mat(dim, dim), "wv": mat(dim, dim),
            "wo": mat(dim, dim),
            "w1": mat(dim, dim * ff_mult), "w2": mat(dim * ff_mult, dim),
            "ln1_g": jnp.ones(dim, jnp.float32),
            "ln1_b": jnp.zeros(dim, jnp.float32),
            "ln2_g": jnp.ones(dim, jnp.float32),
            "ln2_b": jnp.zeros(dim, jnp.float32),
        })
    return params


def _layer_norm(x, g, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _encoder_forward(params, token_ids, n_heads: int):
    """(B, L) int32 -> (B, dim) f32 L2-normalized embeddings. bf16 matmuls
    keep the FLOPs on the MXU; layernorm/softmax accumulate in f32."""
    B, L = token_ids.shape
    mask = (token_ids != PAD_ID)
    x = params["tok_emb"][token_ids] + params["pos_emb"][None, :L]
    neg = jnp.float32(-1e9)
    attn_bias = jnp.where(mask[:, None, None, :], 0.0, neg)

    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        dim = h.shape[-1]
        hd = dim // n_heads

        def proj(w):
            y = jnp.einsum("bld,de->ble", h, w,
                           preferred_element_type=jnp.float32)
            return y.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = proj(blk["wq"]), proj(blk["wk"]), proj(blk["wv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(hd) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v.astype(jnp.bfloat16))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        x = x + jnp.einsum("bld,de->ble", ctx, blk["wo"],
                           preferred_element_type=jnp.float32).astype(x.dtype)

        h2 = _layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        ff = jnp.einsum("bld,de->ble", h2, blk["w1"],
                        preferred_element_type=jnp.float32)
        ff = jax.nn.gelu(ff).astype(jnp.bfloat16)
        ff = jnp.einsum("bld,de->ble", ff, blk["w2"],
                        preferred_element_type=jnp.float32)
        x = x + ff.astype(x.dtype)

    # masked mean pooling (text_embedder.h mean_pooling) + L2 normalize
    m = mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / \
        jnp.maximum(jnp.sum(m, axis=1), 1.0)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


def _bert_forward(params, token_ids, n_heads: int):
    """Faithful HF BertModel forward (+ mean pooling + L2 normalize): the
    architecture real public checkpoints ship (all-MiniLM-*, e5-*, mpnet
    use this post-LN encoder — text_embedder.h:4-51 loads the same graphs
    via ONNX Runtime; here it is one XLA program). Parity vs
    transformers.BertModel is asserted in tests/test_embed_convert.py."""
    B, L = token_ids.shape
    mask = (token_ids != PAD_ID)
    dt = params["tok_emb"].dtype
    x = (params["tok_emb"][token_ids]
         + params["pos_emb"][None, :L]
         + params["type_emb"][None, None, 0])
    x = _layer_norm(x, params["emb_ln_g"], params["emb_ln_b"], eps=1e-12)
    neg = jnp.float32(-1e9)
    attn_bias = jnp.where(mask[:, None, None, :], 0.0, neg)

    for blk in params["blocks"]:
        dim = x.shape[-1]
        hd = dim // n_heads

        def proj(w, b):
            y = jnp.einsum("bld,de->ble", x, w,
                           preferred_element_type=jnp.float32) + b
            return y.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)

        q = proj(blk["wq"], blk["bq"])
        k = proj(blk["wk"], blk["bk"])
        v = proj(blk["wv"], blk["bv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(hd) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v.astype(dt))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        attn_out = jnp.einsum("bld,de->ble", ctx, blk["wo"],
                              preferred_element_type=jnp.float32) + blk["bo"]
        x = _layer_norm(x.astype(jnp.float32) + attn_out,
                        blk["ln1_g"], blk["ln1_b"], eps=1e-12).astype(dt)

        ff = jnp.einsum("bld,de->ble", x, blk["w1"],
                        preferred_element_type=jnp.float32) + blk["b1"]
        ff = jax.nn.gelu(ff, approximate=False).astype(dt)
        ff = jnp.einsum("bld,de->ble", ff, blk["w2"],
                        preferred_element_type=jnp.float32) + blk["b2"]
        x = _layer_norm(x.astype(jnp.float32) + ff,
                        blk["ln2_g"], blk["ln2_b"], eps=1e-12).astype(dt)

    m = mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / \
        jnp.maximum(jnp.sum(m, axis=1), 1.0)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


def _clip_text_forward(params, token_ids, n_heads: int, eos_id: int):
    """CLIP text tower (transformers CLIPTextTransformer layout): token+pos
    embed -> pre-LN blocks with CAUSAL attention and quick_gelu -> final LN
    -> hidden state at each sequence's EOS position -> text projection ->
    L2 normalize. Shares one embedding space with _clip_vision_forward
    (reference: the CLIP text ONNX session queries ride through,
    image_embedder.h CLIPImageEmbedder). Parity vs transformers.CLIPModel
    .get_text_features is asserted in tests/test_clip_mini.py."""
    B, L = token_ids.shape
    mask = (token_ids != PAD_ID)
    dt = params["tok_emb"].dtype
    x = params["tok_emb"][token_ids] + params["pos_emb"][None, :L]
    x = x.astype(dt)
    neg = jnp.float32(-1e9)
    causal = jnp.tril(jnp.ones((L, L), bool))
    ok = mask[:, None, None, :] & causal[None, None, :, :]
    attn_bias = jnp.where(ok, 0.0, neg)

    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"], eps=1e-5)
        dim = h.shape[-1]
        hd = dim // n_heads

        def proj(w, b):
            y = jnp.einsum("bld,de->ble", h, w,
                           preferred_element_type=jnp.float32) + b
            return y.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)

        q = proj(blk["wq"], blk["bq"])
        k = proj(blk["wk"], blk["bk"])
        v = proj(blk["wv"], blk["bv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(hd) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v.astype(dt))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        x = x + (jnp.einsum("bld,de->ble", ctx, blk["wo"],
                            preferred_element_type=jnp.float32)
                 + blk["bo"]).astype(x.dtype)
        h2 = _layer_norm(x, blk["ln2_g"], blk["ln2_b"], eps=1e-5)
        ff = jnp.einsum("bld,de->ble", h2, blk["w1"],
                        preferred_element_type=jnp.float32) + blk["b1"]
        ff = (ff * jax.nn.sigmoid(1.702 * ff)).astype(dt)   # quick_gelu
        ff = jnp.einsum("bld,de->ble", ff, blk["w2"],
                        preferred_element_type=jnp.float32) + blk["b2"]
        x = x + ff.astype(x.dtype)

    x = _layer_norm(x, params["final_ln_g"], params["final_ln_b"], eps=1e-5)
    eos_pos = jnp.argmax((token_ids == eos_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(B), eos_pos]
    pooled = jnp.einsum("bd,de->be", pooled.astype(dt), params["text_proj"],
                        preferred_element_type=jnp.float32)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


class _WordVocabTokenizer:
    """Whitespace word-level tokenizer for from-scratch CLIP checkpoints
    (the vocab rides inside the .npz; public CLIP ships BPE merges instead,
    which convert.py would carry the same way)."""

    def __init__(self, words: list[str], bos_id: int, eos_id: int,
                 unk_id: int, max_len: int):
        self.vocab = {w: i for i, w in enumerate(words)}
        self.bos_id, self.eos_id = bos_id, eos_id
        self.unk_id, self.max_len = unk_id, max_len

    def encode(self, text: str) -> np.ndarray:
        from typesense_tpu.index.builder import fast_tokenize
        ids = [self.bos_id]
        for tok in fast_tokenize(text)[:self.max_len - 2]:
            ids.append(self.vocab.get(tok, self.unk_id))
        ids.append(self.eos_id)
        out = np.full(self.max_len, PAD_ID, dtype=np.int32)
        out[:len(ids)] = ids[:self.max_len]
        return out


class TextEncoder:
    """One embedding model instance (TextEmbedder equivalent)."""

    def __init__(self, model_name: str, models_dir: str = ""):
        spec = BUILTIN_MODELS.get(model_name)
        if spec is None:
            safe = model_name.replace("/", "_")
            has_ckpt = models_dir and os.path.exists(
                os.path.join(models_dir, f"{safe}.npz"))
            if model_name.startswith("ts/") and not has_ckpt:
                raise BadRequest(f"Model `{model_name}` is not a supported "
                                 f"built-in embedding model.")
            spec = (DEFAULT_DIM, 6, 6, 4)
        dim, layers, heads, ff_mult = spec
        self.model_name = model_name
        self.num_dim = dim
        self.n_heads = heads
        self.tokenizer = None   # WordPiece when a real checkpoint is loaded
        self._arch = "bert"
        self.params = self._load_or_init(model_name, models_dir, dim, layers,
                                         heads, ff_mult)
        if self._arch == "clip_text":
            fwd = partial(_clip_text_forward, eos_id=self._eos_id)
        else:
            fwd = _bert_forward if self.tokenizer is not None \
                else _encoder_forward
        self._fwd = jax.jit(partial(fwd, n_heads=self.n_heads))

    def _load_or_init(self, name, models_dir, dim, layers, heads, ff_mult):
        safe = name.replace("/", "_")
        path = os.path.join(models_dir or "", f"{safe}.npz")
        if not (models_dir and os.path.exists(path)):
            # repo-shipped checkpoints (ts/ts-mini trained from scratch by
            # models/train_encoder.py — the reference instead downloads
            # pretrained ONNX at runtime, embedder_manager.h)
            pkg = os.path.join(os.path.dirname(__file__), "checkpoints",
                               f"{safe}.npz")
            if os.path.exists(pkg):
                models_dir, path = os.path.dirname(pkg), pkg
        if models_dir and os.path.exists(path):
            raw = np.load(path, allow_pickle=False)
            if "arch" in raw and str(raw["arch"]) == "bert":
                return self._load_bert(raw)
            if "arch" in raw and str(raw["arch"]) == "clip_text":
                return self._load_clip_text(raw)
            params = {"tok_emb": jnp.asarray(raw["tok_emb"], jnp.bfloat16),
                      "pos_emb": jnp.asarray(raw["pos_emb"], jnp.bfloat16),
                      "blocks": []}
            i = 0
            while f"blocks.{i}.wq" in raw:
                params["blocks"].append({
                    k: jnp.asarray(raw[f"blocks.{i}.{k}"],
                                   jnp.float32 if k.startswith("ln")
                                   else jnp.bfloat16)
                    for k in ("wq", "wk", "wv", "wo", "w1", "w2",
                              "ln1_g", "ln1_b", "ln2_g", "ln2_b")})
                i += 1
            return params
        return _init_params(name, dim, layers, heads, ff_mult)

    def _load_bert(self, raw):
        """Real checkpoint converted by models/convert.py: BERT weights +
        WordPiece vocab + arch meta (embedder_manager.h public models)."""
        from typesense_tpu.text.wordpiece import WordPieceTokenizer
        dt = jnp.float32 if str(raw["precision"]) == "f32" else jnp.bfloat16
        self.n_heads = int(raw["n_heads"])
        self.num_dim = int(raw["tok_emb"].shape[1])
        seq_len = min(MAX_LEN, int(raw["pos_emb"].shape[0]))
        self.tokenizer = WordPieceTokenizer.from_lines(
            str(raw["vocab"]).split("\n"),
            lower=bool(int(raw["do_lower_case"])), max_len=seq_len)
        params = {
            "tok_emb": jnp.asarray(raw["tok_emb"], dt),
            "pos_emb": jnp.asarray(raw["pos_emb"][:seq_len], dt),
            "type_emb": jnp.asarray(raw["type_emb"], dt),
            "emb_ln_g": jnp.asarray(raw["emb_ln_g"], jnp.float32),
            "emb_ln_b": jnp.asarray(raw["emb_ln_b"], jnp.float32),
            "blocks": [],
        }
        for i in range(int(raw["n_layers"])):
            params["blocks"].append({
                k: jnp.asarray(raw[f"blocks.{i}.{k}"],
                               jnp.float32 if k.startswith(("ln", "b"))
                               else dt)
                for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                          "w1", "b1", "w2", "b2",
                          "ln1_g", "ln1_b", "ln2_g", "ln2_b")})
        return params

    def _load_clip_text(self, raw):
        """CLIP text checkpoint (convert.convert_clip_text_state_dict):
        blocks in the CLIPEncoderLayer layout + final LN + text projection
        + a word-level vocab sidecar."""
        dt = jnp.float32 if str(raw["precision"]) == "f32" else jnp.bfloat16
        self._arch = "clip_text"
        self.n_heads = int(raw["n_heads"])
        self.num_dim = int(raw["text_proj"].shape[1])
        self._eos_id = int(raw["eos_id"])
        max_len = int(raw["pos_emb"].shape[0])
        self.tokenizer = _WordVocabTokenizer(
            str(raw["vocab"]).split("\n"), bos_id=int(raw["bos_id"]),
            eos_id=self._eos_id, unk_id=int(raw["unk_id"]), max_len=max_len)
        params = {
            "tok_emb": jnp.asarray(raw["tok_emb"], dt),
            "pos_emb": jnp.asarray(raw["pos_emb"], dt),
            "final_ln_g": jnp.asarray(raw["final_ln_g"], jnp.float32),
            "final_ln_b": jnp.asarray(raw["final_ln_b"], jnp.float32),
            "text_proj": jnp.asarray(raw["text_proj"], dt),
            "blocks": [],
        }
        for i in range(int(raw["n_layers"])):
            params["blocks"].append({
                k: jnp.asarray(raw[f"blocks.{i}.{k}"],
                               jnp.float32 if k.startswith(("ln", "b"))
                               else dt)
                for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                          "w1", "b1", "w2", "b2",
                          "ln1_g", "ln1_b", "ln2_g", "ln2_b")})
        return params

    def _token_ids(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            return self.tokenizer.encode(text)
        return hash_tokenize(text)

    def embed_batch(self, texts: list[str], batch_size: int = 32,
                    **_kw) -> np.ndarray:
        """Embed texts in fixed-size padded batches (one compiled program).
        Remote-embedding kwargs are accepted and ignored (local encoder)."""
        out = np.zeros((len(texts), self.num_dim), dtype=np.float32)
        for i in range(0, len(texts), batch_size):
            chunk = texts[i:i + batch_size]
            ids = np.stack([self._token_ids(t) for t in chunk])
            if len(chunk) < batch_size:
                pad = np.full((batch_size - len(chunk), ids.shape[1]), PAD_ID,
                              np.int32)
                pad[:, 0] = 1  # keep one real token so pooling is well-defined
                ids = np.concatenate([ids, pad])
            emb = np.asarray(self._fwd(self.params, jnp.asarray(ids)))
            out[i:i + len(chunk)] = emb[:len(chunk)]
        return out

    def embed_one(self, text: str, **_kw) -> np.ndarray:
        return self.embed_batch([text], batch_size=1)[0]


class RemoteEmbedder:
    """Base remote embedding client (text_embedder_remote.h:47-70):
    per-request timeout + bounded retries with exponential backoff, an LRU
    query cache, and provider subclasses for the request/response shapes.
    Network egress is environment-gated; errors surface as BadRequest.
    Search params `remote_embedding_timeout_ms` / `remote_embedding_num_tries`
    flow into embed_query (collection.h:238-239 defaults 30000 ms / 2)."""

    QUERY_CACHE_MAX = 100  # RemoteEmbedder::cache LRU size

    def __init__(self, model_config: dict):
        self.model_config = model_config
        self.model_name = model_config.get("model_name", "")
        self.api_key = model_config.get("api_key", "")
        self.num_dim = int(model_config.get("num_dim", 0) or 0)
        self._qcache: dict[str, np.ndarray] = {}

    # -- transport with retries (call_remote_api + num_try header) --------
    def _call(self, url: str, body: dict, headers: dict,
              timeout_ms: float, num_tries: int) -> dict:
        import json
        import time as _time
        import urllib.request
        data = json.dumps(body).encode()
        last_err = None
        for attempt in range(max(1, int(num_tries))):
            if attempt:
                _time.sleep(min(0.5 * (2 ** (attempt - 1)), 4.0))
            req = urllib.request.Request(
                url, data=data, method="POST",
                headers={"Content-Type": "application/json", **headers})
            try:
                with urllib.request.urlopen(
                        req, timeout=max(0.001, timeout_ms / 1000.0)) as resp:
                    return json.loads(resp.read().decode())
            except Exception as e:  # noqa: BLE001 — timeout / 5xx / network
                last_err = e
                code = getattr(e, "code", None)
                if code is not None and 400 <= code < 500 and code != 429:
                    break  # non-retryable client error
        raise BadRequest(f"Remote embedding request failed: {last_err}")

    # -- provider hooks ----------------------------------------------------
    def _embed_texts(self, texts: list[str], timeout_ms: float,
                     num_tries: int, is_query: bool) -> list[list[float]]:
        raise NotImplementedError

    # -- public API (embed_query / embed_documents split like the ref) ----
    def embed_query(self, text: str, remote_embedding_timeout_ms: float = 30000,
                    remote_embedding_num_tries: int = 2) -> np.ndarray:
        key = text + self.model_name
        hit = self._qcache.get(key)
        if hit is not None:
            return hit
        vec = np.asarray(self._embed_texts(
            [text], remote_embedding_timeout_ms, remote_embedding_num_tries,
            is_query=True)[0], dtype=np.float32)
        if len(self._qcache) >= self.QUERY_CACHE_MAX:
            self._qcache.pop(next(iter(self._qcache)))
        self._qcache[key] = vec
        return vec

    def embed_documents(self, texts: list[str],
                        remote_embedding_batch_size: int = 200,
                        remote_embedding_timeout_ms: float = 60000,
                        remote_embedding_num_tries: int = 2) -> np.ndarray:
        out = []
        bs = max(1, int(remote_embedding_batch_size))
        for i in range(0, len(texts), bs):
            out.extend(self._embed_texts(
                texts[i:i + bs], remote_embedding_timeout_ms,
                remote_embedding_num_tries, is_query=False))
        return np.asarray(out, dtype=np.float32)

    # back-compat shims for local-encoder call sites
    def embed_batch(self, texts: list[str], **kw) -> np.ndarray:
        return self.embed_documents(
            texts,
            remote_embedding_batch_size=kw.get(
                "remote_embedding_batch_size", 200),
            remote_embedding_timeout_ms=kw.get(
                "remote_embedding_timeout_ms", 60000),
            remote_embedding_num_tries=kw.get(
                "remote_embedding_num_tries", 2))

    def embed_one(self, text: str, **kw) -> np.ndarray:
        return self.embed_query(
            text,
            remote_embedding_timeout_ms=kw.get(
                "remote_embedding_timeout_ms", 30000),
            remote_embedding_num_tries=kw.get(
                "remote_embedding_num_tries", 2))


class OpenAIEmbedder(RemoteEmbedder):
    """OpenAI / custom-URL OpenAI-format embedder
    (text_embedder_remote.h:96-149). Custom URLs keep their /v1/embeddings
    path when present (get_embedding_url_for_config)."""

    def __init__(self, model_config: dict):
        super().__init__(model_config)
        self.num_dim = int(model_config.get("num_dim", 1536) or 1536)
        self.has_custom_dims = "num_dim" in model_config
        url = model_config.get("url") or "https://api.openai.com"
        if url == "https://api.openai.com":
            self.url = url + "/v1/embeddings"
        elif "/v1/embeddings" in url:
            self.url = url
        elif "/v1" in url:
            self.url = url + "/embeddings"
        else:
            self.url = url + "/v1/embeddings"

    def _embed_texts(self, texts, timeout_ms, num_tries, is_query):
        body = {"model": self.model_name.split("/", 1)[-1], "input": texts}
        if self.has_custom_dims:
            body["dimensions"] = self.num_dim
        data = self._call(self.url, body,
                          {"Authorization": f"Bearer {self.api_key}"},
                          timeout_ms, num_tries)
        rows = sorted(data["data"], key=lambda d: d.get("index", 0))
        return [d["embedding"] for d in rows]


class AzureEmbedder(RemoteEmbedder):
    """Azure OpenAI deployment embedder (text_embedder_remote.h:73-93):
    full deployment URL in `url`, api-key header auth."""

    def __init__(self, model_config: dict):
        super().__init__(model_config)
        self.num_dim = int(model_config.get("num_dim", 1536) or 1536)
        self.has_custom_dims = "num_dim" in model_config
        self.url = model_config.get("url", "")
        if not self.url:
            raise BadRequest("Property `embed.model_config.url` is required "
                             "for Azure models.")

    def _embed_texts(self, texts, timeout_ms, num_tries, is_query):
        body = {"input": texts}
        if self.has_custom_dims:
            body["dimensions"] = self.num_dim
        data = self._call(self.url, body, {"api-key": self.api_key},
                          timeout_ms, num_tries)
        rows = sorted(data["data"], key=lambda d: d.get("index", 0))
        return [d["embedding"] for d in rows]


class GoogleEmbedder(RemoteEmbedder):
    """Google PaLM embedding-gecko-001 embedder
    (text_embedder_remote.h:154-176): one text per request, 768 dims,
    key in the URL, response {"embedding": {"value": [...]}}."""

    SUPPORTED_MODEL = "embedding-gecko-001"
    URL = ("https://generativelanguage.googleapis.com/v1beta2/models/"
           "embedding-gecko-001:embedText?key=")

    def __init__(self, model_config: dict):
        super().__init__(model_config)
        name = self.model_name.split("/", 1)[-1]
        if name != self.SUPPORTED_MODEL:
            raise BadRequest(f"Property `embed.model_config.model_name` "
                             f"must be `google/{self.SUPPORTED_MODEL}`.")
        self.num_dim = 768

    def _embed_texts(self, texts, timeout_ms, num_tries, is_query):
        out = []
        for t in texts:  # the API embeds one text per call
            data = self._call(self.URL + self.api_key, {"text": t}, {},
                              timeout_ms, num_tries)
            out.append(data["embedding"]["value"])
        return out


class GCPEmbedder(RemoteEmbedder):
    """GCP Vertex AI embedder (text_embedder_remote.h:181-232):
    {region}-aiplatform predict endpoint, OAuth access token with
    refresh-token renewal on 401, instances capped at 5 per request,
    task_type split between queries and documents."""

    AUTH_URL = "https://oauth2.googleapis.com/token"

    def __init__(self, model_config: dict):
        super().__init__(model_config)
        for prop in ("project_id",):
            if not model_config.get(prop):
                raise BadRequest(f"Property `embed.model_config.{prop}` is "
                                 f"required for GCP models.")
        self.project_id = model_config["project_id"]
        self.access_token = model_config.get("access_token", "")
        self.refresh_token = model_config.get("refresh_token", "")
        self.client_id = model_config.get("client_id", "")
        self.client_secret = model_config.get("client_secret", "")
        self.region = model_config.get("region", "us-central1")
        self.document_task = model_config.get("document_task",
                                              "RETRIEVAL_DOCUMENT")
        self.query_task = model_config.get("query_task", "RETRIEVAL_QUERY")
        self.num_dim = int(model_config.get("num_dim", 768) or 768)
        self.has_custom_dims = "num_dim" in model_config

    @property
    def url(self):
        name = self.model_name.split("/", 1)[-1]
        return (f"https://{self.region}-aiplatform.googleapis.com/v1/"
                f"projects/{self.project_id}/locations/{self.region}/"
                f"publishers/google/models/{name}:predict")

    def _refresh_access_token(self, timeout_ms, num_tries):
        data = self._call(self.AUTH_URL, {
            "grant_type": "refresh_token",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
            "refresh_token": self.refresh_token}, {}, timeout_ms, num_tries)
        self.access_token = data.get("access_token", self.access_token)

    def _embed_texts(self, texts, timeout_ms, num_tries, is_query):
        out = []
        task = self.query_task if is_query else self.document_task
        for i in range(0, len(texts), 5):  # GCP limit: 5 instances/request
            body = {"instances": [{"content": t, "task_type": task}
                                  for t in texts[i:i + 5]]}
            if self.has_custom_dims:
                body["parameters"] = {"outputDimensionality": self.num_dim}
            try:
                data = self._call(
                    self.url, body,
                    {"Authorization": f"Bearer {self.access_token}"},
                    timeout_ms, num_tries)
            except BadRequest:
                if not self.refresh_token:
                    raise
                self._refresh_access_token(timeout_ms, num_tries)
                data = self._call(
                    self.url, body,
                    {"Authorization": f"Bearer {self.access_token}"},
                    timeout_ms, num_tries)
            out.extend(p["embeddings"]["values"]
                       for p in data["predictions"])
        return out


class EmbedderManager:
    """Singleton-style registry (embedder_manager.h:45 get_text_embedder)."""

    def __init__(self, models_dir: str = ""):
        self.models_dir = models_dir
        self._cache: dict[str, object] = {}

    def get_image(self, model_config: dict) -> "ImageEncoder":
        name = model_config.get("model_name", "ts/clip-vit-b-p32")
        key = name + "#vision"
        if key not in self._cache:
            self._cache[key] = ImageEncoder(name, self.models_dir)
        return self._cache[key]

    def get(self, model_config: dict):
        name = model_config.get("model_name", "")
        if not name:
            raise BadRequest("Property `embed.model_config.model_name` is required.")
        if name in self._cache:
            return self._cache[name]
        if name.startswith("azure/"):
            emb = AzureEmbedder(model_config)
        elif name.startswith("google/"):
            emb = GoogleEmbedder(model_config)
        elif name.startswith("gcp/"):
            emb = GCPEmbedder(model_config)
        elif name.startswith("openai/") or model_config.get("url"):
            emb = OpenAIEmbedder(model_config)
        else:
            emb = TextEncoder(name, self.models_dir)
        self._cache[name] = emb
        return emb


# ---------------------------------------------------------------------------
# image embedding (CLIP-vision equivalent — image_embedder.h)
# ---------------------------------------------------------------------------

IMG_SIZE = 64
IMG_PATCH = 16
N_PATCHES = (IMG_SIZE // IMG_PATCH) ** 2


def _decode_image_base64(b64: str, size: int = IMG_SIZE) -> np.ndarray:
    """base64 -> (size, size, 3) float32 in [0,1] (image_processor.h
    decode+resize; PIL replaces the reference's stb/ONNX preprocessing)."""
    import base64
    import io
    from PIL import Image
    raw = base64.b64decode(b64)
    img = Image.open(io.BytesIO(raw)).convert("RGB").resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


def _vit_forward(params, pixels, n_heads: int):
    """(B, IMG_SIZE, IMG_SIZE, 3) -> (B, dim) f32 normalized. Patchify ->
    linear projection -> the same transformer blocks as the text tower
    (bf16 MXU matmuls) -> mean pool -> L2 normalize."""
    B = pixels.shape[0]
    p = IMG_PATCH
    n = IMG_SIZE // p
    x = pixels.reshape(B, n, p, n, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, p * p * 3).astype(jnp.bfloat16)
    x = jnp.einsum("bld,de->ble", x, params["patch_proj"],
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    x = x + params["pos_emb"][None, :n * n]
    ids = jnp.ones((B, n * n), jnp.int32)  # all patches valid
    # reuse the text-tower block stack via a fake token mask
    mask = ids != 0
    neg = jnp.float32(-1e9)
    attn_bias = jnp.where(mask[:, None, None, :], 0.0, neg)
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        dim = h.shape[-1]
        hd = dim // n_heads

        def proj(w):
            y = jnp.einsum("bld,de->ble", h, w,
                           preferred_element_type=jnp.float32)
            return y.reshape(B, n * n, n_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = proj(blk["wq"]), proj(blk["wk"]), proj(blk["wv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(hd) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v.astype(jnp.bfloat16))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, n * n, dim)
        x = x + jnp.einsum("bld,de->ble", ctx, blk["wo"],
                           preferred_element_type=jnp.float32).astype(x.dtype)
        h2 = _layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        ff = jnp.einsum("bld,de->ble", h2, blk["w1"],
                        preferred_element_type=jnp.float32)
        ff = jax.nn.gelu(ff).astype(jnp.bfloat16)
        ff = jnp.einsum("bld,de->ble", ff, blk["w2"],
                        preferred_element_type=jnp.float32)
        x = x + ff.astype(x.dtype)
    pooled = jnp.mean(x.astype(jnp.float32), axis=1)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


def _clip_vision_forward(params, pixels, n_heads: int, patch: int = 16):
    """Exact CLIP-ViT vision tower (transformers CLIPVisionModel layout):
    conv patchify -> [class] + pos embed -> pre-LN transformer blocks with
    quick_gelu -> post-LN on the class token -> optional visual projection
    -> L2 normalize. Weights from models/convert.py convert_clip
    (image_embedder.h CLIP vision session equivalent).

    pixels: (B, S, S, 3) float32 already CLIP-normalized."""
    B = pixels.shape[0]
    p = patch
    S = pixels.shape[1]
    n = S // p
    dt = params["patch_proj"].dtype
    x = pixels.reshape(B, n, p, n, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, p * p * 3).astype(dt)
    x = jnp.einsum("bld,de->ble", x, params["patch_proj"],
                   preferred_element_type=jnp.float32)
    cls = jnp.broadcast_to(params["class_emb"].astype(jnp.float32)[None, None],
                           (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"][: n * n + 1].astype(jnp.float32)[None]
    x = _layer_norm(x, params["pre_ln_g"], params["pre_ln_b"], eps=1e-5)
    L = n * n + 1
    dim = x.shape[-1]
    hd = dim // n_heads
    for blk in params["blocks"]:
        h = _layer_norm(x, blk["ln1_g"], blk["ln1_b"], eps=1e-5)

        def proj(w, b):
            y = jnp.einsum("bld,de->ble", h.astype(dt), w,
                           preferred_element_type=jnp.float32) + b
            return y.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)

        q = proj(blk["wq"], blk["bq"])
        k = proj(blk["wk"], blk["bk"])
        v = proj(blk["wv"], blk["bv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs.astype(dt), v.astype(dt),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        x = x + jnp.einsum("bld,de->ble", ctx.astype(dt), blk["wo"],
                           preferred_element_type=jnp.float32) + blk["bo"]
        h2 = _layer_norm(x, blk["ln2_g"], blk["ln2_b"], eps=1e-5)
        ff = jnp.einsum("bld,de->ble", h2.astype(dt), blk["w1"],
                        preferred_element_type=jnp.float32) + blk["b1"]
        ff = ff * jax.nn.sigmoid(1.702 * ff)     # quick_gelu
        ff = jnp.einsum("bld,de->ble", ff.astype(dt), blk["w2"],
                        preferred_element_type=jnp.float32) + blk["b2"]
        x = x + ff
    pooled = _layer_norm(x[:, 0], params["post_ln_g"], params["post_ln_b"],
                         eps=1e-5)
    if "visual_proj" in params:
        pooled = jnp.einsum("bd,de->be", pooled.astype(dt),
                            params["visual_proj"],
                            preferred_element_type=jnp.float32)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


# CLIP pixel normalization constants (image_processor.h preprocessing)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class ImageEncoder:
    """CLIP-vision-equivalent tower sharing the embedding space convention
    with TextEncoder (same model name -> same dim). When a converted
    checkpoint `<models_dir>/<name>.npz` (arch=clip_vision) exists, the
    EXACT CLIP forward runs with real weights; otherwise the seeded
    deterministic tower serves as the stand-in."""

    def __init__(self, model_name: str = "ts/clip-vit-b-p32",
                 models_dir: str = ""):
        safe = model_name.replace("/", "_")
        # `<safe>.vision.npz` holds the vision tower when the text tower
        # occupies `<safe>.npz` (full CLIP checkpoints); vision-only
        # converts keep the plain name. Repo-shipped checkpoints
        # (ts/clip-mini trained by models/train_clip.py) are the fallback.
        pkg_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
        for d in ([models_dir] if models_dir else []) + [pkg_dir]:
            for fn in (f"{safe}.vision.npz", f"{safe}.npz"):
                path = os.path.join(d, fn)
                if not os.path.exists(path):
                    continue
                raw = np.load(path, allow_pickle=False)
                if "arch" in raw and str(raw["arch"]) == "clip_vision":
                    self._init_clip(model_name, raw)
                    return
        self._init_seeded(model_name)

    def _init_clip(self, model_name, raw):
        dt = jnp.float32 if str(raw["precision"]) == "f32" else jnp.bfloat16
        self.model_name = model_name
        self.n_heads = int(raw["n_heads"])
        self.image_size = int(raw["image_size"])
        params = {
            "class_emb": jnp.asarray(raw["class_emb"], dt),
            "patch_proj": jnp.asarray(raw["patch_proj"], dt),
            "pos_emb": jnp.asarray(raw["pos_emb"], dt),
            "pre_ln_g": jnp.asarray(raw["pre_ln_g"], jnp.float32),
            "pre_ln_b": jnp.asarray(raw["pre_ln_b"], jnp.float32),
            "post_ln_g": jnp.asarray(raw["post_ln_g"], jnp.float32),
            "post_ln_b": jnp.asarray(raw["post_ln_b"], jnp.float32),
            "blocks": [],
        }
        if "visual_proj" in raw:
            params["visual_proj"] = jnp.asarray(raw["visual_proj"], dt)
        for i in range(int(raw["n_layers"])):
            params["blocks"].append({
                k: jnp.asarray(raw[f"blocks.{i}.{k}"],
                               jnp.float32 if k.startswith(("ln", "b"))
                               else dt)
                for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                          "w1", "b1", "w2", "b2",
                          "ln1_g", "ln1_b", "ln2_g", "ln2_b")})
        self.params = params
        self.num_dim = int(
            raw["visual_proj"].shape[1] if "visual_proj" in raw
            else raw["class_emb"].shape[0])
        self._clip = True
        self._fwd = jax.jit(partial(_clip_vision_forward,
                                    n_heads=self.n_heads,
                                    patch=int(raw["patch_size"])))

    def _init_seeded(self, model_name):
        spec = BUILTIN_MODELS.get(model_name, (512, 6, 8, 4))
        dim, layers, heads, ff_mult = spec
        self.model_name = model_name
        self.num_dim = dim
        self.n_heads = heads
        seed = (_stable_hash(model_name + "#vision")) & 0x7FFFFFFF
        rng = np.random.default_rng(seed)
        base = _init_params(model_name, dim, layers, heads, ff_mult)
        base["patch_proj"] = jnp.asarray(
            rng.standard_normal((IMG_PATCH * IMG_PATCH * 3, dim))
            .astype(np.float32) / np.sqrt(IMG_PATCH * IMG_PATCH * 3),
            jnp.bfloat16)
        base["pos_emb"] = jnp.asarray(
            rng.standard_normal((N_PATCHES, dim)).astype(np.float32) * 0.02,
            jnp.bfloat16)
        self.params = base
        self.image_size = IMG_SIZE
        self._clip = False
        self._fwd = jax.jit(partial(_vit_forward, n_heads=heads))

    def embed_images_base64(self, images_b64: list[str],
                            batch_size: int = 16) -> np.ndarray:
        S = self.image_size
        out = np.zeros((len(images_b64), self.num_dim), np.float32)
        for i in range(0, len(images_b64), batch_size):
            chunk = images_b64[i:i + batch_size]
            px = np.stack([_decode_image_base64(b, S) for b in chunk])
            if self._clip:
                px = (px - CLIP_MEAN) / CLIP_STD
            if len(chunk) < batch_size:
                px = np.concatenate([px, np.zeros(
                    (batch_size - len(chunk), S, S, 3), np.float32)])
            emb = np.asarray(self._fwd(self.params, jnp.asarray(px)))
            out[i:i + len(chunk)] = emb[:len(chunk)]
        return out
