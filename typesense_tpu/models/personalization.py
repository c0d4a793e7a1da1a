"""tyrec-equivalent personalization model, TPU-native.

The reference runs ONNX "tyrec-1"/"tyrec-2" sessions
(/root/reference/include/personalization_model.h:12-40): a recommendation
tower that maps a user's item-embedding history to a user embedding
(`embed_recommendations(input_vector, user_mask)`), plus text towers for
user/item features. Here the recommendation tower is a JAX program:

  user tower = learned recency position embeddings over the (H, D) history
  -> pre-LN single-block transformer encoder (multi-head self-attention +
  GELU MLP, residuals) -> learned-query attention pooling -> L2-normalized
  (D,) user embedding.

Weights load from an .npz checkpoint (convert a trained torch tyrec-style
checkpoint with models/convert.py conventions), or train IN-PROCESS with
`fit`: an InfoNCE next-item objective (predict each user's held-out last
item against in-batch negatives) on histories harvested from analytics
events — the TPU serves and trains with the same arrays.

All shapes are static: histories pad/clip to MAX_HIST and batch sizes
bucket to powers of two, so every step hits a compiled program.
"""

from __future__ import annotations

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

MAX_HIST = 32
N_HEADS = 4


def init_params(dim: int, seed: int = 0) -> dict:
    """Glorot-initialized tower parameters (all f32, dict of arrays)."""
    rng = np.random.default_rng(seed)

    def glorot(*shape):
        lim = float(np.sqrt(6.0 / (shape[0] + shape[-1])))
        return rng.uniform(-lim, lim, shape).astype(np.float32)

    return {
        "pos": (0.02 * rng.standard_normal((MAX_HIST, dim))).astype(
            np.float32),
        "ln1_g": np.ones(dim, np.float32), "ln1_b": np.zeros(dim, np.float32),
        "wq": glorot(dim, dim), "wk": glorot(dim, dim),
        "wv": glorot(dim, dim), "wo": glorot(dim, dim),
        "ln2_g": np.ones(dim, np.float32), "ln2_b": np.zeros(dim, np.float32),
        "w1": glorot(dim, 2 * dim), "b1": np.zeros(2 * dim, np.float32),
        "w2": glorot(2 * dim, dim), "b2": np.zeros(dim, np.float32),
        "pool_q": glorot(1, dim)[0],
        "lnf_g": np.ones(dim, np.float32), "lnf_b": np.zeros(dim, np.float32),
    }


def _ln(x, g, b):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-6) * g + b


def user_forward(params: dict, hist: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """(H, D) item-embedding history + (H,) {0,1} mask -> (D,) L2-normed
    user embedding. Newest item sits at row 0 (recency positions)."""
    D = hist.shape[-1]
    Hd = D // N_HEADS
    x = hist + params["pos"][: hist.shape[0]]
    x = x * mask[:, None]
    neg = jnp.float32(-1e9)

    h = _ln(x, params["ln1_g"], params["ln1_b"])
    q = (h @ params["wq"]).reshape(-1, N_HEADS, Hd).transpose(1, 0, 2)
    k = (h @ params["wk"]).reshape(-1, N_HEADS, Hd).transpose(1, 0, 2)
    v = (h @ params["wv"]).reshape(-1, N_HEADS, Hd).transpose(1, 0, 2)
    att = (q @ k.transpose(0, 2, 1)) / jnp.sqrt(jnp.float32(Hd))
    att = jnp.where(mask[None, None, :] > 0, att, neg)
    att = jax.nn.softmax(att, axis=-1)
    o = (att @ v).transpose(1, 0, 2).reshape(-1, D) @ params["wo"]
    x = x + o * mask[:, None]

    h = _ln(x, params["ln2_g"], params["ln2_b"])
    x = x + (jax.nn.gelu(h @ params["w1"] + params["b1"]) @ params["w2"]
             + params["b2"]) * mask[:, None]

    # learned-query attention pooling over the encoded history
    h = _ln(x, params["lnf_g"], params["lnf_b"])
    w = h @ params["pool_q"] / jnp.sqrt(jnp.float32(D))
    w = jax.nn.softmax(jnp.where(mask > 0, w, neg))
    u = w @ h
    return u / jnp.maximum(jnp.linalg.norm(u), 1e-6)


embed_recommendations = jax.jit(jax.vmap(user_forward, in_axes=(None, 0, 0)))


def pad_history(vectors: list, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Newest-first (H, D) + mask, clipped/padded to MAX_HIST (matches the
    reference's user_mask input contract)."""
    hist = np.zeros((MAX_HIST, dim), np.float32)
    mask = np.zeros(MAX_HIST, np.float32)
    take = list(vectors)[-MAX_HIST:][::-1]      # newest first
    for i, v in enumerate(take):
        hist[i] = np.asarray(v, np.float32)
        mask[i] = 1.0
    return hist, mask


def fit(params: dict, histories: np.ndarray, masks: np.ndarray,
        steps: int = 200, lr: float = 1e-3, seed: int = 0,
        temp: float = 0.07) -> tuple[dict, list[float]]:
    """InfoNCE next-item training: for each user the newest item (row 0) is
    the positive target; the tower sees rows 1.. and must rank the held-out
    item above the other users' targets (in-batch negatives). Returns
    (trained params, loss curve). Pure JAX — runs on whatever backend is
    active (TPU in production, CPU in tests)."""
    histories = jnp.asarray(histories, jnp.float32)   # (U, MAX_HIST, D)
    masks = jnp.asarray(masks, jnp.float32)           # (U, MAX_HIST)
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    U = histories.shape[0]
    targets = histories[:, 0, :]
    tnorm = targets / jnp.maximum(
        jnp.linalg.norm(targets, axis=1, keepdims=True), 1e-6)
    inputs = jnp.concatenate(
        [histories[:, 1:, :], jnp.zeros_like(histories[:, :1, :])], axis=1)
    in_masks = jnp.concatenate(
        [masks[:, 1:], jnp.zeros_like(masks[:, :1])], axis=1)

    def loss_fn(p):
        users = jax.vmap(user_forward, in_axes=(None, 0, 0))(
            p, inputs, in_masks)                       # (U, D), normalized
        logits = users @ tnorm.T / temp                # (U, U)
        return -jnp.mean(jax.nn.log_softmax(logits, axis=1)
                         [jnp.arange(U), jnp.arange(U)])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # Adam (inline to avoid an optax dependency in the serving path)
    m = {k: jnp.zeros_like(v) for k, v in params.items()}
    s = {k: jnp.zeros_like(v) for k, v in params.items()}
    losses = []
    for t in range(1, steps + 1):
        val, g = grad_fn(params)
        losses.append(float(val))
        b1c = 1 - 0.9 ** t
        b2c = 1 - 0.999 ** t
        for k in params:
            m[k] = 0.9 * m[k] + 0.1 * g[k]
            s[k] = 0.999 * s[k] + 0.001 * (g[k] * g[k])
            params[k] = params[k] - lr * (m[k] / b1c) / (
                jnp.sqrt(s[k] / b2c) + 1e-8)
    return {k: np.asarray(v) for k, v in params.items()}, losses


def save_npz(path: str, params: dict, dim: int):
    np.savez(path, __dim__=np.int32(dim),
             **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str) -> tuple[dict, int]:
    z = np.load(path)
    dim = int(z["__dim__"])
    return {k: z[k] for k in z.files if k != "__dim__"}, dim
