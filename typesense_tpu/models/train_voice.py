"""Train a small REAL Whisper-architecture model from scratch and ship it
as the default voice-query checkpoint.

The reference bundles whisper.cpp and downloads ggml checkpoints at runtime
(/root/reference/include/vq_model.h:39-51, embedder_manager.h); this image
has no egress, so — like ts-mini (train_encoder.py) and clip-mini
(train_clip.py) — we train a genuine encoder-decoder speech model: the
EXACT architecture models/voice.py serves (conv frontend over log-mels,
transformer encoder, causal decoder with cross-attention, greedy decode),
trained to transcribe a procedurally synthesized spoken vocabulary.

Audio synthesis: each letter has a fixed two-formant signature; a word is
its letters' segments concatenated with envelopes; an utterance is 1-3
words separated by silence. Training applies pitch/tempo jitter, amplitude
variation, and additive noise, so the model must learn the formant
patterns, not waveform bytes — held-out seeds (unseen jitter/noise draws)
measure real generalization (tests/test_voice_mini.py).

The exported .npz uses models/convert.py's convert_whisper layout verbatim,
so WhisperModel loads it exactly like a converted HuggingFace checkpoint.
Token space: character-level GPT-2 byte-level strings ('a'..'z', 'Ġ' for
space) + eot + sot, decoded by voice.decode_tokens unchanged.

Run: python -m typesense_tpu.models.train_voice [steps]
Deterministic (fixed seeds); ~10-20 min on one CPU core.
"""

from __future__ import annotations

import io
import os
import struct
import sys

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from typesense_tpu.models.voice import (SAMPLE_RATE, HOP, _ln, _attn, _mlp,
                                        encode_audio, log_mel)

SEED = 41

# model config (cfg vector layout: voice.py:12-15)
N_MELS = 80
N_AUDIO_CTX = 100          # 200 mel frames = 2 s window
D = 64
HEADS = 2
ENC_LAYERS = 2
DEC_LAYERS = 2
N_TEXT_CTX = 24

# spoken vocabulary: bench/culinary words the voice_query flow searches for
WORDS = ("chicken beef pasta rice bread cake lemon garlic onion tomato "
         "cheese cream butter spicy sweet roasted grilled baked soup salad "
         "stew curry pie sauce").split()

# char-level token table in GPT-2 byte-level form (voice._byte_decoder maps
# 'a'..'z' to themselves and 'Ġ' to the space byte); eot/sot LAST so the
# transcribe loop's `ban[eot+1:]` masks exactly the specials
CHARS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["Ġ"]
VOCAB = CHARS + ["<|endoftext|>", "<|startoftranscript|>"]
EOT = len(CHARS)
SOT = EOT + 1
N_VOCAB = len(VOCAB)
CHAR_ID = {c: i for i, c in enumerate(CHARS)}


def text_to_ids(text: str) -> list[int]:
    return [CHAR_ID["Ġ"] if ch == " " else CHAR_ID[ch] for ch in text]


# ---------------------------------------------------------------------------
# procedural speech synthesis
# ---------------------------------------------------------------------------
def _letter_formants(ch: str) -> tuple[float, float]:
    i = ord(ch) - ord("a")
    return 280.0 + 53.0 * i, 880.0 + 127.0 * ((i * 7) % 26)


def synth_word(word: str, rng: np.random.Generator,
               pitch: float, tempo: float) -> np.ndarray:
    segs = []
    for ch in word:
        f1, f2 = _letter_formants(ch)
        dur = 0.085 * tempo * float(rng.uniform(0.88, 1.12))
        n = max(int(dur * SAMPLE_RATE), 8)
        t = np.arange(n) / SAMPLE_RATE
        amp1 = float(rng.uniform(0.5, 0.7))
        amp2 = float(rng.uniform(0.25, 0.4))
        seg = (amp1 * np.sin(2 * np.pi * f1 * pitch * t) +
               amp2 * np.sin(2 * np.pi * f2 * pitch * t))
        env = np.hanning(n) ** 0.5
        segs.append(seg * env)
    return np.concatenate(segs).astype(np.float32)


def synth_utterance(words: list[str], rng: np.random.Generator) -> np.ndarray:
    pitch = float(rng.uniform(0.93, 1.07))
    tempo = float(rng.uniform(0.9, 1.1))
    gap = np.zeros(int(0.09 * SAMPLE_RATE), np.float32)
    lead = np.zeros(int(rng.uniform(0.02, 0.08) * SAMPLE_RATE), np.float32)
    parts = [lead]
    for i, w in enumerate(words):
        if i:
            parts.append(gap)
        parts.append(synth_word(w, rng, pitch, tempo))
    pcm = np.concatenate(parts)
    pcm = pcm + rng.normal(0.0, 0.012, len(pcm)).astype(np.float32)
    pcm = np.clip(pcm * float(rng.uniform(0.6, 0.95)), -1.0, 1.0)
    limit = 2 * N_AUDIO_CTX * HOP
    return pcm[:limit].astype(np.float32)


def pcm_to_wav_bytes(pcm: np.ndarray) -> bytes:
    """16-bit PCM mono WAV (what the voice_query endpoint receives)."""
    x = (np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    buf.write(b"RIFF" + struct.pack("<I", 36 + len(x)) + b"WAVE")
    buf.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, SAMPLE_RATE,
                                    SAMPLE_RATE * 2, 2, 16))
    buf.write(b"data" + struct.pack("<I", len(x)) + x)
    return buf.getvalue()


def make_sample(rng: np.random.Generator):
    n_words = int(rng.integers(1, 4))
    words = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n_words)]
    text = " ".join(words)
    pcm = synth_utterance(words, rng)
    mel = log_mel(pcm, N_MELS, N_AUDIO_CTX)          # (n_mels, 200)
    ids = text_to_ids(text)
    # decoder input: [SOT] ids ; target: ids [EOT] ; pad with EOT masked out
    inp = np.full(N_TEXT_CTX, EOT, np.int32)
    tgt = np.full(N_TEXT_CTX, EOT, np.int32)
    mask = np.zeros(N_TEXT_CTX, np.float32)
    seq = [SOT] + ids
    out = ids + [EOT]
    L = min(len(seq), N_TEXT_CTX)
    inp[:L] = seq[:L]
    tgt[:L] = out[:L]
    mask[:L] = 1.0
    return mel.astype(np.float32), inp, tgt, mask, text, pcm


# ---------------------------------------------------------------------------
# parameter init (exact voice.py layout)
# ---------------------------------------------------------------------------
def init_params(rng: np.random.Generator) -> dict:
    def nrm(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    p = {
        "enc.conv1.w": nrm(3, N_MELS, D), "enc.conv1.b": np.zeros(D, np.float32),
        "enc.conv2.w": nrm(3, D, D), "enc.conv2.b": np.zeros(D, np.float32),
        "enc.pos": nrm(N_AUDIO_CTX, D, scale=0.01),
        "enc.ln_post.g": np.ones(D, np.float32),
        "enc.ln_post.b": np.zeros(D, np.float32),
        "dec.tok_emb": nrm(N_VOCAB, D),
        "dec.pos": nrm(N_TEXT_CTX, D, scale=0.01),
        "dec.ln.g": np.ones(D, np.float32),
        "dec.ln.b": np.zeros(D, np.float32),
    }

    def block(prefix, cross=False):
        for ln in (("ln1",) + (("xln",) if cross else ()) + ("ln2",)):
            p[f"{prefix}.{ln}.g"] = np.ones(D, np.float32)
            p[f"{prefix}.{ln}.b"] = np.zeros(D, np.float32)
        attns = ("attn",) + (("xattn",) if cross else ())
        for a in attns:
            for m in ("q", "k", "v", "o"):
                p[f"{prefix}.{a}.{m}.w"] = nrm(D, D)
                if m != "k":
                    p[f"{prefix}.{a}.{m}.b"] = np.zeros(D, np.float32)
        p[f"{prefix}.mlp.fc1.w"] = nrm(D, 4 * D)
        p[f"{prefix}.mlp.fc1.b"] = np.zeros(4 * D, np.float32)
        p[f"{prefix}.mlp.fc2.w"] = nrm(4 * D, D)
        p[f"{prefix}.mlp.fc2.b"] = np.zeros(D, np.float32)

    for i in range(ENC_LAYERS):
        block(f"enc.{i}")
    for i in range(DEC_LAYERS):
        block(f"dec.{i}", cross=True)
    return p


# ---------------------------------------------------------------------------
# training forward (reuses voice.py's _ln/_attn/_mlp so serving == training)
# ---------------------------------------------------------------------------
def decoder_all_logits(p, tokens, audio):
    """Like voice.decode_logits but returns logits at EVERY position."""
    T = tokens.shape[0]
    x = p["dec.tok_emb"][tokens] + p["dec.pos"][:T]
    for i in range(DEC_LAYERS):
        h = _ln(x, p[f"dec.{i}.ln1.g"], p[f"dec.{i}.ln1.b"])
        x = x + _attn(h, h, p, f"dec.{i}.attn", HEADS, causal=True)
        h = _ln(x, p[f"dec.{i}.xln.g"], p[f"dec.{i}.xln.b"])
        x = x + _attn(h, audio, p, f"dec.{i}.xattn", HEADS, causal=False)
        h = _ln(x, p[f"dec.{i}.ln2.g"], p[f"dec.{i}.ln2.b"])
        x = x + _mlp(h, p, f"dec.{i}.mlp")
    x = _ln(x, p["dec.ln.g"], p["dec.ln.b"])
    return x @ p["dec.tok_emb"].T


def batch_loss(p, mels, inps, tgts, masks):
    def one(mel, inp, tgt, mask):
        audio = encode_audio(p, mel, ENC_LAYERS, HEADS)
        logits = decoder_all_logits(p, inp, audio)
        lse = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(logits, tgt[:, None], axis=-1)[:, 0] - lse
        return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(jax.vmap(one)(mels, inps, tgts, masks))


def main(steps: int = 1400, batch: int = 48):
    import optax
    rng = np.random.default_rng(SEED)
    print(f"synthesizing dataset ...", flush=True)
    N_TRAIN = 2048
    data = [make_sample(rng) for _ in range(N_TRAIN)]
    mels = np.stack([d[0] for d in data])
    inps = np.stack([d[1] for d in data])
    tgts = np.stack([d[2] for d in data])
    masks = np.stack([d[3] for d in data])

    params = {k: jnp.asarray(v) for k, v in init_params(rng).items()}
    warm = min(80, max(steps // 4, 1))
    sched = optax.warmup_cosine_decay_schedule(0.0, 2.5e-3, warm, steps, 1e-5)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mel_b, inp_b, tgt_b, mask_b):
        loss, grads = jax.value_and_grad(batch_loss)(
            params, mel_b, inp_b, tgt_b, mask_b)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    order = rng.permutation(N_TRAIN)
    pos = 0
    for it in range(steps):
        if pos + batch > N_TRAIN:
            order = rng.permutation(N_TRAIN)
            pos = 0
        idx = order[pos:pos + batch]
        pos += batch
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(mels[idx]),
                                       jnp.asarray(inps[idx]),
                                       jnp.asarray(tgts[idx]),
                                       jnp.asarray(masks[idx]))
        if it % 100 == 0 or it == steps - 1:
            print(f"step {it} loss {float(loss):.4f}", flush=True)

    # export in convert_whisper's cfg layout (voice.py:12-15)
    cfg = np.asarray([N_MELS, N_AUDIO_CTX, D, HEADS, ENC_LAYERS,
                      N_TEXT_CTX, D, HEADS, DEC_LAYERS, N_VOCAB,
                      SOT, EOT, -1, -1, -1], np.int64)
    out = {k: np.asarray(v, np.float32) for k, v in params.items()}
    out["cfg"] = cfg
    out["vocab"] = np.asarray(VOCAB)
    ckpt_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "ts_whisper-mini.npz")
    np.savez(path, **out)
    print(f"saved {path} ({os.path.getsize(path)/1e6:.2f} MB)", flush=True)

    # held-out eval through the REAL serving path
    from typesense_tpu.models.voice import WhisperModel
    import base64
    m = WhisperModel("ts/whisper-mini", ckpt_dir)
    erng = np.random.default_rng(SEED + 1000)
    ok = 0
    TRIES = 40
    for _ in range(TRIES):
        _, _, _, _, text, pcm = make_sample(erng)
        got = m.transcribe(base64.b64encode(pcm_to_wav_bytes(pcm)).decode())
        ok += int(got == text)
    print(f"held-out exact-utterance accuracy: {ok}/{TRIES}", flush=True)
    return ok / TRIES


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1400)
