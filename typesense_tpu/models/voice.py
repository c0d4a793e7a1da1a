"""Voice query transcription — TPU-native Whisper inference.

Replaces the reference's whisper.cpp integration
(/root/reference/include/vq_model.h:39-51: `WhisperModel::transcribe`
base64-wav -> text) with a JAX encoder-decoder forward: log-mel features
computed with a device FFT, encoder/decoder transformer blocks as fused
matmuls (MXU), greedy decode on host. Weights convert from a LOCAL
HuggingFace Whisper checkpoint via models/convert.py (`convert_whisper`) —
no network egress; without a converted checkpoint the voice endpoint stays
gated exactly like the reference without a downloaded ggml model.

Checkpoint layout (.npz produced by convert_whisper):
  cfg: [n_mels, n_audio_ctx, n_audio_state, n_audio_head, n_audio_layer,
        n_text_ctx, n_text_state, n_text_head, n_text_layer, n_vocab,
        sot, eot, no_ts, lang_en, task_transcribe]  (-1 = absent)
  vocab: (V,) np.str_ GPT-2 byte-level token strings
  enc.conv1.w (k, in, out), enc.conv1.b, enc.conv2.w, enc.conv2.b,
  enc.pos (n_audio_ctx, d), enc.{i}.ln1.{g,b}, enc.{i}.attn.{q,k,v,o}.{w,b},
  enc.{i}.ln2.{g,b}, enc.{i}.mlp.{fc1,fc2}.{w,b}, enc.ln_post.{g,b},
  dec.tok_emb (V, d), dec.pos (n_text_ctx, d), dec.{i}.ln1..., same attn,
  dec.{i}.xln.{g,b}, dec.{i}.xattn.{q,k,v,o}.{w,b}, dec.{i}.ln2,
  dec.{i}.mlp..., dec.ln.{g,b}
"""

from __future__ import annotations

import base64
import functools
import io
import os
import struct

import numpy as np

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from typesense_tpu.core.errors import BadRequest

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
MAX_DECODE_TOKENS = 64       # voice queries are short phrases


# ---------------------------------------------------------------------------
# WAV decoding (dr_wav.h equivalent, minimal: PCM8/16/24/32, float32, mono-
# mixdown, linear resample to 16 kHz)
# ---------------------------------------------------------------------------
def read_wav(data: bytes) -> np.ndarray:
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise BadRequest("Invalid audio format: expected a RIFF/WAVE file.")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise BadRequest("Invalid audio format: missing fmt/data chunk.")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 0xFFFE and len(pcm) >= 0:  # extensible: trust bits
        audio_fmt = 3 if bits == 32 else 1
    if audio_fmt == 3 or (audio_fmt == 1 and bits == 32 and False):
        x = np.frombuffer(pcm, dtype=np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(pcm, dtype=np.int16).astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(pcm, dtype=np.int32).astype(np.float32) / 2**31
    elif audio_fmt == 1 and bits == 24:
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        x = ((raw[:, 0].astype(np.int32)) | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 2**23, x - 2**24, x).astype(np.float32) / 2**23
    else:
        raise BadRequest(f"Unsupported WAV encoding (fmt={audio_fmt}, "
                         f"bits={bits}).")
    if channels > 1:
        x = x[:len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    if rate != SAMPLE_RATE and len(x) > 1:
        n_out = max(int(round(len(x) * SAMPLE_RATE / rate)), 1)
        xp = np.linspace(0.0, len(x) - 1, n_out)
        x = np.interp(xp, np.arange(len(x)), x).astype(np.float32)
    return x.astype(np.float32)


# ---------------------------------------------------------------------------
# log-mel spectrogram (Whisper: n_fft=400, hop=160, 80 slaney mels)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=4)
def mel_filterbank(n_mels: int, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """librosa-style slaney mel filterbank (the basis of Whisper's
    mel_filters.npz)."""
    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0)
                                                 * (m - 15.0)), f)
        return f

    fft_freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2),
                                    n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ce, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ce - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ce, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / max(hi - lo, 1e-9)      # slaney area norm
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _log_mel_device(pcm, n_mels: int):
    """Framed Hann-window rfft + mel projection + Whisper log scaling."""
    n = pcm.shape[0]
    n_frames = n // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    pad = jnp.pad(pcm, (N_FFT // 2, N_FFT))
    frames = pad[idx]
    win = jnp.hanning(N_FFT + 1)[:-1].astype(jnp.float32)
    spec = jnp.fft.rfft(frames * win[None, :], axis=1)
    mag = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(n_mels))
    mel = mag @ fb.T
    logm = jnp.log10(jnp.maximum(mel, 1e-10))
    logm = jnp.maximum(logm, jnp.max(logm) - 8.0)
    return ((logm + 4.0) / 4.0).astype(jnp.float32)


def log_mel(pcm: np.ndarray, n_mels: int, n_audio_ctx: int) -> np.ndarray:
    """(n_mels, 2*n_audio_ctx) padded/trimmed log-mel (whisper 30s window)."""
    target = 2 * n_audio_ctx                      # frames before conv stride
    pcm = np.asarray(pcm, np.float32)
    need = target * HOP
    if len(pcm) < need:
        pcm = np.pad(pcm, (0, need - len(pcm)))
    else:
        pcm = pcm[:need]
    m = np.asarray(_log_mel_device(jnp.asarray(pcm), n_mels))
    m = m[:target]
    if m.shape[0] < target:
        m = np.pad(m, ((0, target - m.shape[0]), (0, 0)),
                   constant_values=m.min())
    return m.T                                    # (n_mels, frames)


# ---------------------------------------------------------------------------
# model forward
# ---------------------------------------------------------------------------
def _ln(x, g, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _attn(x, kv, p, prefix, n_heads, causal):
    T, d = x.shape
    S = kv.shape[0]
    hd = d // n_heads

    def proj(name, src, has_bias=True):
        w = p[f"{prefix}.{name}.w"]
        y = src @ w
        if has_bias and f"{prefix}.{name}.b" in p:
            y = y + p[f"{prefix}.{name}.b"]
        return y

    q = proj("q", x).reshape(T, n_heads, hd).transpose(1, 0, 2)
    k = proj("k", kv, has_bias=False).reshape(S, n_heads, hd).transpose(1, 0, 2)
    v = proj("v", kv).reshape(S, n_heads, hd).transpose(1, 0, 2)
    att = jnp.einsum("hqd,hkd->hqk", q, k,
                     preferred_element_type=jnp.float32) * (hd ** -0.25) ** 2
    if causal:
        mask = jnp.tril(jnp.ones((T, S), bool))
        att = jnp.where(mask[None], att, -1e9)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("hqk,hkd->hqd", att, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(1, 0, 2).reshape(T, d)
    return proj("o", out)


def _mlp(x, p, prefix):
    h = jax.nn.gelu(x @ p[f"{prefix}.fc1.w"] + p[f"{prefix}.fc1.b"],
                    approximate=False)
    return h @ p[f"{prefix}.fc2.w"] + p[f"{prefix}.fc2.b"]


@functools.partial(jax.jit, static_argnums=(2, 3))
def encode_audio(p, mel, n_layers: int, n_heads: int):
    """mel (n_mels, frames) -> (n_audio_ctx, d) encoded audio states."""
    x = mel.T                                         # (frames, n_mels)
    # conv1 k=3 s=1 + gelu
    w1 = p["enc.conv1.w"]                             # (3, n_mels, d)
    xp = jnp.pad(x, ((1, 1), (0, 0)))
    x = sum(xp[i:i + x.shape[0]] @ w1[i] for i in range(3)) + p["enc.conv1.b"]
    x = jax.nn.gelu(x, approximate=False)
    # conv2 k=3 s=2 + gelu
    w2 = p["enc.conv2.w"]
    xp = jnp.pad(x, ((1, 1), (0, 0)))
    T2 = x.shape[0] // 2
    x = sum(xp[2 * jnp.arange(T2) + i] @ w2[i] for i in range(3)) \
        + p["enc.conv2.b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x + p["enc.pos"][:x.shape[0]]
    for i in range(n_layers):
        h = _ln(x, p[f"enc.{i}.ln1.g"], p[f"enc.{i}.ln1.b"])
        x = x + _attn(h, h, p, f"enc.{i}.attn", n_heads, causal=False)
        h = _ln(x, p[f"enc.{i}.ln2.g"], p[f"enc.{i}.ln2.b"])
        x = x + _mlp(h, p, f"enc.{i}.mlp")
    return _ln(x, p["enc.ln_post.g"], p["enc.ln_post.b"])


@functools.partial(jax.jit, static_argnums=(3, 4))
def decode_logits(p, tokens, audio, n_layers: int, n_heads: int):
    """tokens (T,) int32 -> next-token logits (V,)."""
    T = tokens.shape[0]
    x = p["dec.tok_emb"][tokens] + p["dec.pos"][:T]
    for i in range(n_layers):
        h = _ln(x, p[f"dec.{i}.ln1.g"], p[f"dec.{i}.ln1.b"])
        x = x + _attn(h, h, p, f"dec.{i}.attn", n_heads, causal=True)
        h = _ln(x, p[f"dec.{i}.xln.g"], p[f"dec.{i}.xln.b"])
        x = x + _attn(h, audio, p, f"dec.{i}.xattn", n_heads, causal=False)
        h = _ln(x, p[f"dec.{i}.ln2.g"], p[f"dec.{i}.ln2.b"])
        x = x + _mlp(h, p, f"dec.{i}.mlp")
    x = _ln(x[-1], p["dec.ln.g"], p["dec.ln.b"])
    return x @ p["dec.tok_emb"].T


# GPT-2 byte-level decoder table (tokenizer strings -> raw bytes)
@functools.lru_cache(maxsize=1)
def _byte_decoder() -> dict:
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("\xa1"), ord("\xac") + 1)) + \
        list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def decode_tokens(vocab: np.ndarray, ids: list[int]) -> str:
    bd = _byte_decoder()
    out = bytearray()
    V = len(vocab)
    for t in ids:
        if 0 <= t < V:
            for ch in str(vocab[t]):
                if ch in bd:
                    out.append(bd[ch])
                else:
                    out.extend(ch.encode("utf-8"))
    return out.decode("utf-8", errors="replace").strip()


class WhisperModel:
    """Loads a converted Whisper checkpoint and transcribes base64 WAV."""

    def __init__(self, model_name: str, models_dir: str = ""):
        self.model_name = model_name
        models_dir = models_dir or os.environ.get("TS_MODELS_DIR", "models")
        fname = model_name.replace("ts/", "").replace("/", "-") + ".npz"
        path = os.path.join(models_dir, fname)
        if not os.path.exists(path):
            # repo-shipped checkpoints (ts/whisper-mini trained from scratch
            # by models/train_voice.py — the reference instead downloads
            # ggml checkpoints at runtime, vq_model.h:39-51)
            pkg = os.path.join(os.path.dirname(__file__), "checkpoints",
                               model_name.replace("/", "_") + ".npz")
            if os.path.exists(pkg):
                path = pkg
        if not os.path.exists(path):
            raise BadRequest(
                f"Voice query model `{model_name}` is not available: no "
                f"checkpoint at {path}. Convert a local HuggingFace Whisper "
                f"checkpoint with `python -m typesense_tpu.models.convert "
                f"--whisper <dir> {path}`.")
        raw = dict(np.load(path, allow_pickle=False))
        cfg = raw.pop("cfg").astype(np.int64)
        (self.n_mels, self.n_audio_ctx, _d_a, self.n_audio_head,
         self.n_audio_layer, self.n_text_ctx, _d_t, self.n_text_head,
         self.n_text_layer, self.n_vocab, self.sot, self.eot, self.no_ts,
         self.lang_en, self.task_transcribe) = [int(x) for x in cfg[:15]]
        self.vocab = raw.pop("vocab")
        self.params = {k: jnp.asarray(v) for k, v in raw.items()}

    def transcribe(self, audio_base64: str) -> str:
        try:
            data = base64.b64decode(audio_base64, validate=False)
        except Exception:
            raise BadRequest("`voice_query` is not valid base64 data.")
        pcm = read_wav(data)
        mel = log_mel(pcm, self.n_mels, self.n_audio_ctx)
        audio = encode_audio(self.params, jnp.asarray(mel),
                             self.n_audio_layer, self.n_audio_head)
        tokens = [self.sot]
        if self.lang_en >= 0:
            tokens.append(self.lang_en)
        if self.task_transcribe >= 0:
            tokens.append(self.task_transcribe)
        if self.no_ts >= 0:
            tokens.append(self.no_ts)
        prompt_len = len(tokens)
        ban = np.zeros(self.n_vocab, bool)
        ban[self.eot + 1:] = True          # specials/timestamps never emit
        ban_j = jnp.asarray(ban)
        for _ in range(min(MAX_DECODE_TOKENS,
                           self.n_text_ctx - prompt_len - 1)):
            logits = decode_logits(self.params,
                                   jnp.asarray(tokens, jnp.int32), audio,
                                   self.n_text_layer, self.n_text_head)
            logits = jnp.where(ban_j, -jnp.inf, logits)
            nxt = int(jnp.argmax(logits))
            if nxt == self.eot:
                break
            tokens.append(nxt)
        return decode_tokens(self.vocab, tokens[prompt_len:])


class VQModelManager:
    """vq_model_manager equivalent: one shared model per name."""

    def __init__(self, models_dir: str = ""):
        self.models_dir = models_dir
        self._cache: dict[str, WhisperModel] = {}

    def get(self, model_name: str) -> WhisperModel:
        m = self._cache.get(model_name)
        if m is None:
            m = WhisperModel(model_name, self.models_dir)
            self._cache[model_name] = m
        return m
