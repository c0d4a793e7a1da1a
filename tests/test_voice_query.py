"""Voice query pipeline: WAV decode, log-mel features, Whisper forward +
greedy decode with a tiny random checkpoint, tokenizer byte-decode, and the
HTTP-level voice_query flow (vq_model.h:39-51; collection.cpp:2137-2148)."""

import base64
import io
import struct
import wave

import numpy as np
import pytest

from typesense_tpu.core.errors import BadRequest
from typesense_tpu.models.voice import (
    SAMPLE_RATE, WhisperModel, decode_tokens, log_mel, mel_filterbank,
    read_wav,
)


def make_wav(samples: np.ndarray, rate: int = SAMPLE_RATE,
             channels: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
        else:
            pcm = ((np.clip(samples, -1, 1) * 127) + 128).astype(np.uint8)
        if channels == 2:
            pcm = np.repeat(pcm, 2)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def tone(freq=440.0, secs=0.5, rate=SAMPLE_RATE):
    t = np.arange(int(secs * rate)) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


# ---------------------------------------------------------------------------
def test_read_wav_pcm16_roundtrip():
    x = tone()
    out = read_wav(make_wav(x))
    assert out.dtype == np.float32
    assert len(out) == len(x)
    assert np.allclose(out, x, atol=2e-4)


def test_read_wav_stereo_mixdown_and_resample():
    x = tone(rate=8000, secs=0.25)
    out = read_wav(make_wav(x, rate=8000, channels=2))
    # resampled 8k -> 16k doubles the sample count (within rounding)
    assert abs(len(out) - 2 * len(x)) <= 2


def test_read_wav_pcm8():
    x = tone(secs=0.1)
    out = read_wav(make_wav(x, width=1))
    assert np.corrcoef(out, x[:len(out)])[0, 1] > 0.98


def test_read_wav_rejects_garbage():
    with pytest.raises(BadRequest):
        read_wav(b"not a wav file at all........................")


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    # every filter has some mass; band centers ascend
    assert (fb.sum(axis=1) > 0).all()
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_log_mel_shape_and_range():
    m = log_mel(tone(secs=1.0), 80, n_audio_ctx=1500)
    assert m.shape == (80, 3000)
    assert np.isfinite(m).all()
    # whisper normalization keeps values in [-1ish, 1ish]
    assert m.max() <= 1.5 and m.min() >= -1.5


def test_decode_tokens_byte_level():
    # GPT-2 byte-level: "Ġ" encodes a space
    vocab = np.asarray(["hello", "Ġworld", "!"])
    assert decode_tokens(vocab, [0, 1, 2]) == "hello world!"


# ---------------------------------------------------------------------------
def tiny_checkpoint(path, d=32, heads=2, layers=1, n_mels=16, vocab_n=64,
                    n_audio_ctx=96, n_text_ctx=32, seed=5):
    rng = np.random.default_rng(seed)

    def mat(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    arrays = {
        "enc.conv1.w": mat(3, n_mels, d), "enc.conv1.b": mat(d),
        "enc.conv2.w": mat(3, d, d), "enc.conv2.b": mat(d),
        "enc.pos": mat(n_audio_ctx, d),
        "enc.ln_post.g": np.ones(d, np.float32),
        "enc.ln_post.b": np.zeros(d, np.float32),
        "dec.tok_emb": mat(vocab_n, d), "dec.pos": mat(n_text_ctx, d),
        "dec.ln.g": np.ones(d, np.float32),
        "dec.ln.b": np.zeros(d, np.float32),
    }
    for pre, n in (("enc", layers), ("dec", layers)):
        for i in range(n):
            for blk in ([f"{pre}.{i}.attn"] +
                        ([f"{pre}.{i}.xattn"] if pre == "dec" else [])):
                arrays.update({
                    f"{blk}.q.w": mat(d, d), f"{blk}.q.b": mat(d),
                    f"{blk}.k.w": mat(d, d),
                    f"{blk}.v.w": mat(d, d), f"{blk}.v.b": mat(d),
                    f"{blk}.o.w": mat(d, d), f"{blk}.o.b": mat(d),
                })
            for ln in ["ln1", "ln2"] + (["xln"] if pre == "dec" else []):
                arrays[f"{pre}.{i}.{ln}.g"] = np.ones(d, np.float32)
                arrays[f"{pre}.{i}.{ln}.b"] = np.zeros(d, np.float32)
            arrays[f"{pre}.{i}.mlp.fc1.w"] = mat(d, 2 * d)
            arrays[f"{pre}.{i}.mlp.fc1.b"] = mat(2 * d)
            arrays[f"{pre}.{i}.mlp.fc2.w"] = mat(2 * d, d)
            arrays[f"{pre}.{i}.mlp.fc2.b"] = mat(d)
    # vocab: text tokens then specials [sot, eot] at the end
    sot, eot = vocab_n - 2, vocab_n - 1
    vocab = [f"tok{i}Ġ" for i in range(vocab_n - 2)] + ["<|sot|>", "<|eot|>"]
    arrays["vocab"] = np.asarray(vocab)
    arrays["cfg"] = np.asarray(
        [n_mels, n_audio_ctx, d, heads, layers, n_text_ctx, d, heads,
         layers, vocab_n, sot, eot, -1, -1, -1], np.int64)
    np.savez(path, **arrays)


def test_whisper_transcribe_tiny(tmp_path):
    tiny_checkpoint(tmp_path / "tiny-voice.npz")
    m = WhisperModel("ts/tiny-voice", models_dir=str(tmp_path))
    b64 = base64.b64encode(make_wav(tone(secs=0.4))).decode()
    out1 = m.transcribe(b64)
    out2 = m.transcribe(b64)
    assert isinstance(out1, str)
    assert out1 == out2          # deterministic greedy decode
    # different audio -> the forward actually consumes the features
    b64b = base64.b64encode(make_wav(tone(freq=1200.0, secs=0.4))).decode()
    assert isinstance(m.transcribe(b64b), str)


def test_whisper_missing_checkpoint(tmp_path):
    with pytest.raises(BadRequest, match="not available"):
        WhisperModel("ts/nope", models_dir=str(tmp_path))


# ---------------------------------------------------------------------------
def test_http_voice_query_flow(tmp_path):
    from tests.test_http_api import call, make_server  # reuse harness
    from typesense_tpu.core.store import Store

    tiny_checkpoint(tmp_path / "tiny-voice.npz")
    srv = make_server(Store(str(tmp_path / "db")))
    call(srv, "POST", "/collections", body={
        "name": "songs",
        "fields": [{"name": "title", "type": "string"}],
        "voice_query_model": {"model_name": "ts/tiny-voice"},
    })
    call(srv, "POST", "/collections/songs/documents", body={"title": "hello"})
    import typesense_tpu.models.voice as V
    srv.vq_models = V.VQModelManager(str(tmp_path))
    b64 = base64.b64encode(make_wav(tone(secs=0.3))).decode()
    code, res = call(srv, "GET", "/collections/songs/documents/search",
                     query={"q": "ignored", "query_by": "title",
                            "voice_query": b64})
    assert code == 200
    assert "voice_query" in res.get("request_params", {})
    assert isinstance(
        res["request_params"]["voice_query"]["transcribed_query"], str)

    # collection without the model -> reference-parity 400
    call(srv, "POST", "/collections", body={
        "name": "plain", "fields": [{"name": "t", "type": "string"}]})
    code, res = call(srv, "GET", "/collections/plain/documents/search",
                     query={"q": "x", "query_by": "t", "voice_query": b64})
    assert code == 400
    assert "voice_query_model" in res["message"]
