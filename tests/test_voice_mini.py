"""Shipped ts/whisper-mini checkpoint: genuine from-scratch speech model
(models/train_voice.py) served through the real voice_query path.

The reference downloads whisper.cpp ggml checkpoints at runtime
(vq_model.h:39-51); we ship a trained-from-scratch checkpoint inside the
package (models/checkpoints/ts_whisper-mini.npz) so voice search works by
default with zero egress. Held-out utterances use noise/jitter draws the
trainer never saw (seeds past its training range) — exact-transcript
accuracy on them measures real generalization, not waveform memorization.
"""

import base64

import numpy as np
import pytest

from typesense_tpu.models.train_voice import make_sample, pcm_to_wav_bytes
from typesense_tpu.models.voice import WhisperModel


@pytest.fixture(scope="module")
def model():
    # empty models_dir -> package-checkpoint fallback (voice.py:291-296)
    return WhisperModel("ts/whisper-mini", models_dir="/nonexistent")


def test_shipped_checkpoint_loads_from_package(model):
    assert model.n_vocab > 0 and model.n_mels == 80


def test_held_out_transcription_accuracy(model):
    rng = np.random.default_rng(7777)  # disjoint from train + trainer eval
    ok, n = 0, 8
    for _ in range(n):
        _, _, _, _, text, pcm = make_sample(rng)
        got = model.transcribe(
            base64.b64encode(pcm_to_wav_bytes(pcm)).decode())
        ok += int(got == text)
    assert ok >= n - 1, f"held-out accuracy {ok}/{n}"


def test_http_voice_search_with_shipped_model(tmp_path, model):
    from tests.test_http_api import call, make_server
    from typesense_tpu.core.store import Store

    srv = make_server(Store(str(tmp_path / "db")))
    call(srv, "POST", "/collections", body={
        "name": "songs",
        "fields": [{"name": "title", "type": "string"}],
        "voice_query_model": {"model_name": "ts/whisper-mini"},
    })
    # synthesize an utterance, index its transcript, search by voice
    rng = np.random.default_rng(8888)
    _, _, _, _, text, pcm = make_sample(rng)
    call(srv, "POST", "/collections/songs/documents", body={"title": text})
    call(srv, "POST", "/collections/songs/documents",
         body={"title": "completely unrelated words"})
    b64 = base64.b64encode(pcm_to_wav_bytes(pcm)).decode()
    code, res = call(srv, "GET", "/collections/songs/documents/search",
                     query={"q": "ignored", "query_by": "title",
                            "voice_query": b64})
    assert code == 200
    assert res["request_params"]["voice_query"]["transcribed_query"] == text
    assert res["found"] >= 1
    assert res["hits"][0]["document"]["title"] == text
