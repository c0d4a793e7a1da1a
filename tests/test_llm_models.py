"""Conversation/NL/personalization model registry tests (reference:
conversation_model.cpp validation, natural_language_search_model.cpp).
Remote LLM calls are egress-gated; these tests cover registries, validation,
history plumbing, and the local personalization vector path."""

import pytest

from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.manager import CollectionManager
from typesense_tpu.models.llm import (
    ConversationModelManager, NLSearchModelManager,
    PersonalizationModelManager,
)


def test_conversation_model_crud():
    cm = ConversationModelManager()
    with pytest.raises(BadRequest):
        cm.create({"model_name": "bogus/x", "history_collection": "h",
                   "max_bytes": 1000})
    with pytest.raises(BadRequest):
        cm.create({"model_name": "openai/gpt-4o-mini", "max_bytes": 1000})
    m = cm.create({"model_name": "openai/gpt-4o-mini",
                   "history_collection": "h", "max_bytes": 1000,
                   "api_key": "sk-x"})
    assert m["id"].startswith("conv-model-")
    assert cm.get(m["id"])["model_name"] == "openai/gpt-4o-mini"
    cm.update(m["id"], {"max_bytes": 2000})
    assert cm.get(m["id"])["max_bytes"] == 2000
    assert len(cm.list()) == 1
    cm.delete(m["id"])
    with pytest.raises(NotFound):
        cm.get(m["id"])


def test_conversation_history_roundtrip():
    mgr = CollectionManager(store=None)
    mgr.create_collection({"name": "hist", "fields": [
        {"name": "conversation_id", "type": "string"},
        {"name": "role", "type": "string"},
        {"name": "message", "type": "string"},
        {"name": "timestamp", "type": "int64"}]})
    cm = ConversationModelManager(collection_manager=mgr)
    m = cm.create({"model_name": "openai/gpt-4o-mini",
                   "history_collection": "hist", "max_bytes": 1000})
    cm._append_history(m, "c1", "what is tpu?", "a chip.")
    hist = cm._history(m, "c1")
    assert [h["role"] for h in hist] == ["user", "assistant"]
    assert hist[0]["content"] == "what is tpu?"
    assert cm._history(m, "c2") == []


def test_conversation_remote_gated():
    cm = ConversationModelManager()
    m = cm.create({"model_name": "openai/gpt-4o-mini",
                   "history_collection": "h", "max_bytes": 100,
                   "api_key": "sk-x",
                   "api_url": "http://127.0.0.1:9/v1/chat/completions"})
    with pytest.raises(BadRequest):
        cm.converse(m["id"], "hello?", [])


def test_nl_model_crud():
    nm = NLSearchModelManager()
    m = nm.create({"model_name": "openai/gpt-4o-mini", "api_key": "x"})
    assert nm.get(m["id"])
    nm.update(m["id"], {"system_prompt": "be terse"})
    assert nm.get(m["id"])["system_prompt"] == "be terse"
    nm.delete(m["id"])
    assert nm.list() == []


def test_personalization_local_vector():
    from typesense_tpu.models.embedder import EmbedderManager
    pm = PersonalizationModelManager(embedders=EmbedderManager())
    with pytest.raises(BadRequest):
        pm.create({"type": "bogus", "collection": "c"})
    m = pm.create({"type": "recommendation", "collection": "products",
                   "model_name": "ts/all-MiniLM-L6-v2"})
    v = pm.user_vector(m["id"], ["clicked red socks", "bought blue socks"])
    assert len(v) == 384
    import numpy as np
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
