"""LLM-backed subsystems: conversation (RAG) models, natural-language search
models, and personalization models.

Reference contract: /root/reference/src/conversation_model.cpp (providers
OpenAI/Azure/Cloudflare/vLLM; standalone-question rewrite + context stuffing
+ answer generation), conversation_manager.cpp:461 (TTL'd history
collection), natural_language_search_model.cpp (LLM -> structured
filter_by/sort_by/q params with schema-prompt caching),
personalization_model.h:12-40 (user event history -> query vector).

All remote providers speak an OpenAI-compatible chat completions API over
HTTP. Egress is environment-gated: network failures surface as 400s, and the
registries/validation/history plumbing work without any provider reachable.
The personalization path runs locally on TPU via the JAX text encoder
(models/embedder.py) instead of an ONNX session.
"""

from __future__ import annotations

import json
import threading
import time

from typesense_tpu.core.errors import BadRequest, NotFound

SUPPORTED_PROVIDERS = ("openai", "azure", "cloudflare", "vllm", "google")


def _provider_of(model_name: str) -> str:
    return model_name.split("/", 1)[0] if "/" in model_name else ""


def chat_complete(model: dict, messages: list[dict],
                  max_tokens: int = 1024) -> str:
    """One chat-completions call (conversation_model.cpp get_answer)."""
    import urllib.request
    name = model.get("model_name", "")
    provider = _provider_of(name)
    url = model.get("api_url") or {
        "openai": "https://api.openai.com/v1/chat/completions",
    }.get(provider)
    if not url:
        raise BadRequest(f"Model provider `{provider}` needs an `api_url`.")
    body = json.dumps({
        "model": name.split("/", 1)[-1],
        "messages": messages,
        "max_tokens": max_tokens,
    }).encode()
    req = urllib.request.Request(url, data=body, method="POST", headers={
        "Authorization": f"Bearer {model.get('api_key', '')}",
        "Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            data = json.loads(resp.read().decode())
        return data["choices"][0]["message"]["content"]
    except Exception as e:  # noqa: BLE001 — egress-gated environment
        raise BadRequest(f"LLM request failed: {e}")


def chat_complete_stream(model: dict, messages: list[dict],
                         max_tokens: int = 1024):
    """Streaming chat-completions call: yields content deltas as they
    arrive from the provider's SSE stream (OpenAIConversationModel::
    get_answer_stream, /root/reference/src/conversation_model.cpp:541 —
    `stream: true` + `data: {...}` line parsing)."""
    import urllib.request
    name = model.get("model_name", "")
    provider = _provider_of(name)
    url = model.get("api_url") or {
        "openai": "https://api.openai.com/v1/chat/completions",
    }.get(provider)
    if not url:
        raise BadRequest(f"Model provider `{provider}` needs an `api_url`.")
    body = json.dumps({
        "model": name.split("/", 1)[-1],
        "messages": messages,
        "max_tokens": max_tokens,
        "stream": True,
    }).encode()
    req = urllib.request.Request(url, data=body, method="POST", headers={
        "Authorization": f"Bearer {model.get('api_key', '')}",
        "Content-Type": "application/json"})
    try:
        resp = urllib.request.urlopen(req, timeout=60)
    except Exception as e:  # noqa: BLE001 — egress-gated environment
        raise BadRequest(f"LLM request failed: {e}")
    try:
        for raw in resp:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line.startswith("data:"):
                continue
            payload = line[len("data:"):].strip()
            if payload == "[DONE]":
                break
            try:
                data = json.loads(payload)
            except json.JSONDecodeError:
                continue
            delta = (data.get("choices") or [{}])[0].get(
                "delta", {}).get("content")
            if delta:
                yield delta
    finally:
        resp.close()


class ConversationModelManager:
    """conversations/models registry + RAG search glue
    (conversation_model.cpp, conversation_manager.cpp)."""

    def __init__(self, store=None, collection_manager=None):
        self.store = store
        self.collections = collection_manager
        self.models: dict[str, dict] = {}
        self._next = 0
        self._lock = threading.Lock()

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan("$CVM_"):
            m = json.loads(v)
            self.models[m["id"]] = m

    def _persist(self, m: dict):
        if self.store is not None:
            self.store.batch_write({f"$CVM_{m['id']}": json.dumps(m)})

    def create(self, body: dict) -> dict:
        name = body.get("model_name", "")
        if _provider_of(name) not in SUPPORTED_PROVIDERS:
            raise BadRequest(f"Model namespace `{_provider_of(name)}` is not "
                             f"supported.")
        if not body.get("history_collection"):
            raise BadRequest("Property `history_collection` is missing.")
        if "max_bytes" not in body:
            raise BadRequest("Property `max_bytes` is missing.")
        with self._lock:
            mid = body.get("id") or f"conv-model-{self._next}"
            self._next += 1
            m = {**body, "id": mid, "ttl": int(body.get("ttl", 86400))}
            self.models[mid] = m
            self._persist(m)
        return m

    def update(self, mid: str, body: dict) -> dict:
        if mid not in self.models:
            raise NotFound("Model not found")
        m = {**self.models[mid], **body, "id": mid}
        self.models[mid] = m
        self._persist(m)
        return m

    def get(self, mid: str) -> dict:
        m = self.models.get(mid)
        if m is None:
            raise NotFound("Model not found")
        return m

    def list(self) -> list[dict]:
        return list(self.models.values())

    def delete(self, mid: str) -> dict:
        m = self.models.pop(mid, None)
        if m is None:
            raise NotFound("Model not found")
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"$CVM_{mid}"])
        return m

    # -- RAG flow (get_answer + context stuffing) ------------------------
    def converse(self, model_id: str, question: str, search_results: list[dict],
                 conversation_id: str | None = None) -> dict:
        m = self.get(model_id)
        max_bytes = int(m.get("max_bytes", 16384))
        ctx_lines = []
        used = 0
        for hit in search_results:
            line = json.dumps(hit.get("document", {}), ensure_ascii=False)
            if used + len(line) > max_bytes:
                break
            ctx_lines.append(line)
            used += len(line)
        history = self._history(m, conversation_id)
        messages = [{"role": "system",
                     "content": m.get("system_prompt",
                                      "Answer using only the given context.")}]
        messages += history
        messages.append({"role": "user",
                         "content": f"Context:\n" + "\n".join(ctx_lines) +
                                    f"\n\nQuestion: {question}"})
        answer = chat_complete(m, messages)
        cid = conversation_id or f"conv-{int(time.time() * 1000)}"
        self._append_history(m, cid, question, answer)
        return {"answer": answer, "conversation_id": cid,
                "query": question}

    def converse_stream(self, model_id: str, question: str,
                        search_results: list[dict],
                        conversation_id: str | None = None):
        """Streaming RAG answer: yields SSE event strings
        (`data: {...}\\n\\n` ... `data: [DONE]\\n\\n`), mirroring the
        reference's conversation_stream=true flow (core_api.cpp:739-764 —
        the conversation_id is created IN ADVANCE and sent with each
        delta event; history is appended once the stream completes)."""
        m = self.get(model_id)
        max_bytes = int(m.get("max_bytes", 16384))
        ctx_lines, used = [], 0
        for hit in search_results:
            line = json.dumps(hit.get("document", {}), ensure_ascii=False)
            if used + len(line) > max_bytes:
                break
            ctx_lines.append(line)
            used += len(line)
        history = self._history(m, conversation_id)
        messages = [{"role": "system",
                     "content": m.get("system_prompt",
                                      "Answer using only the given context.")}]
        messages += history
        messages.append({"role": "user",
                         "content": "Context:\n" + "\n".join(ctx_lines) +
                                    f"\n\nQuestion: {question}"})
        cid = conversation_id or f"conv-{int(time.time() * 1000)}"
        parts: list[str] = []
        for delta in chat_complete_stream(m, messages):
            parts.append(delta)
            yield "data: " + json.dumps(
                {"conversation": {"answer": delta, "conversation_id": cid,
                                  "query": question}},
                ensure_ascii=False) + "\n\n"
        answer = "".join(parts)
        self._append_history(m, cid, question, answer)
        yield "data: " + json.dumps(
            {"conversation": {"answer": answer, "conversation_id": cid,
                              "query": question, "complete": True}},
            ensure_ascii=False) + "\n\n"
        yield "data: [DONE]\n\n"

    def _history_coll(self, m: dict):
        if self.collections is None:
            return None
        try:
            return self.collections.get_collection(m["history_collection"])
        except Exception:  # noqa: BLE001
            return None

    def _history(self, m: dict, cid: str | None) -> list[dict]:
        coll = self._history_coll(m)
        if coll is None or not cid:
            return []
        out = []
        ttl = int(m.get("ttl", 86400))
        now = int(time.time())
        for _seq, doc in sorted(coll.docs.items()):
            if doc.get("conversation_id") == cid and \
                    now - int(doc.get("timestamp", now)) <= ttl:
                out.append({"role": doc.get("role", "user"),
                            "content": doc.get("message", "")})
        return out

    def _append_history(self, m: dict, cid: str, question: str, answer: str):
        coll = self._history_coll(m)
        if coll is None:
            return
        ts = int(time.time())
        coll.add({"conversation_id": cid, "role": "user",
                  "message": question, "timestamp": ts}, operation="create")
        coll.add({"conversation_id": cid, "role": "assistant",
                  "message": answer, "timestamp": ts}, operation="create")


class NLSearchModelManager:
    """nl_search_models registry: LLM translates a free-form query into
    structured search params (natural_language_search_model.cpp)."""

    def __init__(self, store=None):
        self.store = store
        self.models: dict[str, dict] = {}
        self._next = 0

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan("$NLM_"):
            m = json.loads(v)
            self.models[m["id"]] = m

    def create(self, body: dict) -> dict:
        name = body.get("model_name", "")
        if _provider_of(name) not in SUPPORTED_PROVIDERS:
            raise BadRequest(f"Model namespace `{_provider_of(name)}` is not "
                             f"supported.")
        mid = body.get("id") or f"nl-model-{self._next}"
        self._next += 1
        m = {**body, "id": mid}
        self.models[mid] = m
        if self.store is not None:
            self.store.batch_write({f"$NLM_{mid}": json.dumps(m)})
        return m

    def update(self, mid: str, body: dict) -> dict:
        if mid not in self.models:
            raise NotFound("Model not found")
        m = {**self.models[mid], **body, "id": mid}
        self.models[mid] = m
        if self.store is not None:
            self.store.batch_write({f"$NLM_{mid}": json.dumps(m)})
        return m

    def get(self, mid: str) -> dict:
        m = self.models.get(mid)
        if m is None:
            raise NotFound("Model not found")
        return m

    def list(self) -> list[dict]:
        return list(self.models.values())

    def delete(self, mid: str) -> dict:
        m = self.models.pop(mid, None)
        if m is None:
            raise NotFound("Model not found")
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"$NLM_{mid}"])
        return m

    def generate_params(self, mid: str, query: str, schema_prompt: str) -> dict:
        """Free-form query -> {q, filter_by, sort_by} via the LLM
        (core_api.cpp:687 NL param augmentation)."""
        m = self.get(mid)
        sys_p = (m.get("system_prompt") or
                 "Translate the user's request into JSON with keys q, "
                 "filter_by, sort_by for a search engine. Schema:\n")
        content = chat_complete(m, [
            {"role": "system", "content": sys_p + schema_prompt},
            {"role": "user", "content": query}])
        try:
            start = content.index("{")
            end = content.rindex("}")
            return json.loads(content[start:end + 1])
        except (ValueError, json.JSONDecodeError):
            raise BadRequest("NL model returned unparseable params.")


class PersonalizationModelManager:
    """personalization/models registry (personalization_model.h:12-40).
    The reference runs an ONNX "tyrec-1" recommendation model; here user
    event history embeds through the JAX text encoder into a query vector on
    the TPU."""

    def __init__(self, store=None, embedders=None):
        self.store = store
        self.embedders = embedders
        self.models: dict[str, dict] = {}
        self._next = 0

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan("$PSM_"):
            m = json.loads(v)
            self.models[m["id"]] = m

    def create(self, body: dict) -> dict:
        if body.get("type") not in ("recommendation", "search"):
            raise BadRequest("Property `type` must be `recommendation` or `search`.")
        if not body.get("collection"):
            raise BadRequest("Property `collection` is missing.")
        mid = body.get("id") or f"pers-model-{self._next}"
        self._next += 1
        m = {**body, "id": mid}
        self.models[mid] = m
        if self.store is not None:
            self.store.batch_write({f"$PSM_{mid}": json.dumps(m)})
        return m

    def update(self, mid: str, body: dict) -> dict:
        if mid not in self.models:
            raise NotFound("Model not found")
        m = {**self.models[mid], **body, "id": mid}
        self.models[mid] = m
        if self.store is not None:
            self.store.batch_write({f"$PSM_{mid}": json.dumps(m)})
        return m

    def get(self, mid: str) -> dict:
        m = self.models.get(mid)
        if m is None:
            raise NotFound("Model not found")
        return m

    def list(self) -> list[dict]:
        return list(self.models.values())

    def delete(self, mid: str) -> dict:
        m = self.models.pop(mid, None)
        if m is None:
            raise NotFound("Model not found")
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"$PSM_{mid}"])
        return m

    # -- tyrec-equivalent tower (models/personalization.py) ---------------

    def _tower_params(self, m: dict):
        """Load (and cache) trained tower params for a model; None when the
        model has no checkpoint (falls back to mean pooling)."""
        ckpt = m.get("checkpoint")
        if not ckpt:
            return None
        cache = getattr(self, "_tower_cache", None)
        if cache is None:
            cache = self._tower_cache = {}
        hit = cache.get(m["id"])
        if hit is not None and hit[0] == ckpt:
            return hit[1]
        from typesense_tpu.models import personalization as P
        try:
            params, _dim = P.load_npz(ckpt)
        except OSError:
            return None
        cache[m["id"]] = (ckpt, params)
        return params

    def _embed_events(self, m: dict, event_texts: list[str]):
        enc = self.embedders.get({"model_name":
                                  m.get("model_name", "ts/all-MiniLM-L6-v2")})
        return enc.embed_batch(event_texts)

    def user_vector(self, mid: str, event_texts: list[str]):
        """Embed user event history into one query vector. With a trained
        checkpoint the tyrec-equivalent tower runs (recency-positional
        transformer + attention pooling, personalization_model.h:30
        embed_recommendations); otherwise mean-of-history, L2-normalized."""
        import numpy as np
        m = self.get(mid)
        if self.embedders is None or not event_texts:
            raise BadRequest("No embedder or events available.")
        vecs = self._embed_events(m, event_texts)
        params = self._tower_params(m)
        if params is not None:
            from typesense_tpu.models import personalization as P
            hist, mask = P.pad_history(list(vecs), vecs.shape[1])
            u = P.embed_recommendations(params, hist[None], mask[None])[0]
            return [float(x) for x in np.asarray(u)]
        v = vecs.mean(axis=0)
        n = float(np.linalg.norm(v))
        return (v / n if n > 0 else v).tolist()

    def user_vector_from_embeddings(self, mid: str,
                                    vectors: list[list[float]]):
        """Like user_vector but over raw per-event embedding vectors pulled
        from documents' user_field (collection.cpp:8186-8230
        embed_recommendations over stored vectors, not re-embedded text)."""
        import numpy as np
        m = self.get(mid)
        if not vectors:
            raise BadRequest("No events found for the user.")
        dim = len(vectors[0])
        params = self._tower_params(m)
        if params is not None:
            from typesense_tpu.models import personalization as P
            hist, mask = P.pad_history(
                [np.asarray(v, np.float32) for v in vectors], dim)
            u = P.embed_recommendations(params, hist[None], mask[None])[0]
            return [float(x) for x in np.asarray(u)]
        v = np.mean(np.asarray(vectors, np.float32), axis=0)
        n = float(np.linalg.norm(v))
        return (v / n if n > 0 else v).tolist()

    def train(self, mid: str, user_histories: list[list[str]],
              steps: int = 200, lr: float = 1e-3) -> dict:
        """Fit the tower on per-user event histories (newest last) with the
        InfoNCE next-item objective, persist the checkpoint, and switch the
        model to the trained tower. The reference ships pretrained ONNX;
        training in-process on the serving accelerator is the TPU-native
        equivalent (same arrays serve and train)."""
        import os
        import numpy as np
        m = self.get(mid)
        if self.embedders is None:
            raise BadRequest("No embedder available.")
        hs = [h for h in user_histories if len(h) >= 2]
        if len(hs) < 4:
            raise BadRequest("Need at least 4 users with >=2 events each.")
        from typesense_tpu.models import personalization as P
        dim = None
        hist_arr, mask_arr = [], []
        for h in hs:
            vecs = self._embed_events(m, h[-(P.MAX_HIST + 1):])
            dim = vecs.shape[1]
            # newest LAST in input -> pad_history flips to newest-first
            hist, mask = P.pad_history(list(vecs), dim)
            hist_arr.append(hist)
            mask_arr.append(mask)
        params = self._tower_params(m) or P.init_params(dim)
        params, losses = P.fit(params, np.stack(hist_arr),
                               np.stack(mask_arr), steps=steps, lr=lr)
        out_dir = m.get("model_dir") or os.environ.get(
            "TYPESENSE_MODEL_DIR") or "/tmp/ts_models"
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"pers_{mid}.npz")
        P.save_npz(path, params, dim)
        getattr(self, "_tower_cache", {}).pop(mid, None)
        self.update(mid, {"checkpoint": path})
        return {"id": mid, "checkpoint": path, "users": len(hs),
                "steps": steps, "loss_start": round(losses[0], 4),
                "loss_end": round(losses[-1], 4)}
