"""tyrec-equivalent personalization tower (models/personalization.py;
reference: /root/reference/include/personalization_model.h:12-40).

The key claim is LEARNED ranking behavior: the synthetic task maps a user's
history to a next-item direction that is a fixed rotation of the history
mix — mean pooling cannot express it, the trained tower can."""

import numpy as np
import pytest

from typesense_tpu.models import personalization as P


def _make_task(U=48, D=32, H=6, seed=3):
    rng = np.random.default_rng(seed)
    # fixed orthogonal rotation: target = R @ (recency-weighted history mix)
    A = rng.standard_normal((D, D)).astype(np.float32)
    R, _ = np.linalg.qr(A)
    users = rng.standard_normal((U, D)).astype(np.float32)
    users /= np.linalg.norm(users, axis=1, keepdims=True)
    hists = np.zeros((U, P.MAX_HIST, D), np.float32)
    masks = np.zeros((U, P.MAX_HIST), np.float32)
    for i in range(U):
        items = users[i] + 0.25 * rng.standard_normal((H, D)).astype(
            np.float32)
        items /= np.linalg.norm(items, axis=1, keepdims=True)
        target = (R @ items.mean(axis=0)).astype(np.float32)
        target /= np.linalg.norm(target)
        # row 0 = newest = held-out target; rows 1..H = history
        hists[i, 0] = target
        hists[i, 1:H + 1] = items
        masks[i, :H + 1] = 1.0
    return hists, masks


def _recall_at_1(user_vecs, targets):
    t = targets / np.linalg.norm(targets, axis=1, keepdims=True)
    sims = np.asarray(user_vecs) @ t.T
    return float(np.mean(np.argmax(sims, axis=1) == np.arange(len(t))))


def test_trained_tower_beats_mean_pooling():
    hists, masks = _make_task()
    targets = hists[:, 0, :].copy()
    inputs = np.concatenate(
        [hists[:, 1:, :], np.zeros_like(hists[:, :1, :])], axis=1)
    in_masks = np.concatenate(
        [masks[:, 1:], np.zeros_like(masks[:, :1])], axis=1)

    # mean-pooling baseline cannot express the rotation
    mean_u = (inputs * in_masks[:, :, None]).sum(1) / \
        np.maximum(in_masks.sum(1), 1)[:, None]
    base = _recall_at_1(mean_u, targets)

    params = P.init_params(hists.shape[-1])
    params, losses = P.fit(params, hists, masks, steps=220, lr=3e-3)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    trained_u = P.embed_recommendations(params, inputs, in_masks)
    trained = _recall_at_1(trained_u, targets)
    assert trained >= 0.75, f"trained recall@1 {trained}"
    assert trained > base + 0.3, f"trained {trained} vs mean {base}"


def test_forward_contract():
    D = 16
    params = P.init_params(D, seed=1)
    hist, mask = P.pad_history([np.ones(D), np.arange(D)], D)
    assert mask.sum() == 2 and hist.shape == (P.MAX_HIST, D)
    # newest-first: the LAST list element lands in row 0
    assert np.allclose(hist[0], np.arange(D))
    u = np.asarray(P.embed_recommendations(params, hist[None], mask[None])[0])
    assert u.shape == (D,)
    assert abs(np.linalg.norm(u) - 1.0) < 1e-3
    # padding rows must not influence the embedding
    hist2 = hist.copy()
    hist2[5:] = 99.0
    u2 = np.asarray(P.embed_recommendations(
        params, hist2[None], mask[None])[0])
    assert np.allclose(u, u2, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    D = 16
    params = P.init_params(D, seed=2)
    path = str(tmp_path / "tower.npz")
    P.save_npz(path, params, D)
    loaded, dim = P.load_npz(path)
    assert dim == D
    hist, mask = P.pad_history([np.ones(D)], D)
    a = np.asarray(P.embed_recommendations(params, hist[None], mask[None]))
    b = np.asarray(P.embed_recommendations(loaded, hist[None], mask[None]))
    assert np.allclose(a, b)


def test_manager_train_and_user_vector(tmp_path, monkeypatch):
    from typesense_tpu.models.embedder import EmbedderManager
    from typesense_tpu.models.llm import PersonalizationModelManager

    monkeypatch.setenv("TYPESENSE_MODEL_DIR", str(tmp_path))
    mgr = PersonalizationModelManager(None, EmbedderManager())
    m = mgr.create({"type": "recommendation", "collection": "products"})
    rng = np.random.default_rng(0)
    topics = [["red shoes", "crimson sneakers", "scarlet boots",
               "ruby sandals", "red laces"],
              ["jazz vinyl", "blues record", "saxophone album",
               "trumpet lp", "swing disc"],
              ["garden hose", "flower pots", "lawn seeds",
               "hedge shears", "soil bags"]]
    hists = []
    for u in range(12):
        t = topics[u % 3]
        hists.append([t[int(i)] for i in rng.permutation(len(t))])
    out = mgr.train(m["id"], hists, steps=30)
    assert out["loss_end"] < out["loss_start"]
    assert (tmp_path / f"pers_{m['id']}.npz").exists()
    assert mgr.get(m["id"])["checkpoint"] == out["checkpoint"]

    v = mgr.user_vector(m["id"], topics[0][:3])
    assert isinstance(v, list) and abs(
        np.linalg.norm(np.asarray(v)) - 1.0) < 1e-3

    # untrained model (no checkpoint) still serves the mean fallback
    m2 = mgr.create({"type": "recommendation", "collection": "products"})
    v2 = mgr.user_vector(m2["id"], topics[0][:3])
    assert isinstance(v2, list) and len(v2) == len(v)

    with pytest.raises(Exception):
        mgr.train(m["id"], [["one"]])   # too few users
