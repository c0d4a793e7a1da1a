"""IVF vector index: build/layout invariants, recall on clustered data,
filtered probe, and the engine's short-result brute fallback.

Mirrors /root/reference/include/index.h:356-389 (hnsw_index_t) +
index.cpp:3345 (brute-force path under selective filters).
"""

import numpy as np
import pytest

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax.numpy as jnp

from typesense_tpu.ops import ivf as ivf_mod


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((32, 64)).astype(np.float32)
    lab = rng.integers(0, 32, 6000)
    V = centers[lab] + 0.15 * rng.standard_normal((6000, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    idx = ivf_mod.build_ivf(V, n_cells=64, sample=2000, iters=4)
    return V, idx


def test_layout_invariants(data):
    V, idx = data
    starts = np.asarray(idx.starts)
    lens = np.asarray(idx.lens)
    order = np.asarray(idx.order)
    assert idx.n == len(V)
    assert (lens >= 1).all() and (lens <= idx.cap).all()
    # cells tile [0, N) without gaps or overlaps
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], (starts + lens)[:-1])
    assert int((starts + lens)[-1]) == len(V)
    # order is a permutation of [0, N) plus -1 padding
    body = order[order >= 0]
    assert sorted(body.tolist()) == list(range(len(V)))
    # sorted rows really are the original rows (bf16-rounded)
    vs = np.asarray(idx.vecs_sorted.astype(jnp.float32))
    np.testing.assert_allclose(vs[: len(V)], V[body], atol=0.01)


def test_recall_on_clustered_data(data):
    """Raw bf16 probe recall is bounded by bf16 rounding on near-tie
    distances (measured 0.895 vs an f32 oracle at FULL probe on this set,
    1.0 vs a bf16 oracle); the engine's f32 host re-rank recovers it —
    assert both layers at their own contracts."""
    V, idx = data
    rng = np.random.default_rng(1)
    hits = 0
    for _ in range(20):
        q = V[rng.integers(0, len(V))]
        ids, dists = ivf_mod.ivf_search(idx, q, 40, nprobe=16)
        ids = np.asarray(ids)[0]
        dists = np.asarray(dists)[0]
        assert (np.diff(dists[np.isfinite(dists)]) >= -1e-6).all()
        # f32 re-rank over the 4x margin (what engine.vector_search does)
        valid = ids[ids >= 0]
        d32 = 1.0 - V[valid] @ q
        top = valid[np.argsort(d32, kind="stable")[:10]]
        oracle = np.argsort(1.0 - V @ q)[:10]
        hits += len(set(top.tolist()) & set(oracle.tolist()))
    assert hits / 200 >= 0.95


def test_filtered_probe(data):
    V, idx = data
    q = V[7]
    allowed = np.zeros(len(V), bool)
    allowed[1000:1200] = True
    ids, dists = ivf_mod.ivf_search(idx, q, 20, nprobe=32,
                                    mask=jnp.asarray(allowed))
    ids = np.asarray(ids)[0]
    assert all(1000 <= i < 1200 for i in ids if i >= 0)


def test_engine_fallback_on_selective_filter(monkeypatch):
    """IVF probe starved by a filter must fall back to the exact scan."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    from typesense_tpu.search.engine import IndexEngine

    rng = np.random.default_rng(2)
    V = rng.standard_normal((400, 16)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    coll = Collection("ivfb", [Field("v", "float[]", num_dim=16),
                               Field("grp", "int32")])
    for i in range(400):
        coll.docs[coll.next_seq_id] = {"id": str(i), "v": V[i].tolist(),
                                       "grp": i % 100}
        coll.id_to_seq[str(i)] = coll.next_seq_id
        coll.next_seq_id += 1
    coll._dirty = True
    monkeypatch.setattr(IndexEngine, "IVF_MIN_N", 100)  # force IVF here
    engine = coll._ensure_index()
    assert engine._ivf_for("v") is not None

    # filter keeps only 4 docs; IVF with few probes misses most of them
    res = coll.search({"q": "*", "vector_query":
                       "v:([" + ",".join(f"{x:.4f}" for x in V[5]) +
                       "], k: 4)", "filter_by": "grp:=5", "per_page": 10})
    got = sorted(h["document"]["id"] for h in res["hits"])
    assert got == ["105", "205", "305", "5"] or \
        sorted(int(g) for g in got) == [5, 105, 205, 305]
