"""Block-max selection parity: cascade_topk / block_stage must select the
EXACT same top-K (keys and ids) as the direct sort/top_k paths, including
under heavy key ties — the regime that motivated the tie-mask cascade.
"""

import numpy as np
import pytest

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax.numpy as jnp

from typesense_tpu.search import kernels


@pytest.fixture(autouse=True)
def low_block_threshold(monkeypatch):
    # engage the block path at test-size corpora
    monkeypatch.setattr(kernels, "BLOCK_SELECT_MIN_N", 1 << 10)


def _random_case(rng, n, tie_levels):
    # few distinct values => massive ties, like packed text scores
    k0 = rng.integers(0, tie_levels, n).astype(np.int64) * 12345
    k1 = rng.integers(0, 7, n).astype(np.int64) - 3
    k2 = rng.integers(0, 3, n).astype(np.int64)
    mask = rng.random(n) < 0.7
    return k0, k1, k2, mask


@pytest.mark.parametrize("n", [1 << 12, (1 << 14) + 37])
@pytest.mark.parametrize("tie_levels", [2, 50, 100000])
def test_cascade_topk_matches_direct(n, tie_levels):
    rng = np.random.default_rng(n + tie_levels)
    k0, k1, k2, mask = _random_case(rng, n, tie_levels)
    gid = np.arange(n, dtype=np.int32)
    for K in (16, 64, 256):
        got = kernels.cascade_topk(
            jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
            jnp.asarray(gid), jnp.asarray(mask), K)
        want = kernels.topk_merge(
            jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
            jnp.asarray(gid), jnp.asarray(mask), K)
        for g, w, name in zip(got, want, ("k0", "k1", "k2", "ids")):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=f"{name} K={K}")


def test_cascade_fewer_than_k():
    n = 1 << 12
    rng = np.random.default_rng(0)
    k0, k1, k2, _ = _random_case(rng, n, 4)
    mask = np.zeros(n, bool)
    mask[[5, 900, 2048]] = True
    got = kernels.cascade_topk(
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
        jnp.asarray(np.arange(n, dtype=np.int32)), jnp.asarray(mask), 64)
    want = kernels.topk_merge(
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2),
        jnp.asarray(np.arange(n, dtype=np.int32)), jnp.asarray(mask), 64)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_block_stage_threshold_exact():
    """The stage threshold must equal the true KT-th largest masked key."""
    n = 1 << 13
    rng = np.random.default_rng(7)
    for tie_levels in (3, 1000):
        key = (rng.integers(0, tie_levels, n) * 1000).astype(np.int64)
        mask = rng.random(n) < 0.5
        KT = 128
        use, BW, NB, PADN = kernels._block_params(n, KT)
        assert use
        cand, t = kernels.block_stage(
            jnp.asarray(key), jnp.asarray(mask), KT, n, BW, NB, PADN)
        vals = np.sort(key[mask])[::-1]
        expect = vals[KT - 1] if len(vals) >= KT else -(2**62)
        assert int(t) == int(expect), tie_levels
        # pool must contain every element strictly above the threshold
        above = set(np.flatnonzero(mask & (key > int(t))).tolist())
        pool = set(int(c) for c in np.asarray(cand) if c >= 0)
        assert above <= pool


def test_dense2_engine_parity_block_vs_direct(monkeypatch):
    """Full dense2 kernel through the engine: identical hits under the
    block-select cascade and the direct top_k cascade."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    import random

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(40)]
    coll = Collection("bs", [Field("title", "string"),
                             Field("points", "int32")],
                      default_sorting_field="points")
    for i in range(3000):
        title = " ".join(rng.choice(vocab) for _ in range(6))
        coll.docs[coll.next_seq_id] = {"title": title,
                                       "points": rng.randint(0, 50)}
        coll.id_to_seq[str(coll.next_seq_id)] = coll.next_seq_id
        coll.next_seq_id += 1
    coll._dirty = True
    engine = coll._ensure_index()
    engine._force_mode = "dense2"

    queries = ["t1 t2", "t3", "t1 t2 t3", "t39 t0"]
    params = {"query_by": "title", "prefix": "false", "num_typos": "0",
              "per_page": 30}

    def run_all():
        out = []
        for q in queries:
            res = coll.search({**params, "q": q})
            out.append([(h["document"].get("id"),
                         h.get("text_match")) for h in res["hits"]])
        return out

    monkeypatch.setattr(kernels, "BLOCK_SELECT_MIN_N", 1 << 40)
    kernels.build_dense2_kernel.cache_clear()
    direct = run_all()
    monkeypatch.setattr(kernels, "BLOCK_SELECT_MIN_N", 1 << 9)
    kernels.build_dense2_kernel.cache_clear()
    block = run_all()
    kernels.build_dense2_kernel.cache_clear()
    assert direct == block
