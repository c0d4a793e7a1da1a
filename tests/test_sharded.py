"""Multi-chip sharded search: results must be identical for any shard count
(run on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from typesense_tpu.parallel.sharded import (
    build_sharded_arrays, build_sharded_search_step, make_mesh, token_row_bounds,
)
from typesense_tpu.schema.field import Field

FIELDS = [Field("title", "string"), Field("vec", "float[]", num_dim=8),
          Field("points", "int32")]


def make_docs(n=64, seed=0):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    return [(i, {"title": " ".join(rng.choice(words, size=4)),
                 "points": int(i), "vec": rng.standard_normal(8).tolist()})
            for i in range(n)]


def run(n_shards, docs, tokens, qvec):
    mesh = make_mesh(n_shards)
    arrays, segs = build_sharded_arrays(docs, FIELDS, n_shards)
    shard = NamedSharding(mesh, P("docs"))
    rep = NamedSharding(mesh, P())
    s_np, e_np = token_row_bounds(segs, arrays, tokens)
    step = build_sharded_search_step(
        mesh, Q=len(tokens), D=64, K=8,
        iters=int(np.ceil(np.log2(max(arrays["post_doc_ids"].shape[1], 2)))) + 1,
        vec_dim=8)
    out = step(
        jax.device_put(arrays["post_doc_ids"].astype(np.int32), shard),
        jax.device_put(arrays["post_offsets"], shard),
        jax.device_put(arrays["live"], shard),
        jax.device_put(arrays["doc_base"], shard),
        jax.device_put(arrays["vec_vec"].astype(np.float32), shard),
        jax.device_put(arrays["col_points"].astype(np.int64), shard),
        jax.device_put(jnp.asarray(s_np), shard),
        jax.device_put(jnp.asarray(e_np), shard),
        jax.device_put(jnp.asarray([True] * len(tokens)), rep),
        jax.device_put(jnp.asarray(qvec, jnp.float32), rep),
    )
    kid, kk, vid, vd, found = map(np.asarray, out)
    return kid, vid, int(found)


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_shard_count_invariance(n_shards):
    docs = make_docs()
    qvec = np.random.default_rng(1).standard_normal(8)
    kid, vid, found = run(n_shards, docs, ["alpha", "beta"], qvec)
    ref_kid, ref_vid, ref_found = run(1, docs, ["alpha", "beta"], qvec)
    assert found == ref_found
    assert kid.tolist() == ref_kid.tolist()
    assert vid.tolist() == ref_vid.tolist()


def test_found_matches_bruteforce():
    docs = make_docs()
    expected = sum(1 for _, d in docs
                   if "alpha" in d["title"].split() and "beta" in d["title"].split())
    _, _, found = run(4, docs, ["alpha", "beta"], np.zeros(8))
    assert found == expected
