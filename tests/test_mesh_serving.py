"""TS_MESH=1 opt-in: Collection.search routes supported queries through
the doc-sharded mesh engine (SURVEY §2.4 — intra-request fan-out as SPMD)
and must return the same hits as the single-device path.
"""

import os
import random

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture()
def coll():
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    c = Collection("mesh", [
        Field("title", "string"),
        Field("cuisine", "string", facet=True),
        Field("points", "int32")], default_sorting_field="points")
    for i in range(200):
        c.add({"id": str(i),
               "title": " ".join(rng.choice(words) for _ in range(5)),
               "cuisine": ["thai", "greek"][i % 2],
               "points": rng.randint(0, 1000)})
    return c


def _q(c, **kw):
    params = {"query_by": "title", "prefix": "false", "num_typos": "0",
              "per_page": 10, **kw}
    return c.search(params)


def test_mesh_matches_single_device(coll, monkeypatch):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    queries = [dict(q="alpha beta"),
               dict(q="gamma"),
               dict(q="alpha", facet_by="cuisine"),
               dict(q="beta delta", filter_by="points:>500",
                    sort_by="points:desc")]
    singles = [_q(coll, **qq) for qq in queries]
    monkeypatch.setenv("TS_MESH", "1")
    meshes = [_q(coll, **qq) for qq in queries]
    for s, m, qq in zip(singles, meshes, queries):
        assert m["found"] == s["found"], qq
        assert [h["document"]["id"] for h in m["hits"]] == \
            [h["document"]["id"] for h in s["hits"]], qq
        assert [h["text_match"] for h in m["hits"]] == \
            [h["text_match"] for h in s["hits"]], qq
        if "facet_by" in qq:
            fs = {c["value"]: c["count"]
                  for c in s["facet_counts"][0]["counts"]}
            fm = {c["value"]: c["count"]
                  for c in m["facet_counts"][0]["counts"]}
            assert fs == fm, qq


def test_mesh_falls_through_unsupported(coll, monkeypatch):
    monkeypatch.setenv("TS_MESH", "1")
    # wildcard, phrase, and grouped queries use the single-device path
    r = coll.search({"q": "*", "per_page": 5})
    assert r["found"] == 200
    r = coll.search({"q": '"alpha beta"', "query_by": "title",
                     "per_page": 5, "prefix": "false", "num_typos": "0"})
    assert "hits" in r
    r = _q(coll, q="alpha", group_by="cuisine")
    assert "grouped_hits" in r
