"""Parity for the dense2 matched-lane compaction path (CAP_M > 0).

Multi-token dense2 queries score proximity only on a cumsum-compacted
gather of the matched lanes (kernels.dense2_kernel_body text_score_lanes);
results must be identical to the whole-N scoring path (CAP_M forced 0) and
to the independent scatter kernel, across typos, prefixes, filters,
facets, sorts, exclusions, and heavy docs (>3 occurrences per token/field,
which route through the CSR rescore whose ub gate reads the scattered-back
upper bounds).

Reference contract: Index::search text-match ordering
(/root/reference/src/index.cpp:2488, src/match_score.h).
"""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lamda mu nu xi omicron pi rho sigma tau upsilon").split()


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    c = Collection("capm", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("group", "string", facet=True),
        Field("points", "int32"),
    ], default_sorting_field="points")
    docs = []
    for i in range(20000):
        words = list(rng.choice(WORDS, rng.integers(2, 7)))
        if rng.random() < 0.9:
            words.insert(int(rng.integers(0, len(words))), "alpha")
        if i % 40 == 0:
            words.append("zebra")           # rare token: bound ~500 < N
        if i % 160 == 0:
            words += ["zebra"] * 5          # heavy repeats -> CSR rescore
        if rng.random() < 0.05:
            words += words[:2]
        docs.append({
            "id": str(i),
            "title": " ".join(words),
            "tags": list(rng.choice(WORDS, rng.integers(1, 3))),
            "group": str(rng.choice(["g1", "g2", "g3"])),
            "points": int(rng.integers(0, 100000)),
        })
    c.add_many(docs)
    eng = c._ensure_index()
    eng._force_mode = "dense2"
    yield c
    eng._force_mode = None
    eng._force_capm = None


QUERIES = [
    {"q": "alpha zebra"},
    {"q": "zebra beta"},
    {"q": "alpha zebra gamma"},
    {"q": "zebra -delta"},
    {"q": "zebr alpha", "num_typos": "1"},
    {"q": "zebr", "prefix": "true"},
    {"q": "alpha zebra", "filter_by": "points:>50000"},
    {"q": "alpha zebra", "facet_by": "group"},
    {"q": "alpha zebra", "sort_by": "points:desc"},
    {"q": "zebra beta", "sort_by": "points:asc"},
    {"q": "alpha zebra", "query_by": "title,tags"},
]


def _norm(res):
    return {
        "found": res["found"],
        "hits": [(h["document"]["id"], h.get("text_match", 0))
                 for h in res["hits"]],
        "facets": [(fc["field_name"],
                    sorted((v["value"], v["count"]) for v in fc["counts"]))
                   for fc in res.get("facet_counts", [])],
    }


def test_compaction_parity_vs_whole_n(corpus, monkeypatch):
    from typesense_tpu.search import kernels
    monkeypatch.setenv("TS_DENSE2_COMPACT", "1")
    eng = corpus._ensure_index()
    base = {"query_by": "title", "prefix": "false", "num_typos": "0",
            "per_page": 25}
    eng._force_capm = 0                 # whole-N scoring baseline
    expected = [_norm(corpus.search({**base, **qp})) for qp in QUERIES]
    eng._force_capm = None              # natural bound -> compacted path
    # the rare-token bound must actually engage compaction
    seen = []
    real = kernels.build_dense2_kernel
    monkeypatch.setattr(kernels, "build_dense2_kernel",
                        lambda *a, **kw: (seen.append(a[-1]),
                                          real(*a, **kw))[1])
    got = [_norm(corpus.search({**base, **qp})) for qp in QUERIES]
    assert any(0 < c < eng.N for c in seen), seen
    for qp, e, g in zip(QUERIES, expected, got):
        assert e == g, f"mismatch for {qp}"


def test_compaction_parity_vs_scatter_kernel(corpus):
    eng = corpus._ensure_index()
    base = {"query_by": "title", "prefix": "false", "num_typos": "0",
            "per_page": 25}
    eng._force_mode = "scatter"
    expected = [_norm(corpus.search({**base, **qp})) for qp in QUERIES
                if "facet_by" not in qp]
    eng._force_mode = "dense2"
    got = [_norm(corpus.search({**base, **qp})) for qp in QUERIES
           if "facet_by" not in qp]
    for e, g in zip(expected, got):
        assert e == g
