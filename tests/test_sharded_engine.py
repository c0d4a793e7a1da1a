"""The REAL sharded engine: the full keyword kernel (typo candidates,
proximity scoring, facets, filters) sharded over the 8-device CPU mesh must
return results IDENTICAL to the single-device engine on the same corpus
(reference mapping: index.cpp:6653 windowed scoring fan-out +
aggregate_topster -> shard_map + all_gather/psum merges, SURVEY.md §2.4)."""

import numpy as np
import pytest

import typesense_tpu.core.jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from typesense_tpu.index.builder import build_segment
from typesense_tpu.parallel.sharded import ShardedEngine, make_mesh
from typesense_tpu.schema.field import Field
from typesense_tpu.search import kernels
from typesense_tpu.search.candidates import token_candidate_sets
from typesense_tpu.search.engine import IndexEngine, SortSpec

FIELDS = [Field("title", "string"), Field("body", "string"),
          Field("cuisine", "string", facet=True),
          Field("points", "int32")]

WORDS = ["apple", "banana", "cherry", "grape", "lemon", "mango",
         "peach", "plum", "berry", "melon"]
CUISINES = ["italian", "thai", "greek"]


def make_docs(n=96, seed=3):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        docs.append((i, {
            "title": " ".join(rng.choice(WORDS, size=4)),
            "body": " ".join(rng.choice(WORDS, size=6)),
            "cuisine": CUISINES[i % 3],
            "points": int(rng.integers(0, 1000)),
        }))
    return docs


@pytest.fixture(scope="module")
def corpus():
    return make_docs()


@pytest.fixture(scope="module")
def single(corpus):
    seg = build_segment(corpus, FIELDS, num_docs=len(corpus))
    return IndexEngine(seg, FIELDS)


@pytest.fixture(scope="module", params=[2, 4, 8])
def sharded(request, corpus):
    return ShardedEngine(corpus, FIELDS, make_mesh(request.param))


SORT_SPECS = [(kernels.SLOT_TEXT, 1, None),
              (kernels.SLOT_COLUMN, 1, "points"),
              (kernels.SLOT_SEQ_ID, -1, None)]
SORT_SLOTS = [SortSpec(kernels.SLOT_TEXT, 1),
              SortSpec(kernels.SLOT_COLUMN, 1, "points"),
              SortSpec(kernels.SLOT_SEQ_ID, -1)]
FIELD_NAMES = ["title", "body"]


def run_single(single, tokens, num_typos, prefixes, filter_range=None,
               facet_fields=None, k=16):
    cands = token_candidate_sets(single, tokens, FIELD_NAMES, num_typos,
                                 prefixes, max_candidates=64,
                                 typo_tokens_threshold=1)
    fmask = None
    if filter_range is not None:
        fname, lo, hi = filter_range
        col = single.seg.num_columns[fname]
        fmask = jnp.asarray((col >= lo) & (col <= hi) & single.seg.live)
    return single.keyword_search(cands, FIELD_NAMES, [1, 1], SORT_SLOTS,
                                 filter_mask=fmask,
                                 facet_fields=facet_fields, k=k)


def run_sharded(sharded, tokens, num_typos, prefixes, filter_range=None,
                facet_fields=None, k=16):
    return sharded.search(tokens, FIELD_NAMES, [1, 1],
                          sort_specs=SORT_SPECS, facet_fields=facet_fields,
                          num_typos=num_typos, prefixes=prefixes,
                          max_candidates=64, filter_range=filter_range, k=k)


def assert_parity(a, b, check_facets=False):
    assert a.found == b.found
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert a.scores.tolist() == b.scores.tolist()
    if check_facets:
        for f in a.facet_counts:
            va, ca = a.facet_counts[f]
            vb, cb = b.facet_counts[f]
            da = {v: int(c) for v, c in zip(va, np.asarray(ca)) if c}
            db_ = {v: int(c) for v, c in zip(vb, np.asarray(cb)) if c}
            assert da == db_, (f, da, db_)


def test_exact_and_parity(single, sharded):
    a = run_single(single, ["apple", "banana"], [0], [False])
    b = run_sharded(sharded, ["apple", "banana"], [0], [False])
    assert a.found > 0
    assert_parity(a, b)


def test_typo_prefix_faceted_parity(single, sharded):
    # typo'd token + prefix last token + facet counting
    a = run_single(single, ["aplle", "ba"], [2], [True],
                   facet_fields=["cuisine"])
    b = run_sharded(sharded, ["aplle", "ba"], [2], [True],
                    facet_fields=["cuisine"])
    assert a.found > 0
    assert_parity(a, b, check_facets=True)


def test_filtered_typo_parity(single, sharded):
    a = run_single(single, ["chery"], [2], [False],
                   filter_range=("points", 100, 800),
                   facet_fields=["cuisine"])
    b = run_sharded(sharded, ["chery"], [2], [False],
                    filter_range=("points", 100, 800),
                    facet_fields=["cuisine"])
    assert a.found > 0
    assert_parity(a, b, check_facets=True)


def test_no_match_parity(single, sharded):
    a = run_single(single, ["zzzqqq"], [0], [False])
    b = run_sharded(sharded, ["zzzqqq"], [0], [False])
    assert a.found == 0 and b.found == 0
    assert len(b.doc_ids) == 0
