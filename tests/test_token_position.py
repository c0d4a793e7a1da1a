"""prioritize_token_position: earlier in-field matches rank higher
(match_score.h offset component; index.cpp:6985-7065), across probe and
dense2 modes including heavy docs."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("pos", [Field("t", "string"),
                           Field("pts", "int32", sort=True)],
                   default_sorting_field="pts")
    c.add({"id": "0", "t": "x1 x2 x3 x4 needle", "pts": 1})
    c.add({"id": "1", "t": "needle y1 y2 y3 y4", "pts": 1})
    c.add({"id": "2", "t": "z1 needle z2 z3 z4", "pts": 1})
    # heavy doc: >3 occurrences, last one early -> must rescore exactly
    c.add({"id": "3", "t": "w1 needle needle needle needle w2 w3", "pts": 1})
    return c


BASE = {"q": "needle", "query_by": "t", "prefix": "false", "num_typos": "0"}


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_default_ignores_position(coll):
    res = coll.search(dict(BASE))
    # no position priority: identical text scores, id-desc tie-break
    assert ids(res) == ["3", "2", "1", "0"]


def test_position_priority_orders_by_first_match(coll):
    res = coll.search({**BASE, "prioritize_token_position": "true"})
    # single-token offset = LAST occurrence: doc1 at 0, doc2 at 1,
    # doc0 at 4, doc3's last needle at 4 (tie with doc0 -> id desc)
    assert ids(res) == ["1", "2", "3", "0"]


def test_multi_token_position_priority(coll):
    c = Collection("pos2", [Field("t", "string")])
    c.add({"id": "0", "t": "filler filler filler red shoe"})
    c.add({"id": "1", "t": "red shoe in stock now"})
    r0 = c.search({"q": "red shoe", "query_by": "t", "prefix": "false",
                   "num_typos": "0", "prioritize_token_position": "true"})
    assert ids(r0)[0] == "1"


def test_modes_agree(coll):
    eng = coll._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = coll.search({**BASE,
                                 "prioritize_token_position": "true"})
        eng._force_mode = None
    assert ids(out["probe"]) == ids(out["dense2"])
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]
