"""text_match_type=max_score|max_weight|sum_score aggregated score layouts
(index.cpp:5315-5380) across probe and dense2 modes."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("books", [Field("title", "string"),
                             Field("body", "string"),
                             Field("points", "int32")],
                   default_sorting_field="points")
    # doc 0: strong match only in the LOW-weight field (body)
    # doc 1: weak match in the HIGH-weight field (title)
    c.add({"id": "0", "title": "cooking guide",
           "body": "harry potter harry potter", "points": 1})
    c.add({"id": "1", "title": "harry and the others xx yy zz qq ww ee rr",
           "body": "nothing here", "points": 1})
    # doc 2: matches in BOTH fields (wins under sum_score)
    c.add({"id": "2", "title": "harry morgan zz xx yy qq ww ee rr tt uu",
           "body": "the harry story", "points": 1})
    return c


BASE = {"q": "harry potter", "query_by": "title,body",
        "query_by_weights": "4,1", "prefix": "false", "num_typos": "0",
        "drop_tokens_threshold": "10"}


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_max_score_prefers_best_field_score(coll):
    res = coll.search(dict(BASE))
    # doc 0 matches BOTH tokens (body) -> best field score wins
    assert ids(res)[0] == "0"


def test_max_weight_prefers_heavy_field(coll):
    res = coll.search({**BASE, "text_match_type": "max_weight"})
    # docs 1/2 match in title (weight 4); doc 0 only in body (weight 1).
    # with matched-token count equal (drop_tokens reduces to "harry"),
    # title matches outrank the stronger body match
    one_token = {**BASE, "q": "harry", "text_match_type": "max_weight"}
    res = coll.search(one_token)
    assert ids(res)[0] in ("1", "2")
    assert ids(res)[-1] == "0"


def test_sum_score_rewards_multi_field(coll):
    res = coll.search({**BASE, "q": "harry",
                       "text_match_type": "sum_score"})
    # doc 2 matches in both fields -> weighted sum beats single-field docs
    assert ids(res)[0] == "2"


def test_invalid_type_rejected(coll):
    with pytest.raises(BadRequest):
        coll.search({**BASE, "text_match_type": "nope"})


def test_modes_agree_on_dense2(coll):
    eng = coll._ensure_index()
    out = {}
    for mode in ("probe", "dense2"):
        eng._force_mode = mode
        out[mode] = coll.search({**BASE, "q": "harry",
                                 "text_match_type": "max_weight"})
        eng._force_mode = None
    assert ids(out["probe"]) == ids(out["dense2"])
    assert [h["text_match"] for h in out["probe"]["hits"]] == \
        [h["text_match"] for h in out["dense2"]["hits"]]
