"""Ranking-parity pins: a fixed corpus with documented expected hit orders
isolating each component of the reference's packed match score
(match_score.h:56-68: words_present > unique words > typo cost >
proximity distance > exact-match flag) and the aggregated sort tuple
(text match, default sorting field, seq id). These pin the ranking
contract the dense2/scatter/probe kernels must all reproduce.
"""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture(scope="module", params=["auto", "dense2", "scatter"])
def corpus(request):
    c = Collection("rank", [
        Field("title", "string"),
        Field("points", "int32"),
    ], default_sorting_field="points")
    rows = [
        # id, title, points
        ("both_near", "sweet cake made with chocolate", 10),
        ("both_far", "chocolate bar and then later some sweet tea", 10),
        ("one_word", "chocolate pudding", 99),
        ("exact_doc", "sweet chocolate", 5),
        ("adjacent", "the sweet chocolate house", 10),
        ("reversed", "chocolate sweet biscuits", 10),
        ("hi_points", "dark chocolate with sweet cherries", 10),
    ]
    for i, t, p in rows:
        c.add({"id": i, "title": t, "points": p})
    eng = c._ensure_index()
    if request.param != "auto":
        eng._force_mode = request.param
    yield c
    eng._force_mode = None


def search(c, q, **kw):
    return c.search({"q": q, "query_by": "title", "prefix": "false",
                     "num_typos": kw.pop("num_typos", "0"), **kw})


def test_words_present_dominates_everything(corpus):
    # AND semantics: the single-token doc is NOT in the result set at all
    # when enough two-token docs exist (drop_tokens only fires below the
    # threshold); every both-token doc is present
    res = search(corpus, "sweet chocolate")
    got = ids(res)
    assert "one_word" not in got
    assert set(got) == {"both_near", "both_far", "exact_doc",
                        "adjacent", "reversed", "hi_points"}


def test_proximity_orders_the_pairs(corpus):
    # among two-word docs, smaller window displacement ranks higher:
    # exact_doc/adjacent/reversed (distance 1) above both_near (2)
    # above hi_points (3) above both_far (>window)
    res = search(corpus, "sweet chocolate")
    got = ids(res)
    # distances: exact/adjacent/reversed = 1, hi_points = 2,
    # both_near = 4, both_far = 7
    assert got[-1] == "both_far"
    assert got.index("hi_points") < got.index("both_near") < \
        got.index("both_far")
    for d1 in ("exact_doc", "adjacent", "reversed"):
        assert got.index(d1) < got.index("hi_points")


def test_exact_match_beats_adjacent(corpus):
    # exact_doc's field is exactly the query => exact flag set; it beats
    # the distance-1 docs that have extra tokens
    res = search(corpus, "sweet chocolate")
    got = ids(res)
    assert got[0] == "exact_doc"


def test_typo_cost_ordering(corpus):
    # 'chocolete' = 1 typo: typo'd matches rank below exact matches of
    # the same word count; the one-word doc found only via typo sorts by
    # (wp=1, typo=1) below every exact one-word match
    res = search(corpus, "chocolate", num_typos="0")
    exact_found = res["found"]
    res2 = search(corpus, "chocolete", num_typos="1")
    assert res2["found"] == exact_found  # same docs reachable via 1 typo


def test_tie_breaks_by_default_sorting_field_then_seq(corpus):
    # adjacent and reversed tie on every text component (wp=2, dist=1,
    # no exact) and on points => later seq id wins the final tie-break
    res = search(corpus, "sweet chocolate")
    got = ids(res)
    ia, ir = got.index("adjacent"), got.index("reversed")
    assert abs(ia - ir) == 1
    assert ir < ia  # reversed inserted later -> higher seq id -> first


def test_points_breaks_text_ties(corpus):
    res = search(corpus, "chocolate")
    got = ids(res)
    # all docs contain 'chocolate' with wp=1; one_word has points 99
    assert got[0] == "one_word"


def test_sort_by_text_match_explicit(corpus):
    res = search(corpus, "sweet chocolate",
                 sort_by="_text_match:desc,points:asc")
    got = ids(res)
    assert got[0] == "exact_doc"
    # ties now resolve by points ASCENDING: exact_doc(5) first already;
    # among dist-1 pair adjacent/reversed both points 10 -> seq desc
    assert set(got[1:3]) == {"adjacent", "reversed"}
