"""Phrase search, exclusion, group_by tests (reference:
collection_specific_test.cpp phrase cases, collection_grouping_test.cpp)."""

import pytest

from typesense_tpu.collection import Collection, parse_query_text
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("songs", [
        Field("title", "string"),
        Field("artist", "string", facet=True),
        Field("year", "int32", facet=True),
    ], default_sorting_field="year")
    docs = [
        {"id": "0", "title": "house of the rising sun", "artist": "animals", "year": 1964},
        {"id": "1", "title": "rising house prices", "artist": "econ", "year": 2020},
        {"id": "2", "title": "sun house blues", "artist": "animals", "year": 1930},
        {"id": "3", "title": "house music rising", "artist": "dj", "year": 2001},
        {"id": "4", "title": "the rising", "artist": "boss", "year": 2002},
    ]
    for d in docs:
        c.add(d)
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_parse_query_text():
    f = Field("t", "string")
    toks, pairs, excl = parse_query_text('hello "brown fox" -lazy', f)
    assert toks == ["hello", "brown", "fox", "lazy"]
    assert pairs == ((1, 2),)
    assert excl == (False, False, False, True)


def test_phrase_search(coll):
    res = coll.search({"q": '"rising sun"', "query_by": "title", "prefix": "false"})
    assert ids(res) == ["0"]
    assert res["found"] == 1
    # non-phrase finds both orders
    res2 = coll.search({"q": "rising sun", "query_by": "title", "prefix": "false"})
    assert res2["found"] == 1  # AND still needs both tokens; only doc 0 has both


def test_phrase_order_matters(coll):
    res = coll.search({"q": '"sun house"', "query_by": "title", "prefix": "false"})
    assert ids(res) == ["2"]


def test_exclusion(coll):
    res = coll.search({"q": "house -rising", "query_by": "title", "prefix": "false"})
    assert set(ids(res)) == {"2"}
    assert res["found"] == 1


def test_exclusion_all(coll):
    res = coll.search({"q": "rising -house", "query_by": "title", "prefix": "false"})
    assert set(ids(res)) == {"4"}


def test_group_by(coll):
    res = coll.search({"q": "*", "group_by": "artist", "group_limit": 2})
    assert "grouped_hits" in res and "hits" not in res
    assert res["found"] == 4  # 4 distinct artists
    assert res["found_docs"] == 5
    by_key = {tuple(g["group_key"]): g for g in res["grouped_hits"]}
    assert ("animals",) in by_key
    assert by_key[("animals",)]["found"] == 2
    assert len(by_key[("animals",)]["hits"]) == 2
    # groups ordered by best hit: wildcard sorts year desc -> first group = dj? no:
    # order: 2020(econ), 2002(boss), 2001(dj), 1964(animals), 1930(animals)
    assert res["grouped_hits"][0]["group_key"] == ["econ"]


def test_group_by_with_query(coll):
    res = coll.search({"q": "house", "query_by": "title", "prefix": "false",
                       "group_by": "artist", "group_limit": 1})
    assert res["found"] == 3  # animals, econ, dj
    for g in res["grouped_hits"]:
        assert len(g["hits"]) == 1


def test_group_by_requires_facet(coll):
    from typesense_tpu.core.errors import TypesenseError
    with pytest.raises(TypesenseError):
        coll.search({"q": "*", "group_by": "title"})


def test_diversity_mmr():
    c = Collection("div", [
        Field("title", "string"),
        Field("brand", "string", facet=True),
        Field("pop", "int32"),
    ], default_sorting_field="pop")
    # top results all same brand; diversity should interleave brands
    c.add({"id": "0", "title": "shoe model alpha", "brand": "nike", "pop": 100})
    c.add({"id": "1", "title": "shoe model beta", "brand": "nike", "pop": 90})
    c.add({"id": "2", "title": "shoe model gamma", "brand": "nike", "pop": 80})
    c.add({"id": "3", "title": "shoe model delta", "brand": "adidas", "pop": 70})
    c.add({"id": "4", "title": "shoe model eps", "brand": "puma", "pop": 60})
    res = c.search({
        "q": "shoe", "query_by": "title", "per_page": 5,
        "diversity": '{"lambda": 0.3, "similarity_equation": '
                     '[{"field": "brand", "method": "equality", "weight": 1}]}'})
    got = [h["document"]["brand"] for h in res["hits"]]
    # first stays most relevant; second must be a different brand
    assert got[0] == "nike"
    assert got[1] != "nike", got


def test_diversity_jaccard():
    c = Collection("divj", [
        Field("title", "string"),
        Field("tags", "string[]", facet=True),
    ])
    c.add({"id": "0", "title": "post one", "tags": ["x", "y"]})
    c.add({"id": "1", "title": "post two", "tags": ["a", "b"]})
    c.add({"id": "2", "title": "post three", "tags": ["a", "b"]})
    res = c.search({
        "q": "post", "query_by": "title", "per_page": 3,
        "diversity": '{"lambda": 0.2, "similarity_equation": '
                     '[{"field": "tags", "method": "jaccard", "weight": 1}]}'})
    got = [h["document"]["id"] for h in res["hits"]]
    # relevance tie-break puts 2 first; doc 1 shares 2's tag set so the
    # dissimilar doc 0 jumps ahead of it
    assert got == ["2", "0", "1"], got


def test_split_join_fallback():
    c = Collection("sj", [Field("title", "string")])
    c.add({"id": "0", "title": "icecream sandwich"})
    c.add({"id": "1", "title": "chocolate bar"})
    # "ice cream" -> joined "icecream" matches doc 0
    res = c.search({"q": "ice cream", "query_by": "title",
                    "num_typos": "0", "prefix": "false"})
    assert ids(res) == ["0"], res["found"]

    c2 = Collection("sj2", [Field("title", "string")])
    c2.add({"id": "0", "title": "ice cream sandwich"})
    # "icecream" -> split into "ice cream"
    res = c2.search({"q": "icecream", "query_by": "title",
                     "num_typos": "0", "prefix": "false"})
    assert [h["document"]["id"] for h in res["hits"]] == ["0"]


def test_typo_highlighting():
    c = Collection("hl", [Field("title", "string")])
    c.add({"id": "0", "title": "grilled chicken salad"})
    res = c.search({"q": "chiken", "query_by": "title", "prefix": "false"})
    assert res["found"] == 1
    hl = res["hits"][0]["highlight"]["title"]
    assert "<mark>chicken</mark>" in hl["snippet"], hl
    assert hl["matched_tokens"] == ["chicken"]


def test_per_field_num_typos():
    c = Collection("nt", [Field("a", "string"), Field("b", "string")])
    c.add({"id": "0", "a": "chicken soup", "b": "something else"})
    c.add({"id": "1", "a": "something else", "b": "chicken soup"})
    # typos allowed only in field a: "chiken" matches doc 0 (via a) but
    # must NOT match doc 1 (only b contains chicken, b's budget is 0)
    res = c.search({"q": "chiken", "query_by": "a,b", "num_typos": "2,0",
                    "prefix": "false"})
    assert ids(res) == ["0"], res["found"]
    # both fields allowed -> both docs
    res = c.search({"q": "chiken", "query_by": "a,b", "num_typos": "2,2",
                    "prefix": "false"})
    assert sorted(ids(res)) == ["0", "1"]


def test_per_field_prefix():
    c = Collection("pf", [Field("a", "string"), Field("b", "string")])
    c.add({"id": "0", "a": "chocolate cake", "b": "plain text"})
    c.add({"id": "1", "a": "plain text", "b": "chocolate cake"})
    # prefix allowed only in a: "choco" expands in a but not b
    res = c.search({"q": "choco", "query_by": "a,b", "prefix": "true,false",
                    "num_typos": "0"})
    assert ids(res) == ["0"], res["found"]
    res = c.search({"q": "choco", "query_by": "a,b", "prefix": "true,true",
                    "num_typos": "0"})
    assert sorted(ids(res)) == ["0", "1"]


def test_drop_tokens_right_to_left_default():
    c = Collection("dtr", [Field("t", "string")])
    c.add({"id": "0", "t": "alpha beta"})
    # "alpha beta zzz" -> no full match; dropping zzz (rightmost) matches
    r = c.search({"q": "alpha beta zzz", "query_by": "t", "num_typos": "0",
                  "prefix": "false"})
    assert r["found"] == 1


def test_drop_tokens_left_to_right():
    c = Collection("dtl", [Field("t", "string")])
    c.add({"id": "0", "t": "beta gamma"})
    # dropping from the left removes "zzz" first
    r = c.search({"q": "zzz beta gamma", "query_by": "t", "num_typos": "0",
                  "prefix": "false", "drop_tokens_mode": "left_to_right"})
    assert r["found"] == 1


def test_drop_tokens_direction_swap():
    # right_to_left exhausts without results, then swaps to left drops
    c = Collection("dts", [Field("t", "string")])
    c.add({"id": "0", "t": "omega"})
    r = c.search({"q": "zzz yyy omega", "query_by": "t", "num_typos": "0",
                  "prefix": "false"})
    assert r["found"] == 1


def test_drop_tokens_both_sides():
    c = Collection("dtb", [Field("t", "string")])
    c.add({"id": "0", "t": "left anchor"})
    c.add({"id": "1", "t": "anchor right"})
    r = c.search({"q": "left anchor right", "query_by": "t",
                  "num_typos": "0", "prefix": "false",
                  "drop_tokens_mode": "both_sides:5"})
    # both directions explored: variants match doc0 AND doc1
    assert r["found"] == 2


def test_drop_tokens_mode_invalid():
    c = Collection("dti", [Field("t", "string")])
    c.add({"id": "0", "t": "x"})
    with pytest.raises(BadRequest):
        c.search({"q": "x", "query_by": "t",
                  "drop_tokens_mode": "sideways"})
    with pytest.raises(BadRequest):
        c.search({"q": "x", "query_by": "t",
                  "drop_tokens_mode": "both_sides:x"})
