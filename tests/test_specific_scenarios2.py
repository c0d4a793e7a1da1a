"""Second batch ported from
/root/reference/test/collection_specific_test.cpp — custom separators and
symbols, split/join tokens, prefix-only-last-token, same-batch id repeats."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_custom_separators_split_tokens():
    """CustomSeparators (collection_specific_test.cpp:1179): '-' as a
    token separator splits words; highlights keep the original text."""
    c = Collection("sp2_sep", [Field("name", "string"),
                               Field("points", "int32")],
                   default_sorting_field="points",
                   token_separators=["-"])
    c.add({"id": "0", "name": "alpha-beta-gamma-omega-zeta", "points": 100})
    res = c.search({"q": "gamma", "query_by": "name", "prefix": "false",
                    "num_typos": "0"})
    assert res["found"] == 1
    hl = res["hits"][0]["highlights"][0]
    assert "<mark>gamma</mark>" in hl["snippet"]
    res = c.search({"q": "gamma-omega", "query_by": "name",
                    "prefix": "false", "num_typos": "0"})
    assert res["found"] == 1


def test_separator_validation():
    with pytest.raises(TypesenseError):
        Collection("sp2_badsep", [Field("t", "string")],
                   token_separators=["foo"])


def test_custom_symbols_for_indexing():
    """CustomSymbolsForIndexing (…:1249): '&' kept as part of tokens."""
    c = Collection("sp2_sym", [Field("name", "string"),
                               Field("points", "int32")],
                   default_sorting_field="points",
                   symbols_to_index=["&"])
    c.add({"id": "0", "name": "rock & roll", "points": 100})
    c.add({"id": "1", "name": "rock roll", "points": 100})
    res = c.search({"q": "rock & roll", "query_by": "name",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res)[0] == "0"
    res = c.search({"q": "&", "query_by": "name", "prefix": "false",
                    "num_typos": "0"})
    assert res["found"] == 1 and _ids(res) == ["0"]


def test_search_should_split_tokens():
    """SearchShouldSplitAndJoinTokens (…:2112): an unknown compound query
    token splits into two dictionary words."""
    c = Collection("sp2_split", [Field("title", "string")])
    c.add({"id": "0", "title": "basket ball is fun"})
    res = c.search({"q": "basketball", "query_by": "title",
                    "prefix": "false", "num_typos": "0"})
    assert res["found"] == 1


def test_search_should_join_tokens():
    """…the reverse: two query tokens join into one indexed word."""
    c = Collection("sp2_join", [Field("title", "string")])
    c.add({"id": "0", "title": "the basketball game"})
    res = c.search({"q": "basket ball", "query_by": "title",
                    "prefix": "false", "num_typos": "0"})
    assert res["found"] == 1


def test_prefix_only_on_last_token():
    """PrefixSearchOnlyOnLastToken (…:1040): non-final tokens never prefix-
    expand."""
    c = Collection("sp2_pfxlast", [Field("concat", "string")])
    c.add({"id": "0", "concat": "donald trump"})
    c.add({"id": "1", "concat": "donald duck"})
    res = c.search({"q": "dona duck", "query_by": "concat",
                    "prefix": "true", "num_typos": "0",
                    "drop_tokens_threshold": "0"})
    # 'dona' is NOT the last token: no prefix expansion, no match for it
    assert res["found"] == 0
    res = c.search({"q": "donald du", "query_by": "concat",
                    "prefix": "true", "num_typos": "0",
                    "drop_tokens_threshold": "0"})
    assert _ids(res) == ["1"]


def test_import_repeating_id_in_same_batch():
    """ImportDocumentWithRepeatingIDInTheSameBatch (…:1599): the second
    create with the same id fails; the first stands."""
    c = Collection("sp2_repid", [Field("title", "string")])
    res = c.add_many([{"id": "0", "title": "first"},
                      {"id": "0", "title": "second"}])
    assert res[0]["success"] is True
    assert res[1]["success"] is False
    assert c.get("0")["title"] == "first"


def test_upsert_same_id_within_batch_last_wins():
    """UpsertOfTwoDocsWithSameIdWithinSameBatch (…:1717)."""
    c = Collection("sp2_upid", [Field("title", "string")])
    res = c.add_many([{"id": "0", "title": "first"},
                      {"id": "0", "title": "second"}], operation="upsert")
    assert all(r["success"] for r in res)
    assert c.get("0")["title"] == "second"
    r = c.search({"q": "second", "query_by": "title", "num_typos": "0",
                  "prefix": "false"})
    assert r["found"] == 1
    r = c.search({"q": "first", "query_by": "title", "num_typos": "0",
                  "prefix": "false"})
    assert r["found"] == 0


def test_progressive_typo_searching():
    """CheckProgressiveTypoSearching (…:242): 1-typo candidates are only
    consulted when 0-typo yields nothing, 2-typo when 1-typo doesn't."""
    c = Collection("sp2_prog", [Field("title", "string")])
    c.add({"id": "0", "title": "hawaii"})
    c.add({"id": "1", "title": "hawaiian"})
    res = c.search({"q": "hawai", "query_by": "title", "prefix": "false",
                    "num_typos": "2", "typo_tokens_threshold": "1"})
    # 1-typo 'hawaii' suffices; 'hawaiian' (distance 3) never matches
    assert _ids(res) == ["0"]


def test_dropped_tokens_not_prefix_searched():
    """DroppedTokensShouldNotBeUsedForPrefixSearch (…:2069): after a drop,
    the NEW last token doesn't suddenly become a prefix."""
    c = Collection("sp2_droppfx", [Field("title", "string")])
    c.add({"id": "0", "title": "yellow mask"})
    c.add({"id": "1", "title": "yellowstone"})
    res = c.search({"q": "yellow rhubarb", "query_by": "title",
                    "prefix": "true", "num_typos": "0",
                    "drop_tokens_threshold": "10"})
    # dropping 'rhubarb' leaves 'yellow' which must stay EXACT (not a
    # prefix matching yellowstone)
    assert _ids(res) == ["0"]
