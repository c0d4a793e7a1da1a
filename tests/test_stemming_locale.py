"""Stemming + locale tokenization tests (reference: stemmer_test.cpp,
collection_locale_test.cpp)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field
from typesense_tpu.text.stemmer import StemmerManager, porter2_stem
from typesense_tpu.text.tokenizer import Tokenizer


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


def test_porter2_basics():
    assert porter2_stem("running") == "run"
    assert porter2_stem("searches") == "search"
    assert porter2_stem("searched") == "search"
    assert porter2_stem("connection") == "connect"
    assert porter2_stem("happily") == "happili"


def test_stemmed_field_search():
    c = Collection("s", [Field("title", "string", stem=True)])
    c.add({"id": "0", "title": "running shoes"})
    c.add({"id": "1", "title": "walked miles"})
    # query token stems to the same root as the document token
    res = c.search({"q": "run", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    assert ids(res) == ["0"]
    res = c.search({"q": "walking", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    assert ids(res) == ["1"]


def test_stemming_dictionary_override():
    sm = StemmerManager()
    sm.import_dictionary("irregular", '{"word": "people", "root": "person"}\n'
                                      '{"word": "geese", "root": "goose"}')
    c = Collection("d", [Field("title", "string", stem=True,
                               stem_dictionary="irregular")])
    c.add({"id": "0", "title": "many people here"})
    res = c.search({"q": "person", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    assert ids(res) == ["0"]
    assert sm.get_dictionary("irregular")["words"][0]["word"] in ("people", "geese")


def test_cjk_tokenization():
    # ja: kakasi-style romaji unit pairs (kanji readings + kana runs)
    toks = Tokenizer("日本語テスト", locale="ja").tokenize()
    assert toks == ["nichihon", "hongo", "gotesuto"]
    toks_zh = Tokenizer("中文搜索", locale="zh").tokenize()
    assert toks_zh == ["中文", "文搜", "搜索"]


def test_cjk_field_search():
    c = Collection("zh", [Field("title", "string", locale="zh")])
    c.add({"id": "0", "title": "中文搜索引擎"})
    c.add({"id": "1", "title": "日本料理"})
    res = c.search({"q": "搜索", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    assert ids(res) == ["0"]


def test_accented_transliteration():
    c = Collection("fr", [Field("title", "string")])
    c.add({"id": "0", "title": "crème brûlée"})
    res = c.search({"q": "creme brulee", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    assert ids(res) == ["0"]


def test_search_cutoff_flag():
    c = Collection("t", [Field("title", "string")])
    c.add({"id": "0", "title": "hello"})
    res = c.search({"q": "hello", "query_by": "title"})
    assert res["search_cutoff"] is False


def test_pre_segmented_query():
    c = Collection("ps", [Field("title", "string", locale="zh")])
    c.add({"id": "0", "title": "中文搜索引擎"})
    res = c.search({"q": "搜 索", "query_by": "title",
                    "pre_segmented_query": "true", "num_typos": "0",
                    "prefix": "false"})
    assert res["found"] == 1


def test_cjk_bigram_substring_search():
    """Bigram segmentation finds substrings of longer CJK phrases exactly —
    the behavior ICU BreakIterator + dictionary gives the reference (a
    2-char query inside a 6-char title), without over-matching single chars
    spread across the document."""
    c = Collection("zhbig", [Field("title", "string", locale="zh")])
    c.add({"id": "0", "title": "中文搜索引擎"})
    c.add({"id": "1", "title": "搜查引发中断"})  # has 搜 and 索-free
    res = c.search({"q": "搜索", "query_by": "title", "num_typos": "0",
                    "prefix": "false"})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids == ["0"]  # bigram 搜索 only exists in doc 0


def test_japanese_bigram_phrase():
    c = Collection("jabig", [Field("t", "string", locale="ja")])
    c.add({"id": "0", "t": "東京大学の研究"})
    c.add({"id": "1", "t": "京都大学"})
    res = c.search({"q": "東京大学", "query_by": "t", "num_typos": "0",
                    "prefix": "false"})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids == ["0"]  # doc1 has 大学 but not 東京
    res2 = c.search({"q": "大学", "query_by": "t", "num_typos": "0",
                     "prefix": "false"})
    assert len(res2["hits"]) == 2


def test_korean_word_search():
    c = Collection("kow", [Field("t", "string", locale="ko")])
    c.add({"id": "0", "t": "안녕하세요 세계"})
    res = c.search({"q": "세계", "query_by": "t", "num_typos": "0",
                    "prefix": "false"})
    assert len(res["hits"]) == 1


def test_thai_dictionary_segmentation():
    # dictionary maximal-match: known words come out whole
    assert Tokenizer("สวัสดี", locale="th").tokenize() == ["สวัสดี"]
    assert Tokenizer("สวัสดีครับ", locale="th").tokenize() == \
        ["สวัสดี", "ครับ"]
    assert Tokenizer("ผมกินข้าว", locale="th").tokenize() == \
        ["ผม", "กิน", "ข้าว"]


def test_thai_field_search_segmented():
    c = Collection("thseg", [Field("t", "string", locale="th")])
    c.add({"id": "0", "t": "ผมกินข้าวทุกวัน"})       # I eat rice every day
    c.add({"id": "1", "t": "แมวนอนบนโต๊ะ"})           # cat sleeps on table
    res = c.search({"q": "กินข้าว", "query_by": "t", "num_typos": "0",
                    "prefix": "false"})
    assert [h["document"]["id"] for h in res["hits"]] == ["0"]


def test_japanese_kana_kanji_unification():
    """kakasi romanization: a kana query finds the kanji document
    (japanese_localizer.h behavior)."""
    c = Collection("jakana", [Field("t", "string", locale="ja")])
    c.add({"id": "0", "t": "東京"})
    c.add({"id": "1", "t": "京都"})
    res = c.search({"q": "とうきょう", "query_by": "t", "num_typos": "0",
                    "prefix": "false"})
    assert [h["document"]["id"] for h in res["hits"]] == ["0"]
    # romaji query unifies too
    res2 = c.search({"q": "toukyou", "query_by": "t", "num_typos": "0",
                     "prefix": "false"})
    assert [h["document"]["id"] for h in res2["hits"]] == ["0"]
