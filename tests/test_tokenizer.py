"""Tokenizer parity tests.

Expected values follow /root/reference/src/tokenizer.cpp semantics and the
reference's test/tokenizer_test.cpp cases.
"""

from typesense_tpu.text.tokenizer import Tokenizer, tokenize


def test_basic_ascii():
    assert tokenize("Hello World") == ["hello", "world"]


def test_punctuation_skipped():
    # non-separator, non-alnum ASCII chars are dropped inside tokens
    assert tokenize("Mise's Plan") == ["mises", "plan"]
    assert tokenize("c++ guide") == ["c", "guide"]


def test_multiple_spaces_and_newlines():
    assert tokenize("one  two\nthree") == ["one", "two", "three"]


def test_numbers():
    assert tokenize("iphone 14 pro-max 256GB") == ["iphone", "14", "promax", "256gb"]


def test_symbols_to_index():
    assert tokenize("c++ guide", symbols_to_index=["+"]) == ["c++", "guide"]


def test_custom_separators():
    assert tokenize("alpha-beta", separators=["-"]) == ["alpha", "beta"]


def test_accented_transliteration():
    # iconv ASCII//TRANSLIT path: accents fold to ascii
    assert tokenize("café résumé") == ["cafe", "resume"]


def test_non_transliterable_kept():
    toks = tokenize("中文 test")
    assert "test" in toks


def test_empty():
    assert tokenize("") == []
    assert tokenize("   !!! ") == []


def test_offsets():
    t = Tokenizer("Hello, World")
    out = t.tokenize_with_offsets()
    assert out[0][0] == "hello" and out[0][2] == 0
    assert out[1][0] == "world"
    assert out[1][1] == 1  # token index


def test_cjk_bigram_tokens():
    # dictionary-free CJK segmentation: overlapping bigrams (CJKAnalyzer
    # style) — better precision than per-codepoint unigrams
    toks = tokenize("你好世界", locale="zh")
    assert toks == ["你好", "好世", "世界"]


def test_cjk_single_char_run():
    # ja single kanji: romanized reading (kakasi-style); zh stays raw
    assert tokenize("猫", locale="ja") == ["neko"]
    assert tokenize("猫 犬", locale="ja") == ["neko", "inu"]
    assert tokenize("猫", locale="zh") == ["猫"]


def test_hangul_whole_word():
    toks = tokenize("안녕하세요 세계", locale="ko")
    assert len(toks) == 2  # space-delimited words stay whole
