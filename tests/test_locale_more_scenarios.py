"""Locale behaviors ported from
/root/reference/test/collection_locale_test.cpp — Cyrillic case folding +
typos, Greek, Arabic typos, Bulgarian prefix, German typo tolerance,
pt exclusion queries."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_cyrillic_case_folding_and_typos():
    """SearchCyrillicText (collection_locale_test.cpp:579): lower/upper
    Cyrillic fold together; a 1-typo Cyrillic query still matches."""
    c = Collection("loc_cyr", [Field("title", "string", locale="sr")])
    c.add({"id": "0", "title": "Test Тест"})
    c.add({"id": "1", "title": "TEST ТЕСТ"})
    res = c.search({"q": "тест", "query_by": "title", "prefix": "false",
                    "num_typos": "0"})
    assert res["found"] == 2
    res = c.search({"q": "тетст", "query_by": "title", "prefix": "false",
                    "num_typos": "1"})
    assert res["found"] == 2


def test_greek_search_and_facet():
    """SearchAndFacetSearchForGreekText (…:662)."""
    c = Collection("loc_el", [Field("title", "string", locale="el",
                                    facet=True)])
    c.add({"id": "0", "title": "Εμφάνιση κάθε μέρα"})
    c.add({"id": "1", "title": "καλημέρα σε όλους"})
    res = c.search({"q": "μέρα", "query_by": "title", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res) == ["0"]
    res = c.search({"q": "*", "facet_by": "title",
                    "facet_query": "title:καλημ"})
    counts = res["facet_counts"][0]["counts"]
    assert len(counts) == 1 and "καλημέρα" in counts[0]["value"]


def test_arabic_typo_search():
    """SearchOnArabicTextWithTypo (…:818): 1-typo and 2-typo Arabic
    matches rank closer-edit first."""
    c = Collection("loc_ar", [Field("title", "string", facet=True)])
    c.add({"id": "0", "title": "ينوس"})
    c.add({"id": "1", "title": "ينواد"})
    res = c.search({"q": "ينود", "query_by": "title", "prefix": "false",
                    "num_typos": "2"})
    assert res["found"] == 2
    assert _ids(res) == ["1", "0"]


def test_bulgarian_prefix():
    """SearchOnBulgarianText (…:842): prefix query must not typo-bleed
    into sibling words."""
    c = Collection("loc_bg", [Field("title", "string", locale="bg",
                                    facet=True)])
    c.add({"id": "0", "title": "Сърце от любов"})
    c.add({"id": "1", "title": "Съблезъб тигър"})
    c.add({"id": "2", "title": "Сърна"})
    res = c.search({"q": "Сърце", "query_by": "title", "prefix": "true",
                    "num_typos": "2", "typo_tokens_threshold": "1"})
    assert _ids(res) == ["0"]


def test_german_typo_tolerance():
    """SearchInGermanLocaleShouldBeTypoTolerant (…:887)."""
    c = Collection("loc_de", [Field("title", "string", locale="de")])
    c.add({"id": "0", "title": "Bürgermeister"})
    res = c.search({"q": "burgermeister", "query_by": "title",
                    "prefix": "false", "num_typos": "2"})
    assert res["found"] == 1


def test_exclude_query_with_pt_locale():
    """ExcludeQueryWithPt (…:908): `-token` exclusion works on accented
    pt text."""
    c = Collection("loc_pt", [Field("title", "string", locale="pt")])
    c.add({"id": "0", "title": "mentira de um homem"})
    c.add({"id": "1", "title": "homem honesto código"})
    res = c.search({"q": "homem -mentira", "query_by": "title",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res) == ["1"]


def test_cyrillic_with_special_characters():
    """SearchOnCyrillicTextWithSpecialCharacters (…:709)."""
    c = Collection("loc_cyr2", [Field("title", "string", locale="ru")])
    c.add({"id": "0", "title": "Пособие 'На руки'! (виплата)"})
    res = c.search({"q": "виплата", "query_by": "title", "prefix": "false",
                    "num_typos": "0"})
    assert res["found"] == 1
    res = c.search({"q": "руки", "query_by": "title", "prefix": "false",
                    "num_typos": "0"})
    assert res["found"] == 1
