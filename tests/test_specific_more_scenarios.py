"""Behaviors ported from
/root/reference/test/collection_specific_more_test.cpp — prefix expansion,
array-element match semantics, cross-field weighting, dropped-token
scoring, exact array filtering. Each test cites the reference TEST_F."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_max_candidates_respected():
    """MaxCandidatesShouldBeRespected (collection_specific_more_test.cpp:42):
    with max_candidates=1000 every prefixN doc matches the prefix query."""
    c = Collection("smm_cand", [Field("company", "string", facet=True)])
    for i in range(200):
        c.add({"id": str(i), "company": f"prefix{i}"})
    res = c.search({"q": "prefix", "query_by": "company", "prefix": "true",
                    "num_typos": "0", "max_candidates": "1000",
                    "per_page": 10})
    assert res["found"] == 200


def test_prefix_expansion_when_exact_match_exists():
    """PrefixExpansionWhenExactMatchExists (…:63): the last token must still
    expand as a prefix even though it matches a full token verbatim."""
    c = Collection("smm_pfx", [Field("title", "string"),
                               Field("author", "string")])
    c.add({"id": "0", "title": "The Little Prince [by] Antoine de Saint "
                               "Exupéry : teacher guide",
           "author": "Barbara Valdez"})
    c.add({"id": "1", "title": "Little Prince",
           "author": "Antoine de Saint-Exupery"})
    res = c.search({"q": "little prince antoine saint",
                    "query_by": "title,author", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "1"})
    assert res["found"] == 2


def test_prefix_expansion_on_single_field():
    """PrefixExpansionOnSingleField (…:93): default max_candidates=4 limits
    the expansion set; filters compose with the expansion."""
    c = Collection("smm_pfx1", [Field("title", "string"),
                                Field("points", "int32")],
                   default_sorting_field="points")
    titles = ["Mark Jack", "John Jack", "John James", "John Joseph",
              "John Jim", "John Jordan", "Mark Nicholas", "Mark Abbey",
              "Mark Boucher", "Mark Bicks", "Mark Potter"]
    for i, t in enumerate(titles):
        c.add({"id": str(i), "title": t, "points": i})
    base = {"query_by": "title", "prefix": "true", "num_typos": "0",
            "text_match_type": "max_score", "per_page": 100}
    res = c.search({**base, "q": "mark j"})
    assert _ids(res) == ["0"]
    res = c.search({**base, "q": "mark b"})
    assert _ids(res) == ["9", "8"]
    res = c.search({**base, "q": "mark b", "filter_by": "points:<9"})
    assert _ids(res) == ["8"]


def test_array_element_match_more_important_than_total_match():
    """ArrayElementMatchShouldBeMoreImportantThanTotalMatch (…:211)."""
    c = Collection("smm_arr1", [Field("title", "string"),
                                Field("author", "string"),
                                Field("tags", "string[]")])
    c.add({"id": "0", "title": "Harry Potter and the Prisoner of Azkaban",
           "author": "Rowling", "tags": ["harry", ""]})
    c.add({"id": "1", "title": "Fantastic beasts and where to find them",
           "author": "Rowling",
           "tags": ["harry", "potter", "prisoner", "azkaban", "beasts",
                    "guide", "rowling"]})
    c.add({"id": "2", "title": "Fantastic beasts and where to find them",
           "author": "Rowling",
           "tags": ["harry potter", "prisoner azkaban", "beasts", "guide",
                    "rowling"]})
    res = c.search({"q": "harry potter rowling prisoner azkaban",
                    "query_by": "title,author,tags", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "1"})
    assert _ids(res) == ["0", "2", "1"]


def test_array_match_across_elements_must_not_matter():
    """ArrayMatchAcrossElementsMustNotMatter (…:253): tokens co-occurring in
    ONE array element beat the same tokens scattered across elements."""
    c = Collection("smm_arr2", [Field("title", "string"),
                                Field("author", "string"),
                                Field("tags", "string[]")])
    c.add({"id": "0", "title": "Por do sol immateur", "author": "Vermelho",
           "tags": ["por do sol", "immateur", "gemsor", "praia", "sol",
                    "vermelho", "suyay"]})
    c.add({"id": "1", "title": "Sunset Rising", "author": "Vermelho",
           "tags": ["sunset", "por do sol", "praia", "somao", "vermelho"]})
    res = c.search({"q": "praia por sol vermelho",
                    "query_by": "title,author,tags", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "1"})
    assert _ids(res) == ["0", "1"]


def test_matched_segment_more_important_than_total_matches():
    """MatchedSegmentMoreImportantThanTotalMatches (…:287)."""
    c = Collection("smm_seg", [Field("title", "string"),
                               Field("author", "string")])
    c.add({"id": "0", "title": "One Two Three Four Five Six Seven Eight "
                               "Nine Ten Eleven Twelve Thirteen Fourteen",
           "author": "Rowling"})
    c.add({"id": "1", "title": "One Four Five Six Seven Eight Nine Ten "
                               "Eleven Twelve Thirteen Fourteen Three "
                               "Rowling", "author": "Two"})
    c.add({"id": "2", "title": "One Three Four Five Six Seven Eight Nine "
                               "Ten Eleven Twelve Thirteen Fourteen Two "
                               "Rowling", "author": "Foo"})
    res = c.search({"q": "one two three rowling",
                    "query_by": "title,author", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "1"})
    assert _ids(res) == ["0", "2", "1"]


def test_verbatim_match_not_on_partial_token_match():
    """VerbatimMatchNotOnPartialTokenMatch (…:326): a doc matching only a
    subset of tokens must not earn the verbatim-match boost."""
    c = Collection("smm_verb", [Field("title", "string"),
                                Field("tags", "string[]")])
    c.add({"id": "0", "title": "Thirteen Fourteen",
           "tags": ["foo", "bar", "Hundred", "Thirteen Fourteen"]})
    c.add({"id": "1", "title": "One Eleven Thirteen Fourteen Three",
           "tags": ["foo", "bar", "Hundred",
                    "One Eleven Thirteen Fourteen Three"]})
    res = c.search({"q": "hundred thirteen fourteen", "query_by": "tags",
                    "prefix": "true", "num_typos": "2",
                    "drop_tokens_threshold": "1"})
    assert _ids(res) == ["0", "1"]


def test_wrong_typo_correction_rejected():
    """WrongTypoCorrection (…:527): 'earrings' must not typo-match
    'arvin' (edit distance far beyond the budget)."""
    c = Collection("smm_typo", [Field("title", "string")])
    c.add({"id": "0", "title": "Gold plated arvin"})
    res = c.search({"q": "earrings", "query_by": "title", "prefix": "true",
                    "num_typos": "2"})
    assert res["found"] == 0


def test_exact_filtering_on_array():
    """ExactFilteringOnArray (…:677): := on an array matches whole
    elements, not token subsets or supersets."""
    c = Collection("smm_exf", [Field("tags", "string[]"),
                               Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "tags": ["§ 23", "§ 34d EStG", "§ 23 Satz EStG"],
           "points": 100})
    assert c.search({"q": "*", "query_by": "tags",
                     "filter_by": "tags:=§ 23 EStG"})["found"] == 0
    assert c.search({"q": "*", "query_by": "tags",
                     "filter_by": "tags:=§ 23"})["found"] == 1
    assert c.search({"q": "*", "query_by": "tags",
                     "filter_by": "tags:=§ 23 Satz"})["found"] == 0


def test_exact_filtering_on_array2():
    """ExactFilteringOnArray2 (…:729): an element PREFIX is not an exact
    element match."""
    c = Collection("smm_exf2", [Field("capability", "string[]", facet=True)])
    c.add({"id": "0", "capability": [
        "Encoding capabilities for network communications",
        "Obfuscation capabilities"]})
    res = c.search({"q": "*",
                    "filter_by": "capability:=Encoding capabilities"})
    assert res["found"] == 0


def test_relevance_considers_all_fields():
    """RelevanceConsiderAllFields (…:895): with explicit weights 3,2,1 the
    number of matched fields breaks ties; text_match_info reports it."""
    c = Collection("smm_all", [Field("f1", "string"), Field("f2", "string"),
                               Field("f3", "string")])
    c.add({"id": "0", "f1": "alpha", "f2": "alpha", "f3": "alpha"})
    c.add({"id": "1", "f1": "alpha", "f2": "alpha", "f3": "beta"})
    c.add({"id": "2", "f1": "alpha", "f2": "beta", "f3": "gamma"})
    res = c.search({"q": "alpha", "query_by": "f1,f2,f3",
                    "query_by_weights": "3,2,1", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "0"})
    assert _ids(res) == ["0", "1", "2"]
    infos = [h["text_match_info"] for h in res["hits"]]
    assert [i["fields_matched"] for i in infos] == [3, 2, 1]
    assert [i["tokens_matched"] for i in infos] == [1, 1, 1]
    assert len({i["best_field_score"] for i in infos}) == 1
    assert [i["best_field_weight"] for i in infos] == [3, 3, 3]


def test_cross_field_weight_not_augmented():
    """CrossFieldWeightIsNotAugmentated (…:954): a single-field full match
    on the heavier field beats a cross-field assembly."""
    c = Collection("smm_cross", [Field("title", "string"),
                                 Field("type", "string")])
    c.add({"id": "0", "title": "Nike Shoerack", "type": "shoe_rack"})
    c.add({"id": "1", "title": "Nike Air Force 1", "type": "shoe"})
    res = c.search({"q": "nike shoe", "query_by": "type,title",
                    "query_by_weights": "5,1", "prefix": "true",
                    "num_typos": "2", "drop_tokens_threshold": "0"})
    assert _ids(res) == ["0", "1"]


def test_searching_for_minus_character():
    """SearchingForMinusCharacter (…:1156): `-` in symbols_to_index is a
    real token char, not the exclusion operator."""
    c = Collection("smm_minus", [Field("name", "string"),
                                 Field("points", "int32")],
                   default_sorting_field="points", symbols_to_index=["-"])
    c.add({"id": "0", "name": "y = -x + 3 + 2 * x", "points": 100})
    c.add({"id": "1", "name": "foo bar", "points": 100})
    res = c.search({"q": "-x + 3", "query_by": "name", "prefix": "true",
                    "num_typos": "0"})
    assert res["found"] == 1
    res = c.search({"q": "-", "query_by": "name", "prefix": "true",
                    "num_typos": "0"})
    assert res["found"] == 1


def test_must_exclude_out_of():
    """MustExcludeOutOf (…:1765): exclude_fields=out_of drops the top-level
    out_of key."""
    c = Collection("smm_oof", [Field("title", "string")])
    c.add({"id": "0", "title": "Sample Title 1"})
    res = c.search({"q": "*", "exclude_fields": "out_of"})
    assert res["found"] == 1
    assert "out_of" not in res


def test_validate_query_by_id():
    """ValidateQueryById (…:1789)."""
    c = Collection("smm_qid", [Field("title", "string")])
    c.add({"id": "doc-1", "title": "Sample Title 1"})
    with pytest.raises(BadRequest,
                       match="Cannot use `id` as a query by field."):
        c.search({"q": "doc-1", "query_by": "id"})


def test_consider_dropped_tokens_during_text_match_scoring():
    """ConsiderDroppedTokensDuringTextMatchScoring (…:1809): under
    max_weight the doc matching MORE of the original query ranks first even
    though both need token drops."""
    c = Collection("smm_drop1", [Field("name", "string"),
                                 Field("brand", "string")])
    c.add({"id": "0", "brand": "Neutrogena",
           "name": "Neutrogena Ultra Sheer Oil-Free Face Serum With "
                   "Vitamin E + SPF 60"})
    c.add({"id": "1", "brand": "Neutrogena",
           "name": "Neutrogena Ultra Sheer Liquid Sunscreen SPF 70"})
    res = c.search({"q": "Neutrogena Ultra Sheer Moisturizing Face Serum",
                    "query_by": "brand,name", "query_by_weights": "3,2",
                    "prefix": "true", "num_typos": "2",
                    "drop_tokens_threshold": "5",
                    "text_match_type": "max_weight"})
    assert _ids(res) == ["0", "1"]


def test_consider_dropped_tokens_during_text_match_scoring2():
    """ConsiderDroppedTokensDuringTextMatchScoring2 (…:1842)."""
    c = Collection("smm_drop2", [Field("name", "string")])
    c.add({"id": "0", "name": "Elizabeth Arden 5th Avenue Eau de Parfum "
                              "125ml"})
    c.add({"id": "1", "name": "Avène Sun Very High Protection Mineral "
                              "Cream SPF50+ 50ml"})
    res = c.search({"q": "avène eau mineral", "query_by": "name",
                    "prefix": "true", "num_typos": "2",
                    "drop_tokens_threshold": "5",
                    "text_match_type": "max_weight"})
    assert _ids(res) == ["1", "0"]


def test_include_fields_only_id():
    """IncludeFieldsOnlyId (…:1454)."""
    c = Collection("smm_incid", [Field("title", "string")])
    c.add({"id": "0", "title": "Sample Title"})
    res = c.search({"q": "*", "include_fields": "id"})
    assert res["hits"][0]["document"] == {"id": "0"}


def test_exclude_out_of_response_key():
    """MustExcludeOutOf (collection_specific_more_test.cpp:1765):
    exclude_fields=out_of drops the response-level key."""
    c = Collection("sm_outof", [Field("title", "string")])
    c.add({"title": "Sample Title 1"})
    res = c.search({"q": "*", "exclude_fields": "out_of"})
    assert "out_of" not in res and len(res["hits"]) == 1
    res = c.search({"q": "*"})
    assert res["out_of"] == 1
