"""Behaviors ported from /root/reference/test/collection_specific_test.cpp —
tricky ranking / tokenization / weighting contracts with documented expected
hit orders. Each test cites the reference TEST_F and line.
"""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _coll(name, extra=(), docs=()):
    c = Collection(name, [Field("title", "string"),
                          *extra,
                          Field("points", "int32")],
                   default_sorting_field="points")
    for d in docs:
        c.add(d)
    return c


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_search_text_with_hyphen():
    """SearchTextWithHyphen (collection_specific_test.cpp:54)."""
    c = _coll("sp_hyphen", docs=[
        {"id": "0",
         "title": "open-access-may-become-mandatory-for-nih-funded-research",
         "points": 100}])
    res = c.search({"q": "open-access-may-become-mandatory-for-nih-funded-"
                         "research", "query_by": "title"})
    assert res["found"] == 1
    assert _ids(res) == ["0"]


def test_exact_single_field_match_and_typo_threshold():
    """ExactSingleFieldMatch (collection_specific_test.cpp:195): exact token
    beats typo'd token; typo_tokens_threshold=1 suppresses typo expansion
    when exact results suffice."""
    c = _coll("sp_exact1", extra=[Field("description", "string")], docs=[
        {"id": "0", "title": "Fast Electric Charger",
         "description": "A product you should buy.", "points": 100},
        {"id": "1", "title": "Omega Chargex",
         "description": "Chargex is a great product.", "points": 200}])
    res = c.search({"q": "charger", "query_by": "title,description",
                    "num_typos": "2", "typo_tokens_threshold": "10"})
    assert _ids(res) == ["0", "1"]
    res = c.search({"q": "charger", "query_by": "title,description",
                    "num_typos": "2", "typo_tokens_threshold": "1"})
    assert _ids(res) == ["0"]


def test_typo_before_drop_tokens():
    """TypoBeforeDropTokens (collection_specific_test.cpp:338): with
    drop_tokens_threshold=1 the typo match alone is returned; raising the
    threshold ranks the typo'd full match above the dropped-token match."""
    c = _coll("sp_typodrop", docs=[
        {"id": "0", "title": "Josh Wexler", "points": 500},
        {"id": "1", "title": "Josh Lipson", "points": 100}])
    res = c.search({"q": "Josh Lixson", "query_by": "title",
                    "num_typos": "2", "drop_tokens_threshold": "1"})
    assert _ids(res) == ["1"]
    res = c.search({"q": "Josh Lixson", "query_by": "title",
                    "num_typos": "2", "drop_tokens_threshold": "10"})
    assert _ids(res) == ["1", "0"]


def test_drop_tokens_value_when_tokens_split():
    """DropTokensValueWhenTokensAreSplit (collection_specific_test.cpp:375):
    a split-token match ("blueray" -> "blue ray") reports zero dropped
    tokens."""
    c = _coll("sp_split", docs=[
        {"id": "0", "title": "Blue Ray", "points": 500}])
    res = c.search({"q": "blueray", "query_by": "title", "num_typos": "2"})
    assert _ids(res) == ["0"]
    info = res["hits"][0].get("text_match_info", {})
    assert int(info.get("num_tokens_dropped", 0)) == 0


def test_field_weighting_flips_order():
    """FieldWeighting (collection_specific_test.cpp:398): weight 4 on
    description outranks weight 1 on title."""
    c = _coll("sp_weight", extra=[Field("description", "string")], docs=[
        {"id": "0", "title": "The Quick Brown Fox",
         "description": "Share information with this device.",
         "points": 100},
        {"id": "1", "title": "Random Title",
         "description": "The Quick Brown Fox", "points": 50}])
    res = c.search({"q": "brown fox", "query_by": "title,description",
                    "query_by_weights": "1,4", "num_typos": "2"})
    assert _ids(res) == ["1", "0"]


def test_multi_field_array_repeating_tokens():
    """MultiFieldArrayRepeatingTokens (collection_specific_test.cpp:433):
    all three tokens must land on one document."""
    c = _coll("sp_repeat", extra=[
        Field("description", "string"), Field("attrs", "string[]")], docs=[
        {"id": "0", "title": "E182-72/4",
         "description": "Nexsan Technologies 18 SAN Array - 18 x HDD "
                        "Supported - 18 x HDD Installed",
         "attrs": ["Hard Drives Supported > 18",
                   "Hard Drives Installed > 18", "SSD Supported > 18"],
         "points": 100},
        {"id": "1", "title": "RV345-K9-NA",
         "description": "Cisco RV345P Router - 18 Ports",
         "attrs": ["Number of Ports > 18", "Product Type > Router"],
         "points": 50}])
    res = c.search({"q": "rv345 cisco 18",
                    "query_by": "title,description,attrs",
                    "num_typos": "1", "drop_tokens_threshold": "0"})
    assert _ids(res) == ["1"]


def test_exact_match_on_prefix():
    """ExactMatchOnPrefix (collection_specific_test.cpp:467): the verbatim
    single-token field ranks above the longer prefix-matched field."""
    c = _coll("sp_exactpfx", docs=[
        {"id": "0", "title": "Yeshivah Gedolah High School", "points": 100},
        {"id": "1", "title": "GED", "points": 50}])
    res = c.search({"q": "ged", "query_by": "title", "prefix": "true",
                    "num_typos": "2", "typo_tokens_threshold": "1"})
    assert _ids(res) == ["1", "0"]


def test_typo_on_prefix_disabled_token():
    """TypoPrefixSearchWithoutPrefixEnabled
    (collection_specific_test.cpp:500): prefix=false still finds the doc
    through typo correction of the truncated token."""
    c = _coll("sp_typopfx", docs=[
        {"id": "0", "title": "Cisco SG25026HP Gigabit Smart Switch",
         "points": 100}])
    res = c.search({"q": "SG25026H", "query_by": "title", "prefix": "false",
                    "num_typos": "2", "drop_tokens_threshold": "0"})
    assert _ids(res) == ["0"]


def test_prefix_with_typos_no_false_positive():
    """PrefixWithTypos (collection_specific_test.cpp:525): 'maria' must not
    match 'PRÍNCIPE - Restaurante e Snack Bar' with typos, prefix on or
    off."""
    c = _coll("sp_nofp", docs=[
        {"id": "0", "title": "PRÍNCIPE - Restaurante e Snack Bar",
         "points": 100}])
    for pfx in ("true", "false"):
        res = c.search({"q": "maria", "query_by": "title", "prefix": pfx,
                        "num_typos": "2"})
        assert res["hits"] == [], pfx


def test_multi_field_verbatim_matches_weighted():
    """MultiFieldVerbatimMatchesShouldBeWeighted
    (collection_specific_test.cpp:1523): two exact matches on weight-1
    fields must not overpower one exact match on the weight-6 field."""
    c = _coll("sp_verbw", extra=[
        Field("name", "string"), Field("category", "string"),
        Field("label", "string")], docs=[
        {"id": "0", "title": "x", "name": "Amazing Twin", "category": "kids",
         "label": "kids", "points": 3},
        {"id": "1", "title": "x", "name": "Kids", "category": "children",
         "label": "children", "points": 5}])
    res = c.search({"q": "kids", "query_by": "name,category,label",
                    "query_by_weights": "6,1,1", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res) == ["1", "0"]


def test_zero_weighted_field():
    """ZeroWeightedField (collection_specific_test.cpp:1563): weight 0 on
    the first query field still matches but loses to the weight-1 field."""
    c = _coll("sp_zerow", extra=[
        Field("name", "string"), Field("category", "string")], docs=[
        {"id": "0", "title": "x", "name": "Energy Kids", "category": "kids",
         "points": 3},
        {"id": "1", "title": "x", "name": "Amazing Twin",
         "category": "kids", "points": 5}])
    res = c.search({"q": "kids", "query_by": "category,name",
                    "query_by_weights": "1,0", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res) == ["0", "1"]


def test_token_count_of_words_far_apart_multi_field():
    """TokenCountOfWordsFarApart (collection_specific_test.cpp:2287): the
    compact two-token doc outranks the doc whose tokens sit far apart,
    even though the far-apart doc's best window holds one token."""
    c = _coll("sp_farapart", extra=[Field("author", "string")], docs=[
        {"id": "0",
         "title": "Central Arizona Project. - Hearing, Eighty-eighth "
                  "Congress, Second Session, on H.R. 6796, H.R. 6797, "
                  "H.R. 6798. November 9, 1964, Phoenix, Ariz",
         "author": "JK", "points": 0},
        {"id": "1", "title": "Project Phoenix", "author": "JK",
         "points": 1}])
    res = c.search({"q": "Phoenix project", "query_by": "title,author",
                    "prefix": "false", "num_typos": "2",
                    "drop_tokens_threshold": "1"})
    assert _ids(res) == ["1", "0"]


def test_single_field_token_count_words_far_apart():
    """SingleFieldTokenCountOfWordsFarApart
    (collection_specific_test.cpp:2328): both tokens present far apart
    beats a dropped-token match; with drop_tokens_threshold=1 only the
    full match returns."""
    c = _coll("sp_farapart1", extra=[Field("author", "string")], docs=[
        {"id": "0",
         "title": "Central Arizona Project. - Hearing, Eighty-eighth "
                  "Congress, Second Session, on H.R. 6796, H.R. 6797, "
                  "H.R. 6798. November 9, 1964, Phoenix, Ariz",
         "author": "JK", "points": 0},
        {"id": "1", "title": "Project Aim Arizona", "author": "JK",
         "points": 1}])
    res = c.search({"q": "Phoenix project", "query_by": "title",
                    "prefix": "false", "num_typos": "2",
                    "drop_tokens_threshold": "10"})
    assert _ids(res) == ["0", "1"]
    res = c.search({"q": "Phoenix project", "query_by": "title",
                    "prefix": "false", "num_typos": "2",
                    "drop_tokens_threshold": "1"})
    assert _ids(res) == ["0"]


def test_single_hyphen_not_exclusion():
    """SingleHyphenInQueryNotToBeTreatedAsExclusion
    (collection_specific_test.cpp:2379)."""
    c = _coll("sp_hyphex", docs=[
        {"id": "0",
         "title": "Saturday Short - Thrive (with Audio Descriptions + "
                  "Open Captions)", "points": 100}])
    res = c.search({"q": "Saturday Short - Thrive (with Audio Descriptions "
                         "+ Open Captions)",
                    "query_by": "title", "num_typos": "2",
                    "drop_tokens_threshold": "10"})
    assert res["found"] == 1


def test_duplicate_fields_not_allowed():
    """DuplicateFieldsNotAllowed (collection_specific_test.cpp:2403)."""
    with pytest.raises(TypesenseError) as ei:
        Collection("sp_dup", [Field("title", "string"),
                              Field("title", "int32")],
                   default_sorting_field=None)
    assert ei.value.http_code == 400


def test_guard_against_id_field_in_schema():
    """GuardAgainstIdFieldInSchema (collection_specific_test.cpp:791): `id`
    is reserved and must be rejected as a schema field."""
    with pytest.raises(TypesenseError) as ei:
        Collection("sp_idfield", [Field("id", "string"),
                                  Field("points", "int32")],
                   default_sorting_field="points")
    assert ei.value.http_code == 400


def test_negation_of_tokens():
    """NegationOfTokens (collection_specific_test.cpp:2863)."""
    c = _coll("sp_neg", docs=[
        {"id": "0", "title": "smoked salmon fillet", "points": 10},
        {"id": "1", "title": "grilled salmon steak", "points": 20},
        {"id": "2", "title": "smoked trout fillet", "points": 30}])
    res = c.search({"q": "salmon -grilled", "query_by": "title",
                    "prefix": "false", "num_typos": "0"})
    assert _ids(res) == ["0"]


def test_repeating_string_array_tokens():
    """RepeatingStringArrayTokens (collection_specific_test.cpp:2011): many
    repeats of a token in an array field must not break the match."""
    tags = ["pop"] * 20 + ["rock", "indie"]
    c = _coll("sp_reparr", extra=[Field("tags", "string[]")], docs=[
        {"id": "0", "title": "x", "tags": tags, "points": 10}])
    res = c.search({"q": "rock", "query_by": "tags", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res) == ["0"]


def test_empty_array_accepted_as_first_value():
    """EmptyArrayShouldBeAcceptedAsFirstValue
    (collection_specific_test.cpp:2431)."""
    c = Collection("sp_emptyarr", [Field("title", "string"),
                                   Field("tags", "string[]"),
                                   Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "alpha", "tags": [], "points": 1})
    c.add({"id": "1", "title": "alpha", "tags": ["x"], "points": 2})
    res = c.search({"q": "alpha", "query_by": "title"})
    assert res["found"] == 2


def test_handle_large_weights():
    """HandleLargeWeights (collection_specific_test.cpp:2735): weights above
    the packed 7-bit range must not error or corrupt ordering."""
    c = _coll("sp_bigw", extra=[Field("description", "string")], docs=[
        {"id": "0", "title": "alpha beta", "description": "x", "points": 1},
        {"id": "1", "title": "x", "description": "alpha beta", "points": 2}])
    res = c.search({"q": "alpha beta", "query_by": "title,description",
                    "query_by_weights": "400,1", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res)[0] == "0"


def test_tokens_spread_across_fields():
    """TokensSpreadAcrossFields (collection_specific_test.cpp:757): both
    tokens in one field beat tokens split across two fields."""
    c = _coll("sp_spread", extra=[Field("description", "string")], docs=[
        {"id": "0", "title": "Foo bar baz",
         "description": "Share information with this device.",
         "points": 100},
        {"id": "1", "title": "Foo Random",
         "description": "The Bar Fox", "points": 250}])
    res = c.search({"q": "foo bar", "query_by": "title,description",
                    "query_by_weights": "4,1", "prefix": "false",
                    "num_typos": "0"})
    assert _ids(res) == ["0", "1"]


def test_import_document_with_integer_id():
    """ImportDocumentWithIntegerID (collection_specific_test.cpp:622):
    integer ids are rejected with the exact reference message."""
    c = _coll("sp_intid")
    with pytest.raises(TypesenseError) as ei:
        c.add({"id": 42, "title": "alpha", "points": 1})
    assert "id` field should be a string" in str(ei.value)
    assert ei.value.http_code == 400


# --- _text_match(buckets / bucket_size) (collection_sorting_test.cpp) ---

@pytest.fixture()
def mark_coll():
    c = _coll("sp_buckets", extra=[Field("description", "string")], docs=[
        {"id": "0", "title": "Mark Antony", "description": "Counsellor",
         "points": 100},
        {"id": "1", "title": "Marks Spencer", "description": "Sales Expert",
         "points": 200}])
    return c


def test_text_match_bucket_ranking(mark_coll):
    """TextMatchBucketRanking (collection_sorting_test.cpp:1632)."""
    base = {"q": "mark", "query_by": "title", "prefix": "true",
            "num_typos": "2"}
    # more buckets than results: no bucketing
    res = mark_coll.search({**base,
                            "sort_by": "_text_match(buckets: 10):desc,"
                                       "points:desc"})
    assert _ids(res) == ["0", "1"]
    # one bucket: scores equalized, points decides
    res = mark_coll.search({**base,
                            "sort_by": "_text_match(buckets: 1):desc,"
                                       "points:desc"})
    assert _ids(res) == ["1", "0"]
    s1 = int(res["hits"][0]["text_match_info"]["score"])
    s2 = int(res["hits"][1]["text_match_info"]["score"])
    assert s1 < s2          # original scores restored in the response
    # zero buckets: original text match
    res = mark_coll.search({**base,
                            "sort_by": "_text_match(buckets: 0):desc,"
                                       "points:desc"})
    assert _ids(res) == ["0", "1"]


def test_text_match_bucket_errors(mark_coll):
    base = {"q": "mark", "query_by": "title", "prefix": "true",
            "num_typos": "2"}
    with pytest.raises(TypesenseError) as ei:
        mark_coll.search({**base,
                          "sort_by": "_text_match(foobar: 0):desc"})
    assert "Invalid sorting parameter passed for _text_match" in str(ei.value)
    with pytest.raises(TypesenseError) as ei:
        mark_coll.search({**base, "sort_by": "_text_match(foobar::desc"})
    assert "Could not find a field named" in str(ei.value)
    with pytest.raises(TypesenseError) as ei:
        mark_coll.search({**base,
                          "sort_by": "_text_match(buckets: x):desc"})
    assert "Invalid value passed for _text_match" in str(ei.value)
    with pytest.raises(TypesenseError) as ei:
        mark_coll.search({**base,
                          "sort_by": "_text_match(buckets: -1):desc"})
    assert "Invalid value passed for _text_match" in str(ei.value)


def test_text_match_bucket_size_ranking():
    """TextMatchBucketSizeRanking (collection_sorting_test.cpp:3223):
    groups of `bucket_size` share a score, secondary sort decides inside
    each group."""
    c = _coll("sp_bsize", docs=[
        {"id": "0", "title": "alpha beta", "points": 1},
        {"id": "1", "title": "alpha beta", "points": 9},
        {"id": "2", "title": "alpha beta", "points": 5},
        {"id": "3", "title": "alpha gamma beta", "points": 100}])
    res = c.search({"q": "alpha beta", "query_by": "title",
                    "prefix": "false", "num_typos": "0",
                    "sort_by": "_text_match(bucket_size: 4):desc,"
                               "points:desc"})
    # all four fall in ONE bucket of size 4 -> pure points order
    assert _ids(res) == ["3", "1", "2", "0"]
    res = c.search({"q": "alpha beta", "query_by": "title",
                    "prefix": "false", "num_typos": "0",
                    "sort_by": "_text_match(bucket_size: 2):desc,"
                               "points:desc"})
    # first two ranked (adjacent text-match) bucket together
    ids = _ids(res)
    assert set(ids[:2]) and len(ids) == 4
