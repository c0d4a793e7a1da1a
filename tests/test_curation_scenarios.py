"""Curation-set scenario family — reference collection_override_test.cpp
behaviors: exact/contains query rules, includes (pins at positions),
excludes (hides), rule filter_by injection, replace_query, enable_overrides
opt-out, and rule CRUD over HTTP.
"""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "shoes",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "brand", "type": "string", "facet": True},
                   {"name": "points", "type": "int32"}],
        "default_sorting_field": "points",
        "metadata": {"curation_sets": ["promos"]}})
    docs = [
        {"id": "0", "title": "air max sneakers", "brand": "nike",
         "points": 50},
        {"id": "1", "title": "gel lyte sneakers", "brand": "asics",
         "points": 40},
        {"id": "2", "title": "classic leather sneakers", "brand": "reebok",
         "points": 30},
        {"id": "3", "title": "running sandals", "brand": "teva",
         "points": 20},
        {"id": "4", "title": "boost sneakers", "brand": "adidas",
         "points": 10},
    ]
    for d in docs:
        call(s, "POST", "/collections/shoes/documents", body=d)
    return s


def _put_set(s, items):
    code, body = call(s, "PUT", "/curation_sets/promos",
                      body={"items": items})
    assert code == 200, body
    return body


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def search(s, **params):
    code, res = call(s, "GET", "/collections/shoes/documents/search",
                     query={"q": params.pop("q", "sneakers"),
                            "query_by": "title", "prefix": "false",
                            "num_typos": "0", **params})
    assert code == 200, res
    return res


def test_exact_match_include_pins(srv):
    _put_set(srv, [{
        "id": "pin-adidas",
        "rule": {"query": "sneakers", "match": "exact"},
        "includes": [{"id": "4", "position": 1}]}])
    res = search(srv)
    assert ids(res)[0] == "4"
    assert ids(res) == ["4", "0", "1", "2"]
    # non-matching query unaffected
    res2 = search(srv, q="sandals")
    assert ids(res2) == ["3"]


def test_contains_match(srv):
    _put_set(srv, [{
        "id": "c",
        "rule": {"query": "sneakers", "match": "contains"},
        "includes": [{"id": "2", "position": 1}]}])
    res = search(srv, q="best sneakers")
    # 'sneakers' contained as a WORD in the query -> rule fires; doc 2
    # pinned even though 'best' matches nothing
    assert "2" in ids(res) and ids(res)[0] == "2"


def test_contains_is_word_boundary(srv):
    # StringUtils::contains_word: 'sneak' is NOT a word of 'best sneakers',
    # so the rule must not fire (substring match would be wrong)
    _put_set(srv, [{
        "id": "c2",
        "rule": {"query": "sneak", "match": "contains"},
        "includes": [{"id": "2", "position": 1}]}])
    res = search(srv, q="best sneakers")
    assert ids(res)[0] != "2"


def test_excludes_hide_doc(srv):
    _put_set(srv, [{
        "id": "x",
        "rule": {"query": "sneakers", "match": "exact"},
        "excludes": [{"id": "0"}]}])
    res = search(srv)
    assert "0" not in ids(res)
    assert res["found"] == 3


def test_rule_filter_by_injection(srv):
    _put_set(srv, [{
        "id": "f",
        "rule": {"query": "sneakers", "match": "exact"},
        "filter_by": "points:>25"}])
    res = search(srv)
    assert ids(res) == ["0", "1", "2"]


def test_replace_query(srv):
    _put_set(srv, [{
        "id": "r",
        "rule": {"query": "kicks", "match": "exact"},
        "replace_query": "sneakers"}])
    res = search(srv, q="kicks")
    assert res["found"] == 4


def test_enable_overrides_false_skips_rules(srv):
    _put_set(srv, [{
        "id": "pin",
        "rule": {"query": "sneakers", "match": "exact"},
        "includes": [{"id": "4", "position": 1}]}])
    res = search(srv, enable_overrides="false")
    assert ids(res) == ["0", "1", "2", "4"]  # organic points order


def test_multiple_rules_combine(srv):
    # stop_processing defaults TRUE (curation.h:40): rule `a` must opt out
    # for rule `b` to also apply
    _put_set(srv, [
        {"id": "a", "rule": {"query": "sneakers", "match": "exact"},
         "includes": [{"id": "3", "position": 1}],
         "stop_processing": False},
        {"id": "b", "rule": {"query": "sneakers", "match": "exact"},
         "excludes": [{"id": "1"}]},
    ])
    res = search(srv)
    assert ids(res)[0] == "3"
    assert "1" not in ids(res)


def test_stop_processing_default_halts(srv):
    _put_set(srv, [
        {"id": "a", "rule": {"query": "sneakers", "match": "exact"},
         "includes": [{"id": "3", "position": 1}]},
        {"id": "b", "rule": {"query": "sneakers", "match": "exact"},
         "excludes": [{"id": "1"}]},
    ])
    res = search(srv)
    assert ids(res)[0] == "3"
    assert "1" in ids(res)  # rule b never ran


def test_item_crud_roundtrip(srv):
    _put_set(srv, [{
        "id": "one", "rule": {"query": "sneakers", "match": "exact"},
        "includes": [{"id": "2", "position": 1}]}])
    code, body = call(srv, "GET", "/curation_sets/promos")
    assert code == 200 and len(body["items"]) == 1
    code, body = call(srv, "GET", "/curation_sets/promos/items/one")
    assert code == 200 and body["rule"]["query"] == "sneakers"
    code, _ = call(srv, "DELETE", "/curation_sets/promos/items/one")
    assert code == 200
    code, body = call(srv, "GET", "/curation_sets/promos")
    assert code == 200 and len(body["items"]) == 0


def test_malformed_rule_rejected(srv):
    code, body = call(srv, "PUT", "/curation_sets/promos",
                      body={"items": [{"id": "bad", "rule": {}}]})
    assert code == 400


def test_filter_curated_hits(srv):
    _put_set(srv, [{
        "id": "p", "rule": {"query": "sneakers", "match": "exact"},
        "includes": [{"id": "4", "position": 1}],
        "filter_by": "points:>25"}])
    # without filter_curated_hits the pin bypasses the rule filter
    res = search(srv)
    assert ids(res)[0] == "4"
    res2 = search(srv, filter_curated_hits="true")
    assert "4" not in ids(res2)


def test_rule_activity_window(srv):
    """WindowForRule (collection_curation_test.cpp:1168): rules outside
    their effective_from_ts/effective_to_ts window do not fire."""
    import time as _t
    base = {"rule": {"query": "boots", "match": "exact"},
            "replace_query": "sneakers"}
    call(srv, "PUT", "/curation_sets/winset", body={"items": [
        {**base, "id": "w1"}]})
    # attach via search param instead of collection metadata
    q = {"q": "boots", "query_by": "title", "curation_sets": "winset",
         "num_typos": "0", "prefix": "false"}
    code, res = call(srv, "GET", "/collections/shoes/documents/search",
                     query=q)
    assert code == 200 and res["found"] >= 1   # replaced with 'shoe'

    # future window: rule inert
    call(srv, "PUT", "/curation_sets/winset", body={"items": [
        {**base, "id": "w1",
         "effective_from_ts": int(_t.time()) + 10**6}]})
    code, res = call(srv, "GET", "/collections/shoes/documents/search",
                     query=q)
    assert code == 200 and res["found"] == 0

    # past window: rule inert
    call(srv, "PUT", "/curation_sets/winset", body={"items": [
        {**base, "id": "w1", "effective_from_ts": -1,
         "effective_to_ts": 965388863}]})
    code, res = call(srv, "GET", "/collections/shoes/documents/search",
                     query=q)
    assert code == 200 and res["found"] == 0


def test_rule_query_case_insensitive(srv):
    """RuleQueryMustBeCaseInsensitive (…:1047)."""
    call(srv, "PUT", "/curation_sets/caseset", body={"items": [
        {"id": "c1", "rule": {"query": "SNEAKERS", "match": "exact"},
         "filter_by": "points:>35"}]})
    q = {"q": "sneakers", "query_by": "title", "curation_sets": "caseset",
         "num_typos": "0", "prefix": "false"}
    code, res = call(srv, "GET", "/collections/shoes/documents/search",
                     query=q)
    assert code == 200
    assert res["found"] >= 1
    for h in res["hits"]:
        assert h["document"]["points"] > 35


def test_curation_tags_select_rules(srv):
    """Tagged rules only fire when curation_tags overlaps; untagged rules
    (and tag `*`) fire only without tags (curate_results:92-160)."""
    _put_set(srv, [
        {"id": "untagged", "rule": {"query": "sneakers",
                                    "match": "exact"},
         "includes": [{"id": "3", "position": 1}]},
        {"id": "tag-a", "rule": {"query": "sneakers", "match": "exact",
                                 "tags": ["alpha"]},
         "includes": [{"id": "4", "position": 1}]},
        {"id": "tag-ab", "rule": {"query": "sneakers", "match": "exact",
                                  "tags": ["alpha", "beta"]},
         "includes": [{"id": "2", "position": 1}]},
    ])
    # no tags: only the untagged rule applies
    assert ids(search(srv))[0] == "3"
    # one tag: any-overlap — both tagged rules apply, untagged does not
    res = search(srv, curation_tags="alpha")
    assert "3" not in ids(res)[:1] and ids(res)[0] in ("4", "2")
    # both tags: exact full-set match wins — only tag-ab applies
    res = search(srv, curation_tags="alpha,beta")
    assert ids(res)[0] == "2"
    # enable_curations=false skips everything
    res = search(srv, enable_curations="false")
    assert ids(res)[0] == "0"


# --- dynamic filtering ({field} placeholders), static sorting, metadata ---
# reference collection_curation_test.cpp DynamicFilteringExactMatchBasics /
# StaticFiltering / StaticSorting / MetadataValidation / BothFilterByAndQueryMatch

@pytest.fixture()
def dsrv(tmp_path):
    s = make_server(Store(str(tmp_path / "db2")))
    call(s, "POST", "/collections", body={
        "name": "prods",
        "fields": [{"name": "name", "type": "string"},
                   {"name": "category", "type": "string", "facet": True},
                   {"name": "brand", "type": "string", "facet": True},
                   {"name": "points", "type": "int32"}],
        "default_sorting_field": "points",
        "metadata": {"curation_sets": ["index"]}})
    for d in [
        {"id": "0", "name": "Amazing Shoes", "category": "shoes",
         "brand": "Nike", "points": 3},
        {"id": "1", "name": "Track Gym", "category": "shoes",
         "brand": "Adidas", "points": 5},
        {"id": "2", "name": "Running Shoes", "category": "sports",
         "brand": "Nike", "points": 5},
    ]:
        call(s, "POST", "/collections/prods/documents", body=d)
    return s


def _put_index_set(s, items):
    code, body = call(s, "PUT", "/curation_sets/index",
                      body={"items": items})
    assert code == 200, body


def dsearch(s, q, **params):
    code, res = call(s, "GET", "/collections/prods/documents/search",
                     query={"q": q, "query_by": "name,category,brand",
                            "prefix": "false", "num_typos": "0",
                            "sort_by": "_text_match:desc,points:desc",
                            **params})
    assert code == 200, res
    return res


DYN_RULES = [
    {"id": "dynamic-cat-filter",
     "rule": {"query": "{category}", "match": "exact"},
     "remove_matched_tokens": True,
     "filter_by": "category: {category}"},
    {"id": "dynamic-brand-cat-filter",
     "rule": {"query": "{brand} {category}", "match": "exact"},
     "remove_matched_tokens": True,
     "filter_by": "category: {category} && brand: {brand}"},
    {"id": "dynamic-brand-filter",
     "rule": {"query": "{brand}", "match": "exact"},
     "remove_matched_tokens": True,
     "filter_by": "brand: {brand}",
     "includes": [{"id": "0", "position": 1}]},
]


def test_dynamic_filtering_category_placeholder(dsrv):
    _put_index_set(dsrv, DYN_RULES)
    # 'shoes' binds {category}; matched tokens removed -> wildcard over
    # filter category:shoes, sorted by points desc -> [1, 0]
    res = dsearch(dsrv, "shoes")
    assert ids(res) == ["1", "0"], res


def test_dynamic_filtering_brand_and_category(dsrv):
    _put_index_set(dsrv, DYN_RULES)
    # 'adidas shoes': first rule fails exact resolution ('adidas' is not a
    # category), second binds brand+category -> only doc 1
    res = dsearch(dsrv, "adidas shoes")
    assert ids(res) == ["1"], res


def test_dynamic_filtering_with_include(dsrv):
    _put_index_set(dsrv, DYN_RULES)
    # 'adidas' binds {brand}; the rule also pins doc 0 at position 1
    res = dsearch(dsrv, "adidas")
    assert ids(res) == ["0", "1"], res


def test_dynamic_filtering_nonexact_query_no_match(dsrv):
    _put_index_set(dsrv, DYN_RULES)
    # 'running shoes': 'running' is not a category/brand value -> no rule
    # resolves -> unfiltered results
    res = dsearch(dsrv, "running shoes", drop_tokens_threshold="10")
    assert res["found"] == 3, res


def test_static_filtering_with_remove_matched_tokens(dsrv):
    # reference StaticFilterWithAndWithoutQueryStringMutation
    _put_index_set(dsrv, [{
        "id": "static-brand",
        "rule": {"query": "really amazing shoes", "match": "contains"},
        "remove_matched_tokens": True,
        "filter_by": "category: shoes"}])
    res = dsearch(dsrv, "really amazing shoes")
    # rule tokens stripped -> wildcard over category:shoes
    assert sorted(ids(res)) == ["0", "1"], res


def test_curation_metadata_in_response(dsrv):
    # reference MetadataValidation: matching rule's metadata rides the
    # search response under `metadata`
    _put_index_set(dsrv, [{
        "id": "meta-rule",
        "rule": {"query": "shoes", "match": "contains"},
        "metadata": {"message": "buy more shoes!"},
        "includes": [{"id": "2", "position": 1}]}])
    res = dsearch(dsrv, "amazing shoes")
    assert res.get("metadata") == {"message": "buy more shoes!"}, res


def test_static_sorting_override(dsrv):
    # reference StaticSorting: the rule's sort_by replaces the search sort
    _put_index_set(dsrv, [{
        "id": "sort-rule",
        "rule": {"query": "shoes", "match": "contains"},
        "sort_by": "points:asc"}])
    res = dsearch(dsrv, "amazing shoes")
    pts = [h["document"]["points"] for h in res["hits"]]
    assert pts == sorted(pts), res


def test_rule_filter_by_is_a_condition(dsrv):
    # reference BothFilterByAndQueryMatch: rule.filter_by must EQUAL the
    # incoming filter_by param for the rule to fire
    _put_index_set(dsrv, [{
        "id": "cond-rule",
        "rule": {"query": "shoes", "match": "contains",
                 "filter_by": "brand: Nike"},
        "includes": [{"id": "2", "position": 1}]}])
    # without the filter param: rule must NOT fire
    res = dsearch(dsrv, "amazing shoes")
    assert ids(res)[0] != "2", res
    # with the exact filter param: rule fires and pins doc 2
    res = dsearch(dsrv, "amazing shoes", filter_by="brand: Nike")
    assert ids(res)[0] == "2", res
