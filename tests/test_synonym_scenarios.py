"""Synonym scenario family — reference collection_synonyms_test.cpp:
multi-way and one-way groups, multi-token synonyms, interaction with
prefix/typo/highlight, set scoping, CRUD over HTTP."""

import json

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "products",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "points", "type": "int32"}],
        "default_sorting_field": "points",
        "metadata": {"synonym_sets": ["base"]}})
    docs = [
        {"id": "0", "title": "smart phone with great camera", "points": 30},
        {"id": "1", "title": "samsung cellphone charger", "points": 20},
        {"id": "2", "title": "apple ipad tablet", "points": 10},
        {"id": "3", "title": "ocean blue shirt", "points": 5},
        {"id": "4", "title": "sea green pants", "points": 4},
    ]
    for d in docs:
        call(s, "POST", "/collections/products/documents", body=d)
    call(s, "PUT", "/synonym_sets/base", body={"items": [
        {"id": "ph", "synonyms": ["smart phone", "cellphone", "mobile"]},
        {"id": "blue", "root": "blue", "synonyms": ["ocean", "azure"]},
    ]})
    return s


def search(s, q, **kw):
    query = {"q": q, "query_by": "title", "prefix": "false",
             "num_typos": "0", **kw}
    code, res = call(s, "GET", "/collections/products/documents/search",
                     query=query)
    assert code == 200, res
    return res


def test_multiway_synonym_expands_both_directions(srv):
    # "cellphone" matches the doc that only says "smart phone" and vice versa
    res = search(srv, "cellphone")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"0", "1"}
    res = search(srv, "smart phone")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"0", "1"}


def test_multiway_synonym_third_variant(srv):
    res = search(srv, "mobile")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"0", "1"}


def test_oneway_root_expands_to_synonyms(srv):
    # root "blue" expands to ocean/azure
    res = search(srv, "blue")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert ids == {"3"}        # "ocean blue shirt" via direct + expansion


def test_oneway_synonym_does_not_reverse(srv):
    # one-way: searching "ocean" must NOT expand to "blue"
    res = search(srv, "azure")
    assert res["found"] == 0


def test_synonym_inside_longer_query(srv):
    res = search(srv, "cellphone camera")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert "0" in ids


def test_enable_synonyms_false_disables(srv):
    res = search(srv, "mobile", enable_synonyms="false")
    assert res["found"] == 0


def test_synonym_sets_param_overrides_collection(srv, tmp_path):
    call(srv, "PUT", "/synonym_sets/alt", body={"items": [
        {"id": "x", "synonyms": ["tablet", "slate"]}]})
    res = search(srv, "slate", synonym_sets="alt")
    assert {h["document"]["id"] for h in res["hits"]} == {"2"}
    # base set alone doesn't know "slate"
    res = search(srv, "slate")
    assert res["found"] == 0


def test_synonym_crud_over_http(srv):
    code, res = call(srv, "GET", "/synonym_sets/base")
    assert code == 200
    assert {i["id"] for i in res["items"]} == {"ph", "blue"}
    code, res = call(srv, "GET", "/synonym_sets")
    assert code == 200 and len(res) >= 1
    code, _ = call(srv, "DELETE", "/synonym_sets/base")
    assert code == 200
    code, _ = call(srv, "GET", "/synonym_sets/base")
    assert code == 404


def test_synonym_match_ranks_with_typo_penalty_off(srv):
    # direct hits and synonym hits both rank; direct exact match first
    res = search(srv, "smart phone camera")
    assert res["hits"][0]["document"]["id"] == "0"


def test_synonym_invalid_body_rejected(srv):
    code, res = call(srv, "PUT", "/synonym_sets/bad",
                     body={"items": [{"id": "a"}]})
    assert code == 400


def test_synonym_with_prefix_query(srv):
    # last-token prefix still applies to expanded alternates
    res = search(srv, "cellph", prefix="true")
    ids = {h["document"]["id"] for h in res["hits"]}
    assert "1" in ids


def test_synonym_text_match_same_as_root_query(srv):
    """SynonymsTextMatchSameAsRootQuery (collection_synonyms_test.cpp:497):
    a full synonym match scores BIT-EXACTLY like the root query; ties break
    by the next sort component."""
    call(srv, "PUT", "/synonym_sets/ceoset", body={"items": [
        {"id": "syn-1", "root": "ceo",
         "synonyms": ["chief executive officer"]}]})
    call(srv, "POST", "/collections/products/documents",
         body={"id": "90", "title": "Chief Executive Officer",
               "points": 10})
    call(srv, "POST", "/collections/products/documents",
         body={"id": "91", "title": "CEO", "points": 20})
    code, res = call(srv, "GET", "/collections/products/documents/search",
                     query={"q": "ceo", "query_by": "title",
                            "synonym_sets": "ceoset", "prefix": "true",
                            "num_typos": "0"})
    assert code == 200
    hits = [h for h in res["hits"]
            if h["document"]["id"] in ("90", "91")]
    assert [h["document"]["id"] for h in hits] == ["91", "90"]
    assert hits[0]["text_match"] == hits[1]["text_match"]


def test_synonym_compression_scores_like_root(srv):
    """Single-token synonym (compression): 'laughing out loud' -> 'lol'
    scores as the ORIGINAL adjacent-token match would (score_results2
    single-token branch: words = orig_len, distance = orig_len - 1)."""
    call(srv, "PUT", "/synonym_sets/lolset", body={"items": [
        {"id": "s1", "synonyms": ["lol", "laughing out loud"]}]})
    call(srv, "POST", "/collections/products/documents",
         body={"id": "80", "title": "Laughing out Loud", "points": 100})
    call(srv, "POST", "/collections/products/documents",
         body={"id": "81", "title": "LOL", "points": 200})
    code, res = call(srv, "GET", "/collections/products/documents/search",
                     query={"q": "laughing out loud", "query_by": "title",
                            "synonym_sets": "lolset", "prefix": "false",
                            "num_typos": "0"})
    assert code == 200
    hits = [h for h in res["hits"] if h["document"]["id"] in ("80", "81")]
    assert [h["document"]["id"] for h in hits] == ["81", "80"]
    assert hits[0]["text_match"] == hits[1]["text_match"]


def test_synonym_prefix_and_typos(srv):
    """synonym_prefix / synonym_num_typos (synonym_index.cpp:5-29): query
    tokens may prefix- or typo-match the synonym source."""
    # default: no match for a prefix of the synonym source
    res = search(srv, "cellpho")
    assert res["found"] == 0
    res = search(srv, "cellpho", synonym_prefix="true")
    assert {h["document"]["id"] for h in res["hits"]} == {"0", "1"}
    # one-typo match ("cellphome")
    res = search(srv, "cellphome")
    assert res["found"] == 0
    res = search(srv, "cellphome", synonym_num_typos="1")
    assert {h["document"]["id"] for h in res["hits"]} == {"0", "1"}


def test_demote_synonym_match(srv):
    """demote_synonym_match (index.cpp:6994): synonym hits rank below
    otherwise-equal root hits."""
    # "ocean blue shirt" (root word) vs "sea green pants"; query "ocean"
    # matches doc 3 directly and via the blue<->ocean synonym
    call(srv, "POST", "/collections/products/documents",
         body={"id": "9", "title": "blue shirt", "points": 5})
    res = search(srv, "blue", demote_synonym_match="true")
    ids = [h["document"]["id"] for h in res["hits"]]
    # direct "blue" matches outrank the synonym-only "ocean" doc
    assert ids.index("9") < ids.index("3")
