"""Pagination, highlighting, include/exclude fields, and query-option
scenario tests (reference: collection_test.cpp pagination cases,
collection_specific_test.cpp highlight cases) — written fresh against our
API."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture(scope="module")
def articles():
    c = Collection("articles", [
        Field("title", "string"),
        Field("body", "string"),
        Field("views", "int32", sort=True),
        Field("secret", "string", optional=True),
    ], default_sorting_field="views")
    for i in range(25):
        c.add({"id": str(i),
               "title": f"galaxy exploration part {i}",
               "body": "astronomers explore the galaxy searching for "
                       f"distant signals in sector {i}",
               "views": 1000 - i,
               "secret": f"classified-{i}"})
    return c


B = {"query_by": "title", "num_typos": "0", "prefix": "false"}


def test_default_page_size(articles):
    r = articles.search({**B, "q": "galaxy"})
    assert len(r["hits"]) == 10 and r["found"] == 25


def test_per_page(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 4})
    assert len(r["hits"]) == 4


def test_page_2_distinct_from_page_1(articles):
    r1 = articles.search({**B, "q": "galaxy", "per_page": 5, "page": 1,
                          "sort_by": "views:desc"})
    r2 = articles.search({**B, "q": "galaxy", "per_page": 5, "page": 2,
                          "sort_by": "views:desc"})
    assert ids(r1) == ["0", "1", "2", "3", "4"]
    assert ids(r2) == ["5", "6", "7", "8", "9"]


def test_last_partial_page(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 10, "page": 3,
                         "sort_by": "views:desc"})
    assert len(r["hits"]) == 5


def test_page_beyond_results_empty(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 10, "page": 9})
    assert r["hits"] == [] and r["found"] == 25


def test_offset_limit_alias(articles):
    r = articles.search({**B, "q": "galaxy", "offset": 7, "limit": 3,
                         "sort_by": "views:desc"})
    assert ids(r) == ["7", "8", "9"]


def test_per_page_cap_rejected(articles):
    with pytest.raises(BadRequest):
        articles.search({**B, "q": "galaxy", "per_page": 500})


def test_highlight_marks_matched_tokens(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 1})
    hl = r["hits"][0]["highlight"]
    assert "<mark>galaxy</mark>" in hl["title"]["snippet"]
    assert "galaxy" in hl["title"]["matched_tokens"]


def test_highlight_multiple_fields(articles):
    r = articles.search({"q": "galaxy", "query_by": "title,body",
                         "num_typos": "0", "prefix": "false", "per_page": 1})
    hl = r["hits"][0]["highlight"]
    assert "title" in hl and "body" in hl


def test_highlight_fields_restriction(articles):
    r = articles.search({"q": "galaxy", "query_by": "title,body",
                         "highlight_fields": "body",
                         "num_typos": "0", "prefix": "false", "per_page": 1})
    hl = r["hits"][0]["highlight"]
    assert "body" in hl and "title" not in hl


def test_highlight_custom_tags(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 1,
                         "highlight_start_tag": "<em>",
                         "highlight_end_tag": "</em>"})
    assert "<em>galaxy</em>" in r["hits"][0]["highlight"]["title"]["snippet"]


def test_highlight_full_fields(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 1,
                         "highlight_full_fields": "title"})
    hl = r["hits"][0]["highlight"]["title"]
    assert "value" in hl and "<mark>galaxy</mark>" in hl["value"]


def test_include_fields(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 1,
                         "include_fields": "title,views"})
    doc = r["hits"][0]["document"]
    assert set(doc.keys()) <= {"title", "views", "id"}
    assert "secret" not in doc


def test_exclude_fields(articles):
    r = articles.search({**B, "q": "galaxy", "per_page": 1,
                         "exclude_fields": "secret,body"})
    doc = r["hits"][0]["document"]
    assert "secret" not in doc and "body" not in doc
    assert "title" in doc


def test_text_match_info_present(articles):
    r = articles.search({**B, "q": "galaxy exploration", "per_page": 1})
    tmi = r["hits"][0]["text_match_info"]
    assert int(tmi["tokens_matched"]) == 2
    assert int(tmi["fields_matched"]) >= 1


def test_search_time_and_page_echo(articles):
    r = articles.search({**B, "q": "galaxy", "page": 2})
    assert r["page"] == 2
    assert "search_time_ms" in r
    assert r["request_params"]["q"] == "galaxy"


def test_empty_query_rejected_without_wildcard(articles):
    # q="" is treated as wildcard by the reference; ensure no crash
    r = articles.search({**B, "q": ""})
    assert r["found"] in (0, 25)


def test_unknown_query_by_field(articles):
    from typesense_tpu.core.errors import NotFound
    with pytest.raises((BadRequest, NotFound)):
        articles.search({"q": "x", "query_by": "unknown_field"})


def test_snippet_windows_long_text():
    c = Collection("long", [Field("t", "string")])
    words = ["filler%d" % i for i in range(60)]
    words[45] = "needle"
    c.add({"id": "0", "t": " ".join(words)})
    r = c.search({"q": "needle", "query_by": "t", "num_typos": "0",
                  "prefix": "false"})
    snip = r["hits"][0]["highlight"]["t"]["snippet"]
    assert "<mark>needle</mark>" in snip
    # snippet is a window, not the full 60-word text
    assert len(snip.split()) < 60


def test_prefix_search_matches_partial(articles):
    r = articles.search({"q": "galax", "query_by": "title",
                         "prefix": "true", "num_typos": "0"})
    assert r["found"] == 25


def test_typo_search_matches_misspelling(articles):
    r = articles.search({"q": "galaxt", "query_by": "title",
                         "prefix": "false", "num_typos": "1"})
    assert r["found"] == 25


def test_typo_disabled_no_match(articles):
    r = articles.search({"q": "galaxt", "query_by": "title",
                         "prefix": "false", "num_typos": "0"})
    assert r["found"] == 0


def test_limit_hits_caps_pagination_depth():
    """limit_hits (collection.h:47, fetch_size=min(offset+per_page,
    limit_hits)): hits beyond the cap are not retrievable; found is
    unaffected. Scoped keys embed this to bound data exposure."""
    c = Collection("pg_limith", [Field("title", "string")])
    for i in range(12):
        c.add({"id": str(i), "title": "common token"})
    res = c.search({"q": "common", "query_by": "title", "per_page": 10,
                    "limit_hits": "5"})
    assert res["found"] == 12 and len(res["hits"]) == 5
    # page 2 is entirely beyond the cap
    res = c.search({"q": "common", "query_by": "title", "per_page": 10,
                    "page": 2, "limit_hits": "5"})
    assert res["found"] == 12 and len(res["hits"]) == 0
    # default leaves pagination untouched
    res = c.search({"q": "common", "query_by": "title", "per_page": 10,
                    "page": 2})
    assert len(res["hits"]) == 2


def test_enable_highlight_v1_gates_legacy_array():
    """collection.h:142 enable_highlight_v1 (default true): false omits the
    legacy `highlights` array entirely; the v2 `highlight` object stays."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    c = Collection("hlv1", [Field("title", "string")])
    c.add({"title": "grilled cheese sandwich"})
    r = c.search({"q": "cheese", "query_by": "title"})
    assert "highlights" in r["hits"][0]          # default: legacy present
    assert r["hits"][0]["highlights"][0]["field"] == "title"
    r = c.search({"q": "cheese", "query_by": "title",
                  "enable_highlight_v1": "false"})
    assert "highlights" not in r["hits"][0]
    assert "highlight" in r["hits"][0]
    assert "<mark>cheese</mark>" in str(r["hits"][0]["highlight"])
