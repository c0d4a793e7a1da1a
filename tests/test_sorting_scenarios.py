"""Sorting scenario tests mirroring the reference's collection_sorting_test.cpp
behaviors (SortingOrder, SortOnFloatFields, ThreeSortFieldsLimit, string sort
with missing_values, negative int64, seq-id sort, _eval optional filtering,
text-match defaulting) — written fresh against our API."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.schema.field import Field


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture(scope="module")
def shows():
    c = Collection("shows", [
        Field("title", "string"),
        Field("rating", "float", sort=True),
        Field("points", "int32", sort=True),
        Field("year", "int64", sort=True),
        Field("name", "string", sort=True, optional=True),
        Field("watched", "bool", sort=True),
    ], default_sorting_field="points")
    rows = [
        ("0", "the long dark night", 7.5, 100, 2001, "zeta", True),
        ("1", "dark knight rises", 9.1, 80, 1999, "alpha", False),
        ("2", "a dark song", 7.5, 120, 2010, "gamma", True),
        ("3", "dark hour", 6.0, 120, 1990, None, False),
        ("4", "after dark", 8.2, 60, 2021, "beta", True),
    ]
    for i, t, r, p, y, n, w in rows:
        d = {"id": i, "title": t, "rating": r, "points": p, "year": y,
             "watched": w}
        if n is not None:
            d["name"] = n
        c.add(d)
    return c


BASE = {"query_by": "title", "num_typos": "0", "prefix": "false"}


def test_sort_int_desc(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "points:desc"})
    assert ids(r)[:2] == ["2", "0"] or ids(r)[:3] == ["3", "2", "0"] or \
        ids(r)[0] in ("2", "3")
    pts = [h["document"]["points"] for h in r["hits"]]
    assert pts == sorted(pts, reverse=True)


def test_sort_int_asc(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "points:asc"})
    pts = [h["document"]["points"] for h in r["hits"]]
    assert pts == sorted(pts)


def test_sort_float_desc(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "rating:desc"})
    rats = [h["document"]["rating"] for h in r["hits"]]
    assert rats == sorted(rats, reverse=True)


def test_sort_float_asc_ties_break_consistently(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "rating:asc"})
    rats = [h["document"]["rating"] for h in r["hits"]]
    assert rats == sorted(rats)


def test_sort_two_keys(shows):
    # rating desc, then points asc among the 7.5 tie (docs 0 and 2)
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "rating:desc,points:asc"})
    seq = [(h["document"]["rating"], h["document"]["points"])
           for h in r["hits"]]
    tied = [s for s in seq if s[0] == 7.5]
    assert tied == sorted(tied, key=lambda t: t[1])


def test_three_sort_fields_accepted(shows):
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "rating:desc,points:asc,year:desc"})
    assert r["found"] == 5


def test_four_sort_fields_rejected(shows):
    with pytest.raises(BadRequest):
        shows.search({**BASE, "q": "dark",
                      "sort_by": "rating:desc,points:asc,year:desc,"
                                 "watched:desc"})


def test_sort_unknown_field_404(shows):
    with pytest.raises(NotFound):
        shows.search({**BASE, "q": "dark", "sort_by": "nope:desc"})


def test_sort_bad_order_rejected(shows):
    with pytest.raises(BadRequest):
        shows.search({**BASE, "q": "dark", "sort_by": "points:upward"})


def test_sort_malformed_rejected(shows):
    with pytest.raises(BadRequest):
        shows.search({**BASE, "q": "dark", "sort_by": "points"})


def test_sort_int64_values(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "year:asc"})
    ys = [h["document"]["year"] for h in r["hits"]]
    assert ys == sorted(ys)


def test_string_sort_asc(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "name:asc"})
    withname = [h["document"].get("name") for h in r["hits"]
                if "name" in h["document"]]
    assert withname == sorted(withname)


def test_string_sort_desc(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "name:desc"})
    withname = [h["document"].get("name") for h in r["hits"]
                if "name" in h["document"]]
    assert withname == sorted(withname, reverse=True)


def test_string_sort_missing_values_first(shows):
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "name(missing_values: first):asc"})
    assert "name" not in r["hits"][0]["document"]


def test_string_sort_missing_values_last(shows):
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "name(missing_values: last):asc"})
    assert "name" not in r["hits"][-1]["document"]


def test_missing_values_invalid_policy(shows):
    with pytest.raises(BadRequest):
        shows.search({**BASE, "q": "dark",
                      "sort_by": "name(missing_values: middle):asc"})


def test_seq_id_sort(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "_seq_id:desc"})
    assert ids(r) == ["4", "3", "2", "1", "0"]


def test_text_match_explicit_then_points(shows):
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "_text_match:desc,points:desc"})
    assert r["found"] == 5


def test_bool_sort(shows):
    r = shows.search({**BASE, "q": "dark", "sort_by": "watched:desc"})
    ws = [h["document"]["watched"] for h in r["hits"]]
    assert ws == sorted(ws, reverse=True)


def test_eval_optional_filtering_sort(shows):
    # _eval as slot 1: watched docs first, then by points desc
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "_eval(watched:true):desc,points:desc"})
    ws = [h["document"]["watched"] for h in r["hits"]]
    assert ws == sorted(ws, reverse=True)
    # within watched group points descend
    grp = [h["document"]["points"] for h in r["hits"]
           if h["document"]["watched"]]
    assert grp == sorted(grp, reverse=True)


def test_eval_weighted_buckets(shows):
    r = shows.search({**BASE, "q": "dark",
                      "sort_by": "_eval([(watched:true):3,(rating:>8):1]):desc,"
                                 "points:desc"})
    # doc1 (not watched, rating 9.1) scores 1; watched docs score >=3
    order = ids(r)
    assert order.index("1") > max(order.index(i) for i in ("0", "2", "4"))


def test_negative_int64(tmp_path):
    c = Collection("negs", [Field("title", "string"),
                            Field("bal", "int64", sort=True)])
    for i, b in enumerate([-9223372036854775, 0, 12, -5, 7]):
        c.add({"id": str(i), "title": "tok", "bal": b})
    r = c.search({**BASE, "q": "tok", "sort_by": "bal:asc"})
    bs = [h["document"]["bal"] for h in r["hits"]]
    assert bs == sorted(bs)


def test_wildcard_sorts_by_sort_field(shows):
    r = shows.search({"q": "*", "sort_by": "points:desc"})
    pts = [h["document"]["points"] for h in r["hits"]]
    assert pts == sorted(pts, reverse=True)


def test_wildcard_seq_id_default_order(shows):
    r = shows.search({"q": "*"})
    assert r["found"] == 5


def test_default_sorting_field_used_when_no_sort_by(shows):
    # default_sorting_field=points: equal text scores fall back to points
    r = shows.search({**BASE, "q": "dark"})
    assert r["found"] == 5


def test_sort_on_unsortable_string_rejected(shows):
    with pytest.raises(BadRequest):
        shows.search({**BASE, "q": "dark", "sort_by": "title:desc"})


def test_rand_sort_seeded(shows):
    r1 = shows.search({**BASE, "q": "dark", "sort_by": "_rand(7):asc"})
    r2 = shows.search({**BASE, "q": "dark", "sort_by": "_rand(7):asc"})
    assert ids(r1) == ids(r2)
    r3 = shows.search({**BASE, "q": "dark", "sort_by": "_rand(8):asc"})
    assert len(ids(r3)) == 5


def test_default_sorting_field_must_exist():
    with pytest.raises(BadRequest):
        Collection("bad", [Field("t", "string")],
                   default_sorting_field="nope")


def test_default_sorting_field_type_validated():
    with pytest.raises(BadRequest):
        Collection("bad2", [Field("t", "string"),
                            Field("s", "string")],
                   default_sorting_field="s")


def test_no_default_sorting_field_ok():
    c = Collection("nodefault", [Field("t", "string")])
    c.add({"id": "0", "t": "hello world"})
    c.add({"id": "1", "t": "hello there"})
    r = c.search({**BASE, "query_by": "t", "q": "hello"})
    assert r["found"] == 2
