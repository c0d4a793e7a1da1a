"""Faceting scenario tests mirroring collection_faceting_test.cpp behaviors
(FacetCounts, bool/float facets, facet_query, range facets, stats, facet
sort options, validation) — written fresh against our API."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.schema.field import Field


def fc(res, field):
    for f in res["facet_counts"]:
        if f["field_name"] == field:
            return {c["value"]: c["count"] for c in f["counts"]}
    raise KeyError(field)


def fstats(res, field):
    for f in res["facet_counts"]:
        if f["field_name"] == field:
            return f["stats"]
    raise KeyError(field)


@pytest.fixture(scope="module")
def phones():
    c = Collection("phones", [
        Field("name", "string"),
        Field("brand", "string", facet=True),
        Field("tags", "string[]", facet=True),
        Field("price", "float", facet=True, sort=True),
        Field("ram_gb", "int32", facet=True, sort=True),
        Field("in_stock", "bool", facet=True),
    ], default_sorting_field="price")
    rows = [
        ("0", "orion phone one", "apex", ["5g", "oled"], 699.5, 8, True),
        ("1", "orion phone two", "apex", ["5g", "lcd"], 499.0, 6, True),
        ("2", "lyra phone mini", "banta", ["4g", "oled"], 299.99, 4, False),
        ("3", "lyra phone max", "banta", ["5g", "oled", "pro"], 999.0, 12, True),
        ("4", "vega phone lite", "corel", ["4g"], 149.0, 3, False),
        ("5", "vega phone ultra", "corel", ["5g", "pro"], 1299.0, 16, True),
    ]
    for i, n, b, t, p, r, s in rows:
        c.add({"id": i, "name": n, "brand": b, "tags": t, "price": p,
               "ram_gb": r, "in_stock": s})
    return c


B = {"query_by": "name", "num_typos": "0", "prefix": "false"}


def test_facet_counts_basic(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "brand"})
    assert fc(r, "brand") == {"apex": 2, "banta": 2, "corel": 2}


def test_facet_counts_on_subset(phones):
    r = phones.search({**B, "q": "orion", "facet_by": "brand"})
    assert fc(r, "brand") == {"apex": 2}


def test_facet_array_field(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "tags"})
    counts = fc(r, "tags")
    assert counts["5g"] == 4 and counts["oled"] == 3 and counts["pro"] == 2
    assert counts["4g"] == 2 and counts["lcd"] == 1


def test_facet_bool_field(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "in_stock"})
    counts = fc(r, "in_stock")
    assert counts == {"true": 4, "false": 2}


def test_facet_int_field(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "ram_gb"})
    counts = fc(r, "ram_gb")
    assert counts["8"] == 1 and counts["4"] == 1 and len(counts) == 6


def test_facet_multiple_fields(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "brand,in_stock"})
    assert fc(r, "brand")["apex"] == 2
    assert fc(r, "in_stock")["true"] == 4


def test_facet_with_filter(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "brand",
                       "filter_by": "price:>500"})
    assert fc(r, "brand") == {"apex": 1, "banta": 1, "corel": 1}


def test_facet_wildcard(phones):
    r = phones.search({"q": "*", "facet_by": "brand"})
    assert fc(r, "brand") == {"apex": 2, "banta": 2, "corel": 2}


def test_facet_stats_float(phones):
    r = phones.search({"q": "*", "facet_by": "price"})
    st = fstats(r, "price")
    assert st["min"] == pytest.approx(149.0)
    assert st["max"] == pytest.approx(1299.0)
    assert st["sum"] == pytest.approx(699.5 + 499.0 + 299.99 + 999.0
                                      + 149.0 + 1299.0)
    assert st["avg"] == pytest.approx(st["sum"] / 6)


def test_facet_stats_int(phones):
    r = phones.search({"q": "*", "facet_by": "ram_gb"})
    st = fstats(r, "ram_gb")
    assert st["min"] == 3 and st["max"] == 16


def test_facet_total_values(phones):
    r = phones.search({"q": "*", "facet_by": "brand"})
    assert fstats(r, "brand")["total_values"] == 3


def test_max_facet_values(phones):
    r = phones.search({"q": "*", "facet_by": "ram_gb",
                       "max_facet_values": 2})
    assert len(fc(r, "ram_gb")) == 2


def test_facet_query_narrowing(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "brand",
                       "facet_query": "brand:ap"})
    counts = fc(r, "brand")
    assert counts == {"apex": 2}


def test_facet_query_on_array(phones):
    r = phones.search({**B, "q": "phone", "facet_by": "tags",
                       "facet_query": "tags:ol"})
    assert fc(r, "tags") == {"oled": 3}


def test_facet_query_without_facet_by_rejected(phones):
    with pytest.raises(BadRequest):
        phones.search({**B, "q": "phone", "facet_query": "brand:ap"})


def test_facet_query_malformed(phones):
    with pytest.raises(BadRequest):
        phones.search({**B, "q": "phone", "facet_by": "brand",
                       "facet_query": "noseparator"})


def test_facet_on_nonfacet_field_rejected(phones):
    with pytest.raises(BadRequest):
        phones.search({**B, "q": "phone", "facet_by": "name"})


def test_facet_on_unknown_field_404(phones):
    with pytest.raises(NotFound):
        phones.search({**B, "q": "phone", "facet_by": "made_up"})


def test_range_facet_int(phones):
    r = phones.search({"q": "*",
                       "facet_by": "ram_gb(small:[0,6], big:[6,32])"})
    counts = fc(r, "ram_gb")
    assert counts == {"small": 2, "big": 4}


def test_range_facet_float(phones):
    r = phones.search({"q": "*", "facet_by":
                       "price(cheap:[0,500], mid:[500,1000], lux:[1000,2000])"})
    counts = fc(r, "price")
    assert counts == {"cheap": 3, "mid": 2, "lux": 1}


def test_range_facet_boundary_inclusive_exclusive(phones):
    # [inclusive_start, exclusive_end): 499.0 falls in [499, 500), not below
    r = phones.search({"q": "*", "facet_by":
                       "price(a:[0,499], b:[499,500])"})
    counts = fc(r, "price")
    assert counts.get("a", 0) == 2 and counts.get("b", 0) == 1


def test_range_facet_on_string_rejected(phones):
    with pytest.raises(BadRequest):
        phones.search({"q": "*", "facet_by": "brand(a:[0,10])"})


def test_range_facet_with_filter(phones):
    r = phones.search({"q": "*", "filter_by": "in_stock:true",
                       "facet_by": "ram_gb(small:[0,6], big:[6,32])"})
    assert fc(r, "ram_gb") == {"big": 4}


def test_facet_sort_alpha(phones):
    r = phones.search({"q": "*", "facet_by": "brand(sort_by: _alpha:asc)"})
    vals = [c["value"] for f in r["facet_counts"]
            if f["field_name"] == "brand" for c in f["counts"]]
    assert vals == sorted(vals)


def test_facet_counts_exact_over_paged_results(phones):
    # facet counts cover ALL matches, not only the returned page
    r = phones.search({**B, "q": "phone", "facet_by": "brand",
                       "per_page": 1})
    assert len(r["hits"]) == 1
    assert sum(fc(r, "brand").values()) == 6


def test_facet_highlight_echo(phones):
    # facet_query result entries carry highlight info
    r = phones.search({**B, "q": "phone", "facet_by": "brand",
                       "facet_query": "brand:ban"})
    entry = [f for f in r["facet_counts"] if f["field_name"] == "brand"][0]
    assert entry["counts"][0]["value"] == "banta"
    hl = entry["counts"][0].get("highlighted", "")
    assert "ban" in hl


def test_facet_empty_result_zero_counts(phones):
    r = phones.search({**B, "q": "zzzznope", "facet_by": "brand"})
    assert r["found"] == 0
    if r["facet_counts"]:
        assert all(c["count"] == 0
                   for f in r["facet_counts"] for c in f["counts"])


def test_facet_many_values_per_doc():
    # >16 values in one doc's faceted array must count exactly (round-1 cap bug)
    c = Collection("tagged", [Field("t", "string"),
                              Field("tags", "string[]", facet=True)])
    c.add({"id": "0", "t": "x", "tags": [f"v{i:02d}" for i in range(40)]})
    c.add({"id": "1", "t": "x", "tags": ["v00", "v39"]})
    r = c.search({**B, "query_by": "t", "q": "x", "facet_by": "tags",
                  "max_facet_values": 50})
    counts = fc(r, "tags")
    assert counts["v00"] == 2 and counts["v39"] == 2
    assert sum(counts.values()) == 42


def test_facet_negative_int():
    c = Collection("temps", [Field("t", "string"),
                             Field("deg", "int32", facet=True)])
    for i, d in enumerate([-10, -10, 0, 25]):
        c.add({"id": str(i), "t": "day", "deg": d})
    r = c.search({**B, "query_by": "t", "q": "day", "facet_by": "deg"})
    counts = fc(r, "deg")
    assert counts["-10"] == 2 and counts["0"] == 1 and counts["25"] == 1


def test_facet_float_value_rendering():
    c = Collection("fl", [Field("t", "string"),
                          Field("score", "float", facet=True)])
    c.add({"id": "0", "t": "x", "score": 1.5})
    c.add({"id": "1", "t": "x", "score": 1.5})
    r = c.search({**B, "query_by": "t", "q": "x", "facet_by": "score"})
    counts = fc(r, "score")
    # floats render with 2-decimal precision (reference facet value
    # truncation, collection_faceting_test.cpp FloatFieldValueTruncation)
    assert counts.get("1.50") == 2


def test_facet_query_num_typos():
    """facet_query matches facet values within facet_query_num_typos edits
    (collection.h:932 default 2; FacetQueryTest typo behaviors)."""
    c = Collection("fq_typos", [Field("title", "string"),
                                Field("brand", "string", facet=True)])
    c.add({"title": "a", "brand": "sennheiser"})
    c.add({"title": "b", "brand": "sony"})
    res = c.search({"q": "*", "facet_by": "brand",
                    "facet_query": "brand:sennheizer"})  # one typo
    counts = res["facet_counts"][0]["counts"]
    assert [x["value"] for x in counts] == ["sennheiser"]
    # typos off: no match
    res = c.search({"q": "*", "facet_by": "brand",
                    "facet_query": "brand:sennheizer",
                    "facet_query_num_typos": "0"})
    assert res["facet_counts"][0]["counts"] == []
    # prefix still works as before
    res = c.search({"q": "*", "facet_by": "brand",
                    "facet_query": "brand:senn"})
    counts = res["facet_counts"][0]["counts"]
    assert [x["value"] for x in counts] == ["sennheiser"]
