"""Infix behaviors ported from
/root/reference/test/collection_infix_search_test.cpp — filtering, per-field
modes, delete/update, fallback preference."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def parts():
    c = Collection("infx", [Field("title", "string", infix=True),
                            Field("brand", "string", infix=True),
                            Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "GH100037IN8900X", "brand": "accumax",
           "points": 10})
    c.add({"id": "1", "title": "100037SG7120X", "brand": "hilife",
           "points": 20})
    c.add({"id": "2", "title": "plain widget", "brand": "maxtorq",
           "points": 30})
    return c


def test_infix_fallback_prefers_prefix_result(parts):
    """InfixBasics (…:90): under fallback, a PREFIX match suppresses the
    infix expansion."""
    res = parts.search({"q": "100037", "query_by": "title",
                        "infix": "fallback", "prefix": "true",
                        "num_typos": "0"})
    assert _ids(res) == ["1"]        # prefix hit wins; infix not consulted


def test_infix_with_filtering(parts):
    """InfixWithFiltering (…:186)."""
    res = parts.search({"q": "0037", "query_by": "title", "infix": "always",
                        "num_typos": "0", "filter_by": "points:<15"})
    assert _ids(res) == ["0"]
    res = parts.search({"q": "0037", "query_by": "title", "infix": "always",
                        "num_typos": "0", "filter_by": "points:>15"})
    assert _ids(res) == ["1"]


def test_infix_multi_field(parts):
    """MultiFieldInfixSearch (…:585): infix applies across query fields."""
    res = parts.search({"q": "max", "query_by": "title,brand",
                        "infix": "always", "num_typos": "0"})
    assert set(_ids(res)) == {"0", "2"}   # accumax, maxtorq


def test_infix_delete_and_update(parts):
    """InfixDeleteAndUpdate (…:495): infix reflects removals and updated
    values."""
    parts.remove("0")
    res = parts.search({"q": "0037", "query_by": "title",
                        "infix": "always", "num_typos": "0"})
    assert _ids(res) == ["1"]
    parts.add({"id": "1", "title": "ZZ554433YY"}, operation="update")
    res = parts.search({"q": "5544", "query_by": "title",
                        "infix": "always", "num_typos": "0"})
    assert _ids(res) == ["1"]
    res = parts.search({"q": "0037", "query_by": "title",
                        "infix": "always", "num_typos": "0"})
    assert res["found"] == 0


def test_infix_per_field_mode_list(parts):
    """InfixSpecificField (…:385): infix modes map per query_by field."""
    res = parts.search({"q": "max", "query_by": "title,brand",
                        "infix": "off,always", "num_typos": "0"})
    # title infix off; brand infix always -> accumax + maxtorq via brand
    assert set(_ids(res)) == {"0", "2"}


def test_max_extra_prefix_suffix():
    """max_extra_prefix/max_extra_suffix bound the characters allowed
    around the query inside infix matches (index.cpp:3306)."""
    c = Collection("inf_extra", [Field("title", "string", infix=True)])
    c.add({"id": "0", "title": "superchargers"})   # 5 extra pre, 1 post
    c.add({"id": "1", "title": "charger"})         # 0 extra either side
    c.add({"id": "2", "title": "recharge"})        # 2 extra pre

    def ids(res):
        return sorted(h["document"]["id"] for h in res["hits"])

    base = {"query_by": "title", "infix": "always", "prefix": "false",
            "num_typos": "0"}
    res = c.search({**base, "q": "charger"})
    assert ids(res) == ["0", "1"]
    res = c.search({**base, "q": "charger", "max_extra_prefix": "0"})
    assert ids(res) == ["1"]
    res = c.search({**base, "q": "charge", "max_extra_suffix": "0"})
    assert ids(res) == ["2"]
    res = c.search({**base, "q": "charge", "max_extra_prefix": "0",
                    "max_extra_suffix": "0"})
    assert ids(res) == []
