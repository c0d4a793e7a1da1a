"""Infix search tests (reference: collection_infix_search_test.cpp)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("models", [
        Field("model", "string", infix=True),
        Field("brand", "string"),
    ])
    c.add({"id": "0", "model": "gtx1060ti", "brand": "nvidia"})
    c.add({"id": "1", "model": "rtx3090", "brand": "nvidia"})
    c.add({"id": "2", "model": "radeon6800", "brand": "amd"})
    return c


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


def test_infix_always(coll):
    res = coll.search({"q": "1060", "query_by": "model", "infix": "always",
                       "num_typos": "0", "prefix": "false"})
    assert ids(res) == ["0"]


def test_infix_fallback(coll):
    res = coll.search({"q": "3090", "query_by": "model", "infix": "fallback",
                       "num_typos": "0", "prefix": "false"})
    assert ids(res) == ["1"]


def test_infix_off_no_results(coll):
    res = coll.search({"q": "1060", "query_by": "model", "infix": "off",
                       "num_typos": "0", "prefix": "false"})
    assert res["found"] == 0


def test_infix_requires_schema_flag(coll):
    with pytest.raises(BadRequest):
        coll.search({"q": "vid", "query_by": "brand", "infix": "always",
                     "num_typos": "0", "prefix": "false"})


def test_infix_substring_middle(coll):
    res = coll.search({"q": "deon", "query_by": "model", "infix": "always",
                       "num_typos": "0", "prefix": "false"})
    assert ids(res) == ["2"]
