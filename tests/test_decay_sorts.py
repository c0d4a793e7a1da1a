"""Decay-function sorts (collection.cpp:1515-1550 parse;
Index::compute_decay_function_score, index.cpp:8925-8957):
field(func: gauss|exp|linear|diff, origin, scale, offset, decay)."""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def coll():
    c = Collection("shops", [Field("name", "string"),
                             Field("price", "int32", sort=True)])
    for i, p in enumerate([10, 50, 100, 150, 200, 500]):
        c.add({"id": str(i), "name": f"shop {i}", "price": p})
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_diff_sorts_by_distance_from_origin(coll):
    res = coll.search({"q": "*",
                       "sort_by": "price(func: diff, origin: 100):asc"})
    # |price-100|: 100->0, 50&150->50, 10->90, 200->100, 500->400
    assert ids(res)[0] == "2"
    assert set(ids(res)[1:3]) == {"1", "3"}
    assert ids(res)[-1] == "5"


def test_gauss_peaks_at_origin(coll):
    res = coll.search({"q": "*",
                       "sort_by": "price(func: gauss, origin: 150, "
                                  "scale: 50, decay: 0.5):desc"})
    assert ids(res)[0] == "3"          # price 150 = origin
    assert ids(res)[1] in ("2", "4")   # 100/200 tie at distance 50


def test_linear_zeroes_beyond_scale(coll):
    res = coll.search({"q": "*",
                       "sort_by": "price(func: linear, origin: 10, "
                                  "scale: 100, decay: 0.5):desc"})
    assert ids(res)[0] == "0"
    # beyond variance (=200) score clamps to 0: 500 is last
    assert ids(res)[-1] == "5"


def test_exp_monotone_in_distance(coll):
    res = coll.search({"q": "*",
                       "sort_by": "price(func: exp, origin: 500, "
                                  "scale: 100, decay: 0.5):desc"})
    assert ids(res) == ["5", "4", "3", "2", "1", "0"]


def test_offset_flattens_near_origin(coll):
    # offset 60: everything within 60 of origin scores identically (d=0)
    res = coll.search({"q": "*",
                       "sort_by": "price(func: diff, origin: 100, "
                                  "offset: 60):asc,price:asc"})
    # 50,100,150 all at distance 0 -> tie broken by price asc
    assert ids(res)[:3] == ["1", "2", "3"]


def test_decay_with_keyword_query(coll):
    res = coll.search({"q": "shop", "query_by": "name",
                       "prefix": "false", "num_typos": "0",
                       "sort_by": "price(func: gauss, origin: 200, "
                                  "scale: 100, decay: 0.5):desc"})
    assert res["found"] == 6
    assert ids(res)[0] == "4"


def test_decay_validation_errors(coll):
    with pytest.raises(BadRequest, match="decay function"):
        coll.search({"q": "*",
                     "sort_by": "price(func: nope, origin: 1):asc"})
    with pytest.raises(BadRequest, match="origin"):
        coll.search({"q": "*", "sort_by": "price(func: gauss):asc"})
    with pytest.raises(BadRequest, match="scale"):
        coll.search({"q": "*",
                     "sort_by": "price(func: gauss, origin: 5, "
                                "scale: 0):asc"})
    with pytest.raises(BadRequest, match="decay param"):
        coll.search({"q": "*",
                     "sort_by": "price(func: gauss, origin: 5, scale: 2, "
                                "decay: 3.0):asc"})
