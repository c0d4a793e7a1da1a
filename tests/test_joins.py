"""Join tests: $Coll(filter) reference filters, include_fields hydration,
reference sort (reference: collection_join_test.cpp, join.h:70-207)."""

import pytest

from typesense_tpu.core.errors import BadRequest
from typesense_tpu.manager import CollectionManager


@pytest.fixture()
def mgr():
    m = CollectionManager(store=None)
    m.create_collection({
        "name": "products",
        "fields": [
            {"name": "product_id", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "price", "type": "int32"},
        ],
    })
    m.create_collection({
        "name": "orders",
        "fields": [
            {"name": "product_id", "type": "string",
             "reference": "products.product_id"},
            {"name": "qty", "type": "int32"},
            {"name": "customer", "type": "string", "facet": True},
        ],
    })
    products = m.get_collection("products")
    orders = m.get_collection("orders")
    for d in [
        {"id": "p1", "product_id": "sku1", "name": "red socks", "price": 10},
        {"id": "p2", "product_id": "sku2", "name": "blue socks", "price": 20},
        {"id": "p3", "product_id": "sku3", "name": "green hat", "price": 50},
    ]:
        products.add(d)
    for d in [
        {"id": "o1", "product_id": "sku1", "qty": 2, "customer": "alice"},
        {"id": "o2", "product_id": "sku2", "qty": 9, "customer": "bob"},
        {"id": "o3", "product_id": "sku2", "qty": 1, "customer": "alice"},
    ]:
        orders.add(d)
    return m


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


def test_forward_join_filter(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*", "filter_by": "$products(price:>15)"})
    assert ids(res) == ["o2", "o3"]


def test_forward_join_filter_combined(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*",
                         "filter_by": "$products(price:>15) && qty:>5"})
    assert ids(res) == ["o2"]


def test_negated_join_filter(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*", "filter_by": "!$products(price:>15)"})
    assert ids(res) == ["o1"]


def test_reverse_join_filter(mgr):
    products = mgr.get_collection("products")
    res = products.search({"q": "*", "filter_by": "$orders(qty:>5)"})
    assert ids(res) == ["p2"]
    # products with any order at all
    res = products.search({"q": "*", "filter_by": "$orders(qty:>0)"})
    assert ids(res) == ["p1", "p2"]


def test_join_include_fields_nest(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*", "filter_by": "$products(price:>15)",
                         "include_fields": "$products(name,price)"})
    by_id = {h["document"]["id"]: h["document"] for h in res["hits"]}
    assert by_id["o2"]["products"] == {"name": "blue socks", "price": 20}


def test_join_include_fields_merge(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*",
                         "include_fields": "$products(price, strategy:merge)"})
    for h in res["hits"]:
        assert "price" in h["document"], h


def test_reverse_include(mgr):
    products = mgr.get_collection("products")
    res = products.search({"q": "*", "filter_by": "$orders(customer:alice)",
                           "include_fields": "$orders(qty)"})
    by_id = {h["document"]["id"]: h["document"] for h in res["hits"]}
    assert sorted(by_id) == ["p1", "p2"]
    # p2 has two orders -> list
    assert by_id["p1"]["orders"] == {"qty": 2}
    assert isinstance(by_id["p2"]["orders"], list)


def test_reference_sort(mgr):
    orders = mgr.get_collection("orders")
    res = orders.search({"q": "*", "sort_by": "$products(price):desc",
                         "per_page": 10})
    got = [h["document"]["id"] for h in res["hits"]]
    # o2/o3 reference sku2 (price 20) > o1 sku1 (price 10)
    assert set(got[:2]) == {"o2", "o3"} and got[2] == "o1"


def test_join_missing_reference_errors(mgr):
    products = mgr.get_collection("products")
    with pytest.raises(Exception):
        products.search({"q": "*", "filter_by": "$nonexistent(x:1)"})


def test_join_no_reference_field_errors(mgr):
    mgr.create_collection({"name": "lonely", "fields": [
        {"name": "t", "type": "string"}]})
    lonely = mgr.get_collection("lonely")
    lonely.add({"t": "x"})
    with pytest.raises(BadRequest):
        lonely.search({"q": "*", "filter_by": "$products(price:>0)"})
