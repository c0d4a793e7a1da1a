"""Error-contract family — reference collection_test.cpp bad-param cases:
every malformed request must 400/404 with a clear message, never crash."""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "docs", "fields": [
            {"name": "title", "type": "string"},
            {"name": "n", "type": "int32"}],
        "default_sorting_field": "n"})
    call(s, "POST", "/collections/docs/documents",
         body={"id": "1", "title": "hello world", "n": 5})
    return s


def search(s, **query):
    return call(s, "GET", "/collections/docs/documents/search", query=query)


def test_unknown_query_field(srv):
    code, res = search(srv, q="x", query_by="nope")
    assert code == 404 and "nope" in res["message"]


def test_missing_query_by(srv):
    code, res = search(srv, q="x")
    assert code == 400


def test_bad_filter_syntax(srv):
    for f in ("n:", "n >>", "(n:1", "n:[1,", "&&", "title:=", ":5"):
        code, res = search(srv, q="*", filter_by=f)
        assert code == 400, (f, code, res)


def test_filter_unknown_field(srv):
    code, res = search(srv, q="*", filter_by="ghost:>1")
    assert code == 404


def test_bad_sort_field(srv):
    code, res = search(srv, q="*", sort_by="ghost:desc")
    assert code == 404
    code, res = search(srv, q="*", sort_by="n:sideways")
    assert code == 400
    code, res = search(srv, q="*", sort_by="n:asc,n:asc,n:asc,n:asc")
    assert code == 400  # max 3 sort fields


def test_facet_on_non_facet_field(srv):
    code, res = search(srv, q="*", facet_by="title")
    assert code == 400


def test_group_by_non_facet(srv):
    code, res = search(srv, q="*", group_by="title")
    assert code == 400


def test_pagination_limits(srv):
    code, res = search(srv, q="*", per_page="500")
    assert code == 422 or code == 400
    # page=0 with no offset behaves as page 1 (reference offset handling)
    code, res = search(srv, q="*", page="0")
    assert code == 200 and res["page"] == 1


def test_document_errors(srv):
    code, res = call(srv, "POST", "/collections/docs/documents",
                     body={"title": "x"})       # missing required n
    assert code == 400
    code, res = call(srv, "POST", "/collections/docs/documents",
                     body={"title": 7, "n": "words"},
                     query={"dirty_values": "reject"})
    assert code == 400
    code, res = call(srv, "GET", "/collections/docs/documents/999")
    assert code == 404
    code, res = call(srv, "DELETE", "/collections/docs/documents/999")
    assert code == 404
    # duplicate id with action=create
    code, res = call(srv, "POST", "/collections/docs/documents",
                     body={"id": "1", "title": "dup", "n": 1})
    assert code == 409


def test_collection_errors(srv):
    code, res = call(srv, "POST", "/collections",
                     body={"name": "docs", "fields": [
                         {"name": "a", "type": "string"}]})
    assert code == 409                      # already exists
    code, res = call(srv, "POST", "/collections", body={"name": "x"})
    assert code == 400                      # no fields
    code, res = call(srv, "POST", "/collections", body={
        "name": "y", "fields": [{"name": "a", "type": "wat"}]})
    assert code == 400                      # bad type
    code, res = call(srv, "GET", "/collections/ghost")
    assert code == 404
    code, res = call(srv, "DELETE", "/collections/ghost")
    assert code == 404
    code, res = call(srv, "POST", "/collections", body={
        "name": "z", "fields": [{"name": "a", "type": "string"}],
        "default_sorting_field": "a"})
    assert code == 400                      # non-numeric default sort


def test_auth_errors(srv):
    code, res = call(srv, "GET", "/collections", key="wrong")
    assert code == 401
    code, res = call(srv, "GET", "/keys/99999")
    assert code == 404


def test_vector_query_errors(srv):
    code, res = search(srv, q="*", vector_query="title:([0.1], k: 3)")
    assert code == 400
    code, res = search(srv, q="*", vector_query="garbage")
    assert code == 400
