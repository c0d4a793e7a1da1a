"""Union search behaviors ported from /root/reference/test/union_test.cpp —
cross-collection merge metadata, top-level pagination, duplicate removal."""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    for name in ("movies", "books"):
        call(s, "POST", "/collections", body={
            "name": name,
            "fields": [{"name": "title", "type": "string"},
                       {"name": "points", "type": "int32"}]})
    for i, t in enumerate(["The Legend of the Titanic",
                           "The Wizard of Oz", "Sharknado"]):
        call(s, "POST", "/collections/movies/documents",
             body={"id": str(i), "title": t, "points": i})
    for i, t in enumerate(["Titanic: the story", "Oz chronicles"]):
        call(s, "POST", "/collections/books/documents",
             body={"id": str(i), "title": t, "points": i})
    return s


def _union(s, searches, **q):
    return call(s, "POST", "/multi_search", body={
        "union": True, "searches": searches}, query=q or None)


def test_union_hits_carry_collection_and_search_index(srv):
    """DifferentCollections (union_test.cpp:676)."""
    code, res = _union(srv, [
        {"collection": "movies", "q": "titanic", "query_by": "title",
         "num_typos": "0", "prefix": "false"},
        {"collection": "books", "q": "titanic", "query_by": "title",
         "num_typos": "0", "prefix": "false"}])
    assert code == 200
    assert res["found"] == 2
    cols = {(h["collection"], h["search_index"]) for h in res["hits"]}
    assert cols == {("movies", 0), ("books", 1)}
    urp = res["union_request_params"]
    assert [u["collection_name"] for u in urp] == ["movies", "books"]
    assert [u["found"] for u in urp] == [1, 1]


def test_union_top_level_pagination(srv):
    """Pagination (…:766): top-level page/per_page control the merged
    list; per-search pagination has no effect."""
    searches = [
        {"collection": "movies", "q": "*", "per_page": 1},
        {"collection": "books", "q": "*", "per_page": 1}]
    code, res = _union(srv, searches, per_page="2", page="1")
    assert code == 200
    assert res["found"] == 5
    assert res["out_of"] == 5
    assert len(res["hits"]) == 2
    code, res2 = _union(srv, searches, per_page="2", page="3")
    assert code == 200
    assert len(res2["hits"]) == 1      # 5 docs -> page 3 of 2 has one


def test_union_removes_duplicates_by_default(srv):
    """RemoveDuplicatesWithUnion (…:1306): same collection + id appears
    once; remove_duplicates=false keeps every occurrence."""
    searches = [
        {"collection": "movies", "q": "titanic", "query_by": "title",
         "num_typos": "0", "prefix": "false"},
        {"collection": "movies", "q": "legend titanic", "query_by": "title",
         "num_typos": "0", "prefix": "false"}]
    code, res = _union(srv, searches)
    assert code == 200
    assert res["found"] == 1
    assert len(res["hits"]) == 1
    assert res["hits"][0]["document"]["id"] == "0"

    code, res = _union(srv, searches, remove_duplicates="false")
    assert code == 200
    assert res["found"] == 2
    assert len(res["hits"]) == 2


def test_union_error_bubbles(srv):
    """ErrorHandling (…:383)."""
    code, res = _union(srv, [
        {"collection": "nope", "q": "*"},
        {"collection": "movies", "q": "*"}])
    assert code == 400
