"""Join scenario family — reference collection_join_test.cpp depth:
three-collection chains, joins combined with facets/sort/pagination,
array references, join + typo search, delete interplay."""

import pytest

from typesense_tpu.core.store import Store
from typesense_tpu.manager import CollectionManager


@pytest.fixture()
def mgr(tmp_path):
    m = CollectionManager(Store(str(tmp_path / "db")))
    m.load()
    m.create_collection({"name": "authors", "fields": [
        {"name": "name", "type": "string"},
        {"name": "born", "type": "int32"},
        {"name": "country", "type": "string", "facet": True}]})
    m.create_collection({"name": "books", "fields": [
        {"name": "title", "type": "string"},
        {"name": "author_id", "type": "string",
         "reference": "authors.id"},
        {"name": "year", "type": "int32"}]})
    m.create_collection({"name": "reviews", "fields": [
        {"name": "text", "type": "string"},
        {"name": "book_id", "type": "string", "reference": "books.id"},
        {"name": "stars", "type": "int32"}]})
    a = m.get_collection("authors")
    b = m.get_collection("books")
    r = m.get_collection("reviews")
    a.add({"id": "a1", "name": "tolkien", "born": 1892, "country": "uk"})
    a.add({"id": "a2", "name": "herbert", "born": 1920, "country": "us"})
    b.add({"id": "b1", "title": "the hobbit", "author_id": "a1",
           "year": 1937})
    b.add({"id": "b2", "title": "dune", "author_id": "a2", "year": 1965})
    b.add({"id": "b3", "title": "silmarillion", "author_id": "a1",
           "year": 1977})
    r.add({"id": "r1", "text": "loved the dragons", "book_id": "b1",
           "stars": 5})
    r.add({"id": "r2", "text": "sand everywhere", "book_id": "b2",
           "stars": 4})
    r.add({"id": "r3", "text": "dense but rewarding", "book_id": "b3",
           "stars": 3})
    return m


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_join_filter_with_keyword_query(mgr):
    b = mgr.get_collection("books")
    res = b.search({"q": "the", "query_by": "title", "prefix": "false",
                    "num_typos": "0",
                    "filter_by": "$authors(country:=uk)"})
    assert ids(res) == ["b1"]


def test_join_filter_plus_local_filter(mgr):
    b = mgr.get_collection("books")
    res = b.search({"q": "*",
                    "filter_by": "$authors(country:=uk) && year:>1950"})
    assert ids(res) == ["b3"]


def test_two_hop_chain(mgr):
    # reviews of books written by UK authors: chain via intermediate search
    b = mgr.get_collection("books")
    uk_books = ids(b.search({"q": "*",
                             "filter_by": "$authors(country:=uk)"}))
    r = mgr.get_collection("reviews")
    expr = "book_id:[" + ",".join(uk_books) + "]"
    res = r.search({"q": "*", "filter_by": expr, "sort_by": "stars:desc"})
    assert ids(res) == ["r1", "r3"]


def test_reverse_join(mgr):
    # authors who have a book from before 1950
    a = mgr.get_collection("authors")
    res = a.search({"q": "*", "filter_by": "$books(year:<1950)"})
    assert ids(res) == ["a1"]


def test_negated_join(mgr):
    a = mgr.get_collection("authors")
    res = a.search({"q": "*", "filter_by": "!$books(year:<1950)"})
    assert ids(res) == ["a2"]


def test_join_with_include_hydration(mgr):
    b = mgr.get_collection("books")
    res = b.search({"q": "*", "filter_by": "$authors(country:=uk)",
                    "include_fields": "$authors(name)",
                    "sort_by": "year:asc"})
    assert res["hits"][0]["document"]["authors"]["name"] == "tolkien"


def test_join_sort_by_reference_field(mgr):
    b = mgr.get_collection("books")
    res = b.search({"q": "*", "sort_by": "$authors(born):desc,year:asc"})
    # herbert (1920) first -> dune, then tolkien's books by year
    assert ids(res) == ["b2", "b1", "b3"]


def test_join_with_facets_on_local(mgr):
    a = mgr.get_collection("authors")
    res = a.search({"q": "*", "filter_by": "$books(year:>1900)",
                    "facet_by": "country"})
    fc = {c["value"]: c["count"] for c in res["facet_counts"][0]["counts"]}
    assert fc == {"uk": 1, "us": 1}


def test_join_after_delete(mgr):
    b = mgr.get_collection("books")
    b.remove("b1")
    res = b.search({"q": "*", "filter_by": "$authors(country:=uk)"})
    assert ids(res) == ["b3"]


def test_join_with_typo_query(mgr):
    b = mgr.get_collection("books")
    res = b.search({"q": "hobbbit", "query_by": "title", "num_typos": "2",
                    "prefix": "false",
                    "filter_by": "$authors(country:=uk)"})
    assert ids(res) == ["b1"]
