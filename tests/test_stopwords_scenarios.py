"""Stopword behaviors ported from
/root/reference/test/stopwords_manager_test.cpp StopwordsBasics/Validation."""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def srv(tmp_path):
    s = make_server(Store(str(tmp_path / "db")))
    call(s, "POST", "/collections", body={
        "name": "movies",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "points", "type": "int32"}]})
    docs = [("The Dark Knight Europe", 10), ("An American America", 12),
            ("Village of the dead", 5)]
    for i, (t, p) in enumerate(docs):
        call(s, "POST", "/collections/movies/documents",
             body={"id": str(i), "title": t, "points": p})
    call(s, "PUT", "/stopwords/common", body={
        "stopwords": ["the", "an", "a", "of"], "locale": "en"})
    return s


def _search(s, q, **kw):
    return call(s, "GET", "/collections/movies/documents/search",
                query={"q": q, "query_by": "title", "stopwords": "common",
                       "num_typos": "0", "prefix": "false", **kw})


def test_stopword_only_query_matches_nothing(srv):
    code, res = _search(srv, "the an")
    assert code == 200 and res["found"] == 0


def test_remaining_words_match_after_stopword_removal(srv):
    code, res = _search(srv, "the dark")
    assert code == 200 and res["found"] == 1
    assert res["hits"][0]["document"]["id"] == "0"


def test_quoted_phrase_bypasses_stopwords(srv):
    code, res = _search(srv, '"village of"')
    assert code == 200 and res["found"] == 1
    assert res["hits"][0]["document"]["id"] == "2"


def test_stopword_crud_roundtrip(srv):
    code, res = call(srv, "GET", "/stopwords/common")
    assert code == 200
    got = res.get("stopwords", res)
    vals = got.get("stopwords") if isinstance(got, dict) else got
    assert set(vals) >= {"the", "an", "a", "of"}
    code, _ = call(srv, "DELETE", "/stopwords/common")
    assert code == 200
    code, res = _search(srv, "the an")
    # set gone: tokens search literally and match docs containing them
    assert code == 200 and res["found"] >= 1


def test_stopword_upsert_validation(srv):
    code, _ = call(srv, "PUT", "/stopwords/bad", body={"locale": "en"})
    assert code == 400
