"""_text_match(buckets/bucket_size) sort configuration, ported from
/root/reference/test/collection_sorting_test.cpp TextMatchBucketRanking /
TextMatchMoreDocsThanBuckets (collection.cpp:2885-2933)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def coll():
    c = Collection("buck", [Field("title", "string"),
                            Field("description", "string"),
                            Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "title": "Mark Antony", "description": "Counsellor",
           "points": 100})
    c.add({"id": "1", "title": "Marks Spencer", "description": "Sales",
           "points": 200})
    return c


def test_more_buckets_than_results_no_bucketing(coll):
    res = coll.search({"q": "mark", "query_by": "title", "prefix": "true",
                       "num_typos": "2",
                       "sort_by": "_text_match(buckets: 10):desc,"
                                  "points:desc"})
    assert _ids(res) == ["0", "1"]


def test_single_bucket_collapses_to_secondary_sort(coll):
    res = coll.search({"q": "mark", "query_by": "title", "prefix": "true",
                       "num_typos": "2",
                       "sort_by": "_text_match(buckets: 1):desc,"
                                  "points:desc"})
    assert _ids(res) == ["1", "0"]
    # original text-match scores are restored in the response
    s0 = int(res["hits"][0]["text_match_info"]["score"])
    s1 = int(res["hits"][1]["text_match_info"]["score"])
    assert s0 < s1


def test_zero_buckets_keeps_original_order(coll):
    res = coll.search({"q": "mark", "query_by": "title", "prefix": "true",
                       "num_typos": "2",
                       "sort_by": "_text_match(buckets: 0):desc,"
                                  "points:desc"})
    assert _ids(res) == ["0", "1"]


def test_invalid_bucket_configs_rejected(coll):
    with pytest.raises(TypesenseError,
                       match="Invalid sorting parameter passed for "
                             "_text_match"):
        coll.search({"q": "mark", "query_by": "title",
                     "sort_by": "_text_match(foobar: 0):desc,points:desc"})
    with pytest.raises(TypesenseError,
                       match="Could not find a field named"):
        coll.search({"q": "mark", "query_by": "title",
                     "sort_by": "_text_match(foobar::desc,points:desc"})
    for bad in ("x", "-1"):
        with pytest.raises(TypesenseError,
                           match="Invalid value passed for _text_match"):
            coll.search({"q": "mark", "query_by": "title",
                         "sort_by": f"_text_match(buckets: {bad}):desc,"
                                    f"points:desc"})


def test_more_docs_than_buckets():
    """TextMatchMoreDocsThanBuckets (collection_sorting_test.cpp:1758):
    block = ceil(4/2) = 2; within a bucket the secondary sort decides."""
    c = Collection("buck2", [Field("title", "string"),
                             Field("points", "int32")],
                   default_sorting_field="points")
    for i, t in enumerate(["Mark Antony", "Marks Spencer", "Marking Rhine",
                           "Markolm Spane"]):
        c.add({"id": str(i), "title": t, "points": i})
    res = c.search({"q": "mark", "query_by": "title", "prefix": "true",
                    "num_typos": "0",
                    "sort_by": "_text_match(buckets: 2):desc,points:desc"})
    assert _ids(res) == ["3", "0", "2", "1"]


def test_bucket_size_config():
    """bucket_size: N groups every N consecutive ranked hits."""
    c = Collection("buck3", [Field("title", "string"),
                             Field("points", "int32")],
                   default_sorting_field="points")
    for i, t in enumerate(["Mark Antony", "Marks Spencer", "Marking Rhine",
                           "Markolm Spane"]):
        c.add({"id": str(i), "title": t, "points": i})
    res = c.search({"q": "mark", "query_by": "title", "prefix": "true",
                    "num_typos": "0",
                    "sort_by": "_text_match(bucket_size: 2):desc,"
                               "points:desc"})
    assert _ids(res) == ["3", "0", "2", "1"]
