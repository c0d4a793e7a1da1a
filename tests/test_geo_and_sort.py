"""Geo search + advanced sort tests (reference: collection_sorting_test.cpp
geopoint cases, collection_filtering_test.cpp geo filters, _eval sorting)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema.field import Field


@pytest.fixture(scope="module")
def places():
    c = Collection("places", [
        Field("title", "string"),
        Field("loc", "geopoint", optional=True),
        Field("popularity", "int32", sort=True),
        Field("category", "string", facet=True),
    ], default_sorting_field="popularity")
    docs = [
        # Paris landmarks (lat, lng)
        {"id": "0", "title": "eiffel tower", "loc": [48.8584, 2.2945],
         "popularity": 100, "category": "monument"},
        {"id": "1", "title": "louvre museum", "loc": [48.8606, 2.3376],
         "popularity": 90, "category": "museum"},
        {"id": "2", "title": "notre dame", "loc": [48.8530, 2.3499],
         "popularity": 80, "category": "church"},
        {"id": "3", "title": "sacre coeur", "loc": [48.8867, 2.3431],
         "popularity": 70, "category": "church"},
        # London (far away)
        {"id": "4", "title": "big ben tower", "loc": [51.5007, -0.1246],
         "popularity": 95, "category": "monument"},
        # no location
        {"id": "5", "title": "mystery tower", "popularity": 99,
         "category": "monument"},
    ]
    for d in docs:
        c.add(d)
    return c


def ids(res):
    return [h["document"]["id"] for h in res["hits"]]


def test_geo_radius_filter(places):
    res = places.search({"q": "*", "filter_by": "loc:(48.8584, 2.2945, 10 km)"})
    assert sorted(ids(res)) == ["0", "1", "2", "3"]


def test_geo_polygon_filter(places):
    # box around central Paris
    res = places.search({
        "q": "*",
        "filter_by": "loc:(48.84, 2.28, 48.90, 2.28, 48.90, 2.36, 48.84, 2.36)"})
    assert sorted(ids(res)) == ["0", "1", "2", "3"]


def test_geo_sort_asc(places):
    # from the eiffel tower: self, louvre, notre dame, sacre coeur, big ben;
    # doc 5 (no loc) sorts last
    res = places.search({"q": "*", "sort_by": "loc(48.8584, 2.2945):asc",
                         "per_page": 10})
    assert ids(res) == ["0", "1", "2", "3", "4", "5"]
    d = res["hits"][0]["geo_distance_meters"]["loc"]
    assert d < 50
    d1 = res["hits"][1]["geo_distance_meters"]["loc"]
    assert 2500 < d1 < 4500  # louvre ~3.2 km away
    assert "geo_distance_meters" not in res["hits"][5] or \
        "loc" not in res["hits"][5]["geo_distance_meters"]


def test_geo_sort_exclude_radius(places):
    # exclude_radius 5km: all Paris docs tie at 0 -> secondary sort popularity desc
    res = places.search({"q": "*",
                         "sort_by": "loc(48.8584, 2.2945, exclude_radius: 5km):asc, popularity:desc",
                         "per_page": 10})
    assert ids(res)[:4] == ["0", "1", "2", "3"]


def test_geo_sort_keyword_query(places):
    res = places.search({"q": "tower", "query_by": "title",
                         "sort_by": "loc(48.8584, 2.2945):asc"})
    assert ids(res) == ["0", "4", "5"]


def test_geo_sort_requires_coords(places):
    with pytest.raises(BadRequest):
        places.search({"q": "*", "sort_by": "loc:asc"})


def test_eval_sort(places):
    res = places.search({"q": "*",
                         "sort_by": "_eval(category:monument):desc, popularity:desc",
                         "per_page": 10})
    # monuments first (0, 4, 5 by popularity desc), then the rest
    assert ids(res) == ["0", "5", "4", "1", "2", "3"]


def test_eval_weighted_sort(places):
    res = places.search({"q": "*",
                         "sort_by": "_eval([(category:church):3, (category:museum):1]):desc, popularity:desc",
                         "per_page": 10})
    assert ids(res)[:3] == ["2", "3", "1"]


def test_rand_sort_deterministic(places):
    r1 = places.search({"q": "*", "sort_by": "_rand(7):asc", "per_page": 10})
    r2 = places.search({"q": "*", "sort_by": "_rand(7):asc", "per_page": 10})
    assert ids(r1) == ids(r2)
    r3 = places.search({"q": "*", "sort_by": "_rand(8):asc", "per_page": 10})
    assert len(ids(r3)) == 6


def test_missing_values_first_last():
    c = Collection("mv", [Field("t", "string"),
                          Field("score", "int32", sort=True, optional=True)])
    c.add({"id": "0", "t": "a", "score": 10})
    c.add({"id": "1", "t": "a"})
    c.add({"id": "2", "t": "a", "score": 5})
    last = c.search({"q": "*", "sort_by": "score(missing_values: last):asc"})
    assert ids(last) == ["2", "0", "1"]
    first = c.search({"q": "*", "sort_by": "score(missing_values: first):asc"})
    assert ids(first) == ["1", "2", "0"]
    # default: missing treated as smallest (first on asc, last on desc)
    dflt_desc = c.search({"q": "*", "sort_by": "score:desc"})
    assert ids(dflt_desc) == ["0", "2", "1"]


def test_geopolygon_field_contains_point():
    c = Collection("zones", [
        Field("name", "string"),
        Field("area", "geopolygon", optional=True),
    ])
    # square around central Paris
    c.add({"id": "0", "name": "paris zone",
           "area": [48.80, 2.25, 48.92, 2.25, 48.92, 2.45, 48.80, 2.45]})
    # square around London
    c.add({"id": "1", "name": "london zone",
           "area": [51.40, -0.3, 51.60, -0.3, 51.60, 0.1, 51.40, 0.1]})
    c.add({"id": "2", "name": "no zone"})

    res = c.search({"q": "*", "filter_by": "area:(48.8584, 2.2945)"})
    assert ids(res) == ["0"]
    res = c.search({"q": "*", "filter_by": "area:(51.5007, -0.1246)"})
    assert ids(res) == ["1"]
    res = c.search({"q": "*", "filter_by": "area:(40.0, -74.0)"})
    assert res["found"] == 0


def test_geopolygon_validation():
    c = Collection("z2", [Field("area", "geopolygon")])
    with pytest.raises(BadRequest):
        c.add({"area": [1.0, 2.0]})          # too few points
    with pytest.raises(BadRequest):
        c.add({"area": [1.0, 2.0, 3.0]})     # odd count
