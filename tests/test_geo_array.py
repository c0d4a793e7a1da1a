"""geopoint[] fields, ported from
/root/reference/test/geo_filtering_old_test.cpp GeoPointArrayFiltering and
collection_sorting_test.cpp GeoPointArraySorting."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _ids(res):
    return [h["document"]["id"] for h in res["hits"]]


@pytest.fixture()
def places():
    c = Collection("geoarr", [Field("title", "string"),
                              Field("locs", "geopoint[]")])
    # 0: Paris + NYC; 1: Sydney; 2: London
    c.add({"id": "0", "title": "multi",
           "locs": [[48.85, 2.29], [40.71, -74.0]]})
    c.add({"id": "1", "title": "sydney", "locs": [[-33.86, 151.2]]})
    c.add({"id": "2", "title": "london", "locs": [[51.5, -0.12]]})
    return c


def test_geo_array_radius_any_point_matches(places):
    """GeoPointArrayFiltering (geo_filtering_old_test.cpp:181)."""
    res = places.search({"q": "*",
                         "filter_by": "locs:(48.85, 2.29, 100 km)"})
    assert _ids(res) == ["0"]
    res = places.search({"q": "*",
                         "filter_by": "locs:(40.7, -74.0, 100 km)"})
    assert _ids(res) == ["0"]
    res = places.search({"q": "*",
                         "filter_by": "locs:(51.5, -0.12, 50 km)"})
    assert _ids(res) == ["2"]


def test_geo_array_sort_by_closest_point(places):
    """GeoPointArraySorting (collection_sorting_test.cpp:1041): doc sorts
    by its CLOSEST point."""
    res = places.search({"q": "*",
                         "sort_by": "locs(48.85, 2.29):asc"})
    # from Paris: doc0 (Paris itself), doc2 (London), doc1 (Sydney)
    assert _ids(res) == ["0", "2", "1"]
    res = places.search({"q": "*",
                         "sort_by": "locs(40.71, -74.0):asc"})
    # from NYC: doc0 (NYC point!), then London, then Sydney
    assert _ids(res) == ["0", "2", "1"]


def test_geo_array_removal(places):
    """GeoPointRemoval (…:322)."""
    places.remove("0")
    res = places.search({"q": "*",
                         "filter_by": "locs:(48.85, 2.29, 100 km)"})
    assert res["found"] == 0
