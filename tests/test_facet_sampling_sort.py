"""Facet sampling params + facet sort_by another field, ported from
/root/reference/test/collection_faceting_test.cpp SampleFacetCounts /
FacetSortByOtherField / FacetSortValidation."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.core.errors import TypesenseError
from typesense_tpu.schema.field import Field


def test_sample_facet_counts():
    """SampleFacetCounts (collection_faceting_test.cpp:2093). Our facet
    counting is fused into the scan, so counts stay EXACT; the `sampled`
    flag reports whether the reference would have sampled."""
    import random
    c = Collection("sfc", [Field("color", "string", facet=True)])
    rng = random.Random(137723)
    n_blue = n_red = 0
    for i in range(1000):
        if rng.randint(1, 100) % 2 == 0:
            c.add({"id": str(i), "color": "blue"})
            n_blue += 1
        else:
            c.add({"id": str(i), "color": "red"})
            n_red += 1
    res = c.search({"q": "*", "facet_by": "color",
                    "facet_sample_percent": "10",
                    "facet_sample_threshold": "100"})
    assert res["found"] == 1000
    counts = {x["value"]: x["count"]
              for x in res["facet_counts"][0]["counts"]}
    assert counts["blue"] >= 250 and counts["red"] >= 250
    assert res["facet_counts"][0]["sampled"] is True

    # high threshold: no sampling, exact counts
    res = c.search({"q": "*", "facet_by": "color",
                    "facet_sample_percent": "10",
                    "facet_sample_threshold": "10000"})
    counts = {x["value"]: x["count"]
              for x in res["facet_counts"][0]["counts"]}
    assert counts == {"blue": n_blue, "red": n_red}
    assert res["facet_counts"][0]["sampled"] is False

    # percent 100 (default): never sampled
    res = c.search({"q": "*", "facet_by": "color"})
    assert res["facet_counts"][0]["sampled"] is False

    with pytest.raises(TypesenseError):
        c.search({"q": "*", "facet_by": "color",
                  "facet_sample_percent": "200"})


@pytest.fixture()
def recipes():
    c = Collection("fsb", [Field("name", "string", facet=True),
                           Field("calories", "int32")],
                   default_sorting_field="calories")
    rows = [("cheese pizza", 300), ("noodles", 250), ("hamburger", 350),
            ("schezwan rice", 150), ("pasta", 275), ("butter chicken", 275)]
    for i, (n, cal) in enumerate(rows):
        c.add({"id": str(i), "name": n, "calories": cal})
    return c


def test_facet_sort_by_other_field_asc(recipes):
    """FacetSortByOtherField (…:2949)."""
    res = recipes.search({"q": "*",
                          "facet_by": "name(sort_by: calories:asc)"})
    vals = [x["value"] for x in res["facet_counts"][0]["counts"]]
    assert vals == ["schezwan rice", "noodles", "pasta", "butter chicken",
                    "cheese pizza", "hamburger"]


def test_facet_sort_by_other_field_desc(recipes):
    res = recipes.search({"q": "*",
                          "facet_by": "name(sort_by: calories:desc)"})
    vals = [x["value"] for x in res["facet_counts"][0]["counts"]]
    assert vals == ["hamburger", "cheese pizza", "butter chicken", "pasta",
                    "noodles", "schezwan rice"]   # ties flip with direction


def test_facet_sort_validation(recipes):
    """FacetSortValidation (…:3212): unknown / non-numeric companion."""
    with pytest.raises(TypesenseError, match="Could not find a field"):
        recipes.search({"q": "*",
                        "facet_by": "name(sort_by: nope:asc)"})
    c = Collection("fsv2", [Field("name", "string", facet=True),
                            Field("brand", "string")])
    c.add({"id": "0", "name": "a", "brand": "x"})
    with pytest.raises(TypesenseError, match="numerical field"):
        c.search({"q": "*", "facet_by": "name(sort_by: brand:asc)"})


def test_facet_return_parent():
    """FacetingReturnParent (collection_faceting_test.cpp:2288): listed
    dotted facet fields carry their immediate parent object per count."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    c = Collection("frp", [Field("value.color", "string", facet=True),
                           Field("value.r", "int32", facet=True),
                           Field("value.b", "int32", facet=True)],
                   enable_nested_fields=True)
    c.add({"id": "0", "value": {"color": "red", "r": 255, "b": 0}})
    c.add({"id": "1", "value": {"color": "blue", "r": 0, "b": 255}})
    res = c.search({"q": "*", "facet_by": "value.color",
                    "facet_return_parent": "value.color"})
    by_val = {x["value"]: x for x in res["facet_counts"][0]["counts"]}
    assert by_val["red"]["parent"] == {"color": "red", "r": 255, "b": 0}
    assert by_val["blue"]["parent"] == {"color": "blue", "r": 0, "b": 255}
    # not listed -> no parent key
    res = c.search({"q": "*", "facet_by": "value.color"})
    assert all("parent" not in x
               for x in res["facet_counts"][0]["counts"])
