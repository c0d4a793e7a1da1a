"""$operations.increment, ported from
/root/reference/test/collection_operations_test.cpp."""

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _coll():
    return Collection("opsinc", [Field("title", "string"),
                                 Field("points", "int32"),
                                 Field("points64", "int64")])


def _points(c, doc_id="0"):
    return c.get(doc_id)


def test_increment_int32_value():
    """IncrementInt32Value (collection_operations_test.cpp:38)."""
    c = _coll()
    c.add({"id": "0", "title": "Sherlock Holmes", "points": 100,
           "points64": 0})
    c.add({"id": "0", "$operations": {"increment": {"points": 1}}},
          operation="update")
    assert _points(c)["points"] == 101
    c.add({"id": "0", "$operations": {"increment": {"points": 10}}},
          operation="update")
    assert _points(c)["points"] == 111
    c.add({"id": "0", "$operations": {"increment": {"points64": 5}}},
          operation="update")
    assert _points(c)["points64"] == 5
    c.add({"id": "0", "$operations": {"increment": {"points": -10}}},
          operation="update")
    assert _points(c)["points"] == 101
    # unknown field: increment skipped, rest of the update applies
    c.add({"id": "0", "title": "The Sherlock Holmes",
           "$operations": {"increment": {"pointsx": -10}}},
          operation="update")
    d = _points(c)
    assert d["title"] == "The Sherlock Holmes" and d["points"] == 101
    # filters see the incremented value
    res = c.search({"q": "*", "filter_by": "points:101"})
    assert res["found"] == 1


def test_increment_creates_value_via_optional_field():
    """IncrementInt32ValueCreationViaOptionalField (…:119)."""
    c = Collection("opsinc2", [Field("title", "string"),
                               Field("points", "int32", optional=True)])
    c.add({"id": "0", "title": "Sherlock Holmes",
           "$operations": {"increment": {"points": 1}}},
          operation="emplace")
    assert c.get("0")["points"] == 1
    c.add({"id": "1", "title": "Harry Potter",
           "$operations": {"increment": {"points": 10}}},
          operation="create")
    assert c.get("1")["points"] == 10
    res = c.search({"q": "*", "filter_by": "points:10"})
    assert res["found"] == 1 and \
        res["hits"][0]["document"]["id"] == "1"
