"""Highlighting with dropped tokens / prefixes, ported from
/root/reference/test/collection_specific_test.cpp HighlightWithDropTokens /
HighlightLongFieldWithDropTokens / HighlightEmptyArray."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def test_highlight_covers_all_query_tokens_after_drop():
    """HighlightWithDropTokens (collection_specific_test.cpp:872): even
    when the hit matched via a drop pass, highlighting marks EVERY original
    query token present in the text."""
    c = Collection("hld1", [Field("description", "string"),
                            Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "points": 100, "description":
           "HPE Aruba AP-575 802.11ax Wireless Access Point - TAA "
           "Compliant - 2.40 GHz, 5 GHz - MIMO Technology - 1 x Network "
           "(RJ-45) - Gigabit Ethernet - Bluetooth 5"})
    res = c.search({"q": "HPE Aruba AP-575 Technology Gigabit Bluetooth 5",
                    "query_by": "description", "prefix": "true",
                    "num_typos": "0", "drop_tokens_threshold": "10",
                    "highlight_full_fields": "description"})
    assert res["found"] == 1
    hl = res["hits"][0]["highlights"][0]
    text = hl.get("value") or hl["snippet"]
    for tok in ("HPE", "Aruba", "Technology", "Gigabit", "Bluetooth"):
        assert f"<mark>{tok}</mark>" in text, (tok, text)


def test_highlight_prefix_inside_longer_word():
    """HighlightLongFieldWithDropTokens (…:903): a prefix-matched token
    highlights its PREFIX inside the longer word (<mark>Port</mark>s)."""
    c = Collection("hld2", [Field("description", "string"),
                            Field("points", "int32")],
                   default_sorting_field="points")
    c.add({"id": "0", "points": 100, "description":
           "Tripp Lite USB C to VGA Multiport Video Adapter w/ USB-A Hub, "
           "USB-C PD Charging Port & Gigabit Ethernet Port, 2 x USB Ports "
           "- Network (RJ-45) - VGA - Wired"})
    res = c.search({"q": "wired charging gigabit port",
                    "query_by": "description", "prefix": "true",
                    "num_typos": "0", "drop_tokens_threshold": "1",
                    "highlight_full_fields": "description"})
    assert res["found"] == 1
    hl = res["hits"][0]["highlights"][0]
    text = hl.get("value") or hl["snippet"]
    assert "<mark>Charging</mark>" in text
    assert "<mark>Gigabit</mark>" in text
    assert "<mark>Wired</mark>" in text
    assert "<mark>Port</mark>" in text


def test_highlight_empty_array_field():
    """HighlightEmptyArray (…:1150): an empty array field must not break
    highlighting of the other fields."""
    c = Collection("hld3", [Field("title", "string"),
                            Field("tags", "string[]", optional=True)])
    c.add({"id": "0", "title": "hello world", "tags": []})
    res = c.search({"q": "hello", "query_by": "title,tags",
                    "prefix": "false", "num_typos": "0"})
    assert res["found"] == 1
    fields = {h["field"] for h in res["hits"][0]["highlights"]}
    assert "title" in fields and "tags" not in fields


def test_single_char_match_full_field_highlight():
    """SingleCharMatchFullFieldHighlight (…:726)."""
    c = Collection("hld4", [Field("title", "string")])
    c.add({"id": "0", "title": "a b c d"})
    res = c.search({"q": "b", "query_by": "title", "prefix": "false",
                    "num_typos": "0", "highlight_full_fields": "title"})
    assert res["found"] == 1
    hl = res["hits"][0]["highlights"][0]
    assert "<mark>b</mark>" in (hl.get("value") or hl["snippet"])
