"""Regression: kernels index field token counts by query-field POSITION.

cand_rows map query slots to GLOBAL field ids, but the kernels read
field_token_counts[:, f] with f = position in query_by. Before the fix the
engine passed the full (N, F_all) array, so `query_by: tags` read `title`'s
token counts — breaking the exact-match bonus (reference: Index::score_results
exact-match check against the field's token count, src/index.cpp).
The engine now gathers the queried columns per query_by combination
(IndexEngine._ftc_for_fields).
"""

import numpy as np
import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def _mk(force_mode=None, n_fill=40):
    c = Collection("ftcmap", [
        Field("title", "string"),
        Field("tags", "string[]"),
        Field("points", "int32"),
    ], default_sorting_field="points")
    docs = [
        # doc 0: tags is exactly "garlic" (1 token) -> exact single match
        {"id": "0", "title": "one two three four five",
         "tags": ["garlic"], "points": 10},
        # doc 1: "garlic" not the whole tags value; 1-token title must NOT
        # fake the exact bonus through the positional-column bug
        {"id": "1", "title": "garlicless",
         "tags": ["garlic sauce"], "points": 20},
    ]
    for i in range(2, n_fill):
        docs.append({"id": str(i), "title": f"filler doc {i}",
                     "tags": ["x"], "points": i})
    c.add_many(docs)
    if force_mode:
        c._ensure_index()._force_mode = force_mode
    return c


@pytest.mark.parametrize("mode", [None, "dense2"])
def test_exact_bonus_uses_queried_field_counts(mode):
    c = _mk(mode)
    res = c.search({"q": "garlic", "query_by": "tags", "per_page": 5})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids[0] == "0", ids
    tm = [h["text_match"] for h in res["hits"][:2]]
    assert tm[0] > tm[1], "doc 0 must win via the exact-match bonus"


def test_multi_field_reordered_query_by():
    c = _mk()
    # query_by reversed vs schema order: slot 0 = tags, slot 1 = title
    res = c.search({"q": "garlic", "query_by": "tags,title",
                    "query_by_weights": "4,1", "per_page": 5})
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids[0] == "0", ids
