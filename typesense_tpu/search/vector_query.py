"""vector_query parameter parser.

Syntax contract: /root/reference/src/vector_query_ops.cpp
(VectorQueryOps::parse_vector_query_str):
  `field:([v1, v2, ...], k: 100, alpha: 0.3, distance_threshold: 1.0,
  id: doc_id, flat_search_cutoff: 20, ef: 10)`
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field

from typesense_tpu.core.errors import BadRequest


@dataclass
class VectorQuery:
    field_name: str
    values: list[float] = dc_field(default_factory=list)
    k: int = 0
    distance_threshold: float = 3.4e38
    alpha: float = 0.3
    flat_search_cutoff: int = 0
    ef: int = 10
    query_doc_id: str | None = None
    queries: list[str] = dc_field(default_factory=list)
    query_weights: list[float] = dc_field(default_factory=list)
    image_query: str | None = None


def _split_params(inner: str) -> list[str]:
    """Split `k: 5, queries: [a, b], alpha: 0.3` into top-level params —
    commas inside [..] lists or backtick quotes do not split (mirrors
    vector_query_ops.cpp's split_include_fields + backtick handling)."""
    parts, depth, tick, start = [], 0, False, 0
    for i, c in enumerate(inner):
        if c == "`":
            tick = not tick
        elif c == "[" and not tick:
            depth += 1
        elif c == "]" and not tick:
            depth -= 1
        elif c == "," and depth == 0 and not tick:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    return [p for p in (x.strip() for x in parts) if p]


def _parse_string_list(val: str) -> list[str]:
    """`[snake, `a, b`, lizard]` → ['snake', 'a, b', 'lizard'] — backtick
    quoting per StringUtils::split_list_with_backticks."""
    items, tick, start = [], False, 0
    for i, c in enumerate(val):
        if c == "`":
            tick = not tick
        elif c == "," and not tick:
            items.append(val[start:i])
            start = i + 1
    items.append(val[start:])
    return [x.strip().strip("`").strip() for x in items
            if x.strip().strip("`").strip()]


def parse_vector_query(s: str, is_wildcard_query: bool) -> VectorQuery:
    s = s.strip()
    m = re.match(r"^([^:]+):\((.*)\)$", s, re.DOTALL)
    if not m:
        raise BadRequest("The `vector_query` parameter is malformed.")
    field_name = m.group(1).strip()
    inner = m.group(2).strip()

    vq = VectorQuery(field_name=field_name)

    # leading [..] vector literal
    if inner.startswith("["):
        depth = 0
        end = -1
        for i, c in enumerate(inner):
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise BadRequest("The `vector_query` parameter is malformed.")
        try:
            vq.values = [float(x) for x in json.loads(inner[:end + 1])]
        except (ValueError, json.JSONDecodeError):
            raise BadRequest("The `vector_query` parameter is malformed.")
        inner = inner[end + 1:].lstrip(", ")

    for part in _split_params(inner):
        if ":" not in part:
            raise BadRequest("The `vector_query` parameter is malformed.")
        key, val = part.split(":", 1)
        key, val = key.strip(), val.strip()
        try:
            if key == "k":
                vq.k = int(val)
            elif key == "distance_threshold":
                vq.distance_threshold = float(val)
            elif key == "alpha":
                vq.alpha = float(val)
                if not (0.0 <= vq.alpha <= 1.0):
                    raise BadRequest("Malformed vector query string: "
                                     "`alpha` parameter must be a float between 0.0-1.0.")
            elif key == "flat_search_cutoff":
                vq.flat_search_cutoff = int(val)
            elif key == "ef":
                vq.ef = int(val)
            elif key == "id":
                vq.query_doc_id = val.strip("`\"'")
            elif key == "queries":
                if not (val.startswith("[") and val.endswith("]")):
                    raise BadRequest("Malformed vector query string: "
                                     "`queries` parameter must be a list of strings.")
                vq.queries = _parse_string_list(val[1:-1])
            elif key == "query_weights":
                if not (val.startswith("[") and val.endswith("]")):
                    raise BadRequest("Malformed vector query string: "
                                     "`query_weights` parameter must be a list of floats.")
                try:
                    vq.query_weights = [float(x) for x in val[1:-1].split(",")
                                        if x.strip()]
                except ValueError:
                    raise BadRequest("Malformed vector query string: "
                                     "`query_weights` parameter must be a list of floats.")
            elif key == "image":
                vq.image_query = val.strip("`\"'")
            else:
                raise BadRequest(f"Malformed vector query string: unknown field `{key}`.")
        except ValueError:
            raise BadRequest("The `vector_query` parameter is malformed.")

    if vq.query_weights and len(vq.queries) != len(vq.query_weights):
        raise BadRequest("Malformed vector query string: "
                         "`queries` and `query_weights` must be of the same length.")
    if vq.query_weights and abs(sum(vq.query_weights) - 1.0) > 1e-6:
        raise BadRequest("Malformed vector query string: "
                         "`query_weights` must sum to 1.0.")
    if not vq.values and vq.query_doc_id is None and not is_wildcard_query:
        pass  # hybrid auto-embedding fills values upstream
    return vq
