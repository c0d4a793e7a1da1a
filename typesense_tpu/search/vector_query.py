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

    for part in inner.split(","):
        part = part.strip()
        if not part:
            continue
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
            elif key == "queries" or key == "query_weights":
                pass  # multi-query personalization — handled upstream
            else:
                raise BadRequest(f"Malformed vector query string: unknown field `{key}`.")
        except ValueError:
            raise BadRequest("The `vector_query` parameter is malformed.")

    if not vq.values and vq.query_doc_id is None and not is_wildcard_query:
        pass  # hybrid auto-embedding fills values upstream
    return vq
