"""filter_by parser + evaluator.

Grammar contract: /root/reference/include/filter.h:17-146 and
src/filter.cpp:parse_filter_query — comparators =, !=, >, >=, <, <=, ranges
[a..b], multi-value lists [a, b, c], && / || with parentheses, backtick-quoted
values, boolean and geo filters.

TPU mapping: a filter compiles to a dense boolean doc mask. Numeric
comparisons evaluate on host numpy columns (cheap, O(N) vector compare) and
string equality resolves through the value index (facet_index_t equivalent);
the resulting mask ships to the device once per query and fuses into the
scoring scan (SURVEY.md §2.1 'filter AST compiles to bitmap masks').
"""

from __future__ import annotations

import math
import re

import numpy as np

from typesense_tpu.core.errors import BadRequest, NotFound
from typesense_tpu.index.artifacts import SegmentArrays
from typesense_tpu.schema.field import Field

EARTH_RADIUS_M = 6371000.0


class FilterNode:
    pass


class LeafNode(FilterNode):
    def __init__(self, field_name: str, op: str, values: list, negate: bool = False,
                 value_ops: list | None = None):
        self.field_name = field_name
        # '=', '!=', '>', '>=', '<', '<=', 'range', 'in', 'not_in',
        # 'contains', 'contains_phrase' (string CONTAINS/CONTAINS_PHRASE,
        # filter.h:17-27)
        self.op = op
        self.values = values
        self.negate = negate
        # per-value comparator override for mixed arrays like
        # [alpha, "beta gamma"] (filter.cpp:698-726)
        self.value_ops = value_ops


class BoolNode(FilterNode):
    def __init__(self, op: str, left: FilterNode, right: FilterNode):
        self.op = op          # '&&' or '||'
        self.left = left
        self.right = right


class JoinNode(FilterNode):
    """`$Coll(expr)` reference filter (join.h:77 Join:: statics; filter syntax
    parse in src/join.cpp). negate = `!$Coll(...)` left-excluding join."""

    def __init__(self, coll_name: str, expr: str, negate: bool = False):
        self.coll_name = coll_name
        self.expr = expr
        self.negate = negate


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def _split_top_level(s: str, sep: str) -> list[str]:
    parts, depth, buf, i = [], 0, [], 0
    in_tick = False
    while i < len(s):
        c = s[i]
        if c == "`":
            in_tick = not in_tick
        if not in_tick:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif depth == 0 and s.startswith(sep, i):
                parts.append("".join(buf))
                buf = []
                i += len(sep)
                continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def parse_filter_query(expr: str) -> FilterNode | None:
    expr = expr.strip()
    if not expr:
        return None
    depth = 0
    in_tick = False
    for c in expr:
        if c == "`":
            in_tick = not in_tick
        elif not in_tick and c == "(":
            depth += 1
        elif not in_tick and c == ")":
            depth -= 1
            if depth < 0:
                break
    if depth != 0:
        raise BadRequest("Could not parse the filter query: unbalanced "
                         "parentheses.")
    or_parts = _split_top_level(expr, "||")
    if len(or_parts) > 1:
        if any(not p.strip() for p in or_parts):
            raise BadRequest("Could not parse the filter query: missing "
                             "operand around `||`.")
        node = parse_filter_query(or_parts[0])
        for p in or_parts[1:]:
            node = BoolNode("||", node, parse_filter_query(p))
        return node
    and_parts = _split_top_level(expr, "&&")
    if len(and_parts) > 1:
        if any(not p.strip() for p in and_parts):
            raise BadRequest("Could not parse the filter query: missing "
                             "operand around `&&`.")
        node = parse_filter_query(and_parts[0])
        for p in and_parts[1:]:
            node = BoolNode("&&", node, parse_filter_query(p))
        return node
    expr = expr.strip()
    if expr.startswith("(") and expr.endswith(")"):
        depth = 0
        balanced = True
        for i, c in enumerate(expr):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i != len(expr) - 1:
                    balanced = False
                    break
        if balanced:
            return parse_filter_query(expr[1:-1])
    return _parse_leaf(expr)


_LEAF_RE = re.compile(r"^\s*([^:\s]+)\s*:\s*(.*)$", re.DOTALL)


def _strip_value(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == "`" and v[-1] == "`":
        v = v[1:-1]
    return v


_JOIN_RE = re.compile(r"^\s*(!?)\s*\$\s*(!?)([A-Za-z0-9_.\-]+)\s*\((.*)\)\s*$",
                      re.DOTALL)


def _parse_leaf(expr: str) -> FilterNode:
    jm = _JOIN_RE.match(expr)
    if jm:
        negate = jm.group(1) == "!" or jm.group(2) == "!"
        return JoinNode(jm.group(3), jm.group(4).strip(), negate)
    m = _LEAF_RE.match(expr)
    if not m:
        raise BadRequest(f"Could not parse the filter query: `{expr}`.")
    fname, rhs = m.group(1).strip(), m.group(2).strip()
    negate = False

    if rhs.startswith("!="):
        op, rhs = "!=", rhs[2:].strip()
    elif rhs.startswith(">="):
        op, rhs = ">=", rhs[2:].strip()
    elif rhs.startswith("<="):
        op, rhs = "<=", rhs[2:].strip()
    elif rhs.startswith(">"):
        op, rhs = ">", rhs[1:].strip()
    elif rhs.startswith("<"):
        op, rhs = "<", rhs[1:].strip()
    elif rhs.startswith(":="):
        op, rhs = "=", rhs[2:].strip()
    elif rhs.startswith("="):
        op, rhs = "=", rhs[1:].strip()
    else:
        # bare `field: value` — CONTAINS for strings (token-level match,
        # filter.cpp:677 default str_comparator), equality for numerics
        # (evaluators map it by field type)
        op = "contains"
    if not rhs or rhs.startswith(","):
        # `name:,hello` parses as an empty first value in the reference
        # (HandleBadlyFormedFilterQuery, collection_filtering_test.cpp:651)
        raise BadRequest(f"Error with filter field `{fname}`: "
                         f"Filter value cannot be empty.")

    if rhs.startswith("[") and rhs.endswith("]"):
        inner = rhs[1:-1]
        if ".." in inner and "," not in inner:
            lo, hi = inner.split("..", 1)
            return LeafNode(fname, "range", [_strip_value(lo), _strip_value(hi)], negate=(op == "!="))
        raw_vals = [v.strip() for v in _split_top_level(inner, ",")]
        # mixed arrays: quoted values are phrases; their presence makes
        # unquoted siblings EQUALS (filter.cpp:706-726)
        has_phrase = any(len(v) > 1 and v[0] == '"' and v[-1] == '"'
                         for v in raw_vals)
        default_vop = "=" if (has_phrase or op in ("=", "!=")) else "contains"
        vals, vops = [], []
        for v in raw_vals:
            if len(v) > 1 and v[0] == '"' and v[-1] == '"':
                vals.append(v[1:-1])
                vops.append("contains_phrase")
            else:
                vals.append(_strip_value(v))
                vops.append(default_vop)
        return LeafNode(fname, "not_in" if op == "!=" else "in", vals,
                        value_ops=vops)
    if len(rhs) > 1 and rhs[0] == '"' and rhs[-1] == '"':
        return LeafNode(fname, "contains_phrase", [rhs[1:-1]],
                        negate=(op == "!="))
    return LeafNode(fname, op, [_strip_value(rhs)])


# ---------------------------------------------------------------------------
# string CONTAINS / CONTAINS_PHRASE over host posting CSR (shared by both
# evaluators; reference: posting_list_t::intersect / get_phrase_matches,
# filter_result_iterator.cpp:3013-3068)
# ---------------------------------------------------------------------------

def _field_row_slice(seg, field_pos: int, tid: int) -> np.ndarray:
    T = max(seg.num_terms, 1)
    row = field_pos * T + tid
    s, e = int(seg.post_offsets[row]), int(seg.post_offsets[row + 1])
    return seg.post_doc_ids[s:e], s


def _prefix_term_range(seg, token: str) -> tuple[int, int]:
    """Lexicographic term-id range covering `token*` (term table is sorted)."""
    from bisect import bisect_left
    terms = getattr(seg, "_terms_sorted_cache", None)
    if terms is None:
        terms = sorted(seg.term_to_id)
        try:
            seg._terms_sorted_cache = terms
        except AttributeError:
            pass
    lo = bisect_left(terms, token)
    hi = bisect_left(terms, token + "￿")
    return lo, hi


def string_filter_doc_ids(seg, f: Field, value: str, op: str,
                          max_candidates: int = 4) -> np.ndarray:
    """Doc ids matching one string filter value under CONTAINS /
    CONTAINS_PHRASE semantics: tokenize the value, intersect the field's
    posting rows; a trailing `*` makes the last token a prefix
    (filter_result_iterator.cpp:3171) expanding to at most
    `max_candidates` terms, most-frequent first (MAX_FILTER_BY_CANDIDATES,
    filter.h:15 DEFAULT_FILTER_BY_CANDIDATES = 4, the fuzzy_search_fields
    max_candidates cap at filter_result_iterator.cpp:1826); phrases
    additionally require adjacent positions within the same array element
    (get_phrase_matches)."""
    from typesense_tpu.index.builder import tokenize_value
    try:
        field_pos = seg.search_fields.index(f.name)
    except ValueError:
        return np.empty(0, np.int64)
    prefix_last = op == "contains" and value.endswith("*")
    if prefix_last:
        value = value[:-1]
    tokens = tokenize_value(value, f)
    if not tokens:
        return np.empty(0, np.int64)

    T = max(seg.num_terms, 1)
    doc_sets: list[np.ndarray] = []
    tids: list[int] = []
    for i, tok in enumerate(tokens):
        if prefix_last and i == len(tokens) - 1:
            lo, hi = _prefix_term_range(seg, tok)
            if hi <= lo:
                return np.empty(0, np.int64)
            cand = np.arange(lo, hi)
            if len(cand) > max_candidates:
                freq = seg.term_doc_freq[lo:hi]
                cand = cand[np.argsort(-freq, kind="stable")[:max_candidates]]
            parts = [_field_row_slice(seg, field_pos, int(t))[0]
                     for t in cand]
            docs = np.unique(np.concatenate(parts)) if parts else \
                np.empty(0, np.int32)
            tids.append(-1)
        else:
            # index-time terms truncate to MAX_TERM_LEN (builder.py:233);
            # long filter tokens must truncate the same way
            from typesense_tpu.index.artifacts import MAX_TERM_LEN
            tid = seg.term_to_id.get(tok[:MAX_TERM_LEN], -1)
            if tid < 0:
                return np.empty(0, np.int64)
            docs, _ = _field_row_slice(seg, field_pos, tid)
            tids.append(tid)
        doc_sets.append(np.asarray(docs, np.int64))
    out = doc_sets[0]
    for ds in doc_sets[1:]:
        out = np.intersect1d(out, ds, assume_unique=False)
        if not len(out):
            return out

    if op == "contains_phrase" and len(tokens) > 1:
        out = _phrase_adjacent(seg, field_pos, tids, out)
    return out


def _positions_for(seg, field_pos: int, tid: int, doc: int):
    """Packed (elem << POS_BITS | pos) values of one (field, term, doc)."""
    T = max(seg.num_terms, 1)
    row = field_pos * T + tid
    s, e = int(seg.post_offsets[row]), int(seg.post_offsets[row + 1])
    docs = seg.post_doc_ids[s:e]
    i = np.searchsorted(docs, doc)
    if i >= len(docs) or docs[i] != doc:
        return np.empty(0, np.int64)
    pidx = s + i
    ps, pe = int(seg.pos_offsets[pidx]), int(seg.pos_offsets[pidx + 1])
    return seg.positions[ps:pe].astype(np.int64)


def _phrase_adjacent(seg, field_pos: int, tids: list[int],
                     docs: np.ndarray) -> np.ndarray:
    """Docs where tokens appear at consecutive positions in one element."""
    keep = []
    for doc in docs:
        cur = _positions_for(seg, field_pos, tids[0], int(doc))
        ok = len(cur) > 0
        for tid in tids[1:]:
            if not ok:
                break
            nxt = _positions_for(seg, field_pos, tid, int(doc))
            # packed positions: +1 within the same element is +1 packed
            cur = nxt[np.isin(nxt, cur + 1)]
            ok = len(cur) > 0
        if ok:
            keep.append(int(doc))
    return np.asarray(keep, np.int64)


def string_leaf_mask(seg, f: Field, node: LeafNode,
                     max_candidates: int = 4) -> np.ndarray:
    """Full string-leaf evaluation -> dense bool mask (CONTAINS,
    CONTAINS_PHRASE, EQUALS, arrays with per-value ops, negation)."""
    if node.op in (">", ">=", "<", "<=", "range"):
        # filter.cpp rejects ordering comparators on string fields
        raise BadRequest(f"Error with filter field `{f.name}`: "
                         f"Numerical comparators are not supported for "
                         f"string fields.")
    N = seg.num_docs
    vindex = seg.value_index.get(f.name)
    vops = node.value_ops or [
        {"in": "=", "not_in": "=", "!=": "=", "=": "="}.get(node.op, node.op)
    ] * len(node.values)
    m = np.zeros(N, dtype=bool)
    for v, vop in zip(node.values, vops):
        if vop == "=":
            if vindex is None:
                raise BadRequest(f"Filtering on long-text field `{f.name}` "
                                 f"is not supported.")
            ids = vindex.get(v)
            if ids is not None:
                m[ids] = True
        else:
            ids = string_filter_doc_ids(seg, f, v, vop, max_candidates)
            if len(ids):
                m[ids] = True
    if node.op in ("!=", "not_in") or node.negate:
        return ~m
    return m


def _normalize_numeric_op(node: LeafNode) -> LeafNode:
    """Bare-colon 'contains' is string-only; on numeric/bool fields it means
    equality (filter.cpp numeric parse)."""
    op = node.op
    if op == "contains" or op == "contains_phrase":
        op = "="
    if op == node.op:
        return node
    return LeafNode(node.field_name, op, node.values, node.negate)


def _id_leaf_mask(node: LeafNode, id_resolver, N: int) -> np.ndarray:
    """`id: [...]` filter (filter_result_iterator SEQ_IDS path): resolve doc
    id strings to seq ids via the collection's id map."""
    if id_resolver is None:
        raise BadRequest("Filtering by `id` is only supported through a "
                         "collection search.")
    m = np.zeros(N, dtype=bool)
    for v in node.values:
        seq = id_resolver.get(v)
        if seq is not None and 0 <= seq < N:
            m[seq] = True
    if node.op in ("!=", "not_in") or node.negate:
        return ~m
    return m


# ---------------------------------------------------------------------------
# device evaluation -> resident boolean doc mask (no host round trip)
# ---------------------------------------------------------------------------

class DeviceFilterEvaluator:
    """Evaluates a filter AST directly on device-resident columns so the mask
    never crosses the host boundary (critical: each transfer over the TPU
    link costs a round trip). Numeric/bool/geo leaves are elementwise ops on
    dense columns; multi-valued numerics scatter element-compare results back
    to docs; string equality uploads only the (small) matching doc-id lists
    from the host value index."""

    def __init__(self, engine, join_resolver=None, id_resolver=None,
                 validate_field_names: bool = True,
                 max_filter_by_candidates: int = 4):
        self.engine = engine
        self.seg = engine.seg
        self.fields = None  # set per evaluate() call
        self.join_resolver = join_resolver  # (coll_name, expr) -> numpy bool mask
        self.id_resolver = id_resolver      # doc id string -> seq id (collection)
        self.max_filter_by_candidates = max_filter_by_candidates
        # validate_field_names=false (filter.cpp:497-506): an unknown filter
        # field becomes an ignored leaf matching NOTHING instead of a 404
        self.validate_field_names = validate_field_names

    def evaluate(self, node: FilterNode | None, fields: dict[str, Field]):
        import jax.numpy as jnp
        if node is None:
            return None
        self.fields = fields
        mask = self._eval(node)
        return mask & self.engine._live

    def _eval(self, node: FilterNode):
        if isinstance(node, BoolNode):
            l = self._eval(node.left)
            r = self._eval(node.right)
            return (l & r) if node.op == "&&" else (l | r)
        if isinstance(node, JoinNode):
            import jax.numpy as jnp
            if self.join_resolver is None:
                raise BadRequest(f"Could not find a collection named "
                                 f"`{node.coll_name}` for the reference filter.")
            m = jnp.asarray(self.join_resolver(node.coll_name, node.expr))
            return ~m if node.negate else m
        return self._eval_leaf(node)

    def _eval_leaf(self, node: LeafNode):
        import jax
        import jax.numpy as jnp
        f = self.fields.get(node.field_name)
        if f is None:
            if node.field_name == "id":
                return jnp.asarray(_id_leaf_mask(node, self.id_resolver,
                                                 self.seg.num_docs))
            if not self.validate_field_names:
                return jnp.zeros(self.seg.num_docs, dtype=bool)
            raise NotFound(f"Could not find a filter field named "
                             f"`{node.field_name}` in the schema.")
        eng = self.engine
        N = self.seg.num_docs
        if f.type == "geopolygon":
            return self._eval_geopoly(node, f)
        if f.is_geo:
            return self._eval_geo(node, f)
        if f.is_numeric or f.is_bool:
            node = _normalize_numeric_op(node)
            coerce = FilterEvaluator(self.seg, self.fields)._coerce_num
            if node.op in ("in", "not_in"):
                # per-element comparators: `age: [24, >32]`
                terms = [(vop, coerce(f, s))
                         for vop, s in _numeric_list_terms(node.values)]
            else:
                vals = [coerce(f, s) for s in node.values]

            def cmp_col(col):
                if node.op in ("in", "not_in"):
                    m = jnp.zeros(col.shape, bool)
                    for vop, x in terms:
                        m = m | _cmp_jnp(col, vop, [x])
                    return ~m if node.op == "not_in" else m
                return _cmp_jnp(col, node.op, vals)

            if f.is_array:
                mi = eng._multi_idx.get(f.name)
                if mi is None:
                    return jnp.zeros(N, bool)
                evals = eng.dev.num_multi_vals[mi]
                edocs = eng.dev.num_multi_docs[mi]
                em = cmp_col(evals)
                return jnp.zeros(N, bool).at[edocs].max(em, mode="drop")
            ci = eng._num_col_idx.get(f.name)
            if ci is None:
                return jnp.zeros(N, bool)
            col = eng.dev.num_columns[ci]
            if col.dtype == jnp.float32:
                missing = jnp.isnan(col)
            else:
                missing = col == jnp.iinfo(jnp.int64).min
            return cmp_col(col) & ~missing
        # string field: CONTAINS / CONTAINS_PHRASE / EQUALS resolved on the
        # host posting CSR + value index, uploaded as one mask
        return jnp.asarray(string_leaf_mask(
            self.seg, f, node,
            getattr(self, "max_filter_by_candidates", 4)))

    def _eval_geo(self, node: LeafNode, f: Field):
        # ONE jitted program per shape: the tunnel charges a full remote
        # compile per distinct eager op, so the whole haversine / ray-cast
        # chain must fuse into a single XLA program.
        import jax.numpy as jnp
        eng = self.engine
        N = self.seg.num_docs
        gm = self.seg.geo_multi.get(f.name)
        if gm is not None:
            # geopoint[]: evaluate per ENTRY, any matching point selects
            # the doc (GeoPointArrayFiltering, geo_filtering_old_test.cpp)
            docs_e, coords = gm
            col = jnp.asarray(coords)
        else:
            gi = eng._geo_idx.get(f.name)
            if gi is None:
                return jnp.zeros(N, bool)
            col = eng.dev.geo_columns[gi]
        raw = node.values[0].strip()
        inner = raw[1:-1] if raw.startswith("(") and raw.endswith(")") else raw
        parts = [p.strip() for p in inner.split(",")]
        if len(parts) == 3 and any(u in parts[2] for u in ("km", "mi")):
            lat, lng = float(parts[0]), float(parts[1])
            rs = parts[2]
            radius_m = (float(rs[:-2]) * 1000.0 if rs.endswith("km")
                        else float(rs[:-2]) * 1609.34 if rs.endswith("mi")
                        else float(rs))
            m = _geo_radius_mask(col, jnp.float32(lat), jnp.float32(lng),
                                 jnp.float32(radius_m))
        else:
            coords2 = [float(p) for p in parts]
            if len(coords2) < 6 or len(coords2) % 2:
                raise BadRequest(f"Polygon is not a valid geo shape for field `{f.name}`.")
            poly = np.array(coords2, dtype=np.float32).reshape(-1, 2)
            m = _geo_polygon_mask(col, jnp.asarray(poly))
        if gm is not None:
            return jnp.zeros(N, bool).at[jnp.asarray(docs_e)].max(
                m, mode="drop")
        return m

    def _eval_geopoly(self, node: LeafNode, f: Field):
        """`polyfield:(lat, lng)` -> docs whose stored polygon contains the
        point (GeoPolygonIndex::findContainingPolygonsRecords,
        geopolygon_index.h:15-28) — one jitted ray-cast over all docs."""
        import jax.numpy as jnp
        eng = self.engine
        gi = eng._geopoly_idx.get(f.name)
        if gi is None:
            return jnp.zeros(self.seg.num_docs, bool)
        raw = node.values[0].strip()
        inner = raw[1:-1] if raw.startswith("(") and raw.endswith(")") else raw
        parts = [p.strip() for p in inner.split(",")]
        if len(parts) != 2:
            raise BadRequest(f"Geopolygon filter on `{f.name}` expects (lat, lng).")
        return _point_in_polys_mask(eng.dev.geopoly_verts[gi],
                                    eng.dev.geopoly_counts[gi],
                                    jnp.float32(float(parts[0])),
                                    jnp.float32(float(parts[1])))


def _geo_radius_mask_impl(col, lat, lng, radius_m):
    import jax.numpy as jnp
    lat1 = jnp.radians(col[:, 0])
    lng1 = jnp.radians(col[:, 1])
    lat2 = jnp.radians(lat)
    lng2 = jnp.radians(lng)
    d = 2.0 * EARTH_RADIUS_M * jnp.arcsin(jnp.sqrt(
        jnp.sin((lat2 - lat1) / 2) ** 2 +
        jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin((lng2 - lng1) / 2) ** 2))
    return ~jnp.isnan(col[:, 0]) & (d <= radius_m)


def _geo_polygon_mask_impl(col, poly):
    """Ray casting; poly (V, 2) [lat, lng] is a traced arg so any polygon of
    the same vertex count reuses the compiled program."""
    import jax.numpy as jnp
    from jax import lax
    x, y = col[:, 1], col[:, 0]
    V = poly.shape[0]

    def body(i, inside):
        yi, xi = poly[i, 0], poly[i, 1]
        j = (i - 1) % V
        yj, xj = poly[j, 0], poly[j, 1]
        denom = jnp.where(yj - yi == 0, jnp.float32(1e-12), yj - yi)
        cond = ((yi > y) != (yj > y)) & (x < (xj - xi) * (y - yi) / denom + xi)
        return inside ^ cond

    inside = lax.fori_loop(0, V, body, jnp.zeros(col.shape[0], bool))
    return inside & ~jnp.isnan(col[:, 0])


def _point_in_polys_impl(verts, counts, lat, lng):
    """verts (N, V, 2) [lat,lng]; counts (N,). Ray cast the query point
    against every doc's polygon in one vectorized pass."""
    import jax.numpy as jnp
    N, V, _ = verts.shape
    yi = verts[:, :, 0]
    xi = verts[:, :, 1]
    idx = jnp.arange(V)
    cnt = counts[:, None]
    prev = jnp.where(idx[None, :] == 0, cnt - 1, idx[None, :] - 1)
    prev = jnp.clip(prev, 0, V - 1)
    yj = jnp.take_along_axis(yi, prev, axis=1)
    xj = jnp.take_along_axis(xi, prev, axis=1)
    valid = idx[None, :] < cnt
    denom = jnp.where(yj - yi == 0, jnp.float32(1e-12), yj - yi)
    cond = (((yi > lat) != (yj > lat)) &
            (lng < (xj - xi) * (lat - yi) / denom + xi) & valid)
    crossings = jnp.sum(cond, axis=1)
    return (crossings % 2 == 1) & (counts >= 3)


def _jit_lazy(fn):
    """jax.jit at first call (jax import stays inside functions here)."""
    box = {}

    def wrapper(*args):
        if "f" not in box:
            import jax
            box["f"] = jax.jit(fn)
        return box["f"](*args)
    return wrapper


_geo_radius_mask = _jit_lazy(_geo_radius_mask_impl)
_geo_polygon_mask = _jit_lazy(_geo_polygon_mask_impl)
_point_in_polys_mask = _jit_lazy(_point_in_polys_impl)


_NUM_PREFIX_OPS = (">=", "<=", "!=", ">", "<", "=")


def _numeric_list_terms(vals: list) -> list:
    """[(op, raw_value)] for an in/not_in numeric list — elements may carry
    comparator prefixes (`age: [24, >32]`, collection_filtering_test.cpp
    ComparatorsOnMultiValuedNumericalField)."""
    terms = []
    for v in vals:
        op, s = "=", str(v).strip()
        for p in _NUM_PREFIX_OPS:
            if s.startswith(p):
                op, s = p, s[len(p):].strip()
                break
        terms.append((op, s))
    return terms


def _cmp_jnp(col, op: str, v: list):
    import jax.numpy as jnp
    if op == "=":
        return col == v[0]
    if op == "!=":
        return col != v[0]
    if op == ">":
        return col > v[0]
    if op == ">=":
        return col >= v[0]
    if op == "<":
        return col < v[0]
    if op == "<=":
        return col <= v[0]
    if op == "range":
        return (col >= v[0]) & (col <= v[1])
    if op == "in":
        m = jnp.zeros(col.shape, bool)
        for x in v:
            m = m | (col == x)
        return m
    if op == "not_in":
        m = jnp.ones(col.shape, bool)
        for x in v:
            m = m & (col != x)
        return m
    raise BadRequest("Unsupported numeric filter operator.")


# ---------------------------------------------------------------------------
# host evaluation -> dense doc mask (numpy; used as test oracle & fallback)
# ---------------------------------------------------------------------------

class FilterEvaluator:
    def __init__(self, seg: SegmentArrays, fields: dict[str, Field],
                 id_resolver=None, validate_field_names: bool = True,
                 max_filter_by_candidates: int = 4):
        self.seg = seg
        self.fields = fields
        self.id_resolver = id_resolver
        self.validate_field_names = validate_field_names
        self.max_filter_by_candidates = max_filter_by_candidates

    def evaluate(self, node: FilterNode | None) -> np.ndarray | None:
        if node is None:
            return None
        mask = self._eval(node)
        return mask & self.seg.live

    def _eval(self, node: FilterNode) -> np.ndarray:
        if isinstance(node, BoolNode):
            l = self._eval(node.left)
            r = self._eval(node.right)
            return (l & r) if node.op == "&&" else (l | r)
        return self._eval_leaf(node)

    def _eval_leaf(self, node: LeafNode) -> np.ndarray:
        f = self.fields.get(node.field_name)
        if f is None:
            if node.field_name == "id":
                return self._eval_id(node)
            if not self.validate_field_names:
                return np.zeros(self.seg.num_docs, dtype=bool)
            raise NotFound(f"Could not find a filter field named `{node.field_name}` "
                             f"in the schema.")
        if f.is_geo:
            return self._eval_geo(node, f)
        if f.is_numeric or f.is_bool:
            return self._eval_numeric(node, f)
        return self._eval_string(node, f)

    def _eval_id(self, node: LeafNode) -> np.ndarray:
        return _id_leaf_mask(node, self.id_resolver, self.seg.num_docs)

    def _coerce_num(self, f: Field, s: str):
        if f.is_bool:
            if s.lower() in ("true", "false"):
                return 1 if s.lower() == "true" else 0
            raise BadRequest(f"Value of filter field `{f.name}`: must be `true` or `false`.")
        try:
            return float(s) if f.is_float else int(s)
        except ValueError:
            raise BadRequest(f"Error with filter field `{f.name}`: Numerical value expected.")

    def _numeric_col_mask(self, f: Field, op: str, vals: list) -> np.ndarray:
        N = self.seg.num_docs
        if f.is_array:
            offs, arr = self.seg.num_multi.get(f.name, (None, None))
            if offs is None:
                return np.zeros(N, dtype=bool)
            elem_mask = self._cmp(arr, op, vals, f)
            # any element matches -> doc matches
            hits = np.zeros(N, dtype=bool)
            if elem_mask.any():
                doc_of = np.searchsorted(offs, np.flatnonzero(elem_mask), side="right") - 1
                hits[doc_of] = True
            return hits
        col = self.seg.num_columns.get(f.name)
        if col is None:
            return np.zeros(N, dtype=bool)
        if col.dtype == np.float32:
            missing = np.isnan(col)
        else:
            missing = col == np.iinfo(np.int64).min
        return self._cmp(col, op, vals, f) & ~missing

    def _cmp(self, col: np.ndarray, op: str, vals: list, f: Field) -> np.ndarray:
        if op in ("in", "not_in"):
            # list elements may carry their own comparators:
            # `age: [24, >32]` == (age == 24) || (age > 32)
            # (filter.cpp numeric multi-value parse)
            m = np.zeros(col.shape, dtype=bool)
            for vop, s in _numeric_list_terms(vals):
                m |= self._cmp(col, vop, [s], f)
            return ~m if op == "not_in" else m
        v = [self._coerce_num(f, s) for s in vals]
        if op == "=":
            return col == v[0]
        if op == "!=":
            return col != v[0]
        if op == ">":
            return col > v[0]
        if op == ">=":
            return col >= v[0]
        if op == "<":
            return col < v[0]
        if op == "<=":
            return col <= v[0]
        if op == "range":
            return (col >= v[0]) & (col <= v[1])
        raise BadRequest(f"Unsupported operator on numeric field `{f.name}`.")

    def _eval_numeric(self, node: LeafNode, f: Field) -> np.ndarray:
        node = _normalize_numeric_op(node)
        return self._numeric_col_mask(f, node.op, node.values)

    def _eval_string(self, node: LeafNode, f: Field) -> np.ndarray:
        return string_leaf_mask(self.seg, f, node,
                                self.max_filter_by_candidates)

    def _eval_geo(self, node: LeafNode, f: Field) -> np.ndarray:
        """`loc:(lat, lng, radius km|mi)` or polygon `(lat1, lng1, lat2, ...)`."""
        N = self.seg.num_docs
        gm = self.seg.geo_multi.get(f.name)
        if gm is not None:
            # geopoint[]: evaluate over the ENTRY coords, any matching
            # point selects the doc (GeoPointArrayFiltering)
            docs_e, coords = gm

            class _EntryView:
                num_docs = len(docs_e)
                geo_columns = {f.name: coords}
                geo_multi: dict = {}
            entry_eval = FilterEvaluator.__new__(FilterEvaluator)
            entry_eval.__dict__ = dict(self.__dict__)
            entry_eval.seg = _EntryView()
            em = FilterEvaluator._eval_geo(entry_eval, node, f)
            out = np.zeros(N, dtype=bool)
            np.maximum.at(out, docs_e, em)
            return out
        col = self.seg.geo_columns.get(f.name)
        if col is None:
            return np.zeros(N, dtype=bool)
        raw = node.values[0]
        inner = raw.strip()
        if inner.startswith("(") and inner.endswith(")"):
            inner = inner[1:-1]
        parts = [p.strip() for p in inner.split(",")]
        if len(parts) == 3 and any(u in parts[2] for u in ("km", "mi")):
            lat, lng = float(parts[0]), float(parts[1])
            rs = parts[2]
            if rs.endswith("km"):
                radius_m = float(rs[:-2]) * 1000.0
            elif rs.endswith("mi"):
                radius_m = float(rs[:-2]) * 1609.34
            else:
                radius_m = float(rs)
            lat1 = np.radians(col[:, 0])
            lng1 = np.radians(col[:, 1])
            lat2, lng2 = math.radians(lat), math.radians(lng)
            d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(
                np.sin((lat2 - lat1) / 2) ** 2 +
                np.cos(lat1) * math.cos(lat2) * np.sin((lng2 - lng1) / 2) ** 2))
            return ~np.isnan(col[:, 0]) & (d <= radius_m)
        # polygon: ray casting
        coords = [float(p) for p in parts]
        if len(coords) < 6 or len(coords) % 2:
            raise BadRequest(f"Polygon is not a valid geo shape for field `{f.name}`.")
        poly = np.array(coords, dtype=np.float64).reshape(-1, 2)  # rows: (lat, lng)
        x, y = col[:, 1].astype(np.float64), col[:, 0].astype(np.float64)  # lng, lat
        inside = np.zeros(N, dtype=bool)
        j = len(poly) - 1
        for i in range(len(poly)):
            yi, xi = poly[i]          # lat_i, lng_i
            yj, xj = poly[j]
            denom = np.where(yj - yi == 0, 1e-12, yj - yi)
            cond = ((yi > y) != (yj > y)) & (x < (xj - xi) * (y - yi) / denom + xi)
            inside ^= cond
            j = i
        return inside & ~np.isnan(col[:, 0])
