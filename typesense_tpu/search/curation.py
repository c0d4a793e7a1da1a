"""Curation (override) rule matching and dynamic-filter resolution.

Behavior contract: the reference's curation_t + does_curation_match
(src/collection.cpp:871-965) and the dynamic placeholder machinery
(src/index.cpp:2873-3254 resolve_curation / check_for_curations /
process_filter_sort_curations). Placeholder windows bind by host-side
posting intersection over the flat CSR segment (the reference runs a
fuzzy field query per window; our term table + postings give the same
exact-match answer without a device dispatch).
"""

from __future__ import annotations

import re

import numpy as np

_PLACEHOLDER = re.compile(r"\{\s*([A-Za-z0-9_.\-]+)\s*\}")


def normalize_rule_query(q: str) -> str:
    """Lowercase, collapse whitespace, trim spaces inside `{ field }`
    (compute_normalized_query, collection.cpp:1015-1041)."""
    s = re.sub(r"\{\s*", "{", str(q).lower())
    s = re.sub(r"\s*\}", "}", s)
    return " ".join(s.split())


def contains_word(haystack: str, needle: str) -> bool:
    """Word-boundary containment (StringUtils::contains_word)."""
    if not needle:
        return False
    hs = haystack.split()
    ns = needle.split()
    n = len(ns)
    return any(hs[i:i + n] == ns for i in range(len(hs) - n + 1))


def _postings_for(engine, field: str, token: str) -> np.ndarray | None:
    """Doc ids holding `token` in `field` (None when absent)."""
    rows = engine.exact_term_rows(token, [field])
    if rows[0] < 0:
        return None
    starts, ends = engine._row_bounds(rows)
    s, e = int(starts[0]), int(ends[0])
    if e <= s:
        return None
    return engine.seg.post_doc_ids[s:e]


def window_cooccurs(engine, field: str, window: list[str]) -> bool:
    """True when some document contains EVERY window token in `field`
    (check_for_curations narrows fuzzy hits to exact co-occurring matches,
    index.cpp:3230-3246)."""
    acc: np.ndarray | None = None
    for tok in window:
        p = _postings_for(engine, field, tok)
        if p is None:
            return False
        acc = p if acc is None else np.intersect1d(acc, p,
                                                   assume_unique=False)
        if len(acc) == 0:
            return False
    return acc is not None and len(acc) > 0


def bind_placeholder(engine, field: str, tokens: list[str],
                     slide_window: bool
                     ) -> tuple[list[str], list[str]] | None:
    """Longest sub-window of `tokens` whose members co-occur in `field`
    (check_for_curations window loop, index.cpp:3163-3254). With
    slide_window=False only the full window anchored at 0 is tried.
    Returns (window, remaining tokens) — the match consumes the window AND
    drops tokens before it, exactly like the reference's token rewrite
    (index.cpp:3239-3252)."""
    n = len(tokens)
    if n == 0:
        return None
    lens = range(n, 0, -1) if slide_window else (n,)
    for wl in lens:
        starts = range(n - wl + 1) if slide_window else (0,)
        for st in starts:
            window = tokens[st:st + wl]
            if window_cooccurs(engine, field, window):
                wset = set(window)
                remaining = [t for t in tokens[st:] if t not in wset]
                return window, remaining
    return None


def resolve_dynamic_query(engine, rule_tokens: list[str],
                          query_tokens: list[str], exact: bool,
                          known_fields: set[str]) -> tuple[dict, set] | None:
    """Map `{field}` placeholders in rule_tokens onto query token windows
    (resolve_curation, index.cpp:2873-2973). Returns
    ({field: absorbed tokens}, absorbed-token set) or None when the rule
    does not resolve against this query."""
    i = j = 0
    bound: dict[str, list[str]] = {}
    absorbed: set[str] = set()
    resolved = False
    while i < len(rule_tokens):
        m = _PLACEHOLDER.fullmatch(rule_tokens[i])
        if m:
            field_names = [m.group(1)]
            i += 1
            while i < len(rule_tokens):
                m2 = _PLACEHOLDER.fullmatch(rule_tokens[i])
                if not m2:
                    break
                field_names.append(m2.group(1))
                i += 1
            matched: list[str] = []
            while j < len(query_tokens) and (
                    i == len(rule_tokens)
                    or rule_tokens[i] != query_tokens[j]):
                matched.append(query_tokens[j])
                j += 1
            resolved = True
            for fi, fname in enumerate(field_names):
                if fname not in known_fields:
                    return None
                res = bind_placeholder(engine, fname, matched,
                                       slide_window=(fi == 0))
                if res is None:
                    return None
                window, matched = res
                bound[fname] = window
                absorbed.update(window)
        else:
            while j < len(query_tokens) and \
                    query_tokens[j] != rule_tokens[i]:
                if exact:
                    return None
                j += 1
            if j == len(query_tokens):
                return None
            i += 1
            j += 1
    if not resolved:
        return None
    if exact:
        # exact rules must account for every query token: each is either a
        # literal rule token or absorbed by a placeholder
        literals = {t for t in rule_tokens
                    if not _PLACEHOLDER.fullmatch(t)}
        for t in query_tokens:
            if t not in absorbed and t not in literals:
                return None
    return bound, absorbed


def substitute_placeholders(clause: str, bound: dict) -> str:
    out = clause
    for fname, toks in bound.items():
        out = out.replace("{" + fname + "}", " ".join(toks))
    return re.sub(r"\{\s*[A-Za-z0-9_.\-]+\s*\}", "", out).strip()


def remove_matched_tokens(tokens: list[str], matched: set[str]) -> list[str]:
    """Strip absorbed/rule tokens; empty result degrades to wildcard
    (Index::remove_matched_tokens, index.cpp:3140-3154)."""
    kept = [t for t in tokens if t not in matched]
    return kept if kept else ["*"]
