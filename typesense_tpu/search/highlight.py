"""Search-result highlighting.

Behavior contract: Collection::do_highlighting / highlight_result
(/root/reference/src/collection.cpp:3527, :3338-3430): re-tokenize the stored
field value, mark query-token matches (including prefix matches on the
trailing token), emit a `snippet` (whole value if <= snippet_threshold
tokens, else a window with highlight_affix_num_tokens context) and optional
`value` for highlight_full_fields, plus `matched_tokens`.
"""

from __future__ import annotations

from functools import lru_cache

from typesense_tpu.schema.field import Field
from typesense_tpu.text.tokenizer import Tokenizer


def _edit_distance_le(a: str, b: str, limit: int) -> bool:
    """Myers bit-parallel Levenshtein (highlighting must also mark
    typo-corrected matches — the reference re-tokenizes against the
    CORRECTED query tokens, collection.cpp:3338-3430). Python ints are
    arbitrary-precision, so the bit-vector recurrence needs no word cap;
    ~10 int ops per char of `a` vs the previous DP row's len(b) mins
    (highlighting was ~5.5ms/query of GIL-bound host time at c=16)."""
    if abs(len(a) - len(b)) > limit:
        return False
    if limit <= 0 or a == b:
        return a == b
    m = len(b)
    if m == 0:
        return len(a) <= limit
    peq: dict[str, int] = {}
    for i, c in enumerate(b):
        peq[c] = peq.get(c, 0) | (1 << i)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for c in a:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score <= limit


@lru_cache(maxsize=4096)
def _typo_budget(n: int) -> int:
    if n < 3:
        return 0
    return 1 if n < 7 else 2


class TokenMatcher:
    """Query-token matcher with a memo shared across every value/doc of one
    response — result tokens repeat heavily (456 highlight_doc calls per
    60-query profile shared a few hundred distinct tokens), so per-value
    memos recomputed the same edit distances 10-20x."""

    __slots__ = ("q_tokens", "qset", "last_tok", "budgets", "memo")

    def __init__(self, q_tokens: list[str]):
        self.q_tokens = q_tokens
        self.qset = set(q_tokens)
        self.last_tok = q_tokens[-1] if q_tokens else ""
        self.budgets = [(qt, _typo_budget(len(qt))) for qt in q_tokens]
        self.memo: dict[str, bool] = {}

    def __call__(self, tok: str) -> bool:
        hit = self.memo.get(tok)
        if hit is not None:
            return hit
        ok = tok in self.qset or \
            (bool(self.last_tok) and tok.startswith(self.last_tok))
        if not ok:
            for qt, budget in self.budgets:
                if _edit_distance_le(tok, qt, budget):
                    ok = True
                    break
        self.memo[tok] = ok
        return ok


def _highlight_value(value: str, q_tokens: list[str], field: Field,
                     start_tag: str, end_tag: str, snippet_threshold: int,
                     affix_tokens: int, want_full: bool,
                     is_match: TokenMatcher | None = None):
    toks = Tokenizer(value, locale=field.locale,
                     symbols_to_index=field.symbols_to_index,
                     separators=field.token_separators).tokenize_with_offsets()
    if not toks:
        return None

    if is_match is None:
        is_match = TokenMatcher(q_tokens)

    matched_idx = []
    matched_tokens = []
    for i, (tok, _ti, s, e) in enumerate(toks):
        if is_match(tok):
            matched_idx.append(i)
            matched_tokens.append(tok)
    if not matched_idx:
        return None

    def mark(text: str, tok_entries) -> str:
        out = []
        cursor = 0
        for (tok, _ti, s, e) in tok_entries:
            if is_match(tok):
                out.append(text[cursor:s])
                out.append(start_tag)
                out.append(text[s:e + 1])
                out.append(end_tag)
                cursor = e + 1
        out.append(text[cursor:])
        return "".join(out)

    if len(toks) <= snippet_threshold:
        snippet = mark(value, toks)
    else:
        first, last = matched_idx[0], matched_idx[-1]
        w0 = max(0, first - affix_tokens)
        w1 = min(len(toks) - 1, last + affix_tokens)
        # constrain window span so it doesn't blow up for far-apart matches
        if w1 - w0 > snippet_threshold + 2 * affix_tokens:
            w1 = min(len(toks) - 1, matched_idx[0] + snippet_threshold + affix_tokens)
        s_char = toks[w0][2]
        e_char = toks[w1][3]
        window_toks = [(t, ti, s - s_char, e - s_char) for (t, ti, s, e) in toks
                       if s >= s_char and e <= e_char]
        snippet = mark(value[s_char:e_char + 1], window_toks)

    res = {"matched_tokens": matched_tokens, "snippet": snippet}
    if want_full:
        res["value"] = mark(value, toks)
    return res


def highlight_doc(doc: dict, field_names: list[str], q_tokens: list[str],
                  field_map: dict[str, Field], start_tag: str, end_tag: str,
                  snippet_threshold: int, affix_tokens: int,
                  full_fields: set[str],
                  matcher: TokenMatcher | None = None):
    """Returns (highlight_obj, legacy_highlights_list). Pass one `matcher`
    per response so the typo-match memo spans all hits."""
    highlight: dict = {}
    legacy: list = []
    if matcher is None:
        matcher = TokenMatcher(q_tokens)
    for fname in field_names:
        f = field_map.get(fname)
        if f is None or not f.is_string:
            continue
        raw = doc.get(fname)
        if raw is None:
            continue
        want_full = fname in full_fields
        if isinstance(raw, list):
            entries = [
                _highlight_value(str(v), q_tokens, f, start_tag, end_tag,
                                 snippet_threshold, affix_tokens, want_full,
                                 is_match=matcher)
                for v in raw
            ]
            if any(e is not None for e in entries):
                padded = [e if e is not None else
                          {"matched_tokens": [], "snippet": str(raw[i])}
                          for i, e in enumerate(entries)]
                highlight[fname] = padded
                snippets = [e["snippet"] for e in padded]
                mt = [t for e in padded for t in e["matched_tokens"]]
                indices = [i for i, e in enumerate(entries) if e is not None]
                legacy.append({"field": fname, "indices": indices,
                               "matched_tokens": [e["matched_tokens"] for e in padded
                                                  if e["matched_tokens"]],
                               "snippets": [entries[i]["snippet"] for i in indices]})
        else:
            e = _highlight_value(str(raw), q_tokens, f, start_tag, end_tag,
                                 snippet_threshold, affix_tokens, want_full,
                                 is_match=matcher)
            if e is not None:
                highlight[fname] = e
                legacy.append({"field": fname,
                               "matched_tokens": e["matched_tokens"],
                               "snippet": e["snippet"]})
    return highlight, legacy
