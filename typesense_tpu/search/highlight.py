"""Search-result highlighting.

Behavior contract: Collection::do_highlighting / highlight_result
(/root/reference/src/collection.cpp:3527, :3338-3430): re-tokenize the stored
field value, mark query-token matches (including prefix matches on the
trailing token), emit a `snippet` (whole value if <= snippet_threshold
tokens, else a window with highlight_affix_num_tokens context) and optional
`value` for highlight_full_fields, plus `matched_tokens`.
"""

from __future__ import annotations

from typesense_tpu.schema.field import Field
from typesense_tpu.text.tokenizer import Tokenizer


def _highlight_value(value: str, q_tokens: list[str], field: Field,
                     start_tag: str, end_tag: str, snippet_threshold: int,
                     affix_tokens: int, want_full: bool):
    toks = Tokenizer(value, locale=field.locale,
                     symbols_to_index=field.symbols_to_index,
                     separators=field.token_separators).tokenize_with_offsets()
    if not toks:
        return None

    qset = set(q_tokens)
    last_tok = q_tokens[-1] if q_tokens else ""
    matched_idx = []
    matched_tokens = []
    for i, (tok, _ti, s, e) in enumerate(toks):
        if tok in qset or (last_tok and tok.startswith(last_tok)):
            matched_idx.append(i)
            matched_tokens.append(tok)
    if not matched_idx:
        return None

    def mark(text: str, tok_entries) -> str:
        out = []
        cursor = 0
        for (tok, _ti, s, e) in tok_entries:
            if tok in qset or (last_tok and tok.startswith(last_tok)):
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
                  full_fields: set[str]):
    """Returns (highlight_obj, legacy_highlights_list)."""
    highlight: dict = {}
    legacy: list = []
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
                                 snippet_threshold, affix_tokens, want_full)
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
                                 snippet_threshold, affix_tokens, want_full)
            if e is not None:
                highlight[fname] = e
                legacy.append({"field": fname,
                               "matched_tokens": e["matched_tokens"],
                               "snippet": e["snippet"]})
    return highlight, legacy
