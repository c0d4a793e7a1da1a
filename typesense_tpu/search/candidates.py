"""Query-token candidate sets: exact, prefix, and (fuzzy) typo candidates.

Reference contract: art_fuzzy_search (/root/reference/src/art.cpp:1745) with
cost bands from Index::get_bounded_typo_cost (token length gates: len<3 -> 0
typos, len<7 -> 1, else up to 2; index.h), prefix mode on the trailing token,
and max_candidates frequency-ranked expansion (collection.h:928 default 4,
exhaustive_search -> 10,000).

TPU design: the term table is lexicographically sorted, so prefix expansion
is a host bisect to an id range, frequency-ranked with numpy. Typo candidates
come from the batched Levenshtein kernel (ops/fuzzy.py) scanning the whole
term table at once — the flattened equivalent of the ART fuzzy DP traversal.
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

DEFAULT_MAX_CANDIDATES = 4
TYPO_POSTINGS_BUDGET = 100_000  # max postings a typo expansion may add per token
EXHAUSTIVE_MAX_CANDIDATES = 10000


def bounded_typo_cost(max_cost: int, token_len: int,
                      min_len_1typo: int = 4, min_len_2typo: int = 7,
                      token: str = "",
                      enable_typos_for_numerical_tokens: bool = True,
                      enable_typos_for_alpha_numerical_tokens: bool = True,
                      ) -> int:
    """Index::get_bounded_typo_cost (index.cpp): short tokens get fewer
    typos; numeric / non-alphanumeric tokens can opt out of typos."""
    if not enable_typos_for_alpha_numerical_tokens and             any(not ch.isalnum() for ch in token):
        return 0
    if not enable_typos_for_numerical_tokens and token.isdigit() and token:
        return 0
    if token_len < min_len_1typo:
        return 0
    if token_len < min_len_2typo:
        return min(max_cost, 1)
    return min(max_cost, 2)


def _sorted_terms(engine) -> list[str]:
    terms = getattr(engine, "_terms_sorted", None)
    if terms is None:
        terms = sorted(engine.seg.term_to_id)
        engine._terms_sorted = terms
    return terms


def prefix_candidates(engine, token: str, max_candidates: int,
                      rank_scores: np.ndarray | None = None,
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Term-id range covering `token*`, capped by rank — doc frequency by
    default, or the per-term max default-sorting-field column when
    rank_tokens_by=DEFAULT_SORTING_FIELD supplies `rank_scores`
    (art.h:143-148 leaf ordering)."""
    terms = _sorted_terms(engine)
    lo = bisect_left(terms, token)
    hi = bisect_left(terms, token + "￿")
    if hi <= lo:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.arange(lo, hi, dtype=np.int64)
    freqs = (rank_scores[lo:hi] if rank_scores is not None
             else engine.seg.term_doc_freq[lo:hi])
    if len(ids) > max_candidates:
        top = np.argpartition(-freqs, max_candidates - 1)[:max_candidates]
        # keep the exact token (== lo when present) if it made the range
        if terms[lo] == token and lo not in ids[top]:
            top[-1] = 0
        ids = ids[top]
    costs = np.zeros(len(ids), dtype=np.int64)
    return ids, costs


def token_candidate_sets(engine, tokens: list[str], field_names: list[str],
                         num_typos: list[int], prefixes: list[bool],
                         max_candidates: int, typo_tokens_threshold: int,
                         found_so_far: int = 0,
                         exact_only: list[bool] | None = None,
                         memo: dict | None = None,
                         typo_tokens: list[bool] | None = None,
                         typo_opts: tuple = (4, 7, True, True),
                         rank_scores: np.ndarray | None = None,
                         ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per query token -> (term_ids, typo_costs). The last token is treated
    as a prefix when `prefix` is enabled (instant-search semantics).
    exact_only marks phrase/excluded tokens (no prefix/typo expansion).
    memo: per-search cache keyed by (token, is_last) so drop_tokens retries
    reuse candidate sets instead of re-dispatching the fuzzy kernel.
    typo_tokens: per-token gate for fuzzy expansion — the caller stages
    expansion like the reference's ascending cost-combination loop
    (index.cpp:4860-4870): first no typos, then typos only on tokens with no
    cost-0 candidates, then everywhere, stopping as soon as found >=
    typo_tokens_threshold. None = every eligible token (legacy callers)."""
    if max_candidates <= 0:
        max_candidates = DEFAULT_MAX_CANDIDATES
    prefix_on = prefixes[0] if prefixes else True
    max_typos = num_typos[0] if num_typos else 2

    partial: list = []
    fuzzy_req: list[tuple[int, str, int, bool]] = []  # (token_idx, tok, budget, prefix)
    memo_keys: list = []
    for ti, tok in enumerate(tokens):
        strict = bool(exact_only[ti]) if exact_only else False
        is_last = ti == len(tokens) - 1 and not strict
        typo_ok = typo_tokens[ti] if typo_tokens is not None else True
        mkey = (tok, is_last and prefix_on, strict, typo_ok)
        memo_keys.append(mkey)
        if memo is not None and mkey in memo:
            partial.append(None)  # filled from memo at the end
            continue
        from typesense_tpu.index.artifacts import MAX_TERM_LEN
        exact_id = engine.seg.term_to_id.get(tok[:MAX_TERM_LEN], -1)
        ids: list[int] = []
        costs: list[int] = []
        kinds: list[int] = []          # 0 exact, 1 prefix, 2 typo
        if exact_id >= 0:
            ids.append(exact_id)
            costs.append(0)
            kinds.append(0)
        if strict:
            partial.append((ids, costs, kinds))
            continue

        if is_last and prefix_on:
            pids, pcosts = prefix_candidates(engine, tok, max_candidates,
                                             rank_scores=rank_scores)
            for pid, pc in zip(pids, pcosts):
                if pid != exact_id:
                    ids.append(int(pid))
                    # next_suggestion2 (index.cpp:7234): actual_cost =
                    # 2*typo_cost + is_prefix_searched — a strict prefix
                    # extension ranks below the verbatim token
                    costs.append(2 * int(pc) + 1)
                    kinds.append(1)

        cost_budget = bounded_typo_cost(max_typos, len(tok), typo_opts[0],
                                        typo_opts[1], tok, typo_opts[2],
                                        typo_opts[3])
        if cost_budget > 0 and typo_ok:
            fuzzy_req.append((ti, tok, cost_budget, is_last and prefix_on))
        partial.append((ids, costs, kinds))

    if fuzzy_req:
        # ONE batched device call for every token needing typo expansion
        from typesense_tpu.ops.fuzzy import fuzzy_candidates_batch
        results = fuzzy_candidates_batch(
            engine, [(tok, b, p) for _, tok, b, p in fuzzy_req], max_candidates)
        for (ti, _tok, _b, _p), (fids, fcosts) in zip(fuzzy_req, results):
            ids, costs, kinds = partial[ti]
            if rank_scores is not None and len(fids):
                # MAX_SCORE leaf ordering: within a typo-cost band prefer
                # the term whose best doc sorts highest, not the most
                # frequent one (art.h:143-148)
                fids = np.asarray(fids, dtype=np.int64)
                fcosts = np.asarray(fcosts, dtype=np.int64)
                order = np.lexsort((-rank_scores[fids], fcosts))
                fids, fcosts = fids[order], fcosts[order]
            seen = set(ids)
            # bound the scan work a typo expansion can trigger: take
            # candidates in the kernel's (cost, frequency) order until the
            # posting budget is spent (the reference bounds the equivalent
            # blast radius via its 10/10,000 cost-combination caps,
            # index.cpp:4860-4870)
            budget = TYPO_POSTINGS_BUDGET
            terms = _sorted_terms(engine)
            tok_len = len(_tok)
            for fid, fc in zip(fids, fcosts):
                fid = int(fid)
                if fid in seen:
                    continue
                row_len = int(engine.seg.term_doc_freq[fid])
                if ids and budget - row_len < 0:
                    continue
                budget -= row_len
                ids.append(fid)
                # next_suggestion2 (index.cpp:7230-7236): 2*typo_cost plus
                # 1 when the candidate extends past the token's typo reach
                # (found via prefix traversal)
                pfx = 1 if (_p and len(terms[fid]) > tok_len + int(fc)) \
                    else 0
                costs.append(2 * int(fc) + pfx)
                kinds.append(2)

    out = []
    for mkey, entry in zip(memo_keys, partial):
        if entry is None:
            out.append(memo[mkey])
            continue
        ids, costs, kinds = entry
        trio = (np.asarray(ids, dtype=np.int64),
                np.asarray(costs, dtype=np.int64),
                np.asarray(kinds, dtype=np.int64))
        if memo is not None:
            memo[mkey] = trio
        out.append(trio)
    return out
