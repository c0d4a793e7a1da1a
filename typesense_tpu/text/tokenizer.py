"""Locale-aware tokenizer with Typesense-parity normalization.

Behavior contract: /root/reference/src/tokenizer.cpp.
- ASCII fast path (tokenizer.cpp:232-289): chars are classified INDEX
  (alnum or in symbols_to_index), SEPARATE (space/newline or in token_separators)
  or SKIP (everything else, dropped). INDEX chars accumulate lowercased; a
  SEPARATE char emits the pending token.
- Non-ASCII (tokenizer.cpp:291-341): bytes are grouped into a UTF-8 codepoint and
  transliterated to ASCII (iconv ASCII//TRANSLIT); if transliteration succeeds the
  alnum ASCII chars are kept lowercased; otherwise the original codepoint is kept
  verbatim inside the token.
- Locales with word tokenizers (zh/ja/ko/th/cyrillic, tokenizer.cpp:110-216) use
  ICU BreakIterator; we approximate with per-codepoint segmentation for CJK and
  standard behavior elsewhere (PyICU is not available in this environment).

This runs on the host as part of the index-build / query pipeline; the device
kernels only ever see integer term ids.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# Transliteration cache: codepoint -> ascii string or None (keep original)
@lru_cache(maxsize=65536)
def _translit(ch: str) -> str | None:
    """ASCII//TRANSLIT equivalent: NFKD-decompose and strip combining marks.

    Returns the ASCII transliteration, or None when the char has no ASCII
    representation (iconv EILSEQ path, tokenizer.cpp:322-324).
    """
    decomposed = unicodedata.normalize("NFKD", ch)
    out = []
    for c in decomposed:
        if unicodedata.combining(c):
            continue
        if ord(c) < 128:
            out.append(c)
        else:
            return None
    if not out:
        return None
    return "".join(out)


_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x3040, 0x30FF),  # CJK + kana
    (0xAC00, 0xD7AF),  # hangul syllables
    (0x0E00, 0x0E7F),  # thai
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_hangul(ch: str) -> bool:
    return 0xAC00 <= ord(ch) <= 0xD7AF


def is_cyrillic_locale(locale: str) -> bool:
    # tokenizer.cpp:379-382
    return locale in ("el", "bg", "ru", "sr", "uk", "be")


class Tokenizer:
    """Streaming tokenizer; construct per (text, options) and call tokenize()."""

    def __init__(self, text: str, normalize: bool = True, no_op: bool = False,
                 locale: str = "", symbols_to_index: list[str] | None = None,
                 separators: list[str] | None = None, stemmer=None):
        self.text = text
        self.normalize = normalize
        self.no_op = no_op
        self.locale = locale
        self.index_symbols = frozenset(symbols_to_index or ())
        self.separator_symbols = frozenset(separators or ())
        self.stemmer = stemmer

    # stream modes (tokenizer.h:54-58)
    def _mode(self, c: str) -> int:
        if c.isascii() and (c.isalnum() or c in self.index_symbols):
            return 0  # INDEX
        if c in (" ", "\n") or c in self.separator_symbols:
            return 1  # SEPARATE
        return 2      # SKIP

    def tokenize(self) -> list[str]:
        toks = [t for t, _, _, _ in self.tokenize_with_offsets()]
        return toks

    def tokenize_with_offsets(self) -> list[tuple[str, int, int, int]]:
        """Returns [(token, token_index, start_char, end_char)] like Tokenizer::next."""
        if self.no_op:
            return [(self.text, 0, 0, max(0, len(self.text) - 1))] if self.text else []

        text = self.text
        use_word_breaks = self.locale and self.locale not in ("en", "de_en")
        if use_word_breaks:
            return self._tokenize_locale(text)

        out: list[str] = []
        results: list[tuple[str, int, int, int]] = []
        start_index = 0
        token_counter = 0
        i = 0
        n = len(text)
        while i < n:
            c = text[i]
            if c.isascii():
                mode = self._mode(c)
                if mode == 2:  # SKIP
                    i += 1
                    continue
                if mode == 1:  # SEPARATE
                    if not out:
                        i += 1
                        continue
                    token = "".join(out)
                    if self.stemmer is not None:
                        token = self.stemmer.stem(token)
                    results.append((token, token_counter, start_index, i - 1))
                    token_counter += 1
                    out = []
                    i += 1
                    continue
                # INDEX
                if not out:
                    start_index = i
                out.append(c.lower() if self.normalize else c)
                i += 1
                continue

            # non-ASCII codepoint
            if not out:
                start_index = i
            if not self.normalize:
                out.append(c)
                i += 1
                continue
            ascii_form = _translit(c)
            if ascii_form is None:
                out.append(c)
            else:
                for oc in ascii_form:
                    if oc.isalnum():
                        out.append(oc.lower())
            i += 1

        if out:
            token = "".join(out)
            if self.stemmer is not None:
                token = self.stemmer.stem(token)
            if token:
                results.append((token, token_counter, start_index, n - 1))
        return results

    def _tokenize_locale(self, text: str) -> list[tuple[str, int, int, int]]:
        """Word-breaking locales — the ICU BreakIterator equivalent
        (tokenizer.cpp:110-216) without ICU:

        - Han / Kana / Thai runs segment into OVERLAPPING BIGRAMS (the
          dictionary-free standard used by Lucene's CJKAnalyzer): a query's
          bigrams AND-match any text containing the query as a substring,
          and adjacent bigrams keep proximity ranking meaningful. Length-1
          runs emit the single char, so single-char words stay findable
          (longer single-char queries fall back to prefix matching over the
          bigram table).
        - Hangul runs stay whole words (Korean is space-delimited; ICU
          word breaks coincide with the runs), NFKD-normalized like the
          reference's jamo handling.
        - Other word chars group into runs; cyrillic locales transliterate.
        """
        results: list[tuple[str, int, int, int]] = []
        token_counter = 0
        buf: list[str] = []
        start = 0

        def flush(end_idx: int):
            nonlocal token_counter, buf
            if buf:
                word = "".join(buf)
                if self.stemmer is not None and not is_cyrillic_locale(self.locale):
                    word = self.stemmer.stem(word)
                results.append((word, token_counter, start, end_idx))
                token_counter += 1
                buf = []

        def norm_cjk(ch: str) -> str:
            if self.locale == "ko" or _is_hangul(ch):
                return unicodedata.normalize("NFKD", ch)
            if self.locale == "th":
                return unicodedata.normalize("NFKC", ch)
            return ch

        def emit_run(run: str, run_start: int):
            nonlocal token_counter
            if not run:
                return
            if self.locale == "ja" and not _is_hangul(run[0]):
                # kakasi-style romanization (japanese_localizer.h): units =
                # kanji readings + kana subruns; index unit pairs (the
                # romaji analogue of the bigram scheme) so kana whole-word
                # queries match kanji docs and vice versa
                from typesense_tpu.text.japanese import ja_units
                units = ja_units(run)
                if len(units) == 1:
                    results.append((units[0], token_counter, run_start,
                                    run_start + len(run) - 1))
                    token_counter += 1
                else:
                    for j in range(len(units) - 1):
                        results.append((units[j] + units[j + 1],
                                        token_counter,
                                        run_start + j,
                                        min(run_start + j + 1,
                                            run_start + len(run) - 1)))
                        token_counter += 1
                return
            if self.locale == "th" and 0x0E00 <= ord(run[0]) <= 0x0E7F:
                # dictionary maximal-match segmentation (ICU dictionary
                # BreakIterator equivalent, tokenizer.h:31)
                from typesense_tpu.text.thai import segment_thai
                pos = run_start
                for word in segment_thai(
                        unicodedata.normalize("NFKC", run)):
                    results.append((word, token_counter, pos,
                                    min(pos + len(word) - 1,
                                        run_start + len(run) - 1)))
                    token_counter += 1
                    pos = min(pos + len(word), run_start + len(run) - 1)
                return
            if _is_hangul(run[0]):
                # whole-word hangul token
                results.append(("".join(norm_cjk(c) for c in run),
                                token_counter, run_start,
                                run_start + len(run) - 1))
                token_counter += 1
            elif len(run) == 1:
                results.append((norm_cjk(run), token_counter, run_start,
                                run_start))
                token_counter += 1
            else:
                for j in range(len(run) - 1):
                    big = norm_cjk(run[j]) + norm_cjk(run[j + 1])
                    results.append((big, token_counter, run_start + j,
                                    run_start + j + 1))
                    token_counter += 1

        i = 0
        n = len(text)
        while i < n:
            ch = text[i]
            if _is_cjk(ch):
                flush(i - 1)
                hangul = _is_hangul(ch)
                j = i
                while j < n and _is_cjk(text[j]) and \
                        _is_hangul(text[j]) == hangul:
                    j += 1
                emit_run(text[i:j], i)
                start = j
                i = j
                continue
            if ch.isalnum():
                if not buf:
                    start = i
                if is_cyrillic_locale(self.locale) and self.normalize:
                    ascii_form = _translit(ch)
                    buf.append(ascii_form.lower() if ascii_form else ch.lower())
                else:
                    buf.append(ch.lower() if self.normalize else ch)
            else:
                flush(i - 1)
            i += 1
        flush(len(text) - 1)
        return results


def tokenize(text: str, locale: str = "", symbols_to_index: list[str] | None = None,
             separators: list[str] | None = None, stemmer=None) -> list[str]:
    return Tokenizer(text, locale=locale, symbols_to_index=symbols_to_index,
                     separators=separators, stemmer=stemmer).tokenize()
