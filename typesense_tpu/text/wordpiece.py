"""BERT WordPiece tokenization (pure Python, no external deps).

Reference contract: /root/reference/include/text_embedder_tokenizer.h (the
reference links HF-compatible tokenizers through onnxruntime-extensions);
this implements the same two-stage algorithm as
transformers.BertTokenizer: a basic tokenizer (clean, lowercase + accent
strip, CJK spacing, punctuation split) followed by greedy longest-match
WordPiece with "##" continuations. Parity vs transformers.BertTokenizer is
asserted in tests/test_embed_convert.py.
"""

from __future__ import annotations

import unicodedata

import numpy as np


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or \
            (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF) or
            (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F) or
            (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF) or
            (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def basic_tokenize(text: str, lower: bool = True) -> list[str]:
    """transformers BasicTokenizer: clean control chars, space CJK chars,
    optional lowercase + accent strip, split punctuation into single-char
    tokens."""
    out_chars = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc", "Cf"):
            continue
        if _is_cjk(ch):
            out_chars.append(f" {ch} ")
        elif ch.isspace():
            out_chars.append(" ")
        else:
            out_chars.append(ch)
    tokens = []
    for tok in "".join(out_chars).split():
        if lower:
            tok = tok.lower()
            tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                          if unicodedata.category(c) != "Mn")
        # split punctuation
        cur = []
        for ch in tok:
            if _is_punct(ch):
                if cur:
                    tokens.append("".join(cur))
                    cur = []
                tokens.append(ch)
            else:
                cur.append(ch)
        if cur:
            tokens.append("".join(cur))
    return tokens


def wordpiece_split(token: str, vocab: dict[str, int],
                    unk: str = "[UNK]", max_chars: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece of one basic token."""
    if len(token) > max_chars:
        return [unk]
    pieces = []
    start = 0
    while start < len(token):
        end = len(token)
        piece = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [unk]
        pieces.append(piece)
        start = end
    return pieces


class WordPieceTokenizer:
    """vocab: token -> id (BertTokenizer-compatible vocab.txt ordering)."""

    def __init__(self, vocab: dict[str, int], lower: bool = True,
                 max_len: int = 128):
        self.vocab = vocab
        self.lower = lower
        self.max_len = max_len
        self.cls_id = vocab.get("[CLS]", 101)
        self.sep_id = vocab.get("[SEP]", 102)
        self.pad_id = vocab.get("[PAD]", 0)
        self.unk = "[UNK]"

    @classmethod
    def from_lines(cls, lines: list[str], lower: bool = True,
                   max_len: int = 128) -> "WordPieceTokenizer":
        return cls({tok: i for i, tok in enumerate(lines)}, lower, max_len)

    def tokenize(self, text: str) -> list[str]:
        pieces = []
        for tok in basic_tokenize(text, self.lower):
            pieces.extend(wordpiece_split(tok, self.vocab, self.unk))
        return pieces

    def encode(self, text: str) -> np.ndarray:
        """[CLS] pieces [SEP], padded to max_len with [PAD]."""
        ids = [self.cls_id]
        for piece in self.tokenize(text)[:self.max_len - 2]:
            ids.append(self.vocab.get(piece, self.vocab.get(self.unk, 100)))
        ids.append(self.sep_id)
        out = np.full(self.max_len, self.pad_id, dtype=np.int32)
        out[:len(ids)] = ids[:self.max_len]
        return out
