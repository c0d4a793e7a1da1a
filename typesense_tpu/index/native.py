"""ctypes bindings for the native index-build accumulator (native/builder.cpp).

Compiled on first use (g++ -O3). Falls back to the pure-Python path in
builder.py if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "builder.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libtsbuild.so")


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.SubprocessError):
            return None
        lib.ts_builder_new.restype = ctypes.c_void_p
        lib.ts_builder_new.argtypes = [ctypes.c_int, ctypes.c_int64]
        lib.ts_builder_free.argtypes = [ctypes.c_void_p]
        lib.ts_builder_add_value.restype = ctypes.c_int
        lib.ts_builder_add_value.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_int]
        lib.ts_builder_add_token.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int32, ctypes.c_int]
        lib.ts_builder_add_values_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.ts_builder_bump_count.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_int]
        lib.ts_builder_finalize.argtypes = [ctypes.c_void_p]
        for name in ("num_terms", "num_postings", "num_positions"):
            getattr(lib, f"ts_builder_{name}").restype = ctypes.c_int64
            getattr(lib, f"ts_builder_{name}").argtypes = [ctypes.c_void_p]
        for name, ct in (("term_chars", ctypes.c_uint8),
                         ("term_lens", ctypes.c_int32),
                         ("post_offsets", ctypes.c_int64),
                         ("post_doc_ids", ctypes.c_int32),
                         ("post_flags", ctypes.c_uint8),
                         ("pos_offsets", ctypes.c_int64),
                         ("positions", ctypes.c_int32),
                         ("term_freqs", ctypes.c_int32),
                         ("field_token_counts", ctypes.c_int64)):
            fn = getattr(lib, f"ts_builder_{name}")
            fn.restype = ctypes.POINTER(ct)
            fn.argtypes = [ctypes.c_void_p]
        lib.ts_builder_export_terms.restype = ctypes.c_int64
        lib.ts_builder_export_terms.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _lib = lib
        return _lib


class NativeBuilder:
    def __init__(self, num_fields: int, num_docs: int):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native builder unavailable")
        self.h = self.lib.ts_builder_new(num_fields, num_docs)
        self.num_fields = max(num_fields, 1)
        self.num_docs = num_docs

    def add_value(self, field: int, doc: int, elem: int, text: str) -> int:
        return self.lib.ts_builder_add_value(
            self.h, field, doc, elem, text.encode("ascii"), len(text))

    def add_values_batch(self, field: int, docs: list[int], elems: list[int],
                         values: list[str]):
        """One ctypes crossing for a whole chunk of ASCII values."""
        n = len(values)
        blob = "".join(values).encode("ascii")
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.fromiter(map(len, values), dtype=np.int64, count=n),
                  out=offsets[1:])
        d = np.asarray(docs, dtype=np.int32)
        e = np.asarray(elems, dtype=np.int32)
        self.lib.ts_builder_add_values_batch(
            self.h, field, d.ctypes.data, e.ctypes.data, blob,
            offsets.ctypes.data, n)

    def add_token(self, field: int, doc: int, token: str, packed_pos: int,
                  last: bool):
        b = token.encode("utf-8")
        self.lib.ts_builder_add_token(self.h, field, doc, b, len(b),
                                      packed_pos, 1 if last else 0)

    def bump_count(self, field: int, doc: int, n: int):
        self.lib.ts_builder_bump_count(self.h, field, doc, n)

    def finalize(self):
        lib, h = self.lib, self.h
        lib.ts_builder_finalize(h)
        T = lib.ts_builder_num_terms(h)
        Tp = max(T, 1)
        P = max(lib.ts_builder_num_postings(h), 1)
        PP = max(lib.ts_builder_num_positions(h), 1)
        F = self.num_fields

        def arr(fn, n, dtype):
            ptr = fn(h)
            return np.ctypeslib.as_array(ptr, shape=(n,)).copy().astype(dtype, copy=False)

        out = {
            "num_terms": int(T),
            "term_chars": arr(lib.ts_builder_term_chars, Tp * 32, np.uint8).reshape(Tp, 32),
            "term_lens": arr(lib.ts_builder_term_lens, Tp, np.int32),
            "post_offsets": arr(lib.ts_builder_post_offsets, F * Tp + 1, np.int64),
            "post_doc_ids": arr(lib.ts_builder_post_doc_ids, P, np.int32),
            "post_flags": arr(lib.ts_builder_post_flags, P, np.uint8),
            "pos_offsets": arr(lib.ts_builder_pos_offsets, P + 1, np.int64),
            "positions": arr(lib.ts_builder_positions, PP, np.int32),
            "term_freqs": arr(lib.ts_builder_term_freqs, Tp, np.int32),
            "field_token_counts": arr(lib.ts_builder_field_token_counts,
                                      self.num_docs * F, np.int64
                                      ).reshape(self.num_docs, F).astype(np.int32),
        }
        blob = ctypes.create_string_buffer(int(T) * 32)
        lib.ts_builder_export_terms(h, blob)
        lens = out["term_lens"][:T]
        terms = []
        off = 0
        raw = blob.raw
        for l in lens:
            terms.append(raw[off:off + l].decode("utf-8", errors="replace"))
            off += l
        out["terms"] = terms
        return out

    def __del__(self):
        try:
            if self.lib is not None and self.h:
                self.lib.ts_builder_free(self.h)
                self.h = None
        except Exception:  # noqa: BLE001
            pass
