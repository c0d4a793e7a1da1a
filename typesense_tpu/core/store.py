"""Durable key-value store: the RocksDB-equivalent host layer.

Behavior contract: /root/reference/include/store.h:54-118 (Store class:
insert/get/remove/scan/batch_write/create_check_point/reload, prefix
iteration) and its role in SURVEY.md §5 (checkpoint of record; in-memory
indices are derived state rebuilt on boot).

Design: log-structured — an in-memory dict + append-only WAL (JSON lines,
fsync'd per batch), compacted into a snapshot file when the WAL grows past a
threshold. Crash recovery replays snapshot + WAL, tolerating a torn final
record. This favors the engine's access pattern: point gets on the read path
(doc hydration) and sequential batch writes on the import path.
"""

from __future__ import annotations

import json
import os
import threading

_TOMBSTONE = None  # deletions recorded as null values in the WAL


class StoreStatus:
    OK = "ok"
    NOT_FOUND = "not_found"
    ERROR = "error"


class Store:
    def __init__(self, path: str, wal_compact_bytes: int = 256 * 1024 * 1024,
                 fsync: bool = False):
        self.path = path
        self.wal_compact_bytes = wal_compact_bytes
        self.fsync = fsync
        self._lock = threading.RLock()
        self._data: dict[str, str] = {}
        self._wal = None
        os.makedirs(path, exist_ok=True)
        self._load()

    # --- paths ---
    @property
    def _snap_path(self) -> str:
        return os.path.join(self.path, "snapshot.json")

    @property
    def _wal_path(self) -> str:
        return os.path.join(self.path, "wal.jsonl")

    # --- recovery ---
    def _load(self):
        self._data = {}
        if os.path.exists(self._snap_path):
            with open(self._snap_path, "r", encoding="utf-8") as f:
                self._data = json.load(f)
        if os.path.exists(self._wal_path):
            with open(self._wal_path, "r", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        break  # torn tail record from a crash — stop replay
                    k, v = rec["k"], rec["v"]
                    if v is _TOMBSTONE:
                        self._data.pop(k, None)
                    else:
                        self._data[k] = v
        self._wal = open(self._wal_path, "a", encoding="utf-8")

    def _append(self, records: list[tuple[str, str | None]]):
        buf = "".join(json.dumps({"k": k, "v": v}, ensure_ascii=False) + "\n"
                      for k, v in records)
        self._wal.write(buf)
        self._wal.flush()
        if self.fsync:
            os.fsync(self._wal.fileno())
        if self._wal.tell() > self.wal_compact_bytes:
            self._compact_locked()

    # --- public API (store.h:84-118) ---
    def insert(self, key: str, value: str) -> bool:
        with self._lock:
            self._data[key] = value
            self._append([(key, value)])
        return True

    def batch_write(self, puts: dict[str, str], deletes: list[str] | None = None) -> bool:
        with self._lock:
            recs: list[tuple[str, str | None]] = []
            for k, v in puts.items():
                self._data[k] = v
                recs.append((k, v))
            for k in deletes or ():
                self._data.pop(k, None)
                recs.append((k, _TOMBSTONE))
            self._append(recs)
        return True

    def contains(self, key: str) -> bool:
        with self._lock:
            return key in self._data

    def get(self, key: str) -> str | None:
        with self._lock:
            return self._data.get(key)

    def remove(self, key: str) -> bool:
        with self._lock:
            existed = self._data.pop(key, None) is not None
            self._append([(key, _TOMBSTONE)])
        return existed

    def scan(self, prefix: str, end: str | None = None) -> list[tuple[str, str]]:
        """Sorted (key, value) pairs with key starting with `prefix` (scan_fill)."""
        with self._lock:
            keys = sorted(k for k in self._data
                          if k.startswith(prefix) and (end is None or k < end))
            return [(k, self._data[k]) for k in keys]

    def get_prefix_count(self, prefix: str) -> int:
        with self._lock:
            return sum(1 for k in self._data if k.startswith(prefix))

    def delete_range(self, begin: str, end: str):
        with self._lock:
            doomed = [k for k in self._data if begin <= k < end]
            for k in doomed:
                self._data.pop(k)
            if doomed:
                self._append([(k, _TOMBSTONE) for k in doomed])

    # --- checkpoint / restore (store.h create_check_point/reload) ---
    def _compact_locked(self):
        tmp = self._snap_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._data, f, ensure_ascii=False)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._snap_path)
        self._wal.close()
        with open(self._wal_path, "w"):
            pass
        self._wal = open(self._wal_path, "a", encoding="utf-8")

    def compact(self):
        with self._lock:
            self._compact_locked()

    def create_check_point(self, checkpoint_dir: str) -> bool:
        """Write a consistent copy of the store into `checkpoint_dir`."""
        with self._lock:
            os.makedirs(checkpoint_dir, exist_ok=True)
            snap = os.path.join(checkpoint_dir, "snapshot.json")
            tmp = snap + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(self._data, f, ensure_ascii=False)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, snap)
            open(os.path.join(checkpoint_dir, "wal.jsonl"), "w").close()
        return True

    def reload(self, new_path: str | None = None) -> bool:
        """Close and reopen (optionally from a restored snapshot directory)."""
        with self._lock:
            self._wal.close()
            if new_path:
                self.path = new_path
            self._load()
        return True

    def num_keys(self) -> int:
        with self._lock:
            return len(self._data)

    def close(self):
        with self._lock:
            if self._wal and not self._wal.closed:
                self._wal.close()
