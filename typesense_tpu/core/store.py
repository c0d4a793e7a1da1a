"""Durable key-value store: the RocksDB-equivalent host layer.

Behavior contract: /root/reference/include/store.h:54-118 (Store class:
insert/get/remove/scan/batch_write/create_check_point/reload, prefix
iteration) and its role in SURVEY.md §5 (checkpoint of record; in-memory
indices are derived state rebuilt on boot).

Design: log-structured — an in-memory dict + append-only WAL (JSON lines,
fsync'd per batch). When the WAL grows past a threshold it is ROTATED to a
new generation file and a background thread streams the current state into a
JSONL snapshot; writers never stall longer than a dict copy (RocksDB's
memtable-flush discipline, scaled to this engine's needs). Crash recovery
replays snapshot + all WAL generations in order, tolerating a torn final
record. This favors the engine's access pattern: point gets on the read path
(doc hydration) and sequential batch writes on the import path.
"""

from __future__ import annotations

import json
import os
import re
import threading

_TOMBSTONE = None  # deletions recorded as null values in the WAL
_WAL_RE = re.compile(r"^wal\.(\d+)\.jsonl$")


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
        self._wal_gen = 0
        self._compactor: threading.Thread | None = None
        os.makedirs(path, exist_ok=True)
        self._load()

    # --- paths ---
    @property
    def _snap_path(self) -> str:
        return os.path.join(self.path, "snapshot.jsonl")

    @property
    def _legacy_snap_path(self) -> str:
        return os.path.join(self.path, "snapshot.json")

    def _wal_path(self, gen: int) -> str:
        return os.path.join(self.path, f"wal.{gen}.jsonl")

    def _wal_gens(self) -> list[int]:
        gens = []
        for name in os.listdir(self.path):
            m = _WAL_RE.match(name)
            if m:
                gens.append(int(m.group(1)))
        # round-1 layout compatibility: ungenerated wal.jsonl replays first
        return sorted(gens)

    # --- recovery ---
    def _replay_wal_file(self, path: str):
        """Replay one WAL/snapshot file. Two record formats coexist:

        - framed (current): ``=<klen>,<vlen>\\n<key><value>\\n`` — binary-safe
          and escape-free, so appending a value that is already JSON does NOT
          pay a second full escape pass (the old JSONL wrapper re-escaped
          every quote in the doc payload — ~35% of import wall time at 2.2M).
          Tombstones use ``vlen = -1`` and carry no value bytes.
        - JSONL (legacy): ``{"k": ..., "v": ...}`` lines from earlier layouts.

        A torn tail (crash mid-append) stops replay, same as RocksDB WAL
        point-in-time recovery (store.h:54 contract)."""
        with open(path, "r", encoding="utf-8", newline="") as f:
            buf = f.read()
        pos, n = 0, len(buf)
        while pos < n:
            ch = buf[pos]
            if ch == "=":
                nl = buf.find("\n", pos)
                if nl < 0:
                    break  # torn header
                try:
                    klen_s, vlen_s = buf[pos + 1:nl].split(",")
                    klen, vlen = int(klen_s), int(vlen_s)
                except ValueError:
                    break
                body = nl + 1
                vbytes = max(vlen, 0)
                end = body + klen + vbytes
                if end + 1 > n or buf[end] != "\n":
                    break  # torn payload
                k = buf[body:body + klen]
                if vlen < 0:
                    self._data.pop(k, None)
                else:
                    self._data[k] = buf[body + klen:end]
                pos = end + 1
            elif ch == "\n":
                pos += 1
            else:
                nl = buf.find("\n", pos)
                line = buf[pos:nl] if nl >= 0 else buf[pos:]
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    break  # torn tail record from a crash — stop replay
                k, v = rec["k"], rec["v"]
                if v is _TOMBSTONE:
                    self._data.pop(k, None)
                else:
                    self._data[k] = v
                if nl < 0:
                    break
                pos = nl + 1

    def _load(self):
        self._data = {}
        if os.path.exists(self._snap_path):
            # JSONL snapshot: one {"k":..,"v":..} record per line, streamed
            self._replay_wal_file(self._snap_path)
        elif os.path.exists(self._legacy_snap_path):
            with open(self._legacy_snap_path, "r", encoding="utf-8") as f:
                self._data = json.load(f)
        legacy_wal = os.path.join(self.path, "wal.jsonl")
        if os.path.exists(legacy_wal):
            self._replay_wal_file(legacy_wal)
        gens = self._wal_gens()
        for g in gens:
            self._replay_wal_file(self._wal_path(g))
        self._wal_gen = (gens[-1] if gens else 0)
        self._wal = open(self._wal_path(self._wal_gen), "a", encoding="utf-8")

    @staticmethod
    def _frame(k: str, v: str | None) -> str:
        if v is _TOMBSTONE:
            return f"={len(k)},-1\n{k}\n"
        return f"={len(k)},{len(v)}\n{k}{v}\n"

    def _append(self, records: list[tuple[str, str | None]]):
        buf = "".join(self._frame(k, v) for k, v in records)
        self._wal.write(buf)
        self._wal.flush()
        if self.fsync:
            os.fsync(self._wal.fileno())
        if self._wal.tell() > self.wal_compact_bytes:
            self._start_compaction_locked()

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
    @staticmethod
    def _stream_snapshot(view: dict[str, str], dest: str):
        """Stream a state view into a JSONL snapshot file, atomically."""
        tmp = dest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for k, v in view.items():
                f.write(Store._frame(k, v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)

    def _snapshot_chunked(self, keys: list[str], dest: str,
                          chunk: int = 8192):
        """Stream the state for `keys` into a JSONL snapshot WITHOUT a
        full-dict copy: the lock is taken per chunk and each key's CURRENT
        value is written. Per-key atomicity suffices — the snapshot only
        needs to be at least as new as the rotation point per key, because
        newer WAL generations replay on top of it (post-rotation updates
        and tombstones win either way). Peak extra memory is the key list,
        not a second copy of the dataset."""
        tmp = dest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for i in range(0, len(keys), chunk):
                with self._lock:
                    rows = [(k, self._data[k]) for k in keys[i:i + chunk]
                            if k in self._data]
                for k, v in rows:
                    f.write(self._frame(k, v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)

    def _start_compaction_locked(self):
        """Rotate the WAL and snapshot in the background. The write lock is
        held only to capture the KEY list (values stream out chunk-wise),
        so writers continue against the new WAL generation while the
        snapshot writes."""
        if self._compactor is not None and self._compactor.is_alive():
            return  # one compaction at a time; the next threshold retriggers
        keys = list(self._data.keys())
        old_gens = self._wal_gens()
        self._wal.close()
        self._wal_gen += 1
        self._wal = open(self._wal_path(self._wal_gen), "a", encoding="utf-8")

        def run():
            self._snapshot_chunked(keys, self._snap_path)
            # snapshot covers every generation <= the rotated ones
            for g in old_gens:
                try:
                    os.remove(self._wal_path(g))
                except FileNotFoundError:
                    pass
            for legacy in (self._legacy_snap_path,
                           os.path.join(self.path, "wal.jsonl")):
                try:
                    os.remove(legacy)
                except FileNotFoundError:
                    pass

        self._compactor = threading.Thread(target=run, daemon=True,
                                           name="store-compact")
        self._compactor.start()

    def compact(self, wait: bool = True):
        with self._lock:
            self._start_compaction_locked()
            t = self._compactor
        if wait and t is not None:
            t.join()

    def wait_compaction(self):
        t = self._compactor
        if t is not None:
            t.join()

    def create_check_point(self, checkpoint_dir: str) -> bool:
        """Write a consistent copy of the store into `checkpoint_dir`."""
        with self._lock:
            view = self._data.copy()
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._stream_snapshot(view, os.path.join(checkpoint_dir,
                                                 "snapshot.jsonl"))
        open(os.path.join(checkpoint_dir, "wal.0.jsonl"), "w").close()
        return True

    def reload(self, new_path: str | None = None) -> bool:
        """Close and reopen (optionally from a restored snapshot directory)."""
        self.wait_compaction()
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
        self.wait_compaction()
        with self._lock:
            if self._wal and not self._wal.closed:
                self._wal.close()
