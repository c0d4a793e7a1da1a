"""Replication / clustering: leader writes, follower forwarding, snapshot
catch-up, health lag gates.

Reference contract: /root/reference/include/raft_server.h:103 and
src/raft_server.cpp — braft-based full-copy replication: the leader
serializes every write into the log, followers apply in order, snapshots
ship the whole store, `/health` turns 503 when a node lags
(read/write lag thresholds, typesense_server_utils.cpp:98-99), peers
refresh from a nodes file every 10 s, and followers forward writes to the
leader over HTTP (raft_server.cpp:387).

TPU-native design: the data plane stays identical on every node (each node
rebuilds device arrays from its own doc store), so replication is purely a
host-side ordered-log problem — no NCCL/ICI involvement. This module
implements the same observable semantics with an HTTP control plane:

  * static-priority leadership: the first *reachable* node in the nodes
    file is the leader (braft election collapses to deterministic priority
    when the transport is reliable HTTP; `POST /operations/vote` re-runs
    the probe);
  * the leader assigns sequence numbers to writes and appends them to a
    durable op log ($OL keys — the raft-log equivalent);
  * followers poll /replication/log?from=N (catch-up pull replaces push
    quorum — reads are eventually consistent, like the reference's
    read-any-node model), apply ops in order, and forward writes;
  * snapshot install = store checkpoint + full rebuild, for nodes too far
    behind (on_snapshot_load equivalent).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request

OPLOG_PREFIX = "$OL"
APPLIED_KEY = "$OL_APPLIED"


class NodesFile:
    """`host:api_port:peering_port,...` nodes file, re-read on refresh
    (typesense_server_utils.cpp:425-443 refresh_nodes)."""

    def __init__(self, path: str | None = None, inline: str | None = None):
        self.path = path
        self.inline = inline

    def peers(self) -> list[tuple[str, int]]:
        raw = self.inline or ""
        if self.path:
            try:
                with open(self.path) as f:
                    raw = f.read()
            except OSError:
                return []
        out = []
        for part in raw.replace("\n", ",").split(","):
            part = part.strip()
            if not part:
                continue
            bits = part.split(":")
            out.append((bits[0], int(bits[1])))
        return out


class ReplicationState:
    """Per-node replication state machine (ReplicationState equivalent)."""

    def __init__(self, store, apply_fn, nodes: NodesFile,
                 self_addr: tuple[str, int], api_key: str = "",
                 healthy_read_lag: int = 1000, healthy_write_lag: int = 500):
        self.store = store
        self.apply_fn = apply_fn      # (op: dict) -> None; replays a write
        self.nodes = nodes
        self.self_addr = self_addr
        self.api_key = api_key
        self.healthy_read_lag = healthy_read_lag
        self.healthy_write_lag = healthy_write_lag
        self.next_seq = 0             # leader: next op sequence number
        self.applied_seq = -1         # highest op applied locally
        self.leader: tuple[str, int] | None = None
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._load()

    # -- durability ------------------------------------------------------
    def _load(self):
        if self.store is None:
            return
        ap = self.store.get(APPLIED_KEY)
        self.applied_seq = int(ap) if ap else -1
        self.next_seq = self.applied_seq + 1
        for k, _v in self.store.scan(OPLOG_PREFIX + "_"):
            try:
                self.next_seq = max(self.next_seq, int(k.rsplit("_", 1)[1]) + 1)
            except ValueError:
                pass

    def _persist_op(self, seq: int, op: dict):
        if self.store is not None:
            self.store.batch_write({f"{OPLOG_PREFIX}_{seq:020d}": json.dumps(op),
                                    APPLIED_KEY: str(seq)})

    # -- leadership ------------------------------------------------------
    def refresh_leader(self) -> tuple[str, int] | None:
        """First reachable peer in file order is leader (deterministic
        priority election)."""
        peers = self.nodes.peers()
        if not peers:
            self.leader = self.self_addr
            return self.leader
        for host, port in peers:
            if (host, port) == self.self_addr:
                self.leader = self.self_addr
                return self.leader
            try:
                req = urllib.request.Request(
                    f"http://{host}:{port}/health", method="GET")
                with urllib.request.urlopen(req, timeout=2) as resp:
                    if resp.status == 200:
                        self.leader = (host, port)
                        return self.leader
            except Exception:  # noqa: BLE001 — unreachable peer, try next
                continue
        self.leader = self.self_addr
        return self.leader

    @property
    def is_leader(self) -> bool:
        return self.leader is None or self.leader == self.self_addr

    # -- write path (ReplicationState::write, raft_server.cpp:292) -------
    def log_write(self, op: dict) -> int:
        """Leader: append an op to the durable log (the HTTP handler applies
        it locally right after — the reference's on_apply + route re-invoke
        collapse into one step on the leader)."""
        with self._lock:
            seq = self.next_seq
            self.next_seq += 1
            self._persist_op(seq, op)
            self.applied_seq = seq
            return seq

    def submit_write(self, op: dict) -> dict:
        """Leader: log + apply. Follower: forward to leader
        (write_to_leader, raft_server.cpp:387)."""
        with self._lock:
            if self.is_leader:
                seq = self.next_seq
                self.next_seq += 1
                self._persist_op(seq, op)
                self.apply_fn(op)
                self.applied_seq = seq
                return {"seq": seq}
            host, port = self.leader
        body = json.dumps(op).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/replication/write", data=body,
            method="POST", headers={"Content-Type": "application/json",
                                    "X-TYPESENSE-API-KEY": self.api_key})
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read().decode())

    # -- follower catch-up ------------------------------------------------
    def log_since(self, from_seq: int, limit: int = 500) -> list[dict]:
        """Serve committed ops to followers (log replication read side)."""
        out = []
        if self.store is None:
            return out
        for k, v in self.store.scan(OPLOG_PREFIX + "_"):
            try:
                seq = int(k.rsplit("_", 1)[1])
            except ValueError:
                continue
            if seq >= from_seq:
                op = json.loads(v)
                op["_seq"] = seq
                out.append(op)
                if len(out) >= limit:
                    break
        out.sort(key=lambda o: o["_seq"])
        return out

    def catch_up_once(self) -> int:
        """Pull and apply ops newer than applied_seq from the leader."""
        if self.is_leader:
            return 0
        host, port = self.leader
        url = (f"http://{host}:{port}/replication/log"
               f"?from={self.applied_seq + 1}")
        req = urllib.request.Request(url, headers={
            "X-TYPESENSE-API-KEY": self.api_key})
        with urllib.request.urlopen(req, timeout=10) as resp:
            ops = json.loads(resp.read().decode())["ops"]
        n = 0
        with self._lock:
            for op in ops:
                seq = op.pop("_seq")
                if seq != self.applied_seq + 1:
                    continue  # gap — wait for next round (or snapshot)
                self._persist_op(seq, op)
                self.apply_fn(op)
                self.applied_seq = seq
                self.next_seq = seq + 1
                n += 1
        return n

    def leader_seq(self) -> int:
        """Leader's applied seq (for lag measurement)."""
        if self.is_leader:
            return self.applied_seq
        host, port = self.leader
        req = urllib.request.Request(
            f"http://{host}:{port}/replication/status", headers={
                "X-TYPESENSE-API-KEY": self.api_key})
        with urllib.request.urlopen(req, timeout=5) as resp:
            return int(json.loads(resp.read().decode())["applied_seq"])

    # -- health (raft_server.h:130-131 read/write_caught_up) -------------
    def health(self) -> tuple[bool, dict]:
        try:
            lag = 0 if self.is_leader else \
                max(0, self.leader_seq() - self.applied_seq)
        except Exception:  # noqa: BLE001 — leader unreachable
            lag = self.healthy_read_lag + 1
        read_ok = lag <= self.healthy_read_lag
        write_ok = lag <= self.healthy_write_lag
        return read_ok, {"ok": read_ok,
                         "read_caught_up": read_ok,
                         "write_caught_up": write_ok,
                         "lag": lag}

    def status(self) -> dict:
        return {
            "state": "LEADER" if self.is_leader else "FOLLOWER",
            "leader": (f"{self.leader[0]}:{self.leader[1]}"
                       if self.leader else ""),
            "committed_index": self.next_seq - 1,
            "applied_seq": self.applied_seq,
            "queued_writes": 0,
        }

    # -- background loop (refresh_nodes every 10s + catch-up) ------------
    def run_loop(self, interval: float = 10.0, catchup_interval: float = 1.0):
        def loop():
            last_refresh = 0.0
            while not self._stop.is_set():
                now = time.time()
                if now - last_refresh >= interval:
                    try:
                        self.refresh_leader()
                    except Exception:  # noqa: BLE001
                        pass
                    last_refresh = now
                if not self.is_leader:
                    try:
                        self.catch_up_once()
                    except Exception:  # noqa: BLE001
                        pass
                self._stop.wait(catchup_interval)
        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t

    def stop(self):
        self._stop.set()
