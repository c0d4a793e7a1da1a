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
import sys
import threading
import time
import traceback
import urllib.request

OPLOG_PREFIX = "$OL"
APPLIED_KEY = "$OL_APPLIED"
TERM_KEY = "$TERM"
APPLYING_KEY = "$AP"    # set while an op is being applied; survives a crash
SKIP_PREFIX = "$XP"     # poison ops to skip on restart (batched_indexer.h:82)
ELECTION_TIMEOUT_S = 6.0
LEASE_S = 5.0
HEARTBEAT_S = 1.0


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
                 healthy_read_lag: int = 1000, healthy_write_lag: int = 500,
                 data_store=None, reload_fn=None):
        self.store = store
        self.apply_fn = apply_fn      # (op: dict) -> None; replays a write
        self.nodes = nodes
        self.self_addr = self_addr
        self.api_key = api_key
        self.healthy_read_lag = healthy_read_lag
        self.healthy_write_lag = healthy_write_lag
        self.next_seq = 0             # leader: next op sequence number
        self.applied_seq = -1         # highest op applied locally
        self.oldest_seq = 0           # oldest op still in the local log
        self.leader: tuple[str, int] | None = None
        # raft-lite consensus state (raft_server.cpp:292 quorum semantics):
        # a monotone TERM with majority votes elects the leader; the leader
        # holds a LEASE renewed by majority heartbeat ACKs — an ex-leader cut
        # off from the majority loses the lease and stops accepting writes
        # (term-fenced split-brain protection)
        self.term = 0
        self.voted_for: str | None = None
        self._lease_until = 0.0
        self._last_heartbeat = time.time()
        self._last_catchup_err = 0.0
        self.data_store = data_store  # main doc store (snapshot shipping)
        self.reload_fn = reload_fn    # () -> None; rebuild after install
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
        self.oldest_seq = None
        for k, _v in self.store.scan(OPLOG_PREFIX + "_"):
            try:
                seq = int(k.rsplit("_", 1)[1])
            except ValueError:
                continue
            self.next_seq = max(self.next_seq, seq + 1)
            self.oldest_seq = seq if self.oldest_seq is None else \
                min(self.oldest_seq, seq)
        if self.oldest_seq is None:
            self.oldest_seq = self.applied_seq + 1
        tv = self.store.get(TERM_KEY)
        if tv:
            obj = json.loads(tv)
            self.term = obj.get("term", 0)
            self.voted_for = obj.get("voted_for")
        # crash-poison recovery (reference: crash_callback persists the
        # applying raft-log index, typesense_server.cpp:159-172; restart
        # skips it via $XP keys, batched_indexer.h:82-88): the APPLYING
        # marker is cleared only on successful apply — if it survives to
        # this load, the op it names crashed the process and must be skipped
        self.skip_seqs: set[int] = set()
        ap_marker = self.store.get(APPLYING_KEY)
        if ap_marker:
            seq = int(ap_marker)
            self.store.batch_write({f"{SKIP_PREFIX}_{seq}": "1"},
                                   deletes=[APPLYING_KEY])
            self.skip_seqs.add(seq)
        for k, _v in self.store.scan(SKIP_PREFIX + "_"):
            try:
                self.skip_seqs.add(int(k.rsplit("_", 1)[1]))
            except ValueError:
                pass

    def _persist_term(self):
        if self.store is not None:
            self.store.insert(TERM_KEY, json.dumps(
                {"term": self.term, "voted_for": self.voted_for}))

    def _persist_op(self, seq: int, op: dict):
        if self.store is not None:
            self.store.batch_write({f"{OPLOG_PREFIX}_{seq:020d}": json.dumps(op),
                                    APPLIED_KEY: str(seq)})

    # -- leadership (quorum election + leader lease) ----------------------
    def _cluster(self) -> list[tuple[str, int]]:
        peers = self.nodes.peers()
        return peers if peers else [self.self_addr]

    def _majority(self) -> int:
        return len(self._cluster()) // 2 + 1

    def _post(self, addr: tuple[str, int], path: str, body: dict,
              timeout: float = 2.0) -> dict | None:
        try:
            req = urllib.request.Request(
                f"http://{addr[0]}:{addr[1]}{path}",
                data=json.dumps(body).encode(), method="POST",
                headers={"Content-Type": "application/json",
                         "X-TYPESENSE-API-KEY": self.api_key})
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode())
        except Exception:  # noqa: BLE001 — peer unreachable / refused
            return None

    def refresh_leader(self) -> tuple[str, int] | None:
        """Discover the current leader from peers' status (adopting the
        highest term); if none claims leadership and this node is the first
        alive node in file order, start an election."""
        cluster = self._cluster()
        if cluster == [self.self_addr]:
            self.leader = self.self_addr
            self._lease_until = float("inf")
            return self.leader
        best = None
        first_alive = None
        for addr in cluster:
            if addr == self.self_addr:
                if first_alive is None:
                    first_alive = addr
                continue
            st = self._status_of(addr)
            if st is None:
                continue
            if first_alive is None:
                first_alive = addr
            if st.get("state") == "LEADER" and st.get("term", 0) >= self.term:
                if best is None or st["term"] > best[1]:
                    best = (addr, st.get("term", 0))
        if best is not None:
            with self._lock:
                self.leader = best[0]
                if best[1] > self.term:
                    self.term = best[1]
                    self.voted_for = None
                    self._persist_term()
                self._last_heartbeat = time.time()
            return self.leader
        if self.is_leader and self._lease_valid():
            return self.leader
        if first_alive == self.self_addr:
            self.start_election()
        return self.leader

    def _status_of(self, addr: tuple[str, int]) -> dict | None:
        try:
            req = urllib.request.Request(
                f"http://{addr[0]}:{addr[1]}/replication/status",
                headers={"X-TYPESENSE-API-KEY": self.api_key})
            with urllib.request.urlopen(req, timeout=2) as resp:
                return json.loads(resp.read().decode())
        except Exception:  # noqa: BLE001
            return None

    def start_election(self) -> bool:
        """Raft-style candidacy: bump term, vote self, request votes from
        peers; a MAJORITY of grants makes this node leader
        (raft_server.cpp:292 node->apply requires the braft quorum — here
        the quorum gates leadership and the lease gates writes)."""
        cluster = self._cluster()
        with self._lock:
            self.term += 1
            self.voted_for = f"{self.self_addr[0]}:{self.self_addr[1]}"
            self._persist_term()
            term = self.term
        votes = 1
        for addr in cluster:
            if addr == self.self_addr:
                continue
            resp = self._post(addr, "/replication/request_vote", {
                "term": term,
                "candidate": f"{self.self_addr[0]}:{self.self_addr[1]}",
                "last_seq": self.applied_seq})
            if resp and resp.get("granted"):
                votes += 1
            elif resp and resp.get("term", 0) > term:
                with self._lock:
                    self.term = resp["term"]
                    self.voted_for = None
                    self._persist_term()
                return False
        if votes >= self._majority():
            with self._lock:
                self.leader = self.self_addr
                self._lease_until = time.time() + LEASE_S
            self.send_heartbeats()
            return True
        return False

    def handle_request_vote(self, body: dict) -> dict:
        """Grant a vote when the candidate's term is newer and its log is at
        least as complete as ours (raft election safety)."""
        with self._lock:
            term = int(body.get("term", 0))
            if term < self.term:
                return {"granted": False, "term": self.term}
            if term > self.term:
                self.term = term
                self.voted_for = None
            cand = body.get("candidate", "")
            up_to_date = int(body.get("last_seq", -1)) >= self.applied_seq
            grant = (self.voted_for in (None, cand)) and up_to_date
            if grant:
                self.voted_for = cand
                self._last_heartbeat = time.time()  # reset election timer
            self._persist_term()
            return {"granted": grant, "term": self.term}

    def handle_heartbeat(self, body: dict) -> dict:
        """Follower side of the leader heartbeat: adopt newer terms, track
        liveness for the election timeout."""
        with self._lock:
            term = int(body.get("term", 0))
            if term < self.term:
                return {"granted": False, "term": self.term}
            if term > self.term:
                self.term = term
                self.voted_for = None
                self._persist_term()
            host, port = body.get("leader", ":0").rsplit(":", 1)
            self.leader = (host, int(port))
            self._last_heartbeat = time.time()
            return {"granted": True, "term": self.term}

    def send_heartbeats(self) -> int:
        """Leader: ping followers; a majority of ACKs renews the write
        lease. Without the lease the leader stops accepting writes — the
        split-brain fence."""
        cluster = self._cluster()
        if cluster == [self.self_addr]:
            self._lease_until = float("inf")
            return 1
        acks = 1
        for addr in cluster:
            if addr == self.self_addr:
                continue
            resp = self._post(addr, "/replication/heartbeat", {
                "term": self.term,
                "leader": f"{self.self_addr[0]}:{self.self_addr[1]}",
                "applied_seq": self.applied_seq})
            if resp and resp.get("granted"):
                acks += 1
            elif resp and resp.get("term", 0) > self.term:
                with self._lock:     # deposed by a newer term
                    self.term = resp["term"]
                    self.voted_for = None
                    self._persist_term()
                    self.leader = None
                    self._lease_until = 0.0
                return acks
        if acks >= self._majority():
            self._lease_until = time.time() + LEASE_S
        return acks

    def _lease_valid(self) -> bool:
        return time.time() < self._lease_until

    @property
    def is_leader(self) -> bool:
        return self.leader == self.self_addr and self._lease_valid()

    # -- write path (ReplicationState::write, raft_server.cpp:292) -------
    def replicate_to_followers(self, seq: int, op: dict) -> bool:
        """Leader: push one logged op to every follower and count nodes
        that PERSISTED it. True when a majority (self included) holds the
        op — the braft quorum-ack (raft_server.cpp:292 node->apply acks the
        client only from on_apply at :507, i.e. after quorum commit).
        Lagging/unreachable followers still converge via pull catch-up."""
        cluster = self._cluster()
        if cluster == [self.self_addr]:
            return True
        acks = 1
        payload = {"term": self.term,
                   "leader": f"{self.self_addr[0]}:{self.self_addr[1]}",
                   "ops": [{"seq": seq, "op": op}]}
        for addr in cluster:
            if addr == self.self_addr:
                continue
            resp = self._post(addr, "/replication/append", payload,
                              timeout=5.0)
            if resp and resp.get("persisted"):
                acks += 1
            elif resp and resp.get("term", 0) > self.term:
                with self._lock:     # deposed by a newer term
                    self.term = resp["term"]
                    self.voted_for = None
                    self._persist_term()
                    self.leader = None
                    self._lease_until = 0.0
                return False
        return acks >= self._majority()

    def handle_append(self, body: dict) -> dict:
        """Follower side of the leader's synchronous push: persist + apply
        in-order ops, ack persistence. Out-of-order ops are refused (the
        pull catch-up loop fills the gap) so the log never holds holes."""
        with self._lock:
            term = int(body.get("term", 0))
            if term < self.term:
                return {"persisted": False, "term": self.term,
                        "applied_seq": self.applied_seq}
            if term > self.term:
                self.term = term
                self.voted_for = None
                self._persist_term()
            host, port = body.get("leader", ":0").rsplit(":", 1)
            self.leader = (host, int(port))
            self._last_heartbeat = time.time()
            ok = True
            for e in sorted(body.get("ops", []), key=lambda x: x["seq"]):
                seq, op = int(e["seq"]), e["op"]
                if seq <= self.applied_seq:
                    continue             # duplicate delivery
                if seq != self.applied_seq + 1:
                    ok = False           # gap — catch-up will pull it
                    break
                self._persist_op(seq, op)
                if seq in self.skip_seqs:
                    self.applied_seq = seq
                    self.next_seq = seq + 1
                    continue
                if self.store is not None:
                    self.store.insert(APPLYING_KEY, str(seq))
                self.apply_fn(op)
                if self.store is not None:
                    self.store.remove(APPLYING_KEY)
                self.applied_seq = seq
                self.next_seq = seq + 1
            return {"persisted": ok, "term": self.term,
                    "applied_seq": self.applied_seq}

    def log_write(self, op: dict) -> int:
        """Leader: append an op to the durable log (the HTTP handler applies
        it locally right before — the reference's on_apply + route re-invoke
        collapse into one step on the leader), then push it to followers and
        ack only after a MAJORITY persisted it. On quorum failure the client
        gets a 503: the write is durable on this node and will either
        replicate when the partition heals or be discarded by snapshot
        re-sync if a new leader was elected without it."""
        with self._lock:
            seq = self.next_seq
            self.next_seq += 1
            self._persist_op(seq, op)
            self.applied_seq = seq
        if not self.replicate_to_followers(seq, op):
            from typesense_tpu.core.errors import ServiceUnavailable
            raise ServiceUnavailable(
                "Rejecting write: could not persist to a quorum of nodes.")
        return seq

    def submit_write(self, op: dict) -> dict:
        """Leader: log + apply + quorum-replicate. Follower: forward to
        leader (write_to_leader, raft_server.cpp:387)."""
        with self._lock:
            if self.is_leader:
                seq = self.next_seq
                self.next_seq += 1
                self._persist_op(seq, op)
                self.apply_fn(op)
                self.applied_seq = seq
            elif self.leader is None or self.leader == self.self_addr:
                from typesense_tpu.core.errors import ServiceUnavailable
                raise ServiceUnavailable(
                    "Not Ready or Lagging: no elected leader "
                    "(quorum unavailable).")
            else:
                host, port = self.leader
                seq = None
        if seq is not None:
            if not self.replicate_to_followers(seq, op):
                from typesense_tpu.core.errors import ServiceUnavailable
                raise ServiceUnavailable(
                    "Rejecting write: could not persist to a quorum of "
                    "nodes.")
            return {"seq": seq}
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
        """Pull and apply ops newer than applied_seq from the leader. When
        the leader has COMPACTED past our position (gap), install its
        snapshot instead (on_snapshot_load equivalent: store replace +
        deterministic rebuild)."""
        if self.is_leader or self.leader is None or \
                self.leader == self.self_addr:
            return 0
        host, port = self.leader
        url = (f"http://{host}:{port}/replication/log"
               f"?from={self.applied_seq + 1}")
        req = urllib.request.Request(url, headers={
            "X-TYPESENSE-API-KEY": self.api_key})
        with urllib.request.urlopen(req, timeout=10) as resp:
            ops = json.loads(resp.read().decode())["ops"]
        gap = bool(ops) and ops[0]["_seq"] > self.applied_seq + 1
        if not ops:
            st = self._status_of((host, port))
            gap = bool(st) and st.get("applied_seq", -1) > self.applied_seq \
                and st.get("oldest_seq", 0) > self.applied_seq + 1
            if (st and st.get("term", 0) >= self.term
                    and st.get("applied_seq", -1) < self.applied_seq):
                # divergent suffix: we hold ops the elected leader never
                # committed (e.g. an ex-leader's quorum-failed writes) —
                # braft truncates the log; full snapshot re-sync here
                self.install_snapshot()
                return 1
        if gap:
            # the oplog no longer reaches back to us — full snapshot install
            self.install_snapshot()
            return 1
        n = 0
        first_seq = ops[0]["_seq"] if ops else None
        with self._lock:
            for op in ops:
                seq = op.pop("_seq")
                if seq != self.applied_seq + 1:
                    continue  # out-of-order slice — wait for next round
                # (a sustained mismatch is surfaced by the n==0 check below)
                self._persist_op(seq, op)
                if seq in self.skip_seqs:
                    # poison op: advance past it without re-applying
                    self.applied_seq = seq
                    self.next_seq = seq + 1
                    n += 1
                    continue
                if self.store is not None:
                    self.store.insert(APPLYING_KEY, str(seq))
                self.apply_fn(op)
                if self.store is not None:
                    self.store.remove(APPLYING_KEY)
                self.applied_seq = seq
                self.next_seq = seq + 1
                n += 1
        if n == 0 and ops:
            now = time.time()
            if now - self._last_catchup_err > 10.0:
                self._last_catchup_err = now
                print(f"[replication] catch-up stalled: leader ops "
                      f"[{first_seq}..] vs applied_seq="
                      f"{self.applied_seq}", file=sys.stderr)
        return n

    # -- snapshot ship / install (on_snapshot_save/load, raft_server.cpp) --
    def snapshot_dump(self) -> dict:
        """Leader: full store image for a gapped follower (the braft
        snapshot = RocksDB checkpoint shipped over RPC, SURVEY.md §3.5)."""
        data = self.data_store.scan("") if self.data_store is not None else []
        meta = [(k, v) for k, v in self.store.scan("")
                if not k.startswith(OPLOG_PREFIX) and k != TERM_KEY] \
            if self.store is not None else []
        return {"applied_seq": self.applied_seq, "term": self.term,
                "data": list(data), "meta": list(meta)}

    def install_snapshot(self) -> None:
        """Follower: fetch the leader's snapshot, REPLACE both stores'
        contents, then rebuild in-memory state (reload_fn -> manager.load —
        indices are derived state, SURVEY.md §5 checkpoint/resume)."""
        host, port = self.leader
        req = urllib.request.Request(
            f"http://{host}:{port}/replication/snapshot",
            headers={"X-TYPESENSE-API-KEY": self.api_key})
        with urllib.request.urlopen(req, timeout=120) as resp:
            snap = json.loads(resp.read().decode())
        with self._lock:
            if self.data_store is not None:
                old = [k for k, _ in self.data_store.scan("")]
                self.data_store.batch_write(dict(snap["data"]), deletes=old)
            if self.store is not None:
                old = [k for k, _ in self.store.scan("")
                       if not k.startswith(OPLOG_PREFIX) and k != TERM_KEY]
                stale_ops = [k for k, _ in
                             self.store.scan(OPLOG_PREFIX + "_")]
                self.store.batch_write(
                    {**dict(snap["meta"]),
                     APPLIED_KEY: str(snap["applied_seq"])},
                    deletes=old + stale_ops)
            self.applied_seq = snap["applied_seq"]
            self.next_seq = self.applied_seq + 1
            self.oldest_seq = self.applied_seq + 1
        if self.reload_fn is not None:
            self.reload_fn()

    def compact_oplog(self, keep: int = 1000) -> int:
        """Leader: drop ops already covered by the snapshot horizon, keeping
        the last `keep` for incremental catch-up."""
        if self.store is None:
            return 0
        cutoff = self.applied_seq - keep
        dels = []
        for k, _ in self.store.scan(OPLOG_PREFIX + "_"):
            try:
                if int(k.rsplit("_", 1)[1]) <= cutoff:
                    dels.append(k)
            except ValueError:
                pass
        if dels:
            self.store.batch_write({}, deletes=dels)
            self.oldest_seq = max(self.oldest_seq, cutoff + 1)
        return len(dels)

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
            "term": self.term,
            "committed_index": self.next_seq - 1,
            "applied_seq": self.applied_seq,
            "oldest_seq": self.oldest_seq,
            "queued_writes": 0,
        }

    # -- background loop: heartbeats (leader) / catch-up + election timer
    # (followers); refresh_nodes every `interval` like the reference's 10 s
    # peer refresh ---------------------------------------------------------
    def run_loop(self, interval: float = 10.0, catchup_interval: float = 1.0):
        def loop():
            last_refresh = 0.0
            cluster = self._cluster()
            try:
                stagger = cluster.index(self.self_addr) * (
                    ELECTION_TIMEOUT_S / 2)
            except ValueError:
                stagger = 0.0
            while not self._stop.is_set():
                now = time.time()
                if self.leader == self.self_addr:
                    try:
                        self.send_heartbeats()   # renews the write lease
                    except Exception:  # noqa: BLE001
                        pass
                    self._stop.wait(HEARTBEAT_S)
                    continue
                if now - last_refresh >= interval or self.leader is None:
                    try:
                        self.refresh_leader()
                    except Exception:  # noqa: BLE001
                        pass
                    last_refresh = now
                if self.leader is not None and \
                        self.leader != self.self_addr:
                    try:
                        self.catch_up_once()
                    except Exception:  # noqa: BLE001
                        # network errors are routine (leader down); apply
                        # errors are not — surface both, throttled, instead
                        # of stalling silently at a fixed applied_seq
                        if now - self._last_catchup_err > 10.0:
                            self._last_catchup_err = now
                            traceback.print_exc(file=sys.stderr)
                # election timeout: the leader went silent
                if (self.leader != self.self_addr and
                        now - self._last_heartbeat >
                        ELECTION_TIMEOUT_S + stagger):
                    try:
                        self._last_heartbeat = time.time()
                        self.start_election()
                    except Exception:  # noqa: BLE001
                        pass
                self._stop.wait(catchup_interval)
        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t

    def stop(self):
        self._stop.set()
