"""Concurrent-query micro-batching for whole-corpus kernels.

The reference fans every search out across a thread pool and scales with
vCPUs (src/index.cpp:6653-6655 parallel posting intersection). On TPU the
equivalent resource is the single device pipeline: each in-flight query
dispatches ONE whole-corpus program, and at saturation throughput is
1000/kernel_ms. The kernels are HBM-latency-bound (plane passes stream at
~7-20 GB/s of the chip's 85 GB/s), so a batch of B same-shape queries
vmapped over the query buffer costs far less than B serial dispatches —
queries are just another batch dimension on TPU (SURVEY.md §2.4).

This module coalesces concurrent searches that hit the SAME compiled
kernel signature into one batched dispatch:

- callers enqueue their query buffer; the first arrival becomes the
  dispatcher, waits a short straggler window, takes up to the largest
  READY batch tier, pads to the tier width, and runs one program
- batch-tier kernels (B in TIERS) compile in a BACKGROUND thread the
  first time a signature shows concurrent demand; until a tier is ready
  every query serves solo (no added compile stall on the query path)
- while one batch occupies the device the next dispatcher keeps
  collecting, so batches pipeline back-to-back

A lone query pays only the straggler window (WINDOW_S) once tiers exist;
with no tiers compiled the path is exactly the solo dispatch.
"""

from __future__ import annotations

import logging
import threading
import time

log = logging.getLogger("typesense_tpu.batcher")


# batch tiers: ONE tier keeps the compile bill minimal — each tier is a
# background compile (~40-90 s through this toolchain) per signature. B=8
# already amortizes the latency-bound plane passes well below
# 1x-per-query; smaller takes pad up to 8 (padding costs only the
# duplicated lanes' compute, not a second dispatch).
TIERS = (8,)
WINDOW_S = 0.004          # straggler-collection window
MIN_DEMAND = 2            # waiters present at once before tiers compile
HOT_HITS = 8              # or: total hits on one signature before compile


class _Slot:
    __slots__ = ("qbuf", "event", "result", "error")

    def __init__(self, qbuf):
        self.qbuf = qbuf
        self.event = threading.Event()
        self.result = None
        self.error = None


class _SigState:
    """Per-kernel-signature queue + tier cache."""

    __slots__ = ("queue", "tiers", "tier_building", "tiers_done", "lock",
                 "dispatching", "inflight", "hits", "tier_error",
                 "batched_served")

    def __init__(self):
        self.queue: list[_Slot] = []
        self.tiers: dict[int, object] = {}       # B -> compiled batched fn
        self.tier_building = False
        self.tiers_done = False
        self.lock = threading.Lock()
        self.dispatching = False
        self.inflight = 0                        # concurrent run() callers
        self.hits = 0                            # total run() calls
        self.tier_error: Exception | None = None
        self.batched_served = 0                  # queries served batched


class QueryBatcher:
    """Coalesces same-signature kernel dispatches into batched programs."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._sigs: dict[object, _SigState] = {}
        self._glock = threading.Lock()

    def _sig(self, key) -> _SigState:
        with self._glock:
            st = self._sigs.get(key)
            if st is None:
                st = self._sigs[key] = _SigState()
            return st

    def run(self, key, qbuf, solo_call, build_batched, batched_call):
        """Execute one query, possibly as part of a coalesced batch.

        solo_call(qbuf) -> result for one query.
        build_batched(B) -> batched kernel for tier B (called off-thread).
        batched_call(fn, qbufs) -> list of per-query results, len(qbufs).
        """
        if not self.enabled:
            return solo_call(qbuf)
        st = self._sig(key)
        with st.lock:
            st.inflight += 1
            st.hits += 1
            # demand = concurrent waiters now, or a signature hot enough
            # that batching will pay even if arrivals never overlap exactly
            if (not st.tier_building and
                    (st.inflight >= MIN_DEMAND or st.hits >= HOT_HITS)):
                st.tier_building = True
                threading.Thread(
                    target=self._compile_tiers,
                    args=(st, build_batched), daemon=True).start()
            ready = bool(st.tiers)
            if ready:
                slot = _Slot(qbuf)
                st.queue.append(slot)
                dispatcher = not st.dispatching
                if dispatcher:
                    st.dispatching = True
                # a lone query skips the straggler window — single-stream
                # latency must not pay for batching nobody needs
                alone = st.inflight == 1 and len(st.queue) == 1
        try:
            if not ready:
                return solo_call(qbuf)
            if dispatcher:
                self._dispatch(st, solo_call, batched_call,
                               window=0.0 if alone else WINDOW_S)
            slot.event.wait()
            if slot.error is not None:
                raise slot.error
            return slot.result
        finally:
            with st.lock:
                st.inflight -= 1

    # -- internals --------------------------------------------------------

    def _compile_tiers(self, st: _SigState, build_batched):
        try:
            for b in TIERS:
                t0 = time.time()
                fn = build_batched(b)
                log.info("batch tier B=%d compiled in %.1fs", b,
                         time.time() - t0)
                with st.lock:
                    st.tiers[b] = fn
        except Exception as e:  # noqa: BLE001 — tier stays absent; solo
            # serves. Loud: a silent failure here caused round-3's
            # "with-tiers=0" mystery — the only evidence was this branch.
            st.tier_error = e
            log.warning("batch tier compile failed: %r", e)
        finally:
            st.tiers_done = True

    def stats(self) -> dict:
        """Telemetry snapshot: per-signature hit counts, tier readiness,
        batched-service counts, and any tier-compile error (debuggability —
        `with-tiers=0` must never again be a mystery)."""
        with self._glock:
            sigs = list(self._sigs.values())
        return {
            "signatures": len(sigs),
            "with_tiers": sum(1 for s in sigs if s.tiers),
            "building": sum(1 for s in sigs
                            if s.tier_building and not s.tiers_done),
            "batched_served": sum(s.batched_served for s in sigs),
            "hits_top": sorted((s.hits for s in sigs), reverse=True)[:8],
            "errors": [repr(s.tier_error) for s in sigs
                       if s.tier_error is not None][:4],
        }

    def wait_tiers(self, timeout: float = 1200.0) -> bool:
        """Block until every signature that started tier compilation has
        finished (warmup hook: boot fires concurrent searches, then waits
        here so first real traffic finds batch tiers ready)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._glock:
                busy = any(st.tier_building and not st.tiers_done
                           for st in self._sigs.values())
            if not busy:
                return True
            time.sleep(0.25)
        return False

    def _dispatch(self, st: _SigState, solo_call, batched_call,
                  window: float = WINDOW_S):
        """Serve one coalesced batch; hand leftovers to a fresh dispatcher."""
        if window:
            time.sleep(window)
        with st.lock:
            tiers = sorted(st.tiers)
            cap = tiers[-1] if tiers else 1
            take = st.queue[:cap]
            rest = st.queue[cap:]
            st.queue = rest
            if rest:
                # keep the pipeline full: a helper continues dispatching
                threading.Thread(
                    target=self._dispatch,
                    args=(st, solo_call, batched_call), daemon=True).start()
            else:
                st.dispatching = False
        if not take:
            return
        try:
            if len(take) == 1 or not tiers:
                for s in take:
                    s.result = solo_call(s.qbuf)
                    s.event.set()
                return
            tier = next((b for b in tiers if b >= len(take)), tiers[-1])
            qbufs = [s.qbuf for s in take]
            qbufs += [qbufs[-1]] * (tier - len(qbufs))
            results = batched_call(st.tiers[tier], qbufs)
            st.batched_served += len(take)
            for s, r in zip(take, results):
                s.result = r
                s.event.set()
        except Exception as e:  # noqa: BLE001
            for s in take:
                if not s.event.is_set():
                    s.error = e
                    s.event.set()
