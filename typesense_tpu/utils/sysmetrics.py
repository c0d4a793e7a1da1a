"""System + app metrics.

Behavior contract: /root/reference/include/system_metrics.h (CPU from /proc,
memory, disk, network at GET /metrics.json) and app_metrics.h (windowed
request counters + latency percentiles at GET /stats.json — the reference
uses a TDigest; we keep a simple reservoir that reports the same fields).
"""

from __future__ import annotations

import os
import random
import threading
import time


def system_metrics() -> dict:
    out = {}
    try:
        with open("/proc/meminfo") as f:
            mem = {}
            for line in f:
                parts = line.split()
                mem[parts[0].rstrip(":")] = int(parts[1]) * 1024
        out["system_memory_total_bytes"] = str(mem.get("MemTotal", 0))
        out["system_memory_used_bytes"] = str(
            mem.get("MemTotal", 0) - mem.get("MemAvailable", 0))
    except OSError:
        pass
    try:
        la1, la5, la15 = os.getloadavg()
        ncpu = os.cpu_count() or 1
        out["system_cpu1_active_percentage"] = f"{min(100.0, 100.0 * la1 / ncpu):.2f}"
    except OSError:
        pass
    try:
        st = os.statvfs("/")
        out["system_disk_total_bytes"] = str(st.f_blocks * st.f_frsize)
        out["system_disk_used_bytes"] = str((st.f_blocks - st.f_bavail) * st.f_frsize)
    except OSError:
        pass
    try:
        import resource
        out["typesense_memory_used_bytes"] = str(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024)
    except Exception:  # noqa: BLE001
        pass
    return out


class AppMetrics:
    """Windowed counters + latency percentile reservoir (app_metrics.h:14-60)."""

    WINDOW_S = 10

    def __init__(self):
        self._lock = threading.Lock()
        self._window_start = time.time()
        self._counts: dict[str, int] = {}
        self._lat: dict[str, list[float]] = {}
        self._prev_counts: dict[str, int] = {}
        self._prev_lat: dict[str, list[float]] = {}

    def record(self, label: str, duration_ms: float):
        with self._lock:
            self._roll()
            self._counts[label] = self._counts.get(label, 0) + 1
            lst = self._lat.setdefault(label, [])
            if len(lst) < 5000:
                lst.append(duration_ms)
            else:
                lst[random.randrange(5000)] = duration_ms

    def _roll(self):
        now = time.time()
        if now - self._window_start >= self.WINDOW_S:
            self._prev_counts, self._counts = self._counts, {}
            self._prev_lat, self._lat = self._lat, {}
            self._window_start = now

    def stats_json(self) -> dict:
        with self._lock:
            self._roll()
            counts = self._prev_counts or self._counts
            lats = self._prev_lat or self._lat
            out = {
                "search_requests_per_second": round(
                    counts.get("search", 0) / self.WINDOW_S, 1),
                "write_requests_per_second": round(
                    counts.get("write", 0) / self.WINDOW_S, 1),
                "total_requests_per_second": round(
                    sum(counts.values()) / self.WINDOW_S, 1),
            }
            sl = sorted(lats.get("search", []))
            if sl:
                out["search_latency_ms"] = round(sl[len(sl) // 2], 2)
                out["search_latency_p99_ms"] = round(sl[int(len(sl) * 0.99)], 2)
            else:
                out["search_latency_ms"] = 0
            out["latency_ms"] = {k: round(sorted(v)[len(v) // 2], 2)
                                 for k, v in lats.items() if v}
            out["requests_per_second"] = {k: round(c / self.WINDOW_S, 1)
                                          for k, c in counts.items()}
            return out
