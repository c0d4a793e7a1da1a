"""HTTP layer throughput: c concurrent keep-alive connections against the
real asyncio HTTP/1.1 server (api/http.py), measuring requests/s for a
small keyword search. Backs COVERAGE.md's claim that HTTP/1.1 keep-alive +
pipelined workers are not the bottleneck (reference serves h2o HTTP/1.1+2,
include/http_server.h:118): the record shows the HTTP layer clears the
engine's own throughput ceiling (~100-200 QPS on-chip) by a wide margin.

Usage: python tools/http_bench.py [concurrency] [n_requests]
Prints one JSON line {"http_keepalive_qps": ..., "c": ..., "n": ...}.
"""

import json
import os
import shutil
import socket
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT, KEY = 18831, "hbkey"
DATA = "/tmp/ts_httpbench_data"


def main():
    conc = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 6400

    shutil.rmtree(DATA, ignore_errors=True)
    from typesense_tpu.server_main import make_server
    srv = make_server(["--data-dir", DATA, "--api-key", KEY,
                       "--api-port", str(PORT),
                       "--api-address", "127.0.0.1"])
    threading.Thread(target=srv.run, daemon=True).start()
    time.sleep(1.5)

    import random
    import urllib.request

    def req(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(
            f"http://127.0.0.1:{PORT}{path}", data=data,
            headers={"X-TYPESENSE-API-KEY": KEY}, method=method)
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, resp.read()

    req("POST", "/collections", body={
        "name": "hb", "fields": [
            {"name": "title", "type": "string"},
            {"name": "points", "type": "int32"}],
        "default_sorting_field": "points"})
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima").split()
    rng = random.Random(1)
    lines = "\n".join(json.dumps(
        {"title": " ".join(rng.sample(words, 3)), "points": i})
        for i in range(2000))
    r = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/collections/hb/documents/import",
        data=lines.encode(), headers={"X-TYPESENSE-API-KEY": KEY},
        method="POST")
    urllib.request.urlopen(r, timeout=120).read()
    req("GET", "/collections/hb/documents/search?q=alpha&query_by=title")

    target = os.environ.get("HTTP_BENCH_PATH", "search")
    path = ("/health" if target == "health" else
            "/collections/hb/documents/search?q=alpha&query_by=title"
            "&per_page=10")
    raw = (f"GET {path} HTTP/1.1\r\nHost: x\r\nX-TYPESENSE-API-KEY: {KEY}"
           f"\r\nConnection: keep-alive\r\n\r\n").encode()

    per = n_req // conc
    counts = [0] * conc
    errs = [0] * conc

    def worker(wi):
        s = socket.create_connection(("127.0.0.1", PORT), timeout=30)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        buf = b""
        try:
            for _ in range(per):
                s.sendall(raw)
                while b"\r\n\r\n" not in buf:
                    b2 = s.recv(65536)
                    if not b2:
                        raise ConnectionError("closed")
                    buf += b2
                head, _, rest = buf.partition(b"\r\n\r\n")
                cl = 0
                for line in head.split(b"\r\n"):
                    if line.lower().startswith(b"content-length:"):
                        cl = int(line.split(b":")[1])
                while len(rest) < cl:
                    b2 = s.recv(65536)
                    if not b2:
                        raise ConnectionError("closed")
                    rest += b2
                buf = rest[cl:]
                if not head.startswith(b"HTTP/1.1 200"):
                    errs[wi] += 1
                counts[wi] += 1
        except (ConnectionError, OSError):
            errs[wi] += 1
        finally:
            s.close()

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(conc)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total = sum(counts)
    print(json.dumps({"http_keepalive_qps": round(total / dt, 1),
                      "path": target, "c": conc, "n": total,
                      "errors": sum(errs),
                      "wall_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
