"""Out-of-process phase matrix, mirroring the reference api_tests strategy
(/root/reference/api_tests/README.md): SINGLE_FRESH -> SINGLE_RESTARTED ->
SINGLE_SNAPSHOT (+ restore). Real server processes, real HTTP over
localhost, no mocks — the persistence contract (WAL replay, startup index
rebuild, checkpoint/restore) is exercised end-to-end.

Subprocesses run with JAX_PLATFORMS=cpu so compiles stay fast; the engine
code paths are identical.
"""

import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

API_KEY = "phasekey"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def http(port, method, path, body=None, query=None, timeout=30):
    q = ""
    if query:
        from urllib.parse import urlencode
        q = "?" + urlencode(query)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}{q}", method=method,
        headers={"X-TYPESENSE-API-KEY": API_KEY,
                 "Content-Type": "application/json"},
        data=json.dumps(body).encode() if body is not None else None)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


class ServerProc:
    def __init__(self, data_dir: str, port: int):
        self.port = port
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                                "")}
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "typesense_tpu.server_main",
             "--data-dir", data_dir, "--api-key", API_KEY,
             "--api-port", str(port), "--api-address", "127.0.0.1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO)

    def wait_healthy(self, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if self.proc.poll() is not None:
                out = self.proc.stdout.read().decode(errors="replace")
                raise RuntimeError(f"server died:\n{out[-4000:]}")
            try:
                code, body = http(self.port, "GET", "/health", timeout=3)
                if code == 200 and body.get("ok"):
                    return self
            except Exception:
                pass
            time.sleep(0.5)
        raise TimeoutError("server did not become healthy")

    def stop(self, grace=15):
        if self.proc.poll() is None:
            self.proc.send_signal(signal.SIGTERM)
            try:
                self.proc.wait(grace)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(5)
        if self.proc.stdout:
            self.proc.stdout.close()


DOCS = [
    {"id": "0", "title": "the quick brown fox", "points": 10, "tag": "a"},
    {"id": "1", "title": "lazy dogs sleep", "points": 30, "tag": "b"},
    {"id": "2", "title": "quick silver surfer", "points": 20, "tag": "a"},
    {"id": "3", "title": "brown bread breakfast", "points": 5, "tag": "c"},
]


def seed(port):
    code, _ = http(port, "POST", "/collections", body={
        "name": "stories",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "points", "type": "int32"},
                   {"name": "tag", "type": "string", "facet": True}],
        "default_sorting_field": "points"})
    assert code == 201
    payload = "\n".join(json.dumps(d) for d in DOCS)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/collections/stories/documents/import",
        method="POST", data=payload.encode(),
        headers={"X-TYPESENSE-API-KEY": API_KEY})
    with urllib.request.urlopen(req, timeout=60) as r:
        lines = r.read().decode().strip().splitlines()
    assert all(json.loads(ln)["success"] for ln in lines)
    # an API key, an alias and a preset must survive restart/restore too
    assert http(port, "POST", "/keys", body={
        "description": "ro", "actions": ["documents:search"],
        "collections": ["*"], "value": "searchonly"})[0] == 201
    assert http(port, "PUT", "/aliases/books",
                body={"collection_name": "stories"})[0] == 200
    assert http(port, "PUT", "/presets/quickset",
                body={"value": {"query_by": "title"}})[0] == 200


def verify(port, phase):
    code, res = http(port, "GET", "/collections/stories/documents/search",
                     query={"q": "quick", "query_by": "title",
                            "facet_by": "tag", "sort_by": "points:desc"})
    assert code == 200, (phase, res)
    assert res["found"] == 2, (phase, res)
    ids = [h["document"]["id"] for h in res["hits"]]
    assert ids == ["2", "0"], (phase, ids)     # points desc
    fc = {c["value"]: c["count"]
          for c in res["facet_counts"][0]["counts"]}
    assert fc == {"a": 2}, (phase, fc)
    # alias + preset still resolve
    code, res = http(port, "GET", "/collections/books/documents/search",
                     query={"q": "brown", "preset": "quickset"})
    assert code == 200 and res["found"] == 2, (phase, res)
    # the stored key still authenticates
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/collections/stories/documents/search"
        f"?q=fox&query_by=title",
        headers={"X-TYPESENSE-API-KEY": "searchonly"})
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["found"] == 1, phase


def test_phase_matrix(tmp_path):
    data = str(tmp_path / "data")
    procs = []
    try:
        # ---- SINGLE_FRESH ----
        port = free_port()
        s1 = ServerProc(data, port)
        procs.append(s1)
        s1.wait_healthy()
        seed(port)
        verify(port, "FRESH")

        # a write just before shutdown must replay from the WAL on restart
        assert http(port, "POST", "/collections/stories/documents",
                    body={"id": "9", "title": "quick midnight snack",
                          "points": 50, "tag": "a"})[0] == 201
        s1.stop()

        # ---- SINGLE_RESTARTED: same data dir, fresh process ----
        port2 = free_port()
        s2 = ServerProc(data, port2)
        procs.append(s2)
        s2.wait_healthy()
        code, res = http(port2, "GET",
                         "/collections/stories/documents/search",
                         query={"q": "quick", "query_by": "title"})
        assert res["found"] == 3, res          # includes the late write
        code, res = http(port2, "GET", "/collections/stories/documents/9")
        assert code == 200 and res["points"] == 50
        # remove it again so snapshot verification matches the seed state
        assert http(port2, "DELETE",
                    "/collections/stories/documents/9")[0] == 200
        verify(port2, "RESTARTED")

        # ---- SINGLE_SNAPSHOT: checkpoint, restore into a new data dir ----
        snap = str(tmp_path / "snap")
        code, res = http(port2, "POST", "/operations/snapshot",
                         query={"snapshot_path": snap})
        assert code == 201 and res["success"]
        s2.stop()

        restored = str(tmp_path / "restored")
        os.makedirs(restored)
        shutil.copytree(os.path.join(snap, "db"),
                        os.path.join(restored, "db"))
        shutil.copytree(os.path.join(snap, "meta"),
                        os.path.join(restored, "meta"))
        port3 = free_port()
        s3 = ServerProc(restored, port3)
        procs.append(s3)
        s3.wait_healthy()
        verify(port3, "RESTORED")
        # restored node accepts writes independently
        assert http(port3, "POST", "/collections/stories/documents",
                    body={"id": "7", "title": "quick restored write",
                          "points": 1, "tag": "c"})[0] == 201
        code, res = http(port3, "GET",
                         "/collections/stories/documents/search",
                         query={"q": "quick", "query_by": "title"})
        assert res["found"] == 3
        s3.stop()
    finally:
        for p in procs:
            p.stop()
