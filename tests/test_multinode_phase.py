"""Out-of-process 3-node cluster phases — the reference api_tests
MULTI_FRESH / MULTI_RESTARTED strategy (api_tests/README.md): real server
processes on localhost, leader killed MID-IMPORT, a new leader elected,
writes continue, and the killed node rejoins and converges. No mocks.
"""

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

from tests.test_phase_matrix import API_KEY, REPO, free_port


def http(port, method, path, body=None, query=None, timeout=15):
    q = ""
    if query:
        from urllib.parse import urlencode
        q = "?" + urlencode(query)
    data = None
    if body is not None:
        data = body.encode() if isinstance(body, str) \
            else json.dumps(body).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}{q}", method=method,
        headers={"X-TYPESENSE-API-KEY": API_KEY,
                 "Content-Type": "application/json"}, data=data)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            raw = r.read()
            try:
                return r.status, json.loads(raw or b"{}")
            except json.JSONDecodeError:
                return r.status, raw.decode()
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


class Node:
    def __init__(self, data_dir, port, nodes):
        self.port = port
        self.data_dir = data_dir
        self.nodes = nodes
        self.start()

    def start(self):
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": REPO + os.pathsep +
               os.environ.get("PYTHONPATH", "")}
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "typesense_tpu.server_main",
             "--data-dir", self.data_dir, "--api-key", API_KEY,
             "--api-port", str(self.port), "--api-address", "127.0.0.1",
             "--nodes", self.nodes],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO)

    def alive(self):
        return self.proc.poll() is None

    def kill(self):
        self.proc.kill()
        self.proc.wait(10)
        if self.proc.stdout:
            self.proc.stdout.close()

    def stop(self):
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(10)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(5)
        if self.proc.stdout:
            self.proc.stdout.close()


def wait_up(node, timeout=90):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            code, _ = http(node.port, "GET", "/health", timeout=3)
            if code in (200, 503):
                return
        except Exception:
            pass
        if not node.alive():
            out = node.proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"node died:\n{out[-3000:]}")
        time.sleep(0.5)
    raise TimeoutError("node not up")


def find_leader(nodes, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        for n in nodes:
            if not n.alive():
                continue
            try:
                code, st = http(n.port, "GET", "/status", timeout=3)
                if code == 200 and st.get("state") == "LEADER":
                    return n
            except Exception:
                pass
        time.sleep(0.5)
    raise TimeoutError("no leader elected")


def test_leader_kill_mid_import_convergence(tmp_path):
    ports = [free_port() for _ in range(3)]
    nodes_arg = ",".join(f"127.0.0.1:{p}" for p in ports)
    nodes = [Node(str(tmp_path / f"n{i}"), p, nodes_arg)
             for i, p in enumerate(ports)]
    try:
        for n in nodes:
            wait_up(n)
        leader = find_leader(nodes)
        code, _ = http(leader.port, "POST", "/collections", body={
            "name": "logs", "fields": [
                {"name": "msg", "type": "string"},
                {"name": "n", "type": "int32"}],
            "default_sorting_field": "n"})
        assert code == 201

        # import in batches; kill the leader partway through
        def batch(lo, hi):
            return "\n".join(json.dumps(
                {"id": str(i), "msg": f"event number {i}", "n": i})
                for i in range(lo, hi))

        code, lines = http(leader.port, "POST",
                           "/collections/logs/documents/import",
                           body=batch(0, 100))
        assert code == 200
        ok0 = sum(1 for ln in lines.strip().splitlines()
                  if json.loads(ln)["success"])
        assert ok0 == 100

        # wait until followers have pulled the first batch (replication is
        # oplog-pull; a killed leader's unpulled tail is the availability
        # trade the design documents), THEN kill the leader
        def count(port):
            code, res = http(port, "GET",
                             "/collections/logs/documents/search",
                             query={"q": "*", "per_page": 1})
            return res.get("found", -1) if code == 200 else -1

        t0 = time.time()
        while time.time() - t0 < 60:
            if all(count(n.port) == 100 for n in nodes):
                break
            time.sleep(0.5)
        assert all(count(n.port) == 100 for n in nodes)

        leader.kill()
        survivors = [n for n in nodes if n is not leader]
        new_leader = find_leader(survivors)
        assert new_leader is not leader

        # writes continue against the new leader
        code, lines = http(new_leader.port, "POST",
                           "/collections/logs/documents/import",
                           body=batch(100, 200), timeout=30)
        assert code == 200

        # the killed node restarts and converges
        leader.start()
        wait_up(leader)

        t0 = time.time()
        while time.time() - t0 < 90:
            counts = [count(n.port) for n in nodes]
            if counts == [200, 200, 200]:
                break
            time.sleep(1.0)
        assert counts == [200, 200, 200], counts

        # a doc written before the kill is identical on every node
        docs = [http(n.port, "GET", "/collections/logs/documents/42")[1]
                for n in nodes]
        assert docs[0] == docs[1] == docs[2]
        assert docs[0]["n"] == 42
    finally:
        for n in nodes:
            n.stop()
