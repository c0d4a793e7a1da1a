"""TLS serving + streaming/chunked import, out-of-process.

Mirrors the reference's h2o SSL serving (include/http_server.h:118 — cert +
key flags, periodic refresh) and async streaming import routes
(src/main/typesense_server.cpp:33 async_req): a chunked Transfer-Encoding
import must be decoded incrementally, not read as an empty body.
"""

import http.client
import json
import os
import ssl
import subprocess
import sys
import urllib.request

from tests.test_phase_matrix import API_KEY, REPO, ServerProc, free_port


def make_cert(tmp_path, cn="localhost"):
    cert = str(tmp_path / "cert.pem")
    key = str(tmp_path / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", cert, "-days", "2", "-nodes", "-subj", f"/CN={cn}"],
        check=True, capture_output=True)
    return cert, key


class TlsServerProc(ServerProc):
    def __init__(self, data_dir, port, cert, key):
        self.port = port
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": REPO + os.pathsep +
               os.environ.get("PYTHONPATH", "")}
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "typesense_tpu.server_main",
             "--data-dir", data_dir, "--api-key", API_KEY,
             "--api-port", str(port), "--api-address", "127.0.0.1",
             "--ssl-certificate", cert, "--ssl-certificate-key", key,
             "--ssl-refresh-interval-seconds", "1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO)

    def wait_healthy(self, timeout=90):
        import time
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        t0 = time.time()
        while time.time() - t0 < timeout:
            if self.proc.poll() is not None:
                out = self.proc.stdout.read().decode(errors="replace")
                raise RuntimeError(f"server died:\n{out[-4000:]}")
            try:
                req = urllib.request.Request(
                    f"https://127.0.0.1:{self.port}/health")
                with urllib.request.urlopen(req, timeout=3, context=ctx) as r:
                    if json.loads(r.read()).get("ok"):
                        return self
            except Exception:
                pass
            time.sleep(0.5)
        raise TimeoutError("tls server did not become healthy")


def https(port, method, path, body=None, query=None):
    ctx = ssl.create_default_context()
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    q = ""
    if query:
        from urllib.parse import urlencode
        q = "?" + urlencode(query)
    req = urllib.request.Request(
        f"https://127.0.0.1:{port}{path}{q}", method=method,
        headers={"X-TYPESENSE-API-KEY": API_KEY,
                 "Content-Type": "application/json"},
        data=json.dumps(body).encode() if body is not None else None)
    with urllib.request.urlopen(req, timeout=30, context=ctx) as r:
        return r.status, json.loads(r.read() or b"{}")


def test_https_serving_and_chunked_import(tmp_path):
    cert, key = make_cert(tmp_path)
    port = free_port()
    srv = TlsServerProc(str(tmp_path / "data"), port, cert, key)
    try:
        srv.wait_healthy()
        code, _ = https(port, "POST", "/collections", body={
            "name": "s", "fields": [
                {"name": "title", "type": "string"},
                {"name": "points", "type": "int32"}],
            "default_sorting_field": "points"})
        assert code == 201

        # plain HTTP on the TLS port must NOT work
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=5)
            raised = False
        except Exception:
            raised = True
        assert raised

        # chunked Transfer-Encoding import over TLS: body arrives in pieces
        docs = [{"id": str(i), "title": f"doc number {i} quick",
                 "points": i} for i in range(500)]
        payload = "\n".join(json.dumps(d) for d in docs).encode()

        def chunks():
            for i in range(0, len(payload), 1024):
                yield payload[i:i + 1024]

        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        conn = http.client.HTTPSConnection("127.0.0.1", port, context=ctx,
                                           timeout=60)
        conn.request("POST", "/collections/s/documents/import", body=chunks(),
                     headers={"X-TYPESENSE-API-KEY": API_KEY,
                              "Transfer-Encoding": "chunked"},
                     encode_chunked=True)
        resp = conn.getresponse()
        lines = resp.read().decode().strip().splitlines()
        conn.close()
        assert resp.status == 200
        assert len(lines) == 500
        assert all(json.loads(ln)["success"] for ln in lines)

        code, res = https(port, "GET", "/collections/s/documents/search",
                          query={"q": "quick", "query_by": "title"})
        assert code == 200 and res["found"] == 500

        # cert refresh: replace the cert files; new connections must
        # handshake with the NEW certificate (mtime-poll reload)
        import time
        cert2, key2 = make_cert(tmp_path / "..", cn="refreshed.example")
        # overwrite in place (same paths the server watches)
        os.replace(cert2, cert)
        os.replace(key2, key)
        deadline = time.time() + 60
        new_cn = None
        while time.time() < deadline:
            time.sleep(1.0)
            pem = ssl.get_server_certificate(("127.0.0.1", port))
            der = ssl.PEM_cert_to_DER_cert(pem)
            # cheap CN sniff without a parser dependency
            if b"refreshed.example" in der:
                new_cn = "refreshed.example"
                break
        assert new_cn == "refreshed.example"
    finally:
        srv.stop()


def test_chunked_plain_http_body(tmp_path):
    """Chunked request bodies must decode on non-import routes too."""
    port = free_port()
    srv = ServerProc(str(tmp_path / "data"), port)
    try:
        srv.wait_healthy()
        body = json.dumps({"name": "c1", "fields": [
            {"name": "t", "type": "string"}]}).encode()

        def chunks():
            yield body[:10]
            yield body[10:]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/collections", body=chunks(),
                     headers={"X-TYPESENSE-API-KEY": API_KEY,
                              "Transfer-Encoding": "chunked"},
                     encode_chunked=True)
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 201, out
        assert out["name"] == "c1"
    finally:
        srv.stop()
