"""C++ router e2e: two mock workers behind the cache-aware router."""

import json
import socket
import subprocess
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
import requests

from sglang_security_tpu.router_launcher import ensure_built, launch_router


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class MockWorker:
    """Tiny HTTP server that echoes which worker served the request."""

    def __init__(self, name):
        self.name = name
        self.port = free_port()
        self.hits = 0
        worker = self

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)
                worker.hits += 1
                body = json.dumps({"worker": worker.name}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.httpd = HTTPServer(("127.0.0.1", self.port), H)
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()  # release the listen socket too


@pytest.fixture(scope="module")
def cluster():
    ensure_built()
    w1, w2 = MockWorker("w1"), MockWorker("w2")
    port = free_port()
    proc = launch_router(
        port,
        [f"127.0.0.1:{w1.port}", f"127.0.0.1:{w2.port}"],
        policy="cache_aware",
        cache_threshold=0.3,
    )
    base = f"http://127.0.0.1:{port}"
    for _ in range(50):
        try:
            if requests.get(base + "/health", timeout=0.5).ok:
                break
        except Exception:
            time.sleep(0.1)
    yield base, w1, w2, proc
    proc.terminate()
    proc.wait(timeout=5)
    w1.stop()
    w2.stop()


def test_health_and_list(cluster):
    base, *_ = cluster
    assert requests.get(base + "/health").json()["status"] == "ok"
    workers = requests.get(base + "/list_workers").json()["workers"]
    assert len(workers) == 2


def test_cache_affinity(cluster):
    base, w1, w2, _ = cluster
    prompt = "a very long shared prefix that should stick to one worker " * 3
    first = requests.post(
        base + "/generate", json={"text": prompt + "v1"}
    ).json()["worker"]
    # same prefix repeatedly -> always the same worker
    for i in range(6):
        got = requests.post(
            base + "/generate", json={"text": prompt + f"v{i}"}
        ).json()["worker"]
        assert got == first


def test_distinct_prompts_balance(cluster):
    base, w1, w2, _ = cluster
    seen = set()
    for i in range(12):
        got = requests.post(
            base + "/generate",
            json={"text": f"{i} prompt {i} with a distinct head {'x' * i}"},
        ).json()["worker"]
        seen.add(got)
    assert seen == {"w1", "w2"}  # shortest-queue fallback spreads load


def test_metrics_endpoint(cluster):
    base, *_ = cluster
    text = requests.get(base + "/metrics").text
    assert "sgl_router_requests_total" in text
    assert "sgl_router_cache_routed_total" in text


def test_remove_worker(cluster):
    base, w1, w2, _ = cluster
    requests.post(base + f"/remove_worker?url=127.0.0.1:{w2.port}", json={})
    workers = requests.get(base + "/list_workers").json()["workers"]
    assert len(workers) == 1
    # traffic still flows to the remaining worker
    got = requests.post(base + "/generate", json={"text": "post-removal"})
    assert got.ok
    requests.post(base + f"/add_worker?url=127.0.0.1:{w2.port}", json={})
    assert len(requests.get(base + "/list_workers").json()["workers"]) == 2


def test_service_discovery_and_health_recovery(tmp_path):
    """File-based service discovery (the k8s-watch analog): workers
    join/leave by editing the workers file; the health checker evicts a
    dead worker and recovers it when it comes back."""
    ensure_built()
    w1, w2 = MockWorker("w1"), MockWorker("w2")
    wf = tmp_path / "workers.txt"
    wf.write_text(f"127.0.0.1:{w1.port}\n")
    port = free_port()
    proc = launch_router(
        port, [], workers_file=str(wf), discovery_interval=1,
        health_check_interval=1,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(50):
            try:
                if requests.get(base + "/health", timeout=0.5).ok:
                    break
            except Exception:
                time.sleep(0.1)

        def worker_set():
            ws = requests.get(base + "/list_workers", timeout=2).json()
            return {
                (w["worker"] if "worker" in w else w.get("url", "")):
                w.get("healthy", True)
                for w in ws.get("workers", ws if isinstance(ws, list) else [])
            }

        deadline = time.time() + 10
        while time.time() < deadline and len(worker_set()) != 1:
            time.sleep(0.3)
        assert len(worker_set()) == 1

        # add w2 via the file
        wf.write_text(f"127.0.0.1:{w1.port}\n127.0.0.1:{w2.port}\n")
        deadline = time.time() + 10
        while time.time() < deadline and len(worker_set()) != 2:
            time.sleep(0.3)
        assert len(worker_set()) == 2

        # kill w2 -> health checker marks it unhealthy, traffic flows to w1
        w2.stop()
        deadline = time.time() + 15
        while time.time() < deadline:
            r = requests.post(base + "/generate",
                              json={"text": "ping"}, timeout=5)
            if r.ok and r.json()["worker"] == "w1":
                healthy = worker_set()
                if healthy.get(f"127.0.0.1:{w2.port}") is False:
                    break
            time.sleep(0.5)
        vals = worker_set()
        assert vals.get(f"127.0.0.1:{w2.port}") is False

        # remove w2 from the file entirely
        wf.write_text(f"127.0.0.1:{w1.port}\n")
        deadline = time.time() + 10
        while time.time() < deadline and len(worker_set()) != 1:
            time.sleep(0.3)
        assert len(worker_set()) == 1
    finally:
        proc.terminate()
        proc.wait(timeout=5)
        w1.stop()
