"""tools/bench_one_batch_server.py (reference
``python/sglang/bench_one_batch_server.py``): single-batch latency
measurement through the HTTP interface, against an in-process tiny
server."""

import socket
import threading
import time

import pytest

requests = pytest.importorskip("requests")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()
BASE = f"http://127.0.0.1:{PORT}"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    try:
        from aiohttp import web
    except ImportError:
        pytest.skip("aiohttp not available")
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.entrypoints.http_server import build_app
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_bobs") / "llama")
    make_tiny_llama(path)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=4096,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 16], random_seed=0,
        skip_tokenizer_init=True,
    ))
    app = build_app(eng)
    runner = web.AppRunner(app)

    def serve():
        import asyncio

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", PORT)
        loop.run_until_complete(site.start())
        loop.run_forever()

    threading.Thread(target=serve, daemon=True).start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            requests.get(BASE + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.2)
    yield BASE
    eng.shutdown()


def test_run_one_case(server):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from bench_one_batch_server import run_one_case

    res = run_one_case(server, bs=2, input_len=16, output_len=4,
                       temperature=0.0, vocab=200)
    assert res["batch_size"] == 2
    assert res["ttft_s"] > 0 and res["latency_s"] >= res["ttft_s"]
    assert res["output_throughput_tok_s"] > 0
    assert res["input_throughput_tok_s"] > 0
