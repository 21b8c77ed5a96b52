"""OpenAI n>1 sampling (reference parallel_sample_num handling)."""

import threading
import time

import pytest

requests = pytest.importorskip("requests")

import socket as _socket


def _free_port():
    sk = _socket.socket()
    sk.bind(("127.0.0.1", 0))
    p = sk.getsockname()[1]
    sk.close()
    return p


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

    path = str(tmp_path_factory.mktemp("tiny_n") / "llama")
    make_tiny_llama(path)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64, 128],
        decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8],
        random_seed=0, enable_warmup=False, log_level="warning",
    ))
    app = build_app(eng)
    runner = web.AppRunner(app)
    holder = {}

    def serve():
        import asyncio

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        holder["loop"] = loop
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
    holder["loop"].call_soon_threadsafe(holder["loop"].stop)
    eng.shutdown()


def test_completions_n3(server):
    r = requests.post(server + "/v1/completions", json={
        "model": "x", "prompt": "tell me something",
        "max_tokens": 6, "n": 3, "temperature": 0.9, "ignore_eos": True,
    }, timeout=120).json()
    assert len(r["choices"]) == 3
    assert [c["index"] for c in r["choices"]] == [0, 1, 2]
    assert r["usage"]["completion_tokens"] == 18
    # high-temperature samples should not all be identical
    texts = {c["text"] for c in r["choices"]}
    assert len(texts) >= 2, texts


def test_chat_n2_with_logprobs(server):
    r = requests.post(server + "/v1/chat/completions", json={
        "model": "x",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "n": 2, "temperature": 0.8,
        "logprobs": True, "ignore_eos": True,
    }, timeout=120).json()
    assert len(r["choices"]) == 2
    for c in r["choices"]:
        assert c["message"]["role"] == "assistant"
        assert len(c["logprobs"]["content"]) == 4
        assert all(e["logprob"] <= 0 for e in c["logprobs"]["content"])
