"""End-to-end HTTP test of /v1/files + /v1/batches against the real
server + engine (reference adapter.py:204-507 batch flow)."""

import json
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

    path = str(tmp_path_factory.mktemp("tiny_http") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(model_path=path, dtype="float32", max_total_tokens=4096,
                   page_size=8, prefill_token_buckets=[128, 256],
                   decode_bs_buckets=[1, 4, 8], max_seq_pages_buckets=[8, 16],
                   random_seed=0)
    )
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

    t = threading.Thread(target=serve, daemon=True)
    t.start()
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


def test_files_upload_retrieve_delete(server):
    content = b'{"custom_id": "x"}\n'
    r = requests.post(
        server + "/v1/files",
        files={"file": ("in.jsonl", content)},
        data={"purpose": "batch"},
        timeout=10,
    )
    assert r.status_code == 200, r.text
    obj = r.json()
    assert obj["object"] == "file" and obj["purpose"] == "batch"
    fid = obj["id"]
    assert requests.get(
        server + f"/v1/files/{fid}", timeout=10
    ).json()["filename"] == "in.jsonl"
    assert requests.get(
        server + f"/v1/files/{fid}/content", timeout=10
    ).content == content
    assert requests.delete(
        server + f"/v1/files/{fid}", timeout=10
    ).json()["deleted"]
    assert requests.get(
        server + f"/v1/files/{fid}", timeout=10
    ).status_code == 404


def test_batch_chat_end_to_end(server):
    lines = [
        {"custom_id": f"req-{i}", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"model": "x",
                  "messages": [{"role": "user", "content": f"hi {i}"}],
                  "max_tokens": 4}}
        for i in range(3)
    ]
    raw = "\n".join(json.dumps(l) for l in lines).encode()
    fid = requests.post(
        server + "/v1/files",
        files={"file": ("batch.jsonl", raw)},
        data={"purpose": "batch"},
        timeout=10,
    ).json()["id"]
    batch = requests.post(
        server + "/v1/batches",
        json={"input_file_id": fid, "endpoint": "/v1/chat/completions",
              "completion_window": "24h"},
        timeout=10,
    ).json()
    bid = batch["id"]
    assert batch["status"] in ("validating", "in_progress")
    deadline = time.time() + 120
    while time.time() < deadline:
        batch = requests.get(server + f"/v1/batches/{bid}", timeout=10).json()
        if batch["status"] in ("completed", "failed", "cancelled"):
            break
        time.sleep(0.5)
    assert batch["status"] == "completed", batch
    assert batch["request_counts"] == {
        "total": 3, "completed": 3, "failed": 0}
    out = requests.get(
        server + f"/v1/files/{batch['output_file_id']}/content", timeout=10
    ).content.decode()
    rows = [json.loads(l) for l in out.splitlines()]
    assert {r["custom_id"] for r in rows} == {"req-0", "req-1", "req-2"}
    body = rows[0]["response"]["body"]
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["role"] == "assistant"


def test_batch_bad_endpoint_rejected(server):
    r = requests.post(
        server + "/v1/batches",
        json={"input_file_id": "file-nope",
              "endpoint": "/v1/chat/completions"},
        timeout=10,
    )
    assert r.status_code == 400


def test_info_load_parse_endpoints(server):
    r = requests.get(server + "/get_model_info", timeout=10).json()
    assert "model_path" in r and r["is_generation"] is True
    loads = requests.get(server + "/get_load", timeout=10).json()
    assert loads and "num_running_reqs" in loads[0]

    r = requests.post(server + "/parse_function_call", json={
        "text": '<tool_call>{"name": "get_weather", '
                '"arguments": {"city": "Paris"}}</tool_call>',
    }, timeout=10).json()
    assert r["calls"] and r["calls"][0]["name"] == "get_weather"

    r = requests.post(server + "/separate_reasoning", json={
        "text": "I think hard.</think>The answer is 4.",
        "reasoning_parser": "deepseek-r1",
    }, timeout=10).json()
    assert r["text"].strip() == "The answer is 4."
    assert "think hard" in r["reasoning_text"]


def test_generate_from_file(server):
    fid = requests.post(
        server + "/v1/files",
        files={"file": ("p.txt", b"the quick brown fox")},
        data={"purpose": "batch"},
        timeout=10,
    ).json()["id"]
    r = requests.post(server + "/generate_from_file", json={
        "file_id": fid,
        "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                            "ignore_eos": True},
    }, timeout=120).json()
    assert r["meta_info"]["completion_tokens"] == 4
