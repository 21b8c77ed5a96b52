"""OpenAI Files + Batches API (reference adapter.py:204-507)."""

import asyncio
import json

import pytest

from sglang_security_tpu.entrypoints.openai_api.files_batches import (
    BatchManager,
    FileStore,
)


def test_file_store_roundtrip(tmp_path):
    fs = FileStore(str(tmp_path / "spool"))
    obj = fs.save("in.jsonl", "batch", b"hello")
    assert obj["object"] == "file" and obj["bytes"] == 5
    assert fs.get(obj["id"])["filename"] == "in.jsonl"
    assert fs.content(obj["id"]) == b"hello"
    assert fs.delete(obj["id"])
    assert fs.get(obj["id"]) is None
    assert not fs.delete(obj["id"])


def _mk_input(fs, lines):
    raw = "\n".join(json.dumps(l) for l in lines).encode()
    return fs.save("batch_in.jsonl", "batch", raw)["id"]


def test_batch_completes_and_writes_output(tmp_path):
    fs = FileStore(str(tmp_path / "spool"))

    async def run_line(url, body):
        assert url == "/v1/completions"
        return {"object": "text_completion",
                "choices": [{"text": body["prompt"].upper()}]}

    async def main():
        bm = BatchManager(fs, run_line)
        fid = _mk_input(fs, [
            {"custom_id": "a", "url": "/v1/completions",
             "body": {"prompt": "x"}},
            {"custom_id": "b", "url": "/v1/completions",
             "body": {"prompt": "y"}},
        ])
        batch = bm.create(fid, "/v1/completions")
        await bm._tasks[batch["id"]]
        return bm.retrieve(batch["id"])

    batch = asyncio.run(main())
    assert batch["status"] == "completed"
    assert batch["request_counts"] == {
        "total": 2, "completed": 2, "failed": 0}
    rows = [json.loads(l) for l in
            fs.content(batch["output_file_id"]).decode().splitlines()]
    assert {r["custom_id"] for r in rows} == {"a", "b"}
    assert rows[0]["response"]["status_code"] == 200


def test_batch_per_line_errors_go_to_error_file(tmp_path):
    fs = FileStore(str(tmp_path / "spool"))

    async def run_line(url, body):
        if body.get("boom"):
            raise ValueError("kaput")
        return {"ok": True}

    async def main():
        bm = BatchManager(fs, run_line)
        fid = _mk_input(fs, [
            {"custom_id": "good", "url": "/v1/completions", "body": {}},
            {"custom_id": "bad", "url": "/v1/completions",
             "body": {"boom": 1}},
        ])
        batch = bm.create(fid, "/v1/completions")
        await bm._tasks[batch["id"]]
        return bm.retrieve(batch["id"])

    batch = asyncio.run(main())
    assert batch["status"] == "completed"
    assert batch["request_counts"]["completed"] == 1
    assert batch["request_counts"]["failed"] == 1
    errs = [json.loads(l) for l in
            fs.content(batch["error_file_id"]).decode().splitlines()]
    assert errs[0]["custom_id"] == "bad"
    assert errs[0]["error"]["message"] == "kaput"


def test_batch_validation():
    fs = FileStore()

    async def run_line(url, body):
        return {}

    async def main():
        bm = BatchManager(fs, run_line)
        with pytest.raises(ValueError):
            bm.create("file-nope", "/v1/completions")
        with pytest.raises(ValueError):
            fid = _mk_input(fs, [])
            bm.create(fid, "/v1/rerank")

    asyncio.run(main())


def test_batch_cancel(tmp_path):
    fs = FileStore(str(tmp_path / "spool"))
    started = asyncio.Event()

    async def run_line(url, body):
        started.set()
        await asyncio.sleep(0.05)
        return {}

    async def main():
        bm = BatchManager(fs, run_line)
        fid = _mk_input(fs, [
            {"custom_id": str(i), "url": "/v1/completions", "body": {}}
            for i in range(50)
        ])
        batch = bm.create(fid, "/v1/completions")
        await started.wait()
        bm.cancel(batch["id"])
        await bm._tasks[batch["id"]]
        return bm.retrieve(batch["id"])

    batch = asyncio.run(main())
    assert batch["status"] == "cancelled"
    assert batch["request_counts"]["completed"] < 50
