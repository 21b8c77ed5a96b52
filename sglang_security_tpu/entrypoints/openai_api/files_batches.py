"""OpenAI Files + Batches API backing store and batch executor.

Re-creation of the reference's batch-file machinery
(``srt/openai_api/adapter.py:204`` v1_files_create, ``:259`` v1_batches,
``:291`` process_batch, ``:425-507`` retrieve/cancel/file-content) for
the aiohttp server: files spool to a local directory; a batch reads its
input JSONL, executes every line against the engine through a supplied
``run_line(url, body)`` coroutine, and writes output/error JSONL files
that can be fetched via /v1/files/{id}/content.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import time
import uuid
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)

SUPPORTED_ENDPOINTS = (
    "/v1/completions",
    "/v1/chat/completions",
    "/v1/embeddings",
)


class FileStore:
    """Disk-spooled file objects (purpose=batch / batch_output)."""

    def __init__(self, spool_dir: Optional[str] = None):
        self.dir = spool_dir or os.path.join(
            "/tmp", f"sgl_tpu_files_{os.getpid()}"
        )
        os.makedirs(self.dir, exist_ok=True)
        self.meta: Dict[str, dict] = {}

    def save(self, filename: str, purpose: str, content: bytes) -> dict:
        fid = f"file-{uuid.uuid4().hex[:24]}"
        with open(os.path.join(self.dir, fid), "wb") as f:
            f.write(content)
        obj = {
            "id": fid,
            "object": "file",
            "bytes": len(content),
            "created_at": int(time.time()),
            "filename": filename,
            "purpose": purpose,
        }
        self.meta[fid] = obj
        return obj

    def get(self, fid: str) -> Optional[dict]:
        return self.meta.get(fid)

    def content(self, fid: str) -> Optional[bytes]:
        if fid not in self.meta:
            return None
        with open(os.path.join(self.dir, fid), "rb") as f:
            return f.read()

    def delete(self, fid: str) -> bool:
        if fid not in self.meta:
            return False
        try:
            os.unlink(os.path.join(self.dir, fid))
        except FileNotFoundError:
            pass
        del self.meta[fid]
        return True


class BatchManager:
    """Executes OpenAI batches against the engine.

    ``run_line(url, body) -> dict`` performs one request and returns the
    response payload (the non-streaming JSON the HTTP endpoint would
    return); exceptions become per-line error records, mirroring the
    reference's per-request try/except in process_batch.
    """

    def __init__(self, files: FileStore, run_line: Callable):
        self.files = files
        self.run_line = run_line
        self.batches: Dict[str, dict] = {}
        self._tasks: Dict[str, asyncio.Task] = {}
        self._cancel: Dict[str, bool] = {}

    def create(self, input_file_id: str, endpoint: str,
               completion_window: str = "24h",
               metadata: Optional[dict] = None) -> dict:
        if endpoint not in SUPPORTED_ENDPOINTS:
            raise ValueError(
                f"unsupported endpoint {endpoint!r}; one of "
                f"{SUPPORTED_ENDPOINTS}"
            )
        if self.files.get(input_file_id) is None:
            raise ValueError(f"unknown input_file_id {input_file_id!r}")
        bid = f"batch_{uuid.uuid4().hex[:24]}"
        batch = {
            "id": bid,
            "object": "batch",
            "endpoint": endpoint,
            "errors": None,
            "input_file_id": input_file_id,
            "completion_window": completion_window,
            "status": "validating",
            "output_file_id": None,
            "error_file_id": None,
            "created_at": int(time.time()),
            "in_progress_at": None,
            "completed_at": None,
            "failed_at": None,
            "cancelled_at": None,
            "request_counts": {"total": 0, "completed": 0, "failed": 0},
            "metadata": metadata,
        }
        self.batches[bid] = batch
        self._cancel[bid] = False
        self._tasks[bid] = asyncio.get_event_loop().create_task(
            self._process(bid)
        )
        return batch

    def retrieve(self, bid: str) -> Optional[dict]:
        return self.batches.get(bid)

    def cancel(self, bid: str) -> Optional[dict]:
        batch = self.batches.get(bid)
        if batch is None:
            return None
        if batch["status"] in ("completed", "failed", "cancelled"):
            return batch
        self._cancel[bid] = True
        batch["status"] = "cancelling"
        return batch

    async def _process(self, bid: str) -> None:
        batch = self.batches[bid]
        try:
            raw = self.files.content(batch["input_file_id"]) or b""
            lines = [ln for ln in raw.decode().splitlines() if ln.strip()]
            batch["request_counts"]["total"] = len(lines)
            batch["status"] = "in_progress"
            batch["in_progress_at"] = int(time.time())
            out_rows, err_rows = [], []
            for ln in lines:
                if self._cancel[bid]:
                    batch["status"] = "cancelled"
                    batch["cancelled_at"] = int(time.time())
                    break
                rid = f"batch_req_{uuid.uuid4().hex[:16]}"
                try:
                    item = json.loads(ln)
                    custom_id = item.get("custom_id")
                    url = item.get("url") or batch["endpoint"]
                    if url != batch["endpoint"]:
                        raise ValueError(
                            f"line url {url!r} != batch endpoint"
                        )
                    body = item.get("body") or {}
                    payload = await self.run_line(url, body)
                    out_rows.append({
                        "id": rid,
                        "custom_id": custom_id,
                        "response": {"status_code": 200, "body": payload},
                        "error": None,
                    })
                    batch["request_counts"]["completed"] += 1
                except Exception as e:  # per-line failure -> error file
                    logger.warning("batch %s line failed: %s", bid, e)
                    err_rows.append({
                        "id": rid,
                        "custom_id": item.get("custom_id")
                        if isinstance(item, dict) else None,
                        "response": None,
                        "error": {"code": type(e).__name__,
                                  "message": str(e)},
                    })
                    batch["request_counts"]["failed"] += 1
            if out_rows or batch["status"] != "cancelled":
                obj = self.files.save(
                    f"{bid}_output.jsonl", "batch_output",
                    "\n".join(json.dumps(r) for r in out_rows).encode(),
                )
                batch["output_file_id"] = obj["id"]
            if err_rows:
                obj = self.files.save(
                    f"{bid}_errors.jsonl", "batch_output",
                    "\n".join(json.dumps(r) for r in err_rows).encode(),
                )
                batch["error_file_id"] = obj["id"]
            if batch["status"] != "cancelled":
                batch["status"] = "completed"
                batch["completed_at"] = int(time.time())
        except Exception as e:
            logger.exception("batch %s failed", bid)
            batch["status"] = "failed"
            batch["failed_at"] = int(time.time())
            batch["errors"] = {"object": "list", "data": [
                {"code": type(e).__name__, "message": str(e)}
            ]}
