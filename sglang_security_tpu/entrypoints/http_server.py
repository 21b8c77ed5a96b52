"""HTTP / OpenAI-compatible API server (aiohttp).

Parity with the reference's FastAPI server
(``srt/entrypoints/http_server.py``): ``/generate`` (+streaming),
``/v1/completions``, ``/v1/chat/completions``, ``/v1/models``,
``/health``, ``/health_generate``, ``/get_server_info``,
``/flush_cache``, ``/abort_request``, ``/update_weights_from_disk``,
``/metrics`` (Prometheus).  aiohttp replaces FastAPI/uvicorn (not
available in this environment); blocking engine calls run on a thread
pool so the event loop stays responsive while the scheduler thread
drives the TPU.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import uuid
from typing import Optional

from aiohttp import web

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.entrypoints.openai_api.adapter import (
    chat_to_gri,
    completion_to_gri,
)
from sglang_security_tpu.entrypoints.openai_api.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
)
from sglang_security_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class HttpServer:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self.start_time = time.time()
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_server_info", self.server_info)
        r.add_get("/get_model_info", self.model_info)
        r.add_get("/get_load", self.get_load)
        r.add_post("/classify", self.classify)
        r.add_post("/generate_from_file", self.generate_from_file)
        r.add_post("/parse_function_call", self.parse_function_call)
        r.add_post("/separate_reasoning", self.separate_reasoning)
        r.add_post("/start_expert_distribution_record",
                   self.start_expert_record)
        r.add_post("/stop_expert_distribution_record",
                   self.stop_expert_record)
        r.add_post("/dump_expert_distribution_record",
                   self.dump_expert_record)
        r.add_get("/v1/models", self.models)
        r.add_post("/generate", self.generate)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_post("/encode", self.encode)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/update_weights_from_disk", self.update_weights)
        r.add_post("/update_weights_from_tensor",
                   self.update_weights_from_tensor)
        r.add_post("/release_memory_occupation", self.release_memory)
        r.add_post("/resume_memory_occupation", self.resume_memory)
        r.add_post("/save_sharded_checkpoint", self.save_checkpoint)
        r.add_post("/load_sharded_checkpoint", self.load_checkpoint)
        r.add_post("/get_weights_by_name", self.get_weights_by_name)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/configure_logging", self.configure_logging)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_get("/metrics", self.metrics)
        # OpenAI files + batches (reference adapter.py:204-507)
        from sglang_security_tpu.entrypoints.openai_api.files_batches import (
            BatchManager,
            FileStore,
        )

        self.files = FileStore()
        self.batches = BatchManager(self.files, self._batch_run_line)
        r.add_post("/v1/files", self.v1_files_create)
        r.add_get("/v1/files/{fid}", self.v1_file_retrieve)
        r.add_get("/v1/files/{fid}/content", self.v1_file_content)
        r.add_delete("/v1/files/{fid}", self.v1_file_delete)
        r.add_post("/v1/batches", self.v1_batches_create)
        r.add_get("/v1/batches/{bid}", self.v1_batch_retrieve)
        r.add_post("/v1/batches/{bid}/cancel", self.v1_batch_cancel)
        self.app.middlewares.append(self._auth_middleware)

    # ------------------------------------------------------------- helpers
    @web.middleware
    async def _auth_middleware(self, request, handler):
        api_key = self.engine.server_args.api_key
        if api_key and request.path.startswith("/v1"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {api_key}":
                return web.json_response(
                    {"error": {"message": "invalid api key"}}, status=401
                )
        try:
            return await handler(request)
        except web.HTTPException:
            raise
        except Exception as e:
            import json as _json

            import pydantic

            if isinstance(e, (pydantic.ValidationError, _json.JSONDecodeError,
                              KeyError, TypeError, ValueError)):
                return web.json_response(
                    {"error": {"message": str(e),
                               "type": "invalid_request_error"}},
                    status=400,
                )
            logger.exception("handler error")
            return web.json_response(
                {"error": {"message": str(e), "type": "internal_error"}},
                status=500,
            )

    async def _run(self, fn, *args, **kw):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, lambda: fn(*args, **kw))

    # ------------------------------------------------------------ handlers
    async def health(self, request):
        return web.Response(text="ok")

    async def health_generate(self, request):
        out = await self._run(
            self.engine.generate,
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 1, "ignore_eos": True},
        )
        return web.json_response({"status": "ok", "meta": out["meta_info"]})

    async def server_info(self, request):
        info = self.engine.get_server_info()
        info["uptime"] = time.time() - self.start_time
        return web.json_response(info)

    async def model_info(self, request):
        sa = self.engine.server_args
        return web.json_response({
            "model_path": sa.model_path,
            "tokenizer_path": sa.tokenizer_path,
            "is_generation": not sa.is_embedding,
        })

    async def get_load(self, request):
        loads = [
            {
                "num_running_reqs": len(s.running),
                "num_waiting_reqs": len(s.waiting),
                "num_tokens_in_cache": sum(
                    c.total_pages() * s.page_size for c in s.tree_caches
                ),
            }
            for s in self.engine.schedulers
        ]
        return web.json_response(loads)

    async def classify(self, request):
        """Reward / sequence-classification scores via the pooling path
        (reference /classify); the served model's pool() head defines
        the output."""
        body = await request.json()
        res = await self._run(
            self.engine.encode, body.get("text"), body.get("input_ids")
        )
        if isinstance(res, list):
            return web.json_response(
                [{"scores": r["embedding"]} for r in res]
            )
        return web.json_response({"scores": res["embedding"]})

    async def generate_from_file(self, request):
        """Run /generate with the prompt read from an uploaded file id
        (reference generate_from_file)."""
        body = await request.json()
        content = self.files.content(body["file_id"])
        if content is None:
            return web.json_response({"error": "file not found"},
                                     status=404)
        out = await self._run(
            self.engine.generate,
            prompt=content.decode(),
            sampling_params=body.get("sampling_params"),
            user_id=body.get("user_id"),
        )
        return web.json_response(out)

    async def parse_function_call(self, request):
        from sglang_security_tpu.function_call import FunctionCallParser

        body = await request.json()
        normal, calls = FunctionCallParser(
            body.get("tool_call_parser") or "auto"
        ).parse(body["text"])
        return web.json_response({
            "normal_text": normal,
            "calls": [
                {"name": c.name, "parameters": c.arguments} for c in calls
            ],
        })

    async def separate_reasoning(self, request):
        from sglang_security_tpu.function_call.reasoning_parser import (
            ReasoningParser,
        )

        body = await request.json()
        reasoning, normal = ReasoningParser(
            body.get("reasoning_parser", "deepseek-r1")
        ).parse_non_stream(body["text"])
        return web.json_response({
            "reasoning_text": reasoning,
            "text": normal,
        })

    def _eplb_recorder(self):
        rec = self.engine.model_runner.eplb_recorder
        if rec is None:
            raise ValueError(
                "pass --enable-expert-distribution-recorder (MoE models)"
            )
        return rec

    async def start_expert_record(self, request):
        self._eplb_recorder().recording = True
        return web.json_response({"success": True})

    async def stop_expert_record(self, request):
        self._eplb_recorder().recording = False
        return web.json_response({"success": True})

    async def dump_expert_record(self, request):
        rec = self._eplb_recorder()
        return web.json_response({
            "logical_count": rec.dump().tolist(),
            "num_passes": rec.num_passes,
        })

    async def models(self, request):
        name = self.engine.server_args.served_model_name
        return web.json_response(
            {"object": "list", "data": [{"id": name, "object": "model",
                                         "owned_by": "sglang_security_tpu",
                                         "created": int(self.start_time)}]}
        )

    async def generate(self, request):
        body = await request.json()
        stream = body.get("stream", False)
        session_params = body.get("session_params") or {}
        kwargs = dict(
            prompt=body.get("text"),
            input_ids=body.get("input_ids"),
            sampling_params=body.get("sampling_params"),
            user_id=body.get("user_id"),
            rid=body.get("rid"),
            return_logprob=body.get("return_logprob", False),
            session_id=body.get("session_id") or session_params.get("id"),
            bootstrap_host=body.get("bootstrap_host"),
            bootstrap_port=body.get("bootstrap_port"),
            bootstrap_room=body.get("bootstrap_room"),
            image_data=body.get("image_data"),
            audio_data=body.get("audio_data"),
        )
        if not stream:
            out = await self._run(self.engine.generate, **kwargs)
            return web.json_response(out)
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        it = self.engine.generate(stream=True, **kwargs)
        async for chunk in self._aiter(it):
            await resp.write(
                b"data: " + json.dumps(chunk).encode() + b"\n\n"
            )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def _aiter(self, it):
        loop = asyncio.get_running_loop()
        sentinel = object()
        while True:
            item = await loop.run_in_executor(None, next, it, sentinel)
            if item is sentinel:
                return
            yield item

    # --------------------------------------------------------- OpenAI APIs
    async def _completion_payload(self, req: CompletionRequest) -> dict:
        gri = completion_to_gri(req, self.engine.server_args)
        model = req.model or self.engine.server_args.served_model_name
        if req.n > 1:
            # n samples per prompt = n batched engine requests
            # (reference v1_generate_request parallel_sample_num)
            assert isinstance(req.prompt, str) or (
                req.prompt and isinstance(req.prompt[0], int)
            ), "n > 1 with batched prompts is not supported"
            if gri.text is not None:
                gri.text = [gri.text] * req.n
            else:
                gri.input_ids = [gri.input_ids] * req.n
            gri.sampling_params = [
                dict(gri.sampling_params) for _ in range(req.n)
            ]
        outs = await self._run(self._engine_gri, gri)
        choices = [
            {
                "index": i,
                "text": (req.prompt if req.echo and isinstance(req.prompt, str) else "")
                + o["text"],
                "logprobs": self._completion_logprobs(o)
                if req.logprobs is not None else None,
                "finish_reason": o["meta_info"]["finish_reason"]["type"],
            }
            for i, o in enumerate(outs)
        ]
        return {
            "id": f"cmpl-{uuid.uuid4().hex}",
            "object": "text_completion",
            "created": int(time.time()),
            "model": model,
            "choices": choices,
            "usage": self._usage(outs),
        }

    async def v1_completions(self, request):
        body = await request.json()
        req = CompletionRequest(**body)
        if not req.stream:
            return web.json_response(await self._completion_payload(req))
        gri = completion_to_gri(req, self.engine.server_args)
        model = req.model or self.engine.server_args.served_model_name
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"}
        )
        await resp.prepare(request)
        rid = f"cmpl-{uuid.uuid4().hex}"
        it = self.engine.generate(
            prompt=gri.text, input_ids=gri.input_ids,
            sampling_params=gri.sampling_params, stream=True,
            user_id=gri.user_id,
        )
        async for chunk in self._aiter(it):
            fin = chunk["meta_info"]["finish_reason"]
            data = {
                "id": rid, "object": "text_completion",
                "created": int(time.time()), "model": model,
                "choices": [{
                    "index": 0, "text": chunk["delta"], "logprobs": None,
                    "finish_reason": fin["type"] if fin else None,
                }],
            }
            await resp.write(b"data: " + json.dumps(data).encode() + b"\n\n")
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _engine_gri(self, gri):
        out = self.engine.generate(
            prompt=gri.text,
            input_ids=gri.input_ids,
            sampling_params=gri.sampling_params,
            user_id=gri.user_id,
            return_logprob=gri.return_logprob,
        )
        return out if isinstance(out, list) else [out]

    async def _chat_payload(self, req: ChatCompletionRequest) -> dict:
        tokenizer = self.engine.tokenizer_manager.tokenizer
        gri = chat_to_gri(req, tokenizer, self.engine.server_args)
        model = req.model or self.engine.server_args.served_model_name
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        if req.n > 1:
            gri.text = [gri.text] * req.n
            gri.sampling_params = [
                dict(gri.sampling_params) for _ in range(req.n)
            ]
        outs = await self._run(self._engine_gri, gri)
        choices = []
        for i, o in enumerate(outs):
            message = {"role": "assistant", "content": o["text"]}
            finish = o["meta_info"]["finish_reason"]["type"]
            if req.tools:
                from sglang_security_tpu.function_call import (
                    FunctionCallParser,
                )

                normal, calls = FunctionCallParser(
                    self.engine.server_args.tool_call_parser or "auto"
                ).parse(o["text"])
                if calls:
                    message = {
                        "role": "assistant",
                        "content": normal or None,
                        "tool_calls": [
                            {
                                "id": f"call_{uuid.uuid4().hex[:12]}",
                                "type": "function",
                                "function": {
                                    "name": c.name,
                                    "arguments": json.dumps(c.arguments),
                                },
                            }
                            for c in calls
                        ],
                    }
                    finish = "tool_calls"
            choices.append({
                "index": i,
                "message": message,
                "logprobs": self._chat_logprobs(o) if req.logprobs
                else None,
                "finish_reason": finish,
            })
        return {
            "id": rid,
            "object": "chat.completion",
            "created": int(time.time()),
            "model": model,
            "choices": choices,
            "usage": self._usage(outs),
        }

    async def v1_chat(self, request):
        body = await request.json()
        req = ChatCompletionRequest(**body)
        if not req.stream:
            return web.json_response(await self._chat_payload(req))
        tokenizer = self.engine.tokenizer_manager.tokenizer
        gri = chat_to_gri(req, tokenizer, self.engine.server_args)
        model = req.model or self.engine.server_args.served_model_name
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        first = {
            "id": rid, "object": "chat.completion.chunk",
            "created": int(time.time()), "model": model,
            "choices": [{"index": 0,
                         "delta": {"role": "assistant", "content": ""},
                         "finish_reason": None}],
        }
        await resp.write(b"data: " + json.dumps(first).encode() + b"\n\n")
        it = self.engine.generate(
            prompt=gri.text, sampling_params=gri.sampling_params,
            stream=True, user_id=gri.user_id,
        )
        async for chunk in self._aiter(it):
            fin = chunk["meta_info"]["finish_reason"]
            data = {
                "id": rid, "object": "chat.completion.chunk",
                "created": int(time.time()), "model": model,
                "choices": [{
                    "index": 0,
                    "delta": {"content": chunk["delta"]},
                    "finish_reason": fin["type"] if fin else None,
                }],
            }
            await resp.write(b"data: " + json.dumps(data).encode() + b"\n\n")
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _decode_tokens(self, ids):
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            return [str(i) for i in ids]
        return [tok.decode([i]) for i in ids]

    def _completion_logprobs(self, o):
        """OpenAI completions logprobs block (sampled-token logprobs;
        reference v1_generate_response logprob assembly)."""
        lps = o["meta_info"].get("output_token_logprobs") or []
        ids = o.get("output_ids") or []
        toks = self._decode_tokens(ids[: len(lps)])
        offsets, pos = [], 0
        for t in toks:
            offsets.append(pos)
            pos += len(t)
        return {
            "tokens": toks,
            "token_logprobs": [float(x) for x in lps],
            "top_logprobs": [
                {t: float(x)} for t, x in zip(toks, lps)
            ],
            "text_offset": offsets,
        }

    def _chat_logprobs(self, o):
        lps = o["meta_info"].get("output_token_logprobs") or []
        ids = o.get("output_ids") or []
        toks = self._decode_tokens(ids[: len(lps)])
        return {
            "content": [
                {
                    "token": t,
                    "logprob": float(x),
                    "bytes": list(t.encode()),
                    "top_logprobs": [],
                }
                for t, x in zip(toks, lps)
            ]
        }

    def _usage(self, outs):
        pt = sum(o["meta_info"]["prompt_tokens"] for o in outs)
        ct = sum(o["meta_info"]["completion_tokens"] for o in outs)
        cached = sum(o["meta_info"].get("cached_tokens", 0) for o in outs)
        return {
            "prompt_tokens": pt,
            "completion_tokens": ct,
            "total_tokens": pt + ct,
            "prompt_tokens_details": {"cached_tokens": cached},
        }

    # ------------------------------------------------------------- control
    async def _embeddings_payload(self, body: dict) -> dict:
        inp = body.get("input")
        if inp is None:
            raise ValueError("missing 'input'")
        if isinstance(inp, list) and inp and isinstance(inp[0], int):
            res = await self._run(self.engine.encode, None, inp)
            results = [res]
        else:
            res = await self._run(self.engine.encode, inp)
            results = res if isinstance(res, list) else [res]
        data = [
            {"object": "embedding", "index": i, "embedding": r["embedding"]}
            for i, r in enumerate(results)
        ]
        total = sum(r["meta_info"]["prompt_tokens"] for r in results)
        return {
            "object": "list",
            "data": data,
            "model": body.get("model", self.engine.server_args.served_model_name),
            "usage": {"prompt_tokens": total, "total_tokens": total},
        }

    async def v1_embeddings(self, request):
        """OpenAI embeddings API (reference openai_api v1_embeddings)."""
        body = await request.json()
        return web.json_response(await self._embeddings_payload(body))

    # ------------------------------------------------- files + batches
    async def _batch_run_line(self, url: str, body: dict) -> dict:
        """Execute one batch JSONL line (reference process_batch:291)."""
        if url == "/v1/completions":
            return await self._completion_payload(CompletionRequest(**body))
        if url == "/v1/chat/completions":
            return await self._chat_payload(ChatCompletionRequest(**body))
        if url == "/v1/embeddings":
            return await self._embeddings_payload(body)
        raise ValueError(f"unsupported batch url {url!r}")

    async def v1_files_create(self, request):
        reader = await request.multipart()
        filename, purpose, content = "file", "batch", b""
        async for part in reader:
            if part.name == "purpose":
                purpose = (await part.read()).decode()
            elif part.name == "file":
                filename = part.filename or "file"
                content = await part.read()
        obj = self.files.save(filename, purpose, content)
        return web.json_response(obj)

    async def v1_file_retrieve(self, request):
        obj = self.files.get(request.match_info["fid"])
        if obj is None:
            return web.json_response({"error": "file not found"}, status=404)
        return web.json_response(obj)

    async def v1_file_content(self, request):
        content = self.files.content(request.match_info["fid"])
        if content is None:
            return web.json_response({"error": "file not found"}, status=404)
        return web.Response(body=content,
                            content_type="application/octet-stream")

    async def v1_file_delete(self, request):
        fid = request.match_info["fid"]
        ok = self.files.delete(fid)
        if not ok:
            return web.json_response({"error": "file not found"}, status=404)
        return web.json_response(
            {"id": fid, "object": "file", "deleted": True}
        )

    async def v1_batches_create(self, request):
        body = await request.json()
        try:
            batch = self.batches.create(
                input_file_id=body["input_file_id"],
                endpoint=body.get("endpoint", "/v1/chat/completions"),
                completion_window=body.get("completion_window", "24h"),
                metadata=body.get("metadata"),
            )
        except (KeyError, ValueError) as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response(batch)

    async def v1_batch_retrieve(self, request):
        batch = self.batches.retrieve(request.match_info["bid"])
        if batch is None:
            return web.json_response({"error": "batch not found"}, status=404)
        return web.json_response(batch)

    async def v1_batch_cancel(self, request):
        batch = self.batches.cancel(request.match_info["bid"])
        if batch is None:
            return web.json_response({"error": "batch not found"}, status=404)
        return web.json_response(batch)

    async def encode(self, request):
        body = await request.json()
        res = await self._run(
            self.engine.encode, body.get("text"), body.get("input_ids")
        )
        return web.json_response(res)

    async def flush_cache(self, request):
        ok = await self._run(self.engine.flush_cache)
        return web.json_response({"success": ok})

    async def abort_request(self, request):
        body = await request.json()
        self.engine.abort_request(body.get("rid", ""))
        return web.json_response({"success": True})

    async def update_weights_from_tensor(self, request):
        """RL weight push: {"named_tensors": [[name, {"shape", "dtype",
        "data_b64"}], ...]} (reference update_weights_from_tensor)."""
        import base64

        import numpy as np

        body = await request.json()
        pairs = []
        for name, t in body["named_tensors"]:
            arr = np.frombuffer(
                base64.b64decode(t["data_b64"]), dtype=np.dtype(t["dtype"])
            ).reshape(t["shape"])
            pairs.append((name, arr))
        ok = await self._run(
            self.engine.update_weights_from_tensor, pairs,
            body.get("load_format"),
        )
        return web.json_response({"success": bool(ok)})

    async def release_memory(self, request):
        ok = await self._run(self.engine.release_memory_occupation)
        return web.json_response({"success": bool(ok)})

    async def resume_memory(self, request):
        ok = await self._run(self.engine.resume_memory_occupation)
        return web.json_response({"success": bool(ok)})

    async def save_checkpoint(self, request):
        body = await request.json()
        n = await self._run(
            self.engine.save_sharded_checkpoint, body["path"]
        )
        return web.json_response({"success": True, "num_tensors": n})

    async def load_checkpoint(self, request):
        body = await request.json()
        ok = await self._run(
            self.engine.load_sharded_checkpoint, body["path"]
        )
        return web.json_response({"success": bool(ok)})

    async def get_weights_by_name(self, request):
        body = await request.json()
        arr = await self._run(
            self.engine.get_weights_by_name, body["name"],
            body.get("truncate_size", 100),
        )
        if arr is None:
            return web.json_response({"error": "unknown name"}, status=404)
        return web.json_response({"values": [float(x) for x in arr]})

    async def update_weights(self, request):
        body = await request.json()
        ok = await self._run(
            self.engine.update_weights_from_disk, body["model_path"]
        )
        return web.json_response({"success": ok})

    async def start_profile(self, request):
        try:
            body = await request.json()
        except Exception:
            body = {}
        out_dir = body.get("output_dir", "/tmp/sgl_tpu_profile")
        ok = await self._run(self.engine.start_profile, out_dir)
        return web.json_response({"success": ok, "output_dir": out_dir})

    async def stop_profile(self, request):
        ok = await self._run(self.engine.stop_profile)
        return web.json_response({"success": ok})

    async def configure_logging(self, request):
        body = await request.json()
        import logging as _logging

        level = body.get("log_level")
        if level:
            _logging.getLogger().setLevel(level.upper())
            for name in list(_logging.root.manager.loggerDict):
                if name.startswith("sglang_security_tpu"):
                    _logging.getLogger(name).setLevel(level.upper())
        self.engine.server_args.log_requests = bool(
            body.get("log_requests", self.engine.server_args.log_requests)
        )
        return web.json_response({"success": True})

    async def open_session(self, request):
        body = await request.json()
        sid = self.engine.open_session(
            body.get("session_id"),
            body.get("capacity_of_str_len", 1 << 20),
        )
        return web.json_response({"session_id": sid})

    async def close_session(self, request):
        body = await request.json()
        ok = self.engine.close_session(body["session_id"])
        return web.json_response({"success": ok})

    async def metrics(self, request):
        try:
            from prometheus_client import generate_latest

            from sglang_security_tpu.metrics.collector import REGISTRY

            return web.Response(
                body=generate_latest(REGISTRY),
                content_type="text/plain",
            )
        except Exception:
            return web.Response(text="")


def build_app(engine: Engine) -> web.Application:
    """aiohttp Application serving an existing Engine (embedding the API
    server in another process / test harness)."""
    return HttpServer(engine).app


def launch_server(server_args: ServerArgs) -> None:
    engine = Engine(server_args)
    server = HttpServer(engine)
    logger.info(
        "serving on http://%s:%d", server_args.host, server_args.port
    )
    web.run_app(
        server.app,
        host=server_args.host,
        port=server_args.port,
        print=None,
        access_log=None,
    )
