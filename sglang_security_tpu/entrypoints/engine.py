"""In-process Engine API.

Parity with the reference's ``Engine`` (``srt/entrypoints/engine.py:89``):
``generate`` / ``async_generate`` / ``encode`` / ``flush_cache`` /
``update_weights_from_disk`` / ``shutdown``, re-designed for the
one-process-per-host TPU runtime: the scheduler runs on a dedicated
thread (no scheduler subprocesses, no ZMQ), requests flow through
thread-safe queues, and streamed outputs fan out to per-rid queues.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Dict, Iterator, List, Optional, Union

from sglang_security_tpu.managers.io_struct import GenerateReqInput, StepOutput
from sglang_security_tpu.managers.scheduler import Scheduler
from sglang_security_tpu.managers.tokenizer_manager import TokenizerManager
from sglang_security_tpu.model_executor.model_runner import ModelRunner
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.utils import configure_logger, set_random_seed

logger = logging.getLogger(__name__)


class Engine:
    def __init__(self, server_args: Optional[ServerArgs] = None, **kwargs):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        self.server_args = server_args
        if server_args.device == "cpu":
            # must land before any jax backend initialization; the env
            # var alone is overridden by accelerator plugins
            import jax

            jax.config.update("jax_platforms", "cpu")
        configure_logger(server_args.log_level)
        set_random_seed(server_args.random_seed)

        from sglang_security_tpu.distributed import maybe_init_distributed

        maybe_init_distributed(server_args)  # nnodes > 1: join the cluster
        self.tokenizer_manager = TokenizerManager(server_args)

        # dp_size > 1: in-process data parallelism as engine-level model
        # replicas, each with its own scheduler thread, KV pool, and radix
        # cache — the one-process analog of the reference's
        # DataParallelController (``data_parallel_controller.py:57``),
        # dispatching by shortest queue (``:258``).  Each replica's
        # ModelRunner owns a (1, tp) mesh over its tp_size devices.
        dp = max(server_args.dp_size, 1)
        tp = max(server_args.tp_size, 1)
        if server_args.enable_dp_attention:
            # dp attention: ONE runner over a (dp, tp) mesh -- the dp
            # axis shards the batch + KV inside the step, not engine
            # replicas (model_runner.py dp_attn_size)
            self.model_runners = [ModelRunner(server_args)]
        elif dp > 1:
            import jax

            devs = jax.devices()
            assert len(devs) >= dp * tp, (
                f"dp_size={dp} x tp_size={tp} needs {dp * tp} devices; "
                f"found {len(devs)}"
            )
            from sglang_security_tpu.parallel.shardings import build_mesh

            self.model_runners = [
                ModelRunner(
                    server_args,
                    mesh=build_mesh(
                        tp_size=tp, dp_size=1,
                        devices=devs[i * tp : (i + 1) * tp],
                    ),
                )
                for i in range(dp)
            ]
        else:
            self.model_runners = [ModelRunner(server_args)]
        self.model_runner = self.model_runners[0]
        from sglang_security_tpu.managers.multimodal_processor import (
            get_mm_processor,
        )

        self.tokenizer_manager.mm_processor = get_mm_processor(
            self.model_runner.config
        )
        self.tokenizer_manager.model_context_len = (
            server_args.context_length or self.model_runner.config.max_position
        )
        if server_args.enable_safekv and server_args.safekv_epoch_seconds:
            from sglang_security_tpu.global_epoch import global_epoch

            global_epoch.set_window(server_args.safekv_epoch_seconds)
        from sglang_security_tpu.metrics import collector as _collector

        _collector.set_enabled(server_args.enable_metrics)

        self.privacy_clients = []
        self.schedulers = []
        for runner in self.model_runners:
            privacy_client = None
            if server_args.enable_safekv:
                from sglang_security_tpu.managers.private_service.private_client import (
                    PrivateJudgeClient,
                )

                def llm_judge_fn(prompt, rid=None):
                    # tier-3 judge rides the engine's own generate path;
                    # the scheduler fast-tracks PRIVACY_DETECTION_LLM_*
                    # rids (reference scheduler.py:2468-2471 priority lane)
                    return self.generate(
                        prompt=prompt,
                        rid=rid,
                        sampling_params={
                            "temperature": 0.0,
                            "max_new_tokens": 4,
                            "ignore_eos": True,
                        },
                    )

                privacy_client = PrivateJudgeClient(
                    server_args, llm_judge_fn=llm_judge_fn
                )
            self.privacy_clients.append(privacy_client)

            grammar_backend = None
            if self.tokenizer_manager.tokenizer is not None:
                from sglang_security_tpu.constrained import GrammarBackend

                grammar_backend = GrammarBackend(
                    self.tokenizer_manager.tokenizer,
                    runner.config.eos_token_ids,
                    whitespace_pattern=server_args.constrained_json_whitespace_pattern,
                )
            self.schedulers.append(
                Scheduler(
                    server_args,
                    runner,
                    output_cb=self._on_output,
                    tokenizer=self.tokenizer_manager.tokenizer,
                    privacy_client=privacy_client,
                    grammar_backend=grammar_backend,
                )
            )
        self.scheduler = self.schedulers[0]
        self.privacy_client = self.privacy_clients[0]
        from sglang_security_tpu.managers.session_controller import (
            SessionController,
        )

        self.session_controller = (
            SessionController() if server_args.enable_session else None
        )
        # multi-host lockstep: node 0 broadcasts each iteration's op
        # batch; follower nodes run the same scheduler over that stream
        # (distributed/control_plane.py; reference broadcast_pyobj,
        # scheduler.py:830-906)
        from sglang_security_tpu.distributed.control_plane import (
            make_control_plane,
        )

        self._control_plane = make_control_plane(server_args)
        self._in_queues = [queue.Queue() for _ in self.schedulers]
        self._in_queue = self._in_queues[0]
        self._rid_queues: Dict[str, queue.Queue] = {}
        self._rid_lock = threading.Lock()
        self._shutdown = threading.Event()
        self._work_events = [threading.Event() for _ in self.schedulers]
        self._work_event = self._work_events[0]
        self._loop_threads = [
            threading.Thread(
                target=self._event_loop, args=(i,),
                name=f"scheduler-loop-{i}", daemon=True,
            )
            for i in range(len(self.schedulers))
        ]
        for t in self._loop_threads:
            t.start()
        if self._control_plane is None or self._control_plane.is_leader:
            self._warmup()
        logger.info(
            "Engine ready (model=%s, dp=%d, tp=%d, node=%d/%d)",
            server_args.model_path, dp, tp,
            server_args.node_rank, server_args.nnodes,
        )

    def _warmup(self) -> None:
        """Precompile the standard step buckets so first requests don't
        stall on Mosaic/XLA compilation (the role CudaGraphRunner's
        startup capture plays in the reference)."""
        from sglang_security_tpu.utils import is_tpu_backend

        sa = self.server_args
        if not sa.enable_warmup or not is_tpu_backend():
            return
        t0 = time.time()
        vocab = self.model_runner.config.vocab_size
        ctx = sa.context_length or self.model_runner.config.max_position
        for ptok in sa.warmup_prefill_tokens:
            ptok = min(ptok, sa.max_prefill_tokens, ctx - 1)
            self.generate(
                input_ids=[3 % vocab] * ptok,
                sampling_params={"max_new_tokens": 2, "ignore_eos": True,
                                 "temperature": 0.0},
            )
            self.flush_cache()
        for bs in sa.warmup_decode_bs:
            self.generate(
                input_ids=[[(7 * i + 3) % vocab] * 8 for i in range(bs)],
                sampling_params={"max_new_tokens": 4, "ignore_eos": True,
                                 "temperature": 0.0},
            )
            self.flush_cache()
        logger.info("warmup compiles done in %.1fs", time.time() - t0)

    # ------------------------------------------------------------ the loop
    def _apply_op(self, scheduler, runner, kind, payload, reply=None):
        """Apply one control-stream op.  On the leader ``reply`` is the
        caller's reply queue; followers pass None and discard results."""
        ok = True
        if kind == "__epoch__":
            # follower: pin the SafeKV global epoch to the leader's
            # broadcast value (leader re-applies its own value; no-op)
            from sglang_security_tpu.global_epoch import global_epoch

            if self._control_plane is not None and (
                not self._control_plane.is_leader
            ):
                global_epoch.pin(int(payload))
        elif kind == "req":
            scheduler.add_request(payload)
        elif kind == "abort":
            scheduler.abort_request(payload)
        elif kind == "flush":
            ok = scheduler.flush_cache()
        elif kind == "update_weights_disk":
            runner.update_weights_from_disk(payload)
        elif kind == "update_weights_tensor":
            runner.update_weights_from_tensor(*payload)
        elif kind == "release_memory":
            scheduler.flush_cache()
            runner.release_memory_occupation()
        elif kind == "resume_memory":
            runner.resume_memory_occupation()
        if reply is not None:
            reply.put(ok)

    def _step_guarded(self, scheduler) -> None:
        try:
            scheduler.step()
        except Exception:
            logger.exception("scheduler step failed; aborting batch")
            doomed = (
                scheduler.running + scheduler.waiting
                + getattr(scheduler, "inflight", [])
            )
            for r in doomed:
                scheduler.abort_request(r.rid)
                self._fail_rid(r.rid)
            scheduler.running.clear()
            scheduler.waiting.clear()
            scheduler.inflight = []

    def _event_loop(self, idx: int = 0) -> None:
        scheduler = self.schedulers[idx]
        runner = self.model_runners[idx]
        in_queue = self._in_queues[idx]
        work_event = self._work_events[idx]
        cp = self._control_plane if idx == 0 else None
        if cp is not None and not cp.is_leader:
            # follower node: lockstep with the leader's op stream — one
            # recv per scheduler iteration while there is work
            while not self._shutdown.is_set():
                try:
                    ops = cp.recv()
                except (ConnectionError, OSError):
                    return
                if ops == ("__shutdown__",):
                    return
                for kind, payload in ops:
                    self._apply_op(scheduler, runner, kind, payload)
                while scheduler.has_work():
                    self._step_guarded(scheduler)
                    if self._shutdown.is_set():
                        return
                    # stay aligned: the leader sends one message per
                    # iteration while work exists
                    try:
                        ops = cp.recv()
                    except (ConnectionError, OSError):
                        return
                    if ops == ("__shutdown__",):
                        return
                    for kind, payload in ops:
                        self._apply_op(scheduler, runner, kind, payload)
            return
        while not self._shutdown.is_set():
            drained = False
            ops = []  # queue items: (kind, payload, reply_queue_or_None)
            while True:
                try:
                    item = in_queue.get_nowait()
                except queue.Empty:
                    break
                ops.append(item)
                drained = True
            if cp is not None and (ops or scheduler.has_work()):
                # wire form drops the reply queues (followers discard
                # results); one broadcast per scheduler iteration keeps
                # every node's step sequence identical.  SafeKV rides
                # multi-host by shipping the leader's wall-clock epoch in
                # the same stream: followers pin to it, so attack-window
                # stats and probe-eviction decisions never diverge.
                wire = [(k, p) for k, p, _ in ops]
                if self.server_args.enable_safekv:
                    from sglang_security_tpu.global_epoch import global_epoch

                    wire.insert(0, ("__epoch__", int(global_epoch.value)))
                cp.broadcast(wire)
            for kind, payload, reply in ops:
                self._apply_op(scheduler, runner, kind, payload, reply)
            if scheduler.has_work():
                self._step_guarded(scheduler)
            elif not drained:
                work_event.wait(timeout=0.005)
                work_event.clear()

    def _fail_rid(self, rid: str) -> None:
        q = self._rid_queues.get(rid)
        if q is not None:
            q.put(
                StepOutput(
                    rid=rid, new_token_ids=[], new_text="", finished=True,
                    finish_reason="abort",
                )
            )

    def _on_output(self, out: StepOutput) -> None:
        q = self._rid_queues.get(out.rid)
        if q is not None:
            q.put(out)

    # ---------------------------------------------------------- public API
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[dict, List[dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        stream: bool = False,
        user_id: Optional[str] = None,
        rid: Optional[str] = None,
        return_logprob: bool = False,
        logprob_start_len: int = -1,
        session_id: Optional[str] = None,
        bootstrap_host: Optional[str] = None,
        bootstrap_port: Optional[int] = None,
        bootstrap_room: Optional[int] = None,
        lora_path: Optional[str] = None,
        image_data=None,
        audio_data=None,
    ):
        gri = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            stream=stream,
            user_id=user_id,
            rid=rid,
            return_logprob=return_logprob,
            logprob_start_len=logprob_start_len,
            session_id=session_id,
            bootstrap_host=bootstrap_host,
            bootstrap_port=bootstrap_port,
            bootstrap_room=bootstrap_room,
            lora_path=lora_path,
            image_data=image_data,
            audio_data=audio_data,
        )
        treqs = self.tokenizer_manager.make_reqs(gri)
        qs = [self._submit(t) for t in treqs]
        if stream:
            assert len(treqs) == 1, "streaming supports a single prompt"
            return self._stream_iter(treqs[0].rid, qs[0])
        results = [self._collect(t.rid, q) for t, q in zip(treqs, qs)]
        if gri.is_batch():
            return results
        return results[0]

    def encode(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        rid: Optional[str] = None,
    ):
        """Embedding path (reference Engine.encode, engine.py:139-302):
        last-token pooled, L2-normalized hidden states."""
        gri = GenerateReqInput(
            text=prompt, input_ids=input_ids, rid=rid,
            sampling_params={"max_new_tokens": 0},
            is_embedding=True,
        )
        treqs = self.tokenizer_manager.make_reqs(gri)
        qs = [self._submit(t) for t in treqs]
        results = []
        for t, q in zip(treqs, qs):
            out = q.get(timeout=self.server_args.watchdog_timeout)
            with self._rid_lock:
                self._rid_queues.pop(t.rid, None)
            results.append(
                {
                    "embedding": out.embedding,
                    "meta_info": {
                        "id": t.rid,
                        "prompt_tokens": out.prompt_tokens,
                    },
                }
            )
        if gri.is_batch():
            return results
        return results[0]

    async def async_generate(self, *args, **kwargs):
        import asyncio

        stream = kwargs.get("stream", False)
        if stream:
            return self.generate(*args, **kwargs)
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            None, lambda: self.generate(*args, **kwargs)
        )

    def _submit(self, treq) -> queue.Queue:
        if self._control_plane is not None and not self._control_plane.is_leader:
            raise RuntimeError(
                "follower nodes serve no API; submit requests to node 0"
            )
        if treq.session_id and self.session_controller is not None:
            sess = self.session_controller.get(treq.session_id)
            if sess is not None:
                ctx = sess.context_for(None)
                delta = list(treq.input_ids)
                treq.input_ids = ctx + delta
                sess.record(treq.rid, delta, None)
        req = self.tokenizer_manager.to_req(treq)
        q: queue.Queue = queue.Queue()
        with self._rid_lock:
            self._rid_queues[treq.rid] = q
        # shortest-queue dispatch across dp replicas (reference
        # shortest_queue_scheduler, data_parallel_controller.py:258)
        idx = 0
        if len(self.schedulers) > 1:
            idx = min(
                range(len(self.schedulers)),
                key=lambda i: len(self.schedulers[i].waiting)
                + len(self.schedulers[i].running)
                + self._in_queues[i].qsize(),
            )
        self._in_queues[idx].put(("req", req, None))
        self._work_events[idx].set()
        return q

    def _collect(self, rid: str, q: queue.Queue) -> Dict[str, Any]:
        text_parts: List[str] = []
        token_ids: List[int] = []
        last: Optional[StepOutput] = None
        deadline = time.monotonic() + self.server_args.watchdog_timeout
        while True:
            try:
                out = q.get(timeout=1.0)
            except queue.Empty:
                if time.monotonic() > deadline:
                    self.abort_request(rid)
                    raise TimeoutError(f"request {rid} timed out")
                continue
            text_parts.append(out.new_text)
            token_ids.extend(out.new_token_ids)
            last = out
            if out.finished:
                break
        with self._rid_lock:
            self._rid_queues.pop(rid, None)
        self._finish_session(rid, token_ids)
        return {
            "text": "".join(text_parts),
            "output_ids": token_ids,
            "meta_info": {
                "id": rid,
                "finish_reason": {"type": last.finish_reason},
                "prompt_tokens": last.prompt_tokens,
                "completion_tokens": last.completion_tokens,
                "cached_tokens": last.cached_tokens,
                "e2e_latency": last.e2e_latency,
                "output_token_logprobs": last.output_logprobs,
                "input_token_logprobs": last.input_logprobs,
            },
        }

    def _stream_iter(self, rid: str, q: queue.Queue) -> Iterator[Dict]:
        acc_text = []
        acc_tokens: List[int] = []
        while True:
            out = q.get()
            acc_text.append(out.new_text)
            acc_tokens.extend(out.new_token_ids)
            yield {
                "text": "".join(acc_text),
                "delta": out.new_text,
                "output_ids": list(acc_tokens),
                "meta_info": {
                    "id": rid,
                    "finish_reason": (
                        {"type": out.finish_reason} if out.finished else None
                    ),
                    "prompt_tokens": out.prompt_tokens,
                    "completion_tokens": out.completion_tokens,
                    "cached_tokens": out.cached_tokens,
                },
            }
            if out.finished:
                break
        with self._rid_lock:
            self._rid_queues.pop(rid, None)
        self._finish_session(rid, acc_tokens)

    def _finish_session(self, rid: str, output_ids) -> None:
        if self.session_controller is None:
            return
        for sess in list(self.session_controller._sessions.values()):
            if rid in sess.nodes:
                sess.finish(rid, output_ids)
                return

    def open_session(self, session_id=None, capacity_tokens: int = 1 << 20):
        assert self.session_controller is not None, "sessions disabled"
        return self.session_controller.open_session(session_id, capacity_tokens)

    def close_session(self, session_id: str) -> bool:
        assert self.session_controller is not None, "sessions disabled"
        return self.session_controller.close_session(session_id)

    # ------------------------------------------------------------- control
    def _control_op(self, kind, payload, wait: bool = True,
                    timeout: float = 600.0) -> bool:
        """Route a control op through every scheduler's op stream so it
        applies in iteration order on this node AND (via the control
        plane broadcast) on every follower node."""
        ok = True
        for q, ev in zip(self._in_queues, self._work_events):
            reply: queue.Queue = queue.Queue() if wait else None
            q.put((kind, payload, reply))
            ev.set()
            if wait:
                # generous: the scheduler thread may be mid-compile on a
                # cold bucket (minutes through the axon tunnel)
                ok = reply.get(timeout=timeout) and ok
        return ok

    def abort_request(self, rid: str) -> None:
        self._control_op("abort", rid, wait=False)

    def flush_cache(self) -> bool:
        return self._control_op("flush", None)

    def update_weights_from_disk(self, model_path: str) -> bool:
        # pause between batches, swap params, resume
        while any(s.has_work() for s in self.schedulers):
            time.sleep(0.05)
        return self._control_op("update_weights_disk", model_path)

    def update_weights_from_tensor(self, named_tensors,
                                   load_format=None) -> bool:
        """RL weight push (reference engine.py:392): (HF name, array)
        pairs; missing tensors fall back to the original checkpoint."""
        while any(s.has_work() for s in self.schedulers):
            time.sleep(0.05)
        return self._control_op(
            "update_weights_tensor", (named_tensors, load_format)
        )

    def get_weights_by_name(self, name: str, truncate_size: int = 100):
        return self.model_runner.get_weights_by_name(name, truncate_size)

    def release_memory_occupation(self) -> bool:
        """Free weights + KV pool HBM for a co-located trainer
        (reference engine.py:442); refuses while requests are running.
        KV content is dropped, so the radix caches flush first."""
        if any(s.has_work() for s in self.schedulers):
            return False
        return self._control_op("release_memory", None)

    def resume_memory_occupation(self) -> bool:
        return self._control_op("resume_memory", None)

    def save_sharded_checkpoint(self, path: str) -> int:
        """TPU-native sharded save of the serving-layout params
        (reference save_sharded_model, engine.py:472)."""
        while any(s.has_work() for s in self.schedulers):
            time.sleep(0.05)
        return self.model_runner.save_sharded_checkpoint(path)

    def load_sharded_checkpoint(self, path: str) -> bool:
        while any(s.has_work() for s in self.schedulers):
            time.sleep(0.05)
        for runner in self.model_runners:
            runner.load_sharded_checkpoint(path)
        return True

    def start_profile(self, output_dir: str = "/tmp/sgl_tpu_profile") -> bool:
        """jax.profiler trace (reference torch-profiler /start_profile)."""
        import os

        import jax

        os.makedirs(output_dir, exist_ok=True)
        try:
            jax.profiler.start_trace(output_dir)
            return True
        except Exception:
            logger.exception("start_profile failed")
            return False

    def stop_profile(self) -> bool:
        import jax

        try:
            jax.profiler.stop_trace()
            return True
        except Exception:
            logger.exception("stop_profile failed")
            return False

    def get_server_info(self) -> Dict[str, Any]:
        sched = self.scheduler
        info = {
            "model_path": self.server_args.model_path,
            "version": __import__("sglang_security_tpu").__version__,
            "num_pages": self.model_runner.num_pages,
            "page_size": self.model_runner.page_size,
            "waiting": len(sched.waiting),
            "running": len(sched.running),
            "cache_pages": sched.tree_cache.evictable_pages
            + sched.tree_cache.protected_pages,
        }
        if sched.spec_verify_count:
            info["spec_avg_accept_length"] = (
                sched.spec_accept_sum / sched.spec_verify_count
            )
        return info

    def shutdown(self) -> None:
        self._shutdown.set()
        if self._control_plane is not None:
            self._control_plane.close()
        for ev in self._work_events:
            ev.set()
        for t in self._loop_threads:
            t.join(timeout=5)
        for s in self.schedulers:
            s.shutdown()
        for pc in self.privacy_clients:
            if pc is not None:
                pc.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
