"""Static-batch latency benchmark (no server).

Port of the reference's ``python/sglang/bench_one_batch.py:330-397``
metric surface: prefill latency + throughput and per-step decode
latency + throughput for a fixed (batch, input_len, output_len),
straight through the Engine on dummy weights.

Usage:
  python -m sglang_security_tpu.bench_one_batch --model-path <dir> \
      --batch-size 8 --input-len 512 --output-len 32 [--load-format dummy]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--load-format", default="auto")
    parser.add_argument("--quantization", default=None)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--input-len", type=int, default=512)
    parser.add_argument("--output-len", type=int, default=32)
    parser.add_argument("--max-total-tokens", type=int, default=65536)
    args = parser.parse_args(argv)

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.model_executor.model_runner import BatchPlan
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(
        ServerArgs(
            model_path=args.model_path,
            load_format=args.load_format,
            quantization=args.quantization,
            dtype=args.dtype,
            skip_tokenizer_init=True,
            max_total_tokens=args.max_total_tokens,
            enable_warmup=False,
            decode_steps_per_batch=1,  # measure true per-step latency
            log_level="warning",
        )
    )
    sched = eng.scheduler
    runner = eng.model_runner
    rng = np.random.default_rng(0)
    vocab = runner.config.vocab_size
    B, IL, OL = args.batch_size, args.input_len, args.output_len
    prompts = [rng.integers(10, vocab - 10, IL).tolist() for _ in range(B)]
    sp = {"temperature": 0.0, "max_new_tokens": OL, "ignore_eos": True}

    # warm compile
    eng.generate(input_ids=prompts, sampling_params=sp)
    eng.flush_cache()

    # timed run with per-phase instrumentation
    phase_times = {"prefill": [], "decode": []}
    orig_execute = runner.execute

    def timed_execute(plan: BatchPlan):
        t0 = time.perf_counter()
        out = orig_execute(plan)
        import jax

        jax.block_until_ready(out[0]) if hasattr(out[0], "block_until_ready") else None
        dt = time.perf_counter() - t0
        phase_times["decode" if plan.is_decode else "prefill"].append(dt)
        return out

    runner.execute = timed_execute
    t0 = time.perf_counter()
    eng.generate(input_ids=prompts, sampling_params=sp)
    total = time.perf_counter() - t0
    runner.execute = orig_execute

    prefill_t = sum(phase_times["prefill"])
    decode_steps = phase_times["decode"]
    metrics = {
        "batch_size": B,
        "input_len": IL,
        "output_len": OL,
        "prefill_latency_s": prefill_t,
        "prefill_throughput_tok_s": B * IL / prefill_t if prefill_t else None,
        "median_decode_latency_ms": (
            float(np.median(decode_steps) * 1000) if decode_steps else None
        ),
        "decode_throughput_tok_s": (
            B / np.median(decode_steps) if decode_steps else None
        ),
        "total_latency_s": total,
        "overall_throughput_tok_s": B * (IL + OL) / total,
    }
    print(json.dumps(metrics, indent=1))
    eng.shutdown()
    return metrics


if __name__ == "__main__":
    main()
