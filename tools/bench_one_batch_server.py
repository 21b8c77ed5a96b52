"""Benchmark single-batch latency against a running (or self-launched)
HTTP server.

Parity with the reference's ``python/sglang/bench_one_batch_server.py``:
for each (batch_size, input_len, output_len) combination, submit the
whole batch at once through ``/generate`` and report latency, input/
output throughput, and TTFT (measured with max_new_tokens=1).  Pass
``--base-url`` to target an already-running server, or ``--model-path``
to launch one in-process for the run.

Usage:
  python tools/bench_one_batch_server.py --base-url http://127.0.0.1:30000 \
      --batch-size 1 16 64 --input-len 1024 --output-len 8
  python tools/bench_one_batch_server.py --model-path /tmp/model \
      --load-format dummy --quantization int4 --batch-size 16
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import requests


def run_one_case(base_url: str, bs: int, input_len: int, output_len: int,
                 temperature: float, vocab: int = 10000) -> dict:
    rng = np.random.default_rng(0)
    input_ids = [
        rng.integers(10, vocab, input_len).tolist() for _ in range(bs)
    ]

    def generate(max_new):
        t0 = time.perf_counter()
        r = requests.post(
            base_url + "/generate",
            json={
                "input_ids": input_ids,
                "sampling_params": {
                    "temperature": temperature,
                    "max_new_tokens": max_new,
                    "ignore_eos": True,
                },
            },
            timeout=3600,
        )
        r.raise_for_status()
        return time.perf_counter() - t0, r.json()

    ttft, _ = generate(1)
    latency, outs = generate(output_len)
    if isinstance(outs, dict):
        outs = [outs]
    out_toks = sum(o["meta_info"]["completion_tokens"] for o in outs)
    decode_time = max(latency - ttft, 1e-9)
    return {
        "batch_size": bs,
        "input_len": input_len,
        "output_len": output_len,
        "ttft_s": round(ttft, 4),
        "latency_s": round(latency, 4),
        "input_throughput_tok_s": round(bs * input_len / ttft, 1),
        "output_throughput_tok_s": round(out_toks / decode_time, 1),
        "overall_throughput_tok_s": round(
            (bs * input_len + out_toks) / latency, 1
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="")
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--load-format", default=None)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--port", type=int, default=30333)
    ap.add_argument("--batch-size", type=int, nargs="+", default=[1])
    ap.add_argument("--input-len", type=int, nargs="+", default=[1024])
    ap.add_argument("--output-len", type=int, nargs="+", default=[16])
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--result-filename", default="")
    args = ap.parse_args()

    proc = None
    base_url = args.base_url
    if not base_url:
        assert args.model_path, "--base-url or --model-path required"
        import multiprocessing

        from sglang_security_tpu.entrypoints.http_server import (
            launch_server,
        )
        from sglang_security_tpu.server_args import ServerArgs

        sa = ServerArgs(
            model_path=args.model_path,
            port=args.port,
            skip_tokenizer_init=True,
            log_level="warning",
            **{k: v for k, v in (
                ("load_format", args.load_format),
                ("quantization", args.quantization),
            ) if v is not None},
        )
        proc = multiprocessing.Process(
            target=launch_server, args=(sa,), daemon=True
        )
        proc.start()
        base_url = f"http://127.0.0.1:{args.port}"
        for _ in range(600):
            try:
                if requests.get(base_url + "/health",
                                timeout=2).status_code == 200:
                    break
            except requests.RequestException:
                pass
            time.sleep(1)
        else:
            raise RuntimeError("server did not become healthy")

    results = []
    try:
        for bs, il, ol in itertools.product(
            args.batch_size, args.input_len, args.output_len
        ):
            res = run_one_case(
                base_url, bs, il, ol, args.temperature
            )
            results.append(res)
            print(json.dumps(res), flush=True)
    finally:
        if proc is not None:
            proc.terminate()
    if args.result_filename:
        with open(args.result_filename, "a") as f:
            for res in results:
                f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
