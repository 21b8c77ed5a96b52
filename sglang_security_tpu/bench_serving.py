"""Online serving benchmark (client-side load generator).

Port of the reference's ``python/sglang/bench_serving.py`` metric
surface (``:575, :1135-1445``): drives an OpenAI-compatible or native
``/generate`` endpoint with a Poisson (or infinite-rate) arrival
process and reports output throughput, TTFT, ITL (per-token), and E2E
latency (mean / median / std / p99).

Usage:
  python -m sglang_security_tpu.bench_serving --base-url http://127.0.0.1:30000 \
      --num-prompts 100 --request-rate 1.0 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    success: bool = False
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    latency: float = 0.0
    itl: List[float] = field(default_factory=list)
    error: str = ""


def synth_prompt(rng: random.Random, n_tokens: int) -> str:
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    return " ".join(rng.choice(words) for _ in range(max(n_tokens, 1)))


async def one_request(
    session: aiohttp.ClientSession,
    base_url: str,
    prompt: str,
    output_len: int,
    result: ReqResult,
) -> None:
    payload = {
        "text": prompt,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        "stream": True,
    }
    t0 = time.perf_counter()
    last = t0
    n_tokens = 0
    try:
        async with session.post(
            base_url + "/generate", json=payload,
            timeout=aiohttp.ClientTimeout(total=3600),
        ) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data:"):
                    continue
                data = line[5:].strip()
                if data == "[DONE]":
                    break
                chunk = json.loads(data)
                now = time.perf_counter()
                new = len(chunk.get("output_ids", [])) - n_tokens
                if new > 0:
                    if n_tokens == 0:
                        result.ttft = now - t0
                    else:
                        result.itl.append((now - last) / new)
                    n_tokens = len(chunk["output_ids"])
                    last = now
        result.latency = time.perf_counter() - t0
        result.output_len = n_tokens
        result.success = n_tokens > 0
    except Exception as e:  # noqa: BLE001
        result.error = str(e)


async def run_bench(args) -> dict:
    rng = random.Random(args.seed)
    prompts = [
        synth_prompt(rng, args.input_len) for _ in range(args.num_prompts)
    ]
    results = [ReqResult(prompt_len=args.input_len) for _ in prompts]
    conn = aiohttp.TCPConnector(limit=args.max_concurrency or 0)
    t_start = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn) as session:
        tasks = []
        for prompt, res in zip(prompts, results):
            if args.request_rate != float("inf"):
                await asyncio.sleep(
                    rng.expovariate(args.request_rate)
                )
            tasks.append(
                asyncio.create_task(
                    one_request(session, args.base_url, prompt,
                                args.output_len, res)
                )
            )
        await asyncio.gather(*tasks)
    duration = time.perf_counter() - t_start

    ok = [r for r in results if r.success]
    if not ok:
        return {"error": "all requests failed",
                "example": results[0].error if results else ""}
    out_tokens = sum(r.output_len for r in ok)
    ttfts = np.array([r.ttft for r in ok])
    itls = np.array(sum((r.itl for r in ok), []))
    e2es = np.array([r.latency for r in ok])

    def stats(a):
        if len(a) == 0:
            return {}
        return {
            "mean_ms": float(np.mean(a) * 1000),
            "median_ms": float(np.median(a) * 1000),
            "std_ms": float(np.std(a) * 1000),
            "p99_ms": float(np.percentile(a, 99) * 1000),
        }

    return {
        "completed": len(ok),
        "duration_s": duration,
        "total_output_tokens": out_tokens,
        "output_throughput_tok_s": out_tokens / duration,
        "request_throughput_req_s": len(ok) / duration,
        "ttft": stats(ttfts),
        "itl": stats(itls),
        "e2e_latency": stats(e2es),
    }


def main(argv: Optional[List[str]] = None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-url", default="http://127.0.0.1:30000")
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--request-rate", type=float, default=float("inf"))
    parser.add_argument("--input-len", type=int, default=512)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--max-concurrency", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    metrics = asyncio.run(run_bench(args))
    print(json.dumps(metrics, indent=1))
    return metrics


if __name__ == "__main__":
    main()
