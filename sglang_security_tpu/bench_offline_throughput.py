"""Offline throughput benchmark through the Engine.

Port of the reference's ``python/sglang/bench_offline_throughput.py``:
submit N requests at once, report total input/output token throughput.

Usage:
  python -m sglang_security_tpu.bench_offline_throughput --model-path <dir> \
      --num-prompts 128 --input-len 128 --output-len 128 [--load-format dummy]
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
    parser.add_argument("--num-prompts", type=int, default=128)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--max-total-tokens", type=int, default=None)
    parser.add_argument("--random-range", type=float, default=0.5,
                        help="input lens sampled in [len*(1-r), len]")
    args = parser.parse_args(argv)

    from sglang_security_tpu.entrypoints.engine import Engine
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
            log_level="warning",
        )
    )
    rng = np.random.default_rng(0)
    vocab = eng.model_runner.config.vocab_size
    lens = rng.integers(
        int(args.input_len * (1 - args.random_range)) or 1,
        args.input_len + 1,
        args.num_prompts,
    )
    prompts = [rng.integers(10, vocab - 10, l).tolist() for l in lens]
    sp = {"temperature": 0.0, "max_new_tokens": args.output_len,
          "ignore_eos": True}

    eng.generate(input_ids=prompts[:4], sampling_params=sp)  # warm compiles
    eng.flush_cache()

    t0 = time.perf_counter()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    in_toks = int(lens.sum())
    out_toks = sum(o["meta_info"]["completion_tokens"] for o in outs)
    metrics = {
        "num_prompts": args.num_prompts,
        "duration_s": dt,
        "input_tokens": in_toks,
        "output_tokens": out_toks,
        "output_throughput_tok_s": out_toks / dt,
        "total_throughput_tok_s": (in_toks + out_toks) / dt,
    }
    print(json.dumps(metrics, indent=1))
    eng.shutdown()
    return metrics


if __name__ == "__main__":
    main()
