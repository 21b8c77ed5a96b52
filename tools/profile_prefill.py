"""Profile one 4096-token prefill chunk with jax.profiler (VERDICT r3
task 2: committed trace artifact).

Warms the engine (compiles the prefill bucket), then traces exactly one
chunk-sized generate through the serving path.  The trace lands in
artifacts/prefill_trace_r04/ (xplane protobuf, viewable with
tensorboard's profile plugin / xprof).

Run:  python tools/profile_prefill.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import LLAMA3_8B_CONFIG


def main() -> None:
    import jax

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    model_dir = "/tmp/bench_llama3_8b"
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(LLAMA3_8B_CONFIG, f)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "prefill_trace_r04",
    )
    os.makedirs(out_dir, exist_ok=True)

    eng = Engine(ServerArgs(
        model_path=model_dir, load_format="dummy", quantization="int4",
        dtype="bfloat16", skip_tokenizer_init=True, max_total_tokens=16384,
        page_size=128, max_running_requests=32, max_prefill_tokens=4096,
        chunked_prefill_size=4096, decode_bs_buckets=[32],
        prefill_token_buckets=[4096], max_seq_pages_buckets=[4],
        decode_steps_per_batch=1, enable_warmup=False, random_seed=0,
        log_level="warning",
    ))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 120000, 128).tolist() for _ in range(32)]
    sp = {"temperature": 0.0, "max_new_tokens": 1, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=sp)  # compile 1 chunk
    eng.flush_cache()

    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        eng.generate(input_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    eng.shutdown()
    # trim tensorboard's nested dirs listing for the record
    files = []
    for root, _, names in os.walk(out_dir):
        for n in names:
            p = os.path.join(root, n)
            files.append((os.path.relpath(p, out_dir), os.path.getsize(p)))
    print(json.dumps({
        "chunk_wall_ms": round(dt * 1e3, 1),
        "trace_dir": os.path.relpath(out_dir),
        "files": files,
    }))


if __name__ == "__main__":
    main()
