"""Decompose the bench wall time into prefill / decode / host phases.

Monkeypatches ModelRunner.execute (prefill) and execute_decode_multi
(decode) with wall-clock accumulation, then runs the exact bench.py
workload. SLOPES rule does not apply here: we time *many* chained calls
end-to-end, so the per-call tunnel overhead is amortized and visible as
what it really costs the serving loop.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sglang_security_tpu.model_executor import model_runner as mr_mod
from bench import LLAMA3_8B_CONFIG

ACC = {"prefill": [0.0, 0], "decode": [0.0, 0], "embed": [0.0, 0]}

_orig_exec = mr_mod.ModelRunner.execute
_orig_multi = mr_mod.ModelRunner.execute_decode_multi
_orig_wait = mr_mod.ModelRunner.wait_decode
_orig_wait_pf = mr_mod.ModelRunner.wait_prefill


def timed(name, orig):
    def wrap(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        ACC[name][0] += time.perf_counter() - t0
        ACC[name][1] += 1
        return out
    return wrap


mr_mod.ModelRunner.execute = timed("prefill", _orig_exec)
mr_mod.ModelRunner.execute_decode_multi = timed("decode", _orig_multi)
# pipelined decode: the scheduler dispatches async and blocks in
# wait_decode, so "decode" here measures the *exposed* device wait (the
# dispatch itself is ~free); host = wall - prefill - decode is then true
# uncovered host time


def _timed_wait(handle):
    t0 = time.perf_counter()
    out = _orig_wait(handle)
    ACC["decode"][0] += time.perf_counter() - t0
    ACC["decode"][1] += 1
    return out


mr_mod.ModelRunner.wait_decode = staticmethod(_timed_wait)
# pipelined prefill (round 4): execute(dispatch_only=True) returns
# immediately; the exposed device wait moved to wait_prefill
mr_mod.ModelRunner.wait_prefill = timed("prefill", _orig_wait_pf)

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs

model_dir = "/tmp/bench_llama3_8b"
os.makedirs(model_dir, exist_ok=True)
with open(os.path.join(model_dir, "config.json"), "w") as f:
    json.dump(LLAMA3_8B_CONFIG, f)

n_reqs, in_len, out_len = 128, 128, 128
page_size = int(os.environ.get("BENCH_PAGE_SIZE", 128))
decode_steps_per_batch = int(os.environ.get("BENCH_DECODE_STEPS", 16))
eng = Engine(ServerArgs(
    model_path=model_dir, load_format="dummy",
    quantization=os.environ.get("BENCH_QUANT", "int4"),
    kv_cache_dtype=os.environ.get("BENCH_KV", "auto"),
    dtype="bfloat16", skip_tokenizer_init=True, max_total_tokens=49152,
    page_size=page_size, max_running_requests=n_reqs,
    max_prefill_tokens=4096, chunked_prefill_size=4096,
    decode_bs_buckets=[n_reqs], prefill_token_buckets=[4096],
    max_seq_pages_buckets=[512 // page_size],
    decode_steps_per_batch=decode_steps_per_batch,
    enable_warmup=False, random_seed=0, log_level="warning",
))
rng = np.random.default_rng(0)
prompts = [rng.integers(10, 120000, in_len).tolist() for _ in range(n_reqs)]
sp = {"temperature": 0.0, "max_new_tokens": out_len, "ignore_eos": True}

eng.generate(input_ids=prompts, sampling_params=sp)  # warm/compile
eng.flush_cache()
for k in ACC:
    ACC[k] = [0.0, 0]

t0 = time.perf_counter()
outs = eng.generate(input_ids=prompts, sampling_params=sp)
wall = time.perf_counter() - t0
toks = sum(o["meta_info"]["completion_tokens"] for o in outs)

dev = ACC["prefill"][0] + ACC["decode"][0]
print(f"wall {wall*1e3:.0f} ms  toks {toks}  ({toks/wall:.0f} tok/s)")
for k, (t, n) in ACC.items():
    if n:
        print(f"  {k:8s} {t*1e3:8.0f} ms  {n:4d} calls  {t/n*1e3:7.2f} ms/call")
print(f"  host     {(wall-dev)*1e3:8.0f} ms  (wall - device calls)")
# per-decode-step: each execute_decode_multi call runs K steps
K = decode_steps_per_batch
dn = ACC["decode"][1]
if dn:
    per_step = ACC["decode"][0] / (dn * K)
    print(f"  decode per-step: {per_step*1e3:.2f} ms "
          f"({n_reqs/per_step:.0f} tok/s decode-only at B={n_reqs})")
eng.shutdown()
