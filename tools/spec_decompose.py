"""Decompose speculative serving (BENCH_SPEC workload) into phases:
prefill, draft (host or device), verify step, accept/host.

Same workload as bench.py with BENCH_SPEC; wall-clock accumulators are
monkeypatched around the runner's execute (prefill + verify) and the
scheduler's draft/accept helpers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sglang_security_tpu.model_executor import model_runner as mr_mod
from sglang_security_tpu.managers import scheduler as sched_mod
from bench import LLAMA3_8B_CONFIG

ACC = {}


def timed(name, orig):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        ACC.setdefault(name, [0.0, 0])
        ACC[name][0] += time.perf_counter() - t0
        ACC[name][1] += 1
        return out
    return wrap


mr_mod.ModelRunner.execute = timed("prefill", mr_mod.ModelRunner.execute)
mr_mod.ModelRunner.execute_spec_verify = timed(
    "verify", mr_mod.ModelRunner.execute_spec_verify
)
mr_mod.ModelRunner.execute_decode_multi = timed(
    "decode_plain", mr_mod.ModelRunner.execute_decode_multi
)
if hasattr(sched_mod.Scheduler, "_run_spec_decode"):
    sched_mod.Scheduler._run_spec_decode = timed(
        "spec_round_total", sched_mod.Scheduler._run_spec_decode
    )
if hasattr(mr_mod.ModelRunner, "execute_spec_fused"):
    mr_mod.ModelRunner.execute_spec_fused = timed(
        "fused_call", mr_mod.ModelRunner.execute_spec_fused
    )
if hasattr(sched_mod.Scheduler, "_run_spec_decode_fused"):
    sched_mod.Scheduler._run_spec_decode_fused = timed(
        "fused_round_total", sched_mod.Scheduler._run_spec_decode_fused
    )
if hasattr(sched_mod.Scheduler, "_run_eagle_decode"):
    sched_mod.Scheduler._run_eagle_decode = timed(
        "eagle_round_total", sched_mod.Scheduler._run_eagle_decode
    )

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.speculative import NgramDrafter

NgramDrafter.draft = timed("ngram_draft", NgramDrafter.draft)

model_dir = "/tmp/bench_llama3_8b"
os.makedirs(model_dir, exist_ok=True)
with open(os.path.join(model_dir, "config.json"), "w") as f:
    json.dump(LLAMA3_8B_CONFIG, f)

spec = os.environ.get("BENCH_SPEC", "ngram")
spec_steps = int(os.environ.get("BENCH_SPEC_STEPS", 4))
algo = {"ngram": "NGRAM", "eagle": "EAGLE", "eagle3": "EAGLE3",
        "tree": "EAGLE"}[spec]
n_reqs = int(os.environ.get("BENCH_NUM_REQS", 128))
in_len = int(os.environ.get("BENCH_INPUT_LEN", 128))
out_len = int(os.environ.get("BENCH_OUTPUT_LEN", 128))
eng = Engine(ServerArgs(
    model_path=model_dir, load_format="dummy", quantization="int4",
    dtype="bfloat16", skip_tokenizer_init=True, max_total_tokens=49152,
    page_size=128, max_running_requests=n_reqs,
    max_prefill_tokens=4096, chunked_prefill_size=4096,
    decode_bs_buckets=[n_reqs], prefill_token_buckets=[4096],
    max_seq_pages_buckets=[4],
    decode_steps_per_batch=int(os.environ.get("BENCH_DECODE_STEPS", 16)),
    enable_warmup=False, random_seed=0, log_level="warning",
    speculative_algorithm=algo,
    speculative_num_steps=spec_steps,
    speculative_num_draft_tokens=spec_steps,
    speculative_eagle_topk=2 if spec == "tree" else 1,
    speculative_fused_rounds=int(os.environ.get("BENCH_FUSED_ROUNDS", 8)),
))
rng = np.random.default_rng(0)
prompts = [rng.integers(10, 120000, in_len).tolist() for _ in range(n_reqs)]
sp = {"temperature": 0.0, "max_new_tokens": out_len, "ignore_eos": True}

eng.generate(input_ids=prompts, sampling_params=sp)  # warm
eng.flush_cache()
for k in ACC:
    ACC[k] = [0.0, 0]
eng.scheduler.spec_accept_sum = 0
eng.scheduler.spec_verify_count = 0

t0 = time.perf_counter()
outs = eng.generate(input_ids=prompts, sampling_params=sp)
wall = time.perf_counter() - t0
toks = sum(o["meta_info"]["completion_tokens"] for o in outs)
print(f"wall {wall*1e3:.0f} ms  toks {toks}  ({toks/wall:.0f} tok/s)")
for k, (t, n) in sorted(ACC.items()):
    if n:
        print(f"  {k:16s} {t*1e3:8.0f} ms  {n:5d} calls  "
              f"{t/n*1e3:7.2f} ms/call")
sc = eng.scheduler
if sc.spec_verify_count:
    print(f"  accept_length {sc.spec_accept_sum / sc.spec_verify_count:.3f}"
          f"  over {sc.spec_verify_count} verifies")
eng.shutdown()
