"""End-to-end timing side-channel experiment, in-process.

Runs the NDSS timing attack against TWO engines — radix sharing without
SafeKV, and with SafeKV — and reports whether the attacker can detect
that a victim's private prefix is cached.  In-process variant of
``timing_side_channel_attacker.py`` (no HTTP jitter), usable on CPU or
TPU; results are recorded in ndss_scripts/RESULTS.md.

  python ndss_scripts/run_timing_attack_experiment.py [--probes 8]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


VICTIM_TEXT = (
    "my private medical record: patient alice, ssn 123-45-6789, "
    "diagnosed with condition X, treatment plan Y. " * 4
)


def ttft(eng, ids, user_id):
    t0 = time.perf_counter()
    it = eng.generate(
        input_ids=ids, user_id=user_id, stream=True,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                         "ignore_eos": True},
    )
    next(iter(it))
    return time.perf_counter() - t0


def run_attack(eng, probes: int) -> dict:
    """Baseline and probe prompts have IDENTICAL token counts (same
    prefill bucket, same padded work) and are interleaved, so the only
    timing difference left is whether the victim prefix hits cache."""
    import random

    rng = random.Random(0)
    tok = eng.tokenizer_manager.tokenizer
    victim_ids = tok.encode(VICTIM_TEXT)
    n = len(victim_ids)
    vocab = eng.model_runner.config.vocab_size

    eng.generate(input_ids=victim_ids, user_id="victim",
                 sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                                  "ignore_eos": True})
    time.sleep(0.3)
    baseline, probe = [], []
    for i in range(probes):
        junk = [rng.randrange(3, vocab - 2) for _ in range(n)]
        baseline.append(ttft(eng, junk, f"mallory{i}"))
        # distinct attacker users so earlier probes' own insertions
        # don't turn into intra-attacker private hits
        probe.append(ttft(eng, list(victim_ids), f"mallory{i}"))
    base_p50 = statistics.median(baseline)
    probe_p50 = statistics.median(probe)
    per_tok_delta = (base_p50 - probe_p50) / n
    return {
        "prefix_tokens": n,
        "baseline_ttft_p50_ms": round(base_p50 * 1e3, 2),
        "probe_ttft_p50_ms": round(probe_p50 * 1e3, 2),
        "per_token_delta_s": round(per_tok_delta, 8),
        "detected_cached": per_tok_delta > 4e-5,  # reference threshold
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", type=int, default=8)
    ap.add_argument("--model-path", default=None)
    args = ap.parse_args()

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = args.model_path or make_tiny_llama("/tmp/tiny_timing_attack")
    results = {}
    for mode, kw in (
        ("shared_cache_no_safekv", {}),
        ("safekv", dict(enable_safekv=True,
                        safekv_epoch_seconds=3600.0,
                        safekv_hit_spike_threshold=1e9)),
    ):
        eng = Engine(ServerArgs(
            model_path=path, dtype="float32", max_total_tokens=8192,
            page_size=8, prefill_token_buckets=[128, 256, 512],
            decode_bs_buckets=[1, 2], max_seq_pages_buckets=[32],
            random_seed=0, enable_warmup=False, log_level="warning", **kw,
        ))
        try:
            results[mode] = run_attack(eng, args.probes)
        finally:
            eng.shutdown()
    print(json.dumps(results, indent=2))
    ok = (
        results["shared_cache_no_safekv"]["detected_cached"]
        and not results["safekv"]["detected_cached"]
    )
    print("ATTACK_BLOCKED_BY_SAFEKV" if ok else "UNEXPECTED", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
