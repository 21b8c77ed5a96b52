"""SafeKV performance A/B client.

Re-creation of the reference's ``ndss_scripts/client_perf_safekv.py`` /
``client_perf_ori.py``: measures TTFT and end-to-end latency for a
multi-user, multi-session workload where users re-send overlapping
prefixes — quantifying the cache-hit-rate cost of privacy-gated sharing.

Usage:
  python ndss_scripts/client_perf_safekv.py --base-url http://... \
      --num-users 8 --turns 4 --shared-fraction 0.5
"""

from __future__ import annotations

import argparse
import json
import random
import statistics
import time

import requests


def run_turn(base_url, text, user_id):
    t0 = time.perf_counter()
    r = requests.post(
        base_url + "/generate",
        json={"text": text, "user_id": user_id,
              "sampling_params": {"max_new_tokens": 16, "temperature": 0.0,
                                  "ignore_eos": True}},
        timeout=300,
    )
    dt = time.perf_counter() - t0
    meta = r.json()["meta_info"]
    return dt, meta.get("cached_tokens", 0), meta.get("prompt_tokens", 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-users", type=int, default=8)
    ap.add_argument("--turns", type=int, default=4)
    ap.add_argument("--shared-fraction", type=float, default=0.5)
    args = ap.parse_args()

    rng = random.Random(0)
    shared_doc = " ".join(f"shared-context-{i}" for i in range(120))
    lat, hits, toks = [], 0, 0
    for turn in range(args.turns):
        for u in range(args.num_users):
            if rng.random() < args.shared_fraction:
                text = shared_doc + f" question {turn} from user {u}"
            else:
                text = (
                    f"private-{u} " * 100 + f" question {turn}"
                )
            dt, cached, prompt = run_turn(args.base_url, text, f"user{u}")
            lat.append(dt)
            hits += cached
            toks += prompt
    print(json.dumps({
        "requests": len(lat),
        "median_latency_s": statistics.median(lat),
        "p99_latency_s": sorted(lat)[int(len(lat) * 0.99) - 1],
        "cache_hit_rate": hits / max(toks, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
