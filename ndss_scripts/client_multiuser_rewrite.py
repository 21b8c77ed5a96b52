"""Multi-user multi-session workload client for SafeKV evaluation.

Re-creation of the reference's rewrite clients
(``ndss_scripts/client_rewrite_multisession.py``,
``client_rewrite_prompts.py``, ``client_perf_*.py``): the reference uses
an external LLM API to rewrite dialogue datasets; here the multi-turn
sessions are generated from seeded templates (zero-egress environment),
which keeps runs reproducible.

The workload: N users, each with M multi-turn sessions.  A configurable
fraction of sessions embeds PII in the shared system/context prefix.
Sessions interleave round-robin (each turn extends the session's
growing prefix), which exercises:

  * intra-user prefix reuse across turns (should hit),
  * cross-user sharing of the common system prompt (should hit after
    the privacy verdict lands; private until judged),
  * isolation of PII-bearing prefixes (must never hit cross-user).

Reports throughput, TTFT percentiles, intra-user hit rate, and
cross-user leak count (PII prefix served from cache to another user).

Usage (against a running server):
  python ndss_scripts/client_multiuser_rewrite.py \
      --base-url http://127.0.0.1:30000 --users 4 --sessions 2 --turns 4
"""

from __future__ import annotations

import argparse
import json
import random
import statistics
import time

SYSTEM_PROMPT = (
    "You are a helpful, concise assistant. Answer briefly and factually. "
    "Refuse harmful requests. Today's topics include technology, travel, "
    "education, food, productivity, and daily life. "
)

TOPICS = {
    "productivity": [
        "What are some good productivity apps?",
        "How should I structure a weekly review?",
        "What is time blocking and does it work?",
        "How do I avoid context switching at work?",
    ],
    "travel": [
        "Where should I go hiking in the spring?",
        "How do I pack light for two weeks?",
        "What is the best way to handle jet lag?",
        "Is travel insurance worth the cost?",
    ],
    "cooking": [
        "How do I keep rice from sticking?",
        "What is a good starter knife for a home cook?",
        "How do I make vegetable stock from scraps?",
        "What does resting meat actually do?",
    ],
    "tech": [
        "Explain the difference between tcp and udp.",
        "What is a memory-safe language?",
        "How does a hash map handle collisions?",
        "Why are SSDs faster than hard drives?",
    ],
}

PII_SNIPPETS = [
    "My email is {u}@corp-internal.example and my ssn is 123-45-{d4}. ",
    "For verification, my password: {u}Pass{d4}! and account 99{d4}1122. ",
    "My phone is (555) 010-{d4} and card 4111 1111 1111 {d4}. ",
]


def build_sessions(users, sessions_per_user, turns, pii_fraction, seed=0):
    rng = random.Random(seed)
    plans = []  # (user, session_id, [turn texts]), first turn carries prefix
    for u in range(users):
        user = f"user{u}"
        for s in range(sessions_per_user):
            topic = rng.choice(list(TOPICS))
            has_pii = rng.random() < pii_fraction
            prefix = SYSTEM_PROMPT
            if has_pii:
                prefix += rng.choice(PII_SNIPPETS).format(
                    u=user, d4=f"{rng.randrange(10000):04d}"
                )
            qs = rng.sample(TOPICS[topic], min(turns, len(TOPICS[topic])))
            plans.append({
                "user": user, "session": f"{user}-s{s}", "prefix": prefix,
                "pii": has_pii, "turns": qs,
            })
    return plans


def run_workload(gen_fn, plans, turns):
    """gen_fn(text, user_id) -> meta_info dict. Returns metrics."""
    ttfts, intra_hits, intra_total = [], 0, 0
    cross_leaks = 0
    t_start = time.perf_counter()
    total_tokens = 0
    # round-robin turn interleave across sessions
    contexts = {p["session"]: p["prefix"] for p in plans}
    for turn in range(turns):
        for p in plans:
            if turn >= len(p["turns"]):
                continue
            contexts[p["session"]] += f"\nUser: {p['turns'][turn]}\nAssistant:"
            t0 = time.perf_counter()
            meta = gen_fn(contexts[p["session"]], p["user"])
            ttfts.append(time.perf_counter() - t0)
            total_tokens += meta.get("completion_tokens", 0)
            cached = meta.get("cached_tokens", 0)
            if turn > 0:
                intra_total += 1
                if cached > 0:
                    intra_hits += 1
            contexts[p["session"]] += " ok."
    elapsed = time.perf_counter() - t_start

    # cross-user probe: replay every PII prefix under a fresh user.  The
    # shared SYSTEM_PROMPT head may legitimately be public by now, so
    # first measure how many tokens of it a fresh user gets from cache;
    # a leak is any probe that hits BEYOND that public head (i.e. into
    # the PII region of the prefix).
    # the diverging suffix matters: a prompt equal to the cached prefix
    # is never 100% matched (>=1 token must be computed), which would
    # under-measure the public head by one page.
    # Privacy verdicts land asynchronously, so the public head GROWS for
    # a while after the workload: a single baseline taken too early
    # undercounts the legitimate public span and every later probe would
    # read as a "leak".  Settle first (fresh user per probe -- a reused
    # prober would hit its own private insertions), then compare probes
    # against the max of the settled and a post-probe baseline.  True
    # leaks still show: a PII page served cross-user sits past the
    # shared head, so it exceeds both baselines (sensitivity is one
    # page: a leak of only the boundary page may hide under the head).
    def _head(tag):
        meta = gen_fn(
            SYSTEM_PROMPT + "\nUser: baseline cache probe\nAssistant:",
            f"prober-base-{tag}",
        )
        return meta.get("cached_tokens", 0)

    head = _head(0)
    for j in range(1, 16):
        time.sleep(0.25)
        nxt = _head(j)
        if nxt == head:
            break
        head = nxt
    probe_hits = []
    for i, p in enumerate(plans):
        if not p["pii"]:
            continue
        meta = gen_fn(p["prefix"], f"prober{i}")
        probe_hits.append((i, meta.get("cached_tokens", 0)))
    public_head = max(head, _head("final"))
    cross_leaks = sum(1 for _, c in probe_hits if c > public_head)

    ttfts.sort()
    return {
        "requests": len(ttfts),
        "elapsed_s": round(elapsed, 3),
        "output_tok_per_s": round(total_tokens / max(elapsed, 1e-9), 1),
        "ttft_p50_ms": round(1e3 * ttfts[len(ttfts) // 2], 2) if ttfts else 0,
        "ttft_p95_ms": round(1e3 * ttfts[int(len(ttfts) * 0.95)], 2)
        if ttfts else 0,
        "intra_user_hit_rate": round(intra_hits / max(intra_total, 1), 3),
        "pii_sessions": sum(1 for p in plans if p["pii"]),
        "public_head_tokens": public_head,
        "probe_cached_tokens": probe_hits,
        "cross_user_pii_leaks": cross_leaks,
    }


def http_gen_fn(base_url):
    import requests

    def gen(text, user_id):
        r = requests.post(
            base_url + "/generate",
            json={"text": text, "user_id": user_id,
                  "sampling_params": {"max_new_tokens": 8,
                                      "temperature": 0.0,
                                      "ignore_eos": True}},
            timeout=300,
        )
        return r.json()["meta_info"]

    return gen


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--users", type=int, default=4)
    ap.add_argument("--sessions", type=int, default=2)
    ap.add_argument("--turns", type=int, default=4)
    ap.add_argument("--pii-fraction", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    plans = build_sessions(
        args.users, args.sessions, args.turns, args.pii_fraction, args.seed
    )
    result = run_workload(http_gen_fn(args.base_url), plans, args.turns)
    result["verdict"] = (
        "PASS" if result["cross_user_pii_leaks"] == 0 else "FAIL"
    )
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
