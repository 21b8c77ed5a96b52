"""Live privacy-detection check against a SafeKV-enabled server.

Re-creation of the reference's ``ndss_scripts/test_privacy_detection.py``:
sends PII-bearing and benign prompts from user A, then checks from user B
whether the prefix became shareable (benign) or stayed private (PII),
using cached_tokens as ground truth.
"""

from __future__ import annotations

import argparse
import json
import time

import requests

PII_PROMPT = (
    "my password is hunter2, my ssn is 123-45-6789 and my email is "
    "alice@example.com — please summarize my account standing " * 3
)
BENIGN_PROMPT = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "on a bright morning in spring " * 3
)


def gen(base_url, text, user):
    r = requests.post(
        base_url + "/generate",
        json={"text": text, "user_id": user,
              "sampling_params": {"max_new_tokens": 8, "temperature": 0.0,
                                  "ignore_eos": True}},
        timeout=300,
    )
    return r.json()["meta_info"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    args = ap.parse_args()

    gen(args.base_url, PII_PROMPT, "alice")
    gen(args.base_url, BENIGN_PROMPT, "alice")
    time.sleep(1.0)  # let async privacy verdicts land

    pii_bob = gen(args.base_url, PII_PROMPT, "bob")
    benign_bob = gen(args.base_url, BENIGN_PROMPT, "bob")
    result = {
        "pii_prefix_shared_to_other_user": pii_bob["cached_tokens"] > 0,
        "benign_prefix_shared_to_other_user": benign_bob["cached_tokens"] > 0,
        "pii_cached_tokens": pii_bob["cached_tokens"],
        "benign_cached_tokens": benign_bob["cached_tokens"],
    }
    result["verdict"] = (
        "PASS"
        if not result["pii_prefix_shared_to_other_user"]
        and result["benign_prefix_shared_to_other_user"]
        else "FAIL"
    )
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
