"""PII extraction / detector coverage eval.

Re-creation of the reference's PII-coverage tooling
(``ndss_scripts/extract_not_supported_pii.py`` + the level-2 rewrite
clients): the reference scans the english_pii_43k dataset for PII types
that the tier-2 model (Piiranha) cannot label and measures tier-1/2
detection quality.  That dataset is not redistributable, so this script
generates a seeded synthetic labeled corpus from templates covering the
same type taxonomy, then reports per-type recall and benign-corpus
false-positive rate for the SafeKV tier-1 detector (and tier-2 when a
model path is given), plus the "unsupported types" list analog.

Usage:
  python ndss_scripts/pii_extraction_eval.py [--n-per-type 50]
      [--tier2-model PATH] [--json]
"""

from __future__ import annotations

import argparse
import json
import random

from sglang_security_tpu.managers.private_service.privacy_detector import (
    PrivacyDetector,
)

# synthetic PII value generators, keyed by the reference taxonomy
FIRST = ["alice", "bob", "carol", "david", "elena", "frank", "grace"]
LAST = ["smith", "jones", "garcia", "chen", "patel", "mueller", "kim"]
STREETS = ["Oak Ave", "Main St", "Pine Rd", "Elm Blvd", "Cedar Ln"]
CITIES = ["Springfield", "Riverton", "Lakeside", "Hillview", "Brookfield"]


def _digits(rng, n):
    return "".join(str(rng.randrange(10)) for _ in range(n))


def make_generators(rng: random.Random):
    return {
        "EMAIL": lambda: (
            f"{rng.choice(FIRST)}.{rng.choice(LAST)}@example{rng.randrange(9)}.com"
        ),
        "SOCIALNUM": lambda: f"{_digits(rng,3)}-{_digits(rng,2)}-{_digits(rng,4)}",
        "CREDITCARDNUMBER": lambda: " ".join(_digits(rng, 4) for _ in range(4)),
        "TELEPHONENUM": lambda: f"({_digits(rng,3)}) {_digits(rng,3)}-{_digits(rng,4)}",
        "PASSWORD": lambda: f"password: {rng.choice(FIRST)}{_digits(rng,4)}!",
        "ACCOUNTNUM": lambda: f"bank account {_digits(rng, 10)}",
        "IPV4": lambda: ".".join(str(rng.randrange(1, 255)) for _ in range(4)),
        "APIKEY": lambda: "sk-" + "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(24)
        ),
        "AWSKEY": lambda: "AKIA" + "".join(
            rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ234567") for _ in range(16)
        ),
        "IBAN": lambda: "DE" + _digits(rng, 2) + "500105170" + _digits(rng, 10),
        "DATEOFBIRTH": lambda: (
            f"date of birth {rng.randrange(1,13):02d}/{rng.randrange(1,29):02d}/"
            f"{rng.randrange(1950, 2005)}"
        ),
        "STREET": lambda: f"{rng.randrange(1, 999)} {rng.choice(STREETS)}",
        "DRIVERLICENSENUM": lambda: f"driver license D{_digits(rng, 8)}",
        "MEDICAL": lambda: (
            f"my diagnosis is condition-{_digits(rng,3)} per my medical record"
        ),
        "SALARY": lambda: f"my salary is ${rng.randrange(40, 400)}000 per year",
        "GIVENNAME": lambda: f"I'm {rng.choice(FIRST).title()}",
        "CITY": lambda: f"I live in {rng.choice(CITIES)}",
        "JOBTITLE": lambda: "I work as a staff engineer",
    }


TEMPLATES = [
    "please summarize my account: {pii} and reply briefly",
    "hi assistant, {pii}, can you help me file this form?",
    "for the record {pii}. what should I do next?",
    "customer note: {pii} -- draft a response email",
]

BENIGN = [
    "what are some good productivity apps for note taking",
    "explain the difference between tcp and udp briefly",
    "suggest a three day itinerary for a mountain hiking trip",
    "how do I cook rice so it does not stick to the pan",
    "write a haiku about autumn leaves on a quiet street",
    "what is the time complexity of quicksort in the worst case",
]


def run_eval(n_per_type: int = 50, tier2_model: str | None = None, seed: int = 0):
    rng = random.Random(seed)
    gens = make_generators(rng)
    det = PrivacyDetector()
    tier2 = None
    if tier2_model:
        from sglang_security_tpu.managers.private_service.pii_model import (
            PIIModel,
        )

        tier2 = PIIModel(tier2_model)

    per_type = {}
    for label, gen in gens.items():
        hits = t2_hits = 0
        for _ in range(n_per_type):
            text = rng.choice(TEMPLATES).format(pii=gen())
            r = det.detect(text)
            if r.is_private:
                hits += 1
            if tier2 is not None and tier2.detect(text).is_private:
                t2_hits += 1
        row = {"tier1_recall": hits / n_per_type}
        if tier2 is not None:
            row["tier2_recall"] = t2_hits / n_per_type
        per_type[label] = row

    fp = 0
    n_benign = len(BENIGN) * max(n_per_type // len(BENIGN), 1)
    for i in range(n_benign):
        text = BENIGN[i % len(BENIGN)] + f" (case {i})"
        r = det.detect(text)
        if r.is_private and r.confidence > 0.5:
            fp += 1

    unsupported = [
        t for t, row in per_type.items() if row["tier1_recall"] < 0.5
    ]
    return {
        "per_type": per_type,
        "tier1_unsupported_types": sorted(unsupported),
        "benign_false_positive_rate": fp / n_benign,
        "n_per_type": n_per_type,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-type", type=int, default=50)
    ap.add_argument("--tier2-model", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    result = run_eval(args.n_per_type, args.tier2_model)
    print(json.dumps(result, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
