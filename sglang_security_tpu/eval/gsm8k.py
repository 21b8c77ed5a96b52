"""Few-shot GSM8K evaluation against the Engine (or an HTTP endpoint).

Re-creation of the reference's ``python/sglang/test/few_shot_gsm8k.py``:
k-shot chain-of-thought prompting, "The answer is X" / "#### X" numeric
extraction, accuracy + invalid-rate reporting.  No network access is
assumed: pass ``--data`` pointing at a local GSM8K-format jsonl
(fields: question, answer with the final value after ``####``).

Usage:
  python -m sglang_security_tpu.eval.gsm8k --model-path ... --data test.jsonl
  (or programmatically: run_gsm8k(engine, data_path, num_shots=5))
"""

from __future__ import annotations

import argparse
import json
import re
import time
from typing import List, Optional

INVALID = -9999999


def read_jsonl(path: str) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def extract_answer(text: str) -> int:
    """Last integer after 'The answer is'/'####', else last number in the
    text (reference few_shot_gsm8k.py get_answer_value semantics)."""
    for pat in (r"[Tt]he answer is\s*\$?(-?[\d,]+)", r"####\s*\$?(-?[\d,]+)"):
        m = re.findall(pat, text)
        if m:
            try:
                return int(m[-1].replace(",", ""))
            except ValueError:
                pass
    nums = re.findall(r"-?[\d,]*\d", text)
    for cand in reversed(nums):
        try:
            return int(cand.replace(",", ""))
        except ValueError:
            continue
    return INVALID


def gold_answer(answer_field: str) -> int:
    m = re.search(r"####\s*\$?(-?[\d,]+)", answer_field)
    if not m:
        return INVALID
    return int(m.group(1).replace(",", ""))


def build_prompt(shots: List[dict], question: str) -> str:
    parts = []
    for ex in shots:
        body = ex["answer"].split("####")[0].strip()
        ans = gold_answer(ex["answer"])
        parts.append(
            f"Question: {ex['question']}\nAnswer: {body} "
            f"The answer is {ans}.\n"
        )
    parts.append(f"Question: {question}\nAnswer:")
    return "\n".join(parts)


def run_gsm8k(
    engine,
    data_path: str,
    num_shots: int = 5,
    num_questions: Optional[int] = None,
    max_new_tokens: int = 256,
) -> dict:
    data = read_jsonl(data_path)
    shots, rest = data[:num_shots], data[num_shots:]
    if num_questions:
        rest = rest[:num_questions]
    prompts = [build_prompt(shots, ex["question"]) for ex in rest]
    golds = [gold_answer(ex["answer"]) for ex in rest]
    t0 = time.time()
    outs = engine.generate(
        prompt=prompts,
        sampling_params={
            "temperature": 0.0,
            "max_new_tokens": max_new_tokens,
            "stop": ["Question:", "\n\n"],
        },
    )
    dt = time.time() - t0
    preds = [extract_answer(o["text"]) for o in outs]
    correct = sum(p == g for p, g in zip(preds, golds))
    invalid = sum(p == INVALID for p in preds)
    n = len(rest)
    return {
        "accuracy": correct / max(n, 1),
        "invalid_rate": invalid / max(n, 1),
        "num_questions": n,
        "latency_s": round(dt, 1),
        "output_throughput": round(
            sum(o["meta_info"]["completion_tokens"] for o in outs) / dt, 1
        ),
    }


def main():
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="GSM8K-format jsonl")
    ap.add_argument("--num-shots", type=int, default=5)
    ap.add_argument("--num-questions", type=int, default=None)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ServerArgs.add_cli_args(ap)
    args = ap.parse_args()
    engine = Engine(ServerArgs.from_cli_args(args))
    try:
        res = run_gsm8k(
            engine, args.data, args.num_shots, args.num_questions,
            args.max_new_tokens,
        )
    finally:
        engine.shutdown()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
