"""MMLU evaluation against the Engine.

Re-creation of the reference's ``python/sglang/test/simple_eval_mmlu.py``:
5-shot multiple choice, answer extracted as the first A-D letter of the
generation.  Data: a local csv/jsonl with fields
(question, A, B, C, D, answer) per row — the standard MMLU test format —
or a directory of per-subject csvs.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
from typing import List, Optional

CHOICES = ["A", "B", "C", "D"]

QUERY_TEMPLATE = (
    "Answer the following multiple choice question. The last line of your "
    "response should be of the following format: 'Answer: $LETTER' (without "
    "quotes) where LETTER is one of ABCD.\n\n"
    "{question}\n\nA) {A}\nB) {B}\nC) {C}\nD) {D}\n\nAnswer:"
)

ANSWER_PAT = re.compile(r"\b([ABCD])\b")


def read_rows(path: str) -> List[dict]:
    rows = []
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".csv"):
                rows.extend(read_rows(os.path.join(path, fn)))
        return rows
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
        return rows
    with open(path) as f:
        for r in csv.reader(f):
            if len(r) >= 6:
                rows.append(
                    {"question": r[0], "A": r[1], "B": r[2], "C": r[3],
                     "D": r[4], "answer": r[5].strip()}
                )
    return rows


def extract_choice(text: str) -> Optional[str]:
    m = re.search(r"Answer:\s*([ABCD])", text)
    if m:
        return m.group(1)
    m = ANSWER_PAT.search(text.strip())
    return m.group(1) if m else None


def run_mmlu(
    engine, data_path: str, num_questions: Optional[int] = None,
    max_new_tokens: int = 64, method: str = "generate",
) -> dict:
    """method="generate": answer-letter extraction (reference
    simple_eval_mmlu).  method="loglikelihood": lm-eval-harness style --
    score each choice continuation by its prompt logprobs
    (input_token_logprobs) and pick the argmax; no sampling involved."""
    rows = read_rows(data_path)
    if num_questions:
        rows = rows[:num_questions]
    if method == "loglikelihood":
        return _run_mmlu_loglikelihood(engine, rows)
    prompts = [QUERY_TEMPLATE.format(**r) for r in rows]
    outs = engine.generate(
        prompt=prompts,
        sampling_params={"temperature": 0.0, "max_new_tokens": max_new_tokens},
    )
    preds = [extract_choice(o["text"]) for o in outs]
    correct = sum(
        p is not None and p == r["answer"] for p, r in zip(preds, rows)
    )
    return {
        "accuracy": correct / max(len(rows), 1),
        "num_questions": len(rows),
        "invalid_rate": sum(p is None for p in preds) / max(len(rows), 1),
    }


def _run_mmlu_loglikelihood(engine, rows: List[dict]) -> dict:
    tok = engine.tokenizer_manager.tokenizer
    assert tok is not None, "loglikelihood scoring needs the tokenizer"
    prompts, spans = [], []  # spans: (row, choice, prefix_len)
    for r in rows:
        stem = QUERY_TEMPLATE.format(**r)
        stem_ids = tok.encode(stem)
        for c in CHOICES:
            full_ids = tok.encode(stem + " " + c)
            prompts.append(full_ids)
            spans.append(len(stem_ids))
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"temperature": 0.0, "max_new_tokens": 1,
                         "ignore_eos": True, "logprob_start_len": 0},
        return_logprob=True,
    )
    correct = 0
    for i, r in enumerate(rows):
        scores = []
        for j in range(4):
            o = outs[i * 4 + j]
            lps = o["meta_info"]["input_token_logprobs"]
            # continuation tokens = everything past the stem; lps[t] is
            # the logprob of prompt token t+1
            n_cont = len(prompts[i * 4 + j]) - spans[i * 4 + j]
            scores.append(sum(lps[-n_cont:]) if n_cont else float("-inf"))
        if CHOICES[int(max(range(4), key=scores.__getitem__))] == r["answer"]:
            correct += 1
    return {
        "accuracy": correct / max(len(rows), 1),
        "num_questions": len(rows),
        "invalid_rate": 0.0,
        "method": "loglikelihood",
    }


def main():
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--num-questions", type=int, default=None)
    ap.add_argument("--method", default="generate",
                    choices=["generate", "loglikelihood"])
    ServerArgs.add_cli_args(ap)
    args = ap.parse_args()
    engine = Engine(ServerArgs.from_cli_args(args))
    try:
        res = run_mmlu(engine, args.data, args.num_questions,
                       method=args.method)
    finally:
        engine.shutdown()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
