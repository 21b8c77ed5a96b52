"""HumanEval pass@1 evaluation against the Engine.

Re-creation of the reference's ``python/sglang/test/simple_eval_humaneval.py``
(which wraps the human-eval package): generate one completion per
problem, run the problem's unit tests in an isolated subprocess with a
timeout, report pass@1.  No network access is assumed: pass ``--data``
pointing at a local HumanEval-format jsonl (fields: task_id, prompt,
entry_point, test; the reference CI gate for Llama-3.1-8B is >0.64,
``test/srt/test_eval_accuracy_large.py:72``).

Usage:
  python -m sglang_security_tpu.eval.humaneval --model-path ... --data HumanEval.jsonl
  (or programmatically: run_humaneval(engine, data_path))
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from typing import List, Optional

# canonical completion-mode stop sequences (human-eval readme)
STOP_SEQUENCES = ["\nclass ", "\ndef ", "\n#", "\nif ", "\nprint"]

_RUNNER = r"""
import sys
src = sys.stdin.read()
ns = {}
exec(src, ns)  # defines the solution, the check() tests, and runs them
print("HUMANEVAL_PASS")
"""


def read_jsonl(path: str) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def check_one(problem: dict, completion: str, timeout: float = 10.0) -> bool:
    """Execute prompt+completion against the problem's tests in a fresh
    python subprocess (the reference delegates to human-eval's
    check_correctness sandbox; a subprocess + timeout is the same
    isolation without the dependency)."""
    program = (
        problem["prompt"]
        + completion
        + "\n\n"
        + problem["test"]
        + f"\n\ncheck({problem['entry_point']})\n"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", _RUNNER],
            input=program,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False
    return "HUMANEVAL_PASS" in res.stdout


def run_humaneval(
    engine,
    data_path: str,
    num_questions: Optional[int] = None,
    max_new_tokens: int = 512,
    exec_timeout: float = 10.0,
) -> dict:
    problems = read_jsonl(data_path)
    if num_questions:
        problems = problems[:num_questions]
    t0 = time.time()
    outs = engine.generate(
        prompt=[p["prompt"] for p in problems],
        sampling_params={
            "temperature": 0.0,
            "max_new_tokens": max_new_tokens,
            "stop": STOP_SEQUENCES,
        },
    )
    gen_s = time.time() - t0
    results = [
        check_one(p, o["text"], timeout=exec_timeout)
        for p, o in zip(problems, outs)
    ]
    n = len(problems)
    return {
        "pass@1": sum(results) / max(n, 1),
        "num_questions": n,
        "generation_seconds": gen_s,
        "failed_task_ids": [
            p["task_id"] for p, ok in zip(problems, results) if not ok
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--num-questions", type=int, default=None)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--quantization", default=None)
    args = ap.parse_args()

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path=args.model_path, quantization=args.quantization
    ))
    try:
        print(json.dumps(run_humaneval(
            eng, args.data, num_questions=args.num_questions,
            max_new_tokens=args.max_new_tokens,
        )))
    finally:
        eng.shutdown()


if __name__ == "__main__":
    main()
