"""Accuracy-harness plumbing tests (answer extraction, prompt building,
end-to-end run against a tiny engine with a synthetic dataset)."""

import json

import pytest

from sglang_security_tpu.eval.gsm8k import (
    build_prompt, extract_answer, gold_answer, run_gsm8k,
)
from sglang_security_tpu.eval.mmlu import extract_choice, run_mmlu


def test_gsm8k_answer_extraction():
    assert extract_answer("blah blah The answer is 42.") == 42
    assert extract_answer("compute... #### 1,234") == 1234
    assert extract_answer("so we get 17 apples") == 17
    assert extract_answer("no numbers here") == -9999999
    assert gold_answer("step 1... step 2... #### 72") == 72


def test_mmlu_choice_extraction():
    assert extract_choice("Answer: C") == "C"
    assert extract_choice(" B) because ...") == "B"
    assert extract_choice("nothing") is None


class FakeEngine:
    """Echoes a canned completion per prompt index."""

    def __init__(self, texts):
        self.texts = texts

    def generate(self, prompt, sampling_params):
        return [
            {"text": t, "meta_info": {"completion_tokens": 5}}
            for t in self.texts[: len(prompt)]
        ]


def test_run_gsm8k_scoring(tmp_path):
    data = [
        {"question": f"shot {i}", "answer": f"work. #### {i}"}
        for i in range(2)
    ] + [
        {"question": "2+2?", "answer": "add. #### 4"},
        {"question": "3*3?", "answer": "mul. #### 9"},
    ]
    p = tmp_path / "gsm8k.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in data))
    eng = FakeEngine(["The answer is 4.", "The answer is 8."])
    res = run_gsm8k(eng, str(p), num_shots=2)
    assert res["num_questions"] == 2
    assert res["accuracy"] == 0.5


def test_run_mmlu_scoring(tmp_path):
    rows = [
        {"question": "q1", "A": "a", "B": "b", "C": "c", "D": "d",
         "answer": "A"},
        {"question": "q2", "A": "a", "B": "b", "C": "c", "D": "d",
         "answer": "D"},
    ]
    p = tmp_path / "mmlu.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    eng = FakeEngine(["Answer: A", "Answer: B"])
    res = run_mmlu(eng, str(p))
    assert res["accuracy"] == 0.5


def test_gsm8k_against_tiny_engine(tmp_path):
    """Full plumbing against a real (random-weight) engine: accuracy is
    meaningless but the run must complete and report all fields."""
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    tiny = make_tiny_llama(str(tmp_path / "m"))
    data = [
        {"question": f"what is {i}+{i}?", "answer": f"sum. #### {2*i}"}
        for i in range(4)
    ]
    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in data))
    eng = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=2048, page_size=8,
        prefill_token_buckets=[128, 256], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 32], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    try:
        res = run_gsm8k(eng, str(p), num_shots=2, max_new_tokens=8)
    finally:
        eng.shutdown()
    assert res["num_questions"] == 2
    assert 0.0 <= res["accuracy"] <= 1.0


def test_mmlu_loglikelihood_against_tiny_engine(tmp_path):
    """lm-eval-style choice scoring via input_token_logprobs: runs end
    to end and the argmax is consistent with direct logprob sums."""
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    tiny = make_tiny_llama(str(tmp_path / "m"))
    rows = [
        {"question": "pick one", "A": "alpha", "B": "beta",
         "C": "gamma", "D": "delta", "answer": "B"},
        {"question": "pick another", "A": "one", "B": "two",
         "C": "three", "D": "four", "answer": "C"},
    ]
    p = tmp_path / "mmlu.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    eng = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=4096, page_size=8,
        prefill_token_buckets=[128, 256], decode_bs_buckets=[1, 4, 8],
        max_seq_pages_buckets=[8, 32], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    try:
        res = run_mmlu(eng, str(p), method="loglikelihood")
    finally:
        eng.shutdown()
    assert res["num_questions"] == 2
    assert res["invalid_rate"] == 0.0
    assert 0.0 <= res["accuracy"] <= 1.0


def test_humaneval_check_and_run(tmp_path):
    from sglang_security_tpu.eval.humaneval import (
        check_one, run_humaneval,
    )

    problems = [
        {
            "task_id": "Tiny/0",
            "prompt": "def add(a, b):\n    \"\"\"Add two numbers.\"\"\"\n",
            "entry_point": "add",
            "test": ("def check(f):\n    assert f(1, 2) == 3\n"
                     "    assert f(-1, 1) == 0\n"),
        },
        {
            "task_id": "Tiny/1",
            "prompt": "def mul(a, b):\n    \"\"\"Multiply.\"\"\"\n",
            "entry_point": "mul",
            "test": "def check(f):\n    assert f(3, 4) == 12\n",
        },
    ]
    # generous timeouts: under pytest-xdist the 4 workers oversubscribe
    # the 4 CPUs and a fresh python subprocess can take seconds to start
    assert check_one(problems[0], "    return a + b\n", timeout=120)
    assert not check_one(problems[0], "    return a - b\n", timeout=120)
    assert not check_one(problems[0], "    while True: pass\n", timeout=5)

    class FakeEngine:
        def generate(self, prompt, sampling_params):
            outs = []
            for p in prompt:
                if "add" in p:
                    outs.append({"text": "    return a + b\n"})
                else:
                    outs.append({"text": "    return a + b\n"})  # wrong
            return outs

    data = tmp_path / "he.jsonl"
    with open(data, "w") as f:
        for p in problems:
            f.write(json.dumps(p) + "\n")
    res = run_humaneval(FakeEngine(), str(data), exec_timeout=120)
    assert res["num_questions"] == 2
    assert res["pass@1"] == 0.5
    assert res["failed_task_ids"] == ["Tiny/1"]


# ----------------------------------------------- simple-evals ports (r4)
def test_mgsm_parse_and_score():
    from sglang_security_tpu.eval.simple_evals import (
        parse_mgsm_answer, score_mgsm,
    )

    assert parse_mgsm_answer("thinking... Answer: 42", "Answer") == "42"
    assert parse_mgsm_answer("Antwort: 1,234 Äpfel", "Antwort") == "1234"
    assert parse_mgsm_answer("no prefix 5", "Answer") == ""
    assert score_mgsm("72", "72.0")
    assert score_mgsm("1,234", "1234")
    assert not score_mgsm("72", "73")


def test_mgsm_run(tmp_path):
    from sglang_security_tpu.eval.simple_evals import run_mgsm

    data = tmp_path / "mgsm_en.tsv"
    data.write_text("What is 2+2?\t4\nWhat is 3*3?\t9\n")

    class FakeEngine:
        def generate(self, prompt, sampling_params):
            return [
                {"text": "2+2 is simple. Answer: 4"},
                {"text": "Answer: 8"},  # wrong
            ]

    res = run_mgsm(FakeEngine(), str(data), lang="en")
    assert res["score"] == 0.5 and res["num_examples"] == 2
    assert res["group"] == "latin"


def test_gpqa_run(tmp_path):
    from sglang_security_tpu.eval.simple_evals import run_gpqa

    data = tmp_path / "gpqa.csv"
    data.write_text(
        "Question,Correct Answer,Incorrect Answer 1,"
        "Incorrect Answer 2,Incorrect Answer 3\n"
        "Pick right,R,W1,W2,W3\n"
    )

    class FakeEngine:
        def generate(self, prompt, sampling_params):
            outs = []
            for p in prompt:
                # answer with the letter whose choice text is 'R'
                for letter in "ABCD":
                    if f"{letter}) R" in p:
                        outs.append({"text": f"because. Answer: {letter}"})
                        break
            return outs

    res = run_gpqa(FakeEngine(), str(data), n_repeats=4)
    assert res["score"] == 1.0 and res["num_examples"] == 4


def test_math_run(tmp_path):
    import json as _json

    from sglang_security_tpu.eval.simple_evals import (
        normalize_math_answer, run_math,
    )

    assert normalize_math_answer("$\\dfrac{1}{2}$") == "\\frac{1}{2}"
    assert normalize_math_answer(" 42.0 ") == "42"
    data = tmp_path / "math.jsonl"
    with open(data, "w") as f:
        f.write(_json.dumps({"Question": "1+1?", "Answer": "2"}) + "\n")
        f.write(_json.dumps({"Question": "6*7?", "Answer": "42"}) + "\n")

    class FakeEngine:
        def generate(self, prompt, sampling_params):
            return [{"text": "Answer: 2"}, {"text": "Answer: 41"}]

    res = run_math(FakeEngine(), str(data))
    assert res["score"] == 0.5 and res["num_examples"] == 2
