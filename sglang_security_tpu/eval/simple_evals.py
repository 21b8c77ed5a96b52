"""simple-evals ports: MGSM, GPQA, MATH (reference
``python/sglang/test/simple_eval_mgsm.py`` / ``simple_eval_gpqa.py`` /
``simple_eval_math.py``, themselves adapted from openai/simple-evals).

Zero-egress design: the reference streams datasets from public URLs;
here every eval takes a LOCAL data file in the same format (mgsm: tsv
``question\\tanswer``; gpqa: csv with Question/Correct Answer/Incorrect
Answer 1..3; math: jsonl with Question/Answer).  Prompt templates,
answer-extraction regexes, and scoring follow the reference exactly so
numbers are comparable.

The MATH equality check is the reference's *string-normalized* fallback
(its model-judged EQUALITY_TEMPLATE path needs a judge endpoint; pass
``equality_fn`` to plug one in).
"""

from __future__ import annotations

import csv
import json
import random
import re
from typing import Callable, List, Optional

# ---------------------------------------------------------------- shared
ANSWER_PATTERN_MULTICHOICE = r"(?i)Answer\s*:\s*([A-D])"
ANSWER_PATTERN = r"(?i)Answer\s*:\s*([^\n]+)"

QUERY_TEMPLATE_MULTICHOICE = """
Answer the following multiple choice question. The last line of your \
response should be of the following format: 'Answer: $LETTER' (without \
quotes) where LETTER is one of ABCD. Think step by step before answering.

{Question}

A) {A}
B) {B}
C) {C}
D) {D}
""".strip()


def _generate(engine, prompts: List[str], max_new_tokens: int,
              temperature: float = 0.0) -> List[str]:
    outs = engine.generate(
        prompt=prompts,
        sampling_params={"temperature": temperature,
                         "max_new_tokens": max_new_tokens},
    )
    if isinstance(outs, dict):
        outs = [outs]
    return [o["text"] for o in outs]


# ------------------------------------------------------------------ MGSM
LATIN_LANGUAGES = ["de", "en", "es", "fr", "sw"]

LANG_TO_INSTRUCTION_EN = (
    "Solve this math problem. Give the final answer in the format "
    '"Answer: X" as the last line.\n\n{input}'
)

LANG_TO_ANSWER_PREFIX = {
    "en": "Answer", "bn": "উত্তর", "de": "Antwort", "es": "Respuesta",
    "fr": "Réponse", "ja": "答え", "ru": "Ответ", "sw": "Jibu",
    "te": "సమాధానం", "th": "คำตอบ", "zh": "答案",
}


def parse_mgsm_answer(answer: str, answer_prefix: str) -> str:
    """Reference simple_eval_mgsm.parse_answer: last number after the
    language's answer prefix."""
    if answer_prefix not in answer:
        return ""
    answer_text = answer.split(answer_prefix)[-1].strip()
    numbers = re.findall(r"\d+\.?\d*", answer_text.replace(",", ""))
    return numbers[-1].rstrip(".") if numbers else ""


def score_mgsm(target: str, prediction: str) -> bool:
    if "." in prediction:
        prediction = prediction.rstrip("0").rstrip(".")
    return target.replace(",", "") == prediction.replace(",", "")


def run_mgsm(engine, data_path: str, lang: str = "en",
             num_examples: Optional[int] = None,
             max_new_tokens: int = 256) -> dict:
    """data_path: tsv of ``question\\tanswer`` rows (the format of the
    reference's mgsm_{lang}.tsv files, fetched locally)."""
    rows = []
    with open(data_path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                q, a = line.split("\t")
                rows.append({"inputs": q, "targets": a})
    if num_examples:
        rows = rows[:num_examples]
    prefix = LANG_TO_ANSWER_PREFIX[lang]
    prompts = [
        LANG_TO_INSTRUCTION_EN.format(input=r["inputs"]) for r in rows
    ]
    texts = _generate(engine, prompts, max_new_tokens)
    correct = sum(
        score_mgsm(r["targets"], parse_mgsm_answer(t, prefix))
        for r, t in zip(rows, texts)
    )
    return {
        "score": correct / max(len(rows), 1),
        "num_examples": len(rows),
        "lang": lang,
        "group": "latin" if lang in LATIN_LANGUAGES else "non_latin",
    }


# ------------------------------------------------------------------ GPQA
def format_multichoice_question(row: dict) -> str:
    return QUERY_TEMPLATE_MULTICHOICE.format(**row)


def run_gpqa(engine, data_path: str, num_examples: Optional[int] = None,
             n_repeats: int = 1, max_new_tokens: int = 512,
             seed: int = 0) -> dict:
    """data_path: csv with columns Question, Correct Answer,
    Incorrect Answer 1..3 (the gpqa_diamond.csv layout).  Choices are
    shuffled per example like the reference (rng seeded)."""
    with open(data_path) as f:
        rows = list(csv.DictReader(f))
    rng = random.Random(seed)
    if num_examples:
        rows = rng.sample(rows, min(num_examples, len(rows)))
    rows = rows * n_repeats
    prompts, golds = [], []
    for row in rows:
        perm = rng.sample(range(4), 4)
        choices = [
            row["Correct Answer"], row["Incorrect Answer 1"],
            row["Incorrect Answer 2"], row["Incorrect Answer 3"],
        ]
        shuffled = [choices[i] for i in perm]
        gold = "ABCD"[perm.index(0)]
        prompts.append(format_multichoice_question({
            "Question": row["Question"],
            "A": shuffled[0], "B": shuffled[1],
            "C": shuffled[2], "D": shuffled[3],
        }))
        golds.append(gold)
    texts = _generate(engine, prompts, max_new_tokens)
    correct = 0
    for t, gold in zip(texts, golds):
        m = re.search(ANSWER_PATTERN_MULTICHOICE, t)
        correct += bool(m and m.group(1) == gold)
    return {"score": correct / max(len(rows), 1),
            "num_examples": len(rows)}


# ------------------------------------------------------------------ MATH
MATH_QUERY_TEMPLATE = """
Solve the following math problem step by step. The last line of your \
response should be of the form Answer: $ANSWER (without quotes) where \
$ANSWER is the answer to the problem.

{Question}

Remember to put your answer on its own line after "Answer:", and you do \
not need to use a \\boxed command.
""".strip()


def normalize_math_answer(s: str) -> str:
    """Trivial-simplification string normalization (the in-environment
    stand-in for the reference's model-judged check_equality)."""
    s = s.strip().strip("$").strip()
    s = s.replace(" ", "").replace("\\!", "").replace("\\,", "")
    s = s.replace("dfrac", "frac").replace("tfrac", "frac")
    s = s.rstrip(".")
    if re.fullmatch(r"-?\d+\.0+", s):
        s = s.split(".")[0]
    return s


def run_math(engine, data_path: str, num_examples: Optional[int] = None,
             max_new_tokens: int = 512,
             equality_fn: Optional[Callable[[str, str], bool]] = None
             ) -> dict:
    """data_path: jsonl rows with Question + Answer fields."""
    rows = []
    with open(data_path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if num_examples:
        rows = rows[:num_examples]
    prompts = [
        MATH_QUERY_TEMPLATE.format(Question=r["Question"]) for r in rows
    ]
    texts = _generate(engine, prompts, max_new_tokens)
    eq = equality_fn or (
        lambda a, b: normalize_math_answer(a) == normalize_math_answer(b)
    )
    correct = 0
    for r, t in zip(rows, texts):
        m = re.search(ANSWER_PATTERN, t)
        correct += bool(m and eq(m.group(1), str(r["Answer"])))
    return {"score": correct / max(len(rows), 1),
            "num_examples": len(rows)}
