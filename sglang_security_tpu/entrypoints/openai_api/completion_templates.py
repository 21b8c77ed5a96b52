"""FIM (fill-in-middle) completion templates for code models.

Re-creation of the reference's ``srt/code_completion_parser.py``: when
/v1/completions carries a ``suffix``, the prompt is rewritten with the
served model's FIM tokens, selected by ``--completion-template`` (a
registry name or a json file with name/fim_*_token/fim_position).

fim_position:
  middle  <begin>{prefix}<hole>{suffix}<end>            (PSM order)
  end     <begin>{prefix}<end>{suffix}<middle>          (SPM-at-end)
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, Optional


@dataclass
class CompletionTemplate:
    name: str
    fim_begin_token: str
    fim_middle_token: str
    fim_end_token: str
    fim_position: str  # "middle" | "end"


COMPLETION_TEMPLATES: Dict[str, CompletionTemplate] = {}


def register_completion_template(t: CompletionTemplate,
                                 override: bool = False) -> None:
    if not override:
        assert t.name not in COMPLETION_TEMPLATES, t.name
    COMPLETION_TEMPLATES[t.name] = t


for _t in (
    # token conventions per model card
    CompletionTemplate("deepseek-coder", "<|fim▁begin|>", "<|fim▁hole|>",
                       "<|fim▁end|>", "middle"),
    CompletionTemplate("starcoder", "<fim_prefix>", "<fim_middle>",
                       "<fim_suffix>", "end"),
    CompletionTemplate("codellama", "<PRE> ", " <MID>", " <SUF>", "end"),
    CompletionTemplate("qwen-coder", "<|fim_prefix|>", "<|fim_middle|>",
                       "<|fim_suffix|>", "end"),
    CompletionTemplate("codegemma", "<|fim_prefix|>", "<|fim_middle|>",
                       "<|fim_suffix|>", "end"),
):
    register_completion_template(_t)


def load_completion_template(arg: str) -> str:
    """Resolve --completion-template: a registry name, or a json file
    that registers a custom template; returns the template name."""
    if arg in COMPLETION_TEMPLATES:
        return arg
    with open(arg) as f:
        d = json.load(f)
    register_completion_template(
        CompletionTemplate(
            name=d["name"],
            fim_begin_token=d["fim_begin_token"],
            fim_middle_token=d["fim_middle_token"],
            fim_end_token=d["fim_end_token"],
            fim_position=d["fim_position"].lower(),
        ),
        override=True,
    )
    return d["name"]


def build_fim_prompt(name: Optional[str], prefix: str,
                     suffix: str) -> str:
    if not name:
        raise ValueError(
            "completions with `suffix` need --completion-template "
            f"(known: {sorted(COMPLETION_TEMPLATES)})"
        )
    t = COMPLETION_TEMPLATES[name]
    if t.fim_position == "middle":
        return (t.fim_begin_token + prefix + t.fim_middle_token + suffix
                + t.fim_end_token)
    return (t.fim_begin_token + prefix + t.fim_end_token + suffix
            + t.fim_middle_token)
