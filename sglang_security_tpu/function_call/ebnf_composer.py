"""Tool-call grammar composer: bind tool JSON schemas to the grammar engine.

Reference analog: ``srt/function_call/ebnf_composer.py`` (EBNFComposer.
build_ebnf) plus the per-detector framing in ``qwen25_detector.py`` /
``mistral_detector.py`` / ``llama32_detector.py`` / ``pythonic_detector.py``
/ ``deepseekv3_detector.py``.  The reference emits EBNF because its grammar
backends (xgrammar/llguidance) consume EBNF; this framework's native
grammar engine (constrained/regex_engine.py) compiles every constraint
kind — json-schema, EBNF, regex — down to one regex→NFA→DFA IR, so the
composer binds tool schemas directly to that IR: framing tokens become
escaped literals and each tool's argument schema is lowered with the same
``schema_to_regex`` used for response_format.  One IR, no EBNF detour,
identical capability (per-format wrapping tokens, multi-call separators,
enum/type-aware argument rules, required/optional properties).

Formats mirror FunctionCallParser (function_call/parser.py) so anything
the composer forces, the parser can parse back:

  json        {"name": "f", "arguments": {...}}  (or [..., ...] list)
  qwen25      <tool_call>\\n{json}\\n</tool_call> (repeatable)
  mistral     [TOOL_CALLS] [{json}, ...]
  llama32     <|python_tag|>{json};{json}...     (plain {json} also valid)
  deepseekv3  unicode-fenced name + ```json args block
  pythonic    [f(a=1, b="x"), g()]
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Union

from sglang_security_tpu.constrained.json_schema import schema_to_regex

WS = r"[ \n\t]?"


@dataclass(frozen=True)
class CallFormat:
    """Framing for one tool-call dialect (reference: the detector's
    sequence_start/end, individual call start/end and separator args to
    EBNFComposer.build_ebnf)."""

    seq_start: str = ""
    seq_end: str = ""
    call_start: str = ""
    call_end: str = ""
    separator: Optional[str] = None  # None -> single call only
    style: str = "json"  # "json" | "pythonic" | "deepseek"


FORMATS: Dict[str, CallFormat] = {
    "json": CallFormat(separator=None),
    "qwen25": CallFormat(
        call_start="<tool_call>\n", call_end="\n</tool_call>", separator="\n"
    ),
    "mistral": CallFormat(seq_start="[TOOL_CALLS] [", seq_end="]",
                          separator=", "),
    "llama32": CallFormat(seq_start="<|python_tag|>", separator=";"),
    "deepseekv3": CallFormat(
        seq_start="<｜tool▁calls▁begin｜>",
        seq_end="<｜tool▁calls▁end｜>",
        separator="\n",
        style="deepseek",
    ),
    "pythonic": CallFormat(seq_start="[", seq_end="]", separator=", ",
                           style="pythonic"),
}


def _function(tool: dict) -> dict:
    return tool.get("function", tool)


def _args_regex(fn: dict, style: str) -> str:
    params = fn.get("parameters") or {"type": "object", "properties": {}}
    if style == "pythonic":
        return _pythonic_args_regex(params)
    return schema_to_regex(params, whitespace=WS)


def _pythonic_value_regex(prop: dict) -> str:
    """Python-literal value rule (reference PYTHONIC_TYPE_MAPPING)."""
    if "enum" in prop:
        opts = []
        for v in prop["enum"]:
            if isinstance(v, bool):
                opts.append("True" if v else "False")
            elif isinstance(v, (int, float)):
                opts.append(re.escape(json.dumps(v)))
            else:
                opts.append(re.escape(json.dumps(str(v))))
        return "(?:" + "|".join(opts) + ")"
    t = prop.get("type")
    table = {
        "string": r'"(?:[^"\\\x00-\x1f]|\\["\\/bfnrt])*"',
        "integer": r"(?:-?(?:0|[1-9]\d*))",
        "number": r"(?:-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?)",
        "boolean": r"(?:True|False)",
        "null": r"None",
    }
    if t in table:
        return table[t]
    if t == "array":
        item = _pythonic_value_regex(prop.get("items", {"type": "string"}))
        return rf"\[(?:{item}(?:,{WS}{item})*)?\]"
    # free-form / object: accept a bounded python literal (json-ish)
    scalar = "(?:" + "|".join(table.values()) + ")"
    return scalar


def _pythonic_args_regex(params: dict) -> str:
    props = params.get("properties", {})
    # absent "required" means all-optional per JSON Schema (and the
    # reference's params.get("required", [])) — NOT all-required
    required = set(params.get("required", []))
    req, opt = [], []
    for name, sub in props.items():
        pair = f"{re.escape(name)}={_pythonic_value_regex(sub)}"
        (req if name in required else opt).append(pair)
    if req:
        body = f",{WS}".join(req)
        for op in opt:
            body += f"(?:,{WS}{op})?"
    else:
        alts = []
        for i, op in enumerate(opt):
            tail = "".join(f"(?:,{WS}{p})?" for p in opt[i + 1:])
            alts.append(op + tail)
        body = "(?:" + "|".join(alts) + ")?" if alts else ""
    return body


def _call_regex(fn: dict, style: str) -> str:
    """One tool invocation (reference CALL_RULE_MAP)."""
    name = fn["name"]
    args = _args_regex(fn, style)
    if style == "pythonic":
        return rf"{re.escape(name)}\({args}\)"
    if style == "deepseek":
        return (
            re.escape("<｜tool▁call▁begin｜>function<｜tool▁sep｜>")
            + re.escape(name)
            + re.escape("\n```json\n")
            + args
            + re.escape("\n```")
            + re.escape("<｜tool▁call▁end｜>")
        )
    # json: {"name": "<name>", "arguments": {...}}
    return (
        rf"\{{{WS}\"name\"{WS}:{WS}{re.escape(json.dumps(name))}{WS},"
        rf"{WS}\"arguments\"{WS}:{WS}{args}{WS}\}}"
    )


def build_tool_call_regex(
    tools: List[dict],
    fmt: str = "json",
    tool_choice: Union[str, Dict[str, Any], None] = None,
) -> str:
    """Compose the full constrained-decoding pattern for a tool-call turn.

    ``tool_choice``: "required" (any listed tool, >=1 call) or the OpenAI
    ``{"type": "function", "function": {"name": ...}}`` form (exactly that
    tool).  "auto"/"none" turns are not constrained — the model may answer
    in prose — so callers never reach here with those.
    """
    if fmt not in FORMATS:
        raise ValueError(
            f"unknown tool_call format {fmt!r}; one of {sorted(FORMATS)}"
        )
    cf = FORMATS[fmt]
    fns = [_function(t) for t in tools]
    if isinstance(tool_choice, dict):
        want = (tool_choice.get("function") or {}).get("name")
        fns = [f for f in fns if f["name"] == want]
        if not fns:
            raise ValueError(f"tool_choice names unknown tool {want!r}")
    if not fns:
        raise ValueError("no tools to compose a grammar for")
    call = "(?:" + "|".join(_call_regex(f, cf.style) for f in fns) + ")"
    unit = re.escape(cf.call_start) + call + re.escape(cf.call_end)
    if cf.separator is not None and not isinstance(tool_choice, dict):
        body = f"{unit}(?:{re.escape(cf.separator)}{unit})*"
    else:
        body = unit
    return re.escape(cf.seq_start) + body + re.escape(cf.seq_end)
