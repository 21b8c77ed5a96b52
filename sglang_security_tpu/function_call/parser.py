"""Tool-call detection across model-family output formats.

Parity with the reference's ``srt/function_call/`` detector set
(deepseekv3 / llama32 / mistral / pythonic / qwen25 + ebnf_composer):
parse generated text into structured tool calls, and compose grammars
that force tool-argument JSON to match the declared parameter schema
(riding constrained/json_schema.py).
"""

from __future__ import annotations

import ast
import json
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ToolCall:
    name: str
    arguments: Dict[str, Any] = field(default_factory=dict)


class FunctionCallParser:
    """format: auto | json | qwen25 | mistral | llama32 | deepseekv3 | pythonic"""

    QWEN_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S)
    # marks where the JSON call array begins; the array itself is parsed
    # with a JSON raw_decode (bracket-depth aware), NOT a non-greedy
    # regex — array-typed arguments contain inner ']' that a lazy
    # r"\[.*?\]" would truncate at (ADVICE r3)
    MISTRAL_MARK_RE = re.compile(r"\[TOOL_CALLS\]\s*(?=\[)", re.S)
    LLAMA_PY_TAG = "<|python_tag|>"
    DS_RE = re.compile(
        r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>(\w+)\n```json\n(.*?)\n```",
        re.S,
    )
    PYTHONIC_RE = re.compile(r"^\s*(\w[\w.]*)\((.*)\)\s*$", re.S)

    def __init__(self, fmt: str = "auto"):
        self.fmt = fmt

    # ------------------------------------------------------------- parse
    def parse(self, text: str) -> Tuple[str, List[ToolCall]]:
        """Returns (normal_text, tool_calls)."""
        fmt = self.fmt
        order = (
            [fmt]
            if fmt != "auto"
            else ["qwen25", "mistral", "deepseekv3", "llama32", "json",
                  "pythonic"]
        )
        for f in order:
            out = getattr(self, f"_parse_{f}")(text)
            if out is not None:
                return out
        return text, []

    def _parse_qwen25(self, text):
        ms = list(self.QWEN_RE.finditer(text))
        if not ms:
            return None
        calls = []
        for m in ms:
            try:
                d = json.loads(m.group(1))
                calls.append(ToolCall(d["name"], d.get("arguments", {})))
            except (json.JSONDecodeError, KeyError):
                return None
        return self.QWEN_RE.sub("", text).strip(), calls

    def _parse_mistral(self, text):
        m = self.MISTRAL_MARK_RE.search(text)
        if not m:
            return None
        try:
            items, end = json.JSONDecoder().raw_decode(text, m.end())
            calls = [
                ToolCall(d["name"], d.get("arguments", {})) for d in items
            ]
        except (json.JSONDecodeError, KeyError, TypeError):
            return None
        return (text[: m.start()] + text[end:]).strip(), calls

    def _parse_deepseekv3(self, text):
        ms = list(self.DS_RE.finditer(text))
        if not ms:
            return None
        try:
            calls = [
                ToolCall(m.group(1), json.loads(m.group(2))) for m in ms
            ]
        except json.JSONDecodeError:
            return None
        return self.DS_RE.sub("", text).strip(), calls

    def _parse_llama32(self, text):
        if self.LLAMA_PY_TAG in text:
            normal, _, payload = text.partition(self.LLAMA_PY_TAG)
            # multi-call form is ';'-separated JSON objects (the same
            # separator the grammar composer emits; reference
            # llama32_detector splits on ';' too)
            calls = []
            for part in payload.split(";"):
                got = self._parse_json(part.strip())
                if got is None:
                    return None
                calls.extend(got[1])
            return normal.strip(), calls
        return self._parse_json(text) if self.fmt == "llama32" else None

    def _parse_json(self, text):
        t = text.strip()
        if not (t.startswith("{") or t.startswith("[")):
            return None
        try:
            d = json.loads(t)
        except json.JSONDecodeError:
            return None
        items = d if isinstance(d, list) else [d]
        calls = []
        for it in items:
            if not isinstance(it, dict) or "name" not in it:
                return None
            calls.append(
                ToolCall(
                    it["name"],
                    it.get("arguments", it.get("parameters", {})),
                )
            )
        return "", calls

    def _parse_pythonic(self, text):
        """Parses '[f(a=1), g()]' or a bare 'f(a=1)' — the whole expression
        goes through ast so multi-call sequences (which the grammar
        composer permits under tool_choice='required') split correctly
        instead of crashing on a Tuple node (ADVICE r3)."""
        t = text.strip()
        try:
            body = ast.parse(t, mode="eval").body
        except (SyntaxError, ValueError):
            return None
        nodes = body.elts if isinstance(body, (ast.List, ast.Tuple)) else [body]
        calls = []
        for node in nodes:
            if not isinstance(node, ast.Call):
                return None
            func = node.func
            parts = []
            while isinstance(func, ast.Attribute):
                parts.append(func.attr)
                func = func.value
            if not isinstance(func, ast.Name):
                return None
            parts.append(func.id)
            name = ".".join(reversed(parts))
            try:
                kwargs = {
                    kw.arg: ast.literal_eval(kw.value)
                    for kw in node.keywords
                    if kw.arg is not None
                }
            except (ValueError, SyntaxError):
                return None
            calls.append(ToolCall(name, kwargs))
        return ("", calls) if calls else None

    # ----------------------------------------------------------- grammar
    @staticmethod
    def tools_to_json_schema(tools: List[dict]) -> str:
        """Compose a schema forcing {"name": <one of>, "arguments": args}
        (the reference's ebnf_composer capability via the native grammar
        engine)."""
        variants = []
        for t in tools:
            f = t.get("function", t)
            variants.append(
                {
                    "type": "object",
                    "properties": {
                        "name": {"const": f["name"]},
                        "arguments": f.get(
                            "parameters", {"type": "object", "properties": {}}
                        ),
                    },
                    "required": ["name", "arguments"],
                }
            )
        return json.dumps({"anyOf": variants})
