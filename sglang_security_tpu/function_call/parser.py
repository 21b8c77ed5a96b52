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
    MISTRAL_RE = re.compile(r"\[TOOL_CALLS\]\s*(\[.*?\])", re.S)
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
        m = self.MISTRAL_RE.search(text)
        if not m:
            return None
        try:
            items = json.loads(m.group(1))
            calls = [
                ToolCall(d["name"], d.get("arguments", {})) for d in items
            ]
        except (json.JSONDecodeError, KeyError, TypeError):
            return None
        return self.MISTRAL_RE.sub("", text).strip(), calls

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
            got = self._parse_json(payload.strip())
            if got is not None:
                return normal.strip(), got[1]
            return None
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
        m = self.PYTHONIC_RE.match(text.strip().strip("[]"))
        if not m:
            return None
        name, args_src = m.group(1), m.group(2)
        try:
            call = ast.parse(f"f({args_src})", mode="eval").body
            kwargs = {
                kw.arg: ast.literal_eval(kw.value) for kw in call.keywords
            }
        except (SyntaxError, ValueError):
            return None
        return "", [ToolCall(name, kwargs)]

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
