"""JSON schema -> regex (outlines-style construction).

Supports the subset structured-output users rely on: object properties
(required/optional), string (+enum/pattern/min/maxLength), integer,
number, boolean, null, arrays (+min/maxItems), enums/consts, nested
objects, anyOf/oneOf, $defs/$ref (bounded depth).  Whitespace is emitted
as an optional single space after separators (configurable pattern),
matching the reference's constrained_json_whitespace_pattern knob.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"(?:-?(?:0|[1-9]\d*))"
NUMBER = r"(?:-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?)"
BOOLEAN = r"(?:true|false)"
NULL = r"null"
MAX_REF_DEPTH = 4


def _esc_literal(s: str) -> str:
    return re.escape(s).replace(" ", r"\ ") if False else re.escape(s)


def schema_to_regex(schema: Any, whitespace: str = r"\s?") -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    defs = schema.get("$defs", {}) if isinstance(schema, dict) else {}
    return _to_regex(schema, defs, whitespace, 0)


def _to_regex(s: Any, defs: Dict, ws: str, depth: int) -> str:
    if depth > 16:
        raise ValueError("schema nesting too deep")
    if s is True or s == {}:
        # any JSON value (bounded)
        return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
    if "$ref" in s:
        ref = s["$ref"]
        name = ref.split("/")[-1]
        if name not in defs:
            raise ValueError(f"unresolvable $ref {ref}")
        if depth > MAX_REF_DEPTH:
            raise ValueError("recursive $ref too deep for regex grammar")
        return _to_regex(defs[name], defs, ws, depth + 1)
    if "const" in s:
        return re.escape(json.dumps(s["const"]))
    if "enum" in s:
        opts = [re.escape(json.dumps(v)) for v in s["enum"]]
        return "(?:" + "|".join(opts) + ")"
    if "anyOf" in s or "oneOf" in s:
        subs = s.get("anyOf") or s.get("oneOf")
        return "(?:" + "|".join(_to_regex(x, defs, ws, depth + 1) for x in subs) + ")"

    t = s.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(
            _to_regex({**s, "type": x}, defs, ws, depth + 1) for x in t
        ) + ")"
    if t == "string":
        if "pattern" in s:
            inner = s["pattern"]
            inner = inner.lstrip("^").rstrip("$")
            return f'"{inner}"'
        lo = s.get("minLength")
        hi = s.get("maxLength")
        if lo is not None or hi is not None:
            lo = lo or 0
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{STRING_INNER}{rep}"'
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "array":
        item = _to_regex(s.get("items", True), defs, ws, depth + 1)
        lo = s.get("minItems", 0)
        hi = s.get("maxItems")
        if hi is not None:
            if lo == 0:
                body = f"(?:{item}(?:,{ws}{item}){{0,{max(hi - 1, 0)}}})?"
            else:
                body = f"{item}(?:,{ws}{item}){{{lo - 1},{hi - 1}}}"
        elif lo > 0:
            body = f"{item}(?:,{ws}{item}){{{lo - 1},}}"
        else:
            body = f"(?:{item}(?:,{ws}{item})*)?"
        return rf"\[{ws}{body}{ws}\]"
    if t == "object" or "properties" in s:
        props = s.get("properties", {})
        # JSON Schema: a missing "required" list means no property is
        # required (all optional), matching the reference composer's
        # params.get("required", [])
        required = set(s.get("required", []))
        parts = []
        for name, sub in props.items():
            key = re.escape(json.dumps(name))
            val = _to_regex(sub, defs, ws, depth + 1)
            parts.append((name in required, f"{key}:{ws}{val}"))
        if not parts:
            return rf"\{{{ws}\}}"
        # emit properties in declaration order; optional ones may be absent
        segs = []
        first_required_done = False
        body = ""
        # build with all-required fast path; optional handled via (?:,..)?
        req_parts = [p for r, p in parts if r]
        opt_parts = [p for r, p in parts if not r]
        if req_parts:
            body = f",{ws}".join(req_parts)
            for op in opt_parts:
                body += f"(?:,{ws}{op})?"
        else:
            # all optional: each may appear, comma-joined
            alts = []
            for i, op in enumerate(opt_parts):
                tail = "".join(
                    f"(?:,{ws}{p})?" for p in opt_parts[i + 1 :]
                )
                alts.append(op + tail)
            body = "(?:" + "|".join(alts) + ")?" if alts else ""
        return rf"\{{{ws}{body}{ws}\}}"
    raise ValueError(f"unsupported schema: {json.dumps(s)[:200]}")
