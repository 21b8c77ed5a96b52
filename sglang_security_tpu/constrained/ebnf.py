"""EBNF -> regex via bounded-depth rule inlining.

Covers the practical EBNF grammars the reference routes to llguidance /
xgrammar for tool-call argument shapes and simple DSLs: rules
(``name ::= ...``), quoted literals, character classes, alternation,
grouping, ``* + ?`` and rule references.  Self/mutual recursion is
supported by inlining up to ``max_depth`` expansions and then failing
with a clear error if the grammar is still recursive (true CFG support
via an incremental Earley parser is a planned extension).
"""

from __future__ import annotations

import re
from typing import Dict

TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<rule>[A-Za-z_][\w-]*)\s*::=
      | (?P<ref>[A-Za-z_][\w-]*)
      | (?P<lit>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<cls>\[(?:[^\]\\]|\\.)+\])
      | (?P<op>[()|*+?])
    )""",
    re.X,
)


def _parse_rules(grammar: str) -> Dict[str, str]:
    """Split an EBNF text into rule-name -> body-text."""
    rules: Dict[str, str] = {}
    current = None
    for line in grammar.splitlines():
        line = line.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = re.match(r"\s*([A-Za-z_][\w-]*)\s*::=(.*)", line)
        if m:
            current = m.group(1)
            rules[current] = m.group(2).strip()
        elif current is not None:
            rules[current] += " " + line.strip()
    if not rules:
        raise ValueError("no rules found in EBNF grammar")
    return rules


def _body_to_regex(body: str, rules: Dict[str, str], depth: int,
                   max_depth: int) -> str:
    out = []
    i = 0
    while i < len(body):
        m = TOKEN_RE.match(body, i)
        if not m or m.end() == i:
            if body[i].isspace():
                i += 1
                continue
            raise ValueError(f"EBNF parse error at: {body[i:][:40]!r}")
        i = m.end()
        if m.group("rule"):
            raise ValueError("nested rule definition")
        if m.group("ref"):
            name = m.group("ref")
            if name not in rules:
                raise ValueError(f"undefined rule {name!r}")
            if depth >= max_depth:
                raise ValueError(
                    f"grammar recursion on {name!r} exceeds inline depth "
                    f"{max_depth}; recursive grammars are not yet supported"
                )
            sub = _body_to_regex(rules[name], rules, depth + 1, max_depth)
            out.append(f"(?:{sub})")
        elif m.group("lit"):
            lit = m.group("lit")[1:-1]
            lit = lit.replace('\\"', '"').replace("\\'", "'")
            lit = lit.replace("\\n", "\n").replace("\\t", "\t")
            out.append(re.escape(lit))
        elif m.group("cls"):
            out.append(m.group("cls"))
        else:
            op = m.group("op")
            out.append("(?:" if op == "(" else op)
    return "".join(out)


def ebnf_to_regex(grammar: str, root: str = "root", max_depth: int = 12) -> str:
    rules = _parse_rules(grammar)
    if root not in rules:
        root = next(iter(rules))
    return _body_to_regex(rules[root], rules, 0, max_depth)
