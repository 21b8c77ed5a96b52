"""Regex -> NFA -> DFA compiler for token-constrained decoding.

Supports the practical regex subset structured-output needs: literals,
``.``, escapes (``\\d \\w \\s \\D \\W \\S \\n \\t \\r``), char classes
(``[a-z0-9_]``, negation), grouping, alternation, ``* + ?`` and bounded
``{m}``/``{m,n}`` repetition (expanded; ``{m,}`` = m copies + star).

The DFA runs over a *compressed alphabet*: all codepoint-range endpoints
across the pattern partition unicode space into equivalence classes, so
transition tables are [num_states, num_classes] int32 and token-level
transitions vectorize over the whole vocabulary with numpy gathers
(`TokenDFA`): per DFA state, walking all V tokens through the DFA costs
max_token_len gathers of size V.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAX_CP = 0x110000
DEAD = -1

# ---------------------------------------------------------------- parsing

_ESCAPES = {
    "d": [(48, 58)],
    "D": None,  # complement handled below
    "w": [(48, 58), (65, 91), (95, 96), (97, 123)],
    "W": None,
    "s": [(9, 14), (32, 33)],
    "S": None,
    "n": [(10, 11)],
    "t": [(9, 10)],
    "r": [(13, 14)],
}


def _complement(ranges: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    out = []
    prev = 0
    for lo, hi in sorted(ranges):
        if lo > prev:
            out.append((prev, lo))
        prev = max(prev, hi)
    if prev < MAX_CP:
        out.append((prev, MAX_CP))
    return out


def _escape_ranges(c: str) -> List[Tuple[int, int]]:
    if c in "dws":
        return _ESCAPES[c]
    if c in "DWS":
        return _complement(_ESCAPES[c.lower()])
    if c in _ESCAPES and _ESCAPES[c] is not None:
        return _ESCAPES[c]
    return [(ord(c), ord(c) + 1)]


class _Parser:
    """Recursive-descent regex parser producing an AST of tuples:
    ('cls', ranges) | ('cat', [..]) | ('alt', [..]) | ('star'|'plus'|'opt',
    node) | ('rep', node, m, n|-1) | ('eps',)
    """

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"regex parse error at {self.i}: {self.p!r}")
        return node

    def _peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def _alt(self):
        branches = [self._cat()]
        while self._peek() == "|":
            self.i += 1
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        items = []
        while self._peek() not in (None, "|", ")"):
            items.append(self._repeat())
        if not items:
            return ("eps",)
        return items[0] if len(items) == 1 else ("cat", items)

    def _repeat(self):
        node = self._atom()
        while True:
            c = self._peek()
            if c == "*":
                self.i += 1
                node = ("star", node)
            elif c == "+":
                self.i += 1
                node = ("plus", node)
            elif c == "?":
                self.i += 1
                node = ("opt", node)
            elif c == "{":
                j = self.p.find("}", self.i)
                if j == -1:
                    raise ValueError("unclosed {")
                spec = self.p[self.i + 1 : j]
                self.i = j + 1
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    m = int(lo_s or 0)
                    n = int(hi_s) if hi_s.strip() else -1
                else:
                    m = n = int(spec)
                node = ("rep", node, m, n)
            else:
                return node

    def _atom(self):
        c = self._peek()
        if c is None:
            return ("eps",)
        if c == "(":
            self.i += 1
            if self.p[self.i : self.i + 2] == "?:":
                self.i += 2
            elif self._peek() == "?":
                raise ValueError("only (?:...) groups supported")
            node = self._alt()
            if self._peek() != ")":
                raise ValueError("unclosed group")
            self.i += 1
            return node
        if c == "[":
            return self._char_class()
        if c == ".":
            self.i += 1
            return ("cls", _complement([(10, 11)]))  # any but newline
        if c == "\\":
            self.i += 1
            return ("cls", self._parse_escape())
        if c in "^$":
            # anchors are implicit (full-match semantics); skip
            self.i += 1
            return ("eps",)
        self.i += 1
        return ("cls", [(ord(c), ord(c) + 1)])

    def _parse_escape(self) -> List[Tuple[int, int]]:
        """Parse the escape after a consumed backslash; advances self.i."""
        e = self.p[self.i]
        self.i += 1
        if e == "x":
            cp = int(self.p[self.i : self.i + 2], 16)
            self.i += 2
            return [(cp, cp + 1)]
        if e == "u":
            cp = int(self.p[self.i : self.i + 4], 16)
            self.i += 4
            return [(cp, cp + 1)]
        return _escape_ranges(e)

    def _class_char(self) -> int:
        """One (possibly escaped) char inside a class; returns codepoint."""
        c = self.p[self.i]
        self.i += 1
        if c == "\\":
            rs = self._parse_escape()
            return rs[0][0]
        return ord(c)

    def _char_class(self):
        assert self.p[self.i] == "["
        self.i += 1
        neg = False
        if self._peek() == "^":
            neg = True
            self.i += 1
        ranges: List[Tuple[int, int]] = []
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise ValueError("unclosed [")
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            if c == "\\":
                self.i += 1
                rs = self._parse_escape()
                # single-char escape may form a range (e.g. \x00-\x1f)
                if (
                    len(rs) == 1
                    and rs[0][1] == rs[0][0] + 1
                    and self._peek() == "-"
                    and self.p[self.i + 1] != "]"
                ):
                    self.i += 1
                    hi = self._class_char()
                    ranges.append((rs[0][0], hi + 1))
                else:
                    ranges.extend(rs)
                continue
            self.i += 1
            lo = ord(c)
            if (
                self._peek() == "-"
                and self.i + 1 < len(self.p)
                and self.p[self.i + 1] != "]"
            ):
                self.i += 1
                hi = self._class_char()
                ranges.append((lo, hi + 1))
            else:
                ranges.append((lo, lo + 1))
        if neg:
            ranges = _complement(sorted(ranges))
        return ("cls", ranges)


# -------------------------------------------------------------- NFA / DFA


class _NFA:
    def __init__(self):
        self.eps: List[List[int]] = []
        self.trans: List[List[Tuple[Tuple[int, int], int]]] = []

    def new_state(self) -> int:
        self.eps.append([])
        self.trans.append([])
        return len(self.eps) - 1

    def add_eps(self, a, b):
        self.eps[a].append(b)

    def add_ranges(self, a, ranges, b):
        for r in ranges:
            self.trans[a].append((r, b))


def _build_nfa(node, nfa: _NFA) -> Tuple[int, int]:
    kind = node[0]
    if kind == "eps":
        s = nfa.new_state()
        return s, s
    if kind == "cls":
        s, e = nfa.new_state(), nfa.new_state()
        nfa.add_ranges(s, node[1], e)
        return s, e
    if kind == "cat":
        s, e = _build_nfa(node[1][0], nfa)
        for sub in node[1][1:]:
            s2, e2 = _build_nfa(sub, nfa)
            nfa.add_eps(e, s2)
            e = e2
        return s, e
    if kind == "alt":
        s, e = nfa.new_state(), nfa.new_state()
        for sub in node[1]:
            s2, e2 = _build_nfa(sub, nfa)
            nfa.add_eps(s, s2)
            nfa.add_eps(e2, e)
        return s, e
    if kind == "star":
        s, e = nfa.new_state(), nfa.new_state()
        s2, e2 = _build_nfa(node[1], nfa)
        nfa.add_eps(s, s2)
        nfa.add_eps(s, e)
        nfa.add_eps(e2, s2)
        nfa.add_eps(e2, e)
        return s, e
    if kind == "plus":
        return _build_nfa(("cat", [node[1], ("star", node[1])]), nfa)
    if kind == "opt":
        return _build_nfa(("alt", [node[1], ("eps",)]), nfa)
    if kind == "rep":
        _, sub, m, n = node
        if n == -1:
            parts = [sub] * m + [("star", sub)]
        else:
            if n > 256:
                raise ValueError("repetition bound too large (max 256)")
            parts = [sub] * m + [("opt", sub)] * (n - m)
        if not parts:
            return _build_nfa(("eps",), nfa)
        return _build_nfa(("cat", parts) if len(parts) > 1 else parts[0], nfa)
    raise ValueError(kind)


class DFA:
    """Compressed-alphabet DFA with dense transition table."""

    def __init__(self, pattern: str):
        ast = _Parser(pattern).parse()
        nfa = _NFA()
        start, accept = _build_nfa(ast, nfa)

        # alphabet compression: partition codepoints by range endpoints
        points = {0, MAX_CP}
        for trs in nfa.trans:
            for (lo, hi), _ in trs:
                points.add(lo)
                points.add(hi)
        self.bounds = np.array(sorted(points), dtype=np.int64)  # [B]
        n_classes = len(self.bounds) - 1

        def eclose(states):
            stack = list(states)
            seen = set(states)
            while stack:
                s = stack.pop()
                for t in nfa.eps[s]:
                    if t not in seen:
                        seen.add(t)
                        stack.append(t)
            return frozenset(seen)

        start_set = eclose([start])
        dfa_ids: Dict[frozenset, int] = {start_set: 0}
        table: List[List[int]] = []
        accepting: List[bool] = []
        work = [start_set]
        while work:
            cur = work.pop()
            sid = dfa_ids[cur]
            while len(table) <= sid:
                table.append([DEAD] * n_classes)
                accepting.append(False)
            accepting[sid] = accept in cur
            # for each class, compute target set
            for ci in range(n_classes):
                lo = int(self.bounds[ci])
                targets = set()
                for s in cur:
                    for (rlo, rhi), t in nfa.trans[s]:
                        if rlo <= lo < rhi:
                            targets.add(t)
                if not targets:
                    continue
                tset = eclose(targets)
                if tset not in dfa_ids:
                    dfa_ids[tset] = len(dfa_ids)
                    work.append(tset)
                table[sid][ci] = dfa_ids[tset]
            if len(dfa_ids) > 20000:
                raise ValueError("DFA too large")
        n = len(dfa_ids)
        while len(table) < n:
            table.append([DEAD] * n_classes)
            accepting.append(False)
        self.table = np.asarray(table, dtype=np.int32)  # [S, C]
        self.accepting = np.asarray(accepting, dtype=bool)
        self.start = 0

    def classify(self, codepoints: np.ndarray) -> np.ndarray:
        """Map codepoints -> alphabet class ids."""
        return np.searchsorted(self.bounds, codepoints, side="right") - 1

    def matches(self, text: str) -> bool:
        s = self.start
        for ch in text:
            ci = int(self.classify(np.array([ord(ch)]))[0])
            s = int(self.table[s, ci])
            if s == DEAD:
                return False
        return bool(self.accepting[s])


class TokenDFA:
    """Vocabulary-level view of a DFA: per state, the set of allowed
    tokens and each token's destination state, computed lazily with
    vectorized walks and cached."""

    def __init__(self, dfa: DFA, token_strs: Sequence[str],
                 eos_token_ids: Sequence[int]):
        self.dfa = dfa
        V = len(token_strs)
        self.V = V
        self.eos_token_ids = list(eos_token_ids)
        max_len = max((len(t) for t in token_strs), default=1)
        max_len = max(max_len, 1)
        cps = np.zeros((V, max_len), dtype=np.int64)
        lens = np.zeros(V, dtype=np.int32)
        for i, t in enumerate(token_strs):
            lens[i] = len(t)
            if t:
                cps[i, : len(t)] = [ord(c) for c in t]
        self.tok_classes = dfa.classify(cps)  # [V, max_len]
        self.tok_lens = lens
        self.max_len = max_len
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _expand(self, state: int) -> Tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(state)
        if got is not None:
            return got
        S = self.dfa.table
        cur = np.full(self.V, state, dtype=np.int32)
        dead = self.tok_lens == 0  # empty tokens never allowed
        for i in range(self.max_len):
            active = (~dead) & (self.tok_lens > i)
            nxt = S[cur[active], self.tok_classes[active, i]]
            cur2 = cur.copy()
            cur2[active] = nxt
            cur = cur2
            dead = dead | (cur == DEAD)
        allowed = ~dead
        dest = np.where(allowed, cur, DEAD).astype(np.int32)
        self._cache[state] = (allowed, dest)
        return allowed, dest

    def allowed_mask(self, state: int) -> np.ndarray:
        allowed, _ = self._expand(state)
        mask = allowed.copy()
        if self.dfa.accepting[state]:
            for e in self.eos_token_ids:
                if 0 <= e < self.V:
                    mask[e] = True
        if not mask.any():  # dead end: permit EOS so the request can stop
            for e in self.eos_token_ids:
                if 0 <= e < self.V:
                    mask[e] = True
        return mask

    def next_state(self, state: int, token: int) -> int:
        if token in self.eos_token_ids:
            return state
        _, dest = self._expand(state)
        return int(dest[token])
