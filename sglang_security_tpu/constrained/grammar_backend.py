"""Per-request grammar state machines + compile cache.

Parity with the reference's ``BaseGrammarBackend``
(``srt/constrained/base_grammar_backend.py:29``): compiled grammars are
cached by (type, spec); each request gets a lightweight cursor (state +
jump-forward support).  The vocabulary is prepared once per tokenizer:
token id -> contributed string via batched decode.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sglang_security_tpu.constrained.ebnf import ebnf_to_regex
from sglang_security_tpu.constrained.json_schema import schema_to_regex
from sglang_security_tpu.constrained.regex_engine import DFA, TokenDFA

logger = logging.getLogger(__name__)


class Grammar:
    """Cursor over a TokenDFA for one request."""

    def __init__(self, token_dfa: TokenDFA):
        self.tdfa = token_dfa
        self.state = token_dfa.dfa.start
        self.finished = False

    def allowed_mask(self, vocab_size: int) -> np.ndarray:
        mask = self.tdfa.allowed_mask(self.state)
        if len(mask) < vocab_size:
            mask = np.pad(mask, (0, vocab_size - len(mask)))
        return mask[:vocab_size]

    def advance(self, token: int) -> None:
        if self.finished:
            return
        if token in self.tdfa.eos_token_ids:
            self.finished = True
            return
        if token >= self.tdfa.V:
            return
        nxt = self.tdfa.next_state(self.state, token)
        if nxt < 0:
            # should not happen when the mask was applied; keep state
            logger.warning("grammar advance hit dead state on token %d", token)
            return
        self.state = nxt

    def is_accepting(self) -> bool:
        return bool(self.tdfa.dfa.accepting[self.state])

    def jump_forward(self) -> Tuple[List[int], str]:
        """Outlines-style jump-forward: if from the current state exactly
        one token is allowed, it can be emitted without a model step.
        Returns the deterministic token chain (bounded)."""
        chain: List[int] = []
        state = self.state
        for _ in range(64):
            allowed, dest = self.tdfa._expand(state)
            idx = np.flatnonzero(allowed)
            if len(idx) != 1 or self.tdfa.dfa.accepting[state]:
                break
            tok = int(idx[0])
            chain.append(tok)
            state = int(dest[tok])
        return chain, ""


class GrammarBackend:
    def __init__(self, tokenizer, eos_token_ids: Sequence[int],
                 whitespace_pattern: Optional[str] = None):
        self.tokenizer = tokenizer
        self.eos_token_ids = list(eos_token_ids)
        self.whitespace = whitespace_pattern or r"[ \n\t]?"
        self._token_strs: Optional[List[str]] = None
        self._cache: Dict[Tuple[str, str], TokenDFA] = {}
        self._lock = threading.Lock()

    def _vocab_strings(self) -> List[str]:
        if self._token_strs is None:
            tok = self.tokenizer
            V = len(tok)
            strs = tok.batch_decode(
                [[i] for i in range(V)], skip_special_tokens=False
            )
            special = set(tok.all_special_ids)
            self._token_strs = [
                "" if i in special else strs[i] for i in range(V)
            ]
        return self._token_strs

    def get(self, kind: str, spec: str) -> Grammar:
        key = (kind, spec)
        with self._lock:
            tdfa = self._cache.get(key)
        if tdfa is None:
            if kind == "regex":
                pattern = spec
            elif kind == "json":
                pattern = schema_to_regex(spec, whitespace=self.whitespace)
            elif kind == "ebnf":
                pattern = ebnf_to_regex(spec)
            else:
                raise ValueError(kind)
            dfa = DFA(pattern)
            tdfa = TokenDFA(dfa, self._vocab_strings(), self.eos_token_ids)
            with self._lock:
                self._cache[key] = tdfa
        return Grammar(tdfa)
