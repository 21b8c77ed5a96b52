"""Constrained decoding (structured output).

A from-scratch grammar stack replacing the reference's pluggable
xgrammar/outlines/llguidance backends (``srt/constrained/``), since none
of those libraries exist in this environment:

  regex_engine — regex -> NFA -> DFA compiler with compressed alphabet
                 and vectorized token-level transition tables
  json_schema  — JSON schema -> regex (outlines-style construction)
  ebnf         — EBNF -> regex via bounded-depth rule inlining
  grammar_backend — per-request Grammar state machines + compile cache

The vocab bitmask is applied inside the jitted sampling step
(layers/sampler.py), playing the role of the reference's
``apply_token_bitmask_inplace_cuda.cu``.
"""

from sglang_security_tpu.constrained.grammar_backend import (
    Grammar,
    GrammarBackend,
)
