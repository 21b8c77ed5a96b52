"""Speculative decoding.

Capability re-creation of the reference's ``srt/speculative/`` (EAGLE
worker + verify, spec_info.py algorithm enum): a draft proposes
``num_draft_tokens`` continuations per sequence; one target verify pass
scores draft+1 positions; accepted prefix + one bonus token commit.

Drafters:
  NGRAM — prompt-lookup decoding (match the trailing n-gram in the
          sequence's own history; zero extra model cost)
  EAGLE — draft-model drafting over target hidden states (planned; the
          verify machinery below is drafter-agnostic)
"""

from sglang_security_tpu.speculative.spec_algorithm import (
    NgramDrafter,
    SpeculativeAlgorithm,
)
