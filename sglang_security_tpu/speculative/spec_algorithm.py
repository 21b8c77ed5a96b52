"""Speculative drafting algorithms + acceptance logic.

The verify step runs on the unified ragged attention kernel as a tiny
"extend" batch (q_len = draft+1 per sequence, block_q = 8): KV for all
fed tokens is written; rejected positions simply get overwritten on the
next step, because they live beyond each request's committed length in
its page tail — no rollback kernel needed (compare the reference's
``speculative_sampling.cu`` accept/reject bookkeeping).
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np


class SpeculativeAlgorithm(str, enum.Enum):
    NONE = "NONE"
    NGRAM = "NGRAM"
    EAGLE = "EAGLE"
    EAGLE3 = "EAGLE3"

    @classmethod
    def from_string(cls, s: Optional[str]) -> "SpeculativeAlgorithm":
        if not s:
            return cls.NONE
        return cls(s.upper())


class NgramDrafter:
    """Prompt-lookup decoding: find the most recent occurrence of the
    trailing ``ngram`` tokens earlier in the sequence and propose the
    tokens that followed it."""

    def __init__(self, num_draft_tokens: int = 4, ngram: int = 2):
        self.num_draft_tokens = num_draft_tokens
        self.ngram = ngram

    def draft(self, all_ids: List[int]) -> List[int]:
        n = self.ngram
        k = self.num_draft_tokens
        if len(all_ids) <= n:
            return []
        tail = all_ids[-n:]
        # search right-to-left, excluding the trailing occurrence itself
        hay = all_ids[:-1]
        for start in range(len(hay) - n, -1, -1):
            if hay[start : start + n] == tail:
                follow = all_ids[start + n : start + n + k]
                if follow:
                    return list(follow)
        return []


def accept_draft(
    draft: List[int], sampled: np.ndarray
) -> List[int]:
    """Greedy acceptance: sampled[i] is the target's token after position
    i of [last_committed, *draft].  Accept draft tokens while they match
    the target's choice, then append the target's own next token (bonus).

    Returns the committed new tokens (>= 1)."""
    out: List[int] = []
    for i, d in enumerate(draft):
        if int(sampled[i]) == d:
            out.append(d)
        else:
            break
    # bonus: the target's token at the first mismatch (or after full accept)
    out.append(int(sampled[len(out)]))
    return out
