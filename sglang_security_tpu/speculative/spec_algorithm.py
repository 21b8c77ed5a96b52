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
    # DeepSeek-V3 multi-token-prediction draft head (models/
    # deepseek_nextn.py); rides the EAGLE worker/verify machinery
    NEXTN = "NEXTN"

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


def accept_draft_stochastic(
    draft: List[int],
    verify: dict,  # execute_spec_verify output arrays
    base_row: int,  # first verify row of this sequence
    rng: np.random.Generator,
) -> tuple:
    """Distribution-preserving chain acceptance (reference
    ``speculative_sampling.cu`` semantics for deterministic drafts):
    accept draft[i] with probability P(draft[i] | target row i) under the
    row's filtered sampling distribution; on rejection, emit a sample
    from the residual distribution (row i with draft[i] masked out).  At
    temperature 0 this reduces exactly to greedy exact-match acceptance.

    Rows for this sequence are base_row + [0, len(draft)]: row 0 fed the
    last committed token, row i+1 fed draft[i].

    Returns (committed tokens, their logprobs) — always >= 1 token."""
    out: List[int] = []
    lps: List[float] = []
    for i, d in enumerate(draft):
        if rng.random() < float(verify["edge_prob"][base_row + i + 1]):
            out.append(int(d))
            lps.append(float(verify["edge_lp"][base_row + i + 1]))
        else:
            out.append(int(verify["fallback"][base_row + i]))
            lps.append(float(verify["fallback_lp"][base_row + i]))
            return out, lps
    r = base_row + len(draft)
    out.append(int(verify["tokens"][r]))
    lps.append(float(verify["logprobs"][r]))
    return out, lps


def accept_tree_stochastic(
    tokens_tree: np.ndarray,  # [W] draft tokens of this sequence's tree
    parents: np.ndarray,  # [W] parent VERIFY row (0 = root) per node
    verify: dict,  # execute_spec_verify output arrays
    base_row: int,  # first verify row of this sequence (the root row)
    rng: np.random.Generator,
) -> tuple:
    """Recursive rejection sampling down the draft tree (reference
    ``tree_speculative_sampling_target_only``): at each node, try its
    drafted children in draft-score order; child c is accepted with
    probability p(c) / (1 - sum of rejected siblings' p).  If all
    children are rejected, emit a sample from the node's residual
    distribution (all children masked) and stop.  A fully accepted path
    appends the leaf's bonus sample.  Greedy is the exact special case.

    Returns (committed tokens, logprobs, accepted local rows incl. root).
    """
    W = len(tokens_tree)
    committed: List[int] = []
    lps: List[float] = []
    acc_rows: List[int] = [0]
    cur = 0
    while True:
        children = [j for j in range(W) if int(parents[j]) == cur]
        nxt = -1
        denom = 1.0
        for j in children:
            p = float(verify["edge_prob"][base_row + 1 + j])
            if denom <= 1e-9:
                break
            if rng.random() * denom < p:
                nxt = j
                break
            denom -= p
        if nxt < 0:
            committed.append(int(verify["fallback"][base_row + cur]))
            lps.append(float(verify["fallback_lp"][base_row + cur]))
            return committed, lps, acc_rows
        committed.append(int(tokens_tree[nxt]))
        lps.append(float(verify["edge_lp"][base_row + 1 + nxt]))
        acc_rows.append(1 + nxt)
        cur = 1 + nxt
        if not any(int(parents[j]) == cur for j in range(W)):
            # leaf: bonus token from the leaf row's own distribution
            committed.append(int(verify["tokens"][base_row + cur]))
            lps.append(float(verify["logprobs"][base_row + cur]))
            return committed, lps, acc_rows


def chain_spec_parents(
    n_seqs: int, rows_per_seq: int
) -> np.ndarray:
    """Chain verify parent rows: row j's parent is row j-1 within each
    sequence; each sequence's row 0 (last committed token) is a root."""
    par = np.arange(n_seqs * rows_per_seq, dtype=np.int32) - 1
    par[::rows_per_seq] = -1
    return par


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
