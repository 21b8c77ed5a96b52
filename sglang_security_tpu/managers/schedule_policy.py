"""Waiting-queue priority policies + prefill admission budgeting.

Parity with the reference's ``srt/managers/schedule_policy.py``: policies
``lpm`` (longest prefix match), ``fcfs``, ``lof`` (longest output first),
``random``, ``dfs-weight`` (approximated by prefix-grouped ordering), and
a PrefillAdder that packs requests into one chunked-prefill step under a
token budget and a KV-page budget.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from sglang_security_tpu.managers.schedule_batch import Req
from sglang_security_tpu.utils import cdiv


class SchedulePolicy:
    def __init__(self, policy: str, tree_cache):
        self.policy = policy
        self.tree_cache = tree_cache

    def calc_priority(self, waiting: List[Req]) -> None:
        """Sort the waiting queue in place; refresh each req's prefix match."""
        if self.policy == "fcfs":
            return
        if self.policy == "random":
            random.shuffle(waiting)
            return
        # lpm / dfs-weight: longest cached prefix first (peek, no locks)
        prefix_lens = {}
        for r in waiting:
            m = self.tree_cache.match_prefix(
                np.asarray(r.input_ids, np.int32), user_id=r.user_id
            )
            prefix_lens[r.rid] = m.num_tokens
        if self.policy in ("lpm", "dfs-weight"):
            waiting.sort(key=lambda r: -prefix_lens[r.rid])
        elif self.policy == "lof":
            waiting.sort(key=lambda r: -r.sampling_params.max_new_tokens)


@dataclass
class PrefillBudget:
    remaining_tokens: int
    can_run_list: List[Req] = field(default_factory=list)
    chunked_req: Optional[Req] = None


class PrefillAdder:
    """Admission control for one prefill step (reference PrefillAdder:273)."""

    def __init__(
        self,
        page_size: int,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
        available_pages_fn,
        new_token_ratio: float = 0.4,
    ):
        self.page_size = page_size
        self.budget = min(max_prefill_tokens, chunked_prefill_size)
        self.available_pages_fn = available_pages_fn
        self.new_token_ratio = new_token_ratio
        self.can_run: List[Req] = []
        self.chunked_req: Optional[Req] = None
        self.used_tokens = 0
        self.used_pages = 0

    def add_one_req(self, req: Req) -> bool:
        """Returns False when the batch is full (stop admitting)."""
        if self.chunked_req is not None:
            return False
        extend = req.extend_len
        rem = self.budget - self.used_tokens
        if rem <= 0:
            return False
        # page demand: new tokens now + headroom for expected decode output
        decode_reserve = cdiv(
            int(req.sampling_params.max_new_tokens * self.new_token_ratio),
            self.page_size,
        )
        take = min(extend, rem)
        pages_now = req.pages_needed(self.page_size) if take == extend else cdiv(
            req.computed_len + take, self.page_size
        ) - len(req.pages)
        if (
            self.used_pages + pages_now + decode_reserve
            > self.available_pages_fn()
        ):
            return False
        if take < extend:
            self.chunked_req = req  # chunked prefill: req continues later
        self.can_run.append(req)
        self.used_tokens += take
        self.used_pages += pages_now
        return take == extend
