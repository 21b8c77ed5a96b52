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
        if self.policy == "random":
            random.shuffle(waiting)
        elif self.policy != "fcfs":
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
        # SafeKV tier-3 judge requests always go first (stable partition;
        # reference scheduler.py:1447-1448 privacy-priority sort)
        waiting.sort(
            key=lambda r: not r.rid.startswith("PRIVACY_DETECTION_LLM_")
        )


class InBatchPrefixDedup:
    """Defers requests whose prompt prefix another request *in the same
    admission wave* is about to compute, so they re-match the radix cache
    next wave instead of recomputing the prefix (reference in-batch dedup
    via a throwaway RadixCache, schedule_policy.py:86-150).

    Scope-aware: keys include (user_id, lora scope) so SafeKV privacy
    gating and adapter-scoped caching stay sound — a deferred request
    re-walks the real tree, which applies the privacy gate."""

    def __init__(self, page_size: int):
        self.page_size = page_size
        self._tree = {}

    def _chunks(self, req: Req):
        ids = req.input_ids
        ps = self.page_size
        scope = (req.user_id, req.lora_path)
        for i in range(0, len(ids) - 1, ps):
            chunk = ids[i : i + ps]
            if len(chunk) < ps:
                break  # only whole pages are cacheable
            yield (scope, tuple(chunk))

    def overlap_pages(self, req: Req) -> int:
        """Pages of req's prompt already being computed this wave."""
        node = self._tree
        pages = 0
        for key in self._chunks(req):
            nxt = node.get(key)
            if nxt is None:
                break
            node = nxt
            pages += 1
        return pages

    def insert(self, req: Req) -> None:
        node = self._tree
        for key in self._chunks(req):
            node = node.setdefault(key, {})


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
