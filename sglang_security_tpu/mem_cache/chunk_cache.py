"""No-sharing fallback cache (radix cache disabled).

Parity with the reference's ``srt/mem_cache/chunk_cache.py``: requests own
their pages outright; match always misses; finishing a request frees its
pages.  Exposes the same interface surface as RadixCache so the scheduler
is agnostic.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from sglang_security_tpu.mem_cache.radix_cache import MatchResult
from sglang_security_tpu.mem_cache.tree_node import TreeNode


class ChunkCache:
    def __init__(self, page_size: int, free_pages_fn: Callable):
        self.page_size = page_size
        self.free_pages_fn = free_pages_fn
        self.root = TreeNode(np.empty(0, np.int32), np.empty(0, np.int32))
        self.root.lock_ref = 1

    def reset(self) -> None:
        pass

    @property
    def evictable_pages(self) -> int:
        return 0

    @property
    def protected_pages(self) -> int:
        return 0

    def match_prefix(self, token_ids, user_id=None, scope=None) -> MatchResult:
        return MatchResult(np.empty(0, np.int32), self.root, 0)

    def insert(self, token_ids, pages, user_id=None, prompt_text=None,
               scope=None) -> int:
        # Nothing is retained: report every page as a duplicate so the
        # caller frees them all (same contract as RadixCache.insert).
        return len(np.asarray(pages).reshape(-1))

    def apply_privacy_verdict(self, node, is_private) -> None:
        pass

    def inc_lock_ref(self, node) -> None:
        pass

    def dec_lock_ref(self, node) -> None:
        pass

    def evict(self, num_pages: int) -> int:
        return 0
