"""Radix-tree node with SafeKV privacy + side-channel-defense state.

Re-creates the capability of the reference fork's TreeNode
(``srt/mem_cache/tree_node.py:28-79``): private-by-default nodes with an
owner, a pending-privacy-check flag, and per-epoch hit/user statistics used
by the timing-side-channel defense.  Re-designed: stats live in plain
fields updated lazily against the global epoch (no background ticker
thread), and cross-user duplicates are modeled as *sibling* nodes with
identical keys rather than a half-finished logical merge
(``radix_cache.py:459-499`` in the reference is disabled at its call site).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from sglang_security_tpu.global_epoch import global_epoch


class TreeNode:
    counter = 0

    def __init__(
        self,
        key: np.ndarray,  # token ids, length multiple of page_size
        pages: np.ndarray,  # physical page ids, len(key) // page_size
        parent: Optional["TreeNode"] = None,
        private: bool = False,
        owner_id: Optional[str] = None,
    ):
        self.id = TreeNode.counter
        TreeNode.counter += 1
        self.key = np.asarray(key, dtype=np.int32)
        self.pages = np.asarray(pages, dtype=np.int32)
        self.parent = parent
        self.children: Dict[bytes, List["TreeNode"]] = {}
        self.lock_ref = 0
        self.last_access_time = time.monotonic()

        # --- SafeKV privacy state ---
        self.private = private
        self.owner_id = owner_id
        self.scope = None  # cache partition (e.g. LoRA adapter path)
        self.need_check_privacy = private  # cleared once a verdict lands
        self.pending_check = False
        self.prompt_text: Optional[str] = None  # detector context

        # --- side-channel defense stats (per epoch window) ---
        self.stat_epoch = global_epoch.value
        self.hits_cur = 0
        self.users_cur: set = set()
        self.hits_prev = 0
        self.users_prev = 0

    # ------------------------------------------------------------------
    @property
    def num_tokens(self) -> int:
        return len(self.key)

    @property
    def num_pages(self) -> int:
        return len(self.pages)

    def is_leaf(self) -> bool:
        return not any(self.children.values())

    def accessible_by(self, user_id: Optional[str]) -> bool:
        """SafeKV gate: private nodes are visible only to their owner."""
        if not self.private:
            return True
        return self.owner_id is not None and self.owner_id == user_id

    def touch(self, user_id: Optional[str]) -> None:
        """Record an access for LRU + attack statistics."""
        self.last_access_time = time.monotonic()
        e = global_epoch.value
        if e != self.stat_epoch:
            self.hits_prev = self.hits_cur
            self.users_prev = len(self.users_cur)
            self.hits_cur = 0
            self.users_cur = set()
            self.stat_epoch = e
        self.hits_cur += 1
        self.users_cur.add(user_id)

    def __lt__(self, other: "TreeNode") -> bool:
        return self.last_access_time < other.last_access_time

    def __repr__(self) -> str:
        return (
            f"TreeNode(id={self.id}, tokens={self.num_tokens}, "
            f"pages={self.num_pages}, private={self.private}, "
            f"owner={self.owner_id}, lock={self.lock_ref})"
        )
