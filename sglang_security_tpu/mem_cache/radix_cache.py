"""Page-granular radix prefix cache with the SafeKV privacy layer.

Re-creates the reference's RadixCache + SafeKV fork
(``srt/mem_cache/radix_cache.py:77-674``): longest-prefix match, insert,
LRU eviction with lock refs, plus the fork's additions — per-user privacy
gating in the match walk (``:333-390``), per-epoch hit/user statistics with
entropy-based probe eviction (``:377-411``), privacy-preserving node
splitting (``:413-447``), and async privacy-verdict application.

Re-designed for this runtime:

  * Keys are page-aligned (the KV pool is purely paged); only full pages
    are cached, exactly like the reference with page_size > 1
    (``radix_cache.py:141-143``).
  * Cross-user private duplicates are **sibling nodes** with identical
    keys.  A user who cannot see another user's private node inserts a
    parallel branch; when the privacy detector later marks one public, the
    siblings merge and duplicate pages are freed.  This replaces the
    reference's half-finished merged_key/merged_value scheme with
    equivalent observable behavior (no cross-user sharing before a public
    verdict; sharing + dedup after).
  * Probe defense: on each access a node's window stats update; a hit
    spike (> spike_threshold × previous window) with low user diversity
    (hits/users ≥ concentration threshold) frees the subtree, so a timing
    attacker evicts exactly what they are probing.
"""

from __future__ import annotations

import heapq
import logging
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import numpy as np

from sglang_security_tpu.mem_cache.tree_node import TreeNode

logger = logging.getLogger(__name__)


@dataclass
class MatchResult:
    pages: np.ndarray  # matched physical pages, in order
    last_node: TreeNode
    num_tokens: int  # matched token count (pages * page_size)
    host_nodes: list = field(default_factory=list)  # HiCache continuation


@dataclass
class SafeKVConfig:
    enabled: bool = False
    spike_threshold: float = 10.0  # hit spike factor vs previous window
    min_baseline_hits: int = 3  # ignore spikes below this absolute rate
    concentration_threshold: float = 4.0  # hits per distinct user => probe
    chunk_tokens: int = 1024  # max tokens per inserted node
    # callback(node, text): enqueue async privacy detection
    privacy_checker: Optional[Callable[[TreeNode, str], None]] = None


class RadixCache:
    def __init__(
        self,
        page_size: int,
        free_pages_fn: Callable[[np.ndarray], None],
        safekv: Optional[SafeKVConfig] = None,
        kv_event_fn: Optional[Callable[[str, TreeNode], None]] = None,
    ):
        self.page_size = page_size
        self.free_pages_fn = free_pages_fn
        self.safekv = safekv or SafeKVConfig()
        self.kv_event_fn = kv_event_fn
        self.reset()

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.root = TreeNode(
            np.empty(0, np.int32), np.empty(0, np.int32), private=False
        )
        self.root.lock_ref = 1
        self._evictable_pages = 0
        self._protected_pages = 0

    @property
    def evictable_pages(self) -> int:
        return self._evictable_pages

    @property
    def protected_pages(self) -> int:
        return self._protected_pages

    def total_pages(self) -> int:
        return self._evictable_pages + self._protected_pages

    # ------------------------------------------------------------------
    def _page_key(self, tokens: np.ndarray) -> bytes:
        return np.asarray(tokens[: self.page_size], np.int32).tobytes()

    def _match_len_pages(self, a: np.ndarray, b: np.ndarray) -> int:
        """Number of fully matching leading pages between token arrays."""
        n = min(len(a), len(b)) // self.page_size
        if n == 0:
            return 0
        aa = a[: n * self.page_size].reshape(n, self.page_size)
        bb = b[: n * self.page_size].reshape(n, self.page_size)
        eq = (aa == bb).all(axis=1)
        nz = np.flatnonzero(~eq)
        return int(nz[0]) if len(nz) else n

    def _select_child(
        self, node: TreeNode, tokens: np.ndarray, user_id: Optional[str],
        scope: Optional[str] = None,
    ) -> Optional[TreeNode]:
        """Pick the accessible child whose key shares the first page.
        ``scope`` partitions the cache (KV computed under different LoRA
        adapters is never interchangeable)."""
        siblings = node.children.get(self._page_key(tokens), [])
        best = None
        for c in siblings:
            if c.scope != scope:
                continue
            if not c.accessible_by(user_id):
                continue
            if not self._walkable(c):
                continue
            # prefer the sibling with the longest match
            if best is None or self._match_len_pages(
                tokens, c.key
            ) > self._match_len_pages(tokens, best.key):
                best = c
        return best

    def _walkable(self, node: TreeNode) -> bool:
        """Hook: HiRadixCache stops the device walk at host-resident nodes."""
        return True

    # ------------------------------------------------------------------
    def match_prefix(
        self, token_ids: np.ndarray, user_id: Optional[str] = None,
        scope: Optional[str] = None,
    ) -> MatchResult:
        token_ids = np.asarray(token_ids, np.int32)
        pages: List[np.ndarray] = []
        node = self.root
        rem = token_ids
        while len(rem) >= self.page_size:
            child = self._select_child(node, rem, user_id, scope)
            if child is None:
                break
            child.touch(user_id)
            if self.safekv.enabled and self._check_probe(child, user_id):
                break  # subtree was just defensively freed
            m = self._match_len_pages(rem, child.key)
            if m == 0:
                break
            if m < child.num_pages:
                child = self._split_node(child, m)
            pages.append(child.pages)
            rem = rem[child.num_tokens :]
            node = child
        all_pages = (
            np.concatenate(pages) if pages else np.empty(0, np.int32)
        )
        return MatchResult(all_pages, node, len(all_pages) * self.page_size)

    # ------------------------------------------------------------------
    def insert(
        self,
        token_ids: np.ndarray,
        pages: np.ndarray,
        user_id: Optional[str] = None,
        prompt_text: Optional[str] = None,
        scope: Optional[str] = None,
    ) -> int:
        """Insert an aligned (token, page) run; returns number of leading
        pages that were already cached (caller frees those duplicates)."""
        token_ids = np.asarray(token_ids, np.int32)
        pages = np.asarray(pages, np.int32)
        n_pages = len(token_ids) // self.page_size
        token_ids = token_ids[: n_pages * self.page_size]
        pages = pages[:n_pages]
        node = self.root
        rem_t, rem_p = token_ids, pages
        dup = 0
        while len(rem_t) >= self.page_size:
            child = self._select_child(node, rem_t, user_id, scope)
            if child is None:
                self._attach_new(node, rem_t, rem_p, user_id, prompt_text,
                                 scope)
                return dup
            m = self._match_len_pages(rem_t, child.key)
            if m == 0:
                self._attach_new(node, rem_t, rem_p, user_id, prompt_text,
                                 scope)
                return dup
            if m < child.num_pages:
                child = self._split_node(child, m)
            child.last_access_time = max(
                child.last_access_time, node.last_access_time
            )
            dup += child.num_pages
            rem_t = rem_t[child.num_tokens :]
            rem_p = rem_p[child.num_pages :]
            node = child
        return dup

    def _attach_new(
        self,
        parent: TreeNode,
        tokens: np.ndarray,
        pages: np.ndarray,
        user_id: Optional[str],
        prompt_text: Optional[str],
        scope: Optional[str] = None,
    ) -> None:
        """Create chunked child nodes under `parent` holding (tokens, pages)."""
        chunk_pages = max(1, self.safekv.chunk_tokens // self.page_size)
        off = 0
        while off < len(pages):
            n = min(chunk_pages, len(pages) - off)
            t0, t1 = off * self.page_size, (off + n) * self.page_size
            node = TreeNode(
                tokens[t0:t1],
                pages[off : off + n],
                parent=parent,
                private=self.safekv.enabled,
                owner_id=user_id,
            )
            node.scope = scope
            node.prompt_text = prompt_text
            parent.children.setdefault(self._page_key(tokens[t0:]), []).append(
                node
            )
            self._evictable_pages += node.num_pages
            if self.kv_event_fn:
                self.kv_event_fn("stored", node)
            if self.safekv.enabled and self.safekv.privacy_checker:
                self._enqueue_privacy_check(node)
            parent = node
            off += n

    def _enqueue_privacy_check(self, node: TreeNode) -> None:
        # Inherit a public verdict from the parent ONLY when the parent's
        # verdict was computed on this exact prompt text (sibling chunks of
        # one insert), so the judged text covered this node's content.  A
        # public parent from an *earlier* request must not whitelist a new
        # continuation — its verdict never saw the new text (the reference
        # inherits only the conservative direction, private_client.py:70-78).
        p = node.parent
        if (
            p is not None
            and p is not self.root
            and not p.private
            and not p.need_check_privacy
            and not p.pending_check
            and p.prompt_text is not None
            and p.prompt_text == node.prompt_text
        ):
            node.private = False
            node.need_check_privacy = False
            self._merge_public_siblings(node)
            return
        text = node.prompt_text
        if not text:
            # no prompt text to judge (e.g. raw-input_ids request with
            # no tokenizer): the detector would see "" and call it
            # benign, publishing unseen content -- stay private instead
            # (found by ndss_scripts/run_timing_attack_experiment.py:
            # cross-user cache hits on a tokenized PII sequence)
            node.need_check_privacy = False
            return
        node.pending_check = True
        self.safekv.privacy_checker(node, text)

    # ------------------------------------------------------------------
    def apply_privacy_verdict(self, node: TreeNode, is_private: bool) -> None:
        """Apply an async detector verdict (called from the scheduler loop)."""
        node.pending_check = False
        node.need_check_privacy = False
        node.private = is_private
        if not is_private:
            self._merge_public_siblings(node)

    def _merge_public_siblings(self, node: TreeNode) -> None:
        """Once public, fold identical-key public siblings into one node."""
        if node.parent is None:
            return
        for key, sibs in list(node.parent.children.items()):
            if node not in sibs:
                continue
            keep = node
            for other in list(sibs):
                if other is keep or other.private:
                    continue
                if not np.array_equal(other.key, keep.key):
                    continue
                # fold `other` into keep: move children, free duplicate pages
                if other.lock_ref > 0:
                    continue  # in use; merge opportunistically later
                for k2, c2 in other.children.items():
                    dst = keep.children.setdefault(k2, [])
                    for c in c2:
                        c.parent = keep
                        dst.append(c)
                sibs.remove(other)
                self._evictable_pages -= other.num_pages
                self.free_pages_fn(other.pages)
                if self.kv_event_fn:
                    self.kv_event_fn("removed", other)

    # ------------------------------------------------------------------
    def _split_node(self, node: TreeNode, at_pages: int) -> TreeNode:
        """Split `node` so its first `at_pages` pages become a new parent.

        Privacy-preserving (reference ``_split_node:413-447``): both halves
        keep the original privacy verdict/owner and stat window.
        """
        t = at_pages * self.page_size
        upper = TreeNode(
            node.key[:t],
            node.pages[:at_pages],
            parent=node.parent,
            private=node.private,
            owner_id=node.owner_id,
        )
        upper.scope = node.scope
        upper.lock_ref = node.lock_ref
        upper.last_access_time = node.last_access_time
        upper.need_check_privacy = node.need_check_privacy
        upper.pending_check = node.pending_check
        upper.prompt_text = node.prompt_text
        upper.hits_cur, upper.hits_prev = node.hits_cur, node.hits_prev
        upper.users_cur = set(node.users_cur)
        upper.users_prev = node.users_prev
        upper.stat_epoch = node.stat_epoch

        # rewire parent -> upper
        sibs = node.parent.children[self._page_key(node.key)]
        sibs[sibs.index(node)] = upper
        # lower keeps the remainder
        node.key = node.key[t:]
        node.pages = node.pages[at_pages:]
        node.parent = upper
        upper.children[self._page_key(node.key)] = [node]
        return upper

    # ------------------------------------------------------------------
    def inc_lock_ref(self, node: TreeNode) -> None:
        while node is not self.root and node is not None:
            if node.lock_ref == 0:
                self._evictable_pages -= node.num_pages
                self._protected_pages += node.num_pages
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode) -> None:
        while node is not self.root and node is not None:
            node.lock_ref -= 1
            assert node.lock_ref >= 0
            if node.lock_ref == 0:
                self._evictable_pages += node.num_pages
                self._protected_pages -= node.num_pages
            node = node.parent

    # ------------------------------------------------------------------
    def evict(self, num_pages: int) -> int:
        """Evict up to `num_pages` pages from LRU unlocked leaves."""
        leaves = [
            n for n in self._iter_nodes() if n.is_leaf() and n.lock_ref == 0
        ]
        heapq.heapify(leaves)
        freed = 0
        while leaves and freed < num_pages:
            node = heapq.heappop(leaves)
            freed += node.num_pages
            parent = self._remove_node(node)
            if (
                parent is not None
                and parent is not self.root
                and parent.is_leaf()
                and parent.lock_ref == 0
            ):
                heapq.heappush(leaves, parent)
        return freed

    def _remove_node(self, node: TreeNode) -> Optional[TreeNode]:
        parent = node.parent
        for key, sibs in list(parent.children.items()):
            if node in sibs:
                sibs.remove(node)
                if not sibs:
                    del parent.children[key]
                break
        self._evictable_pages -= node.num_pages
        self.free_pages_fn(node.pages)
        if self.kv_event_fn:
            self.kv_event_fn("removed", node)
        return parent

    def _free_subtree(self, node: TreeNode) -> int:
        """Defensively free an entire (unlocked part of a) subtree."""
        freed = 0
        stack = [node]
        order: List[TreeNode] = []
        while stack:
            n = stack.pop()
            order.append(n)
            for sibs in n.children.values():
                stack.extend(sibs)
        for n in reversed(order):  # leaves first
            if n.lock_ref == 0 and n.is_leaf():
                self._remove_node(n)
                freed += n.num_pages
        return freed

    # ------------------------------------------------------------------
    def _check_probe(self, node: TreeNode, user_id: Optional[str]) -> bool:
        """Timing-side-channel defense (reference ``:377-411``).

        Trigger: hit spike vs previous window AND accesses concentrated in
        few users.  Response: free the probed subtree so repeated timing
        probes cannot distinguish cached from uncached prefixes.
        """
        cfg = self.safekv
        baseline = max(node.hits_prev, cfg.min_baseline_hits)
        if node.hits_cur <= baseline * cfg.spike_threshold:
            return False
        users = max(len(node.users_cur), 1)
        if node.hits_cur / users < cfg.concentration_threshold:
            return False
        logger.warning(
            "SafeKV probe detected on node %s (hits=%d users=%d); freeing subtree",
            node.id,
            node.hits_cur,
            users,
        )
        self._free_subtree(node)
        return True

    # ------------------------------------------------------------------
    def _iter_nodes(self):
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n is not self.root:
                yield n
            for sibs in n.children.values():
                stack.extend(sibs)

    def pretty_print(self) -> str:
        lines = []

        def rec(n, d):
            lines.append(
                "  " * d
                + f"[{n.id}] tok={n.num_tokens} priv={n.private} own={n.owner_id} lock={n.lock_ref} hits={n.hits_cur}"
            )
            for sibs in n.children.values():
                for c in sibs:
                    rec(c, d + 1)

        rec(self.root, 0)
        return "\n".join(lines)
