"""Async privacy-judge pipeline: client + background service threads.

Re-creates the SafeKV fork's PrivateJudgeClient / PrivateJudgeService
(``srt/managers/private_service/private_client.py:31`` /
``private_service.py:27``): an asynchronous 3-tier pipeline that decides
whether a cached prefix may be shared across users.

  tier 1: regex/trie pattern detector (fast, in this process)
  tier 2: PII token-classification model (HF, optional; confidence band
          ``low < p < high`` escalates further)
  tier 3: LLM judge — routed back through the serving engine itself as a
          high-priority request (optional, off by default)

Verdicts land on a thread-safe queue; the scheduler drains them at loop
boundaries via ``drain_verdicts`` and applies them to the radix tree
(``RadixCache.apply_privacy_verdict``).  Node references are held weakly
by task id so a freed subtree never resurrects.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass
from typing import Optional

from sglang_security_tpu.managers.private_service.privacy_detector import (
    PrivacyDetector,
)

logger = logging.getLogger(__name__)


@dataclass
class PrivateNodeTask:
    task_id: int
    node: object  # TreeNode
    text: str


@dataclass
class Verdict:
    task_id: int
    node: object
    is_private: bool
    confidence: float
    tier: int


class PrivateJudgeClient:
    """Client facade living in the scheduler; owns the service threads."""

    def __init__(self, server_args, llm_judge_fn=None):
        self.server_args = server_args
        self._task_counter = 0
        self._tier1_q: "queue.Queue[PrivateNodeTask]" = queue.Queue()
        self._tier2_q: "queue.Queue[PrivateNodeTask]" = queue.Queue()
        self._verdicts: "queue.Queue[Verdict]" = queue.Queue()
        self._detector = PrivacyDetector()
        self._tier2 = None
        self._llm_judge_fn = llm_judge_fn
        self.tier3_count = 0  # observability: judged-by-LLM tasks
        self._low = server_args.safekv_tier2_low
        self._high = server_args.safekv_tier2_high
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._tier1_loop, name="safekv-tier1", daemon=True
            ),
            threading.Thread(
                target=self._tier2_loop, name="safekv-tier2", daemon=True
            ),
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------- submit
    def submit(self, node, text: str) -> None:
        """Called by RadixCache on insert of a private node."""
        self._task_counter += 1
        self._tier1_q.put(PrivateNodeTask(self._task_counter, node, text))

    def drain_verdicts(self, tree_cache) -> int:
        """Apply pending verdicts (called from the scheduler loop)."""
        n = 0
        while True:
            try:
                v = self._verdicts.get_nowait()
            except queue.Empty:
                return n
            tree_cache.apply_privacy_verdict(v.node, v.is_private)
            n += 1

    # ------------------------------------------------------------ tier 1
    def _tier1_loop(self) -> None:
        while not self._stop.is_set():
            try:
                task = self._tier1_q.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                r = self._detector.detect(task.text or "")
            except Exception:
                logger.exception("tier-1 detector failed; keeping private")
                continue
            if self._low < r.confidence < self._high:
                self._tier2_q.put(task)  # ambiguous -> escalate
            else:
                self._verdicts.put(
                    Verdict(task.task_id, task.node, r.is_private, r.confidence, 1)
                )

    # ------------------------------------------------------------ tier 2
    def _get_tier2(self):
        if self._tier2 is None:
            path = self.server_args.safekv_tier2_model_path
            if path:
                from sglang_security_tpu.managers.private_service.pii_model import (
                    PiiModelDetector,
                )

                self._tier2 = PiiModelDetector(path)
            else:
                self._tier2 = False
        return self._tier2

    def _tier2_loop(self) -> None:
        batch: list = []
        while not self._stop.is_set():
            try:
                task = self._tier2_q.get(timeout=0.2)
                batch.append(task)
                bs = self.server_args.safekv_judge_batch_size
                while len(batch) < bs:
                    batch.append(self._tier2_q.get_nowait())
            except queue.Empty:
                pass
            if not batch:
                continue
            tier2 = self._get_tier2()
            if tier2 is False or tier2 is None:
                # no model configured: conservative -> stays private, or
                # escalate to LLM judge when enabled
                for t in batch:
                    if self._llm_judge_fn and not self.server_args.safekv_disable_llm_judge:
                        self._tier3(t)
                    else:
                        self._verdicts.put(Verdict(t.task_id, t.node, True, 0.5, 2))
                batch = []
                continue
            try:
                results = tier2.detect_batch([t.text or "" for t in batch])
                for t, (is_priv, conf) in zip(batch, results):
                    if self._low < conf < self._high and self._llm_judge_fn and not self.server_args.safekv_disable_llm_judge:
                        self._tier3(t)
                    else:
                        self._verdicts.put(
                            Verdict(t.task_id, t.node, is_priv, conf, 2)
                        )
            except Exception:
                logger.exception("tier-2 failed; keeping batch private")
            batch = []

    # ------------------------------------------------------------ tier 3
    JUDGE_PROMPT = (
        "You are a privacy auditor. Does the following text contain "
        "personal, confidential, or user-specific information that should "
        "NOT be shared across users of a cache? Answer strictly yes or no.\n"
        "Text:\n{}\nAnswer:"
    )

    def _tier3(self, task: PrivateNodeTask) -> None:
        """LLM judge routed through the engine (priority request)."""
        try:
            self.tier3_count += 1
            out = self._llm_judge_fn(
                self.JUDGE_PROMPT.format(task.text[:2000]),
                rid=f"PRIVACY_DETECTION_LLM_{task.task_id}",
            )
            ans = (out.get("text") or "").strip().lower()
            is_priv = not ans.startswith("no")
            self._verdicts.put(Verdict(task.task_id, task.node, is_priv, 0.8, 3))
        except Exception:
            logger.exception("tier-3 judge failed; keeping private")

    def shutdown(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=1)
