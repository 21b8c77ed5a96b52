"""Request state machine and host-side batch assembly.

The host-side half of the reference's ``Req`` / ``ScheduleBatch``
(``srt/managers/schedule_batch.py:421,793``): page bookkeeping, prefix
pinning, finish conditions.  Device-side batch tensors are built here as
numpy and converted once per step (``to_forward_batch``) — the TPU analog
of prepare_for_extend/prepare_for_decode, with aligned-ragged token
packing for the unified attention kernel.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from sglang_security_tpu.sampling.sampling_params import SamplingParams


class FinishReason(str, enum.Enum):
    STOP = "stop"  # eos or stop string/token
    LENGTH = "length"
    ABORT = "abort"


@dataclass
class TimeStats:
    """Per-request stage timing (reference metrics/collector.py:27-131)."""

    created: float = field(default_factory=time.monotonic)
    queued: float = 0.0
    prefill_start: float = 0.0
    first_token: float = 0.0
    finished: float = 0.0


class Req:
    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        user_id: Optional[str] = None,
        prompt_text: Optional[str] = None,
        session_id: Optional[str] = None,
    ):
        self.rid = rid
        self.input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.user_id = user_id if user_id is not None else sampling_params.user_id
        self.prompt_text = prompt_text
        self.session_id = session_id

        self.output_ids: List[int] = []
        self.pages: np.ndarray = np.empty(0, np.int32)  # all pages, in order
        self.prefix_pages = 0  # leading pages shared from the radix tree
        self.prefix_len = 0  # tokens covered by the shared prefix
        self.computed_len = 0  # tokens whose KV is materialized
        self.last_node = None  # pinned radix node
        self.finished_reason: Optional[FinishReason] = None
        self.grammar = None  # constrained-decoding state machine
        self.penalty_slot = -1  # device penalty-count slot (-1 = unused)
        self.dp_shard = 0  # DP-attention shard owning this req's KV pages
        # PD disaggregation
        self.bootstrap_host: Optional[str] = None
        self.bootstrap_port: Optional[int] = None
        self.bootstrap_room: Optional[int] = None
        self.lora_path: Optional[str] = None
        self.lora_slot = -1
        # EAGLE speculative state: feature-table slot + committed (token,
        # feature) pairs pending draft-extend (speculative/eagle_worker.py)
        self.spec_slot = -1
        self.spec_pending: List[int] = []
        # cross-attention VLM (mllama): vision-KV pool slot + valid
        # vision-token count (models/mllama.py)
        self.cross_slot = -1
        self.cross_len = 0
        self.is_embedding = False
        # multimodal inputs (managers.multimodal_processor.MultimodalInputs);
        # image spans in input_ids hold hash-derived pseudo token ids
        self.mm_inputs = None
        # M-RoPE (Qwen-VL): 3D prompt positions + decode delta
        # (models/qwen2_vl.py; HF get_rope_index semantics)
        self.mrope_pos: Optional[np.ndarray] = None  # [3, prompt_len]
        self.mrope_delta = 0
        self.stream = False
        self.time_stats = TimeStats()
        self.return_logprob = sampling_params.return_logprob
        self.output_logprobs: List[float] = []
        self.input_logprobs: List[float] = []  # prompt-token logprobs
        # incremental detokenization state
        self.read_offset = 0
        self.surr_offset = 0
        self.decoded_text = ""
        # --stream-interval: tokens/text held back until the next chunk
        self.pending_tokens: List[int] = []
        self.pending_text = ""

    # ------------------------------------------------------------------
    def needs_penalties(self) -> bool:
        sp = self.sampling_params
        return (
            sp.presence_penalty != 0.0
            or sp.frequency_penalty != 0.0
            or sp.repetition_penalty != 1.0
        )

    @property
    def seq_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def extend_len(self) -> int:
        """Tokens still needing prefill (prompt beyond computed prefix)."""
        return len(self.input_ids) - self.computed_len

    def finished(self) -> bool:
        return self.finished_reason is not None

    def all_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    def check_finished(self, eos_token_ids, vocab_size: int) -> None:
        if self.finished():
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finished_reason = FinishReason.LENGTH
            return
        if not self.output_ids:
            return
        last = self.output_ids[-1]
        if not sp.ignore_eos and len(self.output_ids) >= max(sp.min_new_tokens, 1):
            if last in eos_token_ids or last in sp.stop_token_ids:
                self.finished_reason = FinishReason.STOP
                return
        if last >= vocab_size or last < 0:
            self.finished_reason = FinishReason.STOP

    def pages_needed(self, page_size: int, extra_tokens: int = 0) -> int:
        total = self.computed_len + self.extend_len + extra_tokens
        have = len(self.pages)
        return max(0, -(-total // page_size) - have)

    def token_slot(self, pos: int, page_size: int) -> int:
        return int(self.pages[pos // page_size]) * page_size + pos % page_size
