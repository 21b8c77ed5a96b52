"""Tokenizer front-end: text -> Req, request-id management.

The in-process analog of the reference's TokenizerManager
(``srt/managers/tokenizer_manager.py:162``): tokenize, construct
requests, and fan per-request outputs back to their submitters.  The ZMQ
demux machinery collapses away in the one-process runtime; the same
class is reused by the HTTP server and the Engine API.
"""

from __future__ import annotations

import logging
import threading
import uuid
from typing import List, Optional

from sglang_security_tpu.managers.io_struct import (
    GenerateReqInput,
    TokenizedGenerateReqInput,
)
from sglang_security_tpu.managers.schedule_batch import Req
from sglang_security_tpu.sampling.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


def get_tokenizer(
    tokenizer_path: str,
    trust_remote_code: bool = False,
    tokenizer_mode: str = "auto",
    revision: Optional[str] = None,
):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        tokenizer_path,
        trust_remote_code=trust_remote_code,
        use_fast=tokenizer_mode != "slow",
        revision=revision,
    )


def _as_image_list(image_data):
    """Normalize one request's image_data to a list of images. A raw
    nested pixel list counts as ONE image; str/bytes/ndarray elements
    are each one image."""
    import numpy as np

    if image_data is None:
        return None
    if isinstance(image_data, (str, bytes, np.ndarray)):
        return [image_data]
    if isinstance(image_data, (list, tuple)):
        if not image_data:
            return []
        if all(isinstance(x, (str, bytes, np.ndarray)) for x in image_data):
            return list(image_data)
        return [image_data]
    return [image_data]


class TokenizerManager:
    def __init__(self, server_args):
        self.server_args = server_args
        self.tokenizer = (
            None
            if server_args.skip_tokenizer_init
            else get_tokenizer(
                server_args.tokenizer_path,
                server_args.trust_remote_code,
                server_args.tokenizer_mode,
                server_args.revision,
            )
        )
        # set by the Engine once the model config is known; requests
        # longer than this are truncated (--allow-auto-truncate) or
        # rejected (reference tokenizer_manager._validate_one_request)
        self.model_context_len: Optional[int] = None
        # set by the Engine once the model config is known (None =
        # text-only model); reference get_mm_processor dispatch
        # (srt/managers/multimodal_processor.py)
        self.mm_processor = None
        self._lock = threading.Lock()

    def tokenize(self, text: str) -> List[int]:
        assert self.tokenizer is not None, "tokenizer was skipped"
        with self._lock:  # HF fast tokenizers are not thread-safe
            return self.tokenizer.encode(text)

    def make_reqs(self, gri: GenerateReqInput) -> List[TokenizedGenerateReqInput]:
        """Expand a (possibly batched) GenerateReqInput into tokenized reqs."""
        if gri.is_batch():
            texts = gri.text if gri.text is not None else [None] * len(gri.input_ids)
            idss = (
                gri.input_ids
                if gri.input_ids is not None
                else [None] * len(texts)
            )
            n = len(texts)
            sps = gri.sampling_params or [{}] * n
            if isinstance(sps, dict):
                sps = [sps] * n
            rids = gri.rid or [None] * n
            imgs = gri.image_data or [None] * n
            auds = gri.audio_data or [None] * n
            out = []
            for i in range(n):
                out.append(
                    self._one(
                        texts[i], idss[i], sps[i],
                        rids[i], gri, imgs[i], auds[i],
                    )
                )
            return out
        sp = gri.sampling_params if isinstance(gri.sampling_params, dict) else (
            gri.sampling_params or {}
        )
        return [
            self._one(gri.text, gri.input_ids, sp, gri.rid, gri,
                      gri.image_data, gri.audio_data)
        ]

    def _one(self, text, input_ids, sp_dict, rid, gri,
             image_data=None, audio_data=None) -> TokenizedGenerateReqInput:
        if input_ids is None:
            input_ids = self.tokenize(text)
        mm_inputs = None
        images = _as_image_list(image_data)
        audios = _as_image_list(audio_data)
        if images or audios:
            if self.mm_processor is None:
                raise ValueError(
                    "image/audio data given but the served model is not "
                    "multimodal"
                )
            if audios and getattr(
                self.mm_processor, "audio_pool_step", 0
            ) <= 0:
                raise ValueError(
                    "audio_data given but the served model has no audio "
                    "encoder"
                )
            input_ids, mm_inputs = self.mm_processor.expand_prompt(
                list(input_ids), images or [], audios or []
            )
        ctx = self.model_context_len
        if ctx is not None and len(input_ids) >= ctx:
            if self.server_args.allow_auto_truncate:
                # keep the tail (the reference truncates to
                # context_len - 1, tokenizer_manager validation)
                input_ids = list(input_ids)[-(ctx - 1):]
            else:
                raise ValueError(
                    f"prompt is {len(input_ids)} tokens but the model "
                    f"context length is {ctx}; pass --allow-auto-truncate"
                    " to truncate instead of rejecting"
                )
        if text is None and self.tokenizer is not None:
            # raw-input_ids request: decode so the SafeKV privacy
            # detector judges real content (with no text, nodes stay
            # private forever -- safe but unshareable)
            try:
                text = self.tokenizer.decode(list(input_ids))
            except Exception:
                text = None
        sp = SamplingParams.from_dict(sp_dict)
        if sp.custom_logit_processor and not (
            self.server_args.enable_custom_logit_processor
        ):
            raise ValueError(
                "custom_logit_processor requires "
                "--enable-custom-logit-processor"
            )
        if gri.return_logprob:
            sp.return_logprob = True
        if gri.logprob_start_len >= 0:
            sp.logprob_start_len = gri.logprob_start_len
            sp.top_logprobs_num = gri.top_logprobs_num
        return TokenizedGenerateReqInput(
            rid=rid or uuid.uuid4().hex,
            input_ids=list(input_ids),
            sampling_params=sp,
            prompt_text=text,
            stream=gri.stream,
            user_id=gri.user_id or sp.user_id,
            session_id=gri.session_id,
            bootstrap_host=gri.bootstrap_host,
            bootstrap_port=gri.bootstrap_port,
            bootstrap_room=gri.bootstrap_room,
            lora_path=gri.lora_path,
            is_embedding=gri.is_embedding,
            mm_inputs=mm_inputs,
        )

    def to_req(self, t: TokenizedGenerateReqInput) -> Req:
        req = Req(
            rid=t.rid,
            input_ids=t.input_ids,
            sampling_params=t.sampling_params,
            user_id=t.user_id,
            prompt_text=t.prompt_text,
            session_id=t.session_id,
        )
        req.stream = t.stream
        req.bootstrap_host = t.bootstrap_host
        req.bootstrap_port = t.bootstrap_port
        req.bootstrap_room = t.bootstrap_room
        req.lora_path = t.lora_path
        req.is_embedding = t.is_embedding
        req.mm_inputs = t.mm_inputs
        if t.mm_inputs and any(
            it.vis_meta is not None and "llm_grid" in it.vis_meta
            for it in t.mm_inputs.items
        ):
            # M-RoPE models (Qwen-VL): 3D prompt positions + decode delta
            from sglang_security_tpu.managers.multimodal_processor import (
                compute_mrope_positions,
            )

            req.mrope_pos, req.mrope_delta = compute_mrope_positions(
                len(t.input_ids), t.mm_inputs.items
            )
        return req
