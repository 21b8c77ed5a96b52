"""Control-plane message types between API layer, scheduler, and clients.

Parity with the reference's ``srt/managers/io_struct.py`` (~50 ZMQ
dataclasses); ours are in-process messages by default (one process per
host), with the same shapes so a ZMQ transport can serialize them for
multi-node deployments.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from sglang_security_tpu.sampling.sampling_params import SamplingParams


@dataclass
class GenerateReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[dict, List[dict]]] = None
    rid: Optional[Union[str, List[str]]] = None
    # multimodal: one image (path/base64/ndarray) or list of images per
    # request; for batched requests, a list aligned with text/input_ids
    # (reference GenerateReqInput.image_data, io_struct.py)
    image_data: Optional[Any] = None
    # audio clips (waveform ndarray / wav path / base64 wav), same
    # per-request alignment rules (reference GenerateReqInput.audio_data)
    audio_data: Optional[Any] = None
    stream: bool = False
    return_logprob: bool = False
    top_logprobs_num: int = 0
    logprob_start_len: int = -1  # >=0: also return prompt logprobs
    user_id: Optional[str] = None
    session_id: Optional[str] = None
    lora_path: Optional[str] = None
    is_embedding: bool = False  # encode path: return pooled hidden state
    # PD disaggregation rendezvous
    bootstrap_host: Optional[str] = None
    bootstrap_port: Optional[int] = None
    bootstrap_room: Optional[int] = None

    def is_batch(self) -> bool:
        if self.text is not None:
            return not isinstance(self.text, str)
        return bool(self.input_ids) and isinstance(self.input_ids[0], list)


@dataclass
class TokenizedGenerateReqInput:
    rid: str
    input_ids: List[int]
    sampling_params: SamplingParams
    prompt_text: Optional[str] = None
    stream: bool = False
    user_id: Optional[str] = None
    session_id: Optional[str] = None
    lora_path: Optional[str] = None
    is_embedding: bool = False
    mm_inputs: Optional[Any] = None  # managers.multimodal_processor.MultimodalInputs
    bootstrap_host: Optional[str] = None
    bootstrap_port: Optional[int] = None
    bootstrap_room: Optional[int] = None


@dataclass
class StepOutput:
    """Per-request incremental output from one scheduler step."""

    rid: str
    new_token_ids: List[int]
    new_text: str
    finished: bool
    finish_reason: Optional[str] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    output_logprobs: Optional[List[float]] = None
    input_logprobs: Optional[List[Optional[float]]] = None
    e2e_latency: Optional[float] = None
    embedding: Optional[List[float]] = None  # encode path result


@dataclass
class AbortReq:
    rid: str


@dataclass
class FlushCacheReq:
    pass


@dataclass
class UpdateWeightsReqInput:
    model_path: str


@dataclass
class ProfileReq:
    action: str = "start"  # start | stop
    output_dir: Optional[str] = None


@dataclass
class OpenSessionReqInput:
    session_id: Optional[str] = None
    capacity_of_str_len: int = 8192


@dataclass
class CloseSessionReqInput:
    session_id: str = ""


@dataclass
class GetServerInfoReq:
    pass
