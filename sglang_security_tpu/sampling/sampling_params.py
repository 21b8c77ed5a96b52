"""Per-request sampling parameters.

Capability parity with the reference's ``srt/sampling/sampling_params.py``
(including the SafeKV fork's ``user_id`` field at ``:54,81``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union


@dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1  # -1 = disabled
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    n: int = 1
    # constrained decoding (one of)
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    # logprobs
    return_logprob: bool = False
    top_logprobs_num: int = 0
    logprob_start_len: int = -1  # >=0: also return prompt logprobs
    logit_bias: Optional[dict] = None
    custom_logit_processor: Optional[str] = None  # registered name
    custom_params: Optional[dict] = None  # float params for the processor
    # SafeKV: privacy scope of the request's KV-cache entries
    user_id: Optional[str] = None
    no_stop_trim: bool = False

    def __post_init__(self):
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        self.stop_token_ids = list(self.stop_token_ids or [])
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "SamplingParams":
        if not d:
            return cls()
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})

    def grammar_spec(self):
        if self.json_schema is not None:
            return ("json", self.json_schema)
        if self.regex is not None:
            return ("regex", self.regex)
        if self.ebnf is not None:
            return ("ebnf", self.ebnf)
        return None
