"""Reasoning-text separation (parity with srt/reasoning_parser.py).

Splits chain-of-thought blocks (``<think>...</think>`` and model-family
variants) from the answer text, with incremental/streaming support.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

TAGS = {
    "deepseek-r1": ("<think>", "</think>"),
    "qwen3": ("<think>", "</think>"),
    "kimi": ("◁think▷", "◁/think▷"),
}


@dataclass
class ReasoningParser:
    model_type: str = "deepseek-r1"
    # some models (r1) open the think block implicitly at position 0
    think_start_open: bool = True

    def __post_init__(self):
        self.open_tag, self.close_tag = TAGS.get(
            self.model_type, ("<think>", "</think>")
        )
        self._in_think = self.think_start_open
        self._reasoning = []
        self._normal = []

    def parse_non_stream(self, text: str) -> Tuple[str, str]:
        """Returns (reasoning_text, normal_text)."""
        if self.open_tag in text:
            pre, _, rest = text.partition(self.open_tag)
        else:
            pre, rest = ("", text) if self.think_start_open else (text, "")
        if self.close_tag in rest:
            think, _, post = rest.partition(self.close_tag)
            return think.strip(), (pre + post).strip()
        if self.think_start_open and self.open_tag not in text:
            # whole text is reasoning until a close tag appears
            return rest.strip(), pre.strip()
        return "", text.strip()

    def parse_stream_chunk(self, chunk: str) -> Tuple[str, str]:
        """Incremental split; returns (reasoning_delta, normal_delta)."""
        out_r, out_n = [], []
        buf = chunk
        while buf:
            if self._in_think:
                if self.close_tag in buf:
                    think, _, buf = buf.partition(self.close_tag)
                    out_r.append(think)
                    self._in_think = False
                else:
                    out_r.append(buf)
                    buf = ""
            else:
                if self.open_tag in buf:
                    normal, _, buf = buf.partition(self.open_tag)
                    out_n.append(normal)
                    self._in_think = True
                else:
                    out_n.append(buf)
                    buf = ""
        return "".join(out_r), "".join(out_n)
