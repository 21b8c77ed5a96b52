"""IBM Granite 3 decoder.

Capability parity with the reference's ``srt/models/granite.py``:
exactly the llama body plus Granite's four static multipliers —
``embedding_multiplier`` on the embeddings, ``residual_multiplier`` on
every residual branch, ``attention_multiplier`` as the attention
scale, and ``logits_scaling`` dividing the lm logits.
"""

from __future__ import annotations

from sglang_security_tpu.layers.norms import fused_add_rms_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        raw = config.raw
        self.embedding_multiplier = float(
            raw.get("embedding_multiplier", 1.0)
        )
        self.residual_multiplier = float(raw.get("residual_multiplier", 1.0))
        self.attention_multiplier = float(
            raw.get("attention_multiplier", config.head_dim**-0.5)
        )
        self.logits_scaling = float(raw.get("logits_scaling", 1.0))

    def _embed_scale(self) -> float:
        return self.embedding_multiplier

    def _sm_scale(self) -> float:
        return self.attention_multiplier

    def _logit_scale(self) -> float:
        return 1.0 / self.logits_scaling

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        cfg = self.config
        m = self.residual_multiplier
        h, resid = fused_add_rms_norm(x, None, lp["input_norm"], cfg.rms_eps)
        o, k_pages, v_pages = attn_fn(h)
        x = resid + o * m
        h, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
        x = resid + ffn_fn(h) * m
        return x, k_pages, v_pages
