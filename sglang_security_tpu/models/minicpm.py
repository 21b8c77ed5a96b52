"""MiniCPM (OpenBMB) decoder.

Capability parity with the reference's ``srt/models/minicpm.py``: the
llama body plus MiniCPM's muP-style static scalers — ``scale_emb`` on
the embeddings, ``scale_depth / sqrt(num_layers)`` on every residual
branch output, and logits divided by ``hidden_size / dim_model_base``.
"""

from __future__ import annotations

import math

from sglang_security_tpu.layers.norms import fused_add_rms_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM


class MiniCPMForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        raw = config.raw
        self.scale_emb = float(raw.get("scale_emb", 1.0))
        self.residual_scale = float(
            raw.get("scale_depth", math.sqrt(config.num_layers))
        ) / math.sqrt(config.num_layers)
        self.scale_width = config.hidden_size / float(
            raw.get("dim_model_base", config.hidden_size)
        )

    def _embed_scale(self) -> float:
        return self.scale_emb

    def _logit_scale(self) -> float:
        return 1.0 / self.scale_width

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        cfg = self.config
        s = self.residual_scale
        h, resid = fused_add_rms_norm(x, None, lp["input_norm"], cfg.rms_eps)
        o, k_pages, v_pages = attn_fn(h)
        x = resid + o * s
        h, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
        x = resid + ffn_fn(h) * s
        return x, k_pages, v_pages
