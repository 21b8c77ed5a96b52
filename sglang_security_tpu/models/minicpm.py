"""MiniCPM (OpenBMB) decoder.

Capability parity with the reference's ``srt/models/minicpm.py``: the
llama body plus MiniCPM's muP-style static scalers — ``scale_emb`` on
the embeddings, ``scale_depth / sqrt(num_layers)`` on every residual
branch output, and logits divided by ``hidden_size / dim_model_base``.
"""

from __future__ import annotations

import math

from sglang_security_tpu.layers.norms import fused_add_rms_norm
from sglang_security_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
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


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
    """MiniCPM3: DeepSeek-style MLA attention (same q_a/q_b/kv_a/kv_b
    checkpoint names; reference ``srt/models/minicpm3.py``) combined
    with MiniCPM's muP scalers. Dense FFN only (num_experts=0 routes
    the DeepSeek loader's dense branch)."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        config.use_mla = True
        raw = config.raw
        config.qk_nope_head_dim = int(raw.get("qk_nope_head_dim", 64))
        config.qk_rope_head_dim = int(raw.get("qk_rope_head_dim", 32))
        config.kv_lora_rank = int(raw.get("kv_lora_rank", 256))
        config.q_lora_rank = int(raw.get("q_lora_rank") or 0)
        config.v_head_dim = int(
            raw.get("v_head_dim", raw.get("qk_nope_head_dim", 64))
        )
        config.head_dim = config.qk_nope_head_dim + config.qk_rope_head_dim
        super().__init__(config, quantization, tp_size)
        self.scale_emb = float(raw.get("scale_emb", 1.0))
        self.residual_scale = float(
            raw.get("scale_depth", math.sqrt(config.num_layers))
        ) / math.sqrt(config.num_layers)
        self.scale_width = config.hidden_size / float(
            raw.get("dim_model_base", config.hidden_size)
        )

    _embed_scale = MiniCPMForCausalLM._embed_scale
    _logit_scale = MiniCPMForCausalLM._logit_scale
    _layer_apply = MiniCPMForCausalLM._layer_apply
