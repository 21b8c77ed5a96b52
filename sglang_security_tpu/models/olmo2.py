"""OLMo 2 (Allen AI) decoder.

Capability parity with the reference's ``srt/models/olmo2.py``: llama
body with OLMo2's differences — post-norm residual structure (norm on
each branch OUTPUT, no pre-norms) and whole-projection q/k RMSNorms
applied before the head reshape (HF Olmo2Attention q_norm/k_norm over
num_heads*head_dim, unlike Qwen3's per-head norms).
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_security_tpu.layers.norms import rms_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM


class Olmo2ForCausalLM(LlamaForCausalLM):
    def _norm_names(self):
        # no input_layernorm in the checkpoint; map the two post-norms
        # onto the body's (input_norm, post_norm) slots
        return "post_attention_layernorm", "post_feedforward_layernorm"

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        a = f"model.layers.{i}.self_attn."
        lp["q_norm_flat"] = t(a + "q_norm.weight").astype(dtype)
        lp["k_norm_flat"] = t(a + "k_norm.weight").astype(dtype)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        """Post-norm: h = h + norm(attn(h)); h = h + norm(mlp(h))
        (HF Olmo2DecoderLayer)."""
        eps = self.config.rms_eps
        o, k_pages, v_pages = attn_fn(x)
        x = x + rms_norm(o, lp["input_norm"], eps)
        x = x + rms_norm(ffn_fn(x), lp["post_norm"], eps)
        return x, k_pages, v_pages
