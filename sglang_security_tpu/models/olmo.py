"""OLMo 1 (Allen AI) decoder.

Capability parity with the reference's ``srt/models/olmo.py``: llama
body with OLMo's differences — NON-parametric LayerNorm (no weight or
bias tensors in the checkpoint; plain standardization) on both branch
inputs and the final norm, plus ``clip_qkv`` clamping (0424 variants).
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_security_tpu.models.llama import LlamaForCausalLM


def _standardize(x, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * (var + eps) ** -0.5).astype(x.dtype)


class OlmoForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        self.clip_qkv = config.raw.get("clip_qkv")  # 0424 variants
        self.ln_eps = 1e-5

    def _load_norm(self, t, prefix, dtype):
        # OlmoLayerNorm is elementwise_affine=False: the checkpoint has
        # no norm tensors at all; keep a placeholder leaf for pytree shape
        return jnp.ones((1,), dtype)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        o, k_pages, v_pages = attn_fn(_standardize(x, self.ln_eps))
        x = x + o
        x = x + ffn_fn(_standardize(x, self.ln_eps))
        return x, k_pages, v_pages

    def _apply_final_norm(self, x, w):
        return _standardize(x, self.ln_eps)
