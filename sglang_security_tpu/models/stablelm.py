"""StableLM 2 (Stability AI) decoder.

Capability parity with the reference's ``srt/models/stablelm.py``:
llama body with StableLM's differences — LayerNorm (weight + bias)
instead of RMSNorm, partial rotary (``partial_rotary_factor``), and
optional qkv bias (``use_qkv_bias``).
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.layers.rotary import compute_inv_freq
from sglang_security_tpu.models.llama import LlamaForCausalLM


class StableLmForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        config.qkv_bias = bool(config.raw.get("use_qkv_bias", False))
        super().__init__(config, quantization, tp_size)
        assert config.raw.get("use_parallel_residual", False) is False, (
            "StableLM parallel-residual variant not supported"
        )
        factor = config.raw.get("partial_rotary_factor", 0.25)
        self.rotary_dim = int(config.head_dim * factor)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.rotary_dim, config.rope_theta, config.rope_scaling
            )
        )
        self.ln_eps = config.raw.get("layer_norm_eps", 1e-5)

    def _load_norm(self, t, prefix, dtype):
        return {
            "w": t(prefix + ".weight").astype(dtype),
            "b": t(prefix + ".bias").astype(dtype),
        }

    def _ln(self, x, p):
        return layer_norm(x, p["w"], p["b"], self.ln_eps)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        o, k_pages, v_pages = attn_fn(self._ln(x, lp["input_norm"]))
        x = x + o
        x = x + ffn_fn(self._ln(x, lp["post_norm"]))
        return x, k_pages, v_pages

    def _apply_final_norm(self, x, w):
        return self._ln(x, w)
