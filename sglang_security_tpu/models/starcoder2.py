"""StarCoder2 (BigCode) decoder.

Capability parity with the reference's ``srt/models/starcoder2.py``:
llama body with StarCoder2's differences — LayerNorm (weight + bias),
bias on every linear (``use_bias``), and a NON-gated MLP
(``c_fc`` -> gelu -> ``c_proj``) instead of SwiGLU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act


class Starcoder2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        use_bias = bool(config.raw.get("use_bias", True))
        config.qkv_bias = use_bias
        config.o_bias = use_bias
        config.mlp_bias = use_bias
        super().__init__(config, quantization, tp_size)
        self.ln_eps = config.raw.get("norm_epsilon", 1e-5)

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

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        m = f"model.layers.{i}.mlp."
        bias = self.config.mlp_bias
        return {
            "c_fc": lin_merged(
                [m + "c_fc.weight"], [m + "c_fc.bias"] if bias else None
            ),
            "c_proj": lin_merged(
                [m + "c_proj.weight"], [m + "c_proj.bias"] if bias else None
            ),
        }

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        out = apply_linear(
            _act(self.config.act_fn)(apply_linear(h, lp["c_fc"])),
            lp["c_proj"],
        )
        if tp_axis is not None:
            out = lax.psum(out, tp_axis)
        return out
