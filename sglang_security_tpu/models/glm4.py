"""GLM-4 (THUDM) decoder.

Capability parity with the reference's ``srt/models/glm4.py``: llama
body with GLM's differences — half-width *interleaved* rotary, merged
``gate_up_proj`` checkpoints, qkv bias, and sandwich norms
(post_self_attn / post_mlp RMSNorms inside the residual branches,
like Gemma2).

Interleaved rope is converted to the standard half-split layout at
LOAD time by permuting the rotary rows of the q/k projections
(attention scores are invariant to a consistent q/k dim permutation),
so the shared rope kernel needs no interleaved variant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.norms import rms_norm
from sglang_security_tpu.layers.rotary import compute_inv_freq
from sglang_security_tpu.models.llama import LlamaForCausalLM


def deinterleave_rotary_rows(w, num_heads: int, head_dim: int, rot: int):
    """Permute [out, in] projection rows (or [out] bias) so interleaved
    rotary pairs (2i, 2i+1) land at half-split positions (i, i+rot/2)."""
    perm = np.arange(head_dim)
    perm[: rot // 2] = np.arange(0, rot, 2)
    perm[rot // 2 : rot] = np.arange(1, rot, 2)
    full = (np.arange(num_heads)[:, None] * head_dim + perm[None, :]).ravel()
    return w[full]


class Glm4ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        factor = config.raw.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * factor)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.rotary_dim, config.rope_theta, config.rope_scaling
            )
        )

    def _wrap_get_tensor(self, get_tensor):
        cfg = self.config

        def wrapped(name):
            w = get_tensor(name)
            for proj, heads in (("q_proj", cfg.num_q_heads),
                                ("k_proj", cfg.num_kv_heads)):
                if name.endswith(f"{proj}.weight") or name.endswith(
                    f"{proj}.bias"
                ):
                    return deinterleave_rotary_rows(
                        np.asarray(w), heads, cfg.head_dim, self.rotary_dim
                    )
            return w

        return wrapped

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        return super().load_weights(self._wrap_get_tensor(get_tensor), dtype)

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        m = f"model.layers.{i}.mlp."
        return {
            "gate_up": lin_merged([m + "gate_up_proj.weight"], None),
            "down": lin_merged([m + "down_proj.weight"], None),
        }

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        p = f"model.layers.{i}."
        lp["post_attn_norm"] = t(
            p + "post_self_attn_layernorm.weight"
        ).astype(dtype)
        lp["post_ffn_norm"] = t(p + "post_mlp_layernorm.weight").astype(dtype)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        """Sandwich norms: extra RMSNorm on each branch output before
        the residual add (HF Glm4DecoderLayer)."""
        eps = self.config.rms_eps
        o, k_pages, v_pages = attn_fn(rms_norm(x, lp["input_norm"], eps))
        x = x + rms_norm(o, lp["post_attn_norm"], eps)
        f = ffn_fn(rms_norm(x, lp["post_norm"], eps))
        x = x + rms_norm(f, lp["post_ffn_norm"], eps)
        return x, k_pages, v_pages


class GlmForCausalLM(Glm4ForCausalLM):
    """GLM-edge / GLM (HF ``GlmForCausalLM``): GLM-4's rope + merged
    gate_up checkpoints but the plain pre-norm layer structure (no
    sandwich norms)."""

    _layer_extra_load = LlamaForCausalLM._layer_extra_load
    _layer_apply = LlamaForCausalLM._layer_apply
