"""Phi-3-small (microsoft/Phi-3-small-*): muP-scaled LN decoder with
gegelu MLP and interleaved fused QKV.

Capability parity with the reference's ``srt/models/phi3_small.py``:
LayerNorm (w+b) body, biased projections, muP scaling knobs
(``mup_embedding_multiplier`` on the embedding,
``mup_attn_multiplier``-derived attention scale,
``mup_width_multiplier`` on the logits — the HF modeling divides, the
reference port omits it; we follow HF), gegelu activation with the
``gegelu_limit`` clamp (``phi3_small.py:37``), linear rope scaling
(``rope_position_scale``), tiktoken dummy-token logit masking
(``phi3_small.py:396-404``).

Blocksparse attention: the checkpoint's config describes a local+
vertical-stride blocksparse pattern, but the reference SERVES IT DENSE —
``phi3_small.py:188-198`` builds ``bs_params`` and never passes it to
``RadixAttention`` (:200).  Dense ragged-paged attention here is exact
behavior parity with the reference, cited rather than silent.

Checkpoint remap: ``self_attn.query_key_value`` stores heads interleaved
per KV group ([Hkv, q_per_kv+2, hd] rows — ``phi3_small.py:218-219``)
and ``mlp.up_proj`` interleaves the gelu/linear halves column-wise
(``:38``); both are de-interleaved at load into the shared merged-linear
layout, so the serving forward runs the same fused kernels as llama.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.layers.rotary import compute_inv_freq
from sglang_security_tpu.models.llama import LlamaForCausalLM


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Phi3SmallForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        config.qkv_bias = True
        config.o_bias = True
        config.mlp_bias = True
        super().__init__(config, quantization, tp_size)
        self.ln_eps = raw.get("layer_norm_epsilon", 1e-5)
        self.gegelu_limit = raw.get("gegelu_limit")
        self.mup_embedding_multiplier = raw.get(
            "mup_embedding_multiplier", 0.0
        )
        self.mup_width_multiplier = raw.get("mup_width_multiplier", 1.0)
        hd = config.head_dim
        if raw.get("mup_use_scaling", False):
            self._scale = raw.get("mup_attn_multiplier", 1.0) / hd
        else:
            self._scale = hd**-0.5
        # linear rope scaling via rope_position_scale (reference :162-168)
        scaling = raw.get("rope_scaling")
        if scaling is None and raw.get("rope_position_scale", 1.0) != 1.0:
            scaling = {
                "rope_type": "linear",
                "factor": raw["rope_position_scale"],
            }
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                hd, raw.get("rope_embedding_base", 10000.0), scaling
            )
        )
        self.dummy_token_indices = raw.get("dummy_token_indices")

    # ------------------------------------------------------- muP hooks
    def _sm_scale(self) -> float:
        return self._scale

    def _embed_scale(self) -> float:
        m = self.mup_embedding_multiplier
        return m if m and m > 0.0 else 1.0

    # ------------------------------------------------------- LN body
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

    # ------------------------------------------------------- gegelu FFN
    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        gate_up = apply_linear(h, lp["gate_up"])
        gate, up = jnp.split(gate_up, 2, axis=-1)
        limit = self.gegelu_limit
        if limit is not None:
            gate = jnp.minimum(gate, limit)
            up = jnp.clip(up, -limit, limit)
        mlp = quick_gelu(gate) * (up + 1.0)
        down = apply_linear(mlp, lp["down"])
        if tp_axis is not None:
            from jax import lax

            down = lax.psum(down, tp_axis)
        return down

    # ------------------------------------------------------------ logits
    def compute_logits(self, params, hidden, tp_axis=None):
        logits = super().compute_logits(params, hidden, tp_axis=tp_axis)
        if self.mup_width_multiplier and self.mup_width_multiplier != 1.0:
            logits = logits / self.mup_width_multiplier
        if self.dummy_token_indices:
            idx = jnp.asarray(self.dummy_token_indices, jnp.int32)
            mask = jnp.zeros(logits.shape[-1], bool).at[idx].set(True)
            logits = jnp.where(mask[None, :], -jnp.inf, logits)
        return logits

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        m = f"model.layers.{i}.mlp."
        return {
            "gate_up": lin_merged(
                [m + "gate_proj.weight", m + "up_proj.weight"],
                [m + "gate_proj.bias", m + "up_proj.bias"],
            ),
            "down": lin_merged(
                [m + "down_proj.weight"], [m + "down_proj.bias"]
            ),
        }

    # ------------------------------------------------------------- load
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        cfg = self.config
        hd = cfg.head_dim
        Hkv = cfg.num_kv_heads
        g = cfg.num_q_heads // Hkv
        I = cfg.intermediate_size

        def wrapped(name):
            # final norm name
            if name.startswith("model.norm."):
                return get_tensor(
                    name.replace("model.norm.", "model.final_layernorm.")
                )
            # fused interleaved qkv -> split q/k/v
            for proj, sel in (("q_proj", slice(0, g)), ("k_proj", g),
                              ("v_proj", g + 1)):
                tag = f"self_attn.{proj}."
                if tag in name:
                    kind = name.rsplit(".", 1)[1]  # weight | bias
                    w = np.asarray(get_tensor(
                        name.replace(tag, "self_attn.query_key_value.")
                    ))
                    w = w.reshape((Hkv, g + 2, hd) + w.shape[1:])
                    out = w[:, sel]
                    return out.reshape((-1,) + w.shape[3:])
            if "self_attn.o_proj." in name:
                return get_tensor(
                    name.replace("self_attn.o_proj.", "self_attn.dense.")
                )
            # interleaved gegelu up_proj -> gate (even cols), up (odd)
            if "mlp.gate_proj." in name:
                w = np.asarray(get_tensor(
                    name.replace("mlp.gate_proj.", "mlp.up_proj.")
                ))
                return w[::2]
            if "mlp.up_proj." in name:
                return np.asarray(get_tensor(name))[1::2]
            return get_tensor(name)

        return super().load_weights(wrapped, dtype=dtype)
