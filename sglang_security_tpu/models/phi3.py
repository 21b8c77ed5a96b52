"""Phi-3 / Phi-3.5 / Phi-4 (mini) decoder.

Capability parity with the reference's ``srt/models/phi3_small.py`` /
llama-family handling of Phi checkpoints: the body is the shared llama
decoder; differences are checkpoint layout (pre-merged ``qkv_proj`` and
``gate_up_proj`` tensors) and LongRoPE scaling (per-dim long/short factor
arrays picked by context length).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        rs = config.rope_scaling or {}
        kind = rs.get("rope_type", rs.get("type", ""))
        if kind == "longrope":
            orig = config.raw.get(
                "original_max_position_embeddings", config.max_position
            )
            use_long = config.max_position > orig
            factors = np.asarray(
                rs["long_factor"] if use_long else rs["short_factor"],
                np.float64,
            )
            base_inv = 1.0 / (
                config.rope_theta
                ** (
                    np.arange(0, config.head_dim, 2, dtype=np.float64)
                    / config.head_dim
                )
            )
            inv = base_inv / factors
            scale = config.max_position / orig
            if scale > 1.0:
                # attention scaling factor (HF Phi3 LongRoPE)
                self._mscale = math.sqrt(
                    1 + math.log(scale) / math.log(orig)
                )
            else:
                self._mscale = 1.0
            self.inv_freq = jnp.asarray(inv.astype(np.float32))
        else:
            self._mscale = 1.0

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """Phi-3 stores qkv_proj/gate_up_proj pre-merged; split them into
        the component names the shared loader merges back (keeps TP
        interleave and quantized-checkpoint ingestion uniform)."""
        cfg = self.config
        hd, Hq, Hkv = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads
        I = cfg.intermediate_size

        def wrapped(name):
            if ".self_attn.q_proj" in name:
                w = get_tensor(name.replace("q_proj", "qkv_proj"))
                return w[: Hq * hd]
            if ".self_attn.k_proj" in name:
                w = get_tensor(name.replace("k_proj", "qkv_proj"))
                return w[Hq * hd : (Hq + Hkv) * hd]
            if ".self_attn.v_proj" in name:
                w = get_tensor(name.replace("v_proj", "qkv_proj"))
                return w[(Hq + Hkv) * hd :]
            if ".mlp.gate_proj" in name:
                return get_tensor(name.replace("gate_proj", "gate_up_proj"))[:I]
            if ".mlp.up_proj" in name:
                return get_tensor(name.replace("up_proj", "gate_up_proj"))[I:]
            return get_tensor(name)

        return super().load_weights(wrapped, dtype=dtype)

    def _attn_apply(self, lp, h, fb, k_pages, v_pages, li, safe_slots, **kw):
        if self._mscale != 1.0:
            # fold LongRoPE attention scaling into the query
            h = h  # scaling is applied to q via sm_scale below
        return super()._attn_apply(
            lp, h, fb, k_pages, v_pages, li, safe_slots, **kw
        )

    def _paged_attention(self, q, k_pages, v_pages, fb, li, *, sm_scale,
                         **kw):
        return super()._paged_attention(
            q, k_pages, v_pages, fb, li,
            sm_scale=sm_scale * (self._mscale**2), **kw
        )


class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2/2.5: llama body; checkpoint packs qkv as grouped
    ``attention.wqkv`` [ (Hkv*(g+2))*hd, H ] with per-group [q*g, k, v]
    interleave, and names ffn tensors w1/w3/w2."""

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        cfg = self.config
        hd, Hq, Hkv = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads
        g = Hq // Hkv

        def split_wqkv(name, which):
            base = name.rsplit(".self_attn.", 1)[0]
            w = np.asarray(get_tensor(base + ".attention.wqkv.weight"))
            w = w.reshape(Hkv, g + 2, hd, -1)
            if which == "q":
                return w[:, :g].reshape(Hq * hd, -1)
            if which == "k":
                return w[:, g].reshape(Hkv * hd, -1)
            return w[:, g + 1].reshape(Hkv * hd, -1)

        def wrapped(name):
            if ".self_attn.q_proj.weight" in name:
                return split_wqkv(name, "q")
            if ".self_attn.k_proj.weight" in name:
                return split_wqkv(name, "k")
            if ".self_attn.v_proj.weight" in name:
                return split_wqkv(name, "v")
            remap = {
                ".self_attn.o_proj.": ".attention.wo.",
                ".mlp.gate_proj.": ".feed_forward.w1.",
                ".mlp.up_proj.": ".feed_forward.w3.",
                ".mlp.down_proj.": ".feed_forward.w2.",
                "input_layernorm": "attention_norm",
                "post_attention_layernorm": "ffn_norm",
                "model.embed_tokens": "model.tok_embeddings",
                "lm_head": "output",
            }
            for ours, theirs in remap.items():
                if ours in name:
                    name = name.replace(ours, theirs)
            return get_tensor(name)

        return super().load_weights(wrapped, dtype=dtype)
