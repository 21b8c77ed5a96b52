"""Gemma2 / Gemma3-text decoder.

Capability parity with the reference's ``srt/models/gemma2.py``:
sandwich norms (pre/post around both attention and FFN), (1+w) RMSNorm
(folded into stored weights so the shared body's standard RMSNorm applies
verbatim), sqrt(hidden) embedding scale, tied embeddings, attention and
final-logit soft-capping, query_pre_attn_scalar softmax scaling, and
alternating sliding-window/global attention layers (requires the
unrolled-layers mode: the window is a static kernel parameter per layer).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.norms import rms_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act, _scatter_kv
from sglang_security_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention,
)


class Gemma2ForCausalLM(LlamaForCausalLM):
    def _embed_scale(self) -> float:
        return math.sqrt(self.config.hidden_size)

    def _sm_scale(self) -> float:
        q = self.config.raw.get("query_pre_attn_scalar")
        return (q or self.config.head_dim) ** -0.5

    def _layer_sliding(self, li: int) -> Optional[int]:
        # gemma2: even layers sliding-window, odd layers global
        sw = self.config.sliding_window
        if sw is None:
            return None
        lt = self.config.raw.get("layer_types")
        if lt:  # newer HF configs list each layer's attention type
            return sw if lt[li] == "sliding_attention" else None
        pattern = self.config.raw.get("sliding_window_pattern", 2)
        return sw if (li % pattern) != (pattern - 1) else None

    def _layer_inv_freq(self, li: int):
        """RoPE frequencies for layer li (Gemma3 overrides: local vs global)."""
        return self.inv_freq

    # ------------------------------------------------------------- params
    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        p = super()._ffn_params_dummy(i, rand, lin, lin_merged, dtype)
        H = self.config.hidden_size
        p["post_attn_norm"] = jnp.ones((H,), dtype)
        p["post_ffn_norm"] = jnp.ones((H,), dtype)
        return p

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        p = super()._ffn_params_load(i, t, lin_merged, dtype)
        b = f"model.layers.{i}."
        # (1+w) gemma norm folded into the stored weight; use the RAW
        # getter — `t` goes through the name-remapping wrapper below.
        raw = self._raw_get
        p["post_attn_norm"] = (
            jnp.asarray(raw(b + "post_attention_layernorm.weight")).astype(
                jnp.float32
            )
            + 1.0
        ).astype(dtype)
        p["post_ffn_norm"] = (
            jnp.asarray(raw(b + "post_feedforward_layernorm.weight")).astype(
                jnp.float32
            )
            + 1.0
        ).astype(dtype)
        return p

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        # remap for the shared llama body: its input_norm slot keeps
        # input_layernorm (+1 folded); its pre-FFN "post_norm" slot gets
        # gemma's pre_feedforward_layernorm (+1 folded).
        self._raw_get = get_tensor

        def wrapped(name):
            if (
                name.endswith("input_layernorm.weight")
                or name.endswith("model.norm.weight")
                or name.endswith("q_norm.weight")
                or name.endswith("k_norm.weight")
            ):
                return get_tensor(name) + 1.0
            if "post_attention_layernorm" in name:
                alt = name.replace(
                    "post_attention_layernorm", "pre_feedforward_layernorm"
                )
                return get_tensor(alt) + 1.0
            return get_tensor(name)

        return super().load_weights(wrapped, dtype=dtype)

    # ------------------------------------------------------------ forward
    def _attn_apply(self, lp, h, fb, k_pages, v_pages, li, safe_slots, *,
                    block_q, pages_per_block, interpret, tp_size, tp_axis,
                    lora_lp=None, lora_ids=None, lora_scale=None, **kw):
        cfg = self.config
        assert isinstance(li, int), (
            "Gemma2 needs unroll_layers (per-layer static sliding window)"
        )
        from sglang_security_tpu.layers.rotary import apply_rope

        T = h.shape[0]
        hd = cfg.head_dim
        Hq, Hkv = cfg.num_q_heads // tp_size, cfg.num_kv_heads // tp_size
        qkv = apply_linear(h, lp["qkv"])
        q, k, v = jnp.split(qkv, [Hq * hd, (Hq + Hkv) * hd], axis=-1)
        q = q.reshape(T, Hq, hd)
        k = k.reshape(T, Hkv, hd)
        v = v.reshape(T, Hkv, hd)
        if "q_norm" in lp:  # gemma3: per-head QK RMSNorm ((1+w) folded at load)
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q, k = apply_rope(q, k, fb.positions, self._layer_inv_freq(li))
        if block_q == 1 and not isinstance(k_pages, tuple):
            from sglang_security_tpu.ops.ragged_paged_attention import (
                paged_decode_attention,
            )

            attn, k_pages, v_pages = paged_decode_attention(
                q, k_pages, v_pages, fb.kv_lens, fb.page_indices,
                page_size=self.kv_page_size,
                layer=li,
                sm_scale=self._sm_scale(),
                sliding_window=self._layer_sliding(li),
                soft_cap=cfg.attn_softcap,
                interpret=interpret,
                k_new=k, v_new=v, slots=fb.slots,
            )
        else:
            k_pages, v_pages = _scatter_kv(
                k_pages, v_pages, k, v, li, safe_slots
            )
            attn = self._paged_attention(
                q, k_pages, v_pages, fb, li,
                sm_scale=self._sm_scale(),
                sliding_window=self._layer_sliding(li),
                soft_cap=cfg.attn_softcap,
                block_q=block_q,
                pages_per_block=pages_per_block,
                interpret=interpret,
            )
        o = apply_linear(attn.reshape(T, Hq * hd), lp["o"])
        if tp_axis is not None:
            o = lax.psum(o, tp_axis)
        # sandwich: post-attention norm before the residual add
        return rms_norm(o, lp["post_attn_norm"], cfg.rms_eps), k_pages, v_pages

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        out = super()._ffn_apply(lp, h, tp_size, tp_axis)
        return rms_norm(out, lp["post_ffn_norm"], self.config.rms_eps)


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma3 text (reference ``srt/models/gemma3_causal.py``): adds
    per-head QK RMSNorm (handled via cfg.qk_norm in the shared body) and
    dual RoPE — sliding-window layers use ``rope_local_base_freq`` with
    no scaling while global layers use ``rope_theta`` with the config's
    (linear, factor-8) rope_scaling."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        from sglang_security_tpu.layers.rotary import compute_inv_freq

        local_base = config.raw.get("rope_local_base_freq", 10000.0)
        self.inv_freq_local = jnp.asarray(
            compute_inv_freq(config.head_dim, local_base, None)
        )
        # default sliding pattern differs from gemma2 (5 local : 1 global)
        if (
            config.sliding_window is not None
            and "sliding_window_pattern" not in config.raw
            and "layer_types" not in config.raw
        ):
            config.raw["sliding_window_pattern"] = 6

    def _layer_inv_freq(self, li: int):
        return (
            self.inv_freq_local
            if self._layer_sliding(li) is not None
            else self.inv_freq
        )


class GemmaForCausalLM(LlamaForCausalLM):
    """Gemma 1 (reference ``srt/models/gemma.py``): plain pre-norm llama
    structure with Gemma conventions — (1+w) RMSNorm folded at load,
    sqrt(hidden) embedding scale, tanh-approximate gelu, tied
    embeddings."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        # HF gemma configs say hidden_act "gelu" but mean the tanh
        # approximation (HF GemmaMLP uses gelu_pytorch_tanh)
        if config.act_fn == "gelu":
            config.act_fn = "gelu_pytorch_tanh"
        config.tie_word_embeddings = True
        super().__init__(config, quantization, tp_size)

    def _embed_scale(self) -> float:
        return math.sqrt(self.config.hidden_size)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        def wrapped(name):
            if name.endswith("layernorm.weight") or name.endswith(
                "model.norm.weight"
            ):
                return get_tensor(name) + 1.0
            return get_tensor(name)

        return super().load_weights(wrapped, dtype=dtype)
