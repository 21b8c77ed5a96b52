"""Grok-1 (xAI): MoE decoder with sandwich norms and softcaps.

TPU-native parity with the reference's ``srt/models/grok.py``
(Grok1ForCausalLM / Grok1ModelForCausalLM): the Mixtral MoE body with
four RMS norms per layer (pre/post attention, pre/post MoE — the same
sandwich structure as Gemma2), tanh softcaps on attention logits and
router logits (default 30), an embedding multiplier, and an output
(logit) multiplier.  Checkpoint layout: ``model.layers.N.{pre_attn_norm,
post_attn_norm, pre_moe_norm, post_moe_norm}.weight``, Mixtral-style
``block_sparse_moe.gate`` + ``experts.N.{w1,w2,w3}``.
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_security_tpu.layers.norms import fused_add_rms_norm
from sglang_security_tpu.models.llama import _act
from sglang_security_tpu.models.mixtral import MixtralForCausalLM


class Grok1ForCausalLM(MixtralForCausalLM):
    renormalize = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        raw = config.raw
        self.router_softcap = raw.get("router_logit_softcapping", 30.0)
        if config.attn_softcap is None:
            # grok defaults the attention cap even when absent from
            # config.json (reference grok.py:209)
            config.attn_softcap = raw.get("attn_logit_softcapping", 30.0)
        self.embed_mult = raw.get("embedding_multiplier_scale", 1.0)
        self.output_mult = raw.get("output_multiplier_scale", 1.0)

    def _embed_scale(self) -> float:
        return float(self.embed_mult)

    def _logit_scale(self) -> float:
        return float(self.output_mult)

    # ---- four norms per layer (sandwich); canonical names:
    # input_norm=pre_attn_norm, post_attn (sandwich), post_norm=
    # pre_moe_norm, post_moe (sandwich)
    def _norm_names(self):
        return "pre_attn_norm", "pre_moe_norm"

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        b = f"model.layers.{i}."
        lp["post_attn_sand"] = t(b + "post_attn_norm.weight").astype(dtype)
        lp["post_moe_sand"] = t(b + "post_moe_norm.weight").astype(dtype)

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        H = self.config.hidden_size
        import jax

        def add_sand(lp):
            lp["post_attn_sand"] = jnp.ones((H,), dtype)
            lp["post_moe_sand"] = jnp.ones((H,), dtype)
            return lp

        if isinstance(params["layers"], list):
            params["layers"] = [add_sand(lp) for lp in params["layers"]]
        else:
            L = jax.tree.leaves(params["layers"])[0].shape[0]
            params["layers"]["post_attn_sand"] = jnp.ones((L, H), dtype)
            params["layers"]["post_moe_sand"] = jnp.ones((L, H), dtype)
        return params

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        """Sandwich residual structure (reference Grok1DecoderLayer:
        norm -> attn -> norm -> +resid; norm -> moe -> norm -> +resid)."""
        cfg = self.config
        h, resid = fused_add_rms_norm(x, None, lp["input_norm"], cfg.rms_eps)
        o, k_pages, v_pages = attn_fn(h)
        o, _ = fused_add_rms_norm(o, None, lp["post_attn_sand"], cfg.rms_eps)
        x = resid + o
        h, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
        f = ffn_fn(h)
        f, _ = fused_add_rms_norm(
            f.astype(x.dtype), None, lp["post_moe_sand"], cfg.rms_eps
        )
        x = resid + f
        return x, k_pages, v_pages

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        from sglang_security_tpu.layers.moe import moe_ffn

        cfg = self.config
        return moe_ffn(
            h,
            lp["router"],
            lp["experts_gate_up"],
            lp["experts_down"],
            top_k=cfg.num_experts_per_tok,
            act=_act(cfg.act_fn),
            renormalize=self.renormalize,
            ep_axis=tp_axis,
            ep_size=tp_size,
            log2phy=lp.get("eplb_log2phy"),
            logcnt=lp.get("eplb_logcnt"),
            stats_cb=getattr(self, "eplb_stats_cb", None),
            s_gate_up=lp.get("experts_gate_up_scale"),
            s_down=lp.get("experts_down_scale"),
            dispatch=getattr(self, "moe_dispatch", "psum"),
            capacity_factor=getattr(self, "moe_capacity_factor", None),
            router_softcap=self.router_softcap,
        )
