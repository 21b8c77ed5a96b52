"""Llama 4 (Scout/Maverick) text decoder.

Capability parity with the reference's ``srt/models/llama4.py`` /
``mllama4.py`` text stack: interleaved rope/NoPE layers
(``no_rope_layers``), L2 (weightless RMS) QK norm after rope,
attention temperature tuning on NoPE layers
(``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1`` scaling the
queries), llama3 rope scaling, and the Llama4 MoE: top-k selection on
raw router logits, sigmoid scores scaling the expert INPUT
(``moe_ffn(scale_inputs=True)``), an always-on shared expert, and
dense layers (``intermediate_size_mlp``) interleaved with MoE layers
(``moe_layers`` / ``interleave_moe_layer_step``).

Llama4's checkpoint rotary is interleaved complex pairs over the full
head dim; converted to the half-split layout at load by the same row
permutation GLM-4 uses.  Chunked-local attention on rope layers equals
full causal attention up to ``attention_chunk_size`` (8192); longer
contexts are rejected at init rather than served wrong.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.moe import moe_ffn
from sglang_security_tpu.layers.rotary import apply_rope
from sglang_security_tpu.models.glm4 import deinterleave_rotary_rows
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act


class Llama4ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        if "text_config" in raw:  # ForConditionalGeneration composite
            raw = {**raw["text_config"]}
            config.raw = raw
        super().__init__(config, quantization, tp_size)
        L = config.num_layers
        interval = int(raw.get("no_rope_layer_interval", 4))
        self.no_rope_layers = raw.get("no_rope_layers") or [
            int((i + 1) % interval != 0) for i in range(L)
        ]
        step = int(raw.get("interleave_moe_layer_step", 1))
        self.moe_layers = set(
            raw.get("moe_layers")
            if raw.get("moe_layers") is not None
            else range(step - 1, L, step)
        )
        self.use_qk_norm = bool(raw.get("use_qk_norm", True))
        self.attn_temperature_tuning = bool(
            raw.get("attn_temperature_tuning", True)
        )
        self.floor_scale = float(raw.get("floor_scale", 8192.0))
        self.attn_scale = float(raw.get("attn_scale", 0.1))
        self.dense_ffn = int(
            raw.get("intermediate_size_mlp", 4 * config.hidden_size)
        )
        config.moe_intermediate_size = config.intermediate_size
        chunk = int(raw.get("attention_chunk_size", 8192))
        if config.max_position > chunk:
            # rope layers use chunked-local attention beyond this; not
            # implemented — cap instead of serving wrong attention
            config.max_position = chunk

    # ------------------------------------------------------------- params
    def _is_moe(self, i: int) -> bool:
        return self.config.num_experts > 0 and i in self.moe_layers

    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        H = cfg.hidden_size
        if not self._is_moe(i):
            I = self.dense_ffn
            return {"gate_up": lin_merged(H, [I, I], False),
                    "down": lin(I, H, False)}
        E, I = cfg.num_experts, cfg.intermediate_size
        from sglang_security_tpu.layers.moe import pack_expert_params

        p = {"router": rand(H, E).astype(jnp.float32)}
        pack_expert_params(
            p, jnp.stack([rand(H, 2 * I) for _ in range(E)]),
            jnp.stack([rand(I, H) for _ in range(E)]), dtype,
            self.quantization,
        )
        p["shared_gate_up"] = lin_merged(H, [I, I], False)
        p["shared_down"] = lin(I, H, False)
        return p

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        if self.no_rope_layers[i] == 0:
            lp["nope"] = jnp.zeros((1,), dtype)  # structural marker

    def _layer_extra_dummy(self, i, lp, dtype) -> None:
        if self.no_rope_layers[i] == 0:
            lp["nope"] = jnp.zeros((1,), dtype)

    def _stack_layers(self, layers):
        return layers  # heterogeneous: keep per-layer (unrolled) list

    def init_dummy_params(self, seed=0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        # heterogeneous (dense/MoE interleave, per-layer nope markers):
        # always build per-layer unrolled params
        del unique_layers
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=True
        )
        for i, lp in enumerate(params["layers"]):
            self._layer_extra_dummy(i, lp, dtype)
        return params

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        cfg = self.config
        m = f"model.layers.{i}.feed_forward."
        if not self._is_moe(i):
            return {
                "gate_up": lin_merged(
                    [m + "gate_proj.weight", m + "up_proj.weight"], None
                ),
                "down": lin_merged([m + "down_proj.weight"], None),
            }
        from sglang_security_tpu.layers.moe import pack_expert_params

        p = {"router": t(m + "router.weight").T.astype(jnp.float32)}
        # experts are checkpoint-fused [E, H, 2I] / [E, I, H] — already
        # our stacked layout, gate first (Llama4TextExperts)
        pack_expert_params(
            p, t(m + "experts.gate_up_proj"), t(m + "experts.down_proj"),
            dtype, self.quantization,
        )
        sp = m + "shared_expert."
        p["shared_gate_up"] = lin_merged(
            [sp + "gate_proj.weight", sp + "up_proj.weight"], None
        )
        p["shared_down"] = lin_merged([sp + "down_proj.weight"], None)
        return p

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        cfg = self.config

        def renamed(name):
            w = get_tensor(name)
            for proj, heads in (("q_proj", cfg.num_q_heads),
                                ("k_proj", cfg.num_kv_heads)):
                if name.endswith(f"self_attn.{proj}.weight"):
                    # interleaved complex-pair rotary -> half-split rows
                    return deinterleave_rotary_rows(
                        np.asarray(w), heads, cfg.head_dim, cfg.head_dim
                    )
            return w

        return super().load_weights(renamed, dtype=dtype)

    # ---------------------------------------------------------- attention
    def _rope_qk_lp(self, lp, q, k, fb):
        cfg = self.config
        if "nope" in lp:  # NoPE layer: no rotary; temperature tuning
            if self.attn_temperature_tuning:
                pos = fb.positions.astype(jnp.float32)
                scale = (
                    jnp.log1p(jnp.floor((pos + 1.0) / self.floor_scale))
                    * self.attn_scale + 1.0
                )
                q = (q * scale[:, None, None]).astype(q.dtype)
            return q, k
        q, k = apply_rope(q, k, fb.positions, self.inv_freq)
        if self.use_qk_norm:  # weightless RMS (Llama4TextL2Norm)
            eps = cfg.rms_eps

            def l2n(x):
                x32 = x.astype(jnp.float32)
                return (
                    x32 * lax.rsqrt(
                        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps
                    )
                ).astype(x.dtype)

            q, k = l2n(q), l2n(k)
        return q, k

    # --------------------------------------------------------------- FFN
    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        cfg = self.config
        if "router" not in lp:
            return super()._ffn_apply(lp, h, tp_size, tp_axis)
        out = moe_ffn(
            h,
            lp["router"],
            lp["experts_gate_up"],
            lp["experts_down"],
            top_k=cfg.num_experts_per_tok,
            act=_act(cfg.act_fn),
            renormalize=False,
            scoring="sigmoid",
            scale_inputs=True,
            ep_axis=tp_axis,
            ep_size=tp_size,
            log2phy=lp.get("eplb_log2phy"),
            logcnt=lp.get("eplb_logcnt"),
            stats_cb=getattr(self, "eplb_stats_cb", None),
            s_gate_up=lp.get("experts_gate_up_scale"),
            s_down=lp.get("experts_down_scale"),
            dispatch=getattr(self, "moe_dispatch", "psum"),
            capacity_factor=getattr(self, "moe_capacity_factor", None),
        )
        gate_up = apply_linear(h, lp["shared_gate_up"])
        g, u = jnp.split(gate_up, 2, axis=-1)
        shared = apply_linear(_act(cfg.act_fn)(g) * u, lp["shared_down"])
        if tp_axis is not None:
            shared = lax.psum(shared, tp_axis)
        return out + shared
