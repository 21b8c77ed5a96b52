"""DBRX (Databricks) MoE decoder.

Capability parity with the reference's ``srt/models/dbrx.py``: the
Mixtral MoE body with DBRX's differences — bias-free LayerNorm
(``norm_1``/``norm_2``/``norm_f``), fused ``Wqkv`` with ``clip_qkv``
clamping, router ``ffn.router.layer``, experts stored as three flat
``[E*I, H]`` tensors (``w1`` gate, ``v1`` up, ``w2`` down), and DBRX
config naming (``d_model``/``n_heads``/``n_layers``/``attn_config``/
``ffn_config``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.models.mixtral import MixtralForCausalLM


class DbrxForCausalLM(MixtralForCausalLM):
    renormalize = True  # moe_normalize_expert_weights = 1 (L1)

    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        attn = raw.get("attn_config", {})
        ffn = raw.get("ffn_config", {})
        if "d_model" in raw:
            config.hidden_size = int(raw["d_model"])
        if "n_heads" in raw:
            config.num_q_heads = int(raw["n_heads"])
        if "n_layers" in raw:
            config.num_layers = int(raw["n_layers"])
        config.num_kv_heads = int(attn.get("kv_n_heads", config.num_q_heads))
        config.head_dim = config.hidden_size // config.num_q_heads
        config.rope_theta = float(attn.get("rope_theta", 10000.0))
        config.max_position = int(raw.get("max_seq_len", config.max_position))
        config.intermediate_size = int(
            ffn.get("ffn_hidden_size", config.intermediate_size)
        )
        config.moe_intermediate_size = config.intermediate_size
        config.num_experts = int(ffn.get("moe_num_experts", 0))
        config.num_experts_per_tok = int(ffn.get("moe_top_k", 1))
        config.act_fn = "silu"
        config.rms_eps = 1e-5
        config.tie_word_embeddings = False
        super().__init__(config, quantization, tp_size)
        self.clip_qkv = attn.get("clip_qkv")

    # -- bias-free LayerNorm instead of RMSNorm --------------------------
    def _ln(self, x, w):
        return layer_norm(x, w, None, self.config.rms_eps)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        o, k_pages, v_pages = attn_fn(self._ln(x, lp["input_norm"]))
        x = x + o
        x = x + ffn_fn(self._ln(x, lp["post_norm"]))
        return x, k_pages, v_pages

    def _apply_final_norm(self, x, w):
        return self._ln(x, w)

    # -- checkpoint adaptation -------------------------------------------
    def load_weights(self, get_tensor, dtype=None):
        cfg = self.config
        qd = cfg.num_q_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        sfx = {
            "input_layernorm": "norm_attn_norm.norm_1",
            "post_attention_layernorm": "norm_attn_norm.norm_2",
            "self_attn.o_proj": "norm_attn_norm.attn.out_proj",
        }

        def renamed(name: str):
            if name == "model.embed_tokens.weight":
                return get_tensor("transformer.wte.weight")
            if name == "model.norm.weight":
                return get_tensor("transformer.norm_f.weight")
            if name == "lm_head.weight":
                return get_tensor("lm_head.weight")
            _, _, i, rest = name.split(".", 3)
            stem, leaf = rest.rsplit(".", 1)
            base = f"transformer.blocks.{i}."
            if stem in ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj"):
                fused = np.asarray(
                    get_tensor(base + f"norm_attn_norm.attn.Wqkv.{leaf}")
                )
                if stem.endswith("q_proj"):
                    return fused[:qd]
                if stem.endswith("k_proj"):
                    return fused[qd : qd + kd]
                return fused[qd + kd : qd + 2 * kd]
            return get_tensor(base + f"{sfx[stem]}.{leaf}")

        self._raw_get = get_tensor
        dtype = dtype if dtype is not None else jnp.bfloat16
        try:
            return super().load_weights(renamed, dtype=dtype)
        finally:
            del self._raw_get

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        cfg = self.config
        E, I, H = cfg.num_experts, cfg.intermediate_size, cfg.hidden_size
        base = f"transformer.blocks.{i}.ffn."
        g = lambda n: jnp.asarray(self._raw_get(base + n)).astype(jnp.float32)
        p = {"router": g("router.layer.weight").T.astype(jnp.float32)}
        # experts.mlp.{w1,v1,w2} are flat [E*I, H]; per-expert usage is
        # act(x @ w1_e.T) * (x @ v1_e.T) @ w2_e (HF DbrxExpertGLU)
        w1 = g("experts.mlp.w1").reshape(E, I, H).transpose(0, 2, 1)
        v1 = g("experts.mlp.v1").reshape(E, I, H).transpose(0, 2, 1)
        down = g("experts.mlp.w2").reshape(E, I, H)
        self._pack_experts(
            p, jnp.concatenate([w1, v1], axis=2), down, dtype
        )
        return p
