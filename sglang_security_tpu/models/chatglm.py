"""ChatGLM 2/3 and GLM-4 (legacy "THUDM/chatglm" format) decoder.

Capability parity with the reference's ``srt/models/chatglm.py``: the
llama body under the ChatGLM checkpoint layout —
``transformer.encoder.layers.N`` with fused MQA
``self_attention.query_key_value`` (qkv bias only), half-width
*interleaved* rotary on ``kv_channels`` heads (converted to the
half-split layout at load like models/glm4.py), fused
``mlp.dense_h_to_4h`` (gate first), and GLM config keys
(``num_layers``/``ffn_hidden_size``/``multi_query_group_num``/
``padded_vocab_size``/``rope_ratio``).
"""

from __future__ import annotations

import numpy as np

from sglang_security_tpu.models.glm4 import deinterleave_rotary_rows
from sglang_security_tpu.models.llama import LlamaForCausalLM


class ChatGLMForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        if "num_layers" in raw:
            config.num_layers = int(raw["num_layers"])
        config.intermediate_size = int(
            raw.get("ffn_hidden_size", config.intermediate_size)
        )
        nq = int(raw.get("num_attention_heads", config.num_q_heads))
        config.num_q_heads = nq
        if raw.get("multi_query_attention"):
            config.num_kv_heads = int(raw["multi_query_group_num"])
        else:
            config.num_kv_heads = nq
        config.head_dim = int(
            raw.get("kv_channels", config.hidden_size // nq)
        )
        config.rms_eps = float(raw.get("layernorm_epsilon", 1e-5))
        if "padded_vocab_size" in raw:
            config.vocab_size = int(raw["padded_vocab_size"])
        config.max_position = int(raw.get("seq_length", config.max_position))
        config.rope_theta = 10000.0 * float(raw.get("rope_ratio", 1.0))
        config.qkv_bias = bool(
            raw.get("add_qkv_bias", raw.get("add_bias_linear", False))
        )
        config.o_bias = bool(raw.get("add_bias_linear", False))
        config.tie_word_embeddings = False
        super().__init__(config, quantization, tp_size)
        assert not raw.get("apply_residual_connection_post_layernorm"), (
            "ChatGLM post-layernorm residual variant not supported"
        )
        # half-width interleaved rotary (reference chatglm.py:103-108,
        # rotary_dim = head_dim // 2, is_neox_style=False)
        from sglang_security_tpu.layers.rotary import compute_inv_freq
        import jax.numpy as jnp

        self.rotary_dim = config.head_dim // 2
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.rotary_dim, config.rope_theta, config.rope_scaling
            )
        )

    def load_weights(self, get_tensor, dtype=None):
        import jax.numpy as jnp

        cfg = self.config
        qd = cfg.num_q_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        sfx = {
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
            "self_attn.o_proj": "self_attention.dense",
            "mlp.down_proj": "mlp.dense_4h_to_h",
        }

        def renamed(name: str):
            if name == "model.embed_tokens.weight":
                return get_tensor("transformer.embedding.word_embeddings.weight")
            if name == "model.norm.weight":
                return get_tensor("transformer.encoder.final_layernorm.weight")
            if name == "lm_head.weight":
                return get_tensor("transformer.output_layer.weight")
            _, _, i, rest = name.split(".", 3)
            stem, leaf = rest.rsplit(".", 1)
            base = f"transformer.encoder.layers.{i}."
            if stem in ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj"):
                fused = np.asarray(
                    get_tensor(base + f"self_attention.query_key_value.{leaf}")
                )
                if stem.endswith("q_proj"):
                    w, heads = fused[:qd], cfg.num_q_heads
                elif stem.endswith("k_proj"):
                    w, heads = fused[qd : qd + kd], cfg.num_kv_heads
                else:
                    return fused[qd + kd : qd + 2 * kd]
                return deinterleave_rotary_rows(
                    w, heads, cfg.head_dim, self.rotary_dim
                )
            if stem in ("mlp.gate_proj", "mlp.up_proj"):
                # dense_h_to_4h is pre-fused [2I, H], gate first
                fused = np.asarray(
                    get_tensor(base + f"mlp.dense_h_to_4h.{leaf}")
                )
                half = fused.shape[0] // 2
                return (
                    fused[:half] if stem.endswith("gate_proj")
                    else fused[half:]
                )
            return get_tensor(base + f"{sfx[stem]}.{leaf}")

        dtype = dtype if dtype is not None else jnp.bfloat16
        return super().load_weights(renamed, dtype=dtype)
