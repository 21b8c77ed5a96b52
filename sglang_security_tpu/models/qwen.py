"""Qwen 1 (Alibaba, QWenLMHeadModel) decoder.

Capability parity with the reference's ``srt/models/qwen.py``: the
llama body under Qwen-1's GPT-style naming — ``transformer.h.N`` with
RMSNorm ``ln_1``/``ln_2``, fused biased ``attn.c_attn``, and an MLP
whose checkpoint ``intermediate_size`` is DOUBLE the real ffn width
(``w2`` is the gate, ``w1`` the up projection, ``c_proj`` down —
reference stacked_params_mapping ``qwen.py:290-293``).
"""

from __future__ import annotations

import numpy as np

from sglang_security_tpu.models.llama import LlamaForCausalLM

_SUFFIX_MAP = {
    "input_layernorm": "ln_1",
    "post_attention_layernorm": "ln_2",
    "self_attn.o_proj": "attn.c_proj",
    "mlp.gate_proj": "mlp.w2",
    "mlp.up_proj": "mlp.w1",
    "mlp.down_proj": "mlp.c_proj",
}


class QWenLMHeadModel(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        config.intermediate_size = int(
            raw.get("intermediate_size", 2 * config.intermediate_size)
        ) // 2
        config.rms_eps = float(raw.get("layer_norm_epsilon", 1e-6))
        config.rope_theta = float(raw.get("rotary_emb_base", 10000.0))
        config.max_position = int(
            raw.get("seq_length", config.max_position)
        )
        config.num_kv_heads = config.num_q_heads  # MHA
        config.head_dim = config.hidden_size // config.num_q_heads
        config.qkv_bias = True  # c_attn keeps bias even with no_bias
        super().__init__(config, quantization, tp_size)

    def load_weights(self, get_tensor, dtype=None):
        import jax.numpy as jnp

        cfg = self.config
        qd = cfg.num_q_heads * cfg.head_dim

        def translate(name: str) -> str:
            if name == "model.embed_tokens.weight":
                return "transformer.wte.weight"
            if name == "model.norm.weight":
                return "transformer.ln_f.weight"
            if name.startswith("model.layers."):
                _, _, i, rest = name.split(".", 3)
                stem, leaf = rest.rsplit(".", 1)
                return f"transformer.h.{i}.{_SUFFIX_MAP[stem]}.{leaf}"
            return name

        def renamed(name: str):
            parts = name.rsplit(".", 2)
            if (len(parts) == 3 and parts[2] in ("weight", "bias")
                    and parts[1] in ("q_proj", "k_proj", "v_proj")):
                _, _, i, _ = name.split(".", 3)
                fused = np.asarray(
                    get_tensor(f"transformer.h.{i}.attn.c_attn.{parts[2]}")
                )
                j = ("q_proj", "k_proj", "v_proj").index(parts[1])
                return fused[j * qd : (j + 1) * qd]
            return get_tensor(translate(name))

        return super().load_weights(
            renamed, dtype=dtype if dtype is not None else jnp.bfloat16
        )
