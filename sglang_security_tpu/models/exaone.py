"""EXAONE 3 (LG AI) decoder.

Capability parity with the reference's ``srt/models/exaone.py``: the
llama body exactly, under EXAONE's GPT-style checkpoint naming
(``transformer.h.N.attn.attention.*``, ``mlp.c_fc_0/c_fc_1/c_proj``)
and config keys (``num_layers``, ``layer_norm_epsilon``,
``activation_function``).  Loading wraps the tensor accessor with a
name translation and reuses the parent loader.
"""

from __future__ import annotations

from sglang_security_tpu.models.llama import LlamaForCausalLM

_SUFFIX_MAP = {
    "input_layernorm": "ln_1",
    "post_attention_layernorm": "ln_2",
    "self_attn.q_proj": "attn.attention.q_proj",
    "self_attn.k_proj": "attn.attention.k_proj",
    "self_attn.v_proj": "attn.attention.v_proj",
    "self_attn.o_proj": "attn.attention.out_proj",
    "mlp.gate_proj": "mlp.c_fc_0",
    "mlp.up_proj": "mlp.c_fc_1",
    "mlp.down_proj": "mlp.c_proj",
}


def _translate(name: str) -> str:
    if name == "model.embed_tokens.weight":
        return "transformer.wte.weight"
    if name == "model.norm.weight":
        return "transformer.ln_f.weight"
    if name.startswith("model.layers."):
        _, _, i, rest = name.split(".", 3)
        stem, leaf = rest.rsplit(".", 1)
        return f"transformer.h.{i}.{_SUFFIX_MAP[stem]}.{leaf}"
    return name  # lm_head.weight


class ExaoneForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        raw = config.raw
        if "num_layers" in raw and "num_hidden_layers" not in raw:
            config.num_layers = int(raw["num_layers"])
        if "layer_norm_epsilon" in raw:
            config.rms_eps = float(raw["layer_norm_epsilon"])
        if "activation_function" in raw:
            config.act_fn = raw["activation_function"]
        super().__init__(config, quantization, tp_size)

    def load_weights(self, get_tensor, dtype=None):
        import jax.numpy as jnp

        renamed = lambda name: get_tensor(_translate(name))
        return super().load_weights(
            renamed, dtype=dtype if dtype is not None else jnp.bfloat16
        )
