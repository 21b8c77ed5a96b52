"""GPT-2 and GPT-BigCode (SantaCoder/StarCoder-1) decoders.

Capability parity with the reference's ``srt/models/gpt2.py`` and
``gpt_bigcode.py``: llama body with the GPT lineage's differences —
learned absolute position embeddings (``wpe``, added post-embed; no
rotary), LayerNorm with bias, fused ``c_attn`` qkv, non-gated
``c_fc``/``c_proj`` MLP with bias, and GPT-2 config naming
(``n_embd``/``n_head``/``n_layer``).  GPT-2 checkpoints store linears
as Conv1D ([in, out]); GPT-BigCode uses standard Linear and multi-query
attention (one shared KV head).
"""

from __future__ import annotations

import numpy as np
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act


def _fix_gpt_config(config):
    raw = config.raw
    if "n_embd" in raw:
        config.hidden_size = int(raw["n_embd"])
    if "n_head" in raw:
        config.num_q_heads = int(raw["n_head"])
    if "n_layer" in raw:
        config.num_layers = int(raw["n_layer"])
    if "n_positions" in raw:
        config.max_position = int(raw["n_positions"])
    config.head_dim = config.hidden_size // config.num_q_heads
    # MHA unless the subclass opts into multi-query (GPT-BigCode)
    config.num_kv_heads = (
        1 if raw.get("multi_query") else config.num_q_heads
    )
    inner = raw.get("n_inner")
    config.intermediate_size = int(inner) if inner else 4 * config.hidden_size
    config.act_fn = raw.get("activation_function", "gelu_new")
    config.rms_eps = float(raw.get("layer_norm_epsilon", 1e-5))
    config.tie_word_embeddings = bool(raw.get("tie_word_embeddings", True))
    config.qkv_bias = True
    config.o_bias = True
    config.mlp_bias = True
    return config


class _GPTBase(LlamaForCausalLM):
    """Shared GPT-lineage body: wpe, LayerNorm, non-gated MLP, no rope."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(_fix_gpt_config(config), quantization, tp_size)
        self.ln_eps = config.rms_eps

    # no rotary: learned absolute positions only
    def _rope_qk(self, q, k, fb):
        return q, k

    def _post_embed(self, params, x, fb):
        return x + params["wpe"][fb.positions].astype(x.dtype)

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

    def _norm_names(self):
        return "ln_1", "ln_2"

    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        return {
            "c_fc": lin(cfg.hidden_size, cfg.intermediate_size, True),
            "c_proj": lin(cfg.intermediate_size, cfg.hidden_size, True),
        }

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        m = f"model.layers.{i}.mlp."
        return {
            "c_fc": lin_merged([m + "c_fc.weight"], [m + "c_fc.bias"]),
            "c_proj": lin_merged([m + "c_proj.weight"], [m + "c_proj.bias"]),
        }

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        out = apply_linear(
            _act(self.config.act_fn)(apply_linear(h, lp["c_fc"])),
            lp["c_proj"],
        )
        if tp_axis is not None:
            out = lax.psum(out, tp_axis)
        return out

    def init_dummy_params(self, seed=0, dtype=None, unique_layers=False):
        import jax.numpy as jnp

        dtype = dtype if dtype is not None else jnp.bfloat16
        params = super().init_dummy_params(seed, dtype, unique_layers)
        params["wpe"] = jnp.zeros(
            (self.config.max_position, self.config.hidden_size), dtype
        )
        return params

    # -- checkpoint adaptation ------------------------------------------
    _conv1d = False  # GPT-2 Conv1D stores [in, out]

    def _gpt_name(self, name: str) -> str:
        """HF-llama internal name -> GPT checkpoint name."""
        if name == "model.embed_tokens.weight":
            return "wte.weight"
        if name.startswith("model.norm."):
            return name.replace("model.norm", "ln_f")
        if name.startswith("model.layers."):
            _, _, i, rest = name.split(".", 3)
            rest = (
                rest.replace("self_attn.o_proj", "attn.c_proj")
                .replace("self_attn", "attn")
            )
            return f"h.{i}.{rest}"
        return name

    def _split_qkv(self, w: np.ndarray, leaf: str) -> np.ndarray:
        cfg = self.config
        qd = cfg.num_q_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        if leaf == "q_proj":
            return w[:qd]
        if leaf == "k_proj":
            return w[qd : qd + kd]
        return w[qd + kd : qd + 2 * kd]

    def load_weights(self, get_tensor, dtype=None):
        import jax.numpy as jnp

        # hub GPT-2 checkpoints may or may not carry the "transformer."
        # module prefix; probe once
        try:
            get_tensor("wte.weight")
            pre = ""
        except Exception:
            pre = "transformer."

        def fetch(name):
            w = np.asarray(get_tensor(pre + name))
            if self._conv1d and name.endswith(
                ("c_attn.weight", "c_proj.weight", "c_fc.weight")
            ):
                w = w.T  # Conv1D [in, out] -> Linear [out, in]
            return w

        def renamed(name: str):
            parts = name.rsplit(".", 2)
            if len(parts) == 3 and parts[1] in ("q_proj", "k_proj", "v_proj"):
                stem = self._gpt_name(parts[0] + ".q_proj." + parts[2])
                fused = fetch(stem.replace("attn.q_proj", "attn.c_attn"))
                return self._split_qkv(fused, parts[1])
            if name == "lm_head.weight":
                try:
                    return np.asarray(get_tensor(pre + "lm_head.weight"))
                except Exception:
                    return np.asarray(get_tensor(pre + "wte.weight"))
            return fetch(self._gpt_name(name))

        dtype = dtype if dtype is not None else jnp.bfloat16
        params = super().load_weights(renamed, dtype=dtype)
        params["wpe"] = jnp.asarray(fetch("wpe.weight")).astype(dtype)
        return params


class GPT2LMHeadModel(_GPTBase):
    _conv1d = True


class GPTBigCodeForCausalLM(_GPTBase):
    """multi_query in the config selects MQA (_fix_gpt_config)."""
