"""Cohere Command-R decoder.

Capability parity with the reference's ``srt/models/commandr.py``:
llama body with Cohere's differences — bias-free mean-centered
LayerNorm, a PARALLEL residual block (attention and MLP both consume
the same normed input; one residual add), interleaved rotary
(converted at load like GLM-4), tied embeddings, and ``logit_scale``
on the lm logits.
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_security_tpu.layers.norms import layer_norm
from sglang_security_tpu.models.glm4 import deinterleave_rotary_rows
from sglang_security_tpu.models.llama import LlamaForCausalLM


class CohereForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        assert not config.raw.get("use_qk_norm", False), (
            "Cohere use_qk_norm variant not supported yet"
        )
        self.ln_eps = config.raw.get("layer_norm_eps", 1e-5)
        self.logit_scale = float(config.raw.get("logit_scale", 1.0))
        self.rotary_dim = config.head_dim  # full, but interleaved in ckpt

    def _logit_scale(self) -> float:
        return self.logit_scale

    def _wrap_get_tensor(self, get_tensor):
        cfg = self.config

        def wrapped(name):
            w = get_tensor(name)
            import numpy as np

            for proj, heads in (("q_proj", cfg.num_q_heads),
                                ("k_proj", cfg.num_kv_heads)):
                if name.endswith(f"{proj}.weight") or name.endswith(
                    f"{proj}.bias"
                ):
                    return deinterleave_rotary_rows(
                        np.asarray(w), heads, cfg.head_dim, cfg.head_dim
                    )
            return w

        return wrapped

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        return super().load_weights(self._wrap_get_tensor(get_tensor), dtype)

    def _norm_names(self):
        # single pre-norm; post_norm slot is never read (parallel block)
        return "input_layernorm", "input_layernorm"

    def _ln(self, x, p):
        return layer_norm(x, p, None, self.ln_eps)

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        """Parallel block: x + attn(ln(x)) + mlp(ln(x))
        (HF CohereDecoderLayer)."""
        h = self._ln(x, lp["input_norm"])
        o, k_pages, v_pages = attn_fn(h)
        x = x + o + ffn_fn(h)
        return x, k_pages, v_pages

    def _apply_final_norm(self, x, w):
        return self._ln(x, w)
