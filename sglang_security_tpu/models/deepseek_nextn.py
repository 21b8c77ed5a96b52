"""DeepSeek-V3 NextN / MTP speculative draft head.

TPU-native redesign of the reference's ``srt/models/deepseek_nextn.py``
(DeepseekModelNextN / DeepseekV3ForCausalLMNextN): DeepSeek-V3 ships a
multi-token-prediction module — ONE extra decoder layer (MLA + MoE)
living at checkpoint index ``num_hidden_layers`` — that predicts the
next-next token from (embedding of next token, current hidden state):

    x = eh_proj([enorm(embed(t_{p+1})) ; hnorm(f_p)])
    f_{p+1} = shared_head.norm(decoder_layer(x))
    logits  = lm_head(f_{p+1})          (head shared with the target)

Compared to EAGLE (``models/llama_eagle.py``): the two inputs are
RMS-normed *before* the 2H->H projection, the decoder layer is the
DeepSeek MLA+MoE body (inherited from ``models/deepseek_v2.py``), and
the output feature is post-norm (the reference returns
``shared_head.norm(hidden)`` and feeds the same tensor to both the head
and the next MTP step).  The EAGLE worker drives it through the same
``forward_draft`` interface — MTP is "EAGLE with the target's own
pretrained draft layer", so verification (chain, stochastic accept,
KV commit) is reused verbatim.  Tree drafting (topk > 1) is not wired:
the MLA attention path has no tree-mask branch (asserted in the
worker).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.deepseek_v2 import DeepseekV3ForCausalLM


def nextn_draft_config(target_raw: dict) -> ModelConfig:
    """1-layer draft config derived from the target's: the MTP layer is
    a routed-MoE layer (no dense-replace prefix)."""
    raw = {
        **target_raw,
        "num_hidden_layers": 1,
        "first_k_dense_replace": 0,
        "architectures": ["DeepseekV3ForCausalLMNextN"],
    }
    raw.pop("_outer", None)
    return ModelConfig.from_hf_dict(raw)


class DeepseekV3ForCausalLMNextN(DeepseekV3ForCausalLM):
    """Draft network (reference ``deepseek_nextn.py:40``).  Param tree =
    the 1-layer DeepSeek body plus ``enorm``/``hnorm``/``eh_proj`` and
    ``final_norm`` playing shared_head.norm."""

    # checkpoint index of the MTP layer (set before load_weights; the
    # real V3 checkpoint stores it at model.layers.{num_hidden_layers})
    mtp_layer_idx: Optional[int] = None

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        H = self.config.hidden_size
        key = jax.random.PRNGKey(seed + 6211)
        params["enorm"] = jnp.ones((H,), dtype)
        params["hnorm"] = jnp.ones((H,), dtype)
        params["eh_proj"] = (
            jax.random.normal(key, (2 * H, H), jnp.float32) / np.sqrt(2 * H)
        ).astype(dtype)
        return params

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """Remap the MTP module (model.layers.{L}.*) onto the 1-layer
        canonical names the base loader expects, plus the NextN-specific
        tensors (enorm/hnorm/eh_proj/shared_head.norm; embed_tokens and
        shared_head.head fall back to the target's when absent — the
        worker shares them)."""
        L = self.mtp_layer_idx
        assert L is not None, "set mtp_layer_idx before load_weights"
        base = f"model.layers.{L}."

        def remap(name):
            if name.startswith("model.layers.0."):
                return base + name[len("model.layers.0."):]
            if name == "model.embed_tokens.weight":
                return base + "embed_tokens.weight"
            if name == "model.norm.weight":
                return base + "shared_head.norm.weight"
            if name == "lm_head.weight":
                return base + "shared_head.head.weight"
            return name

        missing = set()
        H, V = self.config.hidden_size, self.config.vocab_size
        shared_shapes = {
            "model.embed_tokens.weight": (V, H),
            "lm_head.weight": (V, H),
        }

        class _Acc:
            """Remapping accessor; embed/head may be absent from the MTP
            module (shared with the target — the worker substitutes)."""

            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                try:
                    return self._t(remap(name))
                except KeyError:
                    if name in shared_shapes:
                        missing.add("embed" if "embed" in name
                                    else "lm_head")
                        return np.zeros(shared_shapes[name], np.float32)
                    raise

            def keys(self):
                return list(self._t.keys())

        acc = _Acc(get_tensor)
        params = super().load_weights(acc, dtype=dtype)
        for k in missing:
            params.pop(k, None)
        params["enorm"] = jnp.asarray(acc(base + "enorm.weight")).astype(
            dtype
        )
        params["hnorm"] = jnp.asarray(acc(base + "hnorm.weight")).astype(
            dtype
        )
        params["eh_proj"] = (
            jnp.asarray(acc(base + "eh_proj.weight")).T.astype(dtype)
        )
        return params

    # ------------------------------------------------- draft interface
    def forward_draft(
        self,
        params,
        k_pages: jax.Array,
        v_pages: jax.Array,
        features: jax.Array,  # [T, H] target hidden f_p
        fb,  # ForwardBatch whose token_ids are t_{p+1}
        *,
        block_q: int,
        interpret: Optional[bool] = None,
        tp_size: int = 1,
        tp_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        cfg = self.config
        T = fb.token_ids.shape[0]
        emb = params["embed"][fb.token_ids]  # [T, H]
        x = jnp.concatenate(
            [
                rms_norm(emb, params["enorm"], cfg.rms_eps),
                rms_norm(
                    features.astype(emb.dtype), params["hnorm"], cfg.rms_eps
                ),
            ],
            axis=-1,
        )
        x = jnp.dot(
            x, params["eh_proj"], preferred_element_type=jnp.float32
        ).astype(emb.dtype)
        from sglang_security_tpu.mem_cache.kv_pool import kv_data

        num_tokens = kv_data(k_pages).shape[2]
        safe_slots = jnp.where(fb.slots < 0, num_tokens, fb.slots)

        def body(carry, xs):
            x, k_pages, v_pages = carry
            lp, li = xs
            h, resid = fused_add_rms_norm(
                x, None, lp["input_norm"], cfg.rms_eps
            )
            o, k_pages, v_pages = self._attn_apply(
                lp, h, fb, k_pages, v_pages, li, safe_slots,
                block_q=block_q, pages_per_block=8,
                interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
            )
            x = resid + o
            h, resid = fused_add_rms_norm(
                x, None, lp["post_norm"], cfg.rms_eps
            )
            x = resid + self._ffn_apply(lp, h, tp_size, tp_axis)
            return (x, k_pages, v_pages), None

        li0 = 0
        for group in self._param_groups(params):
            if isinstance(group, list):
                for j, lp in enumerate(group):
                    (x, k_pages, v_pages), _ = body(
                        (x, k_pages, v_pages), (lp, li0 + j)
                    )
                li0 += len(group)
            else:
                n_layers = jax.tree.leaves(group)[0].shape[0]
                (x, k_pages, v_pages), _ = lax.scan(
                    body, (x, k_pages, v_pages),
                    (group, li0 + jnp.arange(n_layers)),
                )
                li0 += n_layers
        # shared_head.norm: the reference returns the POST-norm hidden
        # and feeds the same tensor to the head and the next MTP step
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]
        return sel, k_pages, v_pages

    def draft_logits(self, target_model, target_params, features):
        """Shared head: the target's lm_head over the post-norm draft
        features (reference shared_head.head == target lm_head)."""
        return target_model.compute_logits(target_params, features)

    def draft_greedy(self, tmodel, tparams, params, features) -> jax.Array:
        return jnp.argmax(
            self.draft_logits(tmodel, tparams, features), axis=-1
        ).astype(jnp.int32)

    def draft_topk(
        self, tmodel, tparams, params, features, k: int
    ) -> Tuple[jax.Array, jax.Array]:
        logits = self.draft_logits(tmodel, tparams, features)
        logp = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(logp, k)
        return idx.astype(jnp.int32), vals
