"""MiMo multi-token-prediction (MTP) speculative draft head.

Capability parity with the reference's ``srt/models/mimo_mtp.py``
(MiMoMultiTokenPredictorLayer / MiMoMTP): MiMo-7B ships MTP modules —
one extra Qwen2-style decoder layer per module at checkpoint prefix
``model.mtp_layers.{i}.`` — predicting token t_{p+2} from
(embedding of t_{p+1}, current hidden f_p):

    x = input_proj([hidden_layernorm(f_p) ; token_layernorm(embed(t_{p+1}))])
    f_{p+1} = final_layernorm(decoder_layer(x))
    logits  = lm_head(f_{p+1})        (head shared with the target)

Structurally this is DeepSeek NextN (``models/deepseek_nextn.py``) on
the llama/qwen2 body: both inputs are RMS-normed before the 2H->H
projection (note the reference concatenation order — hidden first,
then token: ``mimo_mtp.py:80-88``) and the output feature is post-norm.
The EAGLE worker drives it through ``forward_draft``; verification
(chain, stochastic accept, KV commit) is reused verbatim.  Chain
drafting only, like NextN.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


def mimo_mtp_draft_config(target_raw: dict) -> ModelConfig:
    """1-layer draft config derived from the target's."""
    raw = {
        **target_raw,
        "num_hidden_layers": 1,
        "architectures": ["MiMoMTP"],
    }
    raw.pop("_outer", None)
    return ModelConfig.from_hf_dict(raw)


class MiMoMTP(LlamaForCausalLM):
    """Draft network (reference ``mimo_mtp.py:120``).  Param tree = the
    1-layer qwen2/llama body plus ``token_norm``/``hidden_norm``/
    ``input_proj``; ``final_norm`` plays final_layernorm."""

    # checkpoint MTP module index (model.mtp_layers.{i}.)
    mtp_layer_idx: int = 0

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        H = self.config.hidden_size
        key = jax.random.PRNGKey(seed + 7177)
        params["token_norm"] = jnp.ones((H,), dtype)
        params["hidden_norm"] = jnp.ones((H,), dtype)
        params["input_proj"] = (
            jax.random.normal(key, (2 * H, H), jnp.float32) / np.sqrt(2 * H)
        ).astype(dtype)
        return params

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """Remap the MTP module (model.mtp_layers.{i}.*) onto the
        1-layer canonical names (reference
        ``mimo_mtp.py:190 map_model_name_to_mtp_param_name`` inverted);
        embed/lm_head fall back to the target's when absent."""
        base = f"model.mtp_layers.{self.mtp_layer_idx}."

        def remap(name):
            if name.startswith("model.layers.0."):
                return base + name[len("model.layers.0."):]
            if name == "model.norm.weight":
                return base + "final_layernorm.weight"
            return name

        missing = set()
        H, V = self.config.hidden_size, self.config.vocab_size
        shared_shapes = {
            "model.embed_tokens.weight": (V, H),
            "lm_head.weight": (V, H),
        }

        class _Acc:
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
        params["token_norm"] = jnp.asarray(
            acc(base + "token_layernorm.weight")
        ).astype(dtype)
        params["hidden_norm"] = jnp.asarray(
            acc(base + "hidden_layernorm.weight")
        ).astype(dtype)
        params["input_proj"] = jnp.asarray(
            acc(base + "input_proj.weight")
        ).T.astype(dtype)
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
        # reference order: hidden first, then token (mimo_mtp.py:80)
        x = jnp.concatenate(
            [
                rms_norm(
                    features.astype(emb.dtype), params["hidden_norm"],
                    cfg.rms_eps,
                ),
                rms_norm(emb, params["token_norm"], cfg.rms_eps),
            ],
            axis=-1,
        )
        x = jnp.dot(
            x, params["input_proj"], preferred_element_type=jnp.float32
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
        # final_layernorm: the reference feeds the post-norm hidden to
        # both the head and the next MTP step (mimo_mtp.py:96-98)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]
        return sel, k_pages, v_pages

    def draft_logits(self, target_model, target_params, features):
        """Shared head: the target's lm_head over post-norm features."""
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
