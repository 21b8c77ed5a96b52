"""EAGLE draft model (llama-style feature-level autoregression).

Re-creates the reference's ``srt/models/llama_eagle.py`` TPU-first: the
draft network predicts the target's next *feature* (pre-lm_head hidden
state) from the pair (embedding of the next token, current feature):

    x_p = fc([embed(t_{p+1}) ; f_p])  ->  decoder layers  ->  f_{p+1}
    logits_{p+2} = lm_head(f_{p+1})

Draft KV convention: the draft pool reuses the target's page table and
token slots — slot j (the slot of target token t_j) stores the draft KV
of pair (t_{j+1}, f_j), so the draft sequence over slots [0, n) covers
pairs for tokens t_1..t_n and draft kv_lens == target kv_lens - 1.

Param tree:
  fc: [2H, H]
  embed: [V, H] (frequently shared with the target's)
  layers: llama layer stack (layer 0 of real EAGLE checkpoints has no
          input_layernorm; we load ones)
  (logits come from the *target's* lm_head / tied embedding)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


class EagleLlamaForCausalLM(LlamaForCausalLM):
    """Draft network. ``forward_draft`` mirrors the base ``forward`` but
    takes (token_ids, features) pairs and concatenates through ``fc``."""

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        H = self.config.hidden_size
        key = jax.random.PRNGKey(seed + 7919)
        params["fc"] = (
            jax.random.normal(key, (2 * H, H), jnp.float32)
            / np.sqrt(2 * H)
        ).astype(dtype)
        return params

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """EAGLE HF checkpoints: fc.weight [H, 2H], layers.N.*, optional
        embed_tokens (else share the target's).  Missing norms (layer-0
        input_layernorm in EAGLE-1) default to ones = identity RMS scale."""

        def wrapped(name):
            try:
                return get_tensor(name)
            except KeyError:
                if name.endswith("layernorm.weight") or name.endswith(
                    "norm.weight"
                ):
                    return np.ones(self.config.hidden_size, np.float32)
                raise

        params = super().load_weights(wrapped, dtype=dtype)
        fc = None
        for name in ("fc.weight", "model.fc.weight"):
            try:
                fc = get_tensor(name)
                break
            except KeyError:
                continue
        if fc is None:
            raise KeyError("EAGLE checkpoint missing fc.weight")
        params["fc"] = jnp.asarray(fc).T.astype(dtype)
        return params

    def forward_draft(
        self,
        params,
        k_pages: jax.Array,  # draft pool [L_d, Hkv, tokens, hd]
        v_pages: jax.Array,
        features: jax.Array,  # [T, H] target features f_p
        fb,  # ForwardBatch whose token_ids are t_{p+1}
        *,
        block_q: int,
        interpret: Optional[bool] = None,
        tp_size: int = 1,
        tp_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (selected features [S, H], k_pages, v_pages)."""
        cfg = self.config
        T = fb.token_ids.shape[0]
        emb = params["embed"][fb.token_ids]  # [T, H]
        x = jnp.dot(
            jnp.concatenate([emb, features.astype(emb.dtype)], axis=-1),
            params["fc"],
            preferred_element_type=jnp.float32,
        ).astype(emb.dtype)
        num_tokens = k_pages.shape[2]
        safe_slots = jnp.where(fb.slots < 0, num_tokens, fb.slots)
        from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm

        def body(carry, xs):
            x, k_pages, v_pages = carry
            lp, li = xs
            h, resid = fused_add_rms_norm(x, None, lp["input_norm"], cfg.rms_eps)
            o, k_pages, v_pages = self._attn_apply(
                lp, h, fb, k_pages, v_pages, li, safe_slots,
                block_q=block_q, pages_per_block=8,
                interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
            )
            x = resid + o
            h, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
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
        # EAGLE's feature output feeds both the shared lm_head and the
        # next draft step; the final norm applies only before the head.
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]
        return sel, k_pages, v_pages

    def draft_logits(self, target_model, target_params, features):
        """Token logits for draft features via the *target's* head.  The
        features approximate the target's post-final-norm hidden (what
        feeds its lm_head), so no extra norm is applied."""
        return target_model.compute_logits(target_params, features)

    def draft_greedy(self, tmodel, tparams, params, features) -> jax.Array:
        """Greedy next token (EAGLE3 overrides with its own reduced-vocab
        head + d2t mapping)."""
        return jnp.argmax(
            self.draft_logits(tmodel, tparams, features), axis=-1
        ).astype(jnp.int32)

    def draft_topk(
        self, tmodel, tparams, params, features, k: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Top-k candidate tokens + logprobs for tree drafting (reference
        ``eagle_utils.py:793 select_top_k_tokens``).  Returns
        (tokens [..., k] i32 target-vocab ids, logprobs [..., k] f32)."""
        logits = self.draft_logits(tmodel, tparams, features)
        logp = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(logp, k)
        return idx.astype(jnp.int32), vals
