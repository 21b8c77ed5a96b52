"""EAGLE3 draft model (llama-style, single fused draft layer).

Re-creates the reference's ``srt/models/llama_eagle3.py`` TPU-first.
EAGLE3 differs from EAGLE-1 (models/llama_eagle.py) in three ways:

  1. The target captures the residual stream at THREE layers
     (``[2, L//2, L-3]``, reference ``llama.py:706``) and the draft's
     ``fc`` maps the concat [3*Ht] -> [H] (only on draft-extend; chain
     steps feed the draft's own pre-norm hidden, already [H]).
  2. The draft layer normalizes the token embedding and the hidden
     state SEPARATELY (``input_layernorm`` / ``hidden_norm``) and the
     qkv projection consumes their concat [2H]
     (reference ``llama_eagle3.py:52-88``).
  3. The draft has its OWN lm_head over a reduced ``draft_vocab_size``;
     draft token ids map back to target-vocab ids through the
     checkpoint's ``d2t`` offset table (reference ``:185-190`` +
     ``eagle_worker.py:468``: ``hot_token_id = d2t + arange``).

The draft KV convention and the worker protocol are shared with
EAGLE-1 (speculative/eagle_worker.py).

Param tree:
  embed: [V, H]        (target-vocab embedding; shared if absent)
  fc: [3*Ht, H] (+ fc_bias [H])   aux-concat adapter
  layers: one stacked layer with input_norm / hidden_norm / post_norm,
          qkv [2H, (Hq+2Hkv)*hd], o, gate_up, down
  final_norm: [H]
  lm_head: linear [H, Vd]  (tied to embed when tie_word_embeddings)
  d2t_map: [Vd] int32      draft-id -> target-id
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.linear import (
    apply_linear,
    make_linear_params,
    merge_for_tp,
)
from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


def eagle3_aux_layer_ids(num_layers: int) -> Tuple[int, int, int]:
    """Target layers whose pre-layer residual stream feeds the draft
    (reference set_eagle3_layers_to_capture, llama.py:700-706); clamped
    into range so tiny test targets work (duplicates are fine — the fc
    just sees a repeated block)."""
    ids = (2, num_layers // 2, num_layers - 3)
    return tuple(min(max(i, 0), num_layers - 1) for i in ids)


class Eagle3LlamaForCausalLM(LlamaForCausalLM):
    """Draft network; ``forward_draft`` is the EagleWorker entry point."""

    def __init__(self, config: ModelConfig, target_hidden_size: Optional[int] = None):
        super().__init__(config)
        self.target_hidden_size = int(
            target_hidden_size
            or config.raw.get("target_hidden_size")
            or config.hidden_size
        )
        self.draft_vocab_size = int(
            config.raw.get("draft_vocab_size") or config.vocab_size
        )

    # ------------------------------------------------------------- params
    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        cfg = self.config
        H, hd = cfg.hidden_size, cfg.head_dim
        Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
        Ht, Vd = self.target_hidden_size, self.draft_vocab_size
        key = jax.random.PRNGKey(seed)
        counter = [0]

        def rand(*shape, scale=None):
            scale = scale or (1.0 / np.sqrt(shape[0]))
            counter[0] += 1
            return (
                jax.random.normal(
                    jax.random.fold_in(key, counter[0]), shape, jnp.float32
                )
                * scale
            )

        def lin(k, n):
            return make_linear_params(rand(k, n), quantization=None, dtype=dtype)

        def lin_merged(k, ns):
            w, _ = merge_for_tp([rand(k, n) for n in ns], self.tp_size, None)
            return make_linear_params(w, quantization=None, dtype=dtype)

        lp = {
            "input_norm": jnp.ones((H,), dtype),
            "hidden_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
            "qkv": lin_merged(2 * H, [Hq * hd, Hkv * hd, Hkv * hd]),
            "o": lin(Hq * hd, H),
            "gate_up": lin_merged(H, [I, I]),
            "down": lin(I, H),
        }
        params = {
            "embed": rand(cfg.vocab_size, H, scale=0.02).astype(dtype),
            "final_norm": jnp.ones((H,), dtype),
            "fc": (rand(3 * Ht, H) / np.sqrt(3.0)).astype(dtype),
            "layers": self._stack_layers([lp]),
            "d2t_map": jnp.arange(Vd, dtype=jnp.int32),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = make_linear_params(
                rand(H, Vd), quantization=None, dtype=dtype
            )
        return params

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """EAGLE3 HF checkpoints store keys WITHOUT the ``model.`` prefix
        (reference load_weights prepends it, llama_eagle3.py:185-193):
        midlayer.{self_attn,mlp,input_layernorm,hidden_norm,
        post_attention_layernorm}.*, fc.weight [H, 3*Ht], norm.weight,
        embed_tokens.weight, lm_head.weight [Vd, H], d2t [Vd]."""
        from sglang_security_tpu.layers.linear import load_merged_linear

        cfg = self.config

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        def lin_merged(names, bias_names=None):
            return load_merged_linear(
                get_tensor, names, bias_names,
                quantization=None, tp_size=self.tp_size, dtype=dtype,
            )

        a, m = "midlayer.self_attn.", "midlayer.mlp."
        lp = {
            "input_norm": t("midlayer.input_layernorm.weight").astype(dtype),
            "hidden_norm": t("midlayer.hidden_norm.weight").astype(dtype),
            "post_norm": t(
                "midlayer.post_attention_layernorm.weight"
            ).astype(dtype),
            "qkv": lin_merged(
                [a + "q_proj.weight", a + "k_proj.weight", a + "v_proj.weight"]
            ),
            "o": lin_merged([a + "o_proj.weight"]),
            "gate_up": lin_merged(
                [m + "gate_proj.weight", m + "up_proj.weight"]
            ),
            "down": lin_merged([m + "down_proj.weight"]),
        }
        params = {
            "final_norm": t("norm.weight").astype(dtype),
            "fc": t("fc.weight").T.astype(dtype),
            "layers": self._stack_layers([lp]),
        }
        try:
            params["fc_bias"] = t("fc.bias").astype(dtype)
        except KeyError:
            pass
        try:
            params["embed"] = t("embed_tokens.weight").astype(dtype)
        except KeyError:
            pass  # worker substitutes the target's embedding
        Vd = self.draft_vocab_size
        if cfg.tie_word_embeddings:
            params["d2t_map"] = jnp.arange(cfg.vocab_size, dtype=jnp.int32)
        else:
            params["lm_head"] = make_linear_params(
                t("lm_head.weight").T, quantization=None, dtype=dtype
            )
            try:
                d2t = jnp.asarray(get_tensor("d2t")).astype(jnp.int32)
                params["d2t_map"] = d2t + jnp.arange(Vd, dtype=jnp.int32)
            except KeyError:
                params["d2t_map"] = jnp.arange(Vd, dtype=jnp.int32)
        return params

    # ------------------------------------------------------------ forward
    def forward_draft(
        self,
        params,
        k_pages: jax.Array,  # draft pool [1, Hkv, tokens, hd]
        v_pages: jax.Array,
        features: jax.Array,  # [T, 3*Ht] (extend) or [T, H] (chain)
        fb,  # ForwardBatch whose token_ids are the next tokens
        *,
        block_q: int,
        interpret: Optional[bool] = None,
        tp_size: int = 1,
        tp_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (selected pre-norm hidden [S, H], k_pages, v_pages).
        The pre-norm hidden is the chain carry (reference returns
        ``hidden_states_to_aux`` for draft decode, llama_eagle3.py:146)."""
        cfg = self.config
        T = fb.token_ids.shape[0]
        emb = params["embed"][fb.token_ids]  # [T, H]
        h = features.astype(emb.dtype)
        if h.shape[-1] != cfg.hidden_size:  # target aux concat -> fc
            h = jnp.dot(
                h, params["fc"], preferred_element_type=jnp.float32
            )
            if "fc_bias" in params:
                h = h + params["fc_bias"].astype(h.dtype)
            h = h.astype(emb.dtype)
        from sglang_security_tpu.mem_cache.kv_pool import kv_data

        num_tokens = kv_data(k_pages).shape[2]
        safe_slots = jnp.where(fb.slots < 0, num_tokens, fb.slots)
        lp = jax.tree.map(lambda x: x[0], params["layers"])

        # midlayer (reference llama_eagle3.py:64-91): separate norms,
        # concat into qkv, residual = post-fc hidden
        e_n = rms_norm(emb, lp["input_norm"], cfg.rms_eps)
        h_n = rms_norm(h, lp["hidden_norm"], cfg.rms_eps)
        o, k_pages, v_pages = self._attn_apply(
            lp, jnp.concatenate([e_n, h_n], axis=-1), fb,
            k_pages, v_pages, 0, safe_slots,
            block_q=block_q, pages_per_block=8,
            interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
        )
        x = h + o
        hn, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
        x = resid + self._ffn_apply(lp, hn, tp_size, tp_axis)
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]
        return sel, k_pages, v_pages

    def draft_greedy(self, tmodel, tparams, params, features) -> jax.Array:
        """Greedy next token from the draft's OWN head over the reduced
        draft vocab, mapped back to target-vocab ids via d2t."""
        cfg = self.config
        h = rms_norm(
            features.astype(jnp.float32), params["final_norm"], cfg.rms_eps
        )
        if "lm_head" in params:
            logits = apply_linear(h, params["lm_head"])
        else:  # tied: full-vocab head from the embedding
            logits = jnp.dot(
                h,
                params["embed"].astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
            )
        d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return params["d2t_map"][d]

    def draft_topk(self, tmodel, tparams, params, features, k: int):
        """Top-k over the reduced draft vocab, ids mapped via d2t
        (reference ``eagle_worker.py:468`` hot-token mapping)."""
        cfg = self.config
        h = rms_norm(
            features.astype(jnp.float32), params["final_norm"], cfg.rms_eps
        )
        if "lm_head" in params:
            logits = apply_linear(h, params["lm_head"])
        else:
            logits = jnp.dot(
                h,
                params["embed"].astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
            )
        logp = jax.nn.log_softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(logp, k)
        return params["d2t_map"][idx].astype(jnp.int32), vals
