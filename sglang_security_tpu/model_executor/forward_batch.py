"""Fixed-shape device batch descriptor.

The TPU analog of the reference's ``ForwardBatch``
(``srt/model_executor/forward_batch_info.py:139``): everything the jitted
step needs, as a pytree of static-shape arrays.  One structure serves
both EXTEND (prefill, block_q=128) and DECODE (block_q=1) — the mode is
the static ``block_q`` of the compiled step, not a runtime enum, because
under XLA the two modes are separate compiled programs anyway (this plays
the role CUDA-graph capture plays in the reference).

Shapes are bucketed by the runner: T (padded total tokens), S (padded
sequence slots), PPS (padded pages per sequence).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ForwardBatch(NamedTuple):
    token_ids: jax.Array  # [T] i32 new tokens (0-padded)
    positions: jax.Array  # [T] i32 absolute positions
    slots: jax.Array  # [T] i32 global KV slot (page*page_size+off), -1 pad
    q_starts: jax.Array  # [S] i32 aligned row of each seq's first token
    q_lens: jax.Array  # [S] i32 (0 for padded seq slots)
    kv_lens: jax.Array  # [S] i32 total kv length incl. new tokens
    page_indices: jax.Array  # [S, PPS] i32 (0-padded -> null page)
    out_rows: jax.Array  # [S] i32 row of each seq's last token (0 for pad)
    lora_ids: Optional[jax.Array] = None  # [T] i32 adapter slot (-1 = none)
    # multimodal: precomputed vision features and the token-row mapping
    # (-1 = text token). The model replaces the embed-lookup of row t
    # with mm_embeds[mm_rows[t]] where mm_rows[t] >= 0.
    mm_embeds: Optional[jax.Array] = None  # [M, H]
    mm_rows: Optional[jax.Array] = None  # [T] i32
    # M-RoPE (Qwen2-VL): 3D (t, h, w) positions for prefill rows. Decode
    # needs no 3D form — all components are equal there, so the host adds
    # the request's mrope delta to the 1D positions instead.
    mrope_positions: Optional[jax.Array] = None  # [3, T] i32
    # EAGLE tree mode (speculative top-k tree draft/verify): arrays-only
    # dict switching attention to prefix(paged, non-causal) ⊕ tree(dense
    # masked) with softmax-state merge (ops/tree_attention.py).  Keys:
    #   mask [S, R, *] bool — dense-block attention mask per sequence
    #   prefix_kv_lens [S] i32 — committed prefix length (paged part)
    # draft-tree mode additionally passes the draft pool for the prefix
    # part while k_pages/v_pages thread the [L, S, W, Hkv, hd] tree KV
    # carry:  k_pool / v_pool.
    tree: Optional[dict] = None
    # speculative verify: parent logits-row of each sampling row (-1 =
    # root / padding).  Drives stochastic accept: the draft token fed at
    # row r is evaluated under row spec_parents[r]'s distribution.
    spec_parents: Optional[jax.Array] = None  # [R] i32
    # cross-attention VLMs (mllama): the per-request vision KV pool in
    # paged layout + this batch's view of it.  Keys:
    #   k_pages / v_pages  [C, Hkv, tokens, hd]  (read-only pool)
    #   page_indices [S, PPSc] i32   kv_lens [S] i32 (1 = null page)
    #   has_tok [T] i32 — 1 where the row's request has an image
    cross: Optional[dict] = None

    @property
    def num_tokens(self) -> int:
        return self.token_ids.shape[0]

    @property
    def num_seqs(self) -> int:
        return self.q_lens.shape[0]


def make_decode_batch(
    token_ids: np.ndarray,  # [B]
    positions: np.ndarray,  # [B] (= kv_len - 1)
    slots: np.ndarray,  # [B]
    kv_lens: np.ndarray,  # [B]
    page_indices: np.ndarray,  # [B, PPS]
) -> ForwardBatch:
    B = len(token_ids)
    return ForwardBatch(
        token_ids=jnp.asarray(token_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        slots=jnp.asarray(slots, jnp.int32),
        q_starts=jnp.arange(B, dtype=jnp.int32),
        q_lens=jnp.asarray(np.asarray(kv_lens) > 0, jnp.int32),
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        page_indices=jnp.asarray(page_indices, jnp.int32),
        out_rows=jnp.arange(B, dtype=jnp.int32),
    )
