"""Dense tree attention + softmax-state merging for EAGLE tree verify.

The reference implements tree verification with CUDA tree-mask kernels
(``sgl-kernel/csrc/speculative/eagle_utils.cu`` tree-mask build,
``build_eagle_tree.py``) applied inside its attention backends.  The
TPU-native design splits verify attention into two parts and merges the
softmax states:

  * prefix part: the unified ragged paged kernel in non-causal mode
    (every tree row attends the full committed prefix ``[0, n-1)``),
    with ``return_lse=True``;
  * tree part: a tiny dense masked self-attention among the R tree rows
    of each sequence — their K/V are *this step's own projections*, so
    no pool reads, no paging, pure MXU einsums that XLA fuses.

This keeps the production paged kernel untouched on the hot path and
makes the tree block O(S·R²·hd) — negligible for R ≤ 32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def tree_self_attention(
    q: jax.Array,  # [S, R, Hq, hd]
    k: jax.Array,  # [S, R, Hkv, hd]
    v: jax.Array,  # [S, R, Hkv, hd]
    mask: jax.Array,  # [S, R, R] bool: row r attends col c (ancestors+self)
    *,
    sm_scale: float,
    soft_cap: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Masked dense attention among tree rows.

    Returns (out [S, R, Hq, hd] f32 — softmax-normalized within the tree
    block, rows with empty masks produce 0 — and lse [S, R, Hq] f32,
    -inf where the mask row is empty)."""
    S, R, Hq, hd = q.shape
    Hkv = k.shape[2]
    g = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(S, R, Hkv, g, hd)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # scores[s, h, g, r, c]
    scores = jnp.einsum("srhgd,schd->shgrc", qf, kf) * sm_scale
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)
    allow = mask[:, None, None, :, :]
    scores = jnp.where(allow, scores, MASK_VALUE)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(allow, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("shgrc,schd->srhgd", p, vf)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    out = out * jnp.moveaxis(l_inv, (1, 2, 3), (2, 3, 1))
    lse = jnp.where(
        l[..., 0] == 0.0, -jnp.inf, m[..., 0] + jnp.log(l[..., 0])
    )  # [S, Hkv, g, R]
    lse = jnp.moveaxis(lse, 3, 1).reshape(S, R, Hq)
    return out.reshape(S, R, Hq, hd), lse


def merge_attention_states(
    out_a: jax.Array,  # [..., hd] softmax-normalized partial attention
    lse_a: jax.Array,  # [...] log-sum-exp of part a
    out_b: jax.Array,
    lse_b: jax.Array,
) -> jax.Array:
    """Exact softmax merge of two normalized partial attentions (the
    reference's ``merge_attn_states.cu`` cascade merge)."""
    m = jnp.maximum(lse_a, lse_b)
    m = jnp.where(jnp.isneginf(m), 0.0, m)  # both empty: avoid nan
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return (
        out_a.astype(jnp.float32) * wa[..., None]
        + out_b.astype(jnp.float32) * wb[..., None]
    ) / denom[..., None]


def ancestor_masks_from_parents(parents: jax.Array, R: int) -> jax.Array:
    """[S, R] parent indices (-1 = root/row 0 parentless) -> [S, R, R]
    boolean attention masks (self + transitive ancestors).

    Row 0 is the committed root token; tree node j (>0) has parent
    parents[s, j] < j.  Runs in O(R) gathers — usable inside jit."""
    S = parents.shape[0]
    eye = jnp.eye(R, dtype=bool)
    masks = jnp.broadcast_to(eye, (S, R, R))

    def body(_, masks):
        # each row ORs in its parent's mask (converges in depth steps)
        p = jnp.clip(parents, 0, R - 1)
        parent_rows = jnp.take_along_axis(
            masks, p[:, :, None], axis=1
        )
        return masks | jnp.where(
            (parents >= 0)[:, :, None], parent_rows, False
        )

    return jax.lax.fori_loop(0, R, body, masks)
