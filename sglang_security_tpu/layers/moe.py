"""Mixture-of-Experts FFN (capacity-based dispatch, EP-ready).

TPU-native re-design of the reference's MoE stack
(``srt/layers/moe/ep_moe/layer.py``, fused_moe triton kernels,
``sgl-kernel/csrc/moe``): instead of CUDA align/sort kernels, tokens are
routed with a GShard-style capacity dispatch — one-hot [T, E, C] einsum
into per-expert batches, a batched expert matmul over stacked expert
weights [E, H, I] (MXU-friendly: every expert's matmul is dense), and a
weighted combine.  Dropped tokens (over capacity) fall back to zero
contribution, standard for inference-time capacity 1.25-2x.

Expert parallelism: shard the leading E dim of the stacked expert
weights over the ``ep`` mesh axis inside shard_map; each shard computes
its local experts' capacity batches from the full token set and a psum
combines contributions — the all-to-all variant (token shuffling over
ICI) is the planned optimization for large T.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def topk_routing(
    logits: jax.Array,  # [T, E] router logits (f32)
    top_k: int,
    renormalize: bool = True,
    scoring: str = "softmax",  # softmax | sigmoid (deepseek-v3 style)
):
    """Returns (weights [T, k], expert_ids [T, k])."""
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    weights, ids = lax.top_k(scores, top_k)
    if renormalize:
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), 1e-9
        )
    return weights, ids


def moe_ffn(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [H, E]
    w_gate_up: jax.Array,  # [E, H, 2I] stacked expert weights
    w_down: jax.Array,  # [E, I, H]
    top_k: int,
    *,
    act=jax.nn.silu,
    capacity_factor: float = 1.5,
    renormalize: bool = True,
    scoring: str = "softmax",
    ep_axis: Optional[str] = None,
    ep_size: int = 1,
    routed_scaling: float = 1.0,
) -> jax.Array:
    T, H = x.shape
    E_local = w_gate_up.shape[0]
    E = E_local * ep_size
    logits = jnp.dot(
        x.astype(jnp.float32), router_w.astype(jnp.float32)
    )  # [T, E] (router always full-precision and replicated)
    weights, ids = topk_routing(logits, top_k, renormalize, scoring)

    # capacity per expert
    C = max(int(T * top_k / E * capacity_factor), 1)
    C = min(C, T)

    # position of each (token, k) pair within its expert's capacity batch
    onehot = jax.nn.one_hot(ids, E, dtype=jnp.int32)  # [T, k, E]
    flat = onehot.reshape(T * top_k, E)
    pos = jnp.cumsum(flat, axis=0) * flat - 1  # [T*k, E], -1 where not routed
    pos = pos.reshape(T, top_k, E)

    if ep_axis is not None:
        e0 = lax.axis_index(ep_axis) * E_local
        local_ids = ids - e0
        local_sel = (local_ids >= 0) & (local_ids < E_local)
    else:
        e0 = 0
        local_ids = ids
        local_sel = jnp.ones_like(ids, dtype=bool)

    # dispatch: [E_local, C, H]
    dispatch = jnp.zeros((E_local, C, H), x.dtype)
    # each pair's capacity position: pos[t, k, ids[t, k]]
    c_idx = jnp.take_along_axis(pos, ids[..., None], axis=2)[..., 0]
    sel = (c_idx >= 0) & (c_idx < C) & local_sel
    e_idx = jnp.where(sel, local_ids, E_local)  # OOB drops
    c_idx = jnp.where(sel, c_idx, C)
    dispatch = dispatch.at[e_idx, c_idx].add(
        jnp.where(sel[..., None], x[:, None, :], 0), mode="drop"
    )

    # expert compute: batched over E_local
    gu = jnp.einsum(
        "ech,ehi->eci", dispatch, w_gate_up,
        preferred_element_type=jnp.float32,
    )
    gate, up = jnp.split(gu, 2, axis=-1)
    inter = (act(gate) * up).astype(x.dtype)
    out_e = jnp.einsum(
        "eci,eih->ech", inter, w_down, preferred_element_type=jnp.float32
    )  # [E_local, C, H] f32

    # combine: out[t] += w[t,k] * out_e[e(t,k), c(t,k)]
    gathered = out_e[e_idx.clip(0, E_local - 1), c_idx.clip(0, C - 1)]
    gathered = jnp.where(sel[..., None], gathered, 0.0)  # [T, k, H]
    out = jnp.sum(gathered * weights[..., None], axis=1) * routed_scaling
    if ep_axis is not None:
        out = lax.psum(out, ep_axis)
    return out.astype(x.dtype)
