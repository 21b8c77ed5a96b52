"""Mixture-of-Experts FFN: dropless grouped-matmul dispatch, EP-ready.

TPU-native re-design of the reference's MoE stack
(``srt/layers/moe/ep_moe/layer.py:141`` grouped GEMM, fused_moe triton
kernels, ``sgl-kernel/csrc/moe``): tokens are *never dropped*.  The
(token, k) pairs are sorted by expert id (the XLA analog of the
reference's ``moe_align_kernel.cu``), the expert FFN runs as a ragged
grouped matmul over stacked expert weights via ``lax.ragged_dot`` —
which Mosaic lowers to dense MXU tiles per expert group — and a
scatter-add combines weighted contributions.  Compute scales with
T*top_k rows regardless of routing skew, exactly like the reference's
grouped GEMM (and unlike capacity-based dispatch, which either drops
tokens or wastes E*C rows).

Routing supports softmax and sigmoid scoring, DeepSeek-V3 noaux_tc
selection (e_score_correction_bias added for *selection* only; combine
weights use the un-biased scores) and group-limited top-k
(n_group/topk_group), matching HF modeling_deepseek semantics.

Expert parallelism: shard the leading E dim of the stacked expert
weights over the ``ep`` mesh axis inside shard_map; each shard sorts
the full token set by its *local* experts (remote pairs sort to the
end and are masked), computes its groups, and a psum combines
contributions over the axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def quantize_experts(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-(expert, out-channel) int8 quantization of a stacked
    expert weight [E, K, N] -> (int8 [E, K, N], scale [E, 1, N] f32).

    The TPU analog of the reference's w8a8 EPMoE expert weights
    (``srt/layers/moe/ep_moe/layer.py`` W8A8 path): int8 experts halve
    the dominant MoE HBM traffic and ``lax.ragged_dot`` on int8 operands
    rides the int8 MXU at 2x bf16 rate.  int4 checkpoint configs also
    land here (experts at int8, dense layers at int4) until a custom
    grouped int4 kernel is warranted."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # [E, 1, N]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def pack_expert_params(p: dict, gu, down, dtype, quantization) -> None:
    """Store stacked expert weights into a layer param dict; with
    quantization on, experts go to int8 + per-channel scales (see
    quantize_experts) consumed by the w8a8 grouped path."""
    if quantization in ("int4", "int8"):
        p["experts_gate_up"], p["experts_gate_up_scale"] = quantize_experts(gu)
        p["experts_down"], p["experts_down_scale"] = quantize_experts(down)
    else:
        p["experts_gate_up"] = gu.astype(dtype)
        p["experts_down"] = down.astype(dtype)


def topk_routing(
    logits: jax.Array,  # [T, E] router logits (f32)
    top_k: int,
    renormalize: bool = True,
    scoring: str = "softmax",  # softmax | sigmoid (deepseek-v3 style)
    correction_bias: Optional[jax.Array] = None,  # [E] noaux_tc selection bias
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weights [T, k] f32, expert_ids [T, k] i32).

    With ``correction_bias`` (DeepSeek-V3 ``e_score_correction_bias``),
    experts are *selected* by biased scores but *weighted* by un-biased
    scores (reference ``srt/layers/moe/topk.py`` biased_grouped_topk).
    ``n_group``/``topk_group`` restrict selection to the best groups,
    each group scored by the sum of its top-2 biased scores.
    """
    T, E = logits.shape
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    select = scores
    if correction_bias is not None:
        select = select + correction_bias.astype(jnp.float32)[None, :]
    if n_group and n_group > 1 and topk_group and topk_group < n_group:
        grouped = select.reshape(T, n_group, E // n_group)
        top2 = lax.top_k(grouped, min(2, E // n_group))[0]
        group_scores = top2.sum(axis=-1)  # [T, n_group]
        _, gidx = lax.top_k(group_scores, topk_group)
        gmask = jnp.zeros((T, n_group), bool).at[
            jnp.arange(T)[:, None], gidx
        ].set(True)
        select = jnp.where(
            jnp.repeat(gmask, E // n_group, axis=1), select, -jnp.inf
        )
    _, ids = lax.top_k(select, top_k)
    weights = jnp.take_along_axis(scores, ids, axis=-1)
    if renormalize:
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), 1e-9
        )
    return weights, ids


def grouped_ffn(
    x_sorted: jax.Array,  # [N, H] rows grouped by expert
    group_sizes: jax.Array,  # [E_local] i32
    w_gate_up: jax.Array,  # [E_local, H, 2I] bf16, or int8 (w8a8)
    w_down: jax.Array,  # [E_local, I, H]
    act,
    s_gate_up: Optional[jax.Array] = None,  # [E_local, 1, 2I] f32 (int8)
    s_down: Optional[jax.Array] = None,  # [E_local, 1, H] f32
) -> jax.Array:
    """Ragged grouped expert FFN: rows [sum(sizes[:e]), sum(sizes[:e+1]))
    go through expert e.  Rows past sum(sizes) produce garbage the caller
    masks out.

    With scales (int8 experts) both grouped matmuls run w8a8: rowwise
    dynamic int8 activation quant, int8xint8 ragged_dot on the MXU,
    scales applied per (row, expert out-channel) on the f32 result."""
    if s_gate_up is None:
        gu = lax.ragged_dot(
            x_sorted, w_gate_up, group_sizes,
            preferred_element_type=jnp.float32,
        )  # [N, 2I]
        gate, up = jnp.split(gu, 2, axis=-1)
        inter = (act(gate) * up).astype(x_sorted.dtype)
        return lax.ragged_dot(
            inter, w_down, group_sizes, preferred_element_type=jnp.float32
        )  # [N, H] f32

    from sglang_security_tpu.ops.quant_matmul import quantize_int8_rowwise

    N = x_sorted.shape[0]
    E_local = group_sizes.shape[0]
    # expert owning each sorted row (garbage rows clamp to the last
    # expert: their scale is arbitrary but the caller zero-masks them)
    row_expert = jnp.clip(
        jnp.searchsorted(
            jnp.cumsum(group_sizes), jnp.arange(N, dtype=jnp.int32),
            side="right",
        ),
        0, E_local - 1,
    )

    def w8a8(x, w_q, s_w):
        x_q, x_s = quantize_int8_rowwise(x)
        acc = lax.ragged_dot(
            x_q, w_q, group_sizes, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        return acc * x_s * s_w[row_expert, 0]

    gu = w8a8(x_sorted, w_gate_up, s_gate_up)
    gate, up = jnp.split(gu, 2, axis=-1)
    inter = act(gate) * up  # f32
    return w8a8(inter, w_down, s_down)


def moe_ffn(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [H, E]
    w_gate_up: jax.Array,  # [E, H, 2I] stacked expert weights
    w_down: jax.Array,  # [E, I, H]
    top_k: int,
    *,
    act=jax.nn.silu,
    renormalize: bool = True,
    scoring: str = "softmax",
    correction_bias: Optional[jax.Array] = None,
    n_group: Optional[int] = None,
    topk_group: Optional[int] = None,
    ep_axis: Optional[str] = None,
    ep_size: int = 1,
    routed_scaling: float = 1.0,
    capacity_factor: Optional[float] = None,  # accepted for API compat; unused (dropless)
    log2phy: Optional[jax.Array] = None,  # [E_log, R] EPLB replica map
    logcnt: Optional[jax.Array] = None,  # [E_log] replicas per logical expert
    stats_cb=None,  # host callback([E_log] i32 counts) for EPLB recording
    s_gate_up: Optional[jax.Array] = None,  # int8-expert scales (w8a8)
    s_down: Optional[jax.Array] = None,
    scale_inputs: bool = False,  # llama4: weight the expert INPUT
) -> jax.Array:
    del capacity_factor  # dispatch is always dropless now
    T, H = x.shape
    E_local = w_gate_up.shape[0]
    E = E_local * ep_size  # physical experts (== logical without EPLB)
    E_log = router_w.shape[1]
    logits = jnp.dot(
        x.astype(jnp.float32), router_w.astype(jnp.float32)
    )  # [T, E_log] (router always full-precision and replicated)
    weights, ids = topk_routing(
        logits, top_k, renormalize, scoring,
        correction_bias=correction_bias,
        n_group=n_group, topk_group=topk_group,
    )

    if stats_cb is not None:
        # EPLB expert-distribution recording: logical counts leave the
        # jitted step via an ordered host callback (the XLA-native form
        # of the reference's forward hooks, expert_distribution.py:40)
        from jax.experimental import io_callback

        io_callback(
            stats_cb, None,
            jnp.bincount(ids.reshape(-1), length=E_log).astype(jnp.int32),
            ordered=True,
        )

    if log2phy is not None:
        # remap logical -> physical replica; spread tokens over an
        # expert's replicas round-robin by token index (reference
        # expert_location_dispatch.py topk_ids_logical_to_physical)
        assert logcnt is not None
        rep = (
            jnp.arange(T * top_k, dtype=jnp.int32).reshape(T, top_k)
            % jnp.maximum(logcnt[ids], 1)
        )
        ids = jnp.take_along_axis(log2phy[ids], rep[..., None], -1)[..., 0]
        ids = ids.astype(jnp.int32)

    if ep_axis is not None:
        e0 = lax.axis_index(ep_axis) * E_local
        local_ids = ids - e0
        local_sel = (local_ids >= 0) & (local_ids < E_local)
    else:
        local_ids = ids
        local_sel = jnp.ones_like(ids, dtype=bool)

    # sort (token, k) pairs by local expert; remote/invalid pairs get the
    # sentinel E_local so they land past every real group.
    flat_ids = jnp.where(local_sel, local_ids, E_local).reshape(T * top_k)
    order = jnp.argsort(flat_ids)  # stable
    token_of = order // top_k  # [T*k] source token per sorted row
    x_sorted = x[token_of]
    group_sizes = jnp.bincount(
        flat_ids, length=E_local + 1
    )[:E_local].astype(jnp.int32)

    w_flat = jnp.where(local_sel, weights, 0.0).reshape(T * top_k)
    w_sorted = w_flat[order]
    if scale_inputs:
        # llama4 semantics (Llama4TextMoe): routed_in = h * score, expert
        # outputs summed unweighted; the zero weight of invalid/garbage
        # rows doubles as the output mask
        x_sorted = x_sorted * w_sorted[:, None].astype(x_sorted.dtype)

    out_sorted = grouped_ffn(
        x_sorted, group_sizes, w_gate_up, w_down, act,
        s_gate_up=s_gate_up, s_down=s_down,
    )  # [T*k, H] f32 (rows past sum(group_sizes) = garbage)

    if scale_inputs:
        contrib = out_sorted * (w_sorted != 0.0)[:, None]
    else:
        contrib = out_sorted * w_sorted[:, None]
    out = (
        jnp.zeros((T, H), jnp.float32).at[token_of].add(contrib)
        * routed_scaling
    )
    if ep_axis is not None:
        out = lax.psum(out, ep_axis)
    return out.astype(x.dtype)
