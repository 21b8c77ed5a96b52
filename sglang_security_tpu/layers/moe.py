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

Expert parallelism, two dispatch modes over the ``ep`` mesh axis
inside shard_map:

  dispatch="psum"  each shard sees the full (replicated) token set,
                   sorts by its *local* experts (remote pairs sort to
                   the end and are masked), computes its groups, and a
                   psum combines contributions.  Dropless; compute per
                   shard scales with T*k regardless of ep — right for
                   small ep where the sort/gather is cheap.

  dispatch="a2a"   the DeepEP analog (reference
                   ``srt/layers/moe/token_dispatcher.py:38-51``,
                   ``ep_moe/layer.py:868``) re-designed on XLA
                   collectives: tokens shard over the ep axis, each
                   shard routes its T/ep tokens and exchanges (x, local
                   expert id) rows with the owning shards via
                   ``lax.ragged_all_to_all`` (actual sizes ride the
                   ICI; dense capacity-padded ``lax.all_to_all`` off
                   TPU, where XLA:CPU lacks the ragged op), computes
                   the grouped FFN on ~cap*T*k/ep received rows, sends
                   results back with the reverse exchange, and combines
                   on the owning token shard; one all-gather
                   re-replicates the layer output.  Per-shard compute
                   AND sort length scale with 1/ep — the large-EP
                   regime.  Capacity-bounded: rows beyond
                   ``capacity_factor`` x the balanced load are dropped
                   (EPLB keeps loads balanced, making that pathological
                   skew only), unlike the dropless psum path.
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


def _a2a_exchange_dense(
    x_send: jax.Array,  # [N, H] rows sorted by destination shard
    e_send: jax.Array,  # [N] local-expert id on the destination
    send_sizes: jax.Array,  # [D] i32
    in_off: jax.Array,  # [D] i32 exclusive cumsum of send_sizes
    D: int,
    C: int,  # per-(src, dst) capacity (static)
    ep_axis,
):
    """Capacity-padded dense exchange: one [C, H] block per (src, dst)
    pair through ``lax.all_to_all``.  Works on every XLA backend; the
    TPU serving path uses the ragged variant (actual sizes on the wire).
    Returns (recv_x [D*C, H], recv_e [D*C], send_back) where
    ``send_back(computed [D*C, H]) -> [N, H]`` routes results back to
    the caller's sorted row order (dropped rows come back as zeros)."""
    N, H = x_send.shape
    j = jnp.arange(C, dtype=jnp.int32)
    src_row = jnp.clip(in_off[:, None] + j[None, :], 0, max(N - 1, 0))
    ok = j[None, :] < send_sizes[:, None]  # [D, C] rows that fit
    blk_x = jnp.where(ok[..., None], x_send[src_row], 0)
    blk_e = jnp.where(ok, e_send[src_row], -1)  # -1 = invalid sentinel
    recv_x = lax.all_to_all(blk_x, ep_axis, 0, 0, tiled=True).reshape(
        D * C, H
    )
    recv_e = lax.all_to_all(
        blk_e[..., None], ep_axis, 0, 0, tiled=True
    ).reshape(D * C)

    def send_back(computed: jax.Array) -> jax.Array:
        back = lax.all_to_all(
            computed.reshape(D, C, H), ep_axis, 0, 0, tiled=True
        ).reshape(D * C, H)
        # sorted row i went to (d, j): dropped rows (j >= C) -> 0
        row_d = jnp.searchsorted(
            jnp.cumsum(send_sizes), jnp.arange(N, dtype=jnp.int32),
            side="right",
        )
        row_d = jnp.clip(row_d, 0, D - 1)
        row_j = jnp.arange(N, dtype=jnp.int32) - in_off[row_d]
        val = back[jnp.clip(row_d * C + row_j, 0, D * C - 1)]
        return jnp.where((row_j < C)[:, None], val, 0)

    return recv_x, recv_e, send_back


def _a2a_exchange_ragged(
    x_send: jax.Array,  # [N, H]
    e_send: jax.Array,  # [N]
    send_sizes: jax.Array,  # [D]
    in_off: jax.Array,  # [D]
    D: int,
    C: int,  # receiver buffer is D*C rows
    ep_axis,
):
    """``lax.ragged_all_to_all`` exchange (TPU): only the actual row
    counts travel.  Senders clamp against the shared receiver capacity
    D*C deterministically (every shard sees the same all-gathered counts
    matrix), so overflow drops the latest sources' tails — mirroring the
    dense path's bounded buffers."""
    N, H = x_send.shape
    CAP = D * C
    me = lax.axis_index(ep_axis)
    counts = lax.all_gather(send_sizes, ep_axis, tiled=False)  # [D(src), D(dst)]
    # receiver-capacity clamping: chunk from src s to dst d starts at
    # sum(counts[:s, d]); keep only what fits in CAP
    start = jnp.concatenate(
        [jnp.zeros((1, D), jnp.int32), jnp.cumsum(counts, axis=0)[:-1]]
    )  # [D(src), D(dst)]
    kept = jnp.clip(CAP - start, 0, counts)  # [src, dst] rows that fit
    send_k = kept[me]  # my clamped send sizes [D]
    recv_k = kept[:, me]  # my clamped recv sizes [D]
    out_off = start[me]  # where my chunks land on each dst
    recv_in_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(recv_k)[:-1]]
    )
    x_buf = jnp.zeros((CAP, H), x_send.dtype)
    e_buf = jnp.full((CAP,), -1, e_send.dtype)
    recv_x = lax.ragged_all_to_all(
        x_send, x_buf, in_off, send_k, out_off, recv_k, axis_name=ep_axis
    )
    recv_e = lax.ragged_all_to_all(
        e_send, e_buf, in_off, send_k, out_off, recv_k, axis_name=ep_axis
    )

    def send_back(computed: jax.Array) -> jax.Array:
        # reverse roles: my received chunks return to their sources,
        # landing at the source's original input offsets (clamped rows
        # at the tail of a chunk simply never arrive -> stay zero)
        src_in_off = jnp.concatenate(
            [jnp.zeros((D, 1), jnp.int32), jnp.cumsum(kept, axis=1)[:, :-1]],
            axis=1,
        )  # src_in_off[s, d] = s's in_off of its (clamped) chunk to d
        back_buf = jnp.zeros((N, H), computed.dtype)
        return lax.ragged_all_to_all(
            computed, back_buf, recv_in_off, recv_k,
            src_in_off[:, me], send_k, axis_name=ep_axis,
        )

    return recv_x, recv_e, send_back


def _moe_a2a(
    x, router_w, w_gate_up, w_down, top_k, *, act, renormalize, scoring,
    correction_bias, n_group, topk_group, ep_axis, ep_size, routed_scaling,
    capacity_factor, log2phy, logcnt, stats_cb, s_gate_up, s_down,
    scale_inputs, a2a_impl, router_softcap=None,
):
    """Token-sharded MoE with all-to-all dispatch (see module docstring)."""
    T, H = x.shape
    E_local = w_gate_up.shape[0]
    D = ep_size
    T_pad = -(-T // D) * D
    if T_pad != T:
        x = jnp.pad(x, ((0, T_pad - T), (0, 0)))
    T_loc = T_pad // D
    me = lax.axis_index(ep_axis)
    x_loc = lax.dynamic_slice_in_dim(x, me * T_loc, T_loc, 0)

    logits = jnp.dot(
        x_loc.astype(jnp.float32), router_w.astype(jnp.float32)
    )  # [T_loc, E_log]
    if router_softcap:
        logits = router_softcap * jnp.tanh(logits / router_softcap)
    E_log = router_w.shape[1]
    weights, ids = topk_routing(
        logits, top_k, renormalize, scoring,
        correction_bias=correction_bias,
        n_group=n_group, topk_group=topk_group,
    )

    if stats_cb is not None:
        from jax.experimental import io_callback

        counts = lax.psum(
            jnp.bincount(ids.reshape(-1), length=E_log).astype(jnp.int32),
            ep_axis,
        )  # identical on every shard, matching the psum path's callback
        io_callback(stats_cb, None, counts, ordered=True)

    if log2phy is not None:
        assert logcnt is not None
        base = me * (T_loc * top_k)
        rep = (
            (base + jnp.arange(T_loc * top_k, dtype=jnp.int32)).reshape(
                T_loc, top_k
            )
            % jnp.maximum(logcnt[ids], 1)
        )
        ids = jnp.take_along_axis(log2phy[ids], rep[..., None], -1)[..., 0]
        ids = ids.astype(jnp.int32)

    N = T_loc * top_k
    flat_ids = ids.reshape(N)
    owner = flat_ids // E_local  # destination shard per (token, k) pair
    order = jnp.argsort(owner)  # stable
    token_of = order // top_k
    x_send = x_loc[token_of]
    w_flat = weights.reshape(N)[order].astype(jnp.float32)
    if scale_inputs:
        x_send = x_send * w_flat[:, None].astype(x_send.dtype)
    e_send = (flat_ids - owner * E_local)[order].astype(jnp.int32)
    send_sizes = jnp.bincount(owner, length=D).astype(jnp.int32)
    in_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(send_sizes)[:-1]]
    )

    cap = capacity_factor if capacity_factor else 2.0
    import math

    C = min(N, max(1, math.ceil(cap * N / D)))  # per-(src, dst) rows (static)
    exchange = (
        _a2a_exchange_ragged if a2a_impl == "ragged" else _a2a_exchange_dense
    )
    recv_x, recv_e, send_back = exchange(
        x_send, e_send, send_sizes, in_off, D, C, ep_axis
    )

    # local grouped FFN over received rows: invalid rows (-1) sort last
    M = recv_x.shape[0]
    recv_e = jnp.where(recv_e < 0, E_local, recv_e)
    order2 = jnp.argsort(recv_e)
    x2 = recv_x[order2]
    group_sizes = jnp.bincount(
        recv_e, length=E_local + 1
    )[:E_local].astype(jnp.int32)
    out2 = grouped_ffn(
        x2, group_sizes, w_gate_up, w_down, act,
        s_gate_up=s_gate_up, s_down=s_down,
    )  # [M, H] f32
    valid2 = (recv_e[order2] < E_local)[:, None]
    out2 = jnp.where(valid2, out2, 0).astype(x.dtype)
    inv2 = jnp.zeros_like(order2).at[order2].set(
        jnp.arange(M, dtype=order2.dtype)
    )
    computed = out2[inv2]  # back to arrival order

    back = send_back(computed).astype(jnp.float32)  # [N, H] sorted order
    if scale_inputs:
        contrib = back * (w_flat != 0.0)[:, None]
    else:
        contrib = back * w_flat[:, None]
    out_loc = (
        jnp.zeros((T_loc, H), jnp.float32).at[token_of].add(contrib)
        * routed_scaling
    )
    out = lax.all_gather(out_loc, ep_axis, tiled=True)  # [T_pad, H]
    return out[:T].astype(x.dtype)


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
    dispatch: str = "psum",  # psum (dropless, replicated tokens) | a2a
    a2a_impl: str = "auto",  # ragged (TPU) | dense | auto by backend
    router_softcap: Optional[float] = None,  # grok: tanh cap on logits
) -> jax.Array:
    if dispatch == "a2a" and ep_axis is not None and ep_size > 1:
        if a2a_impl == "auto":
            a2a_impl = (
                "ragged" if jax.default_backend() == "tpu" else "dense"
            )
        return _moe_a2a(
            x, router_w, w_gate_up, w_down, top_k, act=act,
            renormalize=renormalize, scoring=scoring,
            correction_bias=correction_bias, n_group=n_group,
            topk_group=topk_group, ep_axis=ep_axis, ep_size=ep_size,
            routed_scaling=routed_scaling, capacity_factor=capacity_factor,
            log2phy=log2phy, logcnt=logcnt, stats_cb=stats_cb,
            s_gate_up=s_gate_up, s_down=s_down, scale_inputs=scale_inputs,
            a2a_impl=a2a_impl, router_softcap=router_softcap,
        )
    del capacity_factor  # psum dispatch is dropless
    T, H = x.shape
    E_local = w_gate_up.shape[0]
    E = E_local * ep_size  # physical experts (== logical without EPLB)
    E_log = router_w.shape[1]
    logits = jnp.dot(
        x.astype(jnp.float32), router_w.astype(jnp.float32)
    )  # [T, E_log] (router always full-precision and replicated)
    if router_softcap:
        # grok-1 router_logit_softcapping (reference grok.py:104):
        # cap * tanh(logits / cap) before top-k
        logits = router_softcap * jnp.tanh(logits / router_softcap)
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
