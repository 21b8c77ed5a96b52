"""Ragged paged attention: one Pallas kernel for prefill-with-prefix and decode.

Design (TPU-first, not a port — compare reference CUDA backends
``srt/layers/attention/flashinfer_backend.py`` / ``flashattention_backend.py``
and ``sgl-kernel/csrc/attention/``):

  * All KV — cached prefix *and* newly written tokens — lives in one paged
    pool, so chunked prefill, prefix-cache hits, and decode are all the same
    computation: queries attend to pages ``[0, kv_len)`` of their sequence
    with a causal mask anchored at ``kv_len - q_len``.  The reference needs a
    separate "merge attention states" cascade kernel for chunked prefix
    (``merge_attn_states.cu``); here it falls out of the unified layout.

  * Layout: ``{k,v}_pages: [num_layers, num_kv_heads, num_tokens, head_dim]``
    — *head-major*, with the token dim flat (a page is rows
    [pg*page_size, (pg+1)*page_size) of dim 2).  This serves three masters:
      - the model's KV-write scatter (`at[layer, :, slots]`; XLA scatters
        into the donated scan carry in place),
      - both kernels' page DMAs: a page fetch is one 3-D copy
        [Hkv, page_size, head_dim] whose per-head K/V slabs land
        *contiguous* in VMEM, so the per-head (and whole-head-folded)
        matmuls read [tokens, head_dim] blocks with no strided relayout,
      - TP sharding (the head dim shards over the mesh's ``tp`` axis).
    KV heads are an **in-kernel loop / folded matmul**, not a grid
    dimension, so GQA pages are never re-fetched per head.

  * "Aligned-ragged" query layout: each sequence's new tokens start at a
    ``block_q``-aligned row of the flattened token axis (the scheduler packs
    batches this way).  Decode is the same kernel with ``block_q=1``: one
    query row per sequence.  GQA query heads of one KV head fold into the
    matmul M dimension (rows token-major), so QK^T has M = block_q * q_per_kv.

  * Pages are fetched HBM->VMEM with double-buffered async DMA; the next
    (q-block, kv-block) work item is located by walking block descriptors
    in SMEM, skipping causally-masked and padded blocks, so the prefetch
    never stalls on invalid cells.

The jnp reference (`ref_ragged_paged_attention`) defines the semantics and
is what unit tests compare against (test strategy per SURVEY.md §4).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_security_tpu.utils import cdiv, use_interpret_mode

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


# ======================================================================
# jnp reference implementation (semantics oracle; CPU-runnable)
# ======================================================================


def ref_ragged_paged_attention(
    q,  # [T, num_q_heads, head_dim] (aligned-ragged rows)
    k_pages,  # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages,
    kv_lens,  # [S] total kv len per seq (prefix + new)
    page_indices,  # [S, pages_per_seq]
    q_starts,  # [S] row of each seq's first query token
    q_lens,  # [S] number of query tokens per seq
    *,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
):
    """Host-looped oracle. Rows outside any sequence are zero."""
    num_kv_heads, _, page_size, head_dim = k_pages.shape
    num_q_heads = q.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    out = jnp.zeros_like(q, dtype=jnp.float32)
    for s in range(len(kv_lens)):
        q_len = int(q_lens[s])
        if q_len == 0:
            continue
        kv_len = int(kv_lens[s])
        q_start = int(q_starts[s])
        idx = page_indices[s]
        # [Hkv, n_pages, ps, d] -> [Hkv, kv_len, d]
        k = k_pages[:, idx].reshape(num_kv_heads, -1, head_dim)[:, :kv_len]
        v = v_pages[:, idx].reshape(num_kv_heads, -1, head_dim)[:, :kv_len]
        qs = q[q_start : q_start + q_len].astype(jnp.float32)  # [q_len, Hq, d]
        qs = qs.reshape(q_len, num_kv_heads, q_per_kv, head_dim)
        s_ = jnp.einsum(
            "qhgd,hkd->hgqk", qs, k.astype(jnp.float32)
        )  # [Hkv, g, q_len, kv_len]
        s_ = s_ * sm_scale
        if soft_cap is not None:
            s_ = soft_cap * jnp.tanh(s_ / soft_cap)
        q_pos = (kv_len - q_len) + np.arange(q_len)[:, None]
        kv_pos = np.arange(kv_len)[None, :]
        allow = kv_pos <= q_pos
        if sliding_window is not None:
            allow &= kv_pos > q_pos - sliding_window
        s_ = jnp.where(allow[None, None], s_, MASK_VALUE)
        p = jax.nn.softmax(s_, axis=-1)
        o = jnp.einsum("hgqk,hkd->qhgd", p, v.astype(jnp.float32))
        o = o.reshape(q_len, num_q_heads, head_dim)
        out = out.at[q_start : q_start + q_len].set(o)
    return out.astype(q.dtype)


# ======================================================================
# Pallas kernel
# ======================================================================


def _kernel(
    # --- scalar prefetch refs ---
    qblk_seq_ref,  # [QB] i32: sequence owning each q block (-1 = padding)
    q_starts_ref,  # [S] i32
    q_lens_ref,  # [S] i32
    kv_lens_ref,  # [S] i32
    page_indices_ref,  # [S * pages_per_seq] i32 (flat, clamped to valid pages)
    layer_ref,  # [1] i32: which layer of the stacked KV pool to read
    buffer_index_ref,  # [1] i32 (mutable across grid steps)
    init_flag_ref,  # [1] i32
    # --- tensor inputs / outputs / scratch (unpacked below) ---
    *refs,
    block_q: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    num_qblks: int,
    num_kv_heads: int,
    sm_scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    quantized: bool = False,
    causal: bool = True,
    return_lse: bool = False,
):
    refs = list(refs)
    # outputs follow inputs: (..., o_ref[, lse_ref], scratch...)
    lse_ref = refs.pop(4 + (2 if quantized else 0)) if return_lse else None
    if quantized:
        (q_ref, k_pages_ref, v_pages_ref, ks_pages_ref, vs_pages_ref,
         o_ref, k_buf, v_buf, ks_buf, vs_buf, k_sems, v_sems,
         m_scr, l_scr, acc_scr) = refs
    else:
        (q_ref, k_pages_ref, v_pages_ref, o_ref, k_buf, v_buf,
         k_sems, v_sems, m_scr, l_scr, acc_scr) = refs
        ks_pages_ref = vs_pages_ref = ks_buf = vs_buf = None
    qb = pl.program_id(0)
    kb = pl.program_id(1)
    block_kv = pages_per_block * page_size
    num_q_heads = q_ref.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    rows = block_q * q_per_kv
    head_dim = q_ref.shape[-1]

    def seq_of(qblk):
        return qblk_seq_ref[qblk]

    def kv_limit(qblk):
        """Causal upper bound on kv positions for q block `qblk` (0 if pad)."""
        s = jnp.maximum(seq_of(qblk), 0)
        if causal:
            q_off = qblk * block_q - q_starts_ref[s]
            kv_start = kv_lens_ref[s] - q_lens_ref[s]
            lim = jnp.minimum(kv_lens_ref[s], kv_start + q_off + block_q)
        else:
            # non-causal (tree-verify prefix pass): every row attends the
            # full [0, kv_len) range
            lim = kv_lens_ref[s]
        return jnp.where(seq_of(qblk) < 0, 0, lim)

    def nblocks_of(qblk):
        return lax.div(kv_limit(qblk) + block_kv - 1, block_kv)

    def first_valid_qb(start_qb):
        """Smallest qb' >= start_qb with work (or num_qblks if none)."""
        return lax.while_loop(
            lambda x: jnp.logical_and(
                x < num_qblks, nblocks_of(jnp.minimum(x, num_qblks - 1)) == 0
            ),
            lambda x: x + 1,
            start_qb,
        )

    def next_work(qb_, kb_):
        """Next valid (qb, kb) strictly after the current cell."""
        return lax.cond(
            kb_ + 1 < nblocks_of(qb_),
            lambda: (qb_, kb_ + 1),
            lambda: (first_valid_qb(qb_ + 1), 0),
        )

    layer = layer_ref[0]

    def _page_copies(qb_, kb_, slot):
        s = jnp.maximum(seq_of(qb_), 0)
        base = s * pages_per_seq + kb_ * pages_per_block
        copies = []
        for p in range(pages_per_block):
            pg = page_indices_ref[base + p]
            row0 = pg * page_size
            copies.append(
                pltpu.make_async_copy(
                    k_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    k_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                    k_sems.at[slot],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    v_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    v_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                    v_sems.at[slot],
                )
            )
            if quantized:
                copies.append(
                    pltpu.make_async_copy(
                        ks_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                        ks_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                        k_sems.at[slot],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        vs_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                        vs_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                        v_sems.at[slot],
                    )
                )
        return copies

    def start_page_dmas(qb_, kb_, slot):
        for c in _page_copies(qb_, kb_, slot):
            c.start()

    def wait_page_dmas(qb_, kb_, slot):
        for c in _page_copies(qb_, kb_, slot):
            c.wait()

    limit = kv_limit(qb)

    @pl.when(kb * block_kv < limit)
    def _run():
        init = init_flag_ref[0]
        init_flag_ref[0] = 0
        slot = buffer_index_ref[0]

        @pl.when(init)
        def _prefetch_first():
            start_page_dmas(qb, kb, slot)

        @pl.when(kb == 0)
        def _reset_accumulators():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        nqb, nkb = next_work(qb, kb)

        @pl.when(nqb < num_qblks)
        def _prefetch_next():
            nslot = jnp.where(slot == 0, 1, 0)
            start_page_dmas(nqb, nkb, nslot)
            buffer_index_ref[0] = nslot

        # ---- compute on the current block ----
        s_idx = jnp.maximum(seq_of(qb), 0)
        q_off = qb * block_q - q_starts_ref[s_idx]
        kv_start = kv_lens_ref[s_idx] - q_lens_ref[s_idx]

        wait_page_dmas(qb, kb, slot)

        tok = lax.broadcasted_iota(jnp.int32, (rows, block_kv), 0) // q_per_kv
        q_pos = kv_start + q_off + tok
        kv_pos = kb * block_kv + lax.broadcasted_iota(
            jnp.int32, (rows, block_kv), 1
        )
        if causal:
            allow = kv_pos <= q_pos
            if sliding_window is not None:
                allow = jnp.logical_and(allow, kv_pos > q_pos - sliding_window)
        else:
            assert sliding_window is None
            allow = kv_pos < kv_lens_ref[s_idx]

        is_last = kb == nblocks_of(qb) - 1
        for h in range(num_kv_heads):
            # [block_q, q_per_kv, d] -> token-major rows [rows, d]
            q_h = q_ref[:, h * q_per_kv : (h + 1) * q_per_kv, :].reshape(
                rows, head_dim
            )
            if quantized:
                # dequant on the [rows, block_kv] OUTPUT, not the
                # [block_kv, d] K block: per-token scales multiply qk
                # columns (also dodges Mosaic's bf16 minor-dim-insert
                # limitation on the old k * ks[:, None] form)
                k_h = k_buf[slot, h].astype(jnp.bfloat16)
            else:
                k_h = k_buf[slot, h]  # [block_kv, d] (contiguous per head)
                if k_h.dtype == jnp.float8_e4m3fn:  # static-scale fp8 KV
                    k_h = k_h.astype(jnp.bfloat16)
            qk = lax.dot_general(
                q_h,
                k_h,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                qk *= ks_buf[slot, h].astype(jnp.float32)[None, :]
            qk *= sm_scale
            if soft_cap is not None:
                qk = soft_cap * jnp.tanh(qk / soft_cap)
            qk = jnp.where(allow, qk, MASK_VALUE)

            m_prev = m_scr[h]
            l_prev = l_scr[h]
            m_curr = jnp.max(qk, axis=-1, keepdims=True)  # [rows, 1]
            m_next = jnp.maximum(m_prev, m_curr)  # [rows, 128]
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(qk - m_next[:, 0:1])
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[h] = m_next
            l_scr[h] = l_next

            if quantized:
                # fold the per-token V scales into p's columns (the
                # contraction rows) instead of dequantizing the V block
                v_h = v_buf[slot, h].astype(jnp.bfloat16)
                p = p * vs_buf[slot, h].astype(jnp.float32)[None, :]
            else:
                v_h = v_buf[slot, h]
                if v_h.dtype == jnp.float8_e4m3fn:
                    v_h = v_h.astype(jnp.bfloat16)
            pv = lax.dot_general(
                p.astype(v_h.dtype),
                v_h,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc_scr[h] * alpha[:, 0:1] + pv
            acc_scr[h] = acc

            @pl.when(is_last)
            def _write_out():
                l = l_scr[h][:, 0:1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[:, h * q_per_kv : (h + 1) * q_per_kv, :] = (
                    (acc_scr[h] * l_inv)
                    .reshape(block_q, q_per_kv, head_dim)
                    .astype(o_ref.dtype)
                )
                if return_lse:
                    # log-sum-exp per row (for softmax-state merging with
                    # a second attention pass, e.g. the EAGLE tree block);
                    # rows with no visible kv get -inf so they drop out of
                    # the merge
                    m = m_scr[h][:, 0:1]
                    lse = jnp.where(
                        l == 0.0, -jnp.inf, m + jnp.log(l)
                    )  # [rows, 1]
                    lse_ref[:, h * q_per_kv : (h + 1) * q_per_kv] = (
                        lse.reshape(block_q, q_per_kv)
                    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size",
        "sm_scale",
        "sliding_window",
        "soft_cap",
        "block_q",
        "pages_per_block",
        "interpret",
        "causal",
        "return_lse",
    ),
)
def ragged_paged_attention(
    q,  # [T, num_q_heads, head_dim] (aligned-ragged)
    k_pages,  # [L, num_kv_heads, num_tokens, head_dim] (flat, head-major)
    v_pages,
    kv_lens,  # [S] i32
    page_indices,  # [S, pages_per_seq] i32
    q_starts,  # [S] i32, each a multiple of block_q
    q_lens,  # [S] i32
    *,
    page_size: int = 32,
    layer=0,  # layer index into the stacked pool
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    block_q: int = 128,
    pages_per_block: int = 8,
    interpret: Optional[bool] = None,
    k_scales=None,  # [L, Hkv, tokens] bf16 (quantized KV)
    v_scales=None,
    causal: bool = True,  # False: every row attends [0, kv_len)
    return_lse: bool = False,  # also return [T, Hq] f32 log-sum-exp
):
    """Unified prefill/decode attention over the paged KV pool.

    Decode uses the specialized `paged_decode_attention` kernel below
    (many sequences per grid cell, in-cell kv loop).  The head-major
    pool layout [L, Hkv, tokens, hd] is shared verbatim with the model's
    KV-write scatter, so lax.scan over layers threads one donated carry;
    q and the output stay [T, Hq, hd] (no transposes on the hot path).
    """
    T, num_q_heads, head_dim = q.shape
    _, num_kv_heads, _, pool_hd = k_pages.shape
    S, pages_per_seq = page_indices.shape
    q_per_kv = num_q_heads // num_kv_heads
    assert num_q_heads % num_kv_heads == 0
    assert T % block_q == 0, (T, block_q)
    if head_dim != pool_hd:
        # pool head dim is lane-padded (ModelConfig.kv_cache_head_dim)
        if sm_scale is None:
            sm_scale = head_dim**-0.5
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pool_hd - head_dim)))
        out = ragged_paged_attention(
            q, k_pages, v_pages, kv_lens, page_indices, q_starts, q_lens,
            page_size=page_size, layer=layer, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            block_q=block_q, pages_per_block=pages_per_block,
            interpret=interpret, k_scales=k_scales, v_scales=v_scales,
            causal=causal, return_lse=return_lse,
        )
        if return_lse:
            out, lse = out
            return out[..., :head_dim], lse
        return out[..., :head_dim]
    if pages_per_seq % pages_per_block:
        pad = pages_per_block - pages_per_seq % pages_per_block
        page_indices = jnp.pad(page_indices, ((0, 0), (0, pad)))
        pages_per_seq += pad
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if interpret is None:
        interpret = use_interpret_mode()

    num_qblks = T // block_q
    num_kvblks = pages_per_seq // pages_per_block

    # Map each q block to its owning sequence (-1 for padding rows).
    starts_blk = q_starts // block_q
    qb_iota = jnp.arange(num_qblks, dtype=jnp.int32)
    owner = jnp.searchsorted(starts_blk, qb_iota, side="right").astype(jnp.int32) - 1
    owner_c = jnp.clip(owner, 0, S - 1)
    in_range = qb_iota * block_q < q_starts[owner_c] + q_lens[owner_c]
    valid = (owner >= 0) & in_range & (q_lens[owner_c] > 0)
    qblk_seq = jnp.where(valid, owner_c, -1)

    orig_dtype = q.dtype
    if block_q * q_per_kv < 8:
        q = q.astype(jnp.float32)  # avoid sub-sublane bf16 tiles in VMEM

    rows = block_q * q_per_kv
    grid = (num_qblks, num_kvblks)

    quantized = k_scales is not None
    kernel = functools.partial(
        _kernel,
        block_q=block_q,
        pages_per_block=pages_per_block,
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        num_qblks=num_qblks,
        num_kv_heads=num_kv_heads,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        quantized=quantized,
        causal=causal,
        return_lse=return_lse,
    )

    in_specs = [
        pl.BlockSpec(
            (block_q, num_q_heads, head_dim),
            lambda qb, kb, *_: (qb, 0, 0),
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q, k_pages, v_pages]
    blk_kv = pages_per_block * page_size
    scratch = [
        pltpu.VMEM((2, num_kv_heads, blk_kv, head_dim), k_pages.dtype),
        pltpu.VMEM((2, num_kv_heads, blk_kv, head_dim), v_pages.dtype),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs += [k_scales, v_scales]
        scratch += [
            pltpu.VMEM((2, num_kv_heads, blk_kv), k_scales.dtype),
            pltpu.VMEM((2, num_kv_heads, blk_kv), v_scales.dtype),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((num_kv_heads, rows, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, rows, 128), jnp.float32),
        pltpu.VMEM((num_kv_heads, rows, head_dim), jnp.float32),
    ]
    out_specs = pl.BlockSpec(
        (block_q, num_q_heads, head_dim),
        lambda qb, kb, *_: (qb, 0, 0),
    )
    out_shape = jax.ShapeDtypeStruct((T, num_q_heads, head_dim), q.dtype)
    if return_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (block_q, num_q_heads), lambda qb, kb, *_: (qb, 0)
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((T, num_q_heads), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        qblk_seq,
        q_starts.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        kv_lens.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.zeros((1,), jnp.int32),  # buffer index
        jnp.ones((1,), jnp.int32),  # init flag
        *inputs,
    )
    if return_lse:
        out, lse = out
        return out.astype(orig_dtype), lse
    return out.astype(orig_dtype)


# ======================================================================
# Decode-specialized kernel: many sequences per grid cell
# ======================================================================
#
# Decode attention is HBM-bandwidth bound (each KV byte read once) but the
# generic kernel's cost at block_q=1 was per-grid-cell *overhead*: one cell
# per (sequence, kv-block) ~= B cells/layer at ~5us each (PERF_NOTES r1).
# This kernel amortizes that overhead: each grid cell owns `block_s`
# sequences and walks their kv blocks with an *in-cell* fori_loop,
# double-buffering the page DMAs across loop steps.  Per-sequence compute
# folds ALL query heads into one MXU matmul against the sequence's
# head-major KV block ([Hq, hd] x [hd, Hkv*blk] -> [Hq, Hkv*blk]); the
# block-diagonal (head-matched) entries are then selected with lane-block
# masks.  The Hkv-fold wastes MXU flops, but decode attention is >100x
# from compute-bound, and it turns Hkv tiny M=q_per_kv matmuls into one
# issue (MXU time is noise; issue overhead was the bottleneck).


def _decode_kernel(
    # --- scalar prefetch ---
    kv_lens_ref,  # [B] i32
    page_indices_ref,  # [B * pages_per_seq] i32 (flat)
    layer_ref,  # [1] i32
    slots_ref,  # [B] i32 (fused mode: new token's pool row; else [1] dummy)
    # --- tensor inputs / outputs / scratch (see unpacking below) ---
    *refs,
    block_s: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    num_kv_heads: int,
    sm_scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    quantized: bool = False,
    fused_write: bool = False,
):
    kn_ref = vn_ref = kp_out = vp_out = w_sems = None
    kw_scr = vw_scr = r_sems = None
    ks_out = vs_out = ksw_scr = vsw_scr = None
    if quantized and fused_write:
        (q_ref, k_pages_ref, v_pages_ref, ks_pages_ref, vs_pages_ref,
         kn_ref, vn_ref,
         o_ref, kp_out, vp_out, ks_out, vs_out,
         k_buf, v_buf, ks_buf, vs_buf, k_sems, v_sems, r_sems, w_sems,
         kw_scr, vw_scr, ksw_scr, vsw_scr,
         m_scr, l_scr, acc_scr) = refs
    elif quantized:
        (q_ref, k_pages_ref, v_pages_ref, ks_pages_ref, vs_pages_ref,
         o_ref, k_buf, v_buf, ks_buf, vs_buf, k_sems, v_sems,
         m_scr, l_scr, acc_scr) = refs
    elif fused_write:
        (q_ref, k_pages_ref, v_pages_ref, kn_ref, vn_ref,
         o_ref, kp_out, vp_out, k_buf, v_buf,
         k_sems, v_sems, r_sems, w_sems, kw_scr, vw_scr,
         m_scr, l_scr, acc_scr) = refs
        ks_pages_ref = vs_pages_ref = ks_buf = vs_buf = None
    else:
        (q_ref, k_pages_ref, v_pages_ref, o_ref, k_buf, v_buf,
         k_sems, v_sems, m_scr, l_scr, acc_scr) = refs
        ks_pages_ref = vs_pages_ref = ks_buf = vs_buf = None
    sb = pl.program_id(0)
    blk = pages_per_block * page_size
    num_q_heads = q_ref.shape[1]
    g = num_q_heads // num_kv_heads
    head_dim = q_ref.shape[-1]
    layer = layer_ref[0]

    def kvlen(s):
        return kv_lens_ref[sb * block_s + s]

    def pagelen(s):
        """Tokens to read from pages (fused mode: the newest token is an
        in-register input, not yet in the pool)."""
        return kvlen(s) - 1 if fused_write else kvlen(s)

    def nblocks(s):
        return lax.div(pagelen(s) + blk - 1, blk)

    nmax = nblocks(0)
    for s in range(1, block_s):
        nmax = jnp.maximum(nmax, nblocks(s))

    def page_copies(s, j, slot):
        base = (sb * block_s + s) * pages_per_seq + j * pages_per_block
        copies = []
        for p in range(pages_per_block):
            pg = page_indices_ref[base + p]
            row0 = pg * page_size
            copies.append(
                pltpu.make_async_copy(
                    k_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    k_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                    k_sems.at[slot],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    v_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    v_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                    v_sems.at[slot],
                )
            )
            if quantized:
                copies.append(
                    pltpu.make_async_copy(
                        ks_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                        ks_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                        k_sems.at[slot],
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        vs_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                        vs_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                        v_sems.at[slot],
                    )
                )
        return copies

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # int8-native path: quantize q once per sequence (NOT per kv block —
    # the rowwise absmax + round would otherwise repeat every block)
    int8_native = quantized and k_buf.dtype == jnp.int8
    q_i8_all, qs_all = [], []
    if int8_native:
        for s in range(block_s):
            qf = q_ref[s].astype(jnp.float32)
            qs_row = (
                jnp.maximum(
                    jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-6
                )
                / 127.0
            )
            q_i8_all.append(jnp.round(qf / qs_row).astype(jnp.int8))
            qs_all.append(qs_row)

    # Fused pool write is a read-modify-write of the W-row aligned window
    # containing the slot: Mosaic requires token-dim DMA slices to be
    # sublane-tile aligned, so a bare 1-row write does not lower.  The
    # other rows of the window are this sequence's own older tokens (slots
    # within a page belong to one sequence and fill in order), so writing
    # them back unchanged is race-free.
    W = kw_scr.shape[2] if fused_write else 0

    def win_base(s):
        slot = slots_ref[sb * block_s + s]
        return (slot // W) * W

    def scale_base(s):
        # scale pages are [L, Hkv, tokens] with token on the LANE dim:
        # the RMW window is the whole page holding the slot (page_size
        # must be lane-tile aligned — asserted in the wrapper)
        slot = slots_ref[sb * block_s + s]
        return (slot // page_size) * page_size

    def rmw_reads(s):
        base = win_base(s)
        copies = [
            pltpu.make_async_copy(
                k_pages_ref.at[layer, :, pl.ds(base, W)],
                kw_scr.at[s],
                r_sems.at[s],
            ),
            pltpu.make_async_copy(
                v_pages_ref.at[layer, :, pl.ds(base, W)],
                vw_scr.at[s],
                r_sems.at[s],
            ),
        ]
        if ksw_scr is not None:
            sbase = scale_base(s)
            copies += [
                pltpu.make_async_copy(
                    ks_pages_ref.at[layer, :, pl.ds(sbase, page_size)],
                    ksw_scr.at[s],
                    r_sems.at[s],
                ),
                pltpu.make_async_copy(
                    vs_pages_ref.at[layer, :, pl.ds(sbase, page_size)],
                    vsw_scr.at[s],
                    r_sems.at[s],
                ),
            ]
        return copies

    def rmw_writes(s):
        base = win_base(s)
        copies = [
            pltpu.make_async_copy(
                kw_scr.at[s],
                kp_out.at[layer, :, pl.ds(base, W)],
                w_sems.at[s],
            ),
            pltpu.make_async_copy(
                vw_scr.at[s],
                vp_out.at[layer, :, pl.ds(base, W)],
                w_sems.at[s],
            ),
        ]
        if ksw_scr is not None:
            sbase = scale_base(s)
            copies += [
                pltpu.make_async_copy(
                    ksw_scr.at[s],
                    ks_out.at[layer, :, pl.ds(sbase, page_size)],
                    w_sems.at[s],
                ),
                pltpu.make_async_copy(
                    vsw_scr.at[s],
                    vs_out.at[layer, :, pl.ds(sbase, page_size)],
                    w_sems.at[s],
                ),
            ]
        return copies

    if fused_write:
        for s in range(block_s):

            @pl.when(slots_ref[sb * block_s + s] >= 0)
            def _start_rmw_reads():
                for c in rmw_reads(s):
                    c.start()

    for s in range(block_s):

        @pl.when(nblocks(s) > 0)
        def _prefetch_first():
            for c in page_copies(s, 0, 0):
                c.start()

    # which kv head each query-head row belongs to: [Hq, 1]
    row_group = lax.broadcasted_iota(jnp.int32, (num_q_heads, 1), 0) // g

    def body(j, carry):
        slot = lax.rem(j, 2)
        nslot = lax.rem(j + 1, 2)
        for s in range(block_s):

            @pl.when(j + 1 < nblocks(s))
            def _prefetch_next():
                for c in page_copies(s, j + 1, nslot):
                    c.start()

        for s in range(block_s):

            @pl.when(j < nblocks(s))
            def _compute():
                for c in page_copies(s, j, slot):
                    c.wait()
                q_s = q_ref[s]  # [Hq, hd]
                if int8_native:
                    # int8-NATIVE attention: K/V blocks stay int8 in
                    # VMEM end-to-end (the int8->bf16 cast of a
                    # [Hkv*blk, hd] block forces a Mosaic sublane
                    # retile that cost 2.4x the halved HBM read —
                    # PERF_NOTES fp8_static postmortem).  q is
                    # pre-quantized rowwise, the q.k dot runs on the
                    # int8 MXU at 2x rate, and the per-token K scales
                    # dequantize the SMALL [Hq, Hkv*blk] output instead
                    # of the K block.  (Reference fp8-KV fast path:
                    # memory_pool.py:416 fused_downcast + flashinfer
                    # fp8 kernels.)
                    k_all = k_buf[slot, s].reshape(
                        num_kv_heads * blk, head_dim
                    )
                    qk_full = lax.dot_general(
                        q_i8_all[s],
                        k_all,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    ks_flat = ks_buf[slot, s].astype(jnp.float32).reshape(
                        num_kv_heads * blk
                    )
                    qk_full = qk_full * qs_all[s] * ks_flat[None, :]
                elif quantized:
                    k_all = (
                        k_buf[slot, s].astype(jnp.bfloat16)
                        * ks_buf[slot, s].astype(jnp.bfloat16)[..., None]
                    ).reshape(num_kv_heads * blk, head_dim)
                else:
                    k_all = k_buf[slot, s]
                    if k_all.dtype == jnp.float8_e4m3fn:  # static fp8 KV
                        k_all = k_all.astype(jnp.bfloat16)
                    k_all = k_all.reshape(num_kv_heads * blk, head_dim)
                if not int8_native:
                    qk_full = lax.dot_general(
                        q_s,
                        k_all,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [Hq, Hkv*blk] — all (q-head, kv-head) pairs
                qk_full *= sm_scale
                if soft_cap is not None:
                    qk_full = soft_cap * jnp.tanh(qk_full / soft_cap)
                # select each row's own kv head block -> [Hq, blk]
                qk = jnp.zeros((num_q_heads, blk), jnp.float32)
                for h in range(num_kv_heads):
                    qk += jnp.where(
                        row_group == h,
                        qk_full[:, h * blk : (h + 1) * blk],
                        0.0,
                    )
                q_pos = kvlen(s) - 1
                kv_pos = j * blk + lax.broadcasted_iota(
                    jnp.int32, (num_q_heads, blk), 1
                )
                allow = kv_pos < pagelen(s)
                if sliding_window is not None:
                    allow = jnp.logical_and(
                        allow, kv_pos > q_pos - sliding_window
                    )
                qk = jnp.where(allow, qk, MASK_VALUE)

                m_prev = m_scr[s]
                l_prev = l_scr[s]
                m_curr = jnp.max(qk, axis=-1, keepdims=True)  # [Hq, 1]
                m_next = jnp.maximum(m_prev, m_curr)  # [Hq, 128]
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(qk - m_next[:, 0:1])
                l_scr[s] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                m_scr[s] = m_next

                if int8_native:
                    # fold the per-token V scales into p (elementwise on
                    # the SMALL [Hq, Hkv*blk] matrix), quantize p rowwise
                    # to int8, and run the p.v dot on the int8 MXU — V
                    # never leaves int8
                    v_all = v_buf[slot, s].reshape(
                        num_kv_heads * blk, head_dim
                    )
                    vs_flat = vs_buf[slot, s].astype(
                        jnp.float32
                    ).reshape(num_kv_heads * blk)
                    p_full = jnp.concatenate(
                        [
                            jnp.where(row_group == h, p, 0.0)
                            for h in range(num_kv_heads)
                        ],
                        axis=1,
                    ) * vs_flat[None, :]  # [Hq, Hkv*blk] f32
                    ps_row = (
                        jnp.maximum(
                            jnp.max(
                                jnp.abs(p_full), axis=-1, keepdims=True
                            ),
                            1e-20,
                        )
                        / 127.0
                    )
                    p_i8 = jnp.round(p_full / ps_row).astype(jnp.int8)
                    pv = lax.dot_general(
                        p_i8,
                        v_all,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * ps_row
                else:
                    if quantized:
                        v_all = (
                            v_buf[slot, s].astype(jnp.bfloat16)
                            * vs_buf[slot, s].astype(jnp.bfloat16)[
                                ..., None
                            ]
                        ).reshape(num_kv_heads * blk, head_dim)
                    else:
                        v_all = v_buf[slot, s]
                        if v_all.dtype == jnp.float8_e4m3fn:
                            v_all = v_all.astype(jnp.bfloat16)
                        v_all = v_all.reshape(num_kv_heads * blk, head_dim)
                    # block-diagonal p: one matmul handles every head group
                    p_cast = p.astype(v_all.dtype)
                    p_full = jnp.concatenate(
                        [
                            jnp.where(row_group == h, p_cast, 0)
                            for h in range(num_kv_heads)
                        ],
                        axis=1,
                    )  # [Hq, Hkv*blk]
                    pv = lax.dot_general(
                        p_full,
                        v_all,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                acc_scr[s] = acc_scr[s] * alpha[:, 0:1] + pv

        return carry

    lax.fori_loop(0, nmax, body, 0, unroll=False)

    if fused_write:
        # flash-update with the in-register new token (position kvlen-1)
        for s in range(block_s):

            @pl.when(kvlen(s) > 0)
            def _new_token():
                q_s = q_ref[s].astype(jnp.float32)  # [Hq, hd]
                k_n = kn_ref[s, :, 0, :].astype(jnp.float32)  # [Hkv, hd]
                v_n = vn_ref[s, :, 0, :].astype(jnp.float32)
                qg = q_s.reshape(num_kv_heads, g, head_dim)
                qk_n = jnp.sum(qg * k_n[:, None, :], axis=-1)  # [Hkv, g]
                qk_n = qk_n.reshape(num_q_heads, 1) * sm_scale
                if soft_cap is not None:
                    qk_n = soft_cap * jnp.tanh(qk_n / soft_cap)
                m_prev = m_scr[s]
                m_next = jnp.maximum(m_prev, qk_n)
                alpha = jnp.exp(m_prev - m_next)
                p_n = jnp.exp(qk_n - m_next[:, 0:1])  # [Hq, 1]
                l_scr[s] = alpha * l_scr[s] + p_n
                m_scr[s] = m_next
                v_rep = jnp.broadcast_to(
                    v_n[:, None, :], (num_kv_heads, g, head_dim)
                ).reshape(num_q_heads, head_dim)
                acc_scr[s] = acc_scr[s] * alpha[:, 0:1] + p_n * v_rep

    for s in range(block_s):
        l = l_scr[s][:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[s] = (acc_scr[s] * l_inv).astype(o_ref.dtype)

    if fused_write:
        # merge the new row into each window and write it back; the
        # write DMAs must land before the kernel (this layer) retires
        row_iota = lax.broadcasted_iota(
            jnp.int32, (num_kv_heads, W, head_dim), 1
        )
        for s in range(block_s):

            @pl.when(slots_ref[sb * block_s + s] >= 0)
            def _merge_and_write():
                for c in rmw_reads(s):
                    c.wait()
                idx = slots_ref[sb * block_s + s] - win_base(s)
                sel = row_iota == idx
                if ksw_scr is not None:
                    # quantized pool: the new token's bf16 K/V is
                    # quantized in-register (per-head symmetric absmax,
                    # the _scatter_kv/fused_downcast convention) and its
                    # scale merged into the page's scale-window column
                    kf = kn_ref[s].astype(jnp.float32)  # [Hkv, 1, hd]
                    vf = vn_ref[s].astype(jnp.float32)
                    ka = jnp.maximum(
                        jnp.max(jnp.abs(kf), axis=-1, keepdims=True),
                        1e-6,
                    ) / 127.0
                    va = jnp.maximum(
                        jnp.max(jnp.abs(vf), axis=-1, keepdims=True),
                        1e-6,
                    ) / 127.0
                    k_q = jnp.clip(
                        jnp.round(kf / ka), -127, 127
                    ).astype(kw_scr.dtype)
                    v_q = jnp.clip(
                        jnp.round(vf / va), -127, 127
                    ).astype(vw_scr.dtype)
                    kw_scr[s] = jnp.where(sel, k_q, kw_scr[s])
                    vw_scr[s] = jnp.where(sel, v_q, vw_scr[s])
                    col = slots_ref[sb * block_s + s] - scale_base(s)
                    col_iota = lax.broadcasted_iota(
                        jnp.int32, (num_kv_heads, page_size), 1
                    )
                    csel = col_iota == col
                    ksw_scr[s] = jnp.where(
                        csel, ka[:, :, 0].astype(ksw_scr.dtype),
                        ksw_scr[s],
                    )
                    vsw_scr[s] = jnp.where(
                        csel, va[:, :, 0].astype(vsw_scr.dtype),
                        vsw_scr[s],
                    )
                else:
                    kw_scr[s] = jnp.where(
                        sel, kn_ref[s].astype(kw_scr.dtype), kw_scr[s]
                    )
                    vw_scr[s] = jnp.where(
                        sel, vn_ref[s].astype(vw_scr.dtype), vw_scr[s]
                    )
                for c in rmw_writes(s):
                    c.start()

        for s in range(block_s):

            @pl.when(slots_ref[sb * block_s + s] >= 0)
            def _wait_writes():
                for c in rmw_writes(s):
                    c.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size",
        "sm_scale",
        "sliding_window",
        "soft_cap",
        "pages_per_block",
        "block_s",
        "interpret",
    ),
)
def paged_decode_attention(
    q,  # [B, num_q_heads, head_dim]
    k_pages,  # [L, Hkv, tokens, hd]
    v_pages,
    kv_lens,  # [B] i32 (0 = padded slot)
    page_indices,  # [B, pages_per_seq]
    *,
    page_size: int = 32,
    layer=0,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    pages_per_block: Optional[int] = None,
    block_s: int = 16,
    interpret: Optional[bool] = None,
    k_scales=None,  # [L, Hkv, tokens] bf16 (quantized KV)
    v_scales=None,
    k_new=None,  # [B, Hkv, hd] fused-write mode: new token K/V + slots
    v_new=None,
    slots=None,  # [B] i32 pool row of each seq's new token (-1 = pad)
):
    """Batched decode: one query token per sequence, `block_s` sequences
    per grid cell (replaces the reference's decode attention backends,
    e.g. ``srt/layers/attention/flashinfer_backend.py`` decode wrappers).

    Defaults tuned on v5e (scratch/decode_v2_sweep, B=128, kv~185):
    block_s=16 with 64-token DMA waves hits ~470 GB/s effective — ~4.4x
    the round-1 per-(seq, kv-block)-cell decode path.

    With ``k_scales``/``v_scales`` the pages hold int8/fp8 values that
    are dequantized in VMEM right before the matmuls (per-token-per-head
    scales; the reference's FP8/INT8 KV cache capability).

    With ``k_new``/``v_new``/``slots`` the kernel *writes* the new token's
    K/V into the pool itself (pools aliased in→out, rows DMA'd overlapped
    with the kv walk) and folds that token into the flash update
    in-register — replacing the XLA scatter that cost ~5 ms/step at B=128
    (1024 scattered rows/layer).  Returns ``(out, k_pages, v_pages)``.

    int8 KV composes with the fused write: the new token is quantized
    in-kernel (per-head absmax) and the page's scale column RMW'd
    alongside the data window; the compute path then runs int8-NATIVE
    (int8 MXU q.k / p.v dots, scales dequantize the small qk output) —
    returns ``(out, k_pages, v_pages, k_scales, v_scales)``."""
    B, num_q_heads, head_dim = q.shape
    _, num_kv_heads, _, pool_hd = k_pages.shape
    S, pages_per_seq = page_indices.shape
    assert S == B
    quantized = k_scales is not None
    fused_write = k_new is not None
    if fused_write and quantized:
        assert k_pages.dtype == jnp.int8, (
            "fused-write quantized KV supports int8 pools (fp8 has no "
            "MXU dot on v5e)"
        )
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if head_dim != pool_hd:
        # pool head dim is lane-padded (ModelConfig.kv_cache_head_dim);
        # pad q/k/v with zeros and slice the output back
        pad_hd = ((0, 0), (0, 0), (0, pool_hd - head_dim))
        q = jnp.pad(q, pad_hd)
        if fused_write:
            k_new = jnp.pad(k_new, pad_hd)
            v_new = jnp.pad(v_new, pad_hd)
        res = paged_decode_attention(
            q, k_pages, v_pages, kv_lens, page_indices,
            page_size=page_size, layer=layer, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            pages_per_block=pages_per_block, block_s=block_s,
            interpret=interpret, k_scales=k_scales, v_scales=v_scales,
            k_new=k_new, v_new=v_new, slots=slots,
        )
        if fused_write and quantized:
            out, k_pages, v_pages, k_scales, v_scales = res
            return out[..., :head_dim], k_pages, v_pages, k_scales, v_scales
        if fused_write:
            out, k_pages, v_pages = res
            return out[..., :head_dim], k_pages, v_pages
        return res[..., :head_dim]
    head_dim = pool_hd
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if interpret is None:
        interpret = use_interpret_mode()
    if pages_per_block is None:
        # target ~256-token kv blocks per DMA wave: per-DMA issue cost
        # (~0.26 us measured on v5e) dominates decode attention, so
        # bigger waves with more in-flight copies cut it — r4 sweep:
        # 64-token waves 337 us/layer vs 256-token waves 195 us/layer
        # at B=128, kv=250.  Capped so the double-buffered K/V scratch
        # stays within VMEM.
        # capped at 4 pages: page_copies unrolls per page, so tiny pages
        # (tests use 8) would explode trace/compile time for no DMA win.
        # int8 pools: same buffer bytes buy 512-token waves (half the
        # per-DMA issue count for the same VMEM footprint)
        wave = 512 if k_pages.dtype == jnp.int8 else 256
        pages_per_block = max(1, min(wave // page_size, 4))
        buf_bytes_per_token = (
            2 * 2 * block_s * num_kv_heads * pool_hd
            * (1 if k_pages.dtype == jnp.int8 else 2)
        )
        while (
            pages_per_block > 1
            and pages_per_block * page_size * buf_bytes_per_token > 48 * 2**20
        ):
            pages_per_block //= 2
    if B < block_s:
        block_s = 8

    if B % block_s:
        pad = block_s - B % block_s
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, pad))
        page_indices = jnp.pad(page_indices, ((0, pad), (0, 0)))
        if fused_write:
            k_new = jnp.pad(k_new, ((0, pad), (0, 0), (0, 0)))
            v_new = jnp.pad(v_new, ((0, pad), (0, 0), (0, 0)))
            slots = jnp.pad(slots, (0, pad), constant_values=-1)
    Bp = q.shape[0]
    if pages_per_seq % pages_per_block:
        pad = pages_per_block - pages_per_seq % pages_per_block
        page_indices = jnp.pad(page_indices, ((0, 0), (0, pad)))
        pages_per_seq += pad

    orig_dtype = q.dtype
    if num_q_heads < 8:
        q = q.astype(jnp.float32)  # avoid sub-sublane bf16 tiles

    blk = pages_per_block * page_size
    kernel = functools.partial(
        _decode_kernel,
        block_s=block_s,
        pages_per_block=pages_per_block,
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        quantized=quantized,
        fused_write=fused_write,
    )
    q_spec = pl.BlockSpec(
        (block_s, num_q_heads, head_dim),
        lambda sb, *_: (sb, 0, 0),
    )
    in_specs = [
        q_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM(
            (2, block_s, num_kv_heads, blk, head_dim), k_pages.dtype
        ),
        pltpu.VMEM(
            (2, block_s, num_kv_heads, blk, head_dim), v_pages.dtype
        ),
    ]
    inputs = [q, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs += [k_scales, v_scales]
        scratch += [
            pltpu.VMEM((2, block_s, num_kv_heads, blk), k_scales.dtype),
            pltpu.VMEM((2, block_s, num_kv_heads, blk), v_scales.dtype),
        ]
    out_specs = pl.BlockSpec(
        (block_s, num_q_heads, head_dim),
        lambda sb, *_: (sb, 0, 0),
    )
    out_shape = jax.ShapeDtypeStruct((Bp, num_q_heads, head_dim), q.dtype)
    io_aliases = {}
    if fused_write:
        nkv_spec = pl.BlockSpec(
            (block_s, num_kv_heads, 1, head_dim),
            lambda sb, *_: (sb, 0, 0, 0),
        )
        def _to_store(x, dt):
            if quantized:
                return x  # quantization happens in-kernel at the merge
            if dt == jnp.float8_e4m3fn:
                # saturate: XLA's convert maps out-of-range to NaN
                x = jnp.clip(x.astype(jnp.float32), -448.0, 448.0)
                return x.astype(dt)
            return x.astype(dt)

        in_specs += [nkv_spec, nkv_spec]
        inputs += [
            _to_store(k_new, k_pages.dtype)[:, :, None, :],
            _to_store(v_new, v_pages.dtype)[:, :, None, :],
        ]
        out_specs = [
            out_specs,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ]
        # flattened operand order: 4 scalars, q, k_pages, v_pages, ...
        io_aliases = {5: 1, 6: 2}
        if quantized:
            out_specs += [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            out_shape += [
                jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
                jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
            ]
            # ..., ks_pages(7), vs_pages(8), kn(9), vn(10)
            io_aliases = {5: 1, 6: 2, 7: 3, 8: 4}
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if fused_write:
        # RMW window: sublane-tile-aligned rows around each slot
        # (sublane tile = 32 bytes / itemsize: bf16->16, f32->8, fp8->32)
        W = max(8, 32 // k_pages.dtype.itemsize)
        W = min(W, page_size)
        assert page_size % W == 0, (page_size, W)
        scratch += [
            pltpu.SemaphoreType.DMA((block_s,)),
            pltpu.SemaphoreType.DMA((block_s,)),
            pltpu.VMEM((block_s, num_kv_heads, W, head_dim), k_pages.dtype),
            pltpu.VMEM((block_s, num_kv_heads, W, head_dim), v_pages.dtype),
        ]
        if quantized:
            # scale windows: token is the LANE dim of [L, Hkv, tokens],
            # so the RMW window is one full page of scale columns;
            # lane-dim DMA slices need 128-element alignment on real
            # Mosaic (serving uses page_size=128; interpret unchecked)
            assert interpret or page_size % 128 == 0, (
                "fused-write int8 KV needs page_size % 128 == 0 "
                f"(got {page_size})"
            )
            scratch += [
                pltpu.VMEM(
                    (block_s, num_kv_heads, page_size), k_scales.dtype
                ),
                pltpu.VMEM(
                    (block_s, num_kv_heads, page_size), v_scales.dtype
                ),
            ]
    scratch += [
        pltpu.VMEM((block_s, num_q_heads, 128), jnp.float32),
        pltpu.VMEM((block_s, num_q_heads, 128), jnp.float32),
        pltpu.VMEM((block_s, num_q_heads, head_dim), jnp.float32),
    ]
    slots_arr = (
        slots.astype(jnp.int32)
        if fused_write
        else jnp.zeros((1,), jnp.int32)
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Bp // block_s,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # KV double buffers alone can exceed the 16MB default scoped
            # limit; v5e has 128MB physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        kv_lens.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        slots_arr,
        *inputs,
    )
    if fused_write and quantized:
        out, k_pages, v_pages, k_scales, v_scales = res
        return (out[:B].astype(orig_dtype), k_pages, v_pages,
                k_scales, v_scales)
    if fused_write:
        out, k_pages, v_pages = res
        return out[:B].astype(orig_dtype), k_pages, v_pages
    return res[:B].astype(orig_dtype)


# ======================================================================
# Verify-specialized kernel: bq query rows per sequence, in-register
# new-token KV, in-kernel pool write
# ======================================================================
#
# Speculative verify feeds each sequence [last_committed, *draft]
# (bq rows).  Routing it through the generic prefill kernel costs
# per-(q-block, kv-block) grid-cell overhead AND an XLA scatter per
# layer to land the new rows in the pool (~5 ms + ~3 ms of a ~23 ms
# verify round at B=8, tools/spec_decompose.py).  This kernel is the
# decode kernel's shape generalized to bq query rows: the page walk is
# identical (block_s sequences per cell, double-buffered DMA waves),
# the new tokens' K/V arrive in-register and join the flash update as
# one dense causal block, and the pool write happens inside the kernel
# as read-modify-writes of the <=3 sublane-aligned windows that cover
# each sequence's new rows (new rows span <=2 contiguous slot runs —
# they cross at most one page boundary — and each run spans <=2
# aligned W-row windows; run B starts page-aligned so it needs 1).
# Replaces the reference's target-verify attention
# (sgl-kernel/csrc/speculative/ + flashinfer verify wrappers) the TPU
# way: one kernel, no scatter, no separate accept kernel launch.


def _verify_kernel(
    # --- scalar prefetch ---
    kv_lens_ref,  # [B] i32 total tokens incl the q_len new rows
    q_lens_ref,  # [B] i32 number of real new rows (0 = dead)
    page_indices_ref,  # [B * pages_per_seq] i32 flat
    layer_ref,  # [1] i32
    slots_ref,  # [B * bq] i32 pool row per new token (-1 = pad)
    wins_ref,  # [B * 3] i32 window indices, base = idx * W (-1 = none)
    # --- tensor ---
    q_ref,  # [block_s, bq*Hq, hd]
    k_pages_ref,  # [L, Hkv, tokens, hd] (ANY)
    v_pages_ref,
    kn_ref,  # [block_s, Hkv, bq, hd]
    vn_ref,
    o_ref,  # [block_s, bq*Hq, hd]
    kp_out,  # aliased pools (ANY)
    vp_out,
    k_buf,  # [2, block_s, Hkv, blk, hd]
    v_buf,
    k_sems,
    v_sems,
    r_sems,  # [block_s, 3]
    w_sems,
    kw_scr,  # [block_s, Hkv, W, hd]
    vw_scr,
    m_scr,  # [block_s, bq*Hq, 128]
    l_scr,
    acc_scr,  # [block_s, bq*Hq, hd]
    *,
    bq: int,
    block_s: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    num_kv_heads: int,
    sm_scale: float,
    soft_cap: Optional[float],
):
    sb = pl.program_id(0)
    blk = pages_per_block * page_size
    rows = q_ref.shape[1]  # bq * Hq
    num_q_heads = rows // bq
    g = num_q_heads // num_kv_heads
    head_dim = q_ref.shape[-1]
    layer = layer_ref[0]
    W = kw_scr.shape[2]
    NW = 3  # max RMW windows per sequence

    def kvlen(s):
        return kv_lens_ref[sb * block_s + s]

    def qlen(s):
        return q_lens_ref[sb * block_s + s]

    def pagelen(s):
        """Tokens read from pages: everything before the new rows."""
        return kvlen(s) - qlen(s)

    def nblocks(s):
        return lax.div(pagelen(s) + blk - 1, blk)

    nmax = nblocks(0)
    for s in range(1, block_s):
        nmax = jnp.maximum(nmax, nblocks(s))

    def page_copies(s, j, slot):
        base = (sb * block_s + s) * pages_per_seq + j * pages_per_block
        copies = []
        for p in range(pages_per_block):
            pg = page_indices_ref[base + p]
            row0 = pg * page_size
            copies.append(
                pltpu.make_async_copy(
                    k_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    k_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                    k_sems.at[slot],
                )
            )
            copies.append(
                pltpu.make_async_copy(
                    v_pages_ref.at[layer, :, pl.ds(row0, page_size)],
                    v_buf.at[slot, s, :, pl.ds(p * page_size, page_size)],
                    v_sems.at[slot],
                )
            )
        return copies

    def win_base(s, w):
        # wins holds window INDICES (base // W): multiplying by W here
        # lets Mosaic prove the DMA slice offset is sublane-tile-aligned
        # (a raw prefetched base is opaque to its divisibility analysis)
        return wins_ref[(sb * block_s + s) * NW + w] * W

    def rmw_reads(s, w):
        base = win_base(s, w)
        return [
            pltpu.make_async_copy(
                k_pages_ref.at[layer, :, pl.ds(base, W)],
                kw_scr.at[s],
                r_sems.at[s, w],
            ),
            pltpu.make_async_copy(
                v_pages_ref.at[layer, :, pl.ds(base, W)],
                vw_scr.at[s],
                r_sems.at[s, w],
            ),
        ]

    def rmw_writes(s, w):
        base = win_base(s, w)
        return [
            pltpu.make_async_copy(
                kw_scr.at[s],
                kp_out.at[layer, :, pl.ds(base, W)],
                w_sems.at[s, w],
            ),
            pltpu.make_async_copy(
                vw_scr.at[s],
                vp_out.at[layer, :, pl.ds(base, W)],
                w_sems.at[s, w],
            ),
        ]

    m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # kick the first window's RMW reads early so they overlap the walk;
    # windows are processed serially per seq (one kw_scr slab per seq)
    for s in range(block_s):

        @pl.when(win_base(s, 0) >= 0)
        def _start_first_rmw():
            for c in rmw_reads(s, 0):
                c.start()

    for s in range(block_s):

        @pl.when(nblocks(s) > 0)
        def _prefetch_first():
            for c in page_copies(s, 0, 0):
                c.start()

    # row r of the folded q block is token r // Hq, head r % Hq
    row_tok = lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // num_q_heads
    row_group = (
        lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % num_q_heads
    ) // g

    def body(j, carry):
        slot = lax.rem(j, 2)
        nslot = lax.rem(j + 1, 2)
        for s in range(block_s):

            @pl.when(j + 1 < nblocks(s))
            def _prefetch_next():
                for c in page_copies(s, j + 1, nslot):
                    c.start()

        for s in range(block_s):

            @pl.when(j < nblocks(s))
            def _compute():
                for c in page_copies(s, j, slot):
                    c.wait()
                q_s = q_ref[s]  # [bq*Hq, hd]
                k_all = k_buf[slot, s]
                if k_all.dtype == jnp.float8_e4m3fn:
                    k_all = k_all.astype(jnp.bfloat16)
                k_all = k_all.reshape(num_kv_heads * blk, head_dim)
                qk_full = lax.dot_general(
                    q_s, k_all, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq*Hq, Hkv*blk]
                qk_full *= sm_scale
                if soft_cap is not None:
                    qk_full = soft_cap * jnp.tanh(qk_full / soft_cap)
                qk = jnp.zeros((rows, blk), jnp.float32)
                for h in range(num_kv_heads):
                    qk += jnp.where(
                        row_group == h,
                        qk_full[:, h * blk : (h + 1) * blk],
                        0.0,
                    )
                kv_pos = j * blk + lax.broadcasted_iota(
                    jnp.int32, (rows, blk), 1
                )
                # page tokens all precede every new row: plain bound mask
                qk = jnp.where(kv_pos < pagelen(s), qk, MASK_VALUE)

                m_prev = m_scr[s]
                l_prev = l_scr[s]
                m_curr = jnp.max(qk, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(qk - m_next[:, 0:1])
                l_scr[s] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                m_scr[s] = m_next

                v_all = v_buf[slot, s]
                if v_all.dtype == jnp.float8_e4m3fn:
                    v_all = v_all.astype(jnp.bfloat16)
                v_all = v_all.reshape(num_kv_heads * blk, head_dim)
                p_cast = p.astype(v_all.dtype)
                p_full = jnp.concatenate(
                    [
                        jnp.where(row_group == h, p_cast, 0)
                        for h in range(num_kv_heads)
                    ],
                    axis=1,
                )
                pv = lax.dot_general(
                    p_full, v_all, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[s] = acc_scr[s] * alpha[:, 0:1] + pv

        return carry

    lax.fori_loop(0, nmax, body, 0, unroll=False)

    # dense causal block over the in-register new tokens: q row (i, h)
    # attends new kv row (hk, jt) iff hk == h's group, jt <= i, jt real
    col_tok = lax.broadcasted_iota(
        jnp.int32, (rows, num_kv_heads * bq), 1
    ) % bq
    col_group = lax.broadcasted_iota(
        jnp.int32, (rows, num_kv_heads * bq), 1
    ) // bq
    for s in range(block_s):

        @pl.when(qlen(s) > 0)
        def _new_block():
            q_s = q_ref[s]  # [bq*Hq, hd]
            k_n = kn_ref[s].reshape(num_kv_heads * bq, head_dim)
            qk_n = lax.dot_general(
                q_s, k_n, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq*Hq, Hkv*bq]
            qk_n *= sm_scale
            if soft_cap is not None:
                qk_n = soft_cap * jnp.tanh(qk_n / soft_cap)
            allow = (
                (col_group == row_group)
                & (col_tok <= row_tok)
                & (col_tok < qlen(s))
            )
            qk_n = jnp.where(allow, qk_n, MASK_VALUE)
            m_prev = m_scr[s]
            m_curr = jnp.max(qk_n, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p_n = jnp.exp(qk_n - m_next[:, 0:1])
            # head-mismatched columns carry exp(MASK - m) ~ 0 already,
            # so p_n is safe to feed the dense matmul directly
            l_scr[s] = alpha * l_scr[s] + jnp.sum(
                p_n, axis=-1, keepdims=True
            )
            m_scr[s] = m_next
            v_n = vn_ref[s].reshape(num_kv_heads * bq, head_dim)
            pv_n = lax.dot_general(
                p_n.astype(v_n.dtype), v_n, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[s] = acc_scr[s] * alpha[:, 0:1] + pv_n

    for s in range(block_s):
        l = l_scr[s][:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[s] = (acc_scr[s] * l_inv).astype(o_ref.dtype)

    # ---- pool write: serial RMW over each sequence's <=3 windows ----
    row_iota = lax.broadcasted_iota(
        jnp.int32, (num_kv_heads, W, head_dim), 1
    )
    for w in range(NW):
        for s in range(block_s):

            @pl.when(win_base(s, w) >= 0)
            def _merge_and_write():
                for c in rmw_reads(s, w):
                    c.wait()
                base = win_base(s, w)
                kw = kw_scr[s]
                vw = vw_scr[s]
                for t in range(bq):
                    idx = slots_ref[(sb * block_s + s) * bq + t] - base
                    sel = row_iota == idx  # idx<0 or >=W selects nothing
                    kw = jnp.where(
                        sel, kn_ref[s, :, t, :][:, None, :].astype(kw.dtype),
                        kw,
                    )
                    vw = jnp.where(
                        sel, vn_ref[s, :, t, :][:, None, :].astype(vw.dtype),
                        vw,
                    )
                kw_scr[s] = kw
                vw_scr[s] = vw
                for c in rmw_writes(s, w):
                    c.start()
                for c in rmw_writes(s, w):
                    c.wait()
                if w + 1 < NW:

                    @pl.when(win_base(s, w + 1) >= 0)
                    def _next_read():
                        for c in rmw_reads(s, w + 1):
                            c.start()


def _verify_windows(slots, W: int):
    """Distinct sublane-aligned W-row window bases covering each
    sequence's valid new-row slots (-1 entries ignored); [B, 3] with -1
    padding, as window INDICES (base = idx * W — the kernel multiplies so
    Mosaic can prove DMA alignment).  New rows form <=2 contiguous slot
    runs (one page crossing max), so <=3 aligned windows always
    suffice."""
    big = jnp.int32(2**30)
    valid = slots >= 0
    aligned = jnp.where(valid, slots // W, big)
    lo = jnp.min(aligned, axis=1)
    hi = jnp.where(valid, aligned, -1).max(axis=1)
    # middle distinct value, if any
    mid_c = jnp.where((aligned > lo[:, None]) & (aligned < hi[:, None]),
                      aligned, -1)
    mid = jnp.max(mid_c, axis=1)
    any_valid = jnp.any(valid, axis=1)
    w0 = jnp.where(any_valid, lo, -1)
    # pack left (no -1 gaps): the kernel chains window w+1's RMW read
    # off window w's merge, so actives must be contiguous
    has_mid = mid > w0
    w1 = jnp.where(has_mid, mid, jnp.where(hi > w0, hi, -1))
    w2 = jnp.where(has_mid & (hi > mid), hi, -1)
    return jnp.stack([w0, w1, w2], axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "sm_scale", "soft_cap",
        "pages_per_block", "block_s", "interpret",
    ),
)
def paged_verify_attention(
    q,  # [B, bq, num_q_heads, head_dim]
    k_pages,  # [L, Hkv, tokens, hd]
    v_pages,
    kv_lens,  # [B] i32 total tokens incl new rows (0 = dead)
    q_lens,  # [B] i32 real new rows per seq
    page_indices,  # [B, pages_per_seq]
    k_new,  # [B, bq, Hkv, hd]
    v_new,
    slots,  # [B, bq] i32 pool row per new token (-1 = pad)
    *,
    page_size: int,
    layer=0,
    sm_scale: Optional[float] = None,
    soft_cap: Optional[float] = None,
    pages_per_block: Optional[int] = None,
    block_s: int = 8,
    interpret: Optional[bool] = None,
):
    """Speculative-verify attention + KV landing in one kernel.

    Returns ``(out [B, bq, Hq, hd], k_pages, v_pages)`` with the new
    rows written into the (aliased) pools.  Chain (causal) masking over
    the new rows; pages hold only tokens preceding them."""
    B, bq, num_q_heads, head_dim = q.shape
    L, num_kv_heads, _, pool_hd = k_pages.shape
    S, pages_per_seq = page_indices.shape
    assert S == B
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if interpret is None:
        interpret = use_interpret_mode()
    if head_dim != pool_hd:
        pad = ((0, 0), (0, 0), (0, 0), (0, pool_hd - head_dim))
        out, k_pages, v_pages = paged_verify_attention(
            jnp.pad(q, pad), k_pages, v_pages, kv_lens, q_lens,
            page_indices, jnp.pad(k_new, pad), jnp.pad(v_new, pad),
            slots, page_size=page_size, layer=layer, sm_scale=sm_scale,
            soft_cap=soft_cap, pages_per_block=pages_per_block,
            block_s=block_s, interpret=interpret,
        )
        return out[..., :head_dim], k_pages, v_pages
    head_dim = pool_hd
    if pages_per_block is None:
        pages_per_block = max(1, min(256 // page_size, 4))
        buf_bytes_per_token = (
            2 * 2 * block_s * num_kv_heads * pool_hd
            * (1 if k_pages.dtype == jnp.int8 else 2)
        )
        while (
            pages_per_block > 1
            and pages_per_block * page_size * buf_bytes_per_token
            > 40 * 2**20
        ):
            pages_per_block //= 2
    if B < block_s:
        block_s = max(1, B)
    if B % block_s:
        padn = block_s - B % block_s
        q = jnp.pad(q, ((0, padn), (0, 0), (0, 0), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, padn))
        q_lens = jnp.pad(q_lens, (0, padn))
        page_indices = jnp.pad(page_indices, ((0, padn), (0, 0)))
        k_new = jnp.pad(k_new, ((0, padn), (0, 0), (0, 0), (0, 0)))
        v_new = jnp.pad(v_new, ((0, padn), (0, 0), (0, 0), (0, 0)))
        slots = jnp.pad(slots, ((0, padn), (0, 0)), constant_values=-1)
    Bp = q.shape[0]
    if pages_per_seq % pages_per_block:
        padp = pages_per_block - pages_per_seq % pages_per_block
        page_indices = jnp.pad(page_indices, ((0, 0), (0, padp)))
        pages_per_seq += padp

    # sublane tile rows for the pool dtype (bf16 -> 16)
    W = max(8, 32 // k_pages.dtype.itemsize)
    W = min(W, page_size)
    assert page_size % W == 0, (page_size, W)
    # The 3-window cover in _verify_windows assumes each sequence's new
    # rows (<= bq contiguous slots, at most one page crossing) touch at
    # most 3 aligned W-row windows — true iff bq <= 2*W... but only <=3
    # DISTINCT windows are landed, so bq rows spanning a 4th window
    # would be silently dropped (ADVICE r4: silent KV corruption).
    # ceil((bq-1)/W)+1 windows cover any aligned run of bq rows.
    assert bq <= 2 * W + 1, (
        f"paged_verify_attention: bq={bq} new rows can span more than 3 "
        f"aligned {W}-row windows (pool dtype {k_pages.dtype}); the "
        "in-kernel RMW landing would drop rows — reduce draft count or "
        "extend NW in _verify_windows/_verify_kernel"
    )
    wins = _verify_windows(slots, W)

    orig_dtype = q.dtype
    blk = pages_per_block * page_size
    kernel = functools.partial(
        _verify_kernel,
        bq=bq,
        block_s=block_s,
        pages_per_block=pages_per_block,
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        sm_scale=sm_scale,
        soft_cap=soft_cap,
    )
    rows = bq * num_q_heads
    q_flat = q.reshape(Bp, rows, head_dim)
    kn = k_new.transpose(0, 2, 1, 3)  # [B, Hkv, bq, hd]
    vn = v_new.transpose(0, 2, 1, 3)
    q_spec = pl.BlockSpec((block_s, rows, head_dim), lambda sb, *_: (sb, 0, 0))
    nkv_spec = pl.BlockSpec(
        (block_s, num_kv_heads, bq, head_dim), lambda sb, *_: (sb, 0, 0, 0)
    )
    out_specs = [
        pl.BlockSpec((block_s, rows, head_dim), lambda sb, *_: (sb, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, rows, head_dim), q.dtype),
        jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
        jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
    ]
    scratch = [
        pltpu.VMEM((2, block_s, num_kv_heads, blk, head_dim), k_pages.dtype),
        pltpu.VMEM((2, block_s, num_kv_heads, blk, head_dim), v_pages.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((block_s, 3)),
        pltpu.SemaphoreType.DMA((block_s, 3)),
        pltpu.VMEM((block_s, num_kv_heads, W, head_dim), k_pages.dtype),
        pltpu.VMEM((block_s, num_kv_heads, W, head_dim), v_pages.dtype),
        pltpu.VMEM((block_s, rows, 128), jnp.float32),
        pltpu.VMEM((block_s, rows, 128), jnp.float32),
        pltpu.VMEM((block_s, rows, head_dim), jnp.float32),
    ]
    cast = lambda x, dt: (
        jnp.clip(x.astype(jnp.float32), -448.0, 448.0).astype(dt)
        if dt == jnp.float8_e4m3fn else x.astype(dt)
    )
    out, k_pages, v_pages = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(Bp // block_s,),
            in_specs=[
                q_spec,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                nkv_spec,
                nkv_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        # flat operands: 6 scalars, q, k_pages(7), v_pages(8), kn, vn
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        kv_lens.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        page_indices.reshape(-1).astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        slots.reshape(-1).astype(jnp.int32),
        wins.reshape(-1),
        q_flat,
        k_pages,
        v_pages,
        cast(kn, k_pages.dtype),
        cast(vn, v_pages.dtype),
    )
    return (
        out[:B].reshape(B, bq, num_q_heads, head_dim).astype(orig_dtype),
        k_pages,
        v_pages,
    )
