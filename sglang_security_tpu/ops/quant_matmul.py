"""Fused quantized matmul Pallas kernels.

TPU-native re-design of the reference's quantized GEMM stack
(``sgl-kernel/csrc/gemm/*.cu``: AWQ dequant, FP8 blockwise GEMM, INT8 GEMM,
per-token quant — see SURVEY.md §2.3):

  * ``int4_matmul`` — weight-only INT4 (AWQ/GPTQ-style group quant,
    default group 128) fused dequant×matmul.  Decode is weight-bandwidth
    bound, so halving/quartering weight bytes is the whole win; dequant
    happens in VMEM right before the MXU.  Weights are packed two nibbles
    per int8 **tile-locally**: within each K-block of size ``block_k``,
    packed row ``r`` holds original rows ``r`` (low nibble) and
    ``r + block_k//2`` (high nibble), so unpacking is two shifts — no
    sublane interleave.
  * ``int8_matmul`` — W8A8 with per-token (row) activation scales and
    per-channel (column) weight scales, int8×int8 MXU with int32
    accumulation and fused output dequant.  This is the TPU-native analog
    of the reference's FP8 w8a8 path: v5e's MXU natively runs int8 at 2×
    bf16 throughput, which is the role fp8 tensor cores play on H100.
  * ``quantize_int8_rowwise`` — per-token activation quantization.

Quantization convention for int4: q ∈ [0, 15], w = (q - zero) * scale,
with per-(group, column) scale/zero f32 arrays [K//group, N]. Symmetric
schemes set zero = 8.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_security_tpu.utils import cdiv, round_up, use_interpret_mode

DEFAULT_BLOCK_K = 1024


def int4_block_k(K: int) -> int:
    """Deterministic K-block choice shared by pack time and run time.

    1024 (vs the round-3 512) halves the grid's K steps and gives the
    dequant-formulation kernel >=8 scale rows per block (the Pallas
    sublane-tile minimum for the [K_blk/G, BN] scale BlockSpec)."""
    bk = min(DEFAULT_BLOCK_K, K)
    while K % bk:
        bk //= 2
    return bk


# ======================================================================
# Host-side packing / quantization helpers
# ======================================================================


def quantize_int4(
    w: jax.Array, group_size: int = 128
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric per-group quantization of w[K, N] -> (q4 in uint8, scale, zero).

    Returns unpacked q values in [0, 15] (one per int8) plus f32
    scales/zeros of shape [K//group_size, N].
    """
    K, N = w.shape
    assert K % group_size == 0
    wg = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    wmin = wg.min(axis=1)
    wmax = wg.max(axis=1)
    scale = jnp.maximum(wmax - wmin, 1e-8) / 15.0
    zero = -wmin / scale
    q = jnp.clip(
        jnp.round(wg / scale[:, None, :] + zero[:, None, :]), 0, 15
    ).astype(jnp.uint8)
    return q.reshape(K, N), scale, zero


def pack_int4(q: jax.Array, block_k: Optional[int] = None) -> jax.Array:
    """Pack q[K, N] (values 0..15) into int8 [K//2, N], tile-locally.

    Within each K-block of `block_k` rows, packed row r holds original rows
    (blk*block_k + r) in the low nibble and (blk*block_k + block_k//2 + r)
    in the high nibble.
    """
    K, N = q.shape
    if block_k is None:
        block_k = int4_block_k(K)
    assert K % block_k == 0, (K, block_k)
    half = block_k // 2
    qb = q.reshape(K // block_k, 2, half, N)  # [blocks, lo/hi, half, N]
    packed = qb[:, 0] | (qb[:, 1] << 4)
    # int8 view: Mosaic supports int8->int32 casts but not uint8->f32.
    return jax.lax.bitcast_convert_type(
        packed.reshape(K // 2, N).astype(jnp.uint8), jnp.int8
    )


def dequantize_int4(
    q: jax.Array, scale: jax.Array, zero: jax.Array, group_size: int = 128
) -> jax.Array:
    K, N = q.shape
    qf = q.astype(jnp.float32).reshape(K // group_size, group_size, N)
    w = (qf - zero[:, None, :]) * scale[:, None, :]
    return w.reshape(K, N)


def quantize_int8_rowwise(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: x[M, K] -> (q[M, K], scale[M, 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def quantize_int8_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-column symmetric int8: w[K, N] -> (q[K, N], scale[1, N])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


# ======================================================================
# INT4 weight-only fused dequant×matmul
# ======================================================================


def _int4_kernel(
    x_ref,  # [BM, BK] bf16 (act_int8: int8)
    w_ref,  # [BK//2, BN] uint8 (tile-local packed)
    s_ref,  # [K//G, BN] f32 (full K-strip of scales for this N block)
    z_ref,  # [K//G, BN] f32
    *refs,  # (+xs_ref [BM, 1] f32 row act-scales when act_int8,) o_ref, acc_ref
    block_k: int,
    group_size: int,
    out_dtype,
    act_int8: bool,
):
    """Group-dot formulation: never dequantizes weights element-wise.

    For each quant group g:  x·w|_g = s_g ⊙ (x·q)|_g − (s_g·z_g) ⊙ Σx|_g
    so the MXU multiplies the *raw* nibble values (exact in bf16 or int8)
    and the zero/scale handling becomes two rank-1 fixups on the [BM, BN]
    output tile — O(M·N·K/G) VPU work instead of O(K·N) per-weight dequant
    (which cost ~5 VPU ops/weight and dominated the decode step).  With
    ``act_int8`` the dot runs int8×int8 on the MXU at twice bf16 throughput
    (reference analog: QServe w4a8, ``qserve_w4a8_per_group_gemm.cu``)."""
    if act_int8:
        xs_ref, o_ref, acc_ref = refs
    else:
        o_ref, acc_ref = refs
        xs_ref = None
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    half = block_k // 2

    # Nibbles are CENTERED to q-8 in [-8, 7] before the MXU dots and the
    # zero point becomes z-8 (|z-8| ~ 0.5 for near-symmetric weights, vs
    # z ~ 7.5 raw).  This shrinks the zero-point fixup term ~15x so the
    # DEFAULT-precision f32 fixup dot (whose Mosaic lowering rounds
    # inputs to bf16) stays ~2 decades below the kernel tolerance — the
    # uncentered form needed precision=HIGHEST there, which cost ~30%
    # end-to-end (round-3 A/B: 1251 vs 1723 tok/s).
    if act_int8:
        # nibble unpack via i32 bitcast: 8 weights per lane-op (Mosaic
        # cannot shift i8 vectors, and i32 ops on the re-packed view are
        # 4x denser than per-byte i32 unpack); bitcast back to i8 feeds
        # the int8 MXU with no further casts.  Centering rides the same
        # i32 view: q^8 flips bit 3, i.e. q^8 = q-8+16·[q<8]; subtracting
        # 16 from lanes with the (flipped) high bit clear needs a borrow,
        # so instead center via int8 subtract after the bitcast.
        # Mosaic has no i8 vector sub, so center inside the packed i32
        # view: per byte, q-8 (two's complement) = (q^8) + 0xF0·[q < 8],
        # and [q < 8] is exactly bit 3 of (q^8).  The 0xF0 spread is four
        # shifts of that bit — byte-local, no cross-byte carries.
        p32 = pltpu.bitcast(w_ref[...], jnp.int32)

        def centered(nib32):
            t = nib32 ^ 0x08080808
            m = t & 0x08080808
            t = t + (m << 1) + (m << 2) + (m << 3) + (m << 4)
            return pltpu.bitcast(t, jnp.int8)

        lo = centered(p32 & 0x0F0F0F0F)
        hi = centered((p32 >> 4) & 0x0F0F0F0F)
    else:
        p32 = w_ref[...].astype(jnp.int32)
        # rows [0, half): values centered to [-8, 7]
        lo = ((p32 & 0xF) - 8).astype(jnp.float32)
        # rows [half, block_k)
        hi = (((p32 >> 4) & 0xF) - 8).astype(jnp.float32)

    x = x_ref[...]
    groups_per_half = max(half // group_size, 1)
    # VPU budget note: the scale term  Σ_g s_g ⊙ d_g  is inherently
    # elementwise (s varies over both g and n), but the zero-point term
    #   Σ_g (s_g z_g) ⊙ Σx|_g  ==  [M, Gb] xsums · [Gb, BN] (s·z)
    # is a tiny MXU matmul — hoisting it out of the group loop removes
    # ~half the per-group [BM, BN] VPU traffic that made the kernel
    # VPU-bound (~33% MXU at decode M=128; see PERF_NOTES round 2).
    # group sums as ONE MXU dot: xsums [BM, Gb] = x · E where
    # E[kk, g] = 1 iff column kk belongs to quant group g (the block's
    # groups laid out [lo-half groups..., hi-half groups...] to match
    # the loop order below)
    Gb = 2 * groups_per_half
    gsz = min(group_size, half)
    col_group = (
        jax.lax.broadcasted_iota(jnp.int32, (block_k, Gb), 0) // gsz
    )
    ind = (
        col_group == jax.lax.broadcasted_iota(jnp.int32, (block_k, Gb), 1)
    )
    if act_int8:
        xsums = lax.dot_general(
            x, ind.astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        xsums = lax.dot_general(
            x, ind.astype(x.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = None
    szs = []
    for part, w_q in ((0, lo), (1, hi)):
        for g in range(groups_per_half):
            if half % group_size == 0:
                row = k * (block_k // group_size) + part * groups_per_half + g
            else:
                # group >= half-block: the half lies inside one quant group
                assert group_size % half == 0, (group_size, half)
                row = (k * block_k + part * half) // group_size
            lo_r, hi_r = g * gsz, (g + 1) * gsz
            q_g = w_q[lo_r:hi_r, :]
            x_g = x[:, part * half + lo_r : part * half + hi_r]
            s = s_ref[row, :][None, :]
            if act_int8:
                d = lax.dot_general(
                    x_g,
                    q_g,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                d = lax.dot_general(
                    x_g,
                    q_g.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # centered zero point: w = (q - z)·s = ((q-8) - (z-8))·s
            szs.append(s_ref[row, :] * (z_ref[row, :] - 8.0))
            term = d * s
            acc = term if acc is None else acc + term
    # This f32xf32 dot lowers at DEFAULT precision (Mosaic rounds the
    # inputs to bf16 on the MXU).  With CENTERED nibbles the s·(z-8)
    # coefficients are ~15x smaller than the raw s·z form, which is what
    # keeps the bf16 input rounding (~0.4% relative on xsums) far below
    # the kernel tolerance — the uncentered form failed on-chip parity at
    # K=14336 (VERDICT r2 weak #2), and fixing it with precision=HIGHEST
    # instead cost ~30% end-to-end.
    zero_fix = lax.dot_general(
        xsums,                                   # [BM, Gb]
        jnp.stack(szs, axis=0),                  # [Gb, BN]
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += acc - zero_fix

    @pl.when(k == nk - 1)
    def _store():
        out = acc_ref[...]
        if act_int8:
            out = out * xs_ref[:, 0:1]
        o_ref[...] = out.astype(out_dtype)


def _int4_dequant_kernel(
    x_ref,   # [BM, BK] bf16
    w_ref,   # [BK//2, BN] int8 (tile-local packed)
    s_ref,   # [BK//G, BN] f32 (this k-block's scale rows)
    z_ref,   # [BK//G, BN] f32
    o_ref,   # [BM, BN]
    wd_scr,  # [BK, BN] bf16 dequantized weight tile
    acc_ref, # [BM, BN] f32
    *,
    block_k: int,
    group_size: int,
    out_dtype,
):
    """Dequant formulation (large-M / prefill regime): dequantize the
    weight tile to bf16 in VMEM — O(K·N) VPU work amortized over BM
    rows — then ONE big MXU dot per packed half.  The zero point folds
    into the dequant ((q − z)·s, exact in f32), so there is no xsums /
    zero-fixup machinery.  Dequantized weights round to bf16 before the
    MXU: the same precision as the reference's fp16-dequant GEMMs
    (AWQ dequant, ``sgl-kernel/csrc/gemm/awq_kernel.cu``).  Measured on
    v5e at M=4096 gate+up: 168.7 TF/s vs 136.6 for the group-dot form
    (the group-dot's K=G dots cap MXU efficiency at large M)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    half = block_k // 2
    G = group_size
    gpb_half = half // G

    p32 = w_ref[...].astype(jnp.int32)
    lo_q = (p32 & 0xF).astype(jnp.float32)          # block rows [0, half)
    hi_q = ((p32 >> 4) & 0xF).astype(jnp.float32)   # rows [half, block_k)

    for g in range(gpb_half):
        sl = slice(g * G, (g + 1) * G)
        wd_scr[sl] = (
            (lo_q[sl] - z_ref[g, :][None, :]) * s_ref[g, :][None, :]
        ).astype(jnp.bfloat16)
    for g in range(gpb_half):
        gh = gpb_half + g
        sl = slice(g * G, (g + 1) * G)
        wd_scr[half + g * G : half + (g + 1) * G] = (
            (hi_q[sl] - z_ref[gh, :][None, :]) * s_ref[gh, :][None, :]
        ).astype(jnp.bfloat16)

    x = x_ref[...]
    acc = lax.dot_general(
        x[:, :half], wd_scr[:half],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += lax.dot_general(
        x[:, half:], wd_scr[half:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += acc

    @pl.when(k == nk - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


# dequant formulation needs >= 8 scale rows per K block (sublane tile)
# and whole groups per packed half
def _dequant_formulation_ok(block_k: int, group_size: int) -> bool:
    half = block_k // 2
    return (
        block_k // group_size >= 8
        and half % group_size == 0
    )


# below this M the group-dot form wins: per-weight VPU dequant stops
# amortizing over rows (measured v5e crossover between M=128 and 1024)
DEQUANT_MIN_M = 512


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size",
        "block_m",
        "block_n",
        "block_k",
        "out_dtype",
        "act",
        "interpret",
    ),
)
def int4_matmul(
    x: jax.Array,  # [M, K] bf16/f32
    w_packed: jax.Array,  # [K//2, N] int8 (pack_int4 layout)
    scale: jax.Array,  # [K//G, N] f32
    zero: jax.Array,  # [K//G, N] f32
    *,
    group_size: int = 128,
    block_m: int = 1024,
    block_n: int = 4096,
    block_k: Optional[int] = None,
    out_dtype=jnp.bfloat16,
    act: str = "bf16",  # "bf16" (w4a16) | "int8" (w4a8, 2x MXU rate)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Block defaults are DMA-traffic-tuned (r4+r5 sweeps on v5e): the x
    block re-fetches once per N tile, so at block_n=256 the x traffic
    exceeded the weight traffic 2x at decode and 60x at prefill —
    block_n=2048 took decode gate+up 0.505 -> 0.244 ms and prefill
    10.27 -> 7.04 ms before any kernel change; the r5 sweep moved the
    default to 4096 (gate+up 0.189 -> 0.179 ms, down 0.097 -> 0.084 ms
    at M=128 w4a8), with a power-of-2 shrink when N isn't divisible.

    Two formulations, dispatched on M:
      * M >= DEQUANT_MIN_M, act="bf16": dequant formulation (one big dot
        per packed half; see _int4_dequant_kernel).
      * otherwise: group-dot formulation (never dequantizes weights
        element-wise; see _int4_kernel).

    ``act="int8"`` quantizes activations per-row to int8 and runs the
    group dots on the int8 MXU path (2x bf16 throughput); w4a16 numerics
    become w4a8 (QServe-style)."""
    M, K = x.shape
    N = w_packed.shape[1]
    if block_k is None:
        block_k = int4_block_k(K)
    assert w_packed.shape[0] == K // 2
    assert K % block_k == 0, (K, block_k)
    half = block_k // 2
    assert half % group_size == 0 or group_size % half == 0
    if interpret is None:
        interpret = use_interpret_mode()
    act_int8 = act == "int8"

    if (
        not act_int8
        and M >= DEQUANT_MIN_M
        and _dequant_formulation_ok(block_k, group_size)
    ):
        bm = min(block_m, round_up(M, 8))
        bn = min(block_n, N)
        while N % bn:  # largest power-of-2-shrunk divisor of N
            bn //= 2
        Mp = round_up(M, bm)
        xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
        gpb = block_k // group_size
        out = pl.pallas_call(
            functools.partial(
                _int4_dequant_kernel,
                block_k=block_k,
                group_size=group_size,
                out_dtype=out_dtype,
            ),
            grid=(Mp // bm, N // bn, K // block_k),
            in_specs=[
                pl.BlockSpec((bm, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k // 2, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((gpb, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((gpb, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((block_k, bn), jnp.bfloat16),
                pltpu.VMEM((bm, bn), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp.astype(jnp.bfloat16), w_packed, scale, zero)
        return out[:M]

    bm = min(block_m, round_up(M, 32 if act_int8 else 8))
    bn = min(block_n, N)
    while N % bn:  # largest power-of-2-shrunk divisor of N
        bn //= 2
    Mp = round_up(M, bm)

    inputs = []
    if act_int8:
        x_q, x_s = quantize_int8_rowwise(x)
        if Mp != M:
            x_q = jnp.pad(x_q, ((0, Mp - M), (0, 0)))
            x_s = jnp.pad(x_s, ((0, Mp - M), (0, 0)))
        inputs = [x_q]
        tail = [x_s]
    else:
        if Mp != M:
            x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        inputs = [x.astype(jnp.bfloat16)]
        tail = []

    grid = (Mp // bm, N // bn, K // block_k)
    in_specs = [
        pl.BlockSpec((bm, block_k), lambda i, j, k: (i, k)),
        pl.BlockSpec((block_k // 2, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((K // group_size, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((K // group_size, bn), lambda i, j, k: (0, j)),
    ]
    if act_int8:
        in_specs.append(pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)))
    out = pl.pallas_call(
        functools.partial(
            _int4_kernel,
            block_k=block_k,
            group_size=group_size,
            out_dtype=out_dtype,
            act_int8=act_int8,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(inputs[0], w_packed, scale, zero, *tail)
    return out[:M]


# ======================================================================
# INT8 W8A8 matmul (per-token act scales × per-channel weight scales)
# ======================================================================


def _int8_kernel(
    x_ref,  # [BM, BK] int8
    w_ref,  # [BK, BN] int8
    xs_ref,  # [BM, 1] f32  (actually [BM, 128] padded strip)
    ws_ref,  # [1, BN] f32
    o_ref,  # [BM, BN]
    acc_ref,  # [BM, BN] int32
    *,
    out_dtype,
):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += lax.dot_general(
        x_ref[...],
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _store():
        xs = xs_ref[:, 0:1]
        ws = ws_ref[0:1, :]
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * xs * ws).astype(
            out_dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def int8_matmul(
    x_q: jax.Array,  # [M, K] int8
    x_scale: jax.Array,  # [M, 1] f32
    w_q: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [1, N] f32
    *,
    block_m: int = 1024,
    block_n: int = 2048,  # large N blocks: x re-fetches once per N tile
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    M, K = x_q.shape
    N = w_q.shape[1]
    block_k = min(block_k, K)  # tiny test models: one K block
    assert K % block_k == 0
    if interpret is None:
        interpret = use_interpret_mode()
    bm = min(block_m, round_up(M, 32))
    bn = min(block_n, N)
    Mp = round_up(M, bm)
    if Mp != M:
        x_q = jnp.pad(x_q, ((0, Mp - M), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))

    grid = (Mp // bm, N // bn, K // block_k)
    out = pl.pallas_call(
        functools.partial(_int8_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_q, w_q, x_scale, w_scale)
    return out[:M]


def w8a8_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array, **kw):
    """Convenience: quantize activations per-token then int8 matmul."""
    x_q, x_scale = quantize_int8_rowwise(x)
    return int8_matmul(x_q, x_scale, w_q, w_scale, **kw)
