"""Real quantized-checkpoint ingestion: AWQ / GPTQ / FP8.

Capability parity with the reference's quantization loaders
(``srt/layers/quantization/awq.py``/``gptq.py`` weight repacking and
``fp8.py`` scale handling; loader paths ``model_loader/loader.py``):
packed checkpoint tensors are decoded *exactly* into this framework's
int4 convention — w = (q - zero) * scale with q in [0, 15] and
per-(group, column) scale/zero — so no dequant->requant double error,
then re-packed tile-locally for the fused Pallas dequant matmul
(``ops/quant_matmul.py``).

FP8 (e4m3) checkpoints dequantize via their weight_scale and ride the
int8 w8a8 MXU path with per-output-channel scales: v5e's MXU runs int8
at 2x bf16 throughput, which is the role fp8 tensor cores play on
H100-class GPUs (design note in SURVEY.md §2.3 gemm row).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

# AWQ packs 8 nibbles per int32 along N in the interleaved order below;
# indexing the shift-unpacked lanes with AWQ_ORDER restores column order
# (AutoAWQ unpack_awq/reverse_awq_order semantics).
AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
SHIFTS = np.arange(0, 32, 4)


class QuantLinear(NamedTuple):
    """Exact int4 linear: w[K, N] = (q - zero) * scale."""

    q: np.ndarray  # [K, N] uint8 in [0, 15]
    scale: np.ndarray  # [K//G, N] f32
    zero: np.ndarray  # [K//G, N] f32
    group_size: int


def _unpack_rows_int32(packed: np.ndarray) -> np.ndarray:
    """int32 [..., M] -> uint8 [..., M*8] (low nibble first)."""
    u = packed.astype(np.uint32)
    out = (u[..., None] >> SHIFTS[None, :]) & 0xF
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(
        np.uint8
    )


def _reverse_awq_order(x: np.ndarray) -> np.ndarray:
    """Undo AWQ's in-word column interleave along the last axis."""
    n = x.shape[-1]
    y = x.reshape(*x.shape[:-1], n // 8, 8)[..., AWQ_ORDER]
    return y.reshape(*x.shape[:-1], n)


def read_awq_linear(get_tensor, prefix: str) -> QuantLinear:
    """AWQ checkpoint tensors (already [in, out] oriented):
    qweight i32 [K, N//8], qzeros i32 [K//G, N//8], scales f16 [K//G, N]."""
    qweight = np.asarray(get_tensor(prefix + ".qweight"))
    qzeros = np.asarray(get_tensor(prefix + ".qzeros"))
    scales = np.asarray(get_tensor(prefix + ".scales"), dtype=np.float32)
    q = _reverse_awq_order(_unpack_rows_int32(qweight))  # [K, N]
    z = _reverse_awq_order(_unpack_rows_int32(qzeros)).astype(np.float32)
    K = q.shape[0]
    G = K // scales.shape[0]
    return QuantLinear(q=q, scale=scales, zero=z, group_size=G)


def read_gptq_linear(get_tensor, prefix: str) -> QuantLinear:
    """GPTQ tensors: qweight i32 [K//8, N] packed along K (sequential
    nibble order), qzeros i32 [K//G, N//8] packed along N, scales
    [K//G, N].  Stored zeros carry the classic GPTQ -1 offset
    (actual zero = unpacked + 1).  ``g_idx`` row permutations
    (desc_act=True) are not supported."""
    try:
        g_idx = np.asarray(get_tensor(prefix + ".g_idx"))
        K = g_idx.shape[0]
        expect = np.arange(K) // (K // len(set(g_idx.tolist())) or 1)
        if not np.array_equal(np.sort(g_idx), g_idx):
            raise NotImplementedError(
                "GPTQ desc_act (activation-order) checkpoints are not "
                "supported; re-quantize with desc_act=False"
            )
    except KeyError:
        pass
    qweight = np.asarray(get_tensor(prefix + ".qweight"))
    qzeros = np.asarray(get_tensor(prefix + ".qzeros"))
    scales = np.asarray(get_tensor(prefix + ".scales"), dtype=np.float32)
    # unpack along K: [K//8, N] i32 -> [K, N]
    u = qweight.astype(np.uint32)
    q = np.empty((qweight.shape[0] * 8, qweight.shape[1]), np.uint8)
    for i, sh in enumerate(SHIFTS):
        q[i::8] = (u >> sh) & 0xF
    z = _unpack_rows_int32(qzeros).astype(np.float32) + 1.0
    K = q.shape[0]
    G = K // scales.shape[0]
    return QuantLinear(q=q, scale=scales, zero=z, group_size=G)


def pack_awq_linear(
    q: np.ndarray, scale: np.ndarray, zero: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of read_awq_linear — used by tests to synthesize AWQ
    checkpoints without network access."""
    def pack_n(x):
        n = x.shape[-1]
        y = np.empty_like(x)
        y.reshape(*x.shape[:-1], n // 8, 8)[..., AWQ_ORDER] = x.reshape(
            *x.shape[:-1], n // 8, 8
        )
        words = np.zeros((*x.shape[:-1], n // 8), np.uint32)
        yr = y.reshape(*x.shape[:-1], n // 8, 8).astype(np.uint32)
        for i, sh in enumerate(SHIFTS):
            words |= (yr[..., i] << np.uint32(sh)).astype(np.uint32)
        return words.view(np.int32)

    qweight = pack_n(q.astype(np.uint8))
    qzeros = pack_n(np.round(zero).astype(np.uint8))
    return qweight, qzeros, scale.astype(np.float16)


def read_fp8_linear(get_tensor, prefix: str) -> np.ndarray:
    """FP8 (e4m3) weight + weight_scale -> dequantized f32 [out, in]."""
    import jax.numpy as jnp

    w8 = get_tensor(prefix + ".weight")
    w = np.asarray(jnp.asarray(w8).astype(jnp.float32))
    for scale_name in (".weight_scale", ".weight_scale_inv"):
        try:
            s = np.asarray(get_tensor(prefix + scale_name), np.float32)
        except KeyError:
            continue
        if s.ndim == 0 or s.size == 1:
            return w * float(np.asarray(s).reshape(-1)[0])
        if s.ndim == 1 or (s.ndim == 2 and 1 in s.shape):
            return w * s.reshape(-1, 1)  # per-output-channel
        # blockwise (deepseek-style [K//bk, N//bn]) scales
        bk = -(-w.shape[0] // s.shape[0])
        bn = -(-w.shape[1] // s.shape[1])
        return w * np.kron(s, np.ones((bk, bn)))[: w.shape[0], : w.shape[1]]
    return w  # no scale tensor: plain cast


def detect_checkpoint_quant(config_raw: dict) -> Optional[str]:
    """Map config.json quantization_config to a loader scheme."""
    qc = config_raw.get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or "").lower()
    if method == "awq":
        return "awq"
    if method == "gptq":
        return "gptq"
    if method in ("fp8", "fbgemm_fp8", "modelopt"):
        return "fp8"
    if method == "bitsandbytes":
        # BnB 4-bit is dequantized at load (model_loader/bnb.py) and
        # re-quantized onto the int4 serving kernels
        return "bitsandbytes"
    if method == "compressed-tensors":
        fmt = str(qc.get("format", "")).lower()
        if "fp8" in fmt or "float8" in fmt:
            return "fp8"
    return None
