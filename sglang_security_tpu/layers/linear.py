"""Quantization-polymorphic linear application.

A linear's params are a dict whose *structure* (not a tag leaf) encodes
the scheme, so stacked per-layer params stay a valid homogeneous pytree
under ``lax.scan``:
  {"w": [K, N]}  (+"b")                                  bf16
  {"packed": [K//2, N] i8, "scale": [K//G, N], "zero": [K//G, N]}   int4
  {"w_q": [K, N] i8, "w_scale": [1, N]}                  int8 (w8a8)

``apply_linear`` dispatches to the fused Pallas kernels for quantized
kinds.  This one function is the capability equivalent of the reference's
ColumnParallel/RowParallel/MergedColumn/QKVParallel linear classes
(``srt/layers/linear.py:102-1130``): merging (QKV, gate+up) happens at
weight-load time by concatenating along N; row/column parallelism is a
sharding annotation over the dict (``parallel/shardings.py``), not a
class hierarchy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sglang_security_tpu.ops.quant_matmul import (
    int4_matmul,
    pack_int4,
    quantize_int4,
    quantize_int8_weight,
    w8a8_matmul,
)


def merge_for_tp(ws, tp_size: int, biases=None):
    """Merge column-parallel weights [K, Ni] so contiguous N-sharding over
    `tp_size` shards yields [w0_s, w1_s, ...] per shard (the reference's
    QKVParallel/MergedColumn per-rank slicing, done once at load)."""
    if tp_size == 1:
        w = jnp.concatenate(ws, axis=1)
        b = jnp.concatenate(biases, axis=0) if biases is not None else None
        return w, b
    shards_w, shards_b = [], []
    for s in range(tp_size):
        for i, w in enumerate(ws):
            n = w.shape[1] // tp_size
            shards_w.append(w[:, s * n : (s + 1) * n])
            if biases is not None:
                b = biases[i]
                nb = b.shape[0] // tp_size
                shards_b.append(b[s * nb : (s + 1) * nb])
    w = jnp.concatenate(shards_w, axis=1)
    b = jnp.concatenate(shards_b, axis=0) if biases is not None else None
    return w, b


_DEFAULT_GROUP_SIZE = 128

# Trace-time activation-path override for int4 linears.  The runner sets
# "int8" around DECODE step tracing/dispatch when --decode-act-int8 is on
# (default; gated by FIDELITY_r04.json: int8 activations add ~nothing on
# top of weight-int4 error, and the int8 MXU path runs at 2x bf16 rate —
# QServe-style w4a8 for the bandwidth-bound decode phase only).  Prefill
# and spec-verify traces keep bf16 activations.
_ACT_OVERRIDE = None


def set_act_override(mode):
    """mode: None (bf16 activations) or "int8" (w4a8 decode)."""
    global _ACT_OVERRIDE
    _ACT_OVERRIDE = mode


def set_default_group_size(n: int) -> None:
    """--quantization-group-size: group width for quantize-at-load int4
    (reference per-group quant schemes take the group size from the
    checkpoint config; ours is a serve-time knob for on-the-fly quant)."""
    global _DEFAULT_GROUP_SIZE
    if n & (n - 1) or n < 32:
        raise ValueError(f"quantization_group_size must be a power of two"
                         f" >= 32, got {n}")
    _DEFAULT_GROUP_SIZE = int(n)


def make_linear_params(
    w: jax.Array,  # [K, N]
    bias: Optional[jax.Array] = None,
    quantization: Optional[str] = None,
    group_size: int = 0,  # 0 = the serve-time default
    dtype=jnp.bfloat16,
) -> dict:
    if quantization in (None, "none", "bf16"):
        p = {"w": w.astype(dtype)}
    elif quantization in ("int4", "awq", "gptq", "int4-a8", "w4a8"):
        g = group_size or _DEFAULT_GROUP_SIZE
        g = min(g, w.shape[0])  # tiny test models: one group over K
        q, s, z = quantize_int4(w, g)
        key = "packed_a8" if quantization in ("int4-a8", "w4a8") else "packed"
        p = {key: pack_int4(q), "scale": s, "zero": z}
    elif quantization in ("int8", "w8a8", "fp8"):
        # fp8 maps to the int8 MXU path on TPU (see ops/quant_matmul.py)
        w_q, w_s = quantize_int8_weight(w)
        p = {"w_q": w_q, "w_scale": w_s}
    else:
        raise ValueError(f"unknown quantization {quantization}")
    if bias is not None:
        p["b"] = bias.astype(dtype)
    return p


def load_merged_linear(
    get_tensor,
    names,  # ['...weight', ...] HF tensor names to merge along N
    bias_names,
    quantization: Optional[str],
    tp_size: int,
    dtype=jnp.bfloat16,
) -> dict:
    """Build merged linear params from an HF checkpoint accessor, ingesting
    real AWQ/GPTQ packed tensors or FP8 weights exactly when present
    (model_loader/quant_ingest.py); falls back to quantize-at-load of
    full-precision weights otherwise."""
    from sglang_security_tpu.model_loader.quant_ingest import (
        read_awq_linear,
        read_fp8_linear,
        read_gptq_linear,
    )

    prefixes = [n[: -len(".weight")] for n in names]

    def has(name):
        try:
            get_tensor(name)
            return True
        except KeyError:
            return False

    bias = None
    if bias_names and all(has(n) for n in bias_names):
        bs = [jnp.asarray(get_tensor(n)).astype(jnp.float32) for n in bias_names]
        _, bias = merge_for_tp([jnp.zeros((1, b.shape[0])) for b in bs],
                               tp_size, bs)

    if has(prefixes[0] + ".qweight"):
        reader = (
            read_gptq_linear if quantization == "gptq" else read_awq_linear
        )
        qls = [reader(get_tensor, p) for p in prefixes]
        q_m, _ = merge_for_tp([jnp.asarray(ql.q) for ql in qls], tp_size)
        s_m, _ = merge_for_tp([jnp.asarray(ql.scale) for ql in qls], tp_size)
        z_m, _ = merge_for_tp([jnp.asarray(ql.zero) for ql in qls], tp_size)
        p = {
            "packed": pack_int4(q_m.astype(jnp.uint8)),
            "scale": s_m.astype(jnp.float32),
            "zero": z_m.astype(jnp.float32),
        }
        if bias is not None:
            p["b"] = bias.astype(dtype)
        return p

    if has(prefixes[0] + ".weight_scale") or has(
        prefixes[0] + ".weight_scale_inv"
    ):
        ws = [
            jnp.asarray(read_fp8_linear(get_tensor, p)).T for p in prefixes
        ]
        w, b = merge_for_tp(ws, tp_size, None)
        return make_linear_params(
            w, bias=bias, quantization=quantization or "fp8", dtype=dtype
        )

    ws = [jnp.asarray(get_tensor(n)).astype(jnp.float32).T for n in names]
    w, _ = merge_for_tp(ws, tp_size, None)
    return make_linear_params(
        w, bias=bias, quantization=quantization, dtype=dtype
    )


def apply_linear(x: jax.Array, p: dict, group_size: int = 0,
                 out_dtype=None) -> jax.Array:
    """x: [..., K] -> [..., N]; dispatch on param-dict structure.
    ``out_dtype`` overrides the output dtype (f32 for logits heads so a
    quantized head's scaled accumulator is not rounded through bf16)."""
    shape = x.shape
    od = out_dtype or x.dtype
    x2 = x.reshape(-1, shape[-1])
    if "w" in p:
        out = jnp.dot(
            x2.astype(p["w"].dtype), p["w"], preferred_element_type=jnp.float32
        ).astype(od)
    elif "packed" in p or "packed_a8" in p:
        # group size is implied by the scale rows: K / (K/G); the
        # "packed_a8" key (or the decode-time act override) selects w4a8
        # (int8 activations, 2x MXU rate)
        packed = p.get("packed", p.get("packed_a8"))
        g = group_size or 2 * packed.shape[0] // p["scale"].shape[0]
        act_int8 = "packed_a8" in p or _ACT_OVERRIDE == "int8"
        out = int4_matmul(
            x2, packed, p["scale"], p["zero"],
            group_size=g, out_dtype=od,
            act="int8" if act_int8 else "bf16",
        )
    elif "w_q" in p:
        out = w8a8_matmul(x2, p["w_q"], p["w_scale"], out_dtype=od)
    else:
        raise ValueError(f"unrecognized linear params: {list(p)}")
    if "b" in p:
        out = out + p["b"]
    return out.reshape(*shape[:-1], out.shape[-1])
