"""Device-resident paged KV cache pool.

The TPU analog of the reference's ``MHATokenToKVPool``
(``srt/mem_cache/memory_pool.py:238``): per-layer K/V page buffers in HBM.
Differences by design:

  * Layout ``[num_layers, num_kv_heads, num_pages, page_size, head_dim]``
    matches the attention kernel's per-head page-DMA pattern and shards
    over a ``tp`` mesh axis on dim 1.
  * Updates are functional: the jitted forward step takes the arrays,
    scatters new K/V at token slots, and returns the updated arrays
    (donated, so XLA aliases them in place).  The pool object just owns
    the latest arrays between steps.
  * Quantized storage (int8/fp8, analog of ``fused_downcast:416``) stores
    per-token scales alongside the pages.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KVCachePool:
    def __init__(
        self,
        num_layers: int,
        num_kv_heads: int,
        num_pages: int,
        page_size: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        kv_quant_dtype: Optional[str] = None,  # None | "int8" | "fp8"
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.num_pages = num_pages
        self.page_size = page_size
        self.head_dim = head_dim
        self.kv_quant_dtype = kv_quant_dtype
        if kv_quant_dtype == "int8":
            store_dtype = jnp.int8
        elif kv_quant_dtype == "fp8":
            store_dtype = jnp.float8_e4m3fn
        else:
            store_dtype = dtype
        self.store_dtype = store_dtype
        self.compute_dtype = dtype
        # head-major flat token dim: pages are row ranges of dim 2
        # (see ops/ragged_paged_attention layout note)
        shape = (num_layers, num_kv_heads, num_pages * page_size, head_dim)

        def _zeros():
            z = jnp.zeros(shape, store_dtype)
            if sharding is not None:
                z = jax.device_put(z, sharding)
            return z

        self.k_pages = _zeros()
        self.v_pages = _zeros()
        # per-token dequant scales for quantized KV (bf16; 1/head_dim overhead)
        if kv_quant_dtype is not None:
            sshape = (num_layers, num_kv_heads, num_pages, page_size, 1)
            self.k_scales = jnp.ones(sshape, jnp.bfloat16)
            self.v_scales = jnp.ones(sshape, jnp.bfloat16)
        else:
            self.k_scales = self.v_scales = None

    # ------------------------------------------------------------------
    def mem_usage_bytes(self) -> int:
        n = int(np.prod(self.k_pages.shape)) * self.k_pages.dtype.itemsize * 2
        if self.k_scales is not None:
            n += int(np.prod(self.k_scales.shape)) * 2 * 2
        return n

    def buffers(self):
        """The pytree threaded through the jitted step (donated)."""
        if self.k_scales is None:
            return (self.k_pages, self.v_pages)
        return (self.k_pages, self.v_pages, self.k_scales, self.v_scales)

    def update(self, buffers) -> None:
        if self.k_scales is None:
            self.k_pages, self.v_pages = buffers
        else:
            self.k_pages, self.v_pages, self.k_scales, self.v_scales = buffers

    def clear(self) -> None:
        self.k_pages = jnp.zeros_like(self.k_pages)
        self.v_pages = jnp.zeros_like(self.v_pages)


def write_kv(
    k_pages: jax.Array,  # [Hkv, P, ps, hd] (one layer)
    v_pages: jax.Array,
    k_new: jax.Array,  # [T, Hkv, hd]
    v_new: jax.Array,
    slots: jax.Array,  # [T] i32 global token slot = page * page_size + offset
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new-token K/V into the page pool (one layer), via XLA scatter.

    Rows with slot < 0 (padding) are dropped.  This replaces the
    reference's set_kv_buffer CUDA path; a plain scatter is
    bandwidth-optimal here and XLA fuses the dtype conversion.
    """
    Hkv, P, ps, hd = k_pages.shape
    flat_k = k_pages.reshape(Hkv, P * ps, hd)
    flat_v = v_pages.reshape(Hkv, P * ps, hd)
    safe = jnp.where(slots < 0, P * ps, slots)  # OOB rows are dropped
    kn = k_new.astype(k_pages.dtype).transpose(1, 0, 2)  # [Hkv, T, hd]
    vn = v_new.astype(v_pages.dtype).transpose(1, 0, 2)
    flat_k = flat_k.at[:, safe].set(kn, mode="drop")
    flat_v = flat_v.at[:, safe].set(vn, mode="drop")
    return flat_k.reshape(k_pages.shape), flat_v.reshape(v_pages.shape)


def write_kv_quantized(
    k_pages: jax.Array,  # int8/fp8 [Hkv, P, ps, hd]
    v_pages: jax.Array,
    k_scales: jax.Array,  # [Hkv, P, ps, 1] bf16
    v_scales: jax.Array,
    k_new: jax.Array,  # [T, Hkv, hd] bf16
    v_new: jax.Array,
    slots: jax.Array,
):
    """Per-token symmetric quantize + scatter (analog of fused_downcast)."""
    Hkv, P, ps, hd = k_pages.shape
    if k_pages.dtype == jnp.int8:
        qmax = 127.0
        cast = lambda x: jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
    else:
        qmax = 448.0  # e4m3 max
        cast = lambda x: x.astype(k_pages.dtype)

    def quant(x):  # [T, Hkv, hd] -> (q, scale[T, Hkv, 1])
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-6) / qmax
        return cast(x.astype(jnp.float32) / scale), scale.astype(jnp.bfloat16)

    kq, ks = quant(k_new)
    vq, vs = quant(v_new)
    safe = jnp.where(slots < 0, P * ps, slots)
    out_k = (
        k_pages.reshape(Hkv, P * ps, hd)
        .at[:, safe]
        .set(kq.transpose(1, 0, 2), mode="drop")
        .reshape(k_pages.shape)
    )
    out_v = (
        v_pages.reshape(Hkv, P * ps, hd)
        .at[:, safe]
        .set(vq.transpose(1, 0, 2), mode="drop")
        .reshape(v_pages.shape)
    )
    out_ks = (
        k_scales.reshape(Hkv, P * ps, 1)
        .at[:, safe]
        .set(ks.transpose(1, 0, 2), mode="drop")
        .reshape(k_scales.shape)
    )
    out_vs = (
        v_scales.reshape(Hkv, P * ps, 1)
        .at[:, safe]
        .set(vs.transpose(1, 0, 2), mode="drop")
        .reshape(v_scales.shape)
    )
    return out_k, out_v, out_ks, out_vs
