"""Normalization layers (RMSNorm / LayerNorm), XLA-fused.

The reference ships fused CUDA add+rmsnorm kernels
(``sgl-kernel/csrc/elementwise``); on TPU, XLA fuses the residual add and
the norm into neighboring ops on its own, so these are plain jnp with
float32 statistics (SURVEY.md §2.3: "fuse into Pallas blocks or rely on
XLA fusion; custom only where profiled").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6
) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: Optional[jax.Array], weight: jax.Array,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (normed, new_residual)."""
    if residual is not None:
        x = x + residual
    return rms_norm(x, weight, eps), x


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def gemma_rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6):
    """Gemma convention: scale by (1 + w)."""
    return rms_norm(x, weight.astype(jnp.float32) + 1.0, eps)
