"""Rotary position embeddings (NeoX-style half rotation).

Capability parity with ``srt/layers/rotary_embedding.py``: base RoPE plus
llama3 frequency scaling and linear/dynamic-NTK scaling.  Frequencies are
computed on the fly from positions (cheap VPU work that XLA fuses into the
surrounding projections — no [max_pos, dim] cos/sin cache to manage).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(
    rotary_dim: int,
    base: float,
    scaling: Optional[dict] = None,
) -> np.ndarray:
    """Static inverse-frequency vector [rotary_dim//2], with rope-scaling."""
    inv = 1.0 / (
        base ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    )
    if not scaling:
        return inv.astype(np.float32)
    kind = scaling.get("rope_type", scaling.get("type", ""))
    if kind == "llama3":
        factor = scaling["factor"]
        lo = scaling.get("low_freq_factor", 1.0)
        hi = scaling.get("high_freq_factor", 4.0)
        orig = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * math.pi / inv
        lo_wl, hi_wl = orig / lo, orig / hi
        scaled = np.where(wavelen > lo_wl, inv / factor, inv)
        smooth = (orig / wavelen - lo) / (hi - lo)
        mid = (1 - smooth) * inv / factor + smooth * inv
        is_mid = (wavelen <= lo_wl) & (wavelen >= hi_wl)
        inv = np.where(is_mid, mid, scaled)
    elif kind == "linear":
        inv = inv / scaling["factor"]
    elif kind in ("dynamic", "yarn", "default", ""):
        pass  # dynamic NTK/yarn handled at config load; default = no-op
    return inv.astype(np.float32)


def apply_rope(
    q: jax.Array,  # [T, num_heads, head_dim]
    k: jax.Array,  # [T, num_kv_heads, head_dim]
    positions: jax.Array,  # [T] i32
    inv_freq: jax.Array,  # [rotary_dim // 2]
    rotary_dim: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    head_dim = q.shape[-1]
    rd = rotary_dim or head_dim
    half = rd // 2
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(freqs)[:, None, :]  # [T, 1, half]
    sin = jnp.sin(freqs)[:, None, :]

    def rot(x):
        xr, xp = x[..., :rd], x[..., rd:]
        x1, x2 = xr[..., :half], xr[..., half:]
        xf1 = x1.astype(jnp.float32)
        xf2 = x2.astype(jnp.float32)
        o1 = xf1 * cos - xf2 * sin
        o2 = xf2 * cos + xf1 * sin
        return jnp.concatenate([o1.astype(x.dtype), o2.astype(x.dtype), xp], axis=-1)

    return rot(q), rot(k)
