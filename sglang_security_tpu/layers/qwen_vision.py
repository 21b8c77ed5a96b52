"""Qwen2-VL / Qwen2.5-VL vision transformer (functional JAX).

TPU-native redesign of the reference's Qwen2 vision stack
(``srt/models/qwen2_vl.py`` vision half and
``srt/layers/attention/vision.py``; HF
``Qwen2VisionTransformerPretrainedModel`` /
``Qwen2_5_VisionTransformerPretrainedModel`` define the math):

- dynamic-resolution images arrive as a flattened patch sequence
  ``[n_patches, C*Tp*p*p]`` (the HF processor layout); the runner pads
  the sequence to a bucket so each bucket is one compiled program;
- 2D rotary positions, window/full attention segmentation, and the
  2.5 window permutation are all **host-precomputed metadata** (numpy,
  ``qwen_vision_metadata``) — inside the jit they are plain array
  inputs, so there is no data-dependent control flow to unroll;
- attention is one fused XLA softmax-matmul chain with an additive
  segment mask (window id or frame id).  Patch counts are a few
  thousand at most, so a Pallas kernel is not warranted; the windowed
  layers' block-diagonal structure is future fuel if vision encode
  ever shows up in profiles.

Weight layout follows HF ``visual.*`` checkpoints for both families.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _layer_norm(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _rms_norm(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt((x32 * x32).mean(-1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


class QwenVisionConfig:
    """Subset of HF Qwen2VLVisionConfig / Qwen2_5_VLVisionConfig."""

    def __init__(self, d: dict, v25: bool):
        self.v25 = v25
        self.depth = d.get("depth", 32)
        # 2.0 names the width embed_dim; 2.5 names it hidden_size
        self.embed_dim = d.get("embed_dim") or d.get("hidden_size", 1280)
        self.num_heads = d.get("num_heads", 16)
        self.patch_size = d.get("patch_size", 14)
        self.temporal_patch_size = d.get("temporal_patch_size", 2)
        self.spatial_merge_size = d.get("spatial_merge_size", 2)
        self.in_channels = d.get("in_channels", 3)
        if v25:
            self.out_hidden = d.get("out_hidden_size", 3584)
            self.mlp_hidden = d.get("intermediate_size", 3420)
            self.act = d.get("hidden_act", "silu")
            self.window_size = d.get("window_size", 112)
            self.fullatt_blocks = set(
                d.get("fullatt_block_indexes") or [7, 15, 23, 31]
            )
        else:
            self.out_hidden = d.get("hidden_size", 3584)
            self.mlp_hidden = int(self.embed_dim * d.get("mlp_ratio", 4))
            self.act = d.get("hidden_act", "quick_gelu")
            self.window_size = None
            self.fullatt_blocks = set(range(self.depth))

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2


def qwen_vision_metadata(cfg: QwenVisionConfig, grid_thw) -> dict:
    """Host-side per-image metadata (numpy), all in the order the tower
    consumes patches.

    Returns dict with (n = t*h*w patches):
      perm       [n] patch permutation applied to the HF-order patch
                 sequence before the tower (identity for 2.0)
      rot_freqs  [n, head_dim//2] f32 rope angles (h then w halves;
                 HF rot_pos_emb), already permuted
      win_seg    [n] i32 window id per patch (2.5 windowed layers);
                 frame id for 2.0
      full_seg   [n] i32 frame id per patch (full-attention layers)
      inv_perm   [n_merged] output-row unpermutation (HF argsort of
                 window_index; identity for 2.0)
      n_merged   tokens this image contributes to the LM
    """
    t, h, w = int(grid_thw[0]), int(grid_thw[1]), int(grid_thw[2])
    m = cfg.spatial_merge_size
    lh, lw = h // m, w // m

    # grid coords per patch in HF flatten order (t, lh, lw, m, m)
    hpos = np.arange(h, dtype=np.int64)[:, None] * np.ones(w, np.int64)
    wpos = np.ones(h, np.int64)[:, None] * np.arange(w, dtype=np.int64)

    def merge_order(a):
        return a.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)

    hpos = np.tile(merge_order(hpos), t)
    wpos = np.tile(merge_order(wpos), t)
    full_seg = np.repeat(np.arange(t, dtype=np.int32), h * w)

    n_merged = t * lh * lw
    if cfg.window_size is None:
        perm = np.arange(t * h * w, dtype=np.int64)
        win_seg = full_seg
        inv_perm = np.arange(n_merged, dtype=np.int64)
    else:
        # HF get_window_index over merged units
        ws = cfg.window_size // m // cfg.patch_size  # merged units per window
        pad_h = (-lh) % ws
        pad_w = (-lw) % ws
        nwh, nww = (lh + pad_h) // ws, (lw + pad_w) // ws
        idx = np.arange(n_merged, dtype=np.int64).reshape(t, lh, lw)
        idxp = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        idxp[:, :lh, :lw] = idx
        idxp = idxp.reshape(t, nwh, ws, nww, ws).transpose(0, 1, 3, 2, 4)
        idxp = idxp.reshape(t * nwh * nww, ws * ws)
        window_index = idxp.reshape(-1)
        window_index = window_index[window_index != -100]
        # window id per merged unit (in permuted order)
        sizes = (idxp != -100).sum(1)
        win_of_merged = np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
        mu = m * m
        perm = (window_index[:, None] * mu
                + np.arange(mu, dtype=np.int64)[None, :]).reshape(-1)
        win_seg = np.repeat(win_of_merged, mu)
        hpos, wpos = hpos[perm], wpos[perm]
        full_seg = full_seg[perm]
        inv_perm = np.argsort(window_index)

    inv = 1.0 / (
        10000.0 ** (np.arange(0, cfg.head_dim // 2, 2, dtype=np.float64)
                    / (cfg.head_dim // 2))
    )
    rot_freqs = np.concatenate(
        [hpos[:, None] * inv[None, :], wpos[:, None] * inv[None, :]], axis=1
    ).astype(np.float32)
    return {
        "perm": perm,
        "rot_freqs": rot_freqs,
        "win_seg": win_seg.astype(np.int32),
        "full_seg": full_seg.astype(np.int32),
        "inv_perm": inv_perm,
        "n_merged": n_merged,
        "llm_grid": (t, lh, lw),  # LM-token grid (M-RoPE components)
    }


class QwenVisionTower:
    """Qwen2-VL (2.0) and Qwen2.5-VL vision encoder + patch merger."""

    def __init__(self, config: QwenVisionConfig):
        self.config = config

    # -------------------------------------------------------------- load
    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.depth):
            a = f"{prefix}blocks.{i}."
            lp = {
                "qkv_w": t(a + "attn.qkv.weight").T.astype(dtype),
                "qkv_b": t(a + "attn.qkv.bias").astype(dtype),
                "o_w": t(a + "attn.proj.weight").T.astype(dtype),
                "o_b": t(a + "attn.proj.bias").astype(dtype),
            }
            if cfg.v25:
                lp["n1_w"] = t(a + "norm1.weight").astype(dtype)
                lp["n2_w"] = t(a + "norm2.weight").astype(dtype)
                lp["gate_w"] = t(a + "mlp.gate_proj.weight").T.astype(dtype)
                lp["gate_b"] = t(a + "mlp.gate_proj.bias").astype(dtype)
                lp["up_w"] = t(a + "mlp.up_proj.weight").T.astype(dtype)
                lp["up_b"] = t(a + "mlp.up_proj.bias").astype(dtype)
                lp["down_w"] = t(a + "mlp.down_proj.weight").T.astype(dtype)
                lp["down_b"] = t(a + "mlp.down_proj.bias").astype(dtype)
            else:
                lp["n1_w"] = t(a + "norm1.weight").astype(dtype)
                lp["n1_b"] = t(a + "norm1.bias").astype(dtype)
                lp["n2_w"] = t(a + "norm2.weight").astype(dtype)
                lp["n2_b"] = t(a + "norm2.bias").astype(dtype)
                lp["fc1_w"] = t(a + "mlp.fc1.weight").T.astype(dtype)
                lp["fc1_b"] = t(a + "mlp.fc1.bias").astype(dtype)
                lp["fc2_w"] = t(a + "mlp.fc2.weight").T.astype(dtype)
                lp["fc2_b"] = t(a + "mlp.fc2.bias").astype(dtype)
            layers.append(lp)
        cfgE = cfg.embed_dim
        mp = f"{prefix}merger."
        # conv3d [E, C, Tp, p, p] -> matmul weight [C*Tp*p*p, E]
        pw = np.asarray(t(prefix + "patch_embed.proj.weight"), np.float32)
        params = {
            "patch_w": jnp.asarray(pw.reshape(cfgE, -1).T, dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
            "m_w1": t(mp + "mlp.0.weight").T.astype(dtype),
            "m_b1": t(mp + "mlp.0.bias").astype(dtype),
            "m_w2": t(mp + "mlp.2.weight").T.astype(dtype),
            "m_b2": t(mp + "mlp.2.bias").astype(dtype),
        }
        if cfg.v25:
            params["m_ln_w"] = t(mp + "ln_q.weight").astype(dtype)
        else:
            params["m_ln_w"] = t(mp + "ln_q.weight").astype(dtype)
            params["m_ln_b"] = t(mp + "ln_q.bias").astype(dtype)
        return params

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        E, M = cfg.embed_dim, cfg.mlp_hidden

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        def layer():
            lp = {
                "qkv_w": r(E, 3 * E), "qkv_b": jnp.zeros(3 * E, dtype),
                "o_w": r(E, E), "o_b": jnp.zeros(E, dtype),
                "n1_w": jnp.ones(E, dtype), "n2_w": jnp.ones(E, dtype),
            }
            if cfg.v25:
                lp.update(
                    gate_w=r(E, M), gate_b=jnp.zeros(M, dtype),
                    up_w=r(E, M), up_b=jnp.zeros(M, dtype),
                    down_w=r(M, E), down_b=jnp.zeros(E, dtype),
                )
            else:
                lp.update(
                    n1_b=jnp.zeros(E, dtype), n2_b=jnp.zeros(E, dtype),
                    fc1_w=r(E, M), fc1_b=jnp.zeros(M, dtype),
                    fc2_w=r(M, E), fc2_b=jnp.zeros(E, dtype),
                )
            return lp

        mu = cfg.spatial_merge_size ** 2
        params = {
            "patch_w": r(cfg.patch_dim, E),
            "layers": jax.tree.map(
                lambda *xs: jnp.stack(xs), *[layer() for _ in range(cfg.depth)]
            ),
            "m_ln_w": jnp.ones(E, dtype),
            "m_w1": r(mu * E, mu * E),
            "m_b1": jnp.zeros(mu * E, dtype),
            "m_w2": r(mu * E, cfg.out_hidden),
            "m_b2": jnp.zeros(cfg.out_hidden, dtype),
        }
        if not cfg.v25:
            params["m_ln_b"] = jnp.zeros(E, dtype)
        return params

    # ----------------------------------------------------------- forward
    def forward(
        self,
        params,
        patches: jax.Array,  # [Sp, patch_dim] permuted + padded
        rot_freqs: jax.Array,  # [Sp, head_dim//2] f32
        win_seg: jax.Array,  # [Sp] i32, -1 = pad
        full_seg: jax.Array,  # [Sp] i32, -1 = pad
    ) -> jax.Array:
        """Returns merged features [Sp // merge^2, out_hidden]; rows past
        the image's n_merged are padding garbage (sliced off by the
        caller, model_runner.prepare_mm)."""
        cfg = self.config
        Sp = patches.shape[0]
        nh, hd = cfg.num_heads, cfg.head_dim
        x = patches.astype(params["patch_w"].dtype) @ params["patch_w"]

        cos = jnp.cos(rot_freqs)[:, None, :]  # [Sp, 1, hd/2]
        sin = jnp.sin(rot_freqs)[:, None, :]

        def rope(v):  # HF apply_rotary_pos_emb_vision (rotate_half, f32)
            v = v.astype(jnp.float32)
            x1, x2 = v[..., : hd // 2], v[..., hd // 2:]
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            )

        def seg_bias(seg):
            ok = (seg[:, None] == seg[None, :]) & (seg >= 0)[None, :]
            return jnp.where(ok, 0.0, -1e9).astype(jnp.float32)

        win_bias = seg_bias(win_seg)
        full_bias = seg_bias(full_seg)
        act = _ACTS[cfg.act]
        scale = hd ** -0.5

        def attn(h, lp, bias):
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv.reshape(Sp, 3, nh, hd), 3, axis=1)
            q, k = rope(q[:, 0]), rope(k[:, 0])
            v = v[:, 0]
            att = jnp.einsum("qhd,khd->hqk", q, k) * scale + bias[None]
            att = jax.nn.softmax(att, axis=-1).astype(h.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(Sp, nh * hd)
            return o @ lp["o_w"] + lp["o_b"]

        def block(x, xs):
            lp, is_full = xs
            bias = jnp.where(is_full, full_bias, win_bias)
            if cfg.v25:
                x = x + attn(_rms_norm(x, lp["n1_w"]), lp, bias)
                h = _rms_norm(x, lp["n2_w"])
                h = (act(h @ lp["gate_w"] + lp["gate_b"])
                     * (h @ lp["up_w"] + lp["up_b"]))
                x = x + (h @ lp["down_w"] + lp["down_b"])
            else:
                x = x + attn(
                    _layer_norm(x, lp["n1_w"], lp["n1_b"]), lp, bias
                )
                h = _layer_norm(x, lp["n2_w"], lp["n2_b"])
                h = act(h @ lp["fc1_w"] + lp["fc1_b"])
                x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
            return x, None

        is_full = jnp.asarray(
            [i in cfg.fullatt_blocks for i in range(cfg.depth)], jnp.bool_
        )
        x, _ = jax.lax.scan(block, x, (params["layers"], is_full))

        # patch merger: consecutive merge^2 patches -> one LM token
        mu = cfg.spatial_merge_size ** 2
        if cfg.v25:
            x = _rms_norm(x, params["m_ln_w"])
        else:
            x = _layer_norm(x, params["m_ln_w"], params["m_ln_b"])
        x = x.reshape(Sp // mu, mu * cfg.embed_dim)
        x = jax.nn.gelu(x @ params["m_w1"] + params["m_b1"], approximate=False)
        return x @ params["m_w2"] + params["m_b2"]
