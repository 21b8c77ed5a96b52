"""Mllama (Llama-3.2-Vision) tiled ViT vision encoder (functional JAX).

TPU-native implementation of the vision side of the reference's
``srt/models/mllama.py:43-478`` (MllamaVisionModel): a tiled CLIP-style
encoder whose output feeds the text model's *cross-attention* layers
rather than replacing token embeddings.

Design (vs the reference / HF ``MllamaVisionModel``):
- one image per call with a static ``[max_num_tiles, 3, S, S]`` tile
  tensor — tile count is data-dependent (aspect ratio), but the padded
  shape is fixed, so the encoder is one compiled program (the runner's
  varlen-vision path calls it per image and caches by content hash);
- patchify is unfold+matmul (MXU-friendly) like layers/vision.py;
- the local transformer captures the 5 intermediate layer outputs with
  an in-scan select (same trick as EAGLE3 aux capture) instead of
  materializing all 32 per-layer outputs;
- tile-validity masking is key-side only: invalid-query rows are
  garbage-in-garbage-out and are never consumed (cross-attention
  masks them via its kv_len), which matches HF on all valid rows.

Weight layout follows HF ``MllamaVisionModel`` (vision_model.*).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import _ACTS, layer_norm


class MllamaVisionConfig:
    """Subset of HF MllamaVisionConfig the encoder needs."""

    def __init__(self, d: dict):
        self.hidden_size = d.get("hidden_size", 1280)
        self.intermediate_size = d.get("intermediate_size", 5120)
        self.num_layers = d.get("num_hidden_layers", 32)
        self.num_global_layers = d.get("num_global_layers", 8)
        self.num_heads = d.get("attention_heads", 16)
        self.image_size = d.get("image_size", 448)
        self.patch_size = d.get("patch_size", 14)
        self.max_num_tiles = d.get("max_num_tiles", 4)
        self.norm_eps = d.get("norm_eps", 1e-5)
        self.act = d.get("hidden_act", "gelu")
        self.intermediate_layers_indices = d.get(
            "intermediate_layers_indices", [3, 7, 15, 23, 30]
        )
        self.supported_aspect_ratios = [
            tuple(ar) for ar in d.get(
                "supported_aspect_ratios",
                [[1, 1], [1, 2], [1, 3], [1, 4], [2, 1], [2, 2], [3, 1],
                 [4, 1]],
            )
        ]
        self.vision_output_dim = d.get(
            "vision_output_dim",
            (1 + len(self.intermediate_layers_indices)) * self.hidden_size,
        )
        self.image_mean = d.get("image_mean") or [
            0.48145466, 0.4578275, 0.40821073
        ]
        self.image_std = d.get("image_std") or [
            0.26862954, 0.26130258, 0.27577711
        ]

    @property
    def max_aspect_ratio_id(self) -> int:
        return len(self.supported_aspect_ratios)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        """Patches per tile including the CLS token."""
        return self.grid * self.grid + 1

    @property
    def num_patches_padded(self) -> int:
        """num_patches rounded up to a multiple of 8 (HF pads the patch
        axis so the encoder seq length is sublane-aligned)."""
        return (self.num_patches + 7) // 8 * 8


def _encoder_layer_params(rng, D, I, dtype, gated: bool):
    def r(*shape, scale=0.02):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale, dtype
        )

    p = {
        "ln1_w": jnp.ones(D, dtype), "ln1_b": jnp.zeros(D, dtype),
        "ln2_w": jnp.ones(D, dtype), "ln2_b": jnp.zeros(D, dtype),
        "q_w": r(D, D), "k_w": r(D, D), "v_w": r(D, D), "o_w": r(D, D),
        "fc1_w": r(D, I), "fc1_b": jnp.zeros(I, dtype),
        "fc2_w": r(I, D), "fc2_b": jnp.zeros(D, dtype),
    }
    if gated:
        p["gate_attn"] = jnp.full((), math.pi / 4, dtype)
        p["gate_ffn"] = jnp.full((), math.pi / 4, dtype)
    return p


def _load_encoder_layer(t, a, dtype, gated: bool):
    p = {
        "ln1_w": t(a + "input_layernorm.weight").astype(dtype),
        "ln1_b": t(a + "input_layernorm.bias").astype(dtype),
        "ln2_w": t(a + "post_attention_layernorm.weight").astype(dtype),
        "ln2_b": t(a + "post_attention_layernorm.bias").astype(dtype),
        "q_w": t(a + "self_attn.q_proj.weight").T.astype(dtype),
        "k_w": t(a + "self_attn.k_proj.weight").T.astype(dtype),
        "v_w": t(a + "self_attn.v_proj.weight").T.astype(dtype),
        "o_w": t(a + "self_attn.o_proj.weight").T.astype(dtype),
        "fc1_w": t(a + "mlp.fc1.weight").T.astype(dtype),
        "fc1_b": t(a + "mlp.fc1.bias").astype(dtype),
        "fc2_w": t(a + "mlp.fc2.weight").T.astype(dtype),
        "fc2_b": t(a + "mlp.fc2.bias").astype(dtype),
    }
    if gated:
        p["gate_attn"] = t(a + "gate_attn").reshape(()).astype(dtype)
        p["gate_ffn"] = t(a + "gate_ffn").reshape(()).astype(dtype)
    return p


class MllamaVisionTower:
    """Tiled two-stage (local + global) ViT; returns per-patch features
    of dim ``vision_output_dim`` (final hidden ++ 5 intermediates)."""

    def __init__(self, config: MllamaVisionConfig):
        self.config = config

    # -------------------------------------------------------------- load
    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        local = [
            _load_encoder_layer(
                t, f"{prefix}transformer.layers.{i}.", dtype, gated=False
            )
            for i in range(cfg.num_layers)
        ]
        glob = [
            _load_encoder_layer(
                t, f"{prefix}global_transformer.layers.{i}.", dtype,
                gated=True,
            )
            for i in range(cfg.num_global_layers)
        ]
        pw = np.asarray(t(prefix + "patch_embedding.weight"), np.float32)
        D = pw.shape[0]
        return {
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "cls": t(prefix + "class_embedding").astype(dtype),
            "pos": t(
                prefix + "gated_positional_embedding.embedding"
            ).astype(dtype),
            "pos_gate": t(
                prefix + "gated_positional_embedding.gate"
            ).reshape(()).astype(dtype),
            "tile_pos": t(
                prefix + "gated_positional_embedding.tile_embedding.weight"
            ).astype(dtype),
            "pre_tile": t(
                prefix + "pre_tile_positional_embedding.embedding.weight"
            ).astype(dtype),
            "pre_tile_gate": t(
                prefix + "pre_tile_positional_embedding.gate"
            ).reshape(()).astype(dtype),
            "post_tile": t(
                prefix + "post_tile_positional_embedding.embedding.weight"
            ).astype(dtype),
            "post_tile_gate": t(
                prefix + "post_tile_positional_embedding.gate"
            ).reshape(()).astype(dtype),
            "ln_pre_w": t(prefix + "layernorm_pre.weight").astype(dtype),
            "ln_pre_b": t(prefix + "layernorm_pre.bias").astype(dtype),
            "ln_post_w": t(prefix + "layernorm_post.weight").astype(dtype),
            "ln_post_b": t(prefix + "layernorm_post.bias").astype(dtype),
            "local": jax.tree.map(lambda *xs: jnp.stack(xs), *local),
            "global": jax.tree.map(lambda *xs: jnp.stack(xs), *glob),
        }

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        D, I = cfg.hidden_size, cfg.intermediate_size
        P = cfg.num_patches
        mt, mar = cfg.max_num_tiles, cfg.max_aspect_ratio_id

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        local = [
            _encoder_layer_params(rng, D, I, dtype, gated=False)
            for _ in range(cfg.num_layers)
        ]
        glob = [
            _encoder_layer_params(rng, D, I, dtype, gated=True)
            for _ in range(cfg.num_global_layers)
        ]
        return {
            "patch_w": r(3 * cfg.patch_size**2, D),
            "cls": r(D),
            "pos": r(P, D),
            "pos_gate": jnp.zeros((), dtype),
            "tile_pos": r(mar + 1, mt * P * D, scale=0.002),
            "pre_tile": r(mar + 1, mt * D),
            "pre_tile_gate": jnp.zeros((), dtype),
            "post_tile": r(mar + 1, mt * D),
            "post_tile_gate": jnp.zeros((), dtype),
            "ln_pre_w": jnp.ones(D, dtype), "ln_pre_b": jnp.zeros(D, dtype),
            "ln_post_w": jnp.ones(D, dtype),
            "ln_post_b": jnp.zeros(D, dtype),
            "local": jax.tree.map(lambda *xs: jnp.stack(xs), *local),
            "global": jax.tree.map(lambda *xs: jnp.stack(xs), *glob),
        }

    # ----------------------------------------------------------- forward
    def _encoder(self, params_stack, x, mask_add, capture=None):
        """Scan over encoder layers; x [T, P, D] with T*P flattened rows.
        ``capture``: layer indices whose *outputs* are stacked and
        returned (HF intermediate_layers_indices)."""
        cfg = self.config
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        act = _ACTS[cfg.act]
        S = x.shape[0]

        def block(carry, xs):
            if capture is not None:
                x, aux = carry
                lp, li = xs
            else:
                x = carry
                lp = xs
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
            q = (h @ lp["q_w"]).reshape(S, nh, hd)
            k = (h @ lp["k_w"]).reshape(S, nh, hd)
            v = (h @ lp["v_w"]).reshape(S, nh, hd)
            att = jnp.einsum("qhd,khd->hqk", q, k) * scale
            # HF masks only (pad_q AND pad_k) pairs — valid queries DO
            # attend padded-tile keys and that contribution feeds
            # forward (_prepare_aspect_ratio_attention_mask's outer
            # product of the inverted mask); reproduce it exactly
            att = att - 1e9 * (mask_add[:, None] * mask_add[None, :])[None]
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(
                x.dtype
            )
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(
                S, cfg.hidden_size
            )
            o = o @ lp["o_w"]
            if "gate_attn" in lp:
                o = jnp.tanh(lp["gate_attn"]) * o
            x = x + o
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
            h = (act(h @ lp["fc1_w"] + lp["fc1_b"])) @ lp["fc2_w"] + lp[
                "fc2_b"
            ]
            if "gate_ffn" in lp:
                h = jnp.tanh(lp["gate_ffn"]) * h
            x = x + h
            if capture is not None:
                aux = tuple(
                    jnp.where(jnp.equal(li, ci), x, a)
                    for ci, a in zip(capture, aux)
                )
                return (x, aux), None
            return x, None

        if capture is not None:
            L = jax.tree.leaves(params_stack)[0].shape[0]
            carry = (x, tuple(jnp.zeros_like(x) for _ in capture))
            (x, aux), _ = jax.lax.scan(
                block, carry, (params_stack, jnp.arange(L))
            )
            return x, aux
        x, _ = jax.lax.scan(block, x, params_stack)
        return x, None

    def forward(
        self,
        params,
        tiles: jax.Array,  # [max_tiles, 3, S, S] f32
        aspect_ratio_id: jax.Array,  # scalar i32
        num_tiles: jax.Array,  # scalar i32 (valid tiles)
    ) -> jax.Array:
        """One image -> [max_tiles * num_patches, vision_output_dim].

        Mirrors HF ``MllamaVisionModel.forward`` (modeling_mllama.py:998)
        for the single-image case; valid output rows are the first
        ``num_tiles * num_patches`` (tiles are packed first).
        """
        cfg = self.config
        mt = cfg.max_num_tiles
        D = cfg.hidden_size
        P0 = cfg.grid * cfg.grid
        P = cfg.num_patches
        Pp = cfg.num_patches_padded

        # patchify: [mt, 3, S, S] -> [mt, P0, 3*p*p] -> [mt, P0, D]
        g, p = cfg.grid, cfg.patch_size
        x = tiles.reshape(mt, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(mt, P0, 3 * p * p).astype(params["patch_w"].dtype)
        x = x @ params["patch_w"]

        # pre-tile positional embedding (gated)
        pre = params["pre_tile"][aspect_ratio_id].reshape(mt, 1, D)
        x = x + jnp.tanh(params["pre_tile_gate"]) * pre

        # CLS token per tile
        cls = jnp.broadcast_to(params["cls"], (mt, 1, D))
        x = jnp.concatenate([cls, x], axis=1)  # [mt, P, D]

        # gated positional embedding
        x = x + (1.0 - jnp.tanh(params["pos_gate"])) * params["pos"][None]
        tile_pos = params["tile_pos"][aspect_ratio_id].reshape(mt, P, D)
        x = x + jnp.tanh(params["pos_gate"]) * tile_pos

        x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"],
                       cfg.norm_eps)

        # pad patch axis to a multiple of 8
        x = jnp.pad(x, ((0, 0), (0, Pp - P), (0, 0)))

        # pad indicator (1 = padding tile or padding patch)
        tile_valid = jnp.arange(mt) < num_tiles  # [mt]
        patch_valid = jnp.arange(Pp) < P  # [Pp]
        valid = tile_valid[:, None] & patch_valid[None, :]  # [mt, Pp]
        mask_add = jnp.where(valid.reshape(mt * Pp), 0.0, 1.0).astype(
            jnp.float32
        )

        x = x.reshape(mt * Pp, D)
        x, aux = self._encoder(
            params["local"], x, mask_add,
            capture=cfg.intermediate_layers_indices,
        )
        x = layer_norm(x, params["ln_post_w"], params["ln_post_b"],
                       cfg.norm_eps)

        # post-tile positional embedding + global transformer
        x = x.reshape(mt, Pp, D)
        post = params["post_tile"][aspect_ratio_id].reshape(mt, 1, D)
        x = x + jnp.tanh(params["post_tile_gate"]) * post
        x = x.reshape(mt * Pp, D)
        x, _ = self._encoder(params["global"], x, mask_add)

        # unpad + concat intermediates (captured before ln_post, HF
        # modeling_mllama.py:1117-1130)
        x = x.reshape(mt, Pp, D)[:, :P]
        # HF stacks intermediates on a trailing axis then flattens, so
        # the concat dim interleaves as (d, layer) — [.., D, n] reshape
        inter = jnp.stack(
            [a.reshape(mt, Pp, D)[:, :P] for a in aux], axis=-1
        )  # [mt, P, D, n_inter]
        inter = inter.reshape(mt, P, -1)
        out = jnp.concatenate([x, inter], axis=-1)  # [mt, P, 6D]
        return out.reshape(mt * P, -1)
