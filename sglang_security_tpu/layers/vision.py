"""CLIP-style ViT vision encoder (functional JAX).

TPU-native replacement for the reference's vision attention stack
(``srt/layers/attention/vision.py``): the whole encoder is plain dense
math — patchify is an unfold+matmul (MXU-friendly, no conv lowering),
attention over <=1k patch tokens is a single fused XLA softmax-matmul
chain, so no Pallas kernel is warranted.  Static shapes: the number of
images per call is bucketed by the runner.

Weight layout follows HF ``CLIPVisionModel``
(vision_tower.vision_model.*), the tower used by LLaVA-class VLMs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


class VisionConfig:
    """Subset of HF CLIPVisionConfig the encoder needs."""

    def __init__(self, d: dict):
        self.hidden_size = d.get("hidden_size", 1024)
        self.intermediate_size = d.get("intermediate_size", 4096)
        self.num_layers = d.get("num_hidden_layers", 24)
        self.num_heads = d.get("num_attention_heads", 16)
        self.image_size = d.get("image_size", 336)
        self.patch_size = d.get("patch_size", 14)
        self.layer_norm_eps = d.get("layer_norm_eps", 1e-5)
        self.act = d.get("hidden_act", "quick_gelu")
        self.image_mean = d.get("image_mean") or [0.48145466, 0.4578275, 0.40821073]
        self.image_std = d.get("image_std") or [0.26862954, 0.26130258, 0.27577711]

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


class ClipVisionTower:
    """CLIP ViT encoder; returns per-patch features of a chosen layer.

    ``feature_layer=-2`` (LLaVA default) returns the input to the last
    encoder block, i.e. the hidden states after num_layers-1 blocks.
    """

    def __init__(self, config: VisionConfig):
        self.config = config

    # -------------------------------------------------------------- load
    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}encoder.layers.{i}."
            layers.append(
                {
                    "ln1_w": t(a + "layer_norm1.weight").astype(dtype),
                    "ln1_b": t(a + "layer_norm1.bias").astype(dtype),
                    "ln2_w": t(a + "layer_norm2.weight").astype(dtype),
                    "ln2_b": t(a + "layer_norm2.bias").astype(dtype),
                    "q_w": t(a + "self_attn.q_proj.weight").T.astype(dtype),
                    "q_b": t(a + "self_attn.q_proj.bias").astype(dtype),
                    "k_w": t(a + "self_attn.k_proj.weight").T.astype(dtype),
                    "k_b": t(a + "self_attn.k_proj.bias").astype(dtype),
                    "v_w": t(a + "self_attn.v_proj.weight").T.astype(dtype),
                    "v_b": t(a + "self_attn.v_proj.bias").astype(dtype),
                    "o_w": t(a + "self_attn.out_proj.weight").T.astype(dtype),
                    "o_b": t(a + "self_attn.out_proj.bias").astype(dtype),
                    "fc1_w": t(a + "mlp.fc1.weight").T.astype(dtype),
                    "fc1_b": t(a + "mlp.fc1.bias").astype(dtype),
                    "fc2_w": t(a + "mlp.fc2.weight").T.astype(dtype),
                    "fc2_b": t(a + "mlp.fc2.bias").astype(dtype),
                }
            )
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        e = f"{prefix}embeddings."
        # conv [D, 3, p, p] -> unfold matmul weight [3*p*p, D]
        pw = np.asarray(t(e + "patch_embedding.weight"), np.float32)
        D = pw.shape[0]
        patch_w = pw.reshape(D, -1).T
        params = {
            "cls": t(e + "class_embedding").astype(dtype),
            "patch_w": jnp.asarray(patch_w, dtype),
            "pos": t(e + "position_embedding.weight").astype(dtype),
            "pre_ln_w": t(prefix + "pre_layrnorm.weight").astype(dtype),
            "pre_ln_b": t(prefix + "pre_layrnorm.bias").astype(dtype),
            "layers": stacked,
        }
        return params

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        D, I = cfg.hidden_size, cfg.intermediate_size
        p3 = 3 * cfg.patch_size * cfg.patch_size

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        def layer():
            return {
                "ln1_w": jnp.ones(D, dtype), "ln1_b": jnp.zeros(D, dtype),
                "ln2_w": jnp.ones(D, dtype), "ln2_b": jnp.zeros(D, dtype),
                "q_w": r(D, D), "q_b": jnp.zeros(D, dtype),
                "k_w": r(D, D), "k_b": jnp.zeros(D, dtype),
                "v_w": r(D, D), "v_b": jnp.zeros(D, dtype),
                "o_w": r(D, D), "o_b": jnp.zeros(D, dtype),
                "fc1_w": r(D, I), "fc1_b": jnp.zeros(I, dtype),
                "fc2_w": r(I, D), "fc2_b": jnp.zeros(D, dtype),
            }

        layers = [layer() for _ in range(cfg.num_layers)]
        return {
            "cls": r(D),
            "patch_w": r(p3, D),
            "pos": r(cfg.num_patches + 1, D),
            "pre_ln_w": jnp.ones(D, dtype),
            "pre_ln_b": jnp.zeros(D, dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    # ----------------------------------------------------------- forward
    def patchify(self, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, H, W] -> [N, num_patches, 3*p*p] (channel-major per
        patch, matching conv2d weight layout [D, 3, p, p])."""
        cfg = self.config
        N = pixel_values.shape[0]
        g, p = cfg.grid, cfg.patch_size
        x = pixel_values.reshape(N, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)  # [N, g, g, 3, p, p]
        return x.reshape(N, g * g, 3 * p * p)

    def forward(
        self, params, pixel_values: jax.Array, feature_layer: int = -2
    ) -> jax.Array:
        """[N, 3, H, W] f32 -> [N, num_patches, D] patch features (CLS
        dropped; LLaVA vision_feature_select_strategy='default')."""
        cfg = self.config
        N = pixel_values.shape[0]
        x = self.patchify(pixel_values).astype(params["patch_w"].dtype)
        x = x @ params["patch_w"]  # [N, P, D]
        cls = jnp.broadcast_to(params["cls"], (N, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]
        x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

        n_blocks = cfg.num_layers + 1 + feature_layer if feature_layer < 0 else feature_layer
        act = _ACTS[cfg.act]
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd ** -0.5

        def block(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(N, -1, nh, hd)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(N, -1, nh, hd)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(N, -1, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(N, -1, cfg.hidden_size)
            x = x + o @ lp["o_w"] + lp["o_b"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
            h = act(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h, None

        sliced = jax.tree.map(lambda a: a[:n_blocks], params["layers"])
        x, _ = jax.lax.scan(block, x, sliced)
        return x[:, 1:]  # drop CLS


class SiglipVisionTower(ClipVisionTower):
    """SigLIP ViT encoder (Gemma3-class VLMs): no CLS token, biased
    patch embedding, no pre-LN, post_layernorm on the final hidden
    states (HF ``SiglipVisionModel`` under vision_tower.vision_model)."""

    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        params = {}
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}encoder.layers.{i}."
            layers.append({
                "ln1_w": t(a + "layer_norm1.weight").astype(dtype),
                "ln1_b": t(a + "layer_norm1.bias").astype(dtype),
                "ln2_w": t(a + "layer_norm2.weight").astype(dtype),
                "ln2_b": t(a + "layer_norm2.bias").astype(dtype),
                "q_w": t(a + "self_attn.q_proj.weight").T.astype(dtype),
                "q_b": t(a + "self_attn.q_proj.bias").astype(dtype),
                "k_w": t(a + "self_attn.k_proj.weight").T.astype(dtype),
                "k_b": t(a + "self_attn.k_proj.bias").astype(dtype),
                "v_w": t(a + "self_attn.v_proj.weight").T.astype(dtype),
                "v_b": t(a + "self_attn.v_proj.bias").astype(dtype),
                "o_w": t(a + "self_attn.out_proj.weight").T.astype(dtype),
                "o_b": t(a + "self_attn.out_proj.bias").astype(dtype),
                "fc1_w": t(a + "mlp.fc1.weight").T.astype(dtype),
                "fc1_b": t(a + "mlp.fc1.bias").astype(dtype),
                "fc2_w": t(a + "mlp.fc2.weight").T.astype(dtype),
                "fc2_b": t(a + "mlp.fc2.bias").astype(dtype),
            })
        e = f"{prefix}embeddings."
        pw = np.asarray(t(e + "patch_embedding.weight"), np.float32)
        D = pw.shape[0]
        params.update({
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "patch_b": t(e + "patch_embedding.bias").astype(dtype),
            "pos": t(e + "position_embedding.weight").astype(dtype),
            "post_ln_w": t(prefix + "post_layernorm.weight").astype(dtype),
            "post_ln_b": t(prefix + "post_layernorm.bias").astype(dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        })
        return params

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        params = super().init_dummy_params(rng, dtype)
        D = cfg.hidden_size
        del params["cls"], params["pre_ln_w"], params["pre_ln_b"]
        params["patch_b"] = jnp.zeros(D, dtype)
        params["pos"] = params["pos"][: cfg.num_patches]
        params["post_ln_w"] = jnp.ones(D, dtype)
        params["post_ln_b"] = jnp.zeros(D, dtype)
        return params

    def forward(self, params, pixel_values: jax.Array,
                feature_layer: int = -1) -> jax.Array:
        """[N, 3, S, S] -> [N, num_patches, D] post-LN hidden states."""
        cfg = self.config
        x = self.patchify(pixel_values).astype(params["patch_w"].dtype)
        x = x @ params["patch_w"] + params["patch_b"]
        x = x + params["pos"][None]
        act = _ACTS[cfg.act]
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        N = x.shape[0]

        def block(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(N, -1, nh, hd)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(N, -1, nh, hd)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(N, -1, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(
                x.dtype
            )
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + o @ lp["o_w"] + lp["o_b"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
            h = act(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        return layer_norm(
            x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps
        )


def rms_ln(x, w, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


class PixtralVisionTower(ClipVisionTower):
    """Pixtral ViT (reference ``srt/models/pixtral.py:266-460``
    PixtralHFVisionModel): conv patch embed (no pos-embed table), RMSNorm
    pre-norm and per-block norms, SiLU-gated MLP, and 2D rotary position
    embeddings over the (h, w) patch grid (HF ``PixtralRotaryEmbedding``:
    h-frequencies from even inv_freq rows, w from odd).  No CLS token."""

    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}transformer.layers.{i}."
            layers.append({
                "an_w": jnp.asarray(t(a + "attention_norm.weight"), dtype),
                "fn_w": jnp.asarray(t(a + "ffn_norm.weight"), dtype),
                "q_w": jnp.asarray(t(a + "attention.q_proj.weight"), dtype).T,
                "k_w": jnp.asarray(t(a + "attention.k_proj.weight"), dtype).T,
                "v_w": jnp.asarray(t(a + "attention.v_proj.weight"), dtype).T,
                "o_w": jnp.asarray(t(a + "attention.o_proj.weight"), dtype).T,
                "gate_w": jnp.asarray(
                    t(a + "feed_forward.gate_proj.weight"), dtype).T,
                "up_w": jnp.asarray(
                    t(a + "feed_forward.up_proj.weight"), dtype).T,
                "down_w": jnp.asarray(
                    t(a + "feed_forward.down_proj.weight"), dtype).T,
            })
        pw = np.asarray(t(prefix + "patch_conv.weight"), np.float32)
        D = pw.shape[0]
        return {
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "pre_w": jnp.asarray(t(prefix + "ln_pre.weight"), dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        D, I = cfg.hidden_size, cfg.intermediate_size
        p3 = 3 * cfg.patch_size * cfg.patch_size

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        def layer():
            return {
                "an_w": jnp.ones(D, dtype), "fn_w": jnp.ones(D, dtype),
                "q_w": r(D, D), "k_w": r(D, D), "v_w": r(D, D),
                "o_w": r(D, D),
                "gate_w": r(D, I), "up_w": r(D, I), "down_w": r(I, D),
            }

        layers = [layer() for _ in range(cfg.num_layers)]
        return {
            "patch_w": r(p3, D),
            "pre_w": jnp.ones(D, dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def _rope_2d(self, g: int, hd: int, theta: float = 10000.0):
        inv = 1.0 / theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd)
        h = np.arange(g, dtype=np.float64)
        fh = np.outer(h, inv[::2])  # [g, hd//4]
        fw = np.outer(h, inv[1::2])
        freqs = np.concatenate(
            [
                np.broadcast_to(fh[:, None, :], (g, g, fh.shape[1])),
                np.broadcast_to(fw[None, :, :], (g, g, fw.shape[1])),
            ],
            axis=-1,
        ).reshape(g * g, hd // 2)
        emb = np.concatenate([freqs, freqs], axis=-1)  # rotate-half layout
        return (jnp.asarray(np.cos(emb), jnp.float32),
                jnp.asarray(np.sin(emb), jnp.float32))

    def forward(self, params, pixel_values: jax.Array,
                feature_layer: int = -1) -> jax.Array:
        cfg = self.config
        N = pixel_values.shape[0]
        x = self.patchify(pixel_values).astype(params["patch_w"].dtype)
        x = x @ params["patch_w"]  # [N, P, D]
        x = rms_ln(x, params["pre_w"])
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd ** -0.5
        cos, sin = self._rope_2d(cfg.grid, hd)

        def rope(v):  # [N, P, nh, hd]
            half = hd // 2
            v1, v2 = v[..., :half], v[..., half:]
            rot = jnp.concatenate([-v2, v1], axis=-1)
            return v * cos[None, :, None, :] + rot * sin[None, :, None, :]

        def block(x, lp):
            h = rms_ln(x, lp["an_w"])
            q = (h @ lp["q_w"]).reshape(N, -1, nh, hd)
            k = (h @ lp["k_w"]).reshape(N, -1, nh, hd)
            v = (h @ lp["v_w"]).reshape(N, -1, nh, hd)
            q, k = rope(q), rope(k)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + o @ lp["o_w"]
            h = rms_ln(x, lp["fn_w"])
            h = (jax.nn.silu(h @ lp["gate_w"]) * (h @ lp["up_w"])) @ lp[
                "down_w"
            ]
            return x + h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        return x
