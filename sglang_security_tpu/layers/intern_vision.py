"""InternViT vision encoder (functional JAX).

TPU-native re-implementation of the reference's InternVisionModel
(``srt/models/internvl.py:159-473``): CLS + conv patch embed + learned
position embedding, encoder blocks with fused-QKV attention, optional
per-head-flattened QK RMSNorm (``internvl.py:122-151``), LayerNorm or
RMSNorm per ``norm_type``, and ls1/ls2 layer scales
(``internvl.py:277-303``).  Same dense-math design as
``layers/vision.py``: attention over <=1k patch tokens is one fused XLA
softmax-matmul chain; no Pallas kernel warranted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import _ACTS, layer_norm


def rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps
    )
    return (y * w).astype(x.dtype)


class InternVisionConfig:
    def __init__(self, d: dict):
        self.hidden_size = d.get("hidden_size", 1024)
        self.intermediate_size = d.get("intermediate_size", 4096)
        self.num_layers = d.get("num_hidden_layers", 24)
        self.num_heads = d.get("num_attention_heads", 16)
        self.image_size = d.get("image_size", 448)
        self.patch_size = d.get("patch_size", 14)
        self.layer_norm_eps = d.get("layer_norm_eps", 1e-6)
        self.act = d.get("hidden_act", "gelu")
        self.qk_normalization = d.get("qk_normalization", True)
        self.norm_type = d.get("norm_type", "rms_norm")
        self.qkv_bias = d.get("qkv_bias", False)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


class InternVisionTower:
    def __init__(self, config: InternVisionConfig):
        self.config = config

    def _norm(self, x, w, b, eps):
        if self.config.norm_type == "rms_norm":
            return rms(x, w, eps)
        return layer_norm(x, w, b, eps)

    # -------------------------------------------------------------- load
    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        D = cfg.hidden_size

        def opt(name, fallback):
            try:
                return jnp.asarray(t(name)).astype(dtype)
            except KeyError:
                return fallback

        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}encoder.layers.{i}."
            lp = {
                "n1_w": jnp.asarray(t(a + "norm1.weight")).astype(dtype),
                "n1_b": opt(a + "norm1.bias", jnp.zeros(D, dtype)),
                "n2_w": jnp.asarray(t(a + "norm2.weight")).astype(dtype),
                "n2_b": opt(a + "norm2.bias", jnp.zeros(D, dtype)),
                "qkv_w": jnp.asarray(t(a + "attn.qkv.weight")).T.astype(dtype),
                "qkv_b": opt(a + "attn.qkv.bias", jnp.zeros(3 * D, dtype)),
                "o_w": jnp.asarray(t(a + "attn.proj.weight")).T.astype(dtype),
                "o_b": jnp.asarray(t(a + "attn.proj.bias")).astype(dtype),
                "fc1_w": jnp.asarray(t(a + "mlp.fc1.weight")).T.astype(dtype),
                "fc1_b": jnp.asarray(t(a + "mlp.fc1.bias")).astype(dtype),
                "fc2_w": jnp.asarray(t(a + "mlp.fc2.weight")).T.astype(dtype),
                "fc2_b": jnp.asarray(t(a + "mlp.fc2.bias")).astype(dtype),
                "ls1": jnp.asarray(t(a + "ls1")).astype(dtype),
                "ls2": jnp.asarray(t(a + "ls2")).astype(dtype),
            }
            if cfg.qk_normalization:
                lp["qn"] = jnp.asarray(
                    t(a + "attn.q_norm.weight")
                ).astype(dtype)
                lp["kn"] = jnp.asarray(
                    t(a + "attn.k_norm.weight")
                ).astype(dtype)
            layers.append(lp)
        e = f"{prefix}embeddings."
        pw = np.asarray(t(e + "patch_embedding.weight"), np.float32)
        return {
            "cls": jnp.asarray(
                np.asarray(t(e + "class_embedding"), np.float32).reshape(D),
                dtype,
            ),
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "patch_b": jnp.asarray(
                t(e + "patch_embedding.bias")
            ).astype(dtype),
            "pos": jnp.asarray(
                np.asarray(t(e + "position_embedding"), np.float32)
                .reshape(-1, D),
                dtype,
            ),
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
            lp = {
                "n1_w": jnp.ones(D, dtype), "n1_b": jnp.zeros(D, dtype),
                "n2_w": jnp.ones(D, dtype), "n2_b": jnp.zeros(D, dtype),
                "qkv_w": r(D, 3 * D), "qkv_b": jnp.zeros(3 * D, dtype),
                "o_w": r(D, D), "o_b": jnp.zeros(D, dtype),
                "fc1_w": r(D, I), "fc1_b": jnp.zeros(I, dtype),
                "fc2_w": r(I, D), "fc2_b": jnp.zeros(D, dtype),
                "ls1": jnp.ones(D, dtype) * 0.1,
                "ls2": jnp.ones(D, dtype) * 0.1,
            }
            if cfg.qk_normalization:
                lp["qn"] = jnp.ones(D, dtype)
                lp["kn"] = jnp.ones(D, dtype)
            return lp

        layers = [layer() for _ in range(cfg.num_layers)]
        return {
            "cls": r(D),
            "patch_w": r(p3, D),
            "patch_b": jnp.zeros(D, dtype),
            "pos": r(cfg.num_patches + 1, D),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    # ----------------------------------------------------------- forward
    def forward(self, params, pixel_values: jax.Array,
                feature_layer: int = -1) -> jax.Array:
        """[N, 3, S, S] -> [N, num_patches, D] (CLS dropped,
        reference ``extract_feature``: vit_embeds[:, 1:])."""
        cfg = self.config
        N = pixel_values.shape[0]
        g, p = cfg.grid, cfg.patch_size
        x = pixel_values.reshape(N, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"]
        x = x + params["patch_b"]
        cls = jnp.broadcast_to(params["cls"], (N, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]

        n_blocks = (cfg.num_layers + 1 + feature_layer
                    if feature_layer < 0 else feature_layer)
        act = _ACTS[cfg.act]
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        eps = cfg.layer_norm_eps

        def block(x, lp):
            h = self._norm(x, lp["n1_w"], lp["n1_b"], eps)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if cfg.qk_normalization:
                # reference InternAttention: RMSNorm over the FLATTENED
                # head dims (internvl.py:141-151)
                q = rms(q, lp["qn"], eps)
                k = rms(k, lp["kn"], eps)
            q = q.reshape(N, -1, nh, hd)
            k = k.reshape(N, -1, nh, hd)
            v = v.reshape(N, -1, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + (o @ lp["o_w"] + lp["o_b"]) * lp["ls1"]
            h = self._norm(x, lp["n2_w"], lp["n2_b"], eps)
            h = act(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h * lp["ls2"], None

        sliced = jax.tree.map(lambda a: a[:n_blocks], params["layers"])
        x, _ = jax.lax.scan(block, x, sliced)
        return x[:, 1:]


class TimmViTConfig:
    """timm ``VisionTransformer`` subset (DeepSeek-VL2's
    vit_so400m_patch14_siglip_384: no CLS token, LayerNorm, fused qkv)."""

    def __init__(self, d: dict):
        self.hidden_size = d.get("width", d.get("hidden_size", 1152))
        self.num_layers = d.get("layers", d.get("num_hidden_layers", 27))
        self.num_heads = d.get("heads", d.get("num_attention_heads", 16))
        mlp_ratio = d.get("mlp_ratio")
        self.intermediate_size = d.get(
            "intermediate_size",
            int(self.hidden_size * mlp_ratio) if mlp_ratio else 4304,
        )
        self.image_size = d.get("image_size", 384)
        self.patch_size = d.get("patch_size", 14)
        self.layer_norm_eps = d.get("layer_norm_eps", 1e-6)
        self.act = d.get("hidden_act", "gelu")
        self.qk_normalization = False
        self.norm_type = "layer_norm"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


class TimmViTTower(InternVisionTower):
    """timm-layout ViT encoder (``vision.*`` prefix in DeepSeek-VL2
    checkpoints, reference ``deepseek_vl2.py:199-218``): patch_embed.proj
    conv, pos_embed (no CLS), blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}, final ``norm``.  No layer scales / qk-norm."""

    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        D = cfg.hidden_size
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}blocks.{i}."
            layers.append({
                "n1_w": jnp.asarray(t(a + "norm1.weight")).astype(dtype),
                "n1_b": jnp.asarray(t(a + "norm1.bias")).astype(dtype),
                "n2_w": jnp.asarray(t(a + "norm2.weight")).astype(dtype),
                "n2_b": jnp.asarray(t(a + "norm2.bias")).astype(dtype),
                "qkv_w": jnp.asarray(t(a + "attn.qkv.weight")).T.astype(dtype),
                "qkv_b": jnp.asarray(t(a + "attn.qkv.bias")).astype(dtype),
                "o_w": jnp.asarray(t(a + "attn.proj.weight")).T.astype(dtype),
                "o_b": jnp.asarray(t(a + "attn.proj.bias")).astype(dtype),
                "fc1_w": jnp.asarray(t(a + "mlp.fc1.weight")).T.astype(dtype),
                "fc1_b": jnp.asarray(t(a + "mlp.fc1.bias")).astype(dtype),
                "fc2_w": jnp.asarray(t(a + "mlp.fc2.weight")).T.astype(dtype),
                "fc2_b": jnp.asarray(t(a + "mlp.fc2.bias")).astype(dtype),
                "ls1": jnp.ones(D, dtype),
                "ls2": jnp.ones(D, dtype),
            })
        pw = np.asarray(t(prefix + "patch_embed.proj.weight"), np.float32)
        return {
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "patch_b": jnp.asarray(
                t(prefix + "patch_embed.proj.bias")
            ).astype(dtype),
            "pos": jnp.asarray(
                np.asarray(t(prefix + "pos_embed"), np.float32)
                .reshape(-1, D),
                dtype,
            ),
            "post_w": jnp.asarray(t(prefix + "norm.weight")).astype(dtype),
            "post_b": jnp.asarray(t(prefix + "norm.bias")).astype(dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def init_dummy_params(self, rng, dtype=jnp.float32):
        cfg = self.config
        p = super().init_dummy_params(rng, dtype)
        D = cfg.hidden_size
        del p["cls"]
        p["pos"] = p["pos"][: cfg.num_patches]
        p["post_w"] = jnp.ones(D, dtype)
        p["post_b"] = jnp.zeros(D, dtype)
        return p

    def forward(self, params, pixel_values, feature_layer: int = 0):
        cfg = self.config
        N = pixel_values.shape[0]
        g, p = cfg.grid, cfg.patch_size
        x = pixel_values.reshape(N, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"]
        x = x + params["patch_b"] + params["pos"][None]

        act = _ACTS[cfg.act]
        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        eps = cfg.layer_norm_eps

        def block(x, lp):
            h = layer_norm(x, lp["n1_w"], lp["n1_b"], eps)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, -1, nh, hd)
            k = k.reshape(N, -1, nh, hd)
            v = v.reshape(N, -1, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + (o @ lp["o_w"] + lp["o_b"])
            h = layer_norm(x, lp["n2_w"], lp["n2_b"], eps)
            h = act(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        return layer_norm(x, params["post_w"], params["post_b"], eps)
