"""Kimi-VL: MoonViT tower + quick-GELU projector + DeepSeek MLA body.

Capability parity with the reference's ``srt/models/kimi_vl.py`` +
``srt/models/kimi_vl_moonvit.py``: MoonViT — conv patch embed with a
learnable 2D-interpolated position grid (``Learnable2DInterpPosEmb``),
encoder blocks norm0/wqkv/wo + norm1/MLP2 (GELU-tanh) with interleaved
x/y 2D rope (``Rope2DPosEmb``: pair 2i rotates by x-angles, 2i+1 by
y-angles), final LayerNorm, then a 2x2 patch merger — feeding the
``KimiVLMultiModalProjector`` (pre-LN, linear, quick-GELU, linear) into
the DeepSeek-V2/V3 language body.  Fixed-square serving resolution (the
processor resizes; the pos grid interpolates to the serving grid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import layer_norm, quick_gelu
from sglang_security_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


class MoonViTConfigT:
    def __init__(self, d: dict):
        self.hidden_size = d.get("hidden_size", 1152)
        self.intermediate_size = d.get("intermediate_size", 4304)
        self.num_layers = d.get("num_hidden_layers", 27)
        self.num_heads = d.get("num_attention_heads", 16)
        self.patch_size = d.get("patch_size", 14)
        self.image_size = d.get("image_size", 392)
        self.pos_h = d.get("init_pos_emb_height", 64)
        self.pos_w = d.get("init_pos_emb_width", 64)
        self.merge = tuple(d.get("merge_kernel_size", (2, 2)))

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


class MoonViTTower:
    def __init__(self, config: MoonViTConfigT):
        self.config = config

    def _rope(self):
        """Rope2DPosEmb angles [g*g, hd//2]: pair 2i = x-angle, 2i+1 =
        y-angle, f_i = theta^(-4i/hd) (kimi_vl_moonvit.py:308-336)."""
        cfg = self.config
        g = cfg.grid
        hd = cfg.hidden_size // cfg.num_heads
        pos = np.arange(g * g)
        x = (pos % g).astype(np.float64)
        y = (pos // g).astype(np.float64)
        f = 1.0 / 10000 ** (np.arange(0, hd, 4)[: hd // 4] / hd)
        xa = np.outer(x, f)  # [P, hd//4]
        ya = np.outer(y, f)
        ang = np.stack([xa, ya], axis=-1).reshape(g * g, hd // 2)
        return (jnp.asarray(np.cos(ang), jnp.float32),
                jnp.asarray(np.sin(ang), jnp.float32))

    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}encoder.blocks.{i}."
            layers.append({
                "n0_w": jnp.asarray(t(a + "norm0.weight"), dtype),
                "n0_b": jnp.asarray(t(a + "norm0.bias"), dtype),
                "n1_w": jnp.asarray(t(a + "norm1.weight"), dtype),
                "n1_b": jnp.asarray(t(a + "norm1.bias"), dtype),
                "qkv_w": jnp.asarray(t(a + "wqkv.weight"), dtype).T,
                "qkv_b": jnp.asarray(t(a + "wqkv.bias"), dtype),
                "o_w": jnp.asarray(t(a + "wo.weight"), dtype).T,
                "o_b": jnp.asarray(t(a + "wo.bias"), dtype),
                "fc0_w": jnp.asarray(t(a + "mlp.fc0.weight"), dtype).T,
                "fc0_b": jnp.asarray(t(a + "mlp.fc0.bias"), dtype),
                "fc1_w": jnp.asarray(t(a + "mlp.fc1.weight"), dtype).T,
                "fc1_b": jnp.asarray(t(a + "mlp.fc1.bias"), dtype),
            })
        pw = np.asarray(t(prefix + "patch_embed.proj.weight"), np.float32)
        D = pw.shape[0]
        return {
            "patch_w": jnp.asarray(pw.reshape(D, -1).T, dtype),
            "patch_b": jnp.asarray(
                t(prefix + "patch_embed.proj.bias"), dtype),
            "pos": jnp.asarray(
                t(prefix + "patch_embed.pos_emb.weight"), dtype
            ),  # [ph, pw, D]
            "fln_w": jnp.asarray(
                t(prefix + "encoder.final_layernorm.weight"), dtype),
            "fln_b": jnp.asarray(
                t(prefix + "encoder.final_layernorm.bias"), dtype),
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
                "n0_w": jnp.ones(D, dtype), "n0_b": jnp.zeros(D, dtype),
                "n1_w": jnp.ones(D, dtype), "n1_b": jnp.zeros(D, dtype),
                "qkv_w": r(D, 3 * D), "qkv_b": jnp.zeros(3 * D, dtype),
                "o_w": r(D, D), "o_b": jnp.zeros(D, dtype),
                "fc0_w": r(D, I), "fc0_b": jnp.zeros(I, dtype),
                "fc1_w": r(I, D), "fc1_b": jnp.zeros(D, dtype),
            }

        layers = [layer() for _ in range(cfg.num_layers)]
        return {
            "patch_w": r(p3, D),
            "patch_b": jnp.zeros(D, dtype),
            "pos": r(cfg.pos_h, cfg.pos_w, D),
            "fln_w": jnp.ones(D, dtype),
            "fln_b": jnp.zeros(D, dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def forward(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, (g/2)^2, 4*D] merged patch features."""
        cfg = self.config
        N = pixel_values.shape[0]
        g, p = cfg.grid, cfg.patch_size
        x = pixel_values.reshape(N, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"]
        x = x + params["patch_b"]
        # Learnable2DInterpPosEmb: bicubic in torch; bilinear here (an
        # image-resample detail); exact when the grid matches the table
        pos = params["pos"]
        if pos.shape[:2] != (g, g):
            pos = jax.image.resize(
                pos, (g, g, pos.shape[-1]), method="bilinear"
            )
        x = x + pos.reshape(1, g * g, -1)

        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        cos, sin = self._rope()

        def rope(v):  # interleaved pairs
            v2 = v.astype(jnp.float32).reshape(*v.shape[:-1], hd // 2, 2)
            re, im = v2[..., 0], v2[..., 1]
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
            return out.reshape(v.shape).astype(v.dtype)

        def block(x, lp):
            h = layer_norm(x, lp["n0_w"], lp["n0_b"], 1e-5)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = rope(q.reshape(N, -1, nh, hd))
            k = rope(k.reshape(N, -1, nh, hd))
            v = v.reshape(N, -1, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + o @ lp["o_w"] + lp["o_b"]
            h = layer_norm(x, lp["n1_w"], lp["n1_b"], 1e-5)
            h = jax.nn.gelu(
                h @ lp["fc0_w"] + lp["fc0_b"], approximate=True
            ) @ lp["fc1_w"] + lp["fc1_b"]
            return x + h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        x = layer_norm(x, params["fln_w"], params["fln_b"], 1e-5)
        # 2x2 patch merger (kimi_vl_moonvit.py:536-562): [h/2*w/2, 4, D]
        kh, kw = cfg.merge
        D = x.shape[-1]
        nh2, nw2 = g // kh, g // kw
        x = x.reshape(N, nh2, kh, nw2, kw, D)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(N, nh2 * nw2, kh * kw * D)


class KimiVLForConditionalGeneration(DeepseekV2ForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.vision_config = MoonViTConfigT(
            outer.get("vision_config") or {}
        )
        self.vision_tower = MoonViTTower(self.vision_config)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())

        class _LM:
            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                return self._t("language_model." + name)

            def keys(self):
                p = "language_model."
                return [k[len(p):] for k in keys if k.startswith(p)]

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vision_tower.", dtype=jnp.float32
        )
        pj = "multi_modal_projector."
        t32 = lambda n: jnp.asarray(get_tensor(n), jnp.float32)
        params["projector"] = {
            "pn_w": t32(pj + "pre_norm.weight"),
            "pn_b": t32(pj + "pre_norm.bias"),
            "w1": t32(pj + "linear_1.weight").T,
            "b1": t32(pj + "linear_1.bias"),
            "w2": t32(pj + "linear_2.weight").T,
            "b2": t32(pj + "linear_2.bias"),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 37)
        Dv = self.vision_config.hidden_size
        kh, kw = self.vision_config.merge
        hidden = Dv * kh * kw
        H = self.config.hidden_size

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale,
                               jnp.float32)

        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["projector"] = {
            "pn_w": jnp.ones(Dv, jnp.float32),
            "pn_b": jnp.zeros(Dv, jnp.float32),
            "w1": r(hidden, hidden),
            "b1": jnp.zeros(hidden, jnp.float32),
            "w2": r(hidden, H),
            "b2": jnp.zeros(H, jnp.float32),
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        cfg = self.vision_config
        kh, kw = cfg.merge
        merged = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, T, kh*kw*Dv]
        pj = params["projector"]
        N, T, _ = merged.shape
        Dv = cfg.hidden_size
        # pre_norm applies per ORIGINAL patch channel (projector
        # forward: pre_norm(x).view(-1, hidden_size))
        x = merged.reshape(N, T, kh * kw, Dv)
        x = layer_norm(x, pj["pn_w"], pj["pn_b"], 1e-5)
        x = x.reshape(N, T, kh * kw * Dv)
        x = quick_gelu(x @ pj["w1"] + pj["b1"])
        return x @ pj["w2"] + pj["b2"]

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        kh, kw = self.vision_config.merge
        return (g // kh) * (g // kw)
