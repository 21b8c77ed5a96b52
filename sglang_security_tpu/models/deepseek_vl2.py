"""DeepSeek-VL2: timm-SigLIP tower + downsample-MLP projector + MLA body.

Capability parity with the reference's ``srt/models/deepseek_vl2.py``
(DeepseekVL2ForCausalLM): the vision encoder is a timm ViT
(vit_so400m_patch14_siglip, ``deepseek_vl2.py:199-218``;
``layers/intern_vision.py TimmViTTower``), the projector is
``downsample_mlp_gelu`` — 2x2 patch concat then Linear/GELU/Linear
(``deepseek_vl2.py:71-155``) — and the language model is the DeepSeek
MLA body (``language_config``).  Per-image output follows the 2D tile
tag: rows get an ``image_newline`` embedding column and views are
joined with ``view_seperator`` (``deepseek_vl2.py:300-360``); this
implementation serves the single (global) view per image — the
processor's dynamic tiling resizes to one canvas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.intern_vision import (
    TimmViTConfig,
    TimmViTTower,
)
from sglang_security_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


class DeepseekVL2ForCausalLM(DeepseekV2ForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.vision_config = TimmViTConfig(outer.get("vision_config") or {})
        pc = outer.get("projector_config") or {}
        self.pj_depth = pc.get("depth", 2)
        self.pj_ratio = pc.get("mlp_ratio", 1)
        self.pj_downsample = pc.get("downsample_ratio", 2)
        self.pj_n_embed = pc.get("n_embed", config.hidden_size)
        self.vision_tower = TimmViTTower(self.vision_config)

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())

        class _LM:
            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                return self._t("language." + name)

            def keys(self):
                p = "language."
                return [k[len(p):] for k in keys if k.startswith(p)]

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vision.", dtype=jnp.float32
        )
        pj = {}
        i = 0
        li = 0
        while True:
            try:
                pj[f"w{li}"] = jnp.asarray(
                    get_tensor(f"projector.layers.{i}.weight"), jnp.float32
                ).T
                pj[f"b{li}"] = jnp.asarray(
                    get_tensor(f"projector.layers.{i}.bias"), jnp.float32
                )
                li += 1
                i += 2  # GELU between linears holds no params
            except KeyError:
                break
        params["projector"] = pj
        params["image_newline"] = jnp.asarray(
            get_tensor("image_newline"), jnp.float32
        )
        params["view_seperator"] = jnp.asarray(
            get_tensor("view_seperator"), jnp.float32
        )
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 23)
        ds = self.pj_downsample
        Din = self.vision_config.hidden_size * ds * ds
        n = self.pj_n_embed

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape) * scale, jnp.float32
            )

        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        pj = {"w0": r(Din, n * self.pj_ratio),
              "b0": jnp.zeros(n * self.pj_ratio, jnp.float32)}
        for li in range(1, self.pj_depth - 1):
            pj[f"w{li}"] = r(n * self.pj_ratio, n * self.pj_ratio)
            pj[f"b{li}"] = jnp.zeros(n * self.pj_ratio, jnp.float32)
        if self.pj_depth > 1:
            pj[f"w{self.pj_depth - 1}"] = r(n * self.pj_ratio, n)
            pj[f"b{self.pj_depth - 1}"] = jnp.zeros(n, jnp.float32)
        params["projector"] = pj
        params["image_newline"] = r(n)
        params["view_seperator"] = r(n)
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, g*g, Dv]
        N, P, Dv = feats.shape
        g = int(round(P ** 0.5))
        ds = self.pj_downsample
        h = g // ds
        # 2x2 concat (reference F.unfold downsample, deepseek_vl2.py:128)
        x = feats.reshape(N, h, ds, h, ds, Dv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, h * h, ds * ds * Dv)
        pj = params["projector"]
        li = 0
        while f"w{li}" in pj:
            x = x @ pj[f"w{li}"] + pj[f"b{li}"]
            if f"w{li + 1}" in pj:
                x = jax.nn.gelu(x)
            li += 1
        # 2D tile tag: newline per row + view separator
        # (deepseek_vl2.py:300-317, global view)
        n_dim = x.shape[-1]
        x = x.reshape(N, h, h, n_dim)
        nl = jnp.broadcast_to(
            params["image_newline"].astype(x.dtype), (N, h, 1, n_dim)
        )
        x = jnp.concatenate([x, nl], axis=2).reshape(N, h * (h + 1), n_dim)
        sep = jnp.broadcast_to(
            params["view_seperator"].astype(x.dtype), (N, 1, n_dim)
        )
        return jnp.concatenate([x, sep], axis=1)

    @property
    def tokens_per_image(self) -> int:
        h = self.vision_config.grid // self.pj_downsample
        return h * (h + 1) + 1
