"""Janus-Pro (DeepSeek) multimodal understanding path.

Capability parity with the reference's ``srt/models/deepseek_janus_pro.py``
(MultiModalityCausalLM): a timm-style SigLIP ViT (``vision_model.*``,
same layout as DeepSeek-VL2's tower — ``layers/intern_vision.py
TimmViTTower``), the ``aligner`` MlpProjector (mlp_gelu: Linear -> GELU
-> Linear, ``deepseek_janus_pro.py:1238-1298``), and a Llama language
body.  The image-GENERATION stack (gen_vision_model VQ decoder,
gen_aligner, gen_head) is checkpoint-present but unused at serving time
— the reference's forward also only routes the understanding path
(``deepseek_janus_pro.py`` forward -> general_mm_embed_routine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.intern_vision import (
    TimmViTConfig,
    TimmViTTower,
)
from sglang_security_tpu.models.llama import LlamaForCausalLM


class MultiModalityCausalLM(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        vc = outer.get("vision_config") or {}
        # janus configs nest timm params under vision_config.params
        self.vision_config = TimmViTConfig(vc.get("params", vc))
        self.vision_tower = TimmViTTower(self.vision_config)
        ac = outer.get("aligner_config") or {}
        self.aligner_depth = (ac.get("params", ac)).get("depth", 2)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())

        class _LM:
            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                if name == "lm_head.weight":
                    return self._t("language_model.lm_head.weight")
                return self._t("language_model." + name)

            def keys(self):
                p = "language_model."
                return [k[len(p):] for k in keys if k.startswith(p)]

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vision_model.", dtype=jnp.float32
        )
        pj = {}
        li, i = 0, 0
        while True:
            try:
                pj[f"w{li}"] = jnp.asarray(
                    get_tensor(f"aligner.layers.{i}.weight"), jnp.float32
                ).T
                pj[f"b{li}"] = jnp.asarray(
                    get_tensor(f"aligner.layers.{i}.bias"), jnp.float32
                )
                li += 1
                i += 2
            except KeyError:
                break
        params["projector"] = pj
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 41)
        Dv = self.vision_config.hidden_size
        H = self.config.hidden_size

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale,
                               jnp.float32)

        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        pj = {"w0": r(Dv, H), "b0": jnp.zeros(H, jnp.float32)}
        for li in range(1, self.aligner_depth):
            pj[f"w{li}"] = r(H, H)
            pj[f"b{li}"] = jnp.zeros(H, jnp.float32)
        params["projector"] = pj
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        x = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, P, Dv]
        pj = params["projector"]
        li = 0
        while f"w{li}" in pj:
            x = x @ pj[f"w{li}"] + pj[f"b{li}"]
            if f"w{li + 1}" in pj:
                x = jax.nn.gelu(x)
            li += 1
        return x

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        return g * g
