"""InternVL / InternVL2 / InternVL2.5 chat VLM.

Capability parity with the reference's ``srt/models/internvl.py``
(InternVLChatModel): InternViT tower (``layers/intern_vision.py``),
pixel-shuffle spatial downsample (``internvl.py:531-551``,
``downsample_ratio`` 0.5 => 4x fewer tokens), then the ``mlp1``
projector LN -> Linear(4*Dv -> H) -> GELU -> Linear(H -> H)
(``internvl.py:522-529``).  The language body is the shared llama
decoder serving both inner architectures the reference supports
(Qwen2ForCausalLM, InternLM2ForCausalLM — ``internvl.py:505-517``);
InternLM2 checkpoints are remapped by ``models/phi3.py`` conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.intern_vision import (
    InternVisionConfig,
    InternVisionTower,
)
from sglang_security_tpu.models.llama import LlamaForCausalLM
from sglang_security_tpu.models.phi3 import InternLM2ForCausalLM


def _intern_lm_cls(raw: dict):
    llm = raw.get("_outer", raw).get("llm_config") or {}
    arch = (llm.get("architectures") or ["Qwen2ForCausalLM"])[0]
    return InternLM2ForCausalLM if "InternLM2" in arch else LlamaForCausalLM


class InternVLChatModel(LlamaForCausalLM):
    is_multimodal = True

    def __new__(cls, config, quantization=None, tp_size: int = 1):
        # pick the inner body's loader conventions (InternLM2 fuses wqkv)
        base = _intern_lm_cls(config.raw)
        if base is InternLM2ForCausalLM and cls is InternVLChatModel:
            obj = object.__new__(_InternVLOnInternLM2)
        else:
            obj = object.__new__(cls)
        return obj

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.vision_config = InternVisionConfig(
            outer.get("vision_config") or {}
        )
        force = outer.get("force_image_size")
        if force:
            self.vision_config.image_size = force
        self.select_layer = outer.get("select_layer", -1)
        self.downsample_ratio = outer.get("downsample_ratio", 0.5)
        self.ps_version = outer.get("ps_version", "v2")
        self.vision_tower = InternVisionTower(self.vision_config)

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())

        class _LM:
            """language_model.* prefix remap (reference InternVLChatModel
            holds the body at language_model)."""

            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                if name == "lm_head.weight":
                    for cand in ("language_model.lm_head.weight",
                                 "language_model.output.weight"):
                        try:
                            return self._t(cand)
                        except KeyError:
                            continue
                    raise KeyError(name)
                # InternLM2 bodies rename before this wrapper runs
                # (lm_head -> output, model.* -> model.tok_embeddings...)
                return self._t("language_model." + name)

            def keys(self):
                p = "language_model."
                return [k[len(p):] for k in keys if k.startswith(p)]

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vision_model.", dtype=jnp.float32
        )
        params["projector"] = {
            "ln_w": jnp.asarray(get_tensor("mlp1.0.weight"), jnp.float32),
            "ln_b": jnp.asarray(get_tensor("mlp1.0.bias"), jnp.float32),
            "w1": jnp.asarray(get_tensor("mlp1.1.weight"), jnp.float32).T,
            "b1": jnp.asarray(get_tensor("mlp1.1.bias"), jnp.float32),
            "w2": jnp.asarray(get_tensor("mlp1.3.weight"), jnp.float32).T,
            "b2": jnp.asarray(get_tensor("mlp1.3.bias"), jnp.float32),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 17)
        r2 = int(round(1 / self.downsample_ratio)) ** 2
        Din = self.vision_config.hidden_size * r2
        H = self.config.hidden_size
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["projector"] = {
            "ln_w": jnp.ones(Din, jnp.float32),
            "ln_b": jnp.zeros(Din, jnp.float32),
            "w1": jnp.asarray(
                rng.standard_normal((Din, H)) * 0.02, jnp.float32
            ),
            "b1": jnp.zeros(H, jnp.float32),
            "w2": jnp.asarray(
                rng.standard_normal((H, H)) * 0.02, jnp.float32
            ),
            "b2": jnp.zeros(H, jnp.float32),
        }
        return params

    # ------------------------------------------------------------ vision
    def _pixel_shuffle(self, x: jax.Array) -> jax.Array:
        """Reference pixel_shuffle (internvl.py:531-551), scale 0.5:
        [N, w, h, C] -> [N, w*s, h*s, C/s^2] token-count reduction."""
        s = self.downsample_ratio
        n, w, h, c = x.shape
        x = x.reshape(n, w, int(h * s), int(c / s))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(n, int(h * s), int(w * s), int(c / (s * s)))
        if self.ps_version != "v1":
            x = x.transpose(0, 2, 1, 3)
        return x

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32),
            feature_layer=self.select_layer,
        )  # [N, g*g, Dv]
        N, P, Dv = feats.shape
        g = int(round(P ** 0.5))
        x = self._pixel_shuffle(feats.reshape(N, g, g, Dv))
        x = x.reshape(N, -1, x.shape[-1])  # [N, tokens, Dv/s^2... ]
        pj = params["projector"]
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-5) * pj["ln_w"] + pj["ln_b"]
        h = jax.nn.gelu(h @ pj["w1"] + pj["b1"])
        return h @ pj["w2"] + pj["b2"]

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        return int(g * g * self.downsample_ratio ** 2)


class _InternVLOnInternLM2(InternVLChatModel, InternLM2ForCausalLM):
    """InternVL with an InternLM2 body.  MRO: InternVL's load_weights
    wraps the accessor with the language_model. prefix remap, then
    InternLM2's loader translates canonical names to the fused-wqkv
    checkpoint layout, then the shared llama loader builds params."""

    pass
