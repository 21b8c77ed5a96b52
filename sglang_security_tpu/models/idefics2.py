"""Idefics2 (HuggingFaceM4): SigLIP vision + perceiver resampler + Mistral LM.

TPU-native parity with the reference's ``srt/models/idefics2.py`` /
HF ``Idefics2ForConditionalGeneration``: the vision tower is the SigLIP
encoder (layers/vision.py — Idefics2's NaViT-style variable-resolution
position ids reduce to SigLIP's arange for square full-size inputs,
which is what our processor produces), the connector is a gated
modality-projection MLP followed by the perceiver resampler
(layers/perceiver.py), and each image becomes exactly
``resampler_n_latents`` LM tokens injected through
``ForwardBatch.mm_embeds`` like every embedding-substitution VLM here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.perceiver import (
    PerceiverConfig,
    PerceiverResampler,
)
from sglang_security_tpu.layers.vision import (
    SiglipVisionTower,
    VisionConfig,
    _ACTS,
)
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


def _navit_pos_ids(grid: int) -> np.ndarray:
    """HF Idefics2VisionEmbeddings variable-resolution position ids for
    a full-square image (modeling_idefics2.py:136): fractional patch
    coords scaled by (1 - 1e-6) bucketized over arange(1/g, 1, 1/g) in
    float32 — which lands row i in bucket max(i-1, 0), NOT arange.
    Reproduced bit-exactly (np.searchsorted side='right' ==
    torch.bucketize right=True) so the learned position table is read
    the way HF reads it."""
    boundaries = np.arange(1 / grid, 1.0, 1 / grid, dtype=np.float32)
    frac = (np.arange(grid, dtype=np.float32) / grid) * np.float32(
        1 - 1e-6
    )
    axis = np.searchsorted(boundaries, frac, side="right")
    return (axis[:, None] * grid + axis[None, :]).reshape(-1)


class _LMAccessor:
    """model.* canonical names -> idefics2 checkpoint layout
    (model.text_model.* / lm_head.weight)."""

    def __init__(self, t, keys):
        self._t = t
        self._modern = any(
            k.startswith("model.text_model.") for k in keys
        )

    def __call__(self, name: str):
        if name == "lm_head.weight":
            return self._t("lm_head.weight")
        assert name.startswith("model.")
        body = "model.text_model." if self._modern else "text_model.model."
        return self._t(body + name[len("model."):])


class Idefics2ForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, quantization=None,
                 tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        raw = config.raw
        outer = raw.get("_outer", raw)
        self.vision_config = VisionConfig(outer.get("vision_config", {}))
        self.vision_tower = SiglipVisionTower(self.vision_config)
        self.perceiver_config = PerceiverConfig(
            outer.get("perceiver_config", {}), config.hidden_size
        )
        self.resampler = PerceiverResampler(self.perceiver_config)

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        params = super().load_weights(_LMAccessor(get_tensor, keys),
                                      dtype=dtype)
        pre = "model." if any(
            k.startswith("model.vision_model.") for k in keys
        ) else ""

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        params["vision"] = self.vision_tower.load_weights(
            t, pre + "vision_model.", dtype=jnp.float32
        )
        params["vision"]["pos"] = params["vision"]["pos"][
            _navit_pos_ids(self.vision_config.grid)
        ]
        mp = pre + "connector.modality_projection."
        params["mm_proj"] = {
            "gate": t(mp + "gate_proj.weight").T,
            "up": t(mp + "up_proj.weight").T,
            "down": t(mp + "down_proj.weight").T,
        }
        params["resampler"] = self.resampler.load_weights(
            t, pre + "connector.perceiver_resampler.", dtype=jnp.float32
        )
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        rng = np.random.default_rng(seed + 13)
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        D = self.vision_config.hidden_size
        H = self.config.hidden_size
        I = self.config.intermediate_size

        def r(*shape):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * 0.02,
                jnp.float32,
            )

        params["mm_proj"] = {"gate": r(D, I), "up": r(D, I),
                             "down": r(I, H)}
        params["resampler"] = self.resampler.init_dummy_params(
            rng, jnp.float32
        )
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, n_latents, H_text]."""
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, patches, D] (post-LN)
        mp = params["mm_proj"]
        act = _ACTS.get(self.config.act_fn, jax.nn.silu)
        h = (act(feats @ mp["gate"]) * (feats @ mp["up"])) @ mp["down"]
        return jax.vmap(
            lambda ctx: self.resampler.forward(params["resampler"], ctx)
        )(h)

    @property
    def tokens_per_image(self) -> int:
        return self.perceiver_config.n_latents


class Idefics3ForConditionalGeneration(Idefics2ForConditionalGeneration):
    """Idefics3 / SmolVLM (reference ``srt/models/idefics2.py`` family):
    the perceiver is replaced by a pixel-shuffle + single linear
    connector (HF Idefics3Connector, modeling_idefics3.py)."""

    def __init__(self, config: ModelConfig, quantization=None,
                 tp_size: int = 1):
        super().__init__(config, quantization=quantization,
                         tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.scale_factor = outer.get("scale_factor", 2)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        params = LlamaForCausalLM.load_weights(
            self, _LMAccessor(get_tensor, keys), dtype=dtype
        )
        pre = "model." if any(
            k.startswith("model.vision_model.") for k in keys
        ) else ""

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        params["vision"] = self.vision_tower.load_weights(
            t, pre + "vision_model.", dtype=jnp.float32
        )
        params["vision"]["pos"] = params["vision"]["pos"][
            _navit_pos_ids(self.vision_config.grid)
        ]
        params["mm_proj"] = {
            "w": t(pre + "connector.modality_projection.proj.weight").T,
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = LlamaForCausalLM.init_dummy_params(
            self, seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        rng = np.random.default_rng(seed + 13)
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        D = self.vision_config.hidden_size * self.scale_factor**2
        params["mm_proj"] = {
            "w": jnp.asarray(
                rng.standard_normal(
                    (D, self.config.hidden_size)
                ).astype(np.float32) * 0.02, jnp.float32,
            ),
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, patches, D]
        s = self.scale_factor
        N, seq, D = feats.shape
        g = int(round(seq ** 0.5))
        # HF pixel_shuffle (modeling_idefics3.py): two view/permute
        # rounds folding an s x s patch block into the channel dim
        x = feats.reshape(N, g, g // s, D * s)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, g // s, g // s, D * s * s)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, seq // (s * s), D * s * s)
        return x @ params["mm_proj"]["w"]

    @property
    def tokens_per_image(self) -> int:
        return self.vision_config.num_patches // self.scale_factor**2
