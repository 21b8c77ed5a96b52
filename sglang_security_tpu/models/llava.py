"""LLaVA-family VLM: CLIP vision tower + MLP projector + Llama LM.

TPU-native redesign of the reference's ``srt/models/llava.py``: instead
of running the vision tower inside the language-model forward, the
runner encodes images in a separate bucketed jit (`encode_images`) and
feeds projected features through ``ForwardBatch.mm_embeds`` — image
features are cacheable by content hash and the LM step stays one static
program (``models/llama.py`` mm injection).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import (
    _ACTS,
    ClipVisionTower,
    PixtralVisionTower,
    SiglipVisionTower,
    VisionConfig,
)
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


class _PrefixAccessor:
    """Remap the language model's canonical names (model.*, lm_head.*)
    onto the VLM checkpoint layout. Handles both the modern HF layout
    (model.language_model.*, lm_head.weight) and the legacy one
    (language_model.model.*, language_model.lm_head.weight)."""

    def __init__(self, t, keys):
        self._t = t
        if any(k.startswith("model.language_model.") for k in keys):
            self._lm_body = "model.language_model."
            self._lm_head = "lm_head.weight"
        else:
            self._lm_body = "language_model.model."
            self._lm_head = "language_model.lm_head.weight"

    def __call__(self, name: str):
        if name == "lm_head.weight":
            return self._t(self._lm_head)
        assert name.startswith("model.")
        return self._t(self._lm_body + name[len("model."):])


class LlavaForConditionalGeneration(LlamaForCausalLM):
    """Vision tower + projector bolted onto the Llama body; the body's
    forward/compute_logits/unroll_params are inherited unchanged (mm
    features arrive via ForwardBatch)."""

    is_multimodal = True

    def __init__(self, config: ModelConfig, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        vis = config.raw.get("vision_config", {}) or {}
        self.vision_config = VisionConfig(vis)
        # tower family by vision_config.model_type: HF Pixtral ships as
        # LlavaForConditionalGeneration + a pixtral tower (reference
        # srt/models/pixtral.py); llava-next-siglip uses a SigLIP tower
        vt = vis.get("model_type", "clip_vision_model")
        self._pixtral = vt == "pixtral"
        if self._pixtral:
            self.vision_tower = PixtralVisionTower(self.vision_config)
        elif "siglip" in vt:
            self.vision_tower = SiglipVisionTower(self.vision_config)
        else:
            self.vision_tower = ClipVisionTower(self.vision_config)
        self.vision_feature_layer = config.raw.get("vision_feature_layer", -2)
        if self._pixtral:
            self.vision_feature_layer = -1  # full-depth, no CLS

    # ------------------------------------------------------------- params
    def _load_projector(self, get_tensor, pj_prefix: str) -> dict:
        """Two-linear MLP projector (HF LlavaMultiModalProjector);
        subclasses (Yi-VL) override for different projector shapes."""
        return {
            "w1": jnp.asarray(get_tensor(pj_prefix + "linear_1.weight"),
                              jnp.float32).T,
            "b1": jnp.asarray(get_tensor(pj_prefix + "linear_1.bias"),
                              jnp.float32),
            "w2": jnp.asarray(get_tensor(pj_prefix + "linear_2.weight"),
                              jnp.float32).T,
            "b2": jnp.asarray(get_tensor(pj_prefix + "linear_2.bias"),
                              jnp.float32),
        }

    def _init_dummy_projector(self, rng) -> dict:
        D = self.vision_config.hidden_size
        H = self.config.hidden_size
        return {
            "w1": jnp.asarray(rng.standard_normal((D, H)) * 0.02, jnp.float32),
            "b1": jnp.zeros(H, jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.float32),
            "b2": jnp.zeros(H, jnp.float32),
        }

    def _project(self, params, feats: jax.Array) -> jax.Array:
        pj = params["projector"]
        act = _ACTS[self.config.raw.get("projector_hidden_act", "gelu")]
        h = act(feats @ pj["w1"] + pj["b1"])
        return h @ pj["w2"] + pj["b2"]

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        lm_acc = _PrefixAccessor(get_tensor, keys)
        params = super().load_weights(lm_acc, dtype=dtype)
        nested = "" if self._pixtral else "vision_model."
        if any(k.startswith("model.vision_tower.") for k in keys):
            vt_prefix = "model.vision_tower." + nested
            pj_prefix = "model.multi_modal_projector."
        else:
            vt_prefix = "vision_tower." + nested
            pj_prefix = "multi_modal_projector."
        # vision runs in f32: it's tiny next to the LM and CLIP towers
        # are numerically brittle in bf16 layer norms
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, vt_prefix, dtype=jnp.float32
        )
        params["projector"] = self._load_projector(get_tensor, pj_prefix)
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        rng = np.random.default_rng(seed + 7)
        params["vision"] = self.vision_tower.init_dummy_params(rng, jnp.float32)
        params["projector"] = self._init_dummy_projector(rng)
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, patches, H_text] projected features."""
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32),
            feature_layer=self.vision_feature_layer,
        )
        return self._project(params, feats)

    @property
    def tokens_per_image(self) -> int:
        return self.vision_config.num_patches
