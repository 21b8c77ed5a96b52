"""LLaVA-NeXT-Video: frame features spatially avg-pooled before the
projector.

Capability parity with the reference's ``srt/models/llavavid.py``: each
video frame runs the CLIP tower, the [g, g] patch grid is 2D
average-pooled with ``mm_spatial_pool_stride`` (``llavavid.py:45-47``
``nn.AvgPool2d``), then projected by the standard two-linear projector.
Video inputs arrive as a list of frame images; every frame contributes
``(g/stride)**2`` LM tokens (``llavavid.py:241`` image_feature_len).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_security_tpu.models.llava import LlavaForConditionalGeneration


class LlavaVidForCausalLM(LlavaForConditionalGeneration):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        self.pool_stride = config.raw.get("mm_spatial_pool_stride", 2)
        self.num_frames = config.raw.get("num_frames", 16)

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N_frames, 3, S, S] -> [N_frames, (g/stride)^2, H_text]."""
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32),
            feature_layer=self.vision_feature_layer,
        )  # [N, g*g, D]
        N, P, D = feats.shape
        g = self.vision_config.grid
        s = self.pool_stride
        go = g // s  # AvgPool2d floor semantics: trailing rows dropped
        x = feats.reshape(N, g, g, D)[:, : go * s, : go * s]
        x = x.reshape(N, go, s, go, s, D).mean(axis=(2, 4))
        return self._project(params, x.reshape(N, go * go, D))

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        return (g // self.pool_stride) ** 2
