"""Gemma 3 multimodal (vision) wrapper.

Capability parity with the reference's ``srt/models/gemma3_mm.py``
(Gemma3ForConditionalGeneration): a SigLIP vision tower + the Gemma3
multimodal projector (4x4 average pool over the patch grid -> Gemma
RMSNorm -> a raw [D_vis, H_text] projection matrix) bolted onto the
Gemma3 text body.  Image features replace the (already sqrt(H)-scaled)
image-token embedding rows, matching HF's scaled-word-embedding +
masked-scatter order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.norms import gemma_rms_norm
from sglang_security_tpu.layers.vision import SiglipVisionTower, VisionConfig
from sglang_security_tpu.models.gemma2 import Gemma3ForCausalLM
from sglang_security_tpu.models.llava import _PrefixAccessor


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.vision_config = VisionConfig(outer.get("vision_config", {}))
        self.vision_tower = SiglipVisionTower(self.vision_config)
        self.mm_tokens_per_image = int(
            outer.get("mm_tokens_per_image", 256)
        )

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        params = super().load_weights(
            _PrefixAccessor(get_tensor, keys), dtype=dtype
        )
        if any(k.startswith("model.vision_tower.") for k in keys):
            vt = "model.vision_tower.vision_model."
            pj = "model.multi_modal_projector."
        else:
            vt = "vision_tower.vision_model."
            pj = "multi_modal_projector."
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, vt, dtype=jnp.float32
        )
        params["projector"] = {
            "w": jnp.asarray(
                get_tensor(pj + "mm_input_projection_weight"), jnp.float32
            ),
            "norm": jnp.asarray(
                get_tensor(pj + "mm_soft_emb_norm.weight"), jnp.float32
            ),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        rng = np.random.default_rng(seed + 11)
        D, H = self.vision_config.hidden_size, self.config.hidden_size
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["projector"] = {
            "w": jnp.asarray(rng.standard_normal((D, H)) * 0.02, jnp.float32),
            "norm": jnp.zeros(D, jnp.float32),
        }
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, mm_tokens_per_image, H_text]
        (HF Gemma3MultiModalProjector)."""
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, g*g, D]
        N, P, D = feats.shape
        g = self.vision_config.grid
        side = int(round(self.mm_tokens_per_image**0.5))
        ks = g // side  # avg-pool kernel/stride
        x = feats.reshape(N, g, g, D)
        x = x.reshape(N, side, ks, side, ks, D).mean(axis=(2, 4))
        x = x.reshape(N, side * side, D)
        x = gemma_rms_norm(
            x, params["projector"]["norm"],
            eps=self.vision_config.layer_norm_eps,
        )
        return x @ params["projector"]["w"]

    @property
    def tokens_per_image(self) -> int:
        return self.mm_tokens_per_image
