"""Phi-4-multimodal (vision path) on the Phi-3/4 body.

Capability parity with the reference's ``srt/models/phi4mm.py``
(Phi4MMForCausalLM / Phi4MMImageEncoder): a SigLIP-naViT tower
(``model.vision_embed_tokens.img_processor``), the phi HD transform —
2x2 feature concat, a ``sub_GN`` separator column per row and a
``glb_GN`` terminator (``phi4mm.py:240-330``) — and the two-linear GELU
``img_projection`` into the Phi decoder (``models/phi3.py``).  Serving
uses the global view (one crop; the reference's dynamic multi-crop HD
tiling is a processor-side resolution policy).  The vision/speech LoRA
adapters the reference merges per-modality (``phi4mm.py:396-455``) ride
the shared LoRA machinery when exported as adapters.

Speech: the REFERENCE ITSELF does not serve Phi-4-MM audio — its weight
loader explicitly drops every ``audio`` tensor
(``/root/reference/python/sglang/srt/models/phi4mm.py:473`` skip_list),
so vision-only here is exact behavior parity, not a gap.  The served
audio modality lives in MiniCPM-O (``models/minicpmv.py`` MiniCPMO +
``layers/audio.py`` Whisper tower), which the reference does serve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import SiglipVisionTower, VisionConfig
from sglang_security_tpu.models.phi3 import Phi3ForCausalLM


class Phi4MMForCausalLM(Phi3ForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        raw = config.raw
        embd = (raw.get("embd_layer") or {}).get("image_embd_layer", {})
        vis = raw.get("vision_config") or {
            # navit siglip-448 defaults (get_navit_vision_model)
            "hidden_size": 1152, "intermediate_size": 4304,
            "num_hidden_layers": 27, "num_attention_heads": 16,
            "image_size": 448, "patch_size": 14,
            "hidden_act": "gelu_pytorch_tanh",
        }
        self.vision_config = VisionConfig(vis)
        self.vision_tower = SiglipVisionTower(self.vision_config)
        self.reduction = embd.get("base_feat_height_reduction", 2)

    # ------------------------------------------------------------- params
    _VE = "model.vision_embed_tokens."

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        def base(name):
            # LoRA adapter tensors are loaded via the adapter path, the
            # base weights here (reference phi4mm.py:505 skips lora)
            return get_tensor(name)

        params = super().load_weights(base, dtype=dtype)
        ve = self._VE
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, ve + "img_processor.", dtype=jnp.float32
        )
        t32 = lambda n: jnp.asarray(get_tensor(n), jnp.float32)
        r2 = self.reduction ** 2
        params["glb_GN"] = t32(ve + "glb_GN").reshape(-1)
        params["sub_GN"] = t32(ve + "sub_GN").reshape(-1)
        params["projector"] = {
            "w1": t32(ve + "img_projection.0.weight").T,
            "b1": t32(ve + "img_projection.0.bias"),
            "w2": t32(ve + "img_projection.2.weight").T,
            "b2": t32(ve + "img_projection.2.bias"),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 43)
        Dv = self.vision_config.hidden_size
        H = self.config.hidden_size
        r2 = self.reduction ** 2

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale,
                               jnp.float32)

        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["glb_GN"] = r(Dv * r2)
        params["sub_GN"] = r(Dv * r2)
        params["projector"] = {
            "w1": r(Dv * r2, H), "b1": jnp.zeros(H, jnp.float32),
            "w2": r(H, H), "b2": jnp.zeros(H, jnp.float32),
        }
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, g*g, Dv]
        N, P, Dv = feats.shape
        g = int(round(P ** 0.5))
        rd = self.reduction
        h = g // rd
        # 2x2 concat (hd transform, phi4mm.py:250-262)
        x = feats.reshape(N, h, rd, h, rd, Dv)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, h, h, rd * rd * Dv)
        # sub_GN column per row, then glb_GN terminator
        sub = jnp.broadcast_to(
            params["sub_GN"].astype(x.dtype), (N, h, 1, x.shape[-1])
        )
        x = jnp.concatenate([x, sub], axis=2).reshape(
            N, h * (h + 1), x.shape[-1]
        )
        glb = jnp.broadcast_to(
            params["glb_GN"].astype(x.dtype), (N, 1, x.shape[-1])
        )
        x = jnp.concatenate([x, glb], axis=1)
        pj = params["projector"]
        x = jax.nn.gelu(x @ pj["w1"] + pj["b1"], approximate=False)
        return x @ pj["w2"] + pj["b2"]

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        h = g // self.reduction
        return h * (h + 1) + 1
