"""Qwen2-VL / Qwen2.5-VL: dynamic-resolution vision tower + M-RoPE LM.

TPU-native redesign of the reference's ``srt/models/qwen2_vl.py`` /
``qwen2_5_vl.py``: the language model is the shared Llama/Qwen2 body
(qkv bias via config) with one override — M-RoPE, where each rotary
frequency takes its position from one of three components (temporal /
height / width, HF ``apply_multimodal_rotary_pos_emb``).  Prefill rows
carry precomputed 3D positions (``ForwardBatch.mrope_positions``,
host-side ``compute_mrope_positions``); decode rows need no 3D form
because all three components are equal there — the scheduler adds the
request's mrope delta to the ordinary 1D positions, so every decode
fast path (multi-step scan, EAGLE verify, dp attention) works
unchanged.

Vision runs as a separate bucketed jit per image
(``model_runner.prepare_mm`` varlen path) — the TPU-native form of the
reference running the tower inline — with features content-hash cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.qwen_vision import (
    QwenVisionConfig,
    QwenVisionTower,
)
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


class _LMAccessor:
    """Map canonical LM names onto the checkpoint layout: legacy
    (model.*, visual.*, lm_head.weight) or modern transformers>=4.52
    (model.language_model.*, model.visual.*, lm_head.weight)."""

    def __init__(self, t, keys):
        self._t = t
        self._modern = any(
            k.startswith("model.language_model.") for k in keys
        )

    def __call__(self, name: str):
        if self._modern and name.startswith("model."):
            return self._t("model.language_model." + name[len("model."):])
        return self._t(name)


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    """LM body inherited; adds the Qwen vision tower and M-RoPE."""

    is_multimodal = True
    varlen_vision = True  # dynamic patch counts: encode one image/call
    uses_mrope = True  # scheduler builds 3D prefill positions + deltas
    v25 = False

    def __init__(self, config: ModelConfig, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        self.vision_config = QwenVisionConfig(
            config.raw.get("vision_config", {}), v25=self.v25
        )
        self.vision_tower = QwenVisionTower(self.vision_config)
        scaling = config.rope_scaling or {}
        sections = scaling.get("mrope_section")
        half = config.head_dim // 2
        if not sections:
            sections = [half]  # no sections -> plain 1D rope on comp 0
        # component index of each rotary frequency (t=0, h=1, w=2)
        comp = np.repeat(
            np.arange(len(sections)) % 3, np.asarray(sections, np.int64)
        )
        assert comp.shape[0] == half, (sections, half)
        self._mrope_comp = jnp.asarray(comp, jnp.int32)

    # ------------------------------------------------------------- M-RoPE
    def _rope_qk(self, q, k, fb):
        if fb.mrope_positions is None:
            # decode / text-only bucket: all components equal, and the
            # host already folded the request's mrope delta into the 1D
            # positions — identical math to standard rope
            return super()._rope_qk(q, k, fb)
        # positions per frequency: freq j reads component comp[j]
        pos = fb.mrope_positions[self._mrope_comp, :]  # [half, T]
        freqs = pos.T.astype(jnp.float32) * self.inv_freq[None, :]
        cos = jnp.cos(freqs)[:, None, :]
        sin = jnp.sin(freqs)[:, None, :]
        half = self.config.head_dim // 2

        def rot(x):
            x1 = x[..., :half].astype(jnp.float32)
            x2 = x[..., half:].astype(jnp.float32)
            return jnp.concatenate(
                [(x1 * cos - x2 * sin).astype(x.dtype),
                 (x2 * cos + x1 * sin).astype(x.dtype)], axis=-1
            )

        return rot(q), rot(k)

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        params = super().load_weights(_LMAccessor(get_tensor, keys), dtype=dtype)
        vis_prefix = (
            "model.visual."
            if any(k.startswith("model.visual.") for k in keys)
            else "visual."
        )

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        # vision in f32: tiny next to the LM, brittle norms in bf16
        params["vision"] = self.vision_tower.load_weights(
            t, vis_prefix, dtype=jnp.float32
        )
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        rng = np.random.default_rng(seed + 11)
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        return params

    # ------------------------------------------------------------ vision
    def encode_image(self, params, patches, rot_freqs, win_seg, full_seg):
        """One padded image -> merged features [Sp // merge^2, H]."""
        return self.vision_tower.forward(
            params["vision"], patches.astype(jnp.float32),
            rot_freqs, win_seg, full_seg,
        )


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    v25 = True
