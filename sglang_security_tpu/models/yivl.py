"""Yi-VL: LLaVA-architecture VLM with layer-normed projector.

Capability parity with the reference's ``srt/models/yivl.py``: Yi-VL is
LLaVA (CLIP ViT tower + Llama body) whose projector interleaves
LayerNorms — linear_1 -> LN -> GELU -> linear_2 -> LN
(``yivl.py:94-115 YiVLMultiModalProjector``) — and whose checkpoints
store the projector at ``model.mm_projector.{0,1,3,4}``
(``yivl.py:70-77 projector_weights``).  The vision tower and LM load
through the shared Llava machinery; only the projector differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_security_tpu.models.llava import LlavaForConditionalGeneration


class YiVLForCausalLM(LlavaForConditionalGeneration):
    _YI_PJ = {  # checkpoint module index -> param key
        "0": ("w1", "b1"), "1": ("ln1_w", "ln1_b"),
        "3": ("w2", "b2"), "4": ("ln2_w", "ln2_b"),
    }

    def _load_projector(self, get_tensor, pj_prefix: str) -> dict:
        keys = list(get_tensor.keys())
        yi = [k for k in keys if ".mm_projector." in k]
        if not yi:  # HF-Llava-layout Yi export: no LNs in checkpoint
            return super()._load_projector(get_tensor, pj_prefix)
        base = yi[0].split("mm_projector.")[0] + "mm_projector."
        p = {}
        for idx, (wk, bk) in self._YI_PJ.items():
            w = jnp.asarray(get_tensor(base + idx + ".weight"), jnp.float32)
            p[wk] = w.T if wk.startswith("w") else w
            p[bk] = jnp.asarray(get_tensor(base + idx + ".bias"), jnp.float32)
        return p

    def _init_dummy_projector(self, rng) -> dict:
        H = self.config.hidden_size
        p = super()._init_dummy_projector(rng)
        p.update({
            "ln1_w": jnp.ones(H, jnp.float32),
            "ln1_b": jnp.zeros(H, jnp.float32),
            "ln2_w": jnp.ones(H, jnp.float32),
            "ln2_b": jnp.zeros(H, jnp.float32),
        })
        return p

    def _project(self, params, feats: jax.Array) -> jax.Array:
        pj = params["projector"]
        if "ln1_w" not in pj:
            return super()._project(params, feats)

        def ln(x, w, b):
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-5) * w + b

        h = ln(feats @ pj["w1"] + pj["b1"], pj["ln1_w"], pj["ln1_b"])
        h = jax.nn.gelu(h)
        return ln(h @ pj["w2"] + pj["b2"], pj["ln2_w"], pj["ln2_b"])
