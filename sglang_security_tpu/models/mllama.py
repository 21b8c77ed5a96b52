"""Llama-3.2-Vision (mllama): cross-attention VLM.

TPU-native redesign of the reference's ``srt/models/mllama.py`` — the
first *cross-attention* VLM class (vision features feed interleaved
cross-attention layers instead of replacing token embeddings).

Design (vs the reference's torch port of HF):

- **Cross-attention KV lives in a paged pool**, one page-aligned slot
  region per running request (``ModelRunner.cross pool``,
  [C, Hkv, tokens, hd] like the self-attention pool).  K/V projections
  (+ per-head k_norm) of an image's vision features are computed once at
  admission by a jitted fill and re-read every step — so the text body
  reuses the existing ragged-paged attention kernels verbatim:
  non-causal prefill (``causal=False``) and the decode fast path, no new
  kernel and no [T, S_vis, Hkv, hd] gather materialization.
- **The LM body is the shared Llama implementation** with the self-attn
  layer count (cross layers carry no rotary KV): the base class sees a
  32-layer config, and ``_param_groups`` interleaves cross-layer
  markers at the original positions (40-layer checkpoint layout is
  remapped at load).
- Rows without an image skip the cross layers exactly (pure residual),
  which composes text-only and image requests in one batch — the
  per-row form of HF's layer-skip for text-only inputs.  Rows of an
  image request full-attend all valid vision tokens (the reference does
  the same; its per-token cross_attention_mask is also all-ones for the
  standard "<|image|> at prompt start" format).

Like the reference, multi-image requests are limited to one image per
request in this first cut (reference mllama.py pads/attends all tiles
of the request's images; extension = wider slot regions).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.linear import (
    apply_linear,
    make_linear_params,
)
from sglang_security_tpu.layers.mllama_vision import (
    MllamaVisionConfig,
    MllamaVisionTower,
)
from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM
from sglang_security_tpu.ops.ragged_paged_attention import (
    paged_decode_attention,
    ragged_paged_attention,
)

# extra embedding rows past vocab_size (HF: vocab_size + 8; the image
# token <|image|> = vocab_size is one of them)
EMBED_EXTRA = 8


class _CkptAccessor:
    """Map the LM's canonical names (model.layers.{j} over *self* layers,
    model.embed_tokens, model.norm, lm_head) onto the mllama checkpoint
    layout: legacy ``language_model.model.*`` / ``vision_model.*`` or
    modern transformers>=4.52 ``model.language_model.*`` /
    ``model.vision_model.*``."""

    def __init__(self, t, keys, self_orig):
        self._t = t
        self._self_orig = self_orig  # self-layer ordinal -> original idx
        if any(k.startswith("model.language_model.") for k in keys):
            self.lm = "model.language_model."
            self.vis = "model.vision_model."
            self.proj = "model.multi_modal_projector."
            self.head = "lm_head.weight"
        else:
            self.lm = "language_model.model."
            self.vis = "vision_model."
            self.proj = "multi_modal_projector."
            self.head = "language_model.lm_head.weight"
        self._keys = set(keys)

    def layer_prefix(self, orig_idx: int) -> str:
        return f"{self.lm}layers.{orig_idx}."

    def __call__(self, name: str):
        return self._t(self.remap(name))

    def remap(self, name: str) -> str:
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            j, _, tail = rest.partition(".")
            return self.layer_prefix(self._self_orig[int(j)]) + tail
        if name == "model.embed_tokens.weight":
            return self.lm + "embed_tokens.weight"
        if name.startswith("model.norm"):
            return self.lm + "norm" + name[len("model.norm"):]
        if name == "lm_head.weight":
            return self.head
        return name

    def __contains__(self, name):
        return self.remap(name) in self._keys

    def keys(self):
        return list(self._keys)


class MllamaForConditionalGeneration(LlamaForCausalLM):
    """Reference parity: ``srt/models/mllama.py:782``
    (MllamaForConditionalGeneration)."""

    is_multimodal = True
    has_cross_kv = True

    def __init__(self, config: ModelConfig, quantization=None,
                 tp_size: int = 1):
        raw = config.raw
        outer = raw.get("_outer", raw)
        text = dict(outer.get("text_config", raw))
        self.cross_idx = sorted(
            text.get("cross_attention_layers",
                     raw.get("cross_attention_layers", []))
        )
        total = text.get("num_hidden_layers",
                         raw.get("num_hidden_layers"))
        self.total_layers = total
        cross_set = set(self.cross_idx)
        self.self_orig = [i for i in range(total) if i not in cross_set]
        lm_raw = {
            **text,
            "architectures": ["LlamaForCausalLM"],
            "num_hidden_layers": len(self.self_orig),
        }
        lm_raw.pop("_outer", None)
        super().__init__(
            ModelConfig.from_hf_dict(lm_raw),
            quantization=quantization, tp_size=tp_size,
        )
        self.image_token_id = outer.get(
            "image_token_index", text.get("vocab_size", 128256)
        )
        self.vision_config = MllamaVisionConfig(
            outer.get("vision_config", {})
        )
        self.vision_tower = MllamaVisionTower(self.vision_config)
        vis = self.vision_config
        # vision tokens per slot (all tiles of one image)
        self.cross_seq_len = vis.max_num_tiles * vis.num_patches

    # KV pool holds only the self-attention layers
    @property
    def kv_num_layers(self) -> int:
        return self.config.num_layers

    @property
    def num_cross_layers(self) -> int:
        return len(self.cross_idx)

    # ------------------------------------------------------------- params
    def _cross_layer_dummy(self, rand, lin, lin_merged, dtype):
        cfg = self.config
        H, hd = cfg.hidden_size, cfg.head_dim
        Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
        return {
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
            "q": lin_merged(H, [Hq * hd], False),
            "kv": lin_merged(H, [Hkv * hd, Hkv * hd], False),
            "o": lin(Hq * hd, H, False),
            "q_norm": jnp.ones((hd,), dtype),
            "k_norm": jnp.ones((hd,), dtype),
            "gate_attn": jnp.zeros((), dtype),
            "gate_mlp": jnp.zeros((), dtype),
            "gate_up": lin_merged(H, [I, I], False),
            "down": lin(I, H, False),
        }

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(
            seed=seed, dtype=dtype, unique_layers=unique_layers
        )
        cfg = self.config
        key = jax.random.PRNGKey(seed + 7)
        counter = [0]

        def rand(*shape, scale=None):
            scale = scale or (1.0 / np.sqrt(shape[0]))
            counter[0] += 1
            return jax.random.normal(
                jax.random.fold_in(key, counter[0]), shape, jnp.float32
            ) * scale

        def lin(k, n, bias):
            return make_linear_params(
                rand(k, n), bias=jnp.zeros((n,)) if bias else None,
                quantization=self.quantization, dtype=dtype,
            )

        def lin_merged(k, ns, bias):
            from sglang_security_tpu.layers.linear import merge_for_tp

            ws = [rand(k, n) for n in ns]
            w, b = merge_for_tp(ws, self.tp_size, None)
            return make_linear_params(
                w, bias=b, quantization=self.quantization, dtype=dtype
            )

        params["cross_layers"] = [
            self._cross_layer_dummy(rand, lin, lin_merged, dtype)
            for _ in self.cross_idx
        ]
        # embed has 8 extra rows (image/control tokens)
        extra = rand(EMBED_EXTRA, cfg.hidden_size, scale=0.02).astype(dtype)
        params["embed"] = jnp.concatenate([params["embed"], extra], axis=0)
        rng = np.random.default_rng(seed + 11)
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        vd = self.vision_config.vision_output_dim
        params["mm_proj"] = {
            "w": jnp.asarray(
                rng.standard_normal((vd, cfg.hidden_size)).astype(np.float32)
                / np.sqrt(vd), jnp.float32,
            ),
            "b": jnp.zeros((cfg.hidden_size,), jnp.float32),
        }
        return params

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())
        acc = _CkptAccessor(get_tensor, keys, self.self_orig)
        params = super().load_weights(acc, dtype=dtype)
        cfg = self.config

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        def lin_merged(names, bias_names):
            from sglang_security_tpu.layers.linear import (
                load_merged_linear,
            )

            return load_merged_linear(
                get_tensor, names, bias_names,
                quantization=self.quantization,
                tp_size=self.tp_size, dtype=dtype,
            )

        cross = []
        for i in self.cross_idx:
            p = acc.layer_prefix(i)
            a = p + "cross_attn."
            cross.append({
                "input_norm": t(p + "input_layernorm.weight").astype(dtype),
                "post_norm": t(
                    p + "post_attention_layernorm.weight"
                ).astype(dtype),
                "q": lin_merged([a + "q_proj.weight"], None),
                "kv": lin_merged(
                    [a + "k_proj.weight", a + "v_proj.weight"], None
                ),
                "o": lin_merged([a + "o_proj.weight"], None),
                "q_norm": t(a + "q_norm.weight").astype(dtype),
                "k_norm": t(a + "k_norm.weight").astype(dtype),
                "gate_attn": t(p + "cross_attn_attn_gate").reshape(())
                .astype(jnp.float32),
                "gate_mlp": t(p + "cross_attn_mlp_gate").reshape(())
                .astype(jnp.float32),
                "gate_up": lin_merged(
                    [p + "mlp.gate_proj.weight", p + "mlp.up_proj.weight"],
                    None,
                ),
                "down": lin_merged([p + "mlp.down_proj.weight"], None),
            })
        params["cross_layers"] = cross
        params["vision"] = self.vision_tower.load_weights(
            t, acc.vis, dtype=jnp.float32
        )
        params["mm_proj"] = {
            "w": t(acc.proj + "weight").T,
            "b": t(acc.proj + "bias"),
        }
        return params

    # -------------------------------------------------- layer interleave
    def _param_groups(self, params):
        layers = params["layers"]
        cross = params.get("cross_layers")
        if cross is None:
            return [layers]
        if not isinstance(layers, list):
            L = jax.tree.leaves(layers)[0].shape[0]
            layers = [
                jax.tree.map(lambda a, i=i: a[i], layers) for i in range(L)
            ]
        groups = []
        j = 0  # next self-layer ordinal
        for c, orig in enumerate(self.cross_idx):
            # self layers that precede this cross layer
            upto = orig - c  # ordinal count before original index `orig`
            if upto > j:
                groups.append(layers[j:upto])
                j = upto
            groups.append({"__cross__": cross[c], "ci": c})
        if j < len(layers):
            groups.append(layers[j:])
        return groups

    # ------------------------------------------------------ vision encode
    def encode_cross_states(self, params, tiles, aspect_ratio_id,
                            num_tiles) -> jax.Array:
        """One image -> projected cross-attention states
        [max_tiles * num_patches, H_text] (f32)."""
        feats = self.vision_tower.forward(
            params["vision"], tiles, aspect_ratio_id, num_tiles
        )
        proj = params["mm_proj"]
        return feats @ proj["w"] + proj["b"]

    def cross_kv_fill(self, params, states: jax.Array, dtype=jnp.bfloat16):
        """Projected states [S_vis, H] -> per-cross-layer K/V
        ([C, S_vis, Hkv, hd] each, k_norm applied; pool dtype)."""
        cfg = self.config
        hd = cfg.head_dim
        Hkv = cfg.num_kv_heads // self.tp_size
        ks, vs = [], []
        for clp in params["cross_layers"]:
            kv = apply_linear(states.astype(dtype), clp["kv"])
            k, v = jnp.split(kv, 2, axis=-1)
            S = k.shape[0]
            k = k.reshape(S, Hkv, hd)
            v = v.reshape(S, Hkv, hd)
            k = rms_norm(k, clp["k_norm"], cfg.rms_eps)
            ks.append(k.astype(dtype))
            vs.append(v.astype(dtype))
        return jnp.stack(ks), jnp.stack(vs)
