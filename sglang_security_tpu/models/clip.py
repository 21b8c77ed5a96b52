"""CLIP dual-tower embedding model (text path on the encode route).

Capability parity with the reference's ``srt/models/clip.py``
(CLIPModel, served as an embedding model with
``Pooler(pooling_type=LAST, normalize=True)`` — ``clip.py:451``): the
text transformer is CAUSAL (CLIP masks future tokens) with pre-LN
blocks, quick-GELU MLPs, learned positions and a final LayerNorm; the
pooled embedding is the last token's hidden state through
``text_projection``, L2-normalized.  The vision tower
(``layers/vision.py ClipVisionTower``) + ``visual_projection`` are
loaded too and exposed via :meth:`encode_image_embeddings` for image
feature extraction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import (
    ClipVisionTower,
    VisionConfig,
    layer_norm,
    quick_gelu,
)
from sglang_security_tpu.models.config import ModelConfig


class CLIPModel:
    is_pooling_model = True

    def __init__(self, config: ModelConfig, quantization=None,
                 tp_size: int = 1):
        self.config = config
        self.quantization = None
        self.tp_size = 1
        self.kv_page_size = 32
        outer = config.raw.get("_outer", config.raw)
        tc = outer.get("text_config") or config.raw
        self.ln_eps = float(tc.get("layer_norm_eps", 1e-5))
        self.proj_dim = int(outer.get("projection_dim",
                                      tc.get("projection_dim", 512)))
        config.max_position = int(
            tc.get("max_position_embeddings", 77)
        )
        vis = outer.get("vision_config")
        self.vision_config = VisionConfig(vis) if vis else None
        self.vision_tower = (
            ClipVisionTower(self.vision_config) if vis else None
        )

    # ------------------------------------------------------------ params
    def init_dummy_params(self, seed: int = 0, dtype=jnp.float32,
                          unique_layers: bool = False):
        cfg = self.config
        rng = np.random.default_rng(seed)
        H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

        def layer():
            return {
                "ln1_w": jnp.ones(H, dtype), "ln1_b": jnp.zeros(H, dtype),
                "ln2_w": jnp.ones(H, dtype), "ln2_b": jnp.zeros(H, dtype),
                "q_w": r(H, H), "q_b": jnp.zeros(H, dtype),
                "k_w": r(H, H), "k_b": jnp.zeros(H, dtype),
                "v_w": r(H, H), "v_b": jnp.zeros(H, dtype),
                "o_w": r(H, H), "o_b": jnp.zeros(H, dtype),
                "fc1_w": r(H, I), "fc1_b": jnp.zeros(I, dtype),
                "fc2_w": r(I, H), "fc2_b": jnp.zeros(H, dtype),
            }

        layers = [layer() for _ in range(cfg.num_layers)]
        params = {
            "word_emb": r(V, H),
            "pos_emb": r(cfg.max_position, H),
            "final_ln_w": jnp.ones(H, dtype),
            "final_ln_b": jnp.zeros(H, dtype),
            "text_proj": r(H, self.proj_dim),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }
        if self.vision_tower is not None:
            params["vision"] = self.vision_tower.init_dummy_params(
                rng, jnp.float32
            )
            params["visual_proj"] = r(
                self.vision_config.hidden_size, self.proj_dim
            )
        return params

    def load_weights(self, get_tensor, dtype=jnp.float32):
        cfg = self.config

        def t(name):
            return jnp.asarray(get_tensor(name), jnp.float32)

        tm = "text_model."
        layers = []
        for i in range(cfg.num_layers):
            a = f"{tm}encoder.layers.{i}."
            layers.append({
                "ln1_w": t(a + "layer_norm1.weight").astype(dtype),
                "ln1_b": t(a + "layer_norm1.bias").astype(dtype),
                "ln2_w": t(a + "layer_norm2.weight").astype(dtype),
                "ln2_b": t(a + "layer_norm2.bias").astype(dtype),
                "q_w": t(a + "self_attn.q_proj.weight").T.astype(dtype),
                "q_b": t(a + "self_attn.q_proj.bias").astype(dtype),
                "k_w": t(a + "self_attn.k_proj.weight").T.astype(dtype),
                "k_b": t(a + "self_attn.k_proj.bias").astype(dtype),
                "v_w": t(a + "self_attn.v_proj.weight").T.astype(dtype),
                "v_b": t(a + "self_attn.v_proj.bias").astype(dtype),
                "o_w": t(a + "self_attn.out_proj.weight").T.astype(dtype),
                "o_b": t(a + "self_attn.out_proj.bias").astype(dtype),
                "fc1_w": t(a + "mlp.fc1.weight").T.astype(dtype),
                "fc1_b": t(a + "mlp.fc1.bias").astype(dtype),
                "fc2_w": t(a + "mlp.fc2.weight").T.astype(dtype),
                "fc2_b": t(a + "mlp.fc2.bias").astype(dtype),
            })
        params = {
            "word_emb": t(
                tm + "embeddings.token_embedding.weight"
            ).astype(dtype),
            "pos_emb": t(
                tm + "embeddings.position_embedding.weight"
            ).astype(dtype),
            "final_ln_w": t(tm + "final_layer_norm.weight").astype(dtype),
            "final_ln_b": t(tm + "final_layer_norm.bias").astype(dtype),
            "text_proj": t("text_projection.weight").T.astype(dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }
        if self.vision_tower is not None:
            params["vision"] = self.vision_tower.load_weights(
                get_tensor, "vision_model.", dtype=jnp.float32
            )
            params["visual_proj"] = t("visual_projection.weight").T
        return params

    def unroll_params(self, params):
        return params

    # ----------------------------------------------------------- forward
    def forward(self, params, k_pages, v_pages, fb, *, block_q,
                pages_per_block: int = 8, interpret: Optional[bool] = None,
                tp_size: int = 1, tp_axis=None, pp_axis=None,
                pp_size: int = 1, pp_microbatches: int = 1, dp_axis=None,
                lora=None, return_all: bool = False):
        assert tp_axis is None and pp_axis is None and dp_axis is None
        cfg = self.config
        T = fb.token_ids.shape[0]
        S = fb.q_starts.shape[0]
        Hq = cfg.num_q_heads
        hd = cfg.hidden_size // Hq

        pos = jnp.clip(fb.positions, 0, params["pos_emb"].shape[0] - 1)
        x = params["word_emb"][fb.token_ids] + params["pos_emb"][pos]

        # block-diagonal CAUSAL mask over the packed sequences
        rows = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.sum(rows[:, None] >= fb.q_starts[None, :], axis=1) - 1
        seg = jnp.clip(seg, 0, S - 1)
        valid = rows < fb.q_starts[seg] + fb.q_lens[seg]
        mask = (
            (seg[:, None] == seg[None, :])
            & valid[:, None] & valid[None, :]
            & (rows[:, None] >= rows[None, :])
        )
        neg = jnp.asarray(-1e30, jnp.float32)

        def body(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.ln_eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(T, Hq, hd)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(T, Hq, hd)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(T, Hq, hd)
            scores = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            scores = jnp.where(mask[None], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(T, Hq * hd)
            x = x + (o @ lp["o_w"] + lp["o_b"])
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
            h = quick_gelu(h @ lp["fc1_w"] + lp["fc1_b"])
            x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       self.ln_eps)
        safe = jnp.clip(fb.out_rows, 0, T - 1)
        return x[safe], k_pages, v_pages

    def pool(self, params, hidden):
        h = hidden.astype(jnp.float32) @ params["text_proj"].astype(
            jnp.float32
        )
        return h * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), 1e-12)
        )

    # ------------------------------------------------------------ vision
    def encode_image_embeddings(self, params, pixel_values) -> jax.Array:
        """[N, 3, S, S] -> [N, proj_dim] normalized image embeddings
        (reference CLIPModel image branch: pooled CLS -> post-LN ->
        visual_projection -> normalize)."""
        assert self.vision_tower is not None
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32),
            feature_layer=-1,
        )  # post blocks, CLS dropped; reference pools CLS — use mean
        pooled = feats.mean(axis=1)
        h = pooled @ params["visual_proj"]
        return h * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), 1e-12)
        )
