"""Perceiver resampler (Idefics2-style): compress a variable number of
vision patch features into a fixed set of latent tokens.

TPU-native parity with HF ``Idefics2PerceiverResampler``
(modeling_idefics2.py:698) — the capability the reference uses for
Idefics2-class VLMs (``srt/models/idefics2.py``): ``depth`` blocks of
cross-attention where learned latents attend [context ; latents]
(GQA, no rope, non-causal), each followed by a gated MLP, then a final
RMS norm.  Fixed shapes: one square image per call -> context length is
static, so the whole resampler jits once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.norms import rms_norm


class PerceiverConfig:
    def __init__(self, d: dict, text_hidden: int):
        self.hidden_size = d.get("hidden_size", text_hidden)
        self.n_latents = d.get("resampler_n_latents", 64)
        self.depth = d.get("resampler_depth", 3)
        self.n_heads = d.get("resampler_n_heads", 16)
        self.head_dim = d.get("resampler_head_dim", 96)
        self.num_kv_heads = d.get("num_key_value_heads", 4)
        self.rms_eps = d.get("rms_norm_eps", 1e-6)
        self.act = d.get("hidden_act", "silu")


class PerceiverResampler:
    def __init__(self, config: PerceiverConfig):
        self.config = config

    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.depth):
            a = f"{prefix}layers.{i}."
            layers.append({
                "lat_norm": t(a + "input_latents_norm.weight").astype(dtype),
                "ctx_norm": t(a + "input_context_norm.weight").astype(dtype),
                "post_norm": t(
                    a + "post_attention_layernorm.weight"
                ).astype(dtype),
                "q": t(a + "self_attn.q_proj.weight").T.astype(dtype),
                "k": t(a + "self_attn.k_proj.weight").T.astype(dtype),
                "v": t(a + "self_attn.v_proj.weight").T.astype(dtype),
                "o": t(a + "self_attn.o_proj.weight").T.astype(dtype),
                "gate": t(a + "mlp.gate_proj.weight").T.astype(dtype),
                "up": t(a + "mlp.up_proj.weight").T.astype(dtype),
                "down": t(a + "mlp.down_proj.weight").T.astype(dtype),
            })
        return {
            "latents": t(prefix + "latents").astype(dtype),
            "norm": t(prefix + "norm.weight").astype(dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def init_dummy_params(self, rng: np.random.Generator,
                          dtype=jnp.float32) -> dict:
        cfg = self.config
        D = cfg.hidden_size
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        I = 4 * D

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        def layer():
            return {
                "lat_norm": jnp.ones(D, dtype),
                "ctx_norm": jnp.ones(D, dtype),
                "post_norm": jnp.ones(D, dtype),
                "q": r(D, qd), "k": r(D, kvd), "v": r(D, kvd),
                "o": r(qd, D),
                "gate": r(D, I), "up": r(D, I), "down": r(I, D),
            }
        layers = [layer() for _ in range(cfg.depth)]
        return {
            "latents": jnp.ones((cfg.n_latents, D), dtype),
            "norm": jnp.ones(D, dtype),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def forward(self, params, context: jax.Array) -> jax.Array:
        """[S_ctx, D] patch features -> [n_latents, D]."""
        from sglang_security_tpu.layers.vision import _ACTS

        cfg = self.config
        nh, nkv, hd = cfg.n_heads, cfg.num_kv_heads, cfg.head_dim
        act = _ACTS.get(cfg.act, jax.nn.silu)
        lat = params["latents"]
        N = lat.shape[0]

        def block(lat, lp):
            h_lat = rms_norm(lat, lp["lat_norm"], cfg.rms_eps)
            h_ctx = rms_norm(context, lp["ctx_norm"], cfg.rms_eps)
            kv_in = jnp.concatenate([h_ctx, h_lat], axis=0)  # [S+N, D]
            q = (h_lat @ lp["q"]).reshape(N, nh, hd)
            k = (kv_in @ lp["k"]).reshape(-1, nkv, hd)
            v = (kv_in @ lp["v"]).reshape(-1, nkv, hd)
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
            s = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
            a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
            o = jnp.einsum("hqk,khd->qhd", a, v).reshape(N, nh * hd)
            lat = lat + o @ lp["o"]
            h = rms_norm(lat, lp["post_norm"], cfg.rms_eps)
            h = (act(h @ lp["gate"]) * (h @ lp["up"])) @ lp["down"]
            return lat + h, None

        lat, _ = jax.lax.scan(block, lat, params["layers"])
        return rms_norm(lat, params["norm"], cfg.rms_eps)
