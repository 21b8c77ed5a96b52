"""Llama-4 multimodal (early-fusion vision, Scout/Maverick-class).

Capability parity with the reference's ``srt/models/mllama4.py``
(Llama4ForConditionalGeneration): HF ``Llama4VisionModel`` — unfold
patch linear, CLS appended AFTER the patch rows, learned positions,
interleaved-pair 2D vision RoPE (x-angles then y-angles per head-dim
pair, CLS unrotated), LN encoder blocks with biased qkv/o and MLP —
then the pixel-shuffle adapter (ratio 0.5, fc1-GELU-fc2-GELU) and the
single-linear multimodal projector into the Llama-4 text body
(``models/llama4.py``).  Verified against ``transformers``
``Llama4VisionModel`` on random weights (tests/test_mllama4.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import layer_norm
from sglang_security_tpu.models.llama4 import Llama4ForCausalLM


class Llama4VisionConfigT:
    def __init__(self, d: dict):
        self.hidden_size = d.get("hidden_size", 1408)
        self.intermediate_size = d.get("intermediate_size", 5632)
        self.num_layers = d.get("num_hidden_layers", 34)
        self.num_heads = d.get("num_attention_heads", 16)
        self.image_size = d.get("image_size", 336)
        self.patch_size = d.get("patch_size", 14)
        self.rope_theta = d.get("rope_theta", 10000)
        self.pixel_shuffle_ratio = d.get("pixel_shuffle_ratio", 0.5)
        self.projector_input_dim = d.get("projector_input_dim", 4096)
        self.projector_output_dim = d.get("projector_output_dim", 4096)
        self.vision_output_dim = d.get("vision_output_dim", 4096)
        self.norm_eps = d.get("norm_eps", 1e-5)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


class Llama4VisionTower:
    def __init__(self, config: Llama4VisionConfigT):
        self.config = config

    # -------------------------------------------------------------- rope
    def _freqs(self):
        """HF Llama4VisionRotaryEmbedding angles [P+1, hd//2] (CLS row —
        appended last — gets angle 0: unrotated)."""
        cfg = self.config
        g = cfg.grid
        hd = cfg.hidden_size // cfg.num_heads
        freq_dim = hd // 2
        idx = np.arange(g * g)
        fx = (idx % g + 1).astype(np.float64)
        fy = (idx // g + 1).astype(np.float64)
        rope_freq = 1.0 / cfg.rope_theta ** (
            np.arange(0, freq_dim, 2)[: freq_dim // 2] / freq_dim
        )
        tx = fx[:, None] * rope_freq[None, :]  # [P, fd//2]
        ty = fy[:, None] * rope_freq[None, :]
        ang = np.concatenate([tx, ty], axis=-1)  # [P, hd//2]
        ang = np.concatenate([ang, np.zeros((1, ang.shape[1]))], axis=0)
        return (jnp.asarray(np.cos(ang), jnp.float32),
                jnp.asarray(np.sin(ang), jnp.float32))

    # -------------------------------------------------------------- load
    def load_weights(self, t, prefix: str, dtype=jnp.float32) -> dict:
        cfg = self.config
        layers = []
        for i in range(cfg.num_layers):
            a = f"{prefix}model.layers.{i}."
            lp = {}
            for nm, key in (("input_layernorm", "n1"),
                            ("post_attention_layernorm", "n2")):
                lp[key + "_w"] = jnp.asarray(t(a + nm + ".weight"), dtype)
                lp[key + "_b"] = jnp.asarray(t(a + nm + ".bias"), dtype)
            for proj in ("q", "k", "v", "o"):
                lp[proj + "_w"] = jnp.asarray(
                    t(a + f"self_attn.{proj}_proj.weight"), dtype).T
                lp[proj + "_b"] = jnp.asarray(
                    t(a + f"self_attn.{proj}_proj.bias"), dtype)
            for fc in ("fc1", "fc2"):
                lp[fc + "_w"] = jnp.asarray(
                    t(a + f"mlp.{fc}.weight"), dtype).T
                lp[fc + "_b"] = jnp.asarray(t(a + f"mlp.{fc}.bias"), dtype)
            layers.append(lp)
        return {
            "patch_w": jnp.asarray(
                t(prefix + "patch_embedding.linear.weight"), dtype).T,
            "cls": jnp.asarray(t(prefix + "class_embedding"), dtype),
            "pos": jnp.asarray(
                t(prefix + "positional_embedding_vlm"), dtype),
            "pre_w": jnp.asarray(t(prefix + "layernorm_pre.weight"), dtype),
            "pre_b": jnp.asarray(t(prefix + "layernorm_pre.bias"), dtype),
            "post_w": jnp.asarray(
                t(prefix + "layernorm_post.weight"), dtype),
            "post_b": jnp.asarray(
                t(prefix + "layernorm_post.bias"), dtype),
            "ad_fc1": jnp.asarray(
                t(prefix + "vision_adapter.mlp.fc1.weight"), dtype).T,
            "ad_fc2": jnp.asarray(
                t(prefix + "vision_adapter.mlp.fc2.weight"), dtype).T,
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    def init_dummy_params(self, rng: np.random.Generator, dtype=jnp.float32):
        cfg = self.config
        D, I = cfg.hidden_size, cfg.intermediate_size
        p3 = 3 * cfg.patch_size * cfg.patch_size
        P = cfg.grid * cfg.grid

        def r(*shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype
            )

        def layer():
            return {
                "n1_w": jnp.ones(D, dtype), "n1_b": jnp.zeros(D, dtype),
                "n2_w": jnp.ones(D, dtype), "n2_b": jnp.zeros(D, dtype),
                "q_w": r(D, D), "q_b": jnp.zeros(D, dtype),
                "k_w": r(D, D), "k_b": jnp.zeros(D, dtype),
                "v_w": r(D, D), "v_b": jnp.zeros(D, dtype),
                "o_w": r(D, D), "o_b": jnp.zeros(D, dtype),
                "fc1_w": r(D, I), "fc1_b": jnp.zeros(I, dtype),
                "fc2_w": r(I, D), "fc2_b": jnp.zeros(D, dtype),
            }

        pid = cfg.projector_input_dim
        pod = cfg.projector_output_dim
        r2 = int(1 / cfg.pixel_shuffle_ratio) ** 2
        layers = [layer() for _ in range(cfg.num_layers)]
        return {
            "patch_w": r(p3, D),
            "cls": r(D),
            "pos": r(P + 1, D),
            "pre_w": jnp.ones(D, dtype), "pre_b": jnp.zeros(D, dtype),
            "post_w": jnp.ones(D, dtype), "post_b": jnp.zeros(D, dtype),
            "ad_fc1": r(D * r2, pid),
            "ad_fc2": r(pod, pod),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }

    # ----------------------------------------------------------- forward
    def forward(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, (g*ratio)^2, vision_output_dim]."""
        cfg = self.config
        N = pixel_values.shape[0]
        g, p = cfg.grid, cfg.patch_size
        x = pixel_values.reshape(N, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * p * p)
        x = x.astype(params["patch_w"].dtype) @ params["patch_w"]
        cls = jnp.broadcast_to(params["cls"], (N, 1, cfg.hidden_size))
        x = jnp.concatenate([x, cls], axis=1)  # CLS appended LAST
        x = x + params["pos"][None]
        x = layer_norm(x, params["pre_w"], params["pre_b"], cfg.norm_eps)

        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        scale = hd**-0.5
        cos, sin = self._freqs()  # [P+1, hd//2]

        def rope(v):  # [N, T, nh, hd], interleaved pairs
            v2 = v.astype(jnp.float32).reshape(*v.shape[:-1], hd // 2, 2)
            re, im = v2[..., 0], v2[..., 1]
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
            return out.reshape(v.shape).astype(v.dtype)

        def block(x, lp):
            h = layer_norm(x, lp["n1_w"], lp["n1_b"], cfg.norm_eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(N, -1, nh, hd)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(N, -1, nh, hd)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(N, -1, nh, hd)
            q, k = rope(q), rope(k)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(
                N, -1, cfg.hidden_size
            )
            x = x + o @ lp["o_w"] + lp["o_b"]
            h = layer_norm(x, lp["n2_w"], lp["n2_b"], cfg.norm_eps)
            h = jax.nn.gelu(
                h @ lp["fc1_w"] + lp["fc1_b"], approximate=False
            ) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        x = layer_norm(x, params["post_w"], params["post_b"], cfg.norm_eps)
        x = x[:, :-1]  # drop CLS
        # pixel shuffle (modeling_llama4.pixel_shuffle, ratio 0.5)
        r = cfg.pixel_shuffle_ratio
        D = x.shape[-1]
        h = int(g * r)
        x = x.reshape(N, g, g, D)
        x = x.reshape(N, g, h, int(D / r)).transpose(0, 2, 1, 3)
        x = x.reshape(N, h, h, int(D / (r * r))).transpose(0, 2, 1, 3)
        x = x.reshape(N, h * h, int(D / (r * r)))
        # adapter MLP2: fc1-GELU-fc2-GELU
        x = jax.nn.gelu(x @ params["ad_fc1"], approximate=False)
        return jax.nn.gelu(x @ params["ad_fc2"], approximate=False)


class Llama4ForConditionalGeneration(Llama4ForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        outer = config.raw.get("_outer", config.raw)
        self.vision_config = Llama4VisionConfigT(
            outer.get("vision_config") or {}
        )
        self.vision_tower = Llama4VisionTower(self.vision_config)

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        keys = list(get_tensor.keys())

        class _LM:
            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                if name == "lm_head.weight":
                    return self._t("language_model.lm_head.weight")
                return self._t("language_model." + name)

            def keys(self):
                p = "language_model."
                return [k[len(p):] for k in keys if k.startswith(p)]

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vision_model.", dtype=jnp.float32
        )
        params["projector"] = jnp.asarray(
            get_tensor("multi_modal_projector.linear_1.weight"), jnp.float32
        ).T
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 31)
        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["projector"] = jnp.asarray(
            rng.standard_normal(
                (self.vision_config.vision_output_dim,
                 self.config.hidden_size)
            ) * 0.02,
            jnp.float32,
        )
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )
        return feats @ params["projector"]

    @property
    def tokens_per_image(self) -> int:
        g = self.vision_config.grid
        return int((g * self.vision_config.pixel_shuffle_ratio) ** 2)
