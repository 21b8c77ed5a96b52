"""MiniCPM-V 2.5/2.6: SigLIP tower + perceiver resampler + llama/qwen2 body.

Capability parity with the reference's ``srt/models/minicpmv.py``
(MiniCPMBaseModel / MiniCPMV2_6): the vision module (``vpm``) is an HF
SigLIP encoder, the resampler is a one-layer cross-attention perceiver —
``num_queries`` learned queries attend over kv-projected patch features
with 2D sincos position embeddings on the KV side
(``minicpmv.py:193-354`` BaseResampler/Resampler2_5) — and the language
model (``llm``) is the shared llama body (MiniCPM-V 2.5 = Llama-3,
2.6 = Qwen2; both are config switches of ``models/llama.py``).

MiniCPM-O (``minicpmo.py``) adds the Whisper-style audio tower on top —
see the MiniCPMO subclass below (speech input served; TTS generation is
out of scope, as in the reference which ships it disabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.vision import SiglipVisionTower, VisionConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM


def get_2d_sincos_pos_embed(embed_dim: int, grid: int) -> np.ndarray:
    """Reference ``minicpmv.py:64-142`` (MAE-style), version 2.5 layout:
    [grid*grid, embed_dim] with h/w halves."""

    def one_d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid, dtype=np.float64)
    gw = np.arange(grid, dtype=np.float64)
    grid_w, grid_h = np.meshgrid(gw, gh)
    emb_h = one_d(embed_dim // 2, grid_h)
    emb_w = one_d(embed_dim // 2, grid_w)
    return np.concatenate([emb_h, emb_w], axis=1)  # [g*g, D]


class MiniCPMV(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization, tp_size=tp_size)
        raw = config.raw
        self.vision_config = VisionConfig(raw.get("vision_config") or {})
        self.vision_tower = SiglipVisionTower(self.vision_config)
        self.num_queries = raw.get("query_num", 64)
        self.resampler_heads = max(1, config.hidden_size // 128)

    # ------------------------------------------------------------- params
    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        class _LM:
            def __init__(self, t):
                self._t = t

            def __call__(self, name):
                # llm.model.* / llm.lm_head.*
                return self._t("llm." + name)

            def keys(self):
                return []

        params = super().load_weights(_LM(get_tensor), dtype=dtype)
        params["vision"] = self.vision_tower.load_weights(
            get_tensor, "vpm.", dtype=jnp.float32
        )
        r = "resampler."
        t32 = lambda n: jnp.asarray(get_tensor(n), jnp.float32)
        params["resampler"] = {
            "query": t32(r + "query"),
            "kv_w": t32(r + "kv_proj.weight").T,
            "ln_q_w": t32(r + "ln_q.weight"),
            "ln_q_b": t32(r + "ln_q.bias"),
            "ln_kv_w": t32(r + "ln_kv.weight"),
            "ln_kv_b": t32(r + "ln_kv.bias"),
            "ln_post_w": t32(r + "ln_post.weight"),
            "ln_post_b": t32(r + "ln_post.bias"),
            "in_w": t32(r + "attn.in_proj_weight"),
            "in_b": t32(r + "attn.in_proj_bias"),
            "out_w": t32(r + "attn.out_proj.weight").T,
            "out_b": t32(r + "attn.out_proj.bias"),
            "proj": t32(r + "proj"),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 29)
        Dv = self.vision_config.hidden_size
        D = self.config.hidden_size
        Q = self.num_queries

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale,
                               jnp.float32)

        params["vision"] = self.vision_tower.init_dummy_params(
            rng, jnp.float32
        )
        params["resampler"] = {
            "query": r(Q, D),
            "kv_w": r(Dv, D),
            "ln_q_w": jnp.ones(D, jnp.float32),
            "ln_q_b": jnp.zeros(D, jnp.float32),
            "ln_kv_w": jnp.ones(D, jnp.float32),
            "ln_kv_b": jnp.zeros(D, jnp.float32),
            "ln_post_w": jnp.ones(D, jnp.float32),
            "ln_post_b": jnp.zeros(D, jnp.float32),
            "in_w": r(3 * D, D),
            "in_b": jnp.zeros(3 * D, jnp.float32),
            "out_w": r(D, D),
            "out_b": jnp.zeros(D, jnp.float32),
            "proj": r(D, D),
        }
        return params

    # ------------------------------------------------------------ vision
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision_tower.forward(
            params["vision"], pixel_values.astype(jnp.float32)
        )  # [N, P, Dv]
        rp = params["resampler"]
        N, P, _ = feats.shape
        D = rp["query"].shape[1]
        g = int(round(P ** 0.5))
        pos = jnp.asarray(get_2d_sincos_pos_embed(D, g), jnp.float32)

        def ln(x, w, b):
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-5) * w + b

        x = feats @ rp["kv_w"]  # [N, P, D]
        x = ln(x, rp["ln_kv_w"], rp["ln_kv_b"])
        q = ln(rp["query"], rp["ln_q_w"], rp["ln_q_b"])  # [Q, D]
        # nn.MultiheadAttention(q, k=x+pos, v=x) (minicpmv.py:344-351)
        wq, wk, wv = jnp.split(rp["in_w"], 3, axis=0)
        bq, bk, bv = jnp.split(rp["in_b"], 3)
        nh = self.resampler_heads
        hd = D // nh
        qh = (q @ wq.T + bq).reshape(1, -1, nh, hd)
        kh = ((x + pos[None]) @ wk.T + bk).reshape(N, P, nh, hd)
        vh = (x @ wv.T + bv).reshape(N, P, nh, hd)
        att = jnp.einsum("nqhd,nkhd->nhqk", jnp.broadcast_to(
            qh, (N,) + qh.shape[1:]
        ), kh) * (hd ** -0.5)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", att, vh).reshape(N, -1, D)
        o = o @ rp["out_w"] + rp["out_b"]
        o = ln(o, rp["ln_post_w"], rp["ln_post_b"])
        return o @ rp["proj"]

    @property
    def tokens_per_image(self) -> int:
        return self.num_queries


class MiniCPMO(MiniCPMV):
    """MiniCPM-O 2.6 (reference ``srt/models/minicpmo.py:1413``): the
    same SigLIP vpm + resampler + qwen2 llm as MiniCPM-V 2.6 plus the
    Whisper-style audio tower (``apm.*`` — reference
    ``MiniCPMWhisperEncoder``, ``minicpmo.py:1181``), a time avg-pool of
    step ``audio_pool_step`` and a 2-layer ReLU projector into the LM
    embedding space (``minicpmo.py:1400`` MultiModalProjector).  Audio
    embeddings ride the same content-addressed feature cache and
    token-row substitution as images (modality="audio" items).  The
    streaming-TTS generation head (ConditionalChatTTS) is out of scope —
    it is a separate generation service, not a serving-path module (the
    reference ships it disabled: ``minicpmo.py:1447`` init_tts=False)."""

    has_audio = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization=quantization,
                         tp_size=tp_size)
        from sglang_security_tpu.layers.audio import WhisperEncoderTower

        raw = config.raw
        self.audio_config = raw.get("audio_config") or {}
        self.apm = WhisperEncoderTower(self.audio_config)
        self.audio_pool_step = raw.get("audio_pool_step", 2)
        # chunk attention: audio_chunk_length seconds * 50 frames/s
        # (reference get_audio_embedding chunk_length handling)
        self.audio_chunk_frames = int(
            float(raw.get("audio_chunk_length", 1.0)) * 50
        )

    def audio_num_tokens(self, mel_frames: int) -> int:
        """LM tokens for a clip (reference
        ``_get_feat_extract_output_lengths``, minicpmo.py:1532)."""
        after_cnn = (mel_frames - 1) // 2 + 1
        p = self.audio_pool_step
        return (after_cnn - p) // p + 1

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        params = super().load_weights(get_tensor, dtype=dtype)
        params["apm"] = self.apm.load_weights(
            get_tensor, "apm.", dtype=jnp.float32
        )
        a = "audio_projection_layer."
        t32 = lambda n: jnp.asarray(get_tensor(n), jnp.float32)
        params["audio_proj"] = {
            "w1": t32(a + "linear1.weight").T,
            "b1": t32(a + "linear1.bias"),
            "w2": t32(a + "linear2.weight").T,
            "b2": t32(a + "linear2.bias"),
        }
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = False):
        params = super().init_dummy_params(seed, dtype, unique_layers)
        rng = np.random.default_rng(seed + 31)
        params["apm"] = self.apm.init_dummy_params(rng, jnp.float32)
        Din = self.apm.ffn_dim // 4  # reference audio_output_dim
        D = self.config.hidden_size

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale,
                               jnp.float32)

        params["audio_proj"] = {
            "w1": r(Din, D), "b1": jnp.zeros(D, jnp.float32),
            "w2": r(D, D), "b2": jnp.zeros(D, jnp.float32),
        }
        return params

    def encode_audio(self, params, mels: jax.Array,
                     lens: jax.Array) -> jax.Array:
        """[N, 80, F] log-mel (+ per-clip post-conv lengths) ->
        [N, T_pool, H] LM-space audio embeddings (reference
        ``get_audio_embedding``, minicpmo.py:1646: apm last hidden ->
        projector -> avg-pool over time)."""
        states = self.apm.forward(
            params["apm"], mels.astype(jnp.float32), lens,
            chunk_frames=self.audio_chunk_frames,
        )  # [N, T, D_apm]
        # reference: audio_output_dim = encoder_ffn_dim // 4 (== d_model
        # for standard whisper shapes); the projector consumes that slice
        Din = self.apm.ffn_dim // 4
        states = states[..., :Din]
        ap = params["audio_proj"]
        h = jax.nn.relu(states @ ap["w1"] + ap["b1"])
        h = h @ ap["w2"] + ap["b2"]  # [N, T, H]
        # avg-pool over time, stride == kernel == pool_step
        p = self.audio_pool_step
        T = h.shape[1]
        Tp = (T - p) // p + 1
        h = h[:, : Tp * p].reshape(h.shape[0], Tp, p, -1).mean(axis=2)
        return h
