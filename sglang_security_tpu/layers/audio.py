"""Whisper-style audio encoder tower + log-mel frontend.

TPU-first implementation of the audio path the reference serves in
MiniCPM-O (``/root/reference/python/sglang/srt/models/minicpmo.py:1089``
``MiniCPMWhisperEncoder`` — HF Whisper encoder layers with an optional
chunk-attention mask): conv1 (k=3, s=1) -> GELU -> conv2 (k=3, s=2) ->
GELU -> +sinusoid positions -> pre-LN transformer stack -> final
LayerNorm.  The whole encode runs as one jitted dense program (audio
clips are padded to a bucketed frame count; lengths mask attention), so
XLA tiles the [T, D] matmuls onto the MXU instead of looping frames.

The mel frontend mirrors HF's ``WhisperFeatureExtractor`` (numpy:
hann-window STFT, slaney mel filterbank, log10 + max-8-dB clamp) so
processed features are bit-comparable against transformers in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------- frontend


def mel_filter_bank(n_freqs: int, n_mels: int, sr: int, n_fft: int
                    ) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filters (HF
    ``audio_utils.mel_filter_bank`` defaults used by Whisper)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mels = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mels = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) * 27.0
            / np.log(6.4),
            mels,
        )
        return mels

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(
            log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f
        )
        return f

    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [F, M+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # [F, M]
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float64)


def log_mel_spectrogram(
    waveform: np.ndarray,
    n_mels: int = 80,
    n_fft: int = 400,
    hop_length: int = 160,
    sampling_rate: int = 16000,
) -> np.ndarray:
    """[n_samples] f32 -> [n_mels, frames] f32 — Whisper log-mel
    (center-padded reflect STFT, power spectrum, slaney mel, log10,
    max-8dB dynamic-range clamp, /4 + 1 scaling)."""
    wav = np.asarray(waveform, np.float64).reshape(-1)
    pad = n_fft // 2
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(wav) - n_fft) // hop_length
    idx = (
        np.arange(n_fft)[None, :]
        + hop_length * np.arange(n_frames)[:, None]
    )
    frames = wav[idx]  # [T, n_fft]
    window = np.hanning(n_fft + 1)[:-1]
    stft = np.fft.rfft(frames * window[None, :], axis=1)
    power = np.abs(stft) ** 2  # [T, F]
    # whisper drops the last frame (it is pure padding of the hop)
    power = power[:-1]
    fb = mel_filter_bank(n_fft // 2 + 1, n_mels, sampling_rate, n_fft)
    mel = power @ fb  # [T, M]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)  # [M, T]


# ---------------------------------------------------------------- tower


class WhisperEncoderTower:
    """HF Whisper encoder as a functional JAX tower (reference
    ``minicpmo.py:1181`` MiniCPMWhisperEncoder).  Params are a plain
    pytree; forward is jit-friendly (static shapes, additive masks)."""

    def __init__(self, cfg: dict):
        self.d_model = cfg.get("d_model", 1280)
        self.num_heads = cfg.get("encoder_attention_heads", 20)
        self.num_layers = cfg.get("encoder_layers", 32)
        self.ffn_dim = cfg.get("encoder_ffn_dim", 5120)
        self.num_mel_bins = cfg.get("num_mel_bins", 80)
        self.max_source_positions = cfg.get("max_source_positions", 1500)

    # --------------------------------------------------------- weights
    def load_weights(self, get_tensor, prefix: str = "apm.",
                     dtype=jnp.float32):
        t = lambda n: jnp.asarray(get_tensor(prefix + n), dtype)
        p = {
            "conv1_w": t("conv1.weight"),  # [D, M, 3]
            "conv1_b": t("conv1.bias"),
            "conv2_w": t("conv2.weight"),  # [D, D, 3]
            "conv2_b": t("conv2.bias"),
            "pos": t("embed_positions.weight"),  # [n_ctx, D]
            "ln_f_w": t("layer_norm.weight"),
            "ln_f_b": t("layer_norm.bias"),
            "layers": [],
        }
        for i in range(self.num_layers):
            pre = f"layers.{i}."
            lt = lambda n: t(pre + n)
            p["layers"].append({
                "ln1_w": lt("self_attn_layer_norm.weight"),
                "ln1_b": lt("self_attn_layer_norm.bias"),
                "q_w": lt("self_attn.q_proj.weight").T,
                "q_b": lt("self_attn.q_proj.bias"),
                "k_w": lt("self_attn.k_proj.weight").T,
                "v_w": lt("self_attn.v_proj.weight").T,
                "v_b": lt("self_attn.v_proj.bias"),
                "o_w": lt("self_attn.out_proj.weight").T,
                "o_b": lt("self_attn.out_proj.bias"),
                "ln2_w": lt("final_layer_norm.weight"),
                "ln2_b": lt("final_layer_norm.bias"),
                "fc1_w": lt("fc1.weight").T,
                "fc1_b": lt("fc1.bias"),
                "fc2_w": lt("fc2.weight").T,
                "fc2_b": lt("fc2.bias"),
            })
        return p

    def init_dummy_params(self, rng: np.random.Generator,
                          dtype=jnp.float32):
        D, M, F = self.d_model, self.num_mel_bins, self.ffn_dim

        def r(*shape, scale=0.02):
            return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

        p = {
            "conv1_w": r(D, M, 3),
            "conv1_b": jnp.zeros(D, dtype),
            "conv2_w": r(D, D, 3),
            "conv2_b": jnp.zeros(D, dtype),
            "pos": r(self.max_source_positions, D, scale=0.02),
            "ln_f_w": jnp.ones(D, dtype),
            "ln_f_b": jnp.zeros(D, dtype),
            "layers": [],
        }
        for _ in range(self.num_layers):
            p["layers"].append({
                "ln1_w": jnp.ones(D, dtype),
                "ln1_b": jnp.zeros(D, dtype),
                "q_w": r(D, D), "q_b": jnp.zeros(D, dtype),
                "k_w": r(D, D),
                "v_w": r(D, D), "v_b": jnp.zeros(D, dtype),
                "o_w": r(D, D), "o_b": jnp.zeros(D, dtype),
                "ln2_w": jnp.ones(D, dtype),
                "ln2_b": jnp.zeros(D, dtype),
                "fc1_w": r(D, F), "fc1_b": jnp.zeros(F, dtype),
                "fc2_w": r(F, D), "fc2_b": jnp.zeros(D, dtype),
            })
        return p

    # --------------------------------------------------------- forward
    @staticmethod
    def _ln(x, w, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def forward(
        self,
        params,
        mels: jax.Array,  # [N, n_mels, F] log-mel features
        lens: Optional[jax.Array] = None,  # [N] post-conv valid lengths
        chunk_frames: int = 0,  # >0: chunked (streaming-style) attention
    ) -> jax.Array:
        """Returns [N, T, D] with T = (F - 1) // 2 + 1 (post conv2)."""
        x = mels
        h = jax.lax.conv_general_dilated(
            x, params["conv1_w"], (1,), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + params["conv1_b"][None, :, None]
        h = jax.nn.gelu(h, approximate=False)
        h = jax.lax.conv_general_dilated(
            h, params["conv2_w"], (2,), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + params["conv2_b"][None, :, None]
        h = jax.nn.gelu(h, approximate=False)
        h = h.transpose(0, 2, 1)  # [N, T, D]
        N, T, D = h.shape
        h = h + params["pos"][:T][None]

        # additive attention mask: padding (per-seq length) + optional
        # chunk locality (minicpmo.py:1613 subsequent_chunk_mask with
        # num_left_chunks=-1: position i attends [0, chunk_end(i)))
        mask = None
        if lens is not None:
            key_ok = (
                jnp.arange(T)[None, :] < lens[:, None]
            )  # [N, T]
            mask = jnp.where(key_ok[:, None, :], 0.0, -jnp.inf)[
                :, None, :, :
            ]  # [N, 1, 1, T]
        if chunk_frames and chunk_frames > 0:
            i = jnp.arange(T)
            chunk_end = (i // chunk_frames + 1) * chunk_frames
            ok = i[None, :] < chunk_end[:, None]  # [Tq, Tk]
            cmask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
            mask = cmask if mask is None else mask + cmask

        nh = self.num_heads
        hd = D // nh
        scale = hd**-0.5
        for lp in params["layers"]:
            res = h
            y = self._ln(h, lp["ln1_w"], lp["ln1_b"])
            q = (y @ lp["q_w"] + lp["q_b"]).reshape(N, T, nh, hd)
            k = (y @ lp["k_w"]).reshape(N, T, nh, hd)
            v = (y @ lp["v_w"] + lp["v_b"]).reshape(N, T, nh, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            if mask is not None:
                att = att + mask
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(N, T, D)
            h = res + (o @ lp["o_w"] + lp["o_b"])
            res = h
            y = self._ln(h, lp["ln2_w"], lp["ln2_b"])
            y = jax.nn.gelu(y @ lp["fc1_w"] + lp["fc1_b"],
                            approximate=False)
            h = res + (y @ lp["fc2_w"] + lp["fc2_b"])
        return self._ln(h, params["ln_f_w"], params["ln_f_b"])
