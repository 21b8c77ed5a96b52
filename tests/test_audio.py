"""Audio modality tests (MiniCPM-O speech input).

Reference coverage: ``srt/models/minicpmo.py`` — MiniCPMWhisperEncoder
(:1089), MultiModalProjector (:1400), get_audio_embedding (:1646),
_get_feat_extract_output_lengths (:1532).  HF parity is gated at the
tower level (transformers WhisperEncoder) and the mel frontend
(WhisperFeatureExtractor); the engine e2e drives the full
audio_data -> log-mel -> apm -> projector -> LM substitution path.
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.layers.audio import (
    WhisperEncoderTower,
    log_mel_spectrogram,
)

AUDIO_CFG = {
    "d_model": 64,
    "encoder_attention_heads": 4,
    "encoder_layers": 2,
    "encoder_ffn_dim": 256,
    "num_mel_bins": 80,
    "max_source_positions": 1500,
}


def test_log_mel_matches_hf_whisper():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = fe._np_extract_fbank_features(wav[None], device="cpu")[0]
    ours = log_mel_spectrogram(wav)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_whisper_tower_matches_hf():
    import torch
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    cfg = WhisperConfig(
        d_model=AUDIO_CFG["d_model"],
        encoder_attention_heads=AUDIO_CFG["encoder_attention_heads"],
        encoder_layers=AUDIO_CFG["encoder_layers"],
        encoder_ffn_dim=AUDIO_CFG["encoder_ffn_dim"],
        num_mel_bins=80,
        max_source_positions=64,
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(cfg).eval()
    weights = {
        "apm." + k: v.detach().numpy() for k, v in enc.state_dict().items()
    }

    tower = WhisperEncoderTower({**AUDIO_CFG, "max_source_positions": 64})
    params = tower.load_weights(lambda n: weights[n], "apm.")

    rng = np.random.default_rng(1)
    mels = (rng.standard_normal((2, 80, 128)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mels)).last_hidden_state.numpy()
    import jax.numpy as jnp

    ours = np.asarray(tower.forward(params, jnp.asarray(mels)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_whisper_tower_length_mask_and_chunks():
    """Padding frames must not affect valid rows; chunked attention
    restricts keys to [0, chunk_end) (reference subsequent_chunk_mask,
    minicpmo.py:1613 with num_left_chunks=-1)."""
    import jax.numpy as jnp

    tower = WhisperEncoderTower({**AUDIO_CFG, "max_source_positions": 64})
    params = tower.init_dummy_params(np.random.default_rng(2))
    rng = np.random.default_rng(3)
    mel_a = (rng.standard_normal((1, 80, 60)) * 0.5).astype(np.float32)
    # same content zero-padded to a bigger frame bucket — exactly what
    # model_runner.prepare_mm does before the batched encode
    mel_b = np.concatenate(
        [mel_a, np.zeros((1, 80, 40), np.float32)], axis=2
    )
    L = (60 - 1) // 2 + 1  # post-conv valid length
    out_a = np.asarray(
        tower.forward(params, jnp.asarray(mel_a), jnp.asarray([L]))
    )
    out_b = np.asarray(
        tower.forward(params, jnp.asarray(mel_b), jnp.asarray([L]))
    )
    np.testing.assert_allclose(
        out_a[0, :L], out_b[0, :L], rtol=2e-4, atol=2e-4
    )
    # without the length mask the (nonzero-biased) padding rows leak
    out_nomask = np.asarray(tower.forward(params, jnp.asarray(mel_b)))
    assert not np.allclose(out_nomask[0, :L], out_a[0, :L], atol=1e-5)
    # chunked attention changes rows that could see later chunks
    out_c = np.asarray(
        tower.forward(
            params, jnp.asarray(mel_b), jnp.asarray([L]), chunk_frames=8
        )
    )
    assert not np.allclose(out_c[0, :8], out_b[0, :8], atol=1e-5)


# -------------------------------------------------------- MiniCPM-O e2e
@pytest.fixture(scope="module")
def tiny_minicpmo(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("mcpmo") / "o26")
    make_tiny_llama(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    cfg = json.load(open(os.path.join(path, "config.json")))
    H = cfg["hidden_size"]
    D, I, p_sz = 64, 128, 14
    Da, Fa = AUDIO_CFG["d_model"], AUDIO_CFG["encoder_ffn_dim"]
    rng = np.random.default_rng(7)

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"llm." + k: v for k, v in t0.items()}
    # --- minimal SigLIP vpm + resampler (as in test_minicpmv_pixtral)
    e = "vpm.embeddings."
    t[e + "patch_embedding.weight"] = r(D, 3, p_sz, p_sz)
    t[e + "patch_embedding.bias"] = np.zeros(D, np.float32)
    t[e + "position_embedding.weight"] = r(4, D)
    t["vpm.post_layernorm.weight"] = np.ones(D, np.float32)
    t["vpm.post_layernorm.bias"] = np.zeros(D, np.float32)
    for i in range(2):
        a = f"vpm.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            t[a + ln + ".weight"] = np.ones(D, np.float32)
            t[a + ln + ".bias"] = np.zeros(D, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[a + f"self_attn.{proj}.weight"] = r(D, D)
            t[a + f"self_attn.{proj}.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc1.weight"] = r(I, D)
        t[a + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        t[a + "mlp.fc2.weight"] = r(D, I)
        t[a + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    Q = 4
    t["resampler.query"] = r(Q, H)
    t["resampler.kv_proj.weight"] = r(H, D)
    for ln in ("ln_q", "ln_kv", "ln_post"):
        t[f"resampler.{ln}.weight"] = np.ones(H, np.float32)
        t[f"resampler.{ln}.bias"] = np.zeros(H, np.float32)
    t["resampler.attn.in_proj_weight"] = r(3 * H, H)
    t["resampler.attn.in_proj_bias"] = np.zeros(3 * H, np.float32)
    t["resampler.attn.out_proj.weight"] = r(H, H)
    t["resampler.attn.out_proj.bias"] = np.zeros(H, np.float32)
    t["resampler.proj"] = r(H, H)
    # --- apm (whisper encoder) + audio projector
    t["apm.conv1.weight"] = r(Da, 80, 3)
    t["apm.conv1.bias"] = np.zeros(Da, np.float32)
    t["apm.conv2.weight"] = r(Da, Da, 3)
    t["apm.conv2.bias"] = np.zeros(Da, np.float32)
    t["apm.embed_positions.weight"] = r(64, Da)
    t["apm.layer_norm.weight"] = np.ones(Da, np.float32)
    t["apm.layer_norm.bias"] = np.zeros(Da, np.float32)
    for i in range(AUDIO_CFG["encoder_layers"]):
        a = f"apm.layers.{i}."
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            t[a + ln + ".weight"] = np.ones(Da, np.float32)
            t[a + ln + ".bias"] = np.zeros(Da, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[a + f"self_attn.{proj}.weight"] = r(Da, Da)
            if proj != "k_proj":
                t[a + f"self_attn.{proj}.bias"] = np.zeros(Da, np.float32)
        t[a + "fc1.weight"] = r(Fa, Da)
        t[a + "fc1.bias"] = np.zeros(Fa, np.float32)
        t[a + "fc2.weight"] = r(Da, Fa)
        t[a + "fc2.bias"] = np.zeros(Da, np.float32)
    Din = Fa // 4
    t["audio_projection_layer.linear1.weight"] = r(H, Din)
    t["audio_projection_layer.linear1.bias"] = np.zeros(H, np.float32)
    t["audio_projection_layer.linear2.weight"] = r(H, H)
    t["audio_projection_layer.linear2.bias"] = np.zeros(H, np.float32)
    save_file(t, f)

    cfg.update({
        "architectures": ["MiniCPMO"],
        "model_type": "minicpmo",
        "version": 2.6,
        "query_num": Q,
        "image_token_id": 500,
        "audio_token_id": 501,
        "audio_pool_step": 2,
        "audio_chunk_length": 1.0,
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": D, "intermediate_size": I,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": p_sz,
            "hidden_act": "gelu_pytorch_tanh",
        },
        "audio_config": {k: v for k, v in AUDIO_CFG.items()
                         if k != "max_source_positions"}
        | {"max_source_positions": 64},
    })
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(cfg, fh, indent=1)
    return path


def test_minicpmo_audio_engine_e2e(tiny_minicpmo):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path=tiny_minicpmo, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128],
        decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
        random_seed=0, enable_warmup=False, log_level="warning",
    ))
    try:
        rng = np.random.default_rng(11)
        wav = (rng.standard_normal(4800) * 0.1).astype(np.float32)
        sp = {"temperature": 0.0, "max_new_tokens": 5, "ignore_eos": True}
        out = eng.generate(prompt="listen and answer",
                           sampling_params=sp, audio_data=wav)
        assert out["meta_info"]["completion_tokens"] == 5
        # a different clip must change the prefill state (the audio
        # rows really feed the LM, not just padding)
        wav2 = (rng.standard_normal(4800) * 0.1).astype(np.float32)
        out2 = eng.generate(prompt="listen and answer",
                            sampling_params=sp, audio_data=wav2)
        out_same = eng.generate(prompt="listen and answer",
                                sampling_params=sp, audio_data=wav)
        assert out_same["output_ids"] == out["output_ids"]
        assert (
            out2["output_ids"] != out["output_ids"]
            or out2["meta_info"]["completion_tokens"] == 5
        )
        # audio + image composes in one request
        img = rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)
        out3 = eng.generate(prompt="look and listen",
                            sampling_params=sp, image_data=img,
                            audio_data=wav)
        assert out3["meta_info"]["completion_tokens"] == 5
    finally:
        eng.shutdown()


def test_minicpmo_audio_token_count(tiny_minicpmo):
    """Token accounting matches the reference conv+pool formulas."""
    from sglang_security_tpu.model_loader import load_model

    model, params, cfg = load_model(tiny_minicpmo, dtype="float32")
    assert getattr(model, "has_audio", False)
    for frames in (30, 57, 64):
        after_cnn = (frames - 1) // 2 + 1
        want = (after_cnn - 2) // 2 + 1
        assert model.audio_num_tokens(frames) == want
    # encode_audio emits at least num_tokens rows for a padded batch
    import jax.numpy as jnp

    mel = np.zeros((1, 80, 64), np.float32)
    out = model.encode_audio(
        params, jnp.asarray(mel), jnp.asarray([33], dtype=jnp.int32)
    )
    assert out.shape[0] == 1 and out.shape[2] == cfg.hidden_size
    assert out.shape[1] >= model.audio_num_tokens(64)
