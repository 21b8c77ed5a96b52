"""MiniCPM-V (perceiver resampler) and Pixtral-HF (2D-rope tower in the
LLaVA wrapper) tests.

Reference coverage: ``srt/models/minicpmv.py`` (BaseResampler /
Resampler2_5, SigLIP vpm, llama/qwen2 llm) and ``srt/models/pixtral.py``
(PixtralHFVisionModel served through ``srt/models/llava.py``).
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama, make_tiny_llava

SP = {"temperature": 0.0, "max_new_tokens": 5, "ignore_eos": True}


def _image(seed=0, size=28):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _engine(path, **kw):
    args = dict(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 16], random_seed=0, enable_warmup=False,
        log_level="warning",
    )
    args.update(kw)
    return Engine(ServerArgs(**args))


# ---------------------------------------------------------------- MiniCPM-V
@pytest.fixture(scope="module")
def tiny_minicpmv(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("mcpmv") / "v25")
    make_tiny_llama(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    cfg = json.load(open(os.path.join(path, "config.json")))
    H = cfg["hidden_size"]
    D, I, p_sz = 64, 128, 14
    rng = np.random.default_rng(4)

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"llm." + k: v for k, v in t0.items()}
    # SigLIP vpm (HF layout, no CLS)
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
    save_file(t, f)

    cfg.update({
        "architectures": ["MiniCPMV"],
        "model_type": "minicpmv",
        "version": 2.5,
        "query_num": Q,
        "image_token_id": 500,
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": D, "intermediate_size": I,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": p_sz,
            "hidden_act": "gelu_pytorch_tanh",
        },
    })
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    return path


def test_minicpmv_resampler_tokens(tiny_minicpmv):
    import jax.numpy as jnp

    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.model_loader.loader import SafetensorsAccessor
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.minicpmv import MiniCPMV

    cfg = ModelConfig.from_pretrained(tiny_minicpmv)
    model = MiniCPMV(cfg)
    assert model.tokens_per_image == 4
    assert get_mm_processor(cfg).tokens_per_image == 4
    params = model.load_weights(
        SafetensorsAccessor(tiny_minicpmv), dtype=jnp.float32
    )
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, 28, 28)),
        jnp.float32,
    )
    out = model.encode_images(params, px)
    assert out.shape == (2, 4, cfg.hidden_size)
    # different images give different resampled features
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_minicpmv_engine_generates(tiny_minicpmv):
    eng = _engine(tiny_minicpmv)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(0)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()


# ------------------------------------------------------------------ Pixtral
@pytest.fixture(scope="module")
def tiny_pixtral(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("pixtral") / "px")
    make_tiny_llava(path, config={
        "vision_config": {
            "model_type": "pixtral",
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 32, "patch_size": 16,
        },
    })
    f = os.path.join(path, "model.safetensors")
    t = load_file(f)
    rng = np.random.default_rng(6)
    D, I, p_sz = 64, 128, 16

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    # drop the CLIP tower the factory wrote; write the pixtral layout
    t = {k: v for k, v in t.items()
         if not k.startswith("model.vision_tower.")}
    vt = "model.vision_tower."
    t[vt + "patch_conv.weight"] = r(D, 3, p_sz, p_sz)
    t[vt + "ln_pre.weight"] = np.ones(D, np.float32)
    for i in range(2):
        a = f"{vt}transformer.layers.{i}."
        t[a + "attention_norm.weight"] = np.ones(D, np.float32)
        t[a + "ffn_norm.weight"] = np.ones(D, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[a + f"attention.{proj}.weight"] = r(D, D)
        t[a + "feed_forward.gate_proj.weight"] = r(I, D)
        t[a + "feed_forward.up_proj.weight"] = r(I, D)
        t[a + "feed_forward.down_proj.weight"] = r(D, I)
    save_file(t, f)
    return path


def test_pixtral_engine_generates(tiny_pixtral):
    from sglang_security_tpu.models.config import ModelConfig
    from sglang_security_tpu.models.llava import (
        LlavaForConditionalGeneration,
    )

    cfg = ModelConfig.from_pretrained(tiny_pixtral)
    model = LlavaForConditionalGeneration(cfg)
    assert type(model.vision_tower).__name__ == "PixtralVisionTower"
    assert model.tokens_per_image == 4  # 32/16 grid -> 2x2, no CLS

    eng = _engine(tiny_pixtral)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(0, size=32)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
        out2 = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(2, size=32)]],
            sampling_params=SP,
        )[0]
        assert len(out2["output_ids"]) == 5
    finally:
        eng.shutdown()


# ---------------------------------------------------------------- Janus-Pro
@pytest.fixture(scope="module")
def tiny_janus(tmp_path_factory):
    from safetensors.numpy import load_file, save_file

    path = str(tmp_path_factory.mktemp("janus") / "jp")
    make_tiny_llama(path)
    f = os.path.join(path, "model.safetensors")
    t0 = load_file(f)
    lang_cfg = json.load(open(os.path.join(path, "config.json")))
    H = lang_cfg["hidden_size"]
    rng = np.random.default_rng(8)
    t = {"language_model." + k: v for k, v in t0.items()}
    D, I, p_sz = 64, 128, 14

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    vt = "vision_model."
    t[vt + "patch_embed.proj.weight"] = r(D, 3, p_sz, p_sz)
    t[vt + "patch_embed.proj.bias"] = np.zeros(D, np.float32)
    t[vt + "pos_embed"] = r(1, 4, D)
    t[vt + "norm.weight"] = np.ones(D, np.float32)
    t[vt + "norm.bias"] = np.zeros(D, np.float32)
    for i in range(2):
        a = f"{vt}blocks.{i}."
        for nm in ("norm1", "norm2"):
            t[a + nm + ".weight"] = np.ones(D, np.float32)
            t[a + nm + ".bias"] = np.zeros(D, np.float32)
        t[a + "attn.qkv.weight"] = r(3 * D, D)
        t[a + "attn.qkv.bias"] = np.zeros(3 * D, np.float32)
        t[a + "attn.proj.weight"] = r(D, D)
        t[a + "attn.proj.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc1.weight"] = r(I, D)
        t[a + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        t[a + "mlp.fc2.weight"] = r(D, I)
        t[a + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    t["aligner.layers.0.weight"] = r(H, D)
    t["aligner.layers.0.bias"] = np.zeros(H, np.float32)
    t["aligner.layers.2.weight"] = r(H, H)
    t["aligner.layers.2.bias"] = np.zeros(H, np.float32)
    save_file(t, f)

    cfg = {
        "architectures": ["MultiModalityCausalLM"],
        "model_type": "multi_modality",
        "language_config": lang_cfg,
        "vision_config": {
            "cls": "CLIPVisionTower",
            "params": {
                "hidden_size": D, "intermediate_size": I,
                "layers": 2, "heads": 4,
                "image_size": 28, "patch_size": p_sz,
            },
        },
        "aligner_config": {
            "cls": "MlpProjector",
            "params": {"projector_type": "mlp_gelu", "depth": 2},
        },
        "image_token_id": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    return path


def test_janus_engine_generates(tiny_janus):
    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_pretrained(tiny_janus)
    assert get_mm_processor(cfg).tokens_per_image == 4
    eng = _engine(tiny_janus)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(0)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()


# ---------------------------------------------------------------- Phi-4-MM
@pytest.fixture(scope="module")
def tiny_phi4mm(tmp_path_factory):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    path = str(tmp_path_factory.mktemp("phi4mm") / "p4")
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(15)
    H, I, hd, Hq, Hkv, V, L = 128, 256, 32, 4, 2, 512, 2

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": r(V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.qkv_proj.weight"] = r((Hq + 2 * Hkv) * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        t[p + "mlp.gate_up_proj.weight"] = r(2 * I, H)
        t[p + "mlp.down_proj.weight"] = r(H, I)
    # navit tower (tiny siglip) + GN separators + projection
    D, Iv, p_sz = 64, 128, 14
    ve = "model.vision_embed_tokens."
    e = ve + "img_processor.embeddings."
    t[e + "patch_embedding.weight"] = r(D, 3, p_sz, p_sz)
    t[e + "patch_embedding.bias"] = np.zeros(D, np.float32)
    t[e + "position_embedding.weight"] = r(4, D)
    t[ve + "img_processor.post_layernorm.weight"] = np.ones(D, np.float32)
    t[ve + "img_processor.post_layernorm.bias"] = np.zeros(D, np.float32)
    for i in range(2):
        a = f"{ve}img_processor.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            t[a + ln + ".weight"] = np.ones(D, np.float32)
            t[a + ln + ".bias"] = np.zeros(D, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[a + f"self_attn.{proj}.weight"] = r(D, D)
            t[a + f"self_attn.{proj}.bias"] = np.zeros(D, np.float32)
        t[a + "mlp.fc1.weight"] = r(Iv, D)
        t[a + "mlp.fc1.bias"] = np.zeros(Iv, np.float32)
        t[a + "mlp.fc2.weight"] = r(D, Iv)
        t[a + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    t[ve + "glb_GN"] = r(1, 1, 4 * D)
    t[ve + "sub_GN"] = r(1, 1, 1, 4 * D)
    t[ve + "img_projection.0.weight"] = r(H, 4 * D)
    t[ve + "img_projection.0.bias"] = np.zeros(H, np.float32)
    t[ve + "img_projection.2.weight"] = r(H, H)
    t[ve + "img_projection.2.bias"] = np.zeros(H, np.float32)
    save_file(t, os.path.join(path, "model.safetensors"))

    cfg = {
        "architectures": ["Phi4MMForCausalLM"],
        "model_type": "phi4mm",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
        "vision_config": {
            "hidden_size": D, "intermediate_size": Iv,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": p_sz,
            "hidden_act": "gelu_pytorch_tanh",
        },
        "embd_layer": {
            "image_embd_layer": {"base_feat_height_reduction": 2},
        },
        "image_token_id": 500,
    }
    json.dump(cfg, open(os.path.join(path, "config.json"), "w"))
    _write_tiny_tokenizer(path, V)
    return path


def test_phi4mm_engine_generates(tiny_phi4mm):
    from sglang_security_tpu.managers.multimodal_processor import (
        get_mm_processor,
    )
    from sglang_security_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_pretrained(tiny_phi4mm)
    # grid 2, reduction 2 -> h=1 -> 1*2+1 = 3 tokens
    assert get_mm_processor(cfg).tokens_per_image == 3
    eng = _engine(tiny_phi4mm)
    try:
        out = eng.generate(
            input_ids=[[1, 500, 9]], image_data=[[_image(1)]],
            sampling_params=SP,
        )[0]
        assert len(out["output_ids"]) == 5
    finally:
        eng.shutdown()
