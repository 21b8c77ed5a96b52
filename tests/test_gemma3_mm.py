"""Gemma 3 multimodal: SigLIP tower + 4x4-avg-pool projector parity vs
HF, and end-to-end engine generation with images (reference
srt/models/gemma3_mm.py)."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_qwen3_gemma3 import TINY_GEMMA3, _r


def make_tiny_gemma3_mm(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    text_cfg = {k: v for k, v in TINY_GEMMA3.items()
                if k not in ("architectures", "torch_dtype")}
    text_cfg["model_type"] = "gemma3_text"
    cfg = {
        "architectures": ["Gemma3ForConditionalGeneration"],
        "model_type": "gemma3",
        "image_token_index": 500,
        "boi_token_index": 498,
        "eoi_token_index": 499,
        "mm_tokens_per_image": 4,
        "text_config": text_cfg,
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14,
            "layer_norm_eps": 1e-6, "hidden_act": "gelu_pytorch_tanh",
        },
        "torch_dtype": "float32",
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I, hd, Hq, Hkv, V = 128, 256, 32, 4, 2, 512
    t = {"model.language_model.embed_tokens.weight": _r(rng, V, H),
         "model.language_model.norm.weight": np.zeros(H, np.float32)}
    for i in range(TINY_GEMMA3["num_hidden_layers"]):
        p = f"model.language_model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[p + n + ".weight"] = np.zeros(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        t[p + "self_attn.q_norm.weight"] = (
            0.5 * rng.standard_normal(hd)).astype(np.float32)
        t[p + "self_attn.k_norm.weight"] = (
            0.5 * rng.standard_normal(hd)).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    # SigLIP tower
    D, Iv = 64, 128
    vt = "model.vision_tower.vision_model."
    t[vt + "embeddings.patch_embedding.weight"] = _r(rng, D, 3, 14, 14)
    t[vt + "embeddings.patch_embedding.bias"] = _r(rng, D)
    t[vt + "embeddings.position_embedding.weight"] = _r(rng, 4, D)
    for i in range(2):
        a = vt + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            t[a + nm + ".weight"] = 1 + _r(rng, D)
            t[a + nm + ".bias"] = _r(rng, D)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[a + f"self_attn.{nm}.weight"] = _r(rng, D, D)
            t[a + f"self_attn.{nm}.bias"] = _r(rng, D)
        t[a + "mlp.fc1.weight"] = _r(rng, Iv, D)
        t[a + "mlp.fc1.bias"] = _r(rng, Iv)
        t[a + "mlp.fc2.weight"] = _r(rng, D, Iv)
        t[a + "mlp.fc2.bias"] = _r(rng, D)
    t[vt + "post_layernorm.weight"] = 1 + _r(rng, D)
    t[vt + "post_layernorm.bias"] = _r(rng, D)
    t["model.multi_modal_projector.mm_input_projection_weight"] = _r(
        rng, D, H)
    t["model.multi_modal_projector.mm_soft_emb_norm.weight"] = (
        0.3 * rng.standard_normal(D)).astype(np.float32)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


def _pixels(seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, 3, 28, 28)).astype(np.float32)


def test_gemma3_image_features_match_hf(tmp_path):
    import torch
    from transformers import Gemma3ForConditionalGeneration as HFG

    path = make_tiny_gemma3_mm(str(tmp_path / "g3mm"))
    model, params, cfg = load_model(path, dtype="float32")
    assert model.tokens_per_image == 4
    px = _pixels()
    ours = np.asarray(model.encode_images(params, px))

    hf = HFG.from_pretrained(path, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(px)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_gemma3_mm_engine_e2e(tmp_path):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    path = make_tiny_gemma3_mm(str(tmp_path / "g3mm"))
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True,
              "return_logprob": True}
        out = eng.generate(input_ids=[1, 7, 500, 9],
                           image_data=img, sampling_params=sp)
        out_rep = eng.generate(input_ids=[1, 7, 500, 9],
                               image_data=img, sampling_params=sp)
        out_other = eng.generate(input_ids=[1, 7, 500, 9],
                                 image_data=img2, sampling_params=sp)
        assert out["output_ids"] == out_rep["output_ids"]
        assert out["meta_info"]["output_token_logprobs"] == out_rep["meta_info"]["output_token_logprobs"]
        # different image -> different logits (argmax may coincide on a
        # tiny random model, so compare logprobs)
        assert out["meta_info"]["output_token_logprobs"] != out_other["meta_info"]["output_token_logprobs"]
    finally:
        eng.shutdown()
