"""Phi-3 (merged qkv/gate_up checkpoints) and InternLM2 (grouped wqkv)
HF logit parity."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits, run_prefill

H, I, hd, Hq, Hkv, V, L = 128, 256, 32, 4, 2, 512, 2


def _r(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def make_tiny_phi3(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    cfg = {
        "architectures": ["Phi3ForCausalLM"],
        "model_type": "phi3",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048,
        "original_max_position_embeddings": 2048,
        "tie_word_embeddings": False, "hidden_act": "silu",
        "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
        "torch_dtype": "float32",
        "attention_bias": False,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.qkv_proj.weight"] = _r(rng, (Hq + 2 * Hkv) * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        t[p + "mlp.gate_up_proj.weight"] = _r(rng, 2 * I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


def make_tiny_internlm2(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    cfg = {
        "architectures": ["InternLM2ForCausalLM"],
        "model_type": "internlm2",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048,
        "tie_word_embeddings": False, "hidden_act": "silu",
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
        "bias": False,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    t = {"model.tok_embeddings.weight": _r(rng, V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "output.weight": _r(rng, V, H)}
    g = Hq // Hkv
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "attention_norm.weight"] = np.ones(H, np.float32)
        t[p + "ffn_norm.weight"] = np.ones(H, np.float32)
        t[p + "attention.wqkv.weight"] = _r(rng, Hkv * (g + 2) * hd, H)
        t[p + "attention.wo.weight"] = _r(rng, H, Hq * hd)
        t[p + "feed_forward.w1.weight"] = _r(rng, I, H)
        t[p + "feed_forward.w3.weight"] = _r(rng, I, H)
        t[p + "feed_forward.w2.weight"] = _r(rng, H, I)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


TOKENS = [1, 17, 93, 203, 44, 150, 7, 77]


def test_phi3_logits_match_hf(tmp_path):
    path = make_tiny_phi3(str(tmp_path / "phi3"))
    model, params, cfg = load_model(path, dtype="float32")
    ref = hf_logits(path, TOKENS)
    ours, *_ = run_prefill(model, params, TOKENS)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)


def test_internlm2_logits_match_hf(tmp_path):
    pytest.importorskip("transformers")
    path = make_tiny_internlm2(str(tmp_path / "ilm2"))
    model, params, cfg = load_model(path, dtype="float32")
    try:
        ref = hf_logits(path, TOKENS)
    except Exception:
        pytest.skip("transformers lacks internlm2 without remote code")
    ours, *_ = run_prefill(model, params, TOKENS)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)
