"""Qwen3 (per-head QK RMSNorm) and Gemma3-text (QK norm + dual RoPE)
HF logit parity — the ADVICE round-1 high finding: these architectures
were registered but produced wrong logits."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits, run_prefill

TINY_QWEN3 = {
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "max_position_embeddings": 2048,
    "tie_word_embeddings": False,
    "hidden_act": "silu",
    "attention_bias": False,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
}

TINY_GEMMA3 = {
    "architectures": ["Gemma3ForCausalLM"],
    "model_type": "gemma3_text",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "rope_local_base_freq": 10000.0,
    "rope_scaling": {"rope_type": "linear", "factor": 8.0},
    "max_position_embeddings": 2048,
    "tie_word_embeddings": True,
    "hidden_act": "gelu_pytorch_tanh",
    "hidden_activation": "gelu_pytorch_tanh",
    "query_pre_attn_scalar": 32,
    "sliding_window": 16,
    "sliding_window_pattern": 2,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "attention_bias": False,
}


def _r(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def make_tiny_qwen3(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    cfg = TINY_QWEN3
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I, hd, Hq, Hkv, V = 128, 256, 32, 4, 2, 512
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        # non-trivial qk norms so a missing application fails parity
        t[p + "self_attn.q_norm.weight"] = (
            1.0 + 0.5 * rng.standard_normal(hd)
        ).astype(np.float32)
        t[p + "self_attn.k_norm.weight"] = (
            1.0 + 0.5 * rng.standard_normal(hd)
        ).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


def make_tiny_gemma3(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    cfg = TINY_GEMMA3
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I, hd, Hq, Hkv, V = 128, 256, 32, 4, 2, 512
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": np.zeros(H, np.float32)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[p + n + ".weight"] = np.zeros(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        t[p + "self_attn.q_norm.weight"] = (
            0.5 * rng.standard_normal(hd)
        ).astype(np.float32)
        t[p + "self_attn.k_norm.weight"] = (
            0.5 * rng.standard_normal(hd)
        ).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


def test_qwen3_logits_match_hf(tmp_path):
    path = make_tiny_qwen3(str(tmp_path / "qwen3"))
    model, params, cfg = load_model(path, dtype="float32")
    assert cfg.qk_norm
    token_ids = [1, 17, 93, 203, 44, 150, 7, 77]
    ref = hf_logits(path, token_ids)
    ours, *_ = run_prefill(model, params, token_ids)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)


def test_gemma3_logits_match_hf(tmp_path):
    path = make_tiny_gemma3(str(tmp_path / "gemma3"))
    model, params, cfg = load_model(path, dtype="float32")
    # long enough that the sliding window (16) truncates on local layers,
    # so local-vs-global RoPE and the window pattern are both exercised
    token_ids = [1, 17, 93, 203, 44, 150, 7, 77, 31, 8, 409, 57, 266,
                 12, 99, 321, 5, 87, 254, 33]
    ref = hf_logits(path, token_ids)
    params = model.unroll_params(params)
    ours, *_ = run_prefill(model, params, token_ids, page_size=8, block_q=16)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)
