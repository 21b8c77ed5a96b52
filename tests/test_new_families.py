"""HF logit parity for the round-2 model-zoo additions:
GLM-4 (interleaved partial rotary + sandwich norms), OLMo2 (post-norm
+ flat qk norms), StableLM (LayerNorm + partial rotary), Cohere
(parallel block + logit_scale), Granite (multipliers), StarCoder2
(non-gated biased MLP + LayerNorm)."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits, run_prefill

H, I, hd, Hq, Hkv, V, L = 128, 256, 32, 4, 2, 512, 2


def _r(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _write(path, cfg, tensors, vocab=V):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, vocab)
    return path


def _base_cfg(arch, model_type, **extra):
    cfg = {
        "architectures": [arch], "model_type": model_type,
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "hidden_act": "silu",
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "pad_token_id": 0,
        "torch_dtype": "float32",
    }
    cfg.update(extra)
    return cfg


def _std_attn(rng, t, p, bias=False, o_bias=False):
    t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
    t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
    t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
    t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
    if bias:
        t[p + "self_attn.q_proj.bias"] = _r(rng, Hq * hd)
        t[p + "self_attn.k_proj.bias"] = _r(rng, Hkv * hd)
        t[p + "self_attn.v_proj.bias"] = _r(rng, Hkv * hd)
    if o_bias:
        t[p + "self_attn.o_proj.bias"] = _r(rng, H)


def _gated_mlp(rng, t, p):
    t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
    t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
    t[p + "mlp.down_proj.weight"] = _r(rng, H, I)


def _check(path, rtol=2e-3, atol=2e-3):
    import jax.numpy as jnp

    model, params, cfg = load_model(path, dtype="float32")
    ids = [int(x) for x in np.random.default_rng(7).integers(4, V - 2, 24)]
    ours, *_ = run_prefill(model, params, ids, dtype=jnp.float32)
    ref = hf_logits(path, ids)
    # last-position logits parity vs HF float32
    np.testing.assert_allclose(ours[0], ref[-1], rtol=rtol, atol=atol)


def test_glm4_parity(tmp_path):
    rng = np.random.default_rng(0)
    cfg = _base_cfg("Glm4ForCausalLM", "glm4",
                    partial_rotary_factor=0.5, attention_bias=True)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm",
                  "post_self_attn_layernorm", "post_mlp_layernorm"):
            t[p + n + ".weight"] = 1 + _r(rng, H)
        _std_attn(rng, t, p, bias=True)
        t[p + "mlp.gate_up_proj.weight"] = _r(rng, 2 * I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    _check(_write(tmp_path / "glm4", cfg, t))


def test_olmo2_parity(tmp_path):
    rng = np.random.default_rng(1)
    cfg = _base_cfg("Olmo2ForCausalLM", "olmo2", attention_bias=False)
    del cfg["head_dim"]  # olmo2 infers H // Hq
    cfg["num_attention_heads"] = H // hd
    cfg["num_key_value_heads"] = 2
    nq = H // hd
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_feedforward_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "self_attn.q_proj.weight"] = _r(rng, nq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, 2 * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, 2 * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, nq * hd)
        t[p + "self_attn.q_norm.weight"] = 1 + _r(rng, nq * hd)
        t[p + "self_attn.k_norm.weight"] = 1 + _r(rng, 2 * hd)
        _gated_mlp(rng, t, p)
    _check(_write(tmp_path / "olmo2", cfg, t))


def test_stablelm_parity(tmp_path):
    rng = np.random.default_rng(2)
    cfg = _base_cfg("StableLmForCausalLM", "stablelm",
                    partial_rotary_factor=0.25, use_qkv_bias=True,
                    use_parallel_residual=False, layer_norm_eps=1e-5,
                    qk_layernorm=False)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "model.norm.bias": _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[p + n + ".weight"] = 1 + _r(rng, H)
            t[p + n + ".bias"] = _r(rng, H)
        _std_attn(rng, t, p, bias=True)
        _gated_mlp(rng, t, p)
    _check(_write(tmp_path / "stablelm", cfg, t))


def test_cohere_parity(tmp_path):
    rng = np.random.default_rng(3)
    cfg = _base_cfg("CohereForCausalLM", "cohere",
                    layer_norm_eps=1e-5, logit_scale=0.25,
                    tie_word_embeddings=True, use_qk_norm=False)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        _std_attn(rng, t, p)
        _gated_mlp(rng, t, p)
    _check(_write(tmp_path / "cohere", cfg, t))


def test_granite_parity(tmp_path):
    rng = np.random.default_rng(4)
    cfg = _base_cfg("GraniteForCausalLM", "granite",
                    embedding_multiplier=6.0, residual_multiplier=0.5,
                    attention_multiplier=0.08, logits_scaling=4.0,
                    attention_bias=False)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        _std_attn(rng, t, p)
        _gated_mlp(rng, t, p)
    _check(_write(tmp_path / "granite", cfg, t))


def test_starcoder2_parity(tmp_path):
    rng = np.random.default_rng(5)
    cfg = _base_cfg("Starcoder2ForCausalLM", "starcoder2",
                    use_bias=True, norm_epsilon=1e-5,
                    hidden_act="gelu_pytorch_tanh",
                    tie_word_embeddings=True, sliding_window=None)
    del cfg["rms_norm_eps"]
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "model.norm.bias": _r(rng, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[p + n + ".weight"] = 1 + _r(rng, H)
            t[p + n + ".bias"] = _r(rng, H)
        _std_attn(rng, t, p, bias=True, o_bias=True)
        t[p + "mlp.c_fc.weight"] = _r(rng, I, H)
        t[p + "mlp.c_fc.bias"] = _r(rng, I)
        t[p + "mlp.c_proj.weight"] = _r(rng, H, I)
        t[p + "mlp.c_proj.bias"] = _r(rng, H)
    _check(_write(tmp_path / "starcoder2", cfg, t))


def test_olmoe_parity(tmp_path):
    E, kk, Imoe = 4, 2, 64
    rng = np.random.default_rng(6)
    cfg = _base_cfg("OlmoeForCausalLM", "olmoe",
                    num_experts=E, num_experts_per_tok=kk,
                    norm_topk_prob=False, attention_bias=False)
    del cfg["head_dim"]  # olmoe infers H // num_heads
    nq = H // hd
    cfg["num_attention_heads"] = nq
    cfg["num_key_value_heads"] = nq  # olmoe default: MHA
    cfg["intermediate_size"] = Imoe
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "self_attn.q_proj.weight"] = _r(rng, nq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, nq * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, nq * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, nq * hd)
        t[p + "self_attn.q_norm.weight"] = 1 + _r(rng, nq * hd)
        t[p + "self_attn.k_norm.weight"] = 1 + _r(rng, nq * hd)
        t[p + "mlp.gate.weight"] = _r(rng, E, H)
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            t[ep + "gate_proj.weight"] = _r(rng, Imoe, H)
            t[ep + "up_proj.weight"] = _r(rng, Imoe, H)
            t[ep + "down_proj.weight"] = _r(rng, H, Imoe)
    _check(_write(tmp_path / "olmoe", cfg, t), rtol=4e-3, atol=4e-3)


def test_gemma1_parity(tmp_path):
    rng = np.random.default_rng(8)
    cfg = _base_cfg("GemmaForCausalLM", "gemma", hidden_act="gelu",
                    tie_word_embeddings=True, head_dim=hd)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": _r(rng, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = _r(rng, H)
        _std_attn(rng, t, p)
        _gated_mlp(rng, t, p)
    _check(_write(tmp_path / "gemma1", cfg, t))
