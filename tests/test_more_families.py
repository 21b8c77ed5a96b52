"""Model-zoo batch 3: GPT-2 / GPT-BigCode (learned positions, fused
c_attn, LayerNorm, non-gated MLP), OLMo-1 (non-parametric LayerNorm),
ExaOne (GPT-style naming over the llama body), Baichuan-7B (fused
W_pack), MiniCPM (muP scalers), XVerse (llama alias).

HF-native families check logits against transformers; remote-code
families (ExaOne/Baichuan/MiniCPM) check exact equivalence against the
already-HF-parity-tested llama body with algebraically folded weights.
"""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits, run_prefill
from tests.test_new_families import _r, _write

H, I, hd, Hq, Hkv, V, L = 128, 256, 32, 4, 2, 512, 2


def _ids(n=24):
    return [int(x) for x in np.random.default_rng(7).integers(4, V - 2, n)]


def _logits(path):
    import jax.numpy as jnp

    model, params, cfg = load_model(path, dtype="float32")
    ours, *_ = run_prefill(model, params, _ids(), dtype=jnp.float32)
    return np.asarray(ours[0])


# --------------------------------------------------------------- GPT-2


def _gpt2_tensors(rng, n_layer=2, n_embd=H, n_head=4):
    t = {"wte.weight": _r(rng, V, n_embd), "wpe.weight": _r(rng, 64, n_embd)}
    inner = 4 * n_embd
    for i in range(n_layer):
        p = f"h.{i}."
        t[p + "ln_1.weight"] = 1 + _r(rng, n_embd)
        t[p + "ln_1.bias"] = _r(rng, n_embd)
        t[p + "ln_2.weight"] = 1 + _r(rng, n_embd)
        t[p + "ln_2.bias"] = _r(rng, n_embd)
        # Conv1D layout [in, out]
        t[p + "attn.c_attn.weight"] = _r(rng, n_embd, 3 * n_embd)
        t[p + "attn.c_attn.bias"] = _r(rng, 3 * n_embd)
        t[p + "attn.c_proj.weight"] = _r(rng, n_embd, n_embd)
        t[p + "attn.c_proj.bias"] = _r(rng, n_embd)
        t[p + "mlp.c_fc.weight"] = _r(rng, n_embd, inner)
        t[p + "mlp.c_fc.bias"] = _r(rng, inner)
        t[p + "mlp.c_proj.weight"] = _r(rng, inner, n_embd)
        t[p + "mlp.c_proj.bias"] = _r(rng, n_embd)
    t["ln_f.weight"] = 1 + _r(rng, n_embd)
    t["ln_f.bias"] = _r(rng, n_embd)
    return t


def test_gpt2_hf_parity(tmp_path):
    rng = np.random.default_rng(0)
    cfg = {
        "architectures": ["GPT2LMHeadModel"], "model_type": "gpt2",
        "n_embd": H, "n_head": 4, "n_layer": L, "n_positions": 64,
        "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "activation_function": "gelu_new", "bos_token_id": 1,
        "eos_token_id": 2, "tie_word_embeddings": True,
        "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "gpt2"), cfg, _gpt2_tensors(rng))
    ours = _logits(path)
    ref = hf_logits(path, _ids())
    np.testing.assert_allclose(ours, ref[-1], rtol=2e-3, atol=2e-3)


def test_gpt_bigcode_hf_parity(tmp_path):
    rng = np.random.default_rng(1)
    kd = H // 4  # one kv head
    t = {
        "transformer.wte.weight": _r(rng, V, H),
        "transformer.wpe.weight": _r(rng, 64, H),
        "transformer.ln_f.weight": 1 + _r(rng, H),
        "transformer.ln_f.bias": _r(rng, H),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1 + _r(rng, H)
        t[p + "ln_1.bias"] = _r(rng, H)
        t[p + "ln_2.weight"] = 1 + _r(rng, H)
        t[p + "ln_2.bias"] = _r(rng, H)
        # Linear layout [out, in]; MQA: out = H + 2*head_dim
        t[p + "attn.c_attn.weight"] = _r(rng, H + 2 * kd, H)
        t[p + "attn.c_attn.bias"] = _r(rng, H + 2 * kd)
        t[p + "attn.c_proj.weight"] = _r(rng, H, H)
        t[p + "attn.c_proj.bias"] = _r(rng, H)
        t[p + "mlp.c_fc.weight"] = _r(rng, 4 * H, H)
        t[p + "mlp.c_fc.bias"] = _r(rng, 4 * H)
        t[p + "mlp.c_proj.weight"] = _r(rng, H, 4 * H)
        t[p + "mlp.c_proj.bias"] = _r(rng, H)
    cfg = {
        "architectures": ["GPTBigCodeForCausalLM"],
        "model_type": "gpt_bigcode",
        "n_embd": H, "n_head": 4, "n_layer": L, "n_positions": 64,
        "vocab_size": V, "layer_norm_epsilon": 1e-5, "multi_query": True,
        "activation_function": "gelu_pytorch_tanh",
        "bos_token_id": 1, "eos_token_id": 2,
        "tie_word_embeddings": True, "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "bigcode"), cfg, t)
    ours = _logits(path)
    ref = hf_logits(path, _ids())
    np.testing.assert_allclose(ours, ref[-1], rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------- OLMo-1


def test_olmo_hf_parity(tmp_path):
    rng = np.random.default_rng(2)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = _r(rng, H, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, H, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, H, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, H)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    cfg = {
        "architectures": ["OlmoForCausalLM"], "model_type": "olmo",
        "hidden_size": H, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "vocab_size": V, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "hidden_act": "silu",
        "tie_word_embeddings": False, "clip_qkv": None,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "olmo"), cfg, t)
    ours = _logits(path)
    ref = hf_logits(path, _ids())
    np.testing.assert_allclose(ours, ref[-1], rtol=2e-3, atol=2e-3)


# ------------------------------------- remote-code families vs llama


def _llama_tensors(rng):
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    return t


def _llama_cfg(**extra):
    cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": H, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": Hq, "num_key_value_heads": Hkv,
        "head_dim": hd, "vocab_size": V, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 2048,
        "hidden_act": "silu", "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    cfg.update(extra)
    return cfg


def test_exaone_equals_llama_body(tmp_path):
    rng = np.random.default_rng(3)
    lt = _llama_tensors(rng)
    ref = _logits(_write(str(tmp_path / "llama"), _llama_cfg(), dict(lt)))

    remap = {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.norm.weight": "transformer.ln_f.weight",
    }
    sfx = {
        "input_layernorm.weight": "ln_1.weight",
        "post_attention_layernorm.weight": "ln_2.weight",
        "self_attn.q_proj.weight": "attn.attention.q_proj.weight",
        "self_attn.k_proj.weight": "attn.attention.k_proj.weight",
        "self_attn.v_proj.weight": "attn.attention.v_proj.weight",
        "self_attn.o_proj.weight": "attn.attention.out_proj.weight",
        "mlp.gate_proj.weight": "mlp.c_fc_0.weight",
        "mlp.up_proj.weight": "mlp.c_fc_1.weight",
        "mlp.down_proj.weight": "mlp.c_proj.weight",
    }
    et = {}
    for name, w in lt.items():
        if name in remap:
            et[remap[name]] = w
        elif name.startswith("model.layers."):
            _, _, i, rest = name.split(".", 3)
            et[f"transformer.h.{i}.{sfx[rest]}"] = w
        else:
            et[name] = w
    ecfg = {
        "architectures": ["ExaoneForCausalLM"], "model_type": "exaone",
        "hidden_size": H, "intermediate_size": I, "num_layers": L,
        "num_attention_heads": Hq, "num_key_value_heads": Hkv,
        "head_dim": hd, "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 2048,
        "activation_function": "silu", "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    ours = _logits(_write(str(tmp_path / "exaone"), ecfg, et))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_baichuan_equals_llama_body(tmp_path):
    rng = np.random.default_rng(4)
    lt = _llama_tensors(rng)
    ref = _logits(_write(str(tmp_path / "llama"), _llama_cfg(), dict(lt)))

    bt = {}
    for i in range(L):
        p = f"model.layers.{i}.self_attn."
        bt[p + "W_pack.weight"] = np.concatenate(
            [lt.pop(p + "q_proj.weight"), lt.pop(p + "k_proj.weight"),
             lt.pop(p + "v_proj.weight")], axis=0,
        )
    bt.update(lt)
    bcfg = _llama_cfg(architectures=["BaichuanForCausalLM"],
                      model_type="baichuan")
    ours = _logits(_write(str(tmp_path / "baichuan"), bcfg, bt))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_minicpm_equals_folded_llama(tmp_path):
    """MiniCPM's three scalers fold exactly into llama weights:
    embed*scale_emb, o/down *(scale_depth/sqrt(L)), lm_head/scale_width."""
    rng = np.random.default_rng(5)
    mt = _llama_tensors(rng)
    scale_emb, scale_depth, dim_model_base = 4.0, 1.4, 32
    mcfg = _llama_cfg(
        architectures=["MiniCPMForCausalLM"], model_type="minicpm",
        scale_emb=scale_emb, scale_depth=scale_depth,
        dim_model_base=dim_model_base,
    )
    ours = _logits(_write(str(tmp_path / "minicpm"), mcfg, dict(mt)))

    s = scale_depth / np.sqrt(L)
    lt = dict(mt)
    lt["model.embed_tokens.weight"] = mt["model.embed_tokens.weight"] * scale_emb
    lt["lm_head.weight"] = mt["lm_head.weight"] / (H / dim_model_base)
    for i in range(L):
        p = f"model.layers.{i}."
        lt[p + "self_attn.o_proj.weight"] = (
            mt[p + "self_attn.o_proj.weight"] * s
        )
        lt[p + "mlp.down_proj.weight"] = mt[p + "mlp.down_proj.weight"] * s
    ref = _logits(_write(str(tmp_path / "llama"), _llama_cfg(), lt))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_xverse_alias(tmp_path):
    rng = np.random.default_rng(6)
    lt = _llama_tensors(rng)
    xcfg = _llama_cfg(architectures=["XverseForCausalLM"],
                      model_type="xverse")
    ours = _logits(_write(str(tmp_path / "xverse"), xcfg, dict(lt)))
    ref = _logits(_write(str(tmp_path / "llama"), _llama_cfg(), dict(lt)))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)
