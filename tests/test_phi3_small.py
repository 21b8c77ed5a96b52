"""Phi-3-small: muP-scaled LN decoder, gegelu MLP, interleaved QKV.

Reference: ``srt/models/phi3_small.py`` (no transformers-native class —
trust_remote_code arch), so parity is gated against a torch oracle
implementing the HF/reference math exactly (the repo's pattern for
HF-less families, tests/test_grok_xverse.py), plus engine e2e.
"""

import json
import os

import numpy as np
import pytest

CFG = {
    "architectures": ["Phi3SmallForCausalLM"],
    "model_type": "phi3small",
    "hidden_size": 128,
    "intermediate_size": 192,
    "num_hidden_layers": 2,
    "num_attention_heads": 8,
    "num_key_value_heads": 2,
    "vocab_size": 512,
    "max_position_embeddings": 2048,
    "layer_norm_epsilon": 1e-5,
    "hidden_act": "gegelu",
    "gegelu_limit": 20.0,
    "mup_use_scaling": True,
    "mup_attn_multiplier": 1.0,
    "mup_embedding_multiplier": 10.0,
    "mup_width_multiplier": 8.0,
    "rope_embedding_base": 10000.0,
    "rope_position_scale": 1.0,
    "tie_word_embeddings": True,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "dummy_token_indices": [509, 510, 511],
}


def make_tiny_phi3small(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(CFG, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I, V = CFG["hidden_size"], CFG["intermediate_size"], CFG["vocab_size"]
    Hq, Hkv = CFG["num_attention_heads"], CFG["num_key_value_heads"]
    hd = H // Hq

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {
        "model.embed_tokens.weight": r(V, H),
        "model.final_layernorm.weight": 1 + r(H, scale=0.01),
        "model.final_layernorm.bias": r(H, scale=0.01),
    }
    for i in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[p + n + ".weight"] = 1 + r(H, scale=0.01)
            t[p + n + ".bias"] = r(H, scale=0.01)
        t[p + "self_attn.query_key_value.weight"] = r(
            Hkv * (Hq // Hkv + 2) * hd, H
        )
        t[p + "self_attn.query_key_value.bias"] = r(
            Hkv * (Hq // Hkv + 2) * hd, scale=0.01
        )
        t[p + "self_attn.dense.weight"] = r(H, H)
        t[p + "self_attn.dense.bias"] = r(H, scale=0.01)
        t[p + "mlp.up_proj.weight"] = r(2 * I, H)
        t[p + "mlp.up_proj.bias"] = r(2 * I, scale=0.01)
        t[p + "mlp.down_proj.weight"] = r(H, I)
        t[p + "mlp.down_proj.bias"] = r(H, scale=0.01)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_phi3small(str(tmp_path_factory.mktemp("p3s") / "m"))


def _oracle_logits(path, token_ids):
    """Reference-math forward in numpy (phi3_small.py semantics)."""
    from safetensors.numpy import load_file

    t = load_file(os.path.join(path, "model.safetensors"))
    H, Hq = CFG["hidden_size"], CFG["num_attention_heads"]
    Hkv = CFG["num_key_value_heads"]
    hd = H // Hq
    g = Hq // Hkv
    T = len(token_ids)
    eps = CFG["layer_norm_epsilon"]

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def rope(x, pos):
        # [T, h, hd] neox half-rotation
        half = hd // 2
        inv = 1.0 / (
            CFG["rope_embedding_base"]
            ** (np.arange(0, half) * 2.0 / hd)
        )
        ang = pos[:, None] * inv[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate(
            [x1 * cos[:, None] - x2 * sin[:, None],
             x2 * cos[:, None] + x1 * sin[:, None]], axis=-1
        )

    x = t["model.embed_tokens.weight"][token_ids] * CFG[
        "mup_embedding_multiplier"
    ]
    pos = np.arange(T, dtype=np.float64)
    scale = CFG["mup_attn_multiplier"] / hd
    for i in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{i}."
        h = ln(x, t[p + "input_layernorm.weight"],
               t[p + "input_layernorm.bias"])
        qkv = h @ t[p + "self_attn.query_key_value.weight"].T + t[
            p + "self_attn.query_key_value.bias"
        ]
        qkv = qkv.reshape(T, Hkv, g + 2, hd)
        q = qkv[:, :, :g].reshape(T, Hq, hd)
        k = qkv[:, :, g]
        v = qkv[:, :, g + 1]
        q, k = rope(q, pos), rope(k, pos)
        o = np.zeros((T, Hq, hd))
        for hh in range(Hq):
            att = (q[:, hh] @ k[:, hh // g].T) * scale
            mask = np.triu(np.full((T, T), -np.inf), 1)
            w = np.exp(att + mask - (att + mask).max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            o[:, hh] = w @ v[:, hh // g]
        x = x + o.reshape(T, H) @ t[p + "self_attn.dense.weight"].T + t[
            p + "self_attn.dense.bias"
        ]
        h = ln(x, t[p + "post_attention_layernorm.weight"],
               t[p + "post_attention_layernorm.bias"])
        gu = h @ t[p + "mlp.up_proj.weight"].T + t[p + "mlp.up_proj.bias"]
        a_gelu = np.minimum(gu[..., ::2], CFG["gegelu_limit"])
        a_lin = np.clip(gu[..., 1::2], -CFG["gegelu_limit"],
                        CFG["gegelu_limit"])
        act = a_gelu / (1 + np.exp(-1.702 * a_gelu)) * (a_lin + 1)
        x = x + act @ t[p + "mlp.down_proj.weight"].T + t[
            p + "mlp.down_proj.bias"
        ]
    x = ln(x, t["model.final_layernorm.weight"],
           t["model.final_layernorm.bias"])
    logits = x @ t["model.embed_tokens.weight"].T / CFG[
        "mup_width_multiplier"
    ]
    logits[:, CFG["dummy_token_indices"]] = -np.inf
    return logits


def test_phi3small_matches_oracle(tiny):
    from sglang_security_tpu.model_loader import load_model
    from tests.test_model_parity import run_prefill

    model, params, cfg = load_model(tiny, dtype="float32")
    token_ids = [1, 17, 93, 203, 44, 150, 7, 77, 31, 8]
    ref = _oracle_logits(tiny, token_ids)
    params = model.unroll_params(params)
    ours, *_ = run_prefill(model, params, token_ids, 8, 16)
    finite = np.isfinite(ref[-1])
    assert not finite[CFG["dummy_token_indices"]].any()
    assert not np.isfinite(np.asarray(ours[0]))[
        CFG["dummy_token_indices"]
    ].any()
    np.testing.assert_allclose(
        ours[0][finite], ref[-1][finite], rtol=5e-3, atol=5e-3
    )


def test_phi3small_engine_e2e(tiny):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128],
        decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8],
        random_seed=0, enable_warmup=False, log_level="warning",
    ))
    try:
        out = eng.generate(
            prompt="phi3 small check",
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )
        assert out["meta_info"]["completion_tokens"] == 6
        assert all(
            t not in CFG["dummy_token_indices"] for t in out["output_ids"]
        )
    finally:
        eng.shutdown()
