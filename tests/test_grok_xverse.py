"""Grok-1 and XVERSE-MoE model families.

Neither has an HF-transformers-native class (grok is xAI layout,
xverse-moe is remote-code), so — like the ExaOne/Baichuan pattern in
test_more_families.py — parity is checked against a handwritten numpy
oracle implementing the reference math exactly
(``/root/reference/python/sglang/srt/models/grok.py`` sandwich norms +
attn/router softcaps + multipliers, ``xverse_moe.py`` ungated shared
expert), on synthetic checkpoints in each family's native layout.
"""

import json
import os

import numpy as np

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import run_prefill
from tests.test_new_families import _r, _write

H, I, hd, Hq, Hkv, V, L, E = 64, 96, 16, 4, 2, 256, 2, 4


def _ids(n=16):
    return [int(x) for x in np.random.default_rng(5).integers(4, V - 2, n)]


# ------------------------------------------------------------- oracle
def _rms(x, w, eps=1e-5):
    v = np.mean(x.astype(np.float64) ** 2, -1, keepdims=True)
    return (x / np.sqrt(v + eps) * w).astype(np.float64)


def _rope(x, pos, theta=10000.0):
    d = x.shape[-1]
    inv = 1.0 / theta ** (np.arange(0, d, 2) / d)
    ang = np.asarray(pos)[:, None] * inv[None]
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return np.concatenate(
        [x1 * cos[:, None] - x2 * sin[:, None],
         x2 * cos[:, None] + x1 * sin[:, None]], -1,
    )


def _attn(x, t, p, softcap=None):
    T = x.shape[0]
    q = (x @ t[p + "self_attn.q_proj.weight"].T).reshape(T, Hq, hd)
    k = (x @ t[p + "self_attn.k_proj.weight"].T).reshape(T, Hkv, hd)
    v = (x @ t[p + "self_attn.v_proj.weight"].T).reshape(T, Hkv, hd)
    pos = np.arange(T)
    q, k = _rope(q, pos), _rope(k, pos)
    rep = Hq // Hkv
    k = np.repeat(k, rep, 1)
    v = np.repeat(v, rep, 1)
    s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    if softcap:
        s = softcap * np.tanh(s / softcap)
    s = np.where(np.tril(np.ones((T, T), bool))[None], s, -np.inf)
    a = np.exp(s - s.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)
    o = np.einsum("hqk,khd->qhd", a, v).reshape(T, Hq * hd)
    return o @ t[p + "self_attn.o_proj.weight"].T


def _silu(x):
    return x / (1 + np.exp(-x))


def _moe(x, router, gates, ups, downs, top_k, act, softcap=None,
         renorm=True):
    lg = x @ router.T
    if softcap:
        lg = softcap * np.tanh(lg / softcap)
    sc = np.exp(lg - lg.max(-1, keepdims=True))
    sc /= sc.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for ti in range(x.shape[0]):
        ids = np.argsort(-sc[ti])[:top_k]
        w = sc[ti][ids]
        if renorm:
            w = w / w.sum()
        for j, e in enumerate(ids):
            hgate = act(x[ti] @ gates[e].T)
            h = hgate * (x[ti] @ ups[e].T)
            out[ti] += w[j] * (h @ downs[e].T)
    return out


# ---------------------------------------------------------------- grok
def test_grok_matches_oracle(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H, scale=0.02),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        for nm in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                   "post_moe_norm"):
            t[p + nm + ".weight"] = 1 + _r(rng, H, scale=0.02)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        m = p + "block_sparse_moe."
        t[m + "gate.weight"] = _r(rng, E, H)
        for e in range(E):
            t[m + f"experts.{e}.w1.weight"] = _r(rng, I, H)  # gate
            t[m + f"experts.{e}.w3.weight"] = _r(rng, I, H)  # up
            t[m + f"experts.{e}.w2.weight"] = _r(rng, H, I)  # down
    cfg = {
        "architectures": ["Grok1ForCausalLM"], "model_type": "grok-1",
        "hidden_size": H, "intermediate_size": I,
        "moe_intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "hidden_act": "silu",
        "attn_logit_softcapping": 5.0,
        "router_logit_softcapping": 2.0,
        "embedding_multiplier_scale": 2.0,
        "output_multiplier_scale": 0.5,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "grok"), cfg, t, vocab=V)
    model, params, _ = load_model(path, dtype="float32")
    ids = _ids()
    ours, *_ = run_prefill(model, params, ids, dtype=jnp.float32)

    # oracle (reference Grok1DecoderLayer forward semantics)
    x = t["model.embed_tokens.weight"][ids].astype(np.float64) * 2.0
    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms(x, t[p + "pre_attn_norm.weight"])
        o = _attn(h, t, p, softcap=5.0)
        x = x + _rms(o, t[p + "post_attn_norm.weight"])
        h = _rms(x, t[p + "pre_moe_norm.weight"])
        m = p + "block_sparse_moe."
        f = _moe(
            h, t[m + "gate.weight"],
            [t[m + f"experts.{e}.w1.weight"] for e in range(E)],
            [t[m + f"experts.{e}.w3.weight"] for e in range(E)],
            [t[m + f"experts.{e}.w2.weight"] for e in range(E)],
            top_k=2, act=_silu, softcap=2.0, renorm=True,
        )
        x = x + _rms(f, t[p + "post_moe_norm.weight"])
    x = _rms(x, t["model.norm.weight"])
    ref = (x[-1] @ t["lm_head.weight"].T) * 0.5
    np.testing.assert_allclose(
        np.asarray(ours[0]), ref, rtol=3e-3, atol=3e-3
    )


# -------------------------------------------------------------- xverse
def test_xverse_moe_matches_oracle(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H, scale=0.02),
         "lm_head.weight": _r(rng, V, H)}
    n_shared = 2
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H, scale=0.02)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(
            rng, H, scale=0.02
        )
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        m = p + "mlp."
        t[m + "router.weight"] = _r(rng, E, H)
        for e in range(E):
            ep = m + f"experts.{e}."
            t[ep + "gate_proj.weight"] = _r(rng, I, H)
            t[ep + "up_proj.weight"] = _r(rng, I, H)
            t[ep + "down_proj.weight"] = _r(rng, H, I)
        sp = m + "shared_experts."
        Is = I * n_shared
        t[sp + "gate_proj.weight"] = _r(rng, Is, H)
        t[sp + "up_proj.weight"] = _r(rng, Is, H)
        t[sp + "down_proj.weight"] = _r(rng, H, Is)
    cfg = {
        "architectures": ["XverseMoeForCausalLM"], "model_type": "xverse",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "num_key_value_heads": Hkv, "head_dim": hd, "vocab_size": V,
        "num_experts": E, "moe_top_k": 2, "num_shared_experts": n_shared,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "hidden_act": "silu",
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "xvmoe"), cfg, t, vocab=V)
    model, params, _ = load_model(path, dtype="float32")
    assert model.config.num_experts_per_tok == 2  # moe_top_k mapping
    ids = _ids()
    ours, *_ = run_prefill(model, params, ids, dtype=jnp.float32)

    x = t["model.embed_tokens.weight"][ids].astype(np.float64)
    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms(x, t[p + "input_layernorm.weight"])
        x = x + _attn(h, t, p)
        h = _rms(x, t[p + "post_attention_layernorm.weight"])
        m = p + "mlp."
        f = _moe(
            h, t[m + "router.weight"],
            [t[m + f"experts.{e}.gate_proj.weight"] for e in range(E)],
            [t[m + f"experts.{e}.up_proj.weight"] for e in range(E)],
            [t[m + f"experts.{e}.down_proj.weight"] for e in range(E)],
            top_k=2, act=_silu, renorm=False,  # norm_topk_prob default
        )
        sp = m + "shared_experts."
        shared = (
            _silu(h @ t[sp + "gate_proj.weight"].T)
            * (h @ t[sp + "up_proj.weight"].T)
        ) @ t[sp + "down_proj.weight"].T
        x = x + f + shared  # shared expert ungated, always on
    x = _rms(x, t["model.norm.weight"])
    ref = x[-1] @ t["lm_head.weight"].T
    np.testing.assert_allclose(
        np.asarray(ours[0]), ref, rtol=3e-3, atol=3e-3
    )
