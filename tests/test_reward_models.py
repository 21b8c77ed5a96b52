"""Reward + sequence-classification heads served through the encode
path (reference qwen2_rm.py / llama_classification.py)."""

import json
import os

import numpy as np
import pytest

from tests.test_new_families import H, I, hd, Hq, Hkv, V, L, _r, _write, \
    _base_cfg, _std_attn, _gated_mlp


def _mk_cls_ckpt(path, num_labels=3, seed=0):
    rng = np.random.default_rng(seed)
    cfg = _base_cfg("LlamaForSequenceClassification", "llama",
                    num_labels=num_labels, tie_word_embeddings=False)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "score.weight": _r(rng, num_labels, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        _std_attn(rng, t, p)
        _gated_mlp(rng, t, p)
    return _write(path, cfg, t)


def _mk_rm_ckpt(path, seed=1):
    rng = np.random.default_rng(seed)
    cfg = _base_cfg("Qwen2ForRewardModel", "qwen2",
                    tie_word_embeddings=False)
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "score.0.weight": _r(rng, H, H),
         "score.0.bias": _r(rng, H),
         "score.2.weight": _r(rng, 1, H),
         "score.2.bias": _r(rng, 1)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        _std_attn(rng, t, p, bias=True)  # qwen2 qkv bias
        _gated_mlp(rng, t, p)
    return _write(path, cfg, t)


def test_llama_classification_matches_hf(tmp_path):
    import torch
    from transformers import AutoModelForSequenceClassification

    import jax.numpy as jnp

    from sglang_security_tpu.model_loader import load_model
    from tests.test_model_parity import run_prefill

    path = _mk_cls_ckpt(str(tmp_path / "cls"))
    model, params, cfg = load_model(path, dtype="float32")
    ids = [5, 17, 93, 203, 44, 150, 7]
    hidden, *_ = run_prefill_hidden(model, params, ids)
    ours = np.asarray(model.pool(params, hidden))[0]

    m = AutoModelForSequenceClassification.from_pretrained(
        path, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        ref = m(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def run_prefill_hidden(model, params, ids):
    """Like tests.test_model_parity.run_prefill but returns the pooled
    last-token hidden instead of logits."""
    import jax.numpy as jnp

    from tests.test_model_parity import run_prefill

    # run_prefill computes hidden then logits; recompute hidden here
    import numpy as _np

    from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
    from sglang_security_tpu.utils import round_up

    cfg = model.config
    page_size, block_q, n_pages, pps = 8, 16, 64, 16
    T = round_up(len(ids), block_q)
    kshape = (cfg.num_layers, cfg.kv_cache_num_heads,
              n_pages * page_size, cfg.kv_cache_head_dim)
    k_pages = jnp.zeros(kshape, jnp.float32)
    v_pages = jnp.zeros(kshape, jnp.float32)
    n = len(ids)
    used = -(-n // page_size)
    pages = _np.arange(1, used + 1, dtype=_np.int32)
    pi = _np.zeros((1, pps), _np.int32)
    pi[0, :used] = pages
    slots = _np.full(T, -1, _np.int32)
    slots[:n] = pages[_np.arange(n) // page_size] * page_size + _np.arange(n) % page_size
    fb = ForwardBatch(
        token_ids=jnp.asarray(_np.pad(_np.asarray(ids, _np.int32), (0, T - n))),
        positions=jnp.asarray(_np.pad(_np.arange(n, dtype=_np.int32), (0, T - n))),
        slots=jnp.asarray(slots),
        q_starts=jnp.asarray([0], jnp.int32),
        q_lens=jnp.asarray([n], jnp.int32),
        kv_lens=jnp.asarray([n], jnp.int32),
        page_indices=jnp.asarray(pi),
        out_rows=jnp.asarray([n - 1], jnp.int32),
    )
    model.kv_page_size = page_size
    hidden, k_pages, v_pages = model.forward(
        params, k_pages, v_pages, fb, block_q=block_q, pages_per_block=2
    )
    return hidden, k_pages, v_pages


def test_reward_model_through_engine_encode(tmp_path):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    path = _mk_rm_ckpt(str(tmp_path / "rm"))
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", is_embedding=True,
    ))
    out = eng.encode("rate this answer please")
    score = out["embedding"]
    assert len(score) == 1 and np.isfinite(score[0])
    # deterministic + input-sensitive
    out2 = eng.encode("rate this answer please")
    assert out2["embedding"] == score
    out3 = eng.encode("a completely different input text")
    assert out3["embedding"] != score
    eng.shutdown()


def test_llama_embedding_model_last_token_normalized(tmp_path):
    """e5-mistral-class bare MistralModel export (no "model." prefix, no
    lm_head): pooled output is the L2-normalized last-token hidden of
    the identical causal-LM checkpoint (reference llama_embedding.py,
    Pooler LAST + normalize)."""
    from sglang_security_tpu.model_loader import load_model

    rng = np.random.default_rng(9)
    t = {"embed_tokens.weight": _r(rng, V, H),
         "norm.weight": 1 + _r(rng, H)}
    for i in range(L):
        p = f"layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
        t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
    cfg = _base_cfg("MistralModel", "mistral", tie_word_embeddings=True)
    cfg.pop("head_dim", None)
    path = _write(str(tmp_path / "emb"), cfg, t)
    model, params, _ = load_model(path, dtype="float32")
    assert model.is_pooling_model
    ids = [5, 17, 93, 203, 44]
    hidden, *_ = run_prefill_hidden(model, params, ids)
    emb = np.asarray(model.pool(params, hidden))[0]
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)

    # same weights as a causal LlamaForCausalLM: hidden must match
    t2 = {"model." + k: v for k, v in t.items()}
    t2["lm_head.weight"] = _r(rng, V, H)
    cfg2 = _base_cfg("LlamaForCausalLM", "llama",
                     tie_word_embeddings=False)
    cfg2.pop("head_dim", None)
    path2 = _write(str(tmp_path / "lm"), cfg2, t2)
    model2, params2, _ = load_model(path2, dtype="float32")
    hidden2, *_ = run_prefill_hidden(model2, params2, ids)
    want = np.asarray(hidden2)[0]
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-5)


def test_gemma2_and_internlm2_reward_heads(tmp_path):
    """Score heads on non-llama bodies (reference gemma2_reward.py /
    internlm2_reward.py): registry classes load and pool."""
    import jax.numpy as jnp

    from sglang_security_tpu.model_loader import load_model
    from sglang_security_tpu.models.registry import MODEL_REGISTRY

    assert "Gemma2ForSequenceClassification" in MODEL_REGISTRY
    assert "InternLM2ForRewardModel" in MODEL_REGISTRY

    # tiny gemma2 classification checkpoint
    rng = np.random.default_rng(21)
    cfg = _base_cfg("Gemma2ForSequenceClassification", "gemma2",
                    num_labels=2, tie_word_embeddings=True,
                    query_pre_attn_scalar=32, attn_logit_softcapping=None,
                    final_logit_softcapping=None, sliding_window=4096,
                    hidden_act="gelu_pytorch_tanh",
                    hidden_activation="gelu_pytorch_tanh")
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": np.zeros(H, np.float32),
         "score.weight": _r(rng, 2, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[p + n + ".weight"] = np.zeros(H, np.float32)
        _std_attn(rng, t, p)
        _gated_mlp(rng, t, p)
    path = _write(str(tmp_path / "g2cls"), cfg, t)
    model, params, _ = load_model(path, dtype="float32")
    assert model.is_pooling_model
    params = model.unroll_params(params)  # gemma2: per-layer windows
    hidden, *_ = run_prefill_hidden(model, params, [5, 17, 93])
    out = np.asarray(model.pool(params, hidden))
    assert out.shape == (1, 2) and np.isfinite(out).all()
