"""Model-zoo batch 4: DBRX (MoE, LayerNorm, fused Wqkv + clip_qkv),
ChatGLM legacy format (fused MQA qkv, interleaved half rotary, fused
gate_up), Qwen-1 (GPT-style naming, w2/w1 gate/up swap), DeepSeek v1
(GQA attention + the V2 MoE FFN)."""

import json

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits, run_prefill
from tests.test_more_families import (
    H, I, hd, Hq, Hkv, V, L, _ids, _llama_cfg, _llama_tensors, _logits,
)
from tests.test_new_families import _r, _write


def test_dbrx_hf_parity(tmp_path):
    rng = np.random.default_rng(0)
    E, topk, ffn = 4, 2, 192
    kd = Hkv * (H // Hq)
    t = {"transformer.wte.weight": _r(rng, V, H),
         "transformer.norm_f.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L):
        p = f"transformer.blocks.{i}."
        t[p + "norm_attn_norm.norm_1.weight"] = 1 + _r(rng, H)
        t[p + "norm_attn_norm.norm_2.weight"] = 1 + _r(rng, H)
        t[p + "norm_attn_norm.attn.Wqkv.weight"] = _r(rng, H + 2 * kd, H)
        t[p + "norm_attn_norm.attn.out_proj.weight"] = _r(rng, H, H)
        t[p + "ffn.router.layer.weight"] = _r(rng, E, H)
        t[p + "ffn.experts.mlp.w1"] = _r(rng, E * ffn, H)
        t[p + "ffn.experts.mlp.v1"] = _r(rng, E * ffn, H)
        t[p + "ffn.experts.mlp.w2"] = _r(rng, E * ffn, H)
    cfg = {
        "architectures": ["DbrxForCausalLM"], "model_type": "dbrx",
        "d_model": H, "n_heads": Hq, "n_layers": L, "max_seq_len": 256,
        "vocab_size": V, "resid_pdrop": 0.0, "emb_pdrop": 0.0,
        "attn_config": {"kv_n_heads": Hkv, "clip_qkv": 8.0,
                        "rope_theta": 10000.0, "attn_pdrop": 0.0},
        "ffn_config": {"ffn_hidden_size": ffn, "moe_num_experts": E,
                       "moe_top_k": topk,
                       "moe_normalize_expert_weights": 1.0},
        "tie_word_embeddings": False, "torch_dtype": "float32",
        "bos_token_id": 1, "eos_token_id": 2,
    }
    path = _write(str(tmp_path / "dbrx"), cfg, t)
    ours = _logits(path)
    ref = hf_logits(path, _ids())
    np.testing.assert_allclose(ours, ref[-1], rtol=3e-3, atol=3e-3)


def test_qwen1_equals_llama_body(tmp_path):
    rng = np.random.default_rng(1)
    # MHA variant of the llama tensors (Qwen-1 has no GQA)
    lt = _llama_tensors(rng)
    for i in range(L):
        p = f"model.layers.{i}.self_attn."
        lt[p + "k_proj.weight"] = _r(rng, Hq * hd, H)
        lt[p + "v_proj.weight"] = _r(rng, Hq * hd, H)
    lcfg = _llama_cfg(num_key_value_heads=Hq)
    ref = _logits(_write(str(tmp_path / "llama"), lcfg, dict(lt)))

    qt = {"transformer.wte.weight": lt["model.embed_tokens.weight"],
          "transformer.ln_f.weight": lt["model.norm.weight"],
          "lm_head.weight": lt["lm_head.weight"]}
    for i in range(L):
        p = f"model.layers.{i}."
        q = f"transformer.h.{i}."
        qt[q + "ln_1.weight"] = lt[p + "input_layernorm.weight"]
        qt[q + "ln_2.weight"] = lt[p + "post_attention_layernorm.weight"]
        qt[q + "attn.c_attn.weight"] = np.concatenate(
            [lt[p + "self_attn.q_proj.weight"],
             lt[p + "self_attn.k_proj.weight"],
             lt[p + "self_attn.v_proj.weight"]], axis=0)
        qt[q + "attn.c_attn.bias"] = np.zeros(3 * Hq * hd, np.float32)
        qt[q + "attn.c_proj.weight"] = lt[p + "self_attn.o_proj.weight"]
        qt[q + "mlp.w2.weight"] = lt[p + "mlp.gate_proj.weight"]
        qt[q + "mlp.w1.weight"] = lt[p + "mlp.up_proj.weight"]
        qt[q + "mlp.c_proj.weight"] = lt[p + "mlp.down_proj.weight"]
    qcfg = {
        "architectures": ["QWenLMHeadModel"], "model_type": "qwen",
        "hidden_size": H, "intermediate_size": 2 * I,  # doubled, qwen-style
        "num_hidden_layers": L, "num_attention_heads": Hq,
        "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "rotary_emb_base": 10000.0, "seq_length": 2048,
        "no_bias": True, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    ours = _logits(_write(str(tmp_path / "qwen1"), qcfg, qt))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _interleave_rotary_rows(w, num_heads, head_dim, rot):
    """Inverse of glm4.deinterleave_rotary_rows (build checkpoints that
    store interleaved rotary pairs)."""
    perm = np.arange(head_dim)
    perm[: rot // 2] = np.arange(0, rot, 2)
    perm[rot // 2 : rot] = np.arange(1, rot, 2)
    inv = np.argsort(perm)
    full = (np.arange(num_heads)[:, None] * head_dim + inv[None, :]).ravel()
    return w[full]


def test_chatglm_equals_llama_body(tmp_path):
    rng = np.random.default_rng(2)
    lt = _llama_tensors(rng)
    # reference run: llama body with half-width rotary
    import jax.numpy as jnp

    from sglang_security_tpu.layers.rotary import compute_inv_freq

    lpath = _write(str(tmp_path / "llama"), _llama_cfg(), dict(lt))
    model, params, _ = load_model(lpath, dtype="float32")
    model.rotary_dim = hd // 2
    model.inv_freq = jnp.asarray(compute_inv_freq(hd // 2, 10000.0, None))
    ref, *_ = run_prefill(model, params, _ids(), dtype=jnp.float32)
    ref = np.asarray(ref)[0]

    gt = {
        "transformer.embedding.word_embeddings.weight":
            lt["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight":
            lt["model.norm.weight"],
        "transformer.output_layer.weight": lt["lm_head.weight"],
    }
    for i in range(L):
        p = f"model.layers.{i}."
        g = f"transformer.encoder.layers.{i}."
        gt[g + "input_layernorm.weight"] = lt[p + "input_layernorm.weight"]
        gt[g + "post_attention_layernorm.weight"] = (
            lt[p + "post_attention_layernorm.weight"])
        q = _interleave_rotary_rows(
            lt[p + "self_attn.q_proj.weight"], Hq, hd, hd // 2)
        k = _interleave_rotary_rows(
            lt[p + "self_attn.k_proj.weight"], Hkv, hd, hd // 2)
        gt[g + "self_attention.query_key_value.weight"] = np.concatenate(
            [q, k, lt[p + "self_attn.v_proj.weight"]], axis=0)
        gt[g + "self_attention.query_key_value.bias"] = np.zeros(
            (Hq + 2 * Hkv) * hd, np.float32)
        gt[g + "self_attention.dense.weight"] = (
            lt[p + "self_attn.o_proj.weight"])
        gt[g + "mlp.dense_h_to_4h.weight"] = np.concatenate(
            [lt[p + "mlp.gate_proj.weight"], lt[p + "mlp.up_proj.weight"]],
            axis=0)
        gt[g + "mlp.dense_4h_to_h.weight"] = lt[p + "mlp.down_proj.weight"]
    gcfg = {
        "architectures": ["ChatGLMModel"], "model_type": "chatglm",
        "hidden_size": H, "ffn_hidden_size": I, "num_layers": L,
        "num_attention_heads": Hq, "multi_query_attention": True,
        "multi_query_group_num": Hkv, "kv_channels": hd,
        "padded_vocab_size": V, "layernorm_epsilon": 1e-5,
        "add_qkv_bias": True, "add_bias_linear": False,
        "apply_residual_connection_post_layernorm": False,
        "rope_ratio": 1.0, "seq_length": 2048, "rmsnorm": True,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    ours = _logits(_write(str(tmp_path / "chatglm"), gcfg, gt))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_deepseek_v1_dense_equals_llama(tmp_path):
    """v1 with num_experts=0 is exactly the llama body through the
    DeepseekV2 class's non-MLA branch."""
    rng = np.random.default_rng(3)
    lt = _llama_tensors(rng)
    ref = _logits(_write(str(tmp_path / "llama"), _llama_cfg(), dict(lt)))
    dcfg = _llama_cfg(architectures=["DeepseekForCausalLM"],
                      model_type="deepseek")
    ours = _logits(_write(str(tmp_path / "ds1"), dcfg, dict(lt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_deepseek_v1_moe_engine(tmp_path):
    """v1 MoE (first dense layer + routed + gateless shared experts)
    serves end-to-end and is deterministic."""
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    rng = np.random.default_rng(4)
    E, K, mi = 4, 2, 64
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
        if i == 0:  # first_k_dense_replace=1
            t[p + "mlp.gate_proj.weight"] = _r(rng, I, H)
            t[p + "mlp.up_proj.weight"] = _r(rng, I, H)
            t[p + "mlp.down_proj.weight"] = _r(rng, H, I)
        else:
            t[p + "mlp.gate.weight"] = _r(rng, E, H)
            for e in range(E):
                ep = p + f"mlp.experts.{e}."
                t[ep + "gate_proj.weight"] = _r(rng, mi, H)
                t[ep + "up_proj.weight"] = _r(rng, mi, H)
                t[ep + "down_proj.weight"] = _r(rng, H, mi)
            sp = p + "mlp.shared_experts."
            t[sp + "gate_proj.weight"] = _r(rng, mi, H)
            t[sp + "up_proj.weight"] = _r(rng, mi, H)
            t[sp + "down_proj.weight"] = _r(rng, H, mi)
    cfg = _llama_cfg(
        architectures=["DeepseekForCausalLM"], model_type="deepseek",
        n_routed_experts=E, num_experts_per_tok=K,
        moe_intermediate_size=mi, n_shared_experts=1,
        first_k_dense_replace=1, norm_topk_prob=False,
        scoring_func="softmax",
    )
    path = _write(str(tmp_path / "ds1moe"), cfg, t)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
        out1 = eng.generate(prompt="deepseek v one", sampling_params=sp)
        out2 = eng.generate(prompt="deepseek v one", sampling_params=sp)
        assert out1["output_ids"] == out2["output_ids"]
        assert len(out1["output_ids"]) == 6
    finally:
        eng.shutdown()


def _bert_ckpt(tmp_path, rng, arch="BertModel", model_type="bert"):
    t = {
        "embeddings.word_embeddings.weight": _r(rng, V, H),
        "embeddings.position_embeddings.weight": _r(rng, 128, H),
        "embeddings.token_type_embeddings.weight": _r(rng, 2, H),
        "embeddings.LayerNorm.weight": 1 + _r(rng, H),
        "embeddings.LayerNorm.bias": _r(rng, H),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        a = p + "attention."
        for nm in ("self.query", "self.key", "self.value", "output.dense"):
            t[a + nm + ".weight"] = _r(rng, H, H)
            t[a + nm + ".bias"] = _r(rng, H)
        t[a + "output.LayerNorm.weight"] = 1 + _r(rng, H)
        t[a + "output.LayerNorm.bias"] = _r(rng, H)
        t[p + "intermediate.dense.weight"] = _r(rng, I, H)
        t[p + "intermediate.dense.bias"] = _r(rng, I)
        t[p + "output.dense.weight"] = _r(rng, H, I)
        t[p + "output.dense.bias"] = _r(rng, H)
        t[p + "output.LayerNorm.weight"] = 1 + _r(rng, H)
        t[p + "output.LayerNorm.bias"] = _r(rng, H)
    # HF BertModel also has a pooler head; unused by our LAST pooling
    t["pooler.dense.weight"] = _r(rng, H, H)
    t["pooler.dense.bias"] = _r(rng, H)
    cfg = {
        "architectures": [arch], "model_type": model_type,
        "hidden_size": H, "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": Hq, "vocab_size": V,
        "max_position_embeddings": 128, "hidden_act": "gelu",
        "layer_norm_eps": 1e-12, "pad_token_id": 0,
        "type_vocab_size": 2, "torch_dtype": "float32",
    }
    return _write(str(tmp_path / "bert"), cfg, t)


def test_bert_hf_parity(tmp_path):
    import jax.numpy as jnp
    import torch
    from transformers import AutoModel

    rng = np.random.default_rng(7)
    path = _bert_ckpt(tmp_path, rng)
    from tests.test_reward_models import run_prefill_hidden

    model, params, _ = load_model(path, dtype="float32")
    assert model.is_pooling_model
    ids = _ids(12)
    hidden, *_ = run_prefill_hidden(model, params, ids)
    emb = np.asarray(model.pool(params, hidden))[0]

    m = AutoModel.from_pretrained(path, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        last = m(torch.tensor([ids])).last_hidden_state[0, -1].numpy()
    want = last / np.linalg.norm(last)
    np.testing.assert_allclose(emb, want, rtol=2e-3, atol=2e-3)


def test_bert_packed_batch_isolation(tmp_path):
    """Two sequences packed in one prefill attend only within
    themselves (block-diagonal bidirectional mask)."""
    import jax.numpy as jnp

    from sglang_security_tpu.model_executor.forward_batch import ForwardBatch

    rng = np.random.default_rng(8)
    path = _bert_ckpt(tmp_path, rng)
    model, params, _ = load_model(path, dtype="float32")
    a = _ids(9)
    b = list(reversed(_ids(7)))

    from tests.test_reward_models import run_prefill_hidden

    def solo(ids):
        h, *_ = run_prefill_hidden(model, params, ids)
        return np.asarray(model.pool(params, h))[0]

    ea, eb = solo(a), solo(b)

    n = len(a) + len(b)
    T = 32
    ids = np.zeros(T, np.int32)
    ids[:n] = a + b
    pos = np.zeros(T, np.int32)
    pos[: len(a)] = np.arange(len(a))
    pos[len(a) : n] = np.arange(len(b))
    fb = ForwardBatch(
        token_ids=jnp.asarray(ids),
        positions=jnp.asarray(pos),
        slots=jnp.full((T,), -1, jnp.int32),
        q_starts=jnp.asarray([0, len(a)], jnp.int32),
        q_lens=jnp.asarray([len(a), len(b)], jnp.int32),
        kv_lens=jnp.asarray([len(a), len(b)], jnp.int32),
        page_indices=jnp.zeros((2, 8), jnp.int32),
        out_rows=jnp.asarray([len(a) - 1, n - 1], jnp.int32),
    )
    kshape = (model.config.num_layers, model.config.kv_cache_num_heads,
              64, model.config.kv_cache_head_dim)
    h, *_ = model.forward(
        params, jnp.zeros(kshape, jnp.float32),
        jnp.zeros(kshape, jnp.float32), fb, block_q=16,
    )
    packed = np.asarray(model.pool(params, h))
    np.testing.assert_allclose(packed[0], ea, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(packed[1], eb, rtol=1e-4, atol=1e-4)


def test_bert_through_engine_encode(tmp_path):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    rng = np.random.default_rng(9)
    path = _bert_ckpt(tmp_path, rng)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", is_embedding=True,
    ))
    try:
        out = eng.encode(prompt=["embed this text", "and also this"])
        assert len(out) == 2
        for o in out:
            v = np.asarray(o["embedding"])
            assert v.shape == (H,)
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-4)
    finally:
        eng.shutdown()


def test_llama4_hf_parity(tmp_path):
    """Llama4 text: NoPE/rope interleave, L2 qk-norm, attention
    temperature tuning, input-scaled sigmoid MoE + shared expert,
    dense/MoE layer interleave."""
    rng = np.random.default_rng(13)
    L4, E, Ie, Im = 4, 4, 64, 96
    t = {"model.embed_tokens.weight": _r(rng, V, H),
         "model.norm.weight": 1 + _r(rng, H),
         "lm_head.weight": _r(rng, V, H)}
    for i in range(L4):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, H)
        t[p + "self_attn.q_proj.weight"] = _r(rng, Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = _r(rng, Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = _r(rng, H, Hq * hd)
        f = p + "feed_forward."
        if i % 2 == 0:  # dense (interleave_moe_layer_step=2)
            t[f + "gate_proj.weight"] = _r(rng, Im, H)
            t[f + "up_proj.weight"] = _r(rng, Im, H)
            t[f + "down_proj.weight"] = _r(rng, H, Im)
        else:
            t[f + "router.weight"] = _r(rng, E, H)
            t[f + "experts.gate_up_proj"] = _r(rng, E, H, 2 * Ie)
            t[f + "experts.down_proj"] = _r(rng, E, Ie, H)
            t[f + "shared_expert.gate_proj.weight"] = _r(rng, Ie, H)
            t[f + "shared_expert.up_proj.weight"] = _r(rng, Ie, H)
            t[f + "shared_expert.down_proj.weight"] = _r(rng, H, Ie)
    cfg = {
        "architectures": ["Llama4ForCausalLM"], "model_type": "llama4_text",
        "hidden_size": H, "intermediate_size": Ie,
        "intermediate_size_mlp": Im, "num_hidden_layers": L4,
        "num_attention_heads": Hq, "num_key_value_heads": Hkv,
        "head_dim": hd, "vocab_size": V, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 256,
        "num_local_experts": E, "num_experts_per_tok": 1,
        "interleave_moe_layer_step": 2, "use_qk_norm": True,
        "attn_temperature_tuning": True, "floor_scale": 8.0,
        "attn_scale": 0.1, "attention_chunk_size": 64,
        "hidden_act": "silu", "tie_word_embeddings": False,
        "attention_bias": False,
        "bos_token_id": 1, "eos_token_id": 2, "torch_dtype": "float32",
    }
    path = _write(str(tmp_path / "llama4"), cfg, t)
    ours = _logits(path)
    ref = hf_logits(path, _ids())
    np.testing.assert_allclose(ours, ref[-1], rtol=3e-3, atol=3e-3)


def test_llama4_engine_e2e(tmp_path):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    rng = np.random.default_rng(14)
    cfgj = {
        "architectures": ["Llama4ForCausalLM"], "model_type": "llama4_text",
        "hidden_size": 64, "intermediate_size": 64,
        "intermediate_size_mlp": 96, "num_hidden_layers": 4,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "head_dim": 16, "vocab_size": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 256,
        "num_local_experts": 4, "num_experts_per_tok": 1,
        "interleave_moe_layer_step": 2, "use_qk_norm": True,
        "attn_temperature_tuning": True, "floor_scale": 8.0,
        "attn_scale": 0.1, "attention_chunk_size": 256,
        "hidden_act": "silu", "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    d = tmp_path / "l4"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(cfgj, f)
    _write_tiny_tokenizer(str(d), 256)
    eng = Engine(ServerArgs(
        model_path=str(d), load_format="dummy", dtype="float32",
        max_total_tokens=1024, page_size=8, prefill_token_buckets=[64],
        decode_bs_buckets=[1, 2], max_seq_pages_buckets=[8],
        random_seed=0, enable_warmup=False, log_level="warning",
    ))
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
        out = eng.generate(prompt="llama four", sampling_params=sp)
        out2 = eng.generate(prompt="llama four", sampling_params=sp)
        assert out["output_ids"] == out2["output_ids"]
        assert len(out["output_ids"]) == 6
    finally:
        eng.shutdown()


def test_minicpm3_equals_folded_deepseek_mla(tmp_path):
    """MiniCPM3 = DeepSeek MLA attention + MiniCPM muP scalers; the
    scalers fold exactly into the DeepseekV2 class's weights."""
    rng = np.random.default_rng(15)
    Hc, Hqn = 64, 4
    nope, rope_d, c, vdim = 16, 8, 32, 16
    Ic = 96
    Lc = 2
    t = {"model.embed_tokens.weight": _r(rng, V, Hc),
         "model.norm.weight": 1 + _r(rng, Hc),
         "lm_head.weight": _r(rng, V, Hc)}
    for i in range(Lc):
        p = f"model.layers.{i}."
        a = p + "self_attn."
        t[p + "input_layernorm.weight"] = 1 + _r(rng, Hc)
        t[p + "post_attention_layernorm.weight"] = 1 + _r(rng, Hc)
        t[a + "q_proj.weight"] = _r(rng, Hqn * (nope + rope_d), Hc)
        t[a + "kv_a_proj_with_mqa.weight"] = _r(rng, c + rope_d, Hc)
        t[a + "kv_a_layernorm.weight"] = 1 + _r(rng, c)
        t[a + "kv_b_proj.weight"] = _r(rng, Hqn * (nope + vdim), c)
        t[a + "o_proj.weight"] = _r(rng, Hc, Hqn * vdim)
        m = p + "mlp."
        t[m + "gate_proj.weight"] = _r(rng, Ic, Hc)
        t[m + "up_proj.weight"] = _r(rng, Ic, Hc)
        t[m + "down_proj.weight"] = _r(rng, Hc, Ic)
    dims = {
        "hidden_size": Hc, "intermediate_size": Ic, "num_hidden_layers": Lc,
        "num_attention_heads": Hqn, "num_key_value_heads": Hqn,
        "qk_nope_head_dim": nope, "qk_rope_head_dim": rope_d,
        "kv_lora_rank": c, "v_head_dim": vdim, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "hidden_act": "silu",
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
        "torch_dtype": "float32",
    }
    scale_emb, scale_depth, dim_model_base = 4.0, 1.4, 16
    mcfg = dict(dims, architectures=["MiniCPM3ForCausalLM"],
                model_type="minicpm3", scale_emb=scale_emb,
                scale_depth=scale_depth, dim_model_base=dim_model_base)
    ours = _logits(_write(str(tmp_path / "m3"), mcfg, dict(t)))

    s = scale_depth / np.sqrt(Lc)
    ft = dict(t)
    ft["model.embed_tokens.weight"] = t["model.embed_tokens.weight"] * scale_emb
    ft["lm_head.weight"] = t["lm_head.weight"] / (Hc / dim_model_base)
    for i in range(Lc):
        p = f"model.layers.{i}."
        ft[p + "self_attn.o_proj.weight"] = t[p + "self_attn.o_proj.weight"] * s
        ft[p + "mlp.down_proj.weight"] = t[p + "mlp.down_proj.weight"] * s
    dcfg = dict(dims, architectures=["DeepseekV2ForCausalLM"],
                model_type="deepseek_v2")
    ref = _logits(_write(str(tmp_path / "dsv2"), dcfg, ft))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
