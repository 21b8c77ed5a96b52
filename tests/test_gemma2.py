"""Gemma2 HF logit parity + engine e2e."""

import json
import os

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from tests.test_model_parity import hf_logits

TINY_GEMMA2 = {
    "architectures": ["Gemma2ForCausalLM"],
    "model_type": "gemma2",
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
    "tie_word_embeddings": True,
    "hidden_act": "gelu_pytorch_tanh",
    "hidden_activation": "gelu_pytorch_tanh",
    "attn_logit_softcapping": 50.0,
    "final_logit_softcapping": 30.0,
    "query_pre_attn_scalar": 32,
    "sliding_window": 16,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "attention_bias": False,
}


def make_tiny_gemma2(path, seed=0):
    from safetensors.numpy import save_file

    from sglang_security_tpu.test_utils import _write_tiny_tokenizer

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(TINY_GEMMA2, f, indent=1)
    rng = np.random.default_rng(seed)
    H, I = 128, 256
    hd, Hq, Hkv, V = 32, 4, 2, 512

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t = {"model.embed_tokens.weight": r(V, H),
         "model.norm.weight": np.zeros(H, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[p + n + ".weight"] = np.zeros(H, np.float32)
        t[p + "self_attn.q_proj.weight"] = r(Hq * hd, H)
        t[p + "self_attn.k_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.v_proj.weight"] = r(Hkv * hd, H)
        t[p + "self_attn.o_proj.weight"] = r(H, Hq * hd)
        t[p + "mlp.gate_proj.weight"] = r(I, H)
        t[p + "mlp.up_proj.weight"] = r(I, H)
        t[p + "mlp.down_proj.weight"] = r(H, I)
    save_file(t, os.path.join(path, "model.safetensors"))
    _write_tiny_tokenizer(path, V)
    return path


@pytest.fixture(scope="module")
def tiny_gemma(tmp_path_factory):
    return make_tiny_gemma2(str(tmp_path_factory.mktemp("tg") / "gemma2"))


def run_prefill_unrolled(model, params, token_ids, page_size=8, block_q=16):
    from tests.test_model_parity import run_prefill

    params = model.unroll_params(params)
    return run_prefill(model, params, token_ids, page_size, block_q)


def test_gemma2_logits_match_hf(tiny_gemma):
    model, params, cfg = load_model(tiny_gemma, dtype="float32")
    # long enough that layer 0's sliding window (16) actually truncates
    token_ids = [1, 17, 93, 203, 44, 150, 7, 77, 31, 8, 409, 57, 266,
                 12, 99, 321, 5, 87, 254, 33]
    ref = hf_logits(tiny_gemma, token_ids)
    ours, *_ = run_prefill_unrolled(model, params, token_ids)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)


def test_gemma2_engine_e2e(tiny_gemma):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(
        ServerArgs(model_path=tiny_gemma, dtype="float32",
                   max_total_tokens=2048, page_size=8,
                   prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
                   max_seq_pages_buckets=[8], random_seed=0)
    )
    try:
        out = eng.generate(
            prompt="gemma check",
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )
        assert out["meta_info"]["completion_tokens"] == 6
    finally:
        eng.shutdown()
