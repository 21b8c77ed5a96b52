"""DeepSeek-V2 MLA + MoE: HF logit parity and engine e2e."""

import numpy as np
import pytest

from sglang_security_tpu.model_loader import load_model
from sglang_security_tpu.test_utils import make_tiny_deepseek
from tests.test_model_parity import hf_logits, run_prefill


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_ds") / "dsv2"
    make_tiny_deepseek(str(path))
    return str(path)


def test_config_maps_mla(tiny_ds):
    from sglang_security_tpu.models.config import ModelConfig

    cfg = ModelConfig.from_pretrained(tiny_ds)
    assert cfg.use_mla
    assert cfg.kv_cache_num_heads == 1
    assert cfg.kv_cache_head_dim == 128  # pad128(64 + 16)
    assert cfg.first_k_dense_layers == 1
    assert cfg.num_shared_experts == 1


def test_prefill_logits_match_hf(tiny_ds):
    model, params, cfg = load_model(tiny_ds, dtype="float32")
    token_ids = [1, 17, 93, 203, 44, 150, 7, 77, 31]
    ref = hf_logits(tiny_ds, token_ids)
    ours, *_ = run_prefill(model, params, token_ids, page_size=8, block_q=16)
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)


def test_decode_matches_hf(tiny_ds):
    """Prefill then one decode step through the compressed latent cache."""
    import jax.numpy as jnp

    from sglang_security_tpu.model_executor.forward_batch import ForwardBatch

    model, params, cfg = load_model(tiny_ds, dtype="float32")
    token_ids = [1, 5, 99, 183, 42, 310, 6]
    next_tok = 77
    ref = hf_logits(tiny_ds, token_ids + [next_tok])
    logits_p, k_pages, v_pages, pages, n = run_prefill(
        model, params, token_ids, page_size=8, block_q=16
    )
    page_size, pps = 8, 16
    kv_len = n + 1
    used = -(-kv_len // page_size)
    pi = np.zeros((1, pps), np.int32)
    pi[0, :used] = np.arange(1, used + 1)
    slot = pi[0, n // page_size] * page_size + n % page_size
    fb = ForwardBatch(
        token_ids=jnp.asarray([next_tok], jnp.int32),
        positions=jnp.asarray([n], jnp.int32),
        slots=jnp.asarray([int(slot)], jnp.int32),
        q_starts=jnp.asarray([0], jnp.int32),
        q_lens=jnp.asarray([1], jnp.int32),
        kv_lens=jnp.asarray([kv_len], jnp.int32),
        page_indices=jnp.asarray(pi),
        out_rows=jnp.asarray([0], jnp.int32),
    )
    hidden, *_ = model.forward(
        params, k_pages, v_pages, fb, block_q=1, pages_per_block=2
    )
    ours = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(ours[0], ref[-1], rtol=5e-3, atol=5e-3)


def test_engine_e2e(tiny_ds):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    eng = Engine(
        ServerArgs(model_path=tiny_ds, dtype="float32",
                   max_total_tokens=2048, page_size=8,
                   prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
                   max_seq_pages_buckets=[8], random_seed=0)
    )
    try:
        out = eng.generate(
            prompt="deepseek latent attention",
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
        )
        assert out["meta_info"]["completion_tokens"] == 6
        out2 = eng.generate(
            prompt="deepseek latent attention",
            sampling_params={"temperature": 0.0, "max_new_tokens": 3,
                             "ignore_eos": True},
        )
        assert out2["output_ids"][:3] == out["output_ids"][:3]
    finally:
        eng.shutdown()
