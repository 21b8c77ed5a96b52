"""Tensor-parallel shard_map tests over the 8-device virtual CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM
from sglang_security_tpu.parallel.shardings import (
    build_mesh,
    kv_pspec,
    llama_param_pspecs,
    shard_params,
)

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 256,
}


def make_fb(T, S, PPS, n, pool_tokens):
    slots = np.full(T, -1, np.int32)
    slots[:n] = 8 + np.arange(n)  # page 1 onward (page_size 8)
    return ForwardBatch(
        token_ids=jnp.asarray(np.pad(np.arange(2, n + 2, dtype=np.int32) % 250, (0, T - n))),
        positions=jnp.asarray(np.pad(np.arange(n, dtype=np.int32), (0, T - n))),
        slots=jnp.asarray(slots),
        q_starts=jnp.asarray([0] + [T] * (S - 1), jnp.int32),
        q_lens=jnp.asarray([n] + [0] * (S - 1), jnp.int32),
        kv_lens=jnp.asarray([n] + [0] * (S - 1), jnp.int32),
        page_indices=jnp.asarray(
            np.pad(np.arange(1, 3, dtype=np.int32), (0, PPS - 2)).reshape(1, PPS).repeat(S, 0)
        ),
        out_rows=jnp.asarray([n - 1] + [0] * (S - 1), jnp.int32),
    )


def test_tp2_matches_single_device():
    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    cfg = ModelConfig.from_hf_dict(CFG)
    model = LlamaForCausalLM(cfg)
    params = model.init_dummy_params(seed=3, dtype=jnp.float32)
    L, Hkv, hd, ps, Pn = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, 8, 16
    T, S, PPS = 16, 2, 8
    n = 5
    fb = make_fb(T, S, PPS, n, Pn * ps)
    kv = jnp.zeros((L, Hkv, Pn * ps, hd), jnp.float32)

    # single-device reference
    model.kv_page_size = ps
    hidden_ref, _, _ = model.forward(
        params, kv, kv, fb, block_q=16, pages_per_block=2
    )
    logits_ref = model.compute_logits(params, hidden_ref)

    # tp=2: same seed -> same underlying weights, shard-interleaved merge
    model = LlamaForCausalLM(cfg, tp_size=2)
    model.kv_page_size = ps
    params = model.init_dummy_params(seed=3, dtype=jnp.float32)
    mesh = build_mesh(tp_size=2, dp_size=1)
    pspecs = llama_param_pspecs(params)
    params_sh = shard_params(params, mesh)
    kv_sh = jax.device_put(kv, NamedSharding(mesh, kv_pspec(Hkv, 2)))
    fb_spec = jax.tree.map(lambda _: P(), fb)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, kv_pspec(Hkv, 2), kv_pspec(Hkv, 2), fb_spec),
        out_specs=P(),
        check_vma=False,
    )
    def tp_step(params, k_pages, v_pages, fb):
        hidden, k_pages, v_pages = model.forward(
            params, k_pages, v_pages, fb, block_q=16, pages_per_block=2,
            tp_size=2, tp_axis="tp",
        )
        return model.compute_logits(params, hidden, tp_axis="tp")

    logits_tp = jax.jit(tp_step)(params_sh, kv_sh, kv_sh, fb)
    np.testing.assert_allclose(
        np.asarray(logits_tp[0]), np.asarray(logits_ref[0]), rtol=2e-4, atol=2e-4
    )
