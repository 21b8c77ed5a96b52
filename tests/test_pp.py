"""Pipeline-parallel forward over the 8-device virtual CPU mesh.

The pp mesh axis shards stacked layers and the KV pool on the layer dim;
llama._forward_pp runs the GPipe tick schedule with ppermute hops
(reference analog: event_loop_pp + P2P groups)."""

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
    param_pspecs,
    shard_params,
)

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 256,
}
PS = 8  # page size


def decode_fb(B, PPS, kv_len):
    """Decode-shaped batch: B seqs, one new token each; seq b owns pages
    [1 + b*4, ...]; the new token's slot is position kv_len-1."""
    pages = np.zeros((B, PPS), np.int32)
    slots = np.zeros(B, np.int32)
    for b in range(B):
        own = 1 + b * 4 + np.arange(-(-kv_len // PS))
        pages[b, : len(own)] = own
        slots[b] = own[(kv_len - 1) // PS] * PS + (kv_len - 1) % PS
    return ForwardBatch(
        token_ids=jnp.asarray((np.arange(B) * 7 + 3) % 250, jnp.int32),
        positions=jnp.full((B,), kv_len - 1, jnp.int32),
        slots=jnp.asarray(slots),
        q_starts=jnp.arange(B, dtype=jnp.int32),
        q_lens=jnp.ones(B, jnp.int32),
        kv_lens=jnp.full((B,), kv_len, jnp.int32),
        page_indices=jnp.asarray(pages),
        out_rows=jnp.arange(B, dtype=jnp.int32),
    )


@pytest.mark.parametrize("pp,tp,micro", [(2, 1, 2), (4, 2, 2), (2, 2, 1)])
def test_pp_decode_matches_single_device(pp, tp, micro):
    if jax.device_count() < pp * tp:
        pytest.skip("needs more devices")
    cfg = ModelConfig.from_hf_dict(CFG)
    L, Hkv, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    n_pages = 32
    B, PPS, kv_len = 4, 8, 11
    rng = np.random.default_rng(0)
    kv0 = jnp.asarray(
        rng.standard_normal((L, Hkv, n_pages * PS, hd)) * 0.3, jnp.float32
    )
    fb = decode_fb(B, PPS, kv_len)

    ref_model = LlamaForCausalLM(cfg)  # tp=1 merge order
    ref_model.kv_page_size = PS
    ref_params = ref_model.init_dummy_params(seed=5, dtype=jnp.float32)
    hidden_ref, k_ref, v_ref = ref_model.forward(
        ref_params, kv0, kv0, fb, block_q=1, tp_size=1
    )
    logits_ref = ref_model.compute_logits(ref_params, hidden_ref)

    # same seed -> same underlying weights, shard-interleaved merge
    model = LlamaForCausalLM(cfg, tp_size=tp)
    model.kv_page_size = PS
    params = model.init_dummy_params(seed=5, dtype=jnp.float32)

    mesh = build_mesh(tp_size=tp, pp_size=pp)
    pspecs = param_pspecs(params, pp=True)
    kvspec = kv_pspec(Hkv, tp, pp=True)
    params_sh = shard_params(params, mesh, pspecs)
    kv_sh = jax.device_put(kv0, NamedSharding(mesh, kvspec))
    fb_spec = jax.tree.map(lambda _: P(), fb)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, kvspec, kvspec, fb_spec),
        out_specs=(P(), kvspec, kvspec),
        check_vma=False,
    )
    def pp_step(params, k_pages, v_pages, fb):
        hidden, k_pages, v_pages = model.forward(
            params, k_pages, v_pages, fb, block_q=1,
            tp_size=tp, tp_axis="tp",
            pp_axis="pp", pp_size=pp, pp_microbatches=micro,
        )
        logits = model.compute_logits(params, hidden, tp_axis="tp")
        return logits, k_pages, v_pages

    logits_pp, k_pp, v_pp = jax.jit(pp_step)(params_sh, kv_sh, kv_sh, fb)
    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_ref), rtol=3e-4, atol=3e-4
    )
    # every stage wrote its layers' new-token KV
    np.testing.assert_allclose(
        np.asarray(k_pp), np.asarray(k_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v_pp), np.asarray(v_ref), rtol=1e-5, atol=1e-5
    )


def test_pp_prefill_matches_single_device():
    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    pp = 2
    cfg = ModelConfig.from_hf_dict(CFG)
    L, Hkv, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    n_pages = 16
    T, S, PPS, n = 16, 2, 8, 5
    slots = np.full(T, -1, np.int32)
    slots[:n] = PS + np.arange(n)
    fb = ForwardBatch(
        token_ids=jnp.asarray(
            np.pad(np.arange(2, n + 2, dtype=np.int32), (0, T - n))
        ),
        positions=jnp.asarray(np.pad(np.arange(n, dtype=np.int32), (0, T - n))),
        slots=jnp.asarray(slots),
        q_starts=jnp.asarray([0] + [T] * (S - 1), jnp.int32),
        q_lens=jnp.asarray([n] + [0] * (S - 1), jnp.int32),
        kv_lens=jnp.asarray([n] + [0] * (S - 1), jnp.int32),
        page_indices=jnp.asarray(
            np.pad(np.arange(1, 3, dtype=np.int32), (0, PPS - 2))
            .reshape(1, PPS).repeat(S, 0)
        ),
        out_rows=jnp.asarray([n - 1] + [0] * (S - 1), jnp.int32),
    )
    kv0 = jnp.zeros((L, Hkv, n_pages * PS, hd), jnp.float32)

    model = LlamaForCausalLM(cfg)
    model.kv_page_size = PS
    params = model.init_dummy_params(seed=7, dtype=jnp.float32)
    hidden_ref, _, _ = model.forward(
        params, kv0, kv0, fb, block_q=16, pages_per_block=2
    )

    mesh = build_mesh(pp_size=pp)
    pspecs = param_pspecs(params, pp=True)
    kvspec = kv_pspec(Hkv, 1, pp=True)
    params_sh = shard_params(params, mesh, pspecs)
    kv_sh = jax.device_put(kv0, NamedSharding(mesh, kvspec))
    fb_spec = jax.tree.map(lambda _: P(), fb)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, kvspec, kvspec, fb_spec),
        out_specs=P(),
        check_vma=False,
    )
    def pp_step(params, k_pages, v_pages, fb):
        hidden, _, _ = model.forward(
            params, k_pages, v_pages, fb, block_q=16, pages_per_block=2,
            pp_axis="pp", pp_size=pp,
        )
        return hidden

    hidden_pp = jax.jit(pp_step)(params_sh, kv_sh, kv_sh, fb)
    np.testing.assert_allclose(
        np.asarray(hidden_pp), np.asarray(hidden_ref), rtol=3e-4, atol=3e-4
    )
