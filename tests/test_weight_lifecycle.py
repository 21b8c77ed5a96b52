"""RL / checkpoint weight lifecycle (reference engine.py:392-472):
update_weights_from_tensor, release/resume_memory_occupation,
save/load_sharded_checkpoint, get_weights_by_name."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama

SP = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
PROMPT = "the quick brown fox"


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_wl") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", disable_radix_cache=True,
    ))
    yield e
    e.shutdown()


def _gen(e):
    return e.generate(prompt=PROMPT, sampling_params=SP)["output_ids"]


def _noise(a):
    # additive, so RMSNorm can't normalize the perturbation away
    return np.random.default_rng(9).standard_normal(a.shape).astype(
        a.dtype) * (np.abs(a).mean() * 5)


def test_update_weights_from_tensor_roundtrip(eng):
    base = _gen(eng)
    from safetensors import safe_open

    f = safe_open(
        eng.server_args.model_path + "/model.safetensors", framework="np"
    )
    emb = f.get_tensor("model.embed_tokens.weight")
    # push a perturbed embedding (other tensors fall back to the ckpt)
    assert eng.update_weights_from_tensor(
        [("model.embed_tokens.weight", emb + _noise(emb))]
    )
    changed = _gen(eng)
    assert changed != base
    # push the original back -> outputs restored
    assert eng.update_weights_from_tensor(
        [("model.embed_tokens.weight", emb)]
    )
    assert _gen(eng) == base


def test_release_resume_memory_occupation(eng):
    base = _gen(eng)
    assert eng.release_memory_occupation()
    assert eng.model_runner.params is None
    assert eng.model_runner.kv_pool.k_pages is None
    assert eng.resume_memory_occupation()
    assert _gen(eng) == base


def test_sharded_checkpoint_roundtrip(eng, tmp_path):
    base = _gen(eng)
    n = eng.save_sharded_checkpoint(str(tmp_path / "ckpt"))
    assert n > 4
    from safetensors import safe_open

    f = safe_open(
        eng.server_args.model_path + "/model.safetensors", framework="np"
    )
    emb = f.get_tensor("model.embed_tokens.weight")
    eng.update_weights_from_tensor(
        [("model.embed_tokens.weight", emb + _noise(emb))]
    )
    assert _gen(eng) != base
    assert eng.load_sharded_checkpoint(str(tmp_path / "ckpt"))
    assert _gen(eng) == base


def test_get_weights_by_name(eng):
    vals = eng.get_weights_by_name("embed", truncate_size=8)
    assert vals is not None and len(vals) == 8
    assert eng.get_weights_by_name("nope/missing") is None


def test_release_resume_under_mesh(tmp_path_factory):
    """resume_memory_occupation must re-shard onto the mesh (the pspec
    tree walk previously treated unrolled per-layer LISTS as leaves)."""
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_wl_tp") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", tp_size=2, unroll_layers=True,
    ))
    try:
        base = _gen(e)
        assert e.release_memory_occupation()
        assert e.resume_memory_occupation()
        assert _gen(e) == base
    finally:
        e.shutdown()


def test_sharded_checkpoint_roundtrip_under_eplb(tmp_path_factory,
                                                 tmp_path):
    """A checkpoint saved under EPLB restores without re-permuting the
    already-physical expert stacks."""
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_mixtral

    path = str(tmp_path_factory.mktemp("tiny_wl_moe") / "mixtral")
    make_tiny_mixtral(path)
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_num_iterations=10_000,
    ))
    try:
        base = e.generate(prompt="hello world", sampling_params=sp)[
            "output_ids"]
        e.save_sharded_checkpoint(str(tmp_path / "ck"))
        e.load_sharded_checkpoint(str(tmp_path / "ck"))
        assert e.generate(prompt="hello world", sampling_params=sp)[
            "output_ids"] == base
        # a rebalance after the restore still works
        e.scheduler.runner.eplb_manager.rebalance()
        assert e.generate(prompt="hello world", sampling_params=sp)[
            "output_ids"] == base
    finally:
        e.shutdown()
