"""DP attention (reference layers/dp_attention.py:33): batch + KV-pool
token dim shard over the dp mesh axis inside ONE runner; attention runs
per dp group (TP within the group); hidden states all-gather over dp
for replicated sampling.  Virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_dpa") / "llama")
    make_tiny_llama(path)
    return path


def _engine(path, **kw):
    args = dict(
        model_path=path, dtype="float32", max_total_tokens=4096,
        page_size=8, prefill_token_buckets=[128, 256],
        decode_bs_buckets=[1, 2, 4], max_seq_pages_buckets=[8, 16],
        random_seed=0, enable_warmup=False, log_level="warning",
    )
    args.update(kw)
    return Engine(ServerArgs(**args))


PROMPTS = [
    "the quick brown fox",
    "pack my box with five dozen",
    "jived fox nymph grabs",
    "how vexingly quick daft",
    "sphinx of black quartz",
]
SP = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}


def test_dp_attention_greedy_parity(tiny):
    eng = _engine(tiny)
    base = [o["output_ids"] for o in eng.generate(
        prompt=PROMPTS, sampling_params=SP)]
    eng.shutdown()

    eng = _engine(tiny, enable_dp_attention=True, dp_size=2, tp_size=2)
    runner = eng.scheduler.runner
    assert runner.dp_attn_size == 2
    assert runner.mesh is not None
    # the pool's token dim is genuinely sharded over dp
    from jax.sharding import PartitionSpec as P

    assert runner._kv_pspec == P(None, None, "dp", None) or \
        runner._kv_pspec == P(None, "tp", "dp", None)
    got = [o["output_ids"] for o in eng.generate(
        prompt=PROMPTS, sampling_params=SP)]
    assert got == base
    # both shards actually hold requests (5 reqs over 2 shards)
    shards_used = {
        s for s in range(2)
        if eng.scheduler.allocators[s].available_pages
        < eng.scheduler.allocators[s].num_pages - 1
        or eng.scheduler.tree_caches[s].evictable_pages > 0
    }
    assert len(shards_used) == 2, shards_used
    eng.shutdown()


def test_dp_attention_prefix_cache_and_streaming_decode(tiny):
    eng = _engine(tiny, enable_dp_attention=True, dp_size=2, tp_size=1)
    long_prompt = "repeat " * 40
    o1 = eng.generate(prompt=long_prompt, sampling_params=SP)
    o2 = eng.generate(prompt=long_prompt, sampling_params=SP)
    # same prompt hashes to the same shard -> radix prefix reuse works
    assert o2["meta_info"]["cached_tokens"] > 0
    assert o1["output_ids"] == o2["output_ids"]
    eng.shutdown()


def test_dp_attention_multi_step_decode_parity(tiny):
    """decode_steps_per_batch > 1: the in-scan dp slice of replicated
    sampled tokens must reproduce single-step outputs exactly."""
    eng = _engine(tiny, decode_steps_per_batch=1)
    base = [o["output_ids"] for o in eng.generate(
        prompt=PROMPTS, sampling_params=SP)]
    eng.shutdown()
    eng = _engine(tiny, enable_dp_attention=True, dp_size=2, tp_size=2,
                  decode_steps_per_batch=4)
    got = [o["output_ids"] for o in eng.generate(
        prompt=PROMPTS, sampling_params=SP)]
    assert got == base
    eng.shutdown()


def test_dp_attention_mixed_lengths_and_sampling(tiny):
    """Different-length prompts + nongreedy sampling run without error
    and stay deterministic for fixed seed."""
    eng = _engine(tiny, enable_dp_attention=True, dp_size=2, tp_size=2)
    prompts = ["a", "bb cc dd ee ff " * 10, "zz", "yy xx " * 25]
    sp = {"temperature": 0.8, "top_k": 20, "max_new_tokens": 6,
          "ignore_eos": True}
    outs = eng.generate(prompt=prompts, sampling_params=sp)
    assert all(o["meta_info"]["completion_tokens"] == 6 for o in outs)
    eng.shutdown()
