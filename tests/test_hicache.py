"""Hierarchical (device+host) cache tests."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_h") / "llama")
    make_tiny_llama(path)
    # tiny device pool (64 tokens = 8 pages) so eviction happens fast;
    # host tier 4x larger
    eng = Engine(
        ServerArgs(model_path=path, dtype="float32",
                   max_total_tokens=256, page_size=8,
                   enable_hierarchical_cache=True, hicache_ratio=4.0,
                   prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
                   max_seq_pages_buckets=[8], max_prefill_tokens=128,
                   chunked_prefill_size=128, random_seed=0)
    )
    yield eng
    eng.shutdown()


SP = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}


def test_evicted_prefix_restored_from_host(engine):
    tree = engine.scheduler.tree_cache
    ctrl = tree.controller
    p1 = list(range(40, 80))  # 40 tokens -> 5 pages
    out1 = engine.generate(input_ids=p1, sampling_params=SP)
    assert out1["meta_info"]["cached_tokens"] == 0

    # fill the pool with other prompts until p1's pages get evicted to host
    for i in range(6):
        engine.generate(
            input_ids=list(range(100 + 50 * i, 140 + 50 * i)),
            sampling_params=SP,
        )
    assert ctrl.bytes_to_host > 0, "eviction should have spilled to host"

    # request p1 again: the host-tier prefix must be loaded back and hit
    out2 = engine.generate(input_ids=p1, sampling_params=SP)
    assert out2["meta_info"]["cached_tokens"] >= 32
    assert ctrl.bytes_to_device > 0, "prefix should have been loaded back"
    assert out2["output_ids"] == out1["output_ids"]


def test_host_tier_roundtrip_preserves_kv_exactly(engine):
    """Outputs after a host round-trip must match the fresh computation."""
    p = list(range(200, 248))
    fresh = engine.generate(input_ids=p, sampling_params=SP)
    for i in range(6):  # force eviction
        engine.generate(
            input_ids=list(range(300 + 40 * i, 340 + 40 * i)),
            sampling_params=SP,
        )
    again = engine.generate(input_ids=p, sampling_params=SP)
    assert again["output_ids"] == fresh["output_ids"]
