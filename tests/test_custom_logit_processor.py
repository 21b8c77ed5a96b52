"""Custom logit processors (reference sampling/custom_logit_processor
+ --enable-custom-logit-processor): jax-traceable processors register
by name, requests select them with float params, rows without a
processor are untouched."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.sampling.custom_processors import (
    register_custom_logit_processor,
)
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_clp") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1, 2],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", enable_custom_logit_processor=True,
    ))
    yield e
    e.shutdown()


SP = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}


def test_builtin_boost_forces_token(eng):
    out = eng.generate(
        prompt="hello",
        sampling_params={**SP, "custom_logit_processor": "boost_token",
                         "custom_params": {"token_id": 99, "bias": 1e4}},
    )
    assert out["output_ids"] == [99] * 4


def test_disallow_token_and_untouched_rows(eng):
    base = eng.generate(prompt="hello", sampling_params=SP)
    banned = base["output_ids"][0]
    outs = eng.generate(
        prompt=["hello", "hello"],
        sampling_params=[
            {**SP, "custom_logit_processor": "disallow_token",
             "custom_params": {"token_id": float(banned)}},
            dict(SP),
        ],
    )
    assert outs[0]["output_ids"][0] != banned
    assert outs[1]["output_ids"] == base["output_ids"]


def test_user_registered_processor(eng):
    import jax.numpy as jnp

    def only_even(logits, params):
        ids = jnp.arange(logits.shape[1])
        return jnp.where((ids % 2 == 0)[None, :], logits, -1e30)

    register_custom_logit_processor("only_even", only_even)
    out = eng.generate(
        prompt="zzz",
        sampling_params={**SP, "custom_logit_processor": "only_even"},
    )
    assert all(t % 2 == 0 for t in out["output_ids"])


def test_gated_by_server_flag(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_clp2") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=1024,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    try:
        with pytest.raises(ValueError, match="enable-custom-logit-processor"):
            e.generate(
                prompt="x",
                sampling_params={
                    **SP, "custom_logit_processor": "boost_token",
                    "custom_params": {"token_id": 5, "bias": 100.0},
                },
            )
    finally:
        e.shutdown()
