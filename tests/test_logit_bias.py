"""OpenAI logit_bias (in-jit sparse additive bias) + logprobs output
(reference sampler logit_bias handling + v1_generate_response)."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_lb") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1, 2],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    yield e
    e.shutdown()


def test_logit_bias_forces_token(eng):
    sp = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}
    base = eng.generate(prompt="hello there", sampling_params=sp)
    target = 123
    assert base["output_ids"][0] != target
    out = eng.generate(
        prompt="hello there",
        sampling_params={**sp, "logit_bias": {str(target): 100.0}},
    )
    assert out["output_ids"] == [target] * 4


def test_logit_bias_suppresses_token(eng):
    sp = {"temperature": 0.0, "max_new_tokens": 1, "ignore_eos": True}
    base = eng.generate(prompt="hello there", sampling_params=sp)
    banned = base["output_ids"][0]
    out = eng.generate(
        prompt="hello there",
        sampling_params={**sp, "logit_bias": {str(banned): -100.0}},
    )
    assert out["output_ids"][0] != banned


def test_logit_bias_per_request_in_batch(eng):
    sp = {"temperature": 0.0, "max_new_tokens": 3, "ignore_eos": True}
    outs = eng.generate(
        prompt=["aa bb", "aa bb"],
        sampling_params=[
            {**sp, "logit_bias": {"77": 100.0}},
            {**sp},
        ],
    )
    assert outs[0]["output_ids"] == [77, 77, 77]
    assert outs[1]["output_ids"][0] != 77


def test_output_logprobs_returned(eng):
    out = eng.generate(
        prompt="hello", sampling_params={
            "temperature": 0.0, "max_new_tokens": 3, "ignore_eos": True},
        return_logprob=True,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 3
    assert all(lp <= 0.0 for lp in lps)
