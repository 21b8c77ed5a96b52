"""End-to-end Engine tests on the tiny llama checkpoint (CPU backend)."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_e") / "llama"
    make_tiny_llama(str(path))
    return str(path)


@pytest.fixture(scope="module")
def engine(tiny_model):
    eng = Engine(
        ServerArgs(
            model_path=tiny_model,
            dtype="float32",
            max_total_tokens=4096,
            page_size=8,
            prefill_token_buckets=[128, 256, 512],
            decode_bs_buckets=[1, 4, 8],
            max_seq_pages_buckets=[8, 16, 32],
            random_seed=0,
        )
    )
    yield eng
    eng.shutdown()


def hf_greedy(model_path, prompt_ids, n):
    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(model_path, torch_dtype=torch.float32)
    m.eval()
    ids = torch.tensor([prompt_ids])
    with torch.no_grad():
        out = m.generate(
            ids, max_new_tokens=n, do_sample=False, num_beams=1,
            pad_token_id=0,
        )
    return out[0, len(prompt_ids) :].tolist()


def test_greedy_matches_hf(engine, tiny_model):
    prompt_ids = [1, 45, 99, 312, 7, 180, 66]
    n = 12
    ref = hf_greedy(tiny_model, prompt_ids, n)
    out = engine.generate(
        input_ids=prompt_ids,
        sampling_params={"temperature": 0.0, "max_new_tokens": n,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    assert out["meta_info"]["completion_tokens"] == n


def test_text_generation_roundtrip(engine):
    out = engine.generate(
        prompt="The capital of France is",
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "ignore_eos": True},
    )
    assert isinstance(out["text"], str)
    assert out["meta_info"]["completion_tokens"] == 8


def test_batch_generation(engine):
    outs = engine.generate(
        prompt=["hello world", "the quick brown fox", "testing one two"],
        sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                         "ignore_eos": True},
    )
    assert len(outs) == 3
    for o in outs:
        assert o["meta_info"]["completion_tokens"] == 5


def test_streaming(engine):
    chunks = list(
        engine.generate(
            prompt="stream me",
            sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                             "ignore_eos": True},
            stream=True,
        )
    )
    assert chunks[-1]["meta_info"]["finish_reason"] is not None
    assert len(chunks[-1]["output_ids"]) == 6


def test_prefix_cache_hit(engine, tiny_model):
    prompt = [1] + list(range(20, 60))  # 41 tokens -> 5 full pages
    out1 = engine.generate(
        input_ids=prompt,
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True},
    )
    assert out1["meta_info"]["cached_tokens"] == 0
    out2 = engine.generate(
        input_ids=prompt,
        sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                         "ignore_eos": True},
    )
    assert out2["meta_info"]["cached_tokens"] >= 32  # 4+ pages reused
    assert out2["output_ids"] == out1["output_ids"]


def test_max_new_tokens_and_finish_reason(engine):
    out = engine.generate(
        prompt="x",
        sampling_params={"temperature": 0.0, "max_new_tokens": 3,
                         "ignore_eos": True},
    )
    assert out["meta_info"]["finish_reason"]["type"] == "length"


def test_stop_token(engine, tiny_model):
    # discover the greedy 3rd token, then use it as a stop token
    base = engine.generate(
        prompt="abcd", sampling_params={"temperature": 0.0, "max_new_tokens": 6,
                                        "ignore_eos": True},
    )
    stop_tok = base["output_ids"][2]
    expect_len = base["output_ids"].index(stop_tok) + 1  # first occurrence
    out = engine.generate(
        prompt="abcd",
        sampling_params={
            "temperature": 0.0, "max_new_tokens": 6, "ignore_eos": False,
            "stop_token_ids": [stop_tok],
        },
    )
    assert out["meta_info"]["finish_reason"]["type"] == "stop"
    assert len(out["output_ids"]) == expect_len


def test_concurrent_requests(engine):
    import concurrent.futures as cf

    def run(i):
        return engine.generate(
            prompt=f"request number {i} says",
            sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                             "ignore_eos": True},
        )

    with cf.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(run, range(6)))
    for o in outs:
        assert o["meta_info"]["completion_tokens"] == 5


def test_memory_balance_when_idle(engine):
    import time

    deadline = time.time() + 5
    while engine.scheduler.has_work() and time.time() < deadline:
        time.sleep(0.05)
    assert engine.scheduler.check_memory(), "KV page leak detected"
