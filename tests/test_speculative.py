"""Speculative decoding (NGRAM prompt-lookup): losslessness + speedup."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.speculative.spec_algorithm import (
    NgramDrafter,
    accept_draft,
)
from sglang_security_tpu.test_utils import make_tiny_llama


class TestUnits:
    def test_ngram_draft_finds_repeat(self):
        d = NgramDrafter(num_draft_tokens=3, ngram=2)
        ids = [5, 6, 7, 8, 9, 5, 6]
        assert d.draft(ids) == [7, 8, 9]

    def test_ngram_no_match(self):
        d = NgramDrafter(3, 2)
        assert d.draft([1, 2, 3, 4]) == []

    def test_accept_full(self):
        out = accept_draft([7, 8], np.array([7, 8, 9]))
        assert out == [7, 8, 9]  # all accepted + bonus

    def test_accept_partial(self):
        out = accept_draft([7, 8], np.array([7, 5, 9]))
        assert out == [7, 5]  # first mismatch replaced by target's token

    def test_accept_none(self):
        out = accept_draft([7, 8], np.array([3, 5, 9]))
        assert out == [3]


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_spec") / "llama")
    make_tiny_llama(path)
    return path


def make_engine(model_path, spec):
    return Engine(
        ServerArgs(
            model_path=model_path, dtype="float32", max_total_tokens=4096,
            page_size=8, prefill_token_buckets=[128],
            decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
            speculative_algorithm="NGRAM" if spec else None,
            speculative_num_draft_tokens=4, random_seed=0,
        )
    )


def test_spec_lossless_and_accepts(model_path):
    sp = {"temperature": 0.0, "max_new_tokens": 32, "ignore_eos": True}
    # tiny greedy models loop — ideal for prompt-lookup drafting
    prompt = [7, 8, 9, 10] * 4

    base = make_engine(model_path, spec=False)
    try:
        ref = base.generate(input_ids=prompt, sampling_params=sp)
    finally:
        base.shutdown()

    eng = make_engine(model_path, spec=True)
    try:
        out = eng.generate(input_ids=prompt, sampling_params=sp)
        assert out["output_ids"] == ref["output_ids"], (
            out["output_ids"], ref["output_ids"],
        )
        sched = eng.scheduler
        assert sched.spec_verify_count > 0
        accept_len = sched.spec_accept_sum / sched.spec_verify_count
        assert accept_len > 1.5, accept_len  # real speculation happened
        # memory stays balanced after spec rounds
        import time

        deadline = time.time() + 5
        while sched.has_work() and time.time() < deadline:
            time.sleep(0.05)
        assert sched.check_memory()
    finally:
        eng.shutdown()
