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


def test_fused_spec_path_taken_and_fallback(model_path):
    """Greedy plain sampling takes the device-fused rounds
    (scheduler._run_spec_decode_fused); temperature>0 falls back to the
    host-driven stochastic verify.  Both stay lossless/correct."""
    sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
    prompts = [[7, 8, 9, 10] * 4, [3, 4, 5] * 5, [11, 12] * 6]

    eng = make_engine(model_path, spec=True)
    try:
        import sglang_security_tpu.managers.scheduler as sched_mod

        calls = {"fused": 0}
        orig = sched_mod.Scheduler._run_spec_decode_fused

        def counting(self):
            calls["fused"] += 1
            return orig(self)

        sched_mod.Scheduler._run_spec_decode_fused = counting
        try:
            outs = eng.generate(input_ids=prompts, sampling_params=sp)
        finally:
            sched_mod.Scheduler._run_spec_decode_fused = orig
        assert calls["fused"] > 0
        assert all(len(o["output_ids"]) == 24 for o in outs)

        # temperature > 0: fused path must NOT be taken
        calls["fused"] = 0
        sched_mod.Scheduler._run_spec_decode_fused = counting
        try:
            eng.generate(
                input_ids=prompts[0],
                sampling_params={"temperature": 1.0, "max_new_tokens": 8,
                                 "ignore_eos": True},
            )
        finally:
            sched_mod.Scheduler._run_spec_decode_fused = orig
        assert calls["fused"] == 0
    finally:
        eng.shutdown()


def test_fused_spec_matches_host_rounds(model_path):
    """Fused device rounds produce the same greedy tokens as the
    host-driven ngram loop (SGLANG_TPU_DISABLE_FUSED_SPEC=1)."""
    import sglang_security_tpu.managers.scheduler as sched_mod

    sp = {"temperature": 0.0, "max_new_tokens": 32, "ignore_eos": True}
    prompts = [[7, 8, 9, 10] * 4, [1, 2, 3, 1, 2] * 3]

    eng = make_engine(model_path, spec=True)
    try:
        fused = [o["output_ids"]
                 for o in eng.generate(input_ids=prompts, sampling_params=sp)]
    finally:
        eng.shutdown()

    sched_mod._DISABLE_FUSED_SPEC = True
    try:
        eng = make_engine(model_path, spec=True)
        try:
            host = [o["output_ids"] for o in
                    eng.generate(input_ids=prompts, sampling_params=sp)]
        finally:
            eng.shutdown()
    finally:
        sched_mod._DISABLE_FUSED_SPEC = False
    assert fused == host


def test_fused_spec_eos_stops(model_path):
    """EOS inside a fused round stops the request (overshoot trimmed)."""
    sp = {"temperature": 0.0, "max_new_tokens": 64}
    eng = make_engine(model_path, spec=True)
    try:
        out = eng.generate(
            input_ids=[7, 8, 9, 10] * 4, sampling_params=sp
        )
        ids = out["output_ids"]
        eos = eng.scheduler.eos_token_ids
        if any(t in eos for t in ids):
            assert ids[-1] in eos  # stopped AT the eos, nothing after
        assert len(ids) <= 64
    finally:
        eng.shutdown()
