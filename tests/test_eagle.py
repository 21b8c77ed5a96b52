"""EAGLE speculative decoding tests (CPU, tiny models).

Gates (VERDICT round-1 next-steps #3): lossless greedy output through the
draft/verify path, and accept_length > 1.9 when the drafter is accurate
(oracle-draft harness, the analog of the reference's simulated-accept
tests, eagle_utils.py:841)."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama

SP = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
PROMPTS = ["the quick brown fox jumps", "hello world this is", "0123 456"]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_llama(
        str(tmp_path_factory.mktemp("eagle") / "llama"),
        config={"num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "hidden_size": 128},
    )


def _engine(tiny, **kw):
    args = dict(
        model_path=tiny, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8, 16], random_seed=0, enable_warmup=False,
        log_level="warning",
    )
    args.update(kw)
    return Engine(ServerArgs(**args))


@pytest.fixture(scope="module")
def ref_outputs(tiny):
    eng = _engine(tiny)
    try:
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        return [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()


def test_eagle_greedy_is_lossless(tiny, ref_outputs):
    """Random self-draft model: drafts are mostly wrong, but verify must
    keep the target's greedy output exactly."""
    eng = _engine(tiny, speculative_algorithm="EAGLE",
                  speculative_num_steps=3)
    try:
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        got = [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()
    assert got == ref_outputs
    # every round commits at least the bonus token
    assert eng.scheduler.spec_verify_count > 0
    avg = eng.scheduler.spec_accept_sum / eng.scheduler.spec_verify_count
    assert avg >= 1.0


def test_eagle_oracle_draft_accept_length(tiny, ref_outputs):
    """With an oracle drafter (returns the target's true continuation),
    accept length must approach K+1 — proving verify/accept bookkeeping
    doesn't truncate accepted spans."""
    K = 4
    # the oracle monkeypatches worker.draft — a host-path hook the
    # device-resident fused rounds never call — so force host rounds
    import sglang_security_tpu.managers.scheduler as sched_mod

    sched_mod._DISABLE_FUSED_SPEC = True
    eng = _engine(tiny, speculative_algorithm="EAGLE",
                  speculative_num_steps=K)
    sched = eng.scheduler
    worker = sched.eagle
    oracle = {}  # rid -> (prompt_len, full token list)

    real_draft = worker.draft

    def oracle_draft(pend_counts, pend_tokens, ft_slots, positions0,
                     page_lists, chain_slots, extend_slots):
        # keep the real draft running for its KV side effects, then
        # overwrite the proposed tokens with the target's true ones
        real_draft(pend_counts, pend_tokens, ft_slots, positions0,
                   page_lists, chain_slots, extend_slots)
        out = np.zeros((K, len(sched.running)), np.int32)
        for i, req in enumerate(sched.running):
            plen = len(req.input_ids) - len(req.output_ids) \
                if False else req.seq_len - len(req.output_ids)
            ref = oracle[req.rid]
            done = len(req.output_ids)
            nxt = ref[done : done + K]
            out[: len(nxt), i] = nxt
        return out

    worker.draft = oracle_draft
    try:
        rids = [f"oracle-{i}" for i in range(len(PROMPTS))]
        for rid, ref in zip(rids, ref_outputs):
            oracle[rid] = ref
        outs = [
            eng.generate(prompt=p, sampling_params=SP, rid=rid)
            for p, rid in zip(PROMPTS, rids)
        ]
        got = [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()
        sched_mod._DISABLE_FUSED_SPEC = False
    assert got == ref_outputs
    avg = sched.spec_accept_sum / sched.spec_verify_count
    assert avg > 1.9, avg


def test_eagle_fused_matches_host_rounds(tiny, ref_outputs):
    """Device-resident fused EAGLE rounds == host-driven rounds == plain
    decode, token for token (greedy lossless through both spec paths)."""
    import sglang_security_tpu.managers.scheduler as sched_mod

    eng = _engine(tiny, speculative_algorithm="EAGLE",
                  speculative_num_steps=3, speculative_fused_rounds=2)
    try:
        assert not sched_mod._DISABLE_FUSED_SPEC
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        got = [o["output_ids"] for o in outs]
        # the fused path must actually have engaged
        assert any(
            isinstance(k, tuple) and k and k[0] == "fusedeagle"
            for k in eng.scheduler.runner._step_cache
        )
    finally:
        eng.shutdown()
    assert got == ref_outputs


def test_eagle_under_tp2(tiny, ref_outputs):
    """EAGLE speculative decoding on a tp=2 mesh: greedy outputs stay
    lossless and match the non-speculative reference."""
    eng = _engine(tiny, speculative_algorithm="EAGLE", tp_size=2)
    try:
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        assert [o["output_ids"] for o in outs] == ref_outputs
    finally:
        eng.shutdown()
