"""NDSS eval harness: PII-coverage eval + multi-user rewrite workload
run in-process against a SafeKV engine (the reference's ndss_scripts
clients, re-created for the zero-egress test environment)."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "ndss_scripts")
)

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


def test_pii_extraction_eval_runs():
    from pii_extraction_eval import run_eval

    r = run_eval(n_per_type=20)
    # the regex types the tier-1 detector explicitly covers must recall
    for t in ("EMAIL", "SOCIALNUM", "TELEPHONENUM", "PASSWORD", "AWSKEY"):
        assert r["per_type"][t]["tier1_recall"] >= 0.9, (t, r["per_type"][t])
    assert r["benign_false_positive_rate"] <= 0.05
    # name/city-style types need tier-2 -- they must be reported as
    # unsupported by tier 1, not silently scored
    assert "GIVENNAME" in r["tier1_unsupported_types"]


@pytest.fixture(scope="module")
def safekv_engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_ndss") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(
            model_path=path,
            dtype="float32",
            max_total_tokens=8192,
            page_size=8,
            enable_safekv=True,
            prefill_token_buckets=[128, 256, 512],
            decode_bs_buckets=[1, 4, 8],
            max_seq_pages_buckets=[8, 16, 32],
            random_seed=0,
            # epoch windows are wall-clock; under a loaded CI machine the
            # hit-spike defense can otherwise fire on this legitimate
            # rewrite workload and evict its prefixes (flaky hit rate)
            safekv_epoch_seconds=3600.0,
            safekv_hit_spike_threshold=1e9,
        )
    )
    yield eng
    eng.shutdown()


def test_multiuser_rewrite_workload(safekv_engine):
    from client_multiuser_rewrite import build_sessions, run_workload

    def gen(text, user_id):
        out = safekv_engine.generate(
            prompt=text, user_id=user_id,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        return out["meta_info"]

    plans = build_sessions(users=3, sessions_per_user=2, turns=3,
                           pii_fraction=0.5, seed=0)
    # run_workload settles async privacy verdicts before its leak probes
    result = run_workload(gen, plans, turns=3)
    assert result["requests"] == sum(min(3, len(p["turns"])) for p in plans)
    assert result["cross_user_pii_leaks"] == 0, result
    # sessions grow monotonically, so later turns must reuse the prefix
    assert result["intra_user_hit_rate"] >= 0.8, result
