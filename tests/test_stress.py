"""Scheduler robustness under memory pressure: mixed sampling configs,
retract-on-OOM, mid-flight aborts, and a page-leak check at the end
(the reference's check_memory idle assertion, scheduler.py:1314)."""

import random
import threading
import time

import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_stress") / "llama")
    make_tiny_llama(path)
    e = Engine(ServerArgs(
        model_path=path, dtype="float32",
        max_total_tokens=768,  # tiny pool: forces eviction + retracts
        page_size=8, prefill_token_buckets=[64, 128],
        decode_bs_buckets=[4], max_seq_pages_buckets=[16],
        random_seed=0, enable_warmup=False, log_level="warning",
        max_running_requests=8, decode_steps_per_batch=4,
    ))
    yield e
    e.shutdown()


def test_mixed_workload_under_pressure(eng):
    rng = random.Random(0)
    results, errors = [], []

    def one(i):
        try:
            # keep the jit matrix small (one decode bucket, two
            # sampling variants): the pressure is on paging, not compiles
            sp = {
                "max_new_tokens": rng.choice([4, 9, 17, 33]),
                "temperature": 0.0,
                "ignore_eos": True,
            }
            if i % 5 == 0:
                sp["repetition_penalty"] = 1.2
            if i % 4 == 0:
                sp["stop"] = ["zzqq"]  # never hit; exercises trim path
            n_in = rng.choice([5, 30, 90])
            out = eng.generate(
                prompt=" ".join(f"w{i}t{j}" for j in range(n_in)),
                sampling_params=sp,
                user_id=f"user{i % 3}",
            )
            results.append((i, out["meta_info"]))
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(24)]
    for j, t in enumerate(threads):
        t.start()
        if j % 6 == 5:
            time.sleep(0.05)
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors[:3]
    assert len(results) == 24
    for i, meta in results:
        assert meta["completion_tokens"] >= 1
        assert meta["finish_reason"]["type"] in ("stop", "length")
    # idle leak check: every page either free or accounted to the tree
    deadline = time.time() + 10
    while time.time() < deadline and eng.scheduler.has_work():
        time.sleep(0.2)
    assert eng.scheduler.check_memory(), "page leak after stress run"


def test_aborts_mid_flight_do_not_leak(eng):
    rids = [f"abort-{i}" for i in range(6)]
    outs = []

    def one(rid):
        try:
            outs.append(eng.generate(
                prompt="count to one hundred " * 4,
                sampling_params={"max_new_tokens": 48, "temperature": 0.0,
                                 "ignore_eos": True},
                rid=rid,
            ))
        except Exception:
            pass

    threads = [threading.Thread(target=one, args=(r,)) for r in rids]
    for t in threads:
        t.start()
    time.sleep(1.0)
    for rid in rids[::2]:
        eng.abort_request(rid)
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), (
        "a caller thread is stuck (aborted request never finished)"
    )
    deadline = time.time() + 15
    while time.time() < deadline and eng.scheduler.has_work():
        time.sleep(0.2)
    assert not eng.scheduler.has_work()
    assert eng.scheduler.check_memory(), "page leak after aborts"


def test_abort_running_request_returns_promptly(eng):
    """An abort of an actively-decoding request must emit a final ABORT
    output (previously the caller blocked until the request watchdog)."""
    result = {}

    def run():
        result["out"] = eng.generate(
            prompt="long story " * 8, rid="abort-running",
            sampling_params={"max_new_tokens": 500, "temperature": 0.0,
                             "ignore_eos": True},
        )

    t = threading.Thread(target=run)
    t.start()
    # wait until it is actually decoding
    deadline = time.time() + 60
    while time.time() < deadline and not any(
        r.rid == "abort-running" for r in eng.scheduler.running
    ):
        time.sleep(0.05)
    eng.abort_request("abort-running")
    t.join(timeout=60)
    assert not t.is_alive(), "caller stuck after aborting a running req"
    assert result["out"]["meta_info"]["finish_reason"]["type"] == "abort"
