"""Hung-scheduler watchdog (reference scheduler.py:1907 watchdog_thread):
no forward progress while requests are pending -> hook fires (in
production: stack dump + process exit)."""

import threading
import time

from sglang_security_tpu.managers.schedule_batch import Req
from sglang_security_tpu.managers.scheduler import Scheduler
from sglang_security_tpu.sampling.sampling_params import SamplingParams
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


def _mk_scheduler(tmp_path, timeout):
    path = str(tmp_path / "tiny")
    make_tiny_llama(path)
    args = ServerArgs(
        model_path=path,
        dtype="float32",
        max_total_tokens=512,
        page_size=8,
        watchdog_timeout=timeout,
        prefill_token_buckets=[64],
        decode_bs_buckets=[1],
        max_seq_pages_buckets=[8],
        enable_warmup=False,
        random_seed=0,
    )
    return Scheduler(args)


def test_watchdog_fires_on_stall(tmp_path):
    s = _mk_scheduler(tmp_path, timeout=0.4)
    fired = threading.Event()
    s.watchdog_hook = fired.set
    # simulate a hung device step: a request is in flight but forward_ct
    # never advances (the scheduler thread would be stuck in execute)
    req = Req(rid="r1", input_ids=[1, 2, 3], sampling_params=SamplingParams())
    s.inflight = [req]
    assert fired.wait(3.0), "watchdog did not fire on a stalled scheduler"
    s.shutdown()


def test_watchdog_quiet_when_idle_or_progressing(tmp_path):
    s = _mk_scheduler(tmp_path, timeout=0.4)
    fired = threading.Event()
    s.watchdog_hook = fired.set
    # idle: nothing pending -> no fire
    time.sleep(0.9)
    assert not fired.is_set()
    # progressing: inflight but forward_ct keeps moving -> no fire
    req = Req(rid="r2", input_ids=[1, 2, 3], sampling_params=SamplingParams())
    s.inflight = [req]
    for _ in range(6):
        s.forward_ct += 1
        time.sleep(0.15)
    assert not fired.is_set()
    s.shutdown()
