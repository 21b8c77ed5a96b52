"""PD disaggregation: prefill engine -> decode engine KV handoff."""

import threading
import time

import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama

SP = {"temperature": 0.0, "max_new_tokens": 10, "ignore_eos": True}


def make(path, mode, backend, port):
    return Engine(
        ServerArgs(
            model_path=path, dtype="float32", max_total_tokens=2048,
            page_size=8, prefill_token_buckets=[128],
            decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
            disaggregation_mode=mode,
            disaggregation_transfer_backend=backend,
            disaggregation_bootstrap_port=port,
            random_seed=0,
        )
    )


@pytest.mark.parametrize("backend,port", [("fake", 0), ("tcp", 18998)])
def test_pd_split_matches_monolithic(tmp_path_factory, backend, port):
    path = str(tmp_path_factory.mktemp(f"tiny_pd_{backend}") / "llama")
    make_tiny_llama(path)
    prompt = list(range(40, 72))

    mono = make(path, "null", backend, 0)
    try:
        ref = mono.generate(input_ids=prompt, sampling_params=SP)
    finally:
        mono.shutdown()

    prefill = make(path, "prefill", backend, port)
    decode = make(path, "decode", backend, port)
    try:
        room = 424242
        results = {}

        def run_decode():
            results["decode"] = decode.generate(
                input_ids=prompt, sampling_params=SP, bootstrap_room=room,
            )

        t = threading.Thread(target=run_decode)
        t.start()
        time.sleep(0.2)
        pre_out = prefill.generate(
            input_ids=prompt, sampling_params=SP,
            bootstrap_host="127.0.0.1", bootstrap_port=port,
            bootstrap_room=room,
        )
        t.join(timeout=30)
        assert "decode" in results, "decode side never completed"
        out = results["decode"]
        # the decode server's full output equals the monolithic run
        assert out["output_ids"] == ref["output_ids"], (
            out["output_ids"], ref["output_ids"],
        )
    finally:
        prefill.shutdown()
        decode.shutdown()
