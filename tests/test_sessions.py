"""Multi-turn session tests: continuation + KV reuse across turns."""

import numpy as np
import pytest

from sglang_security_tpu.managers.session_controller import (
    Session,
    SessionController,
)


class TestSessionUnit:
    def test_open_close(self):
        sc = SessionController()
        sid = sc.open_session()
        assert sc.get(sid) is not None
        assert sc.close_session(sid)
        assert sc.get(sid) is None
        assert not sc.close_session(sid)

    def test_context_chain(self):
        s = Session("s1")
        s.record("r1", [1, 2, 3], None)
        s.finish("r1", [10, 11])
        assert s.context_for(None) == [1, 2, 3, 10, 11]
        s.record("r2", [4, 5], None)
        s.finish("r2", [20])
        assert s.context_for(None) == [1, 2, 3, 10, 11, 4, 5, 20]
        # branch from r1
        assert s.context_for("r1") == [1, 2, 3, 10, 11]

    def test_abort_branch(self):
        s = Session("s1")
        s.record("r1", [1], None)
        s.record("r2", [2], None)
        affected = s.abort_branch("r1")
        assert set(affected) == {"r1", "r2"}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_s") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(model_path=path, dtype="float32", max_total_tokens=4096,
                   page_size=8, prefill_token_buckets=[128],
                   decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
                   random_seed=0)
    )
    yield eng
    eng.shutdown()


def test_session_continuation_reuses_cache(engine):
    sid = engine.open_session()
    sp = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
    out1 = engine.generate(
        input_ids=list(range(30, 70)), sampling_params=sp, session_id=sid
    )
    assert out1["meta_info"]["prompt_tokens"] == 40
    # second turn sends only the delta; history is prepended server-side
    out2 = engine.generate(
        input_ids=list(range(80, 90)), sampling_params=sp, session_id=sid
    )
    # prompt = 40 history input + 24 history output + 10 delta
    assert out2["meta_info"]["prompt_tokens"] == 74
    # and the first turn's KV is reused from the radix cache
    assert out2["meta_info"]["cached_tokens"] >= 48
    engine.close_session(sid)


def test_session_matches_manual_concat(engine):
    sid = engine.open_session()
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    a = engine.generate(input_ids=[5, 6, 7, 8] * 3, sampling_params=sp,
                        session_id=sid)
    b = engine.generate(input_ids=[9, 10, 11], sampling_params=sp,
                        session_id=sid)
    manual = engine.generate(
        input_ids=[5, 6, 7, 8] * 3 + a["output_ids"] + [9, 10, 11],
        sampling_params=sp,
    )
    assert b["output_ids"] == manual["output_ids"]
    engine.close_session(sid)
