"""Engine.encode / /v1/embeddings tests (VERDICT round-1 missing #6:
no embeddings API)."""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import make_tiny_llama


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    tiny = make_tiny_llama(str(tmp_path_factory.mktemp("emb") / "m"))
    e = Engine(ServerArgs(
        model_path=tiny, dtype="float32", max_total_tokens=2048, page_size=8,
        prefill_token_buckets=[128], decode_bs_buckets=[1, 4],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning",
    ))
    yield e
    e.shutdown()


def test_encode_single(eng):
    out = eng.encode(prompt="hello embedding world")
    v = np.asarray(out["embedding"])
    assert v.shape == (128,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-3)


def test_encode_batch_and_determinism(eng):
    outs = eng.encode(prompt=["alpha beta", "gamma delta", "alpha beta"])
    assert len(outs) == 3
    a, b, c = (np.asarray(o["embedding"]) for o in outs)
    np.testing.assert_allclose(a, c, atol=1e-5)  # same text -> same vector
    assert not np.allclose(a, b)


def test_encode_interleaves_with_generate(eng):
    gen = eng.generate(prompt="story:", sampling_params={
        "temperature": 0.0, "max_new_tokens": 4, "ignore_eos": True})
    emb = eng.encode(prompt="vector me")
    assert gen["meta_info"]["completion_tokens"] == 4
    assert len(emb["embedding"]) == 128
