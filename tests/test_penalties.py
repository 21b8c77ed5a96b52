"""Repetition/presence/frequency penalty tests (unit + e2e engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_security_tpu.layers.sampler import (
    SamplingTensors,
    apply_penalties,
    sample,
)


def test_apply_penalties_math():
    logits = jnp.asarray([[2.0, -1.0, 0.5]])
    counts = jnp.asarray([[3, 0, 1]], jnp.int32)
    out = apply_penalties(
        logits,
        counts,
        presence_penalty=jnp.asarray([[0.5]]),
        frequency_penalty=jnp.asarray([[0.1]]),
        repetition_penalty=jnp.asarray([[2.0]]),
    )
    out = np.asarray(out)[0]
    # token0: 2.0 - 0.3 - 0.5 = 1.2 -> positive -> /2 = 0.6
    np.testing.assert_allclose(out[0], 0.6, rtol=1e-5)
    # token1: unseen, unchanged
    np.testing.assert_allclose(out[1], -1.0, rtol=1e-5)
    # token2: 0.5 - 0.1 - 0.5 = -0.1 -> negative -> *2 = -0.2
    np.testing.assert_allclose(out[2], -0.2, rtol=1e-5)


def test_sample_with_counts_blocks_repeats():
    V = 8
    logits = jnp.zeros((1, V)).at[0, 3].set(10.0)
    st = SamplingTensors.greedy(1)._replace(
        presence_penalty=jnp.asarray([[100.0]])
    )
    counts = jnp.zeros((1, V), jnp.int32).at[0, 3].set(1)
    tok = sample(logits, st, jax.random.PRNGKey(0), output_counts=counts)
    assert int(tok[0]) != 3  # massively penalized


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_p") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(model_path=path, dtype="float32", max_total_tokens=4096,
                   page_size=8, prefill_token_buckets=[128],
                   decode_bs_buckets=[1, 4], max_seq_pages_buckets=[8, 16],
                   random_seed=0)
    )
    yield eng
    eng.shutdown()


def test_repetition_penalty_diversifies(engine):
    sp_base = {"temperature": 0.0, "max_new_tokens": 16, "ignore_eos": True}
    base = engine.generate(prompt="loop", sampling_params=sp_base)
    pen = engine.generate(
        prompt="loop",
        sampling_params={**sp_base, "presence_penalty": 2.0,
                         "frequency_penalty": 1.0},
    )
    # greedy tiny models loop hard; penalties must increase diversity
    assert len(set(pen["output_ids"])) >= len(set(base["output_ids"]))
    if len(set(base["output_ids"])) < 8:
        assert len(set(pen["output_ids"])) > len(set(base["output_ids"]))


def test_multistep_penalty_state_consistency(engine):
    """Penalty counts must update inside the multi-step decode loop."""
    out = engine.generate(
        prompt="abc",
        sampling_params={"temperature": 0.0, "max_new_tokens": 12,
                         "ignore_eos": True, "presence_penalty": 5.0},
    )
    ids = out["output_ids"]
    # with a huge presence penalty, greedy decode cannot emit any token twice
    assert len(set(ids)) == len(ids), ids
