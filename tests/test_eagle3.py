"""EAGLE3 speculative decoding tests (CPU, tiny models).

EAGLE3 (reference ``srt/models/llama_eagle3.py`` +
``eagle_worker.py:127-138``) differs from EAGLE-1 in the target's 3-layer
aux-hidden capture, the draft layer's dual-norm concat attention, and the
reduced draft vocab with d2t id mapping.  Verify must keep greedy output
lossless regardless of draft quality.
"""

import numpy as np
import pytest

from sglang_security_tpu.entrypoints.engine import Engine
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.test_utils import (
    TINY_LLAMA_CONFIG,
    make_tiny_eagle3,
    make_tiny_llama,
)

SP = {"temperature": 0.0, "max_new_tokens": 24, "ignore_eos": True}
PROMPTS = ["the quick brown fox jumps", "hello world this is", "0123 456"]
CFG = {"num_hidden_layers": 4, "num_attention_heads": 4,
       "num_key_value_heads": 2, "hidden_size": 128}


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_llama(
        str(tmp_path_factory.mktemp("eagle3") / "llama"), config=CFG
    )


@pytest.fixture(scope="module")
def draft3(tmp_path_factory, tiny):
    import json, os

    with open(os.path.join(tiny, "config.json")) as f:
        tcfg = json.load(f)
    return make_tiny_eagle3(
        str(tmp_path_factory.mktemp("eagle3") / "draft"), tcfg,
        draft_vocab=64,
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


def test_eagle3_self_draft_lossless(tiny, ref_outputs):
    """Dummy (random) EAGLE3 self-draft: drafts are junk, greedy output
    must still match the plain engine token-for-token."""
    eng = _engine(tiny, speculative_algorithm="EAGLE3",
                  speculative_num_steps=3)
    try:
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        got = [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()
    assert got == ref_outputs
    assert eng.scheduler.spec_verify_count > 0
    avg = eng.scheduler.spec_accept_sum / eng.scheduler.spec_verify_count
    assert avg >= 1.0


def test_eagle3_checkpoint_lossless(tiny, draft3, ref_outputs):
    """Real EAGLE3 checkpoint format (midlayer.*, fc [H,3H], reduced-vocab
    lm_head, d2t offsets) loads and serves losslessly."""
    eng = _engine(tiny, speculative_algorithm="EAGLE3",
                  speculative_draft_model_path=draft3,
                  speculative_num_steps=3)
    try:
        worker = eng.scheduler.eagle
        assert worker.is_eagle3
        assert worker.model.draft_vocab_size == 64
        # d2t mapping reaches target-vocab ids
        d2t_map = np.asarray(worker.params["d2t_map"])
        assert d2t_map.shape == (64,)
        assert (d2t_map >= 0).all() and (
            d2t_map < TINY_LLAMA_CONFIG["vocab_size"]
        ).all()
        outs = eng.generate(prompt=PROMPTS, sampling_params=SP)
        got = [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()
    assert got == ref_outputs


def test_eagle3_aux_capture_layout(tiny):
    """The target's aux concat is the pre-layer residual stream at
    [2, L//2, L-3] (clamped): for L=4 that is layers (2, 2, 1), so the
    first two H-blocks of x_all must be identical and differ from the
    third."""
    eng = _engine(tiny, speculative_algorithm="EAGLE3",
                  speculative_num_steps=3)
    try:
        runner = eng.scheduler.runner
        model = runner.model
        assert model.eagle3_aux_layers == (2, 2, 1)
        import jax.numpy as jnp

        from sglang_security_tpu.model_executor.forward_batch import (
            ForwardBatch,
        )

        T = 8
        fb = ForwardBatch(
            token_ids=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.arange(T, dtype=jnp.int32),
            slots=jnp.arange(T, dtype=jnp.int32),
            q_starts=jnp.array([0], jnp.int32),
            q_lens=jnp.array([T], jnp.int32),
            kv_lens=jnp.array([T], jnp.int32),
            page_indices=jnp.arange(2, dtype=jnp.int32)[None],
            out_rows=jnp.array([T - 1], jnp.int32),
        )
        k, v = runner.kv_pool.k_pages, runner.kv_pool.v_pages
        sel, x_all, _, _ = model.forward(
            runner.params, k, v, fb, block_q=8, interpret=True,
            return_all=True,
        )
        H = runner.config.hidden_size
        assert x_all.shape == (T, 3 * H)
        a, b, c = (np.asarray(x_all[:, i * H:(i + 1) * H]) for i in range(3))
        np.testing.assert_allclose(a, b)  # duplicate capture of layer 2
        assert not np.allclose(a, c)  # layer 1 stream differs
    finally:
        eng.shutdown()
