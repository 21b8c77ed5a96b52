"""Double-sparsity decode attention (reference
double_sparsity_backend.py + triton double_sparsity_attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_security_tpu.ops.double_sparsity import (
    heavy_channels_from_k_weights,
    sparse_decode_attention,
)


def _dense_ref(q, kl, vl, kv_lens, rows):
    """Naive full attention over the candidate rows (numpy)."""
    S, Hq, hd = q.shape
    Hkv = kl.shape[0]
    G = Hq // Hkv
    out = np.zeros((S, Hq, hd), np.float32)
    for s in range(S):
        n = kv_lens[s]
        for h in range(Hq):
            kv = h // G
            k = kl[kv, rows[s, :n]]
            v = vl[kv, rows[s, :n]]
            sc = (q[s, h] @ k.T) * hd**-0.5
            w = np.exp(sc - sc.max())
            w /= w.sum()
            out[s, h] = w @ v
    return out


def _setup(S=3, Hq=4, Hkv=2, hd=32, ps=8, PPS=4, seed=0):
    rng = np.random.default_rng(seed)
    tokens = 128
    L = 1
    kp = rng.standard_normal((L, Hkv, tokens, hd)).astype(np.float32)
    vp = rng.standard_normal((L, Hkv, tokens, hd)).astype(np.float32)
    q = rng.standard_normal((S, Hq, hd)).astype(np.float32)
    kv_lens = np.asarray([5, ps * PPS, 17], np.int32)[:S]
    pi = np.zeros((S, PPS), np.int32)
    for s in range(S):
        used = -(-int(kv_lens[s]) // ps)
        pi[s, :used] = 1 + np.arange(used) + s * PPS  # disjoint pages
    rows = (pi[:, :, None] * ps + np.arange(ps)[None, None, :]).reshape(S, -1)
    return q, kp, vp, kv_lens, pi, rows


def test_exact_when_heavy_covers_context():
    q, kp, vp, kv_lens, pi, rows = _setup()
    hd = q.shape[-1]
    Hkv = kp.shape[1]
    channels = np.tile(np.arange(hd, dtype=np.int32), (Hkv, 1))
    out = jax.jit(
        lambda *a: sparse_decode_attention(
            *a, heavy_tokens=10_000, page_size=8, sm_scale=hd**-0.5
        ),
        static_argnums=(6,),
    )(jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
      jnp.asarray(kv_lens), jnp.asarray(pi), jnp.asarray(channels), 0)
    ref = _dense_ref(q, kp[0], vp[0], kv_lens, rows)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sparse_finds_heavy_token():
    """A single overwhelmingly-relevant token outside the recent window
    must be selected via the approximate scores."""
    q, kp, vp, kv_lens, pi, rows = _setup(S=1, seed=1)
    hd = q.shape[-1]
    Hkv = kp.shape[1]
    kv_lens = np.asarray([32], np.int32)
    # plant a token whose key == 50 * q direction at logical pos 2
    target_row = rows[0, 2]
    for kv in range(Hkv):
        kp[0, kv, target_row] = 50.0 * q[0, kv * 2] / np.linalg.norm(q[0, kv * 2])
        vp[0, kv, target_row] = 7.0
    channels = np.tile(np.arange(hd, dtype=np.int32), (Hkv, 1))
    out = sparse_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(kv_lens), jnp.asarray(pi), jnp.asarray(channels), 0,
        heavy_tokens=4, page_size=8, sm_scale=hd**-0.5,
    )
    # attention should be dominated by the planted value (7.0)
    assert abs(float(np.asarray(out)[0, 0, 0]) - 7.0) < 0.5


def test_channels_from_k_weights():
    rng = np.random.default_rng(2)
    Hkv, hd, H = 2, 16, 64
    wk = rng.standard_normal((H, Hkv * hd)).astype(np.float32) * 0.01
    # boost columns 3 and 9 of head 0, column 12 of head 1
    wk[:, 3] *= 100
    wk[:, 9] *= 60
    wk[:, hd + 12] *= 100
    ch = heavy_channels_from_k_weights(wk, Hkv, hd, r=2)
    assert set(ch[0]) == {3, 9}
    assert ch[1][0] == 12


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_ds") / "llama")
    make_tiny_llama(path)
    return path


def _engine(path, **kw):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    args = dict(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[128], decode_bs_buckets=[1, 2],
        max_seq_pages_buckets=[16], random_seed=0, enable_warmup=False,
        log_level="warning", unroll_layers=False,
    )
    args.update(kw)
    return Engine(ServerArgs(**args))


def test_engine_ds_exact_parity_when_covering(tiny):
    """heavy_tokens >= padded context + full channels -> outputs match
    the dense engine exactly."""
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompts = ["one two three four " * 8, "tiny"]
    eng = _engine(tiny)
    base = [o["output_ids"] for o in eng.generate(
        prompt=prompts, sampling_params=sp)]
    eng.shutdown()
    eng = _engine(
        tiny, enable_double_sparsity=True,
        ds_heavy_channel_num=1024,  # clamps to head_dim -> exact scores
        ds_heavy_token_num=4096,
        ds_sparse_decode_threshold=1,  # every decode bucket goes sparse
    )
    assert getattr(eng.scheduler.runner.model, "ds_cfg", None) is not None
    got = [o["output_ids"] for o in eng.generate(
        prompt=prompts, sampling_params=sp)]
    assert got == base
    eng.shutdown()


def test_engine_ds_sparse_generates(tiny):
    """Aggressive sparsity still serves correctly-shaped outputs."""
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    eng = _engine(
        tiny, enable_double_sparsity=True, ds_heavy_channel_num=8,
        ds_heavy_token_num=16, ds_sparse_decode_threshold=1,
    )
    outs = eng.generate(prompt=["long prompt " * 20, "short"],
                        sampling_params=sp)
    assert all(o["meta_info"]["completion_tokens"] == 6 for o in outs)
    eng.shutdown()
