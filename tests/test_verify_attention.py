"""paged_verify_attention: speculative-verify kernel vs dense oracle.

The kernel fuses (a) attention of bq new rows per sequence over paged
prefix + in-register new KV with a causal mask over the new rows, and
(b) landing the new rows in the pool (RMW windows).  Oracle: dense
softmax attention over the concatenated [prefix, new] KV, plus direct
slot writes.  (Reference behavior: target-verify attention +
KV-cache store, sgl-kernel/csrc/speculative/.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_security_tpu.ops.ragged_paged_attention import (
    _verify_windows,
    paged_verify_attention,
)


def _oracle(q, kv_k, kv_v, kv_lens, q_lens, sm_scale):
    """q: [B, bq, Hq, hd]; kv_*: [B, Lmax, Hkv, hd] dense per-seq KV
    (prefix then new rows at positions kv_len-q_len .. kv_len-1)."""
    B, bq, Hq, hd = q.shape
    Hkv = kv_k.shape[2]
    g = Hq // Hkv
    out = np.zeros_like(np.asarray(q, np.float32))
    for b in range(B):
        L = int(kv_lens[b])
        ql = int(q_lens[b])
        if L == 0 or ql == 0:
            continue
        for i in range(ql):
            qpos = L - ql + i
            k = np.asarray(kv_k[b, : qpos + 1], np.float32)  # [t, Hkv, hd]
            v = np.asarray(kv_v[b, : qpos + 1], np.float32)
            for h in range(Hq):
                hk = h // g
                s = (np.asarray(q[b, i, h], np.float32) @ k[:, hk].T) * sm_scale
                p = np.exp(s - s.max())
                p /= p.sum()
                out[b, i, h] = p @ v[:, hk]
    return out


def test_verify_windows_packed():
    W = 16
    slots = jnp.array([
        [5, 6, 7, 8, 9, 10, 11, 12],       # one window [0,16)
        [12, 13, 14, 15, 16, 17, 18, 19],  # two windows
        [126, 127, 640, 641, 642, 643, 644, 645],  # page crossing
        [-1] * 8,                           # dead
        [30, 31, 640, -1, -1, -1, -1, -1],  # crossing + 2 wins in run A
    ], jnp.int32)
    wins = np.asarray(_verify_windows(slots, W))  # window indices
    assert wins[0].tolist() == [0, -1, -1]
    assert wins[1].tolist() == [0, 1, -1]
    assert wins[2].tolist() == [7, 40, -1]
    assert wins[3].tolist() == [-1, -1, -1]
    assert wins[4].tolist() == [1, 40, -1]
    # packed: no -1 gaps before an active window
    for row in wins:
        seen_neg = False
        for x in row:
            if x < 0:
                seen_neg = True
            else:
                assert not seen_neg


@pytest.mark.parametrize("cross_page", [False, True])
def test_verify_attention_parity(cross_page):
    rng = np.random.default_rng(0)
    B, bq, Hq, Hkv, hd = 4, 8, 8, 4, 64
    page_size = 32
    pages_per_seq = 8
    L_layers = 2
    layer = 1
    tokens = 1 + page_size * (pages_per_seq * B + 2)

    # per-seq committed lengths n; new rows at n-1 .. n+bq-2
    if cross_page:
        ns = [page_size * 2 - 3, page_size - 1, 7, page_size * 3]
    else:
        ns = [20, 9, 3, 40]
    q_lens = np.array([bq, bq, bq - 2, 0], np.int32)  # one short, one dead
    kv_lens = np.array(
        [n + ql - 1 if ql else 0 for n, ql in zip(ns, q_lens)], np.int32
    )

    pi = rng.permutation(np.arange(1, B * pages_per_seq + 1)).reshape(
        B, pages_per_seq
    ).astype(np.int32)

    k_pages = rng.standard_normal((L_layers, Hkv, tokens, hd)).astype(
        np.float32
    )
    v_pages = rng.standard_normal((L_layers, Hkv, tokens, hd)).astype(
        np.float32
    )
    q = rng.standard_normal((B, bq, Hq, hd)).astype(np.float32) * 0.5
    k_new = rng.standard_normal((B, bq, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, bq, Hkv, hd)).astype(np.float32)

    def slot_of(b, pos):
        return int(pi[b, pos // page_size]) * page_size + pos % page_size

    slots = np.full((B, bq), -1, np.int32)
    for b in range(B):
        for j in range(int(q_lens[b])):
            pos = ns[b] - 1 + j
            slots[b, j] = slot_of(b, pos)

    # dense oracle KV: prefix from pages, then the new rows
    Lmax = int(kv_lens.max())
    kv_k = np.zeros((B, Lmax, Hkv, hd), np.float32)
    kv_v = np.zeros((B, Lmax, Hkv, hd), np.float32)
    for b in range(B):
        ql = int(q_lens[b])
        if ql == 0:
            continue
        for pos in range(int(kv_lens[b]) - ql):
            s = slot_of(b, pos)
            kv_k[b, pos] = k_pages[layer, :, s]
            kv_v[b, pos] = v_pages[layer, :, s]
        for j in range(ql):
            kv_k[b, int(kv_lens[b]) - ql + j] = k_new[b, j]
            kv_v[b, int(kv_lens[b]) - ql + j] = v_new[b, j]

    sm_scale = hd**-0.5
    want = _oracle(q, kv_k, kv_v, kv_lens, q_lens, sm_scale)

    out, k_pages2, v_pages2 = paged_verify_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(kv_lens), jnp.asarray(q_lens), jnp.asarray(pi),
        jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots),
        page_size=page_size, layer=layer, sm_scale=sm_scale,
        interpret=True,
    )
    out = np.asarray(out)
    for b in range(B):
        ql = int(q_lens[b])
        if ql:
            np.testing.assert_allclose(
                out[b, :ql], want[b, :ql], rtol=2e-2, atol=2e-2
            )

    # pool writes: every valid slot row updated, everything else intact
    k_pages2 = np.asarray(k_pages2)
    v_pages2 = np.asarray(v_pages2)
    touched = set()
    for b in range(B):
        for j in range(int(q_lens[b])):
            s = int(slots[b, j])
            touched.add(s)
            np.testing.assert_allclose(
                k_pages2[layer, :, s], k_new[b, j], rtol=1e-6
            )
            np.testing.assert_allclose(
                v_pages2[layer, :, s], v_new[b, j], rtol=1e-6
            )
    # windows may rewrite neighbor rows of the same seq's pages with
    # their original values; ALL rows outside the touched slot set must
    # be bit-identical (a clobbered neighbor inside an RMW window would
    # otherwise go unnoticed — ADVICE r4)
    untouched = np.ones(tokens, bool)
    untouched[list(touched)] = False
    np.testing.assert_array_equal(
        k_pages2[layer][:, untouched], np.asarray(k_pages)[layer][:, untouched]
    )
    np.testing.assert_array_equal(
        v_pages2[layer][:, untouched], np.asarray(v_pages)[layer][:, untouched]
    )
    # other layer fully intact
    np.testing.assert_allclose(k_pages2[0], k_pages[0])
    np.testing.assert_allclose(v_pages2[0], v_pages[0])


def test_verify_attention_bf16_window16():
    """bf16 pools (W=16), page_size=128 — the serving configuration."""
    rng = np.random.default_rng(1)
    B, bq, Hq, Hkv, hd = 2, 8, 8, 4, 64
    page_size = 128
    pages_per_seq = 2
    tokens = 1 + page_size * (B * pages_per_seq + 1)
    ns = [page_size - 2, 57]  # first crosses a page mid-rows
    q_lens = np.array([bq, bq], np.int32)
    kv_lens = np.array([n + bq - 1 for n in ns], np.int32)
    pi = np.array([[1, 2], [3, 4]], np.int32)

    k_pages = (rng.standard_normal((1, Hkv, tokens, hd)) * 0.5).astype(
        jnp.bfloat16
    )
    v_pages = (rng.standard_normal((1, Hkv, tokens, hd)) * 0.5).astype(
        jnp.bfloat16
    )
    q = (rng.standard_normal((B, bq, Hq, hd)) * 0.5).astype(jnp.bfloat16)
    k_new = (rng.standard_normal((B, bq, Hkv, hd)) * 0.5).astype(
        jnp.bfloat16
    )
    v_new = (rng.standard_normal((B, bq, Hkv, hd)) * 0.5).astype(
        jnp.bfloat16
    )

    def slot_of(b, pos):
        return int(pi[b, pos // page_size]) * page_size + pos % page_size

    slots = np.zeros((B, bq), np.int32)
    for b in range(B):
        for j in range(bq):
            slots[b, j] = slot_of(b, ns[b] - 1 + j)

    Lmax = int(kv_lens.max())
    kv_k = np.zeros((B, Lmax, Hkv, hd), np.float32)
    kv_v = np.zeros((B, Lmax, Hkv, hd), np.float32)
    kpf = np.asarray(k_pages, np.float32)
    vpf = np.asarray(v_pages, np.float32)
    for b in range(B):
        for pos in range(int(kv_lens[b]) - bq):
            s = slot_of(b, pos)
            kv_k[b, pos] = kpf[0, :, s]
            kv_v[b, pos] = vpf[0, :, s]
        for j in range(bq):
            kv_k[b, int(kv_lens[b]) - bq + j] = np.asarray(
                k_new[b, j], np.float32
            )
            kv_v[b, int(kv_lens[b]) - bq + j] = np.asarray(
                v_new[b, j], np.float32
            )

    sm_scale = hd**-0.5
    want = _oracle(
        np.asarray(q, np.float32), kv_k, kv_v, kv_lens, q_lens, sm_scale
    )
    out, k2, v2 = paged_verify_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(kv_lens), jnp.asarray(q_lens), jnp.asarray(pi),
        k_new, v_new, jnp.asarray(slots),
        page_size=page_size, layer=0, sm_scale=sm_scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want, rtol=5e-2, atol=5e-2
    )
    k2 = np.asarray(k2, np.float32)
    for b in range(B):
        for j in range(bq):
            np.testing.assert_allclose(
                k2[0, :, int(slots[b, j])],
                np.asarray(k_new[b, j], np.float32),
            )
