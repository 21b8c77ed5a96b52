"""Kernel-vs-reference tests for the ragged paged attention op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_security_tpu.ops.ragged_paged_attention import (
    paged_decode_attention,
    ragged_paged_attention,
    ref_ragged_paged_attention,
)


def flat(pages):
    """[Hkv, P, ps, hd] view -> kernel's head-major [1, Hkv, P*ps, hd]."""
    Hkv, P, ps, hd = pages.shape
    return pages.reshape(1, Hkv, P * ps, hd)


def make_pool(rng, num_kv_heads, num_pages, page_size, head_dim, dtype=jnp.float32):
    k = jnp.asarray(
        rng.standard_normal((num_kv_heads, num_pages, page_size, head_dim)),
        dtype=dtype,
    )
    v = jnp.asarray(
        rng.standard_normal((num_kv_heads, num_pages, page_size, head_dim)),
        dtype=dtype,
    )
    return k, v


def build_batch(rng, q_lens, kv_lens, block_q, pages_per_seq, num_pages, page_size):
    """Aligned-ragged q layout + random non-overlapping page tables."""
    S = len(q_lens)
    q_starts = []
    t = 0
    for ql in q_lens:
        q_starts.append(t)
        t += -(-max(ql, 1) // block_q) * block_q
    T = max(t, block_q)
    perm = rng.permutation(num_pages)
    page_indices = np.zeros((S, pages_per_seq), np.int32)
    n = 0
    for s, kl in enumerate(kv_lens):
        used = -(-kl // page_size)
        page_indices[s, :used] = perm[n : n + used]
        n += used
    return np.array(q_starts, np.int32), T, page_indices


@pytest.mark.parametrize("q_per_kv", [1, 4])
@pytest.mark.parametrize(
    "q_lens,kv_lens",
    [
        ([5, 17, 1], [5, 40, 33]),  # pure prefill + tiny seqs
        ([8, 8], [72, 64]),  # extend with cached prefix
        ([3], [3]),
    ],
)
def test_prefill_matches_reference(rng, q_per_kv, q_lens, kv_lens):
    num_kv_heads, page_size, head_dim = 2, 8, 64
    block_q, pages_per_block = 16, 2
    num_pages = 64
    pages_per_seq = 16
    k_pages, v_pages = make_pool(rng, num_kv_heads, num_pages, page_size, head_dim)
    q_starts, T, page_indices = build_batch(
        rng, q_lens, kv_lens, block_q, pages_per_seq, num_pages, page_size
    )
    num_q_heads = num_kv_heads * q_per_kv
    q = jnp.asarray(
        rng.standard_normal((T, num_q_heads, head_dim)), dtype=jnp.float32
    )

    out = ragged_paged_attention(
        q,
        flat(k_pages),
        flat(v_pages),
        jnp.asarray(kv_lens, jnp.int32),
        jnp.asarray(page_indices),
        jnp.asarray(q_starts),
        jnp.asarray(q_lens, jnp.int32),
        page_size=page_size,
        block_q=block_q,
        pages_per_block=pages_per_block,
    )
    ref = ref_ragged_paged_attention(
        q,
        k_pages,
        v_pages,
        np.asarray(kv_lens),
        page_indices,
        q_starts,
        np.asarray(q_lens),
    )
    for s, (st, ql) in enumerate(zip(q_starts, q_lens)):
        np.testing.assert_allclose(
            np.asarray(out[st : st + ql]),
            np.asarray(ref[st : st + ql]),
            rtol=2e-2,
            atol=2e-2,
            err_msg=f"seq {s}",
        )


def test_decode_matches_reference(rng):
    num_kv_heads, page_size, head_dim, q_per_kv = 4, 8, 64, 2
    num_pages, pages_per_seq = 128, 8
    B = 5
    kv_lens = np.array([1, 9, 33, 64, 17], np.int32)
    k_pages, v_pages = make_pool(rng, num_kv_heads, num_pages, page_size, head_dim)
    perm = rng.permutation(num_pages)
    page_indices = np.zeros((B, pages_per_seq), np.int32)
    n = 0
    for b, kl in enumerate(kv_lens):
        used = -(-kl // page_size)
        page_indices[b, :used] = perm[n : n + used]
        n += used
    q = jnp.asarray(
        rng.standard_normal((B, num_kv_heads * q_per_kv, head_dim)),
        dtype=jnp.float32,
    )
    out = paged_decode_attention(
        q,
        flat(k_pages),
        flat(v_pages),
        jnp.asarray(kv_lens),
        jnp.asarray(page_indices),
        page_size=page_size,
        pages_per_block=2,
    )
    ref = ref_ragged_paged_attention(
        q,
        k_pages,
        v_pages,
        kv_lens,
        page_indices,
        np.arange(B, dtype=np.int32),
        np.ones(B, np.int32),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_decode_with_padded_slots(rng):
    """Padded batch rows (kv_len = 0) must not corrupt valid rows."""
    num_kv_heads, page_size, head_dim = 2, 8, 64
    num_pages, pages_per_seq = 32, 4
    kv_lens = np.array([12, 0, 20, 0], np.int32)
    B = 4
    k_pages, v_pages = make_pool(rng, num_kv_heads, num_pages, page_size, head_dim)
    page_indices = np.zeros((B, pages_per_seq), np.int32)
    page_indices[0, :2] = [3, 7]
    page_indices[2, :3] = [1, 9, 11]
    q = jnp.asarray(
        rng.standard_normal((B, num_kv_heads, head_dim)), dtype=jnp.float32
    )
    out = paged_decode_attention(
        q, flat(k_pages), flat(v_pages), jnp.asarray(kv_lens),
        jnp.asarray(page_indices), page_size=page_size, pages_per_block=2,
    )
    ref = ref_ragged_paged_attention(
        q,
        k_pages,
        v_pages,
        kv_lens,
        page_indices,
        np.arange(B, dtype=np.int32),
        (kv_lens > 0).astype(np.int32),
    )
    for b in [0, 2]:
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref[b]), rtol=2e-2, atol=2e-2
        )


def test_sliding_window_and_softcap(rng):
    num_kv_heads, page_size, head_dim = 2, 8, 64
    num_pages, pages_per_seq = 64, 8
    q_lens, kv_lens = [16], [48]
    block_q = 16
    k_pages, v_pages = make_pool(rng, num_kv_heads, num_pages, page_size, head_dim)
    q_starts, T, page_indices = build_batch(
        rng, q_lens, kv_lens, block_q, pages_per_seq, num_pages, page_size
    )
    q = jnp.asarray(
        rng.standard_normal((T, num_kv_heads * 2, head_dim)), dtype=jnp.float32
    )
    kwargs = dict(sliding_window=20, soft_cap=30.0)
    out = ragged_paged_attention(
        q,
        flat(k_pages),
        flat(v_pages),
        jnp.asarray(kv_lens, jnp.int32),
        jnp.asarray(page_indices),
        jnp.asarray(q_starts),
        jnp.asarray(q_lens, jnp.int32),
        page_size=page_size,
        block_q=block_q,
        pages_per_block=2,
        **kwargs,
    )
    ref = ref_ragged_paged_attention(
        q, k_pages, v_pages, np.asarray(kv_lens), page_indices, q_starts,
        np.asarray(q_lens), **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(out[:16]), np.asarray(ref[:16]), rtol=2e-2, atol=2e-2
    )


def test_decode_fused_kv_write(rng):
    """Fused-write mode: output must match scatter-then-attend, and the
    returned pools must contain the new token rows at `slots`."""
    num_kv_heads, page_size, head_dim, q_per_kv = 4, 8, 64, 2
    num_pages, pages_per_seq = 128, 8
    B = 5
    # kv_lens INCLUDE the new token; one seq starts a fresh page (17->
    # slot in page 3), one exactly fills a page boundary case (64)
    kv_lens = np.array([1, 9, 33, 64, 17], np.int32)
    k_pages, v_pages = make_pool(rng, num_kv_heads, num_pages, page_size, head_dim)
    perm = rng.permutation(num_pages - 1) + 1
    page_indices = np.zeros((B, pages_per_seq), np.int32)
    n = 0
    for b, kl in enumerate(kv_lens):
        used = -(-kl // page_size)
        page_indices[b, :used] = perm[n : n + used]
        n += used
    slots = np.array(
        [
            page_indices[b, (kv_lens[b] - 1) // page_size] * page_size
            + (kv_lens[b] - 1) % page_size
            for b in range(B)
        ],
        np.int32,
    )
    q = jnp.asarray(
        rng.standard_normal((B, num_kv_heads * q_per_kv, head_dim)),
        dtype=jnp.float32,
    )
    k_new = jnp.asarray(
        rng.standard_normal((B, num_kv_heads, head_dim)), jnp.float32
    )
    v_new = jnp.asarray(
        rng.standard_normal((B, num_kv_heads, head_dim)), jnp.float32
    )

    # reference: scatter first, then attend over the full pool
    kf = np.array(flat(k_pages), copy=True)
    vf = np.array(flat(v_pages), copy=True)
    kf[0, :, slots] = np.asarray(k_new)
    vf[0, :, slots] = np.asarray(v_new)
    ref = ref_ragged_paged_attention(
        q,
        jnp.asarray(kf).reshape(num_kv_heads, num_pages, page_size, head_dim),
        jnp.asarray(vf).reshape(num_kv_heads, num_pages, page_size, head_dim),
        kv_lens,
        page_indices,
        np.arange(B, dtype=np.int32),
        np.ones(B, np.int32),
    )

    out, k2, v2 = paged_decode_attention(
        q,
        flat(k_pages),
        flat(v_pages),
        jnp.asarray(kv_lens),
        jnp.asarray(page_indices),
        page_size=page_size,
        pages_per_block=2,
        k_new=k_new,
        v_new=v_new,
        slots=jnp.asarray(slots),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
    # pools got the new rows
    np.testing.assert_allclose(np.asarray(k2[0, :, slots]), np.asarray(k_new), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v2[0, :, slots]), np.asarray(v_new), rtol=1e-6)
    # and everything else is untouched
    mask = np.ones(num_pages * page_size, bool)
    mask[slots] = False
    np.testing.assert_array_equal(
        np.asarray(k2[0][:, mask]), np.asarray(flat(k_pages)[0][:, mask])
    )
