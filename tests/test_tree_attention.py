"""Tree-verify attention building blocks: non-causal prefix pass with
lse, dense tree self-attention, and the softmax-state merge.

Reference semantics: EAGLE tree verification applies a tree mask so each
draft node attends the committed prefix plus its ancestor chain
(``build_eagle_tree.py``, ``eagle_utils.cu``).  Here that is
prefix(non-causal paged) ⊕ tree(dense masked) merged by lse.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sglang_security_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention,
)
from sglang_security_tpu.ops.tree_attention import (
    ancestor_masks_from_parents,
    merge_attention_states,
    tree_self_attention,
)


def dense_ref(q, k, v, mask, sm_scale):
    # q [R, Hq, hd], k/v [Nk, Hkv, hd], mask [R, Nk]
    Hq, Hkv = q.shape[1], k.shape[1]
    g = Hq // Hkv
    out = np.zeros_like(q, dtype=np.float32)
    for h in range(Hq):
        kh = k[:, h // g].astype(np.float32)
        vh = v[:, h // g].astype(np.float32)
        s = q[:, h].astype(np.float32) @ kh.T * sm_scale
        s = np.where(mask, s, -1e30)
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(-1, keepdims=True)
        out[:, h] = p @ vh
    return out


def test_tree_verify_attention_matches_dense():
    rng = np.random.default_rng(0)
    S, R = 3, 8
    Hq, Hkv, hd, ps = 8, 2, 128, 16
    prefix = [33, 16, 5]  # committed kv lens (n-1)
    pages_per_seq = 4
    num_pages = 16
    sm_scale = hd**-0.5

    kp = rng.standard_normal((1, Hkv, num_pages * ps, hd)).astype(np.float32)
    vp = rng.standard_normal((1, Hkv, num_pages * ps, hd)).astype(np.float32)
    page_indices = np.zeros((S, pages_per_seq), np.int32)
    perm = rng.permutation(num_pages - 1) + 1
    n = 0
    for s in range(S):
        used = -(-prefix[s] // ps)
        page_indices[s, :used] = perm[n : n + used]
        n += used

    # per-seq tree rows: q/k/v of the current verify batch
    q = rng.standard_normal((S, R, Hq, hd)).astype(np.float32)
    kt = rng.standard_normal((S, R, Hkv, hd)).astype(np.float32)
    vt = rng.standard_normal((S, R, Hkv, hd)).astype(np.float32)
    # a chain 0-1-2, branches 3(parent 1), 4(parent 0), rest parent -1+i
    parents = np.tile(
        np.array([-1, 0, 1, 1, 0, 2, 4, 3], np.int32), (S, 1)
    )
    masks = np.asarray(ancestor_masks_from_parents(jnp.asarray(parents), R))
    # row r attends its ancestors and itself
    assert masks[0, 5].tolist() == [
        True, True, True, False, False, True, False, False,
    ]

    # prefix part through the paged kernel (non-causal, lse)
    qf = jnp.asarray(q.reshape(S * R, Hq, hd), jnp.bfloat16)
    out_p, lse_p = ragged_paged_attention(
        qf,
        jnp.asarray(kp, jnp.bfloat16), jnp.asarray(vp, jnp.bfloat16),
        jnp.asarray(prefix, jnp.int32), jnp.asarray(page_indices),
        jnp.arange(S, dtype=jnp.int32) * R,
        jnp.full((S,), R, jnp.int32),
        page_size=ps, block_q=R, pages_per_block=1,
        causal=False, return_lse=True, sm_scale=sm_scale,
    )
    out_t, lse_t = tree_self_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(kt, jnp.bfloat16),
        jnp.asarray(vt, jnp.bfloat16), jnp.asarray(masks),
        sm_scale=sm_scale,
    )
    merged = merge_attention_states(
        np.asarray(out_p, np.float32).reshape(S, R, Hq, hd),
        np.asarray(lse_p, np.float32).reshape(S, R, Hq),
        np.asarray(out_t), np.asarray(lse_t),
    )

    for s in range(S):
        npre = prefix[s]
        idx = page_indices[s, : -(-npre // ps)]
        kpre = kp[0][:, (idx[:, None] * ps + np.arange(ps)).reshape(-1)][
            :, :npre
        ].transpose(1, 0, 2)
        vpre = vp[0][:, (idx[:, None] * ps + np.arange(ps)).reshape(-1)][
            :, :npre
        ].transpose(1, 0, 2)
        kall = np.concatenate([kpre, kt[s]], 0)
        vall = np.concatenate([vpre, vt[s]], 0)
        mask = np.concatenate(
            [np.ones((R, npre), bool), masks[s]], 1
        )
        want = dense_ref(q[s], kall, vall, mask, sm_scale)
        got = np.asarray(merged[s])
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_lse_matches_causal_softmax_denominator():
    rng = np.random.default_rng(1)
    Hq, Hkv, hd, ps = 4, 4, 128, 16
    n = 39
    kp = rng.standard_normal((1, Hkv, 4 * ps, hd)).astype(np.float32)
    vp = rng.standard_normal((1, Hkv, 4 * ps, hd)).astype(np.float32)
    q = rng.standard_normal((8, Hq, hd)).astype(np.float32)
    pages = np.arange(4, dtype=np.int32)[None]
    out, lse = ragged_paged_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(kp, jnp.bfloat16), jnp.asarray(vp, jnp.bfloat16),
        jnp.asarray([n], jnp.int32), jnp.asarray(pages),
        jnp.asarray([0], jnp.int32), jnp.asarray([8], jnp.int32),
        page_size=ps, block_q=8, pages_per_block=1,
        causal=False, return_lse=True,
    )
    sm = hd**-0.5
    for h in range(Hq):
        s = q[:, h] @ kp[0, h, :n].T * sm
        want = np.log(np.exp(s).sum(-1))
        np.testing.assert_allclose(
            np.asarray(lse)[:, h], want, rtol=2e-2, atol=2e-2
        )
