"""Mosaic-lowered kernel parity at SERVING shapes on the real TPU chip.

Closes VERDICT r1 weak #8 ("kernels are tested in interpret mode only"):
runs every hot Pallas kernel with interpret=False at the shapes the 8B
serving path actually uses and checks against jnp/numpy oracles.

Run:  python tools/tpu_kernel_parity.py        (needs the axon tunnel)
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sglang_security_tpu.ops.ragged_paged_attention import (
    paged_decode_attention,
    ragged_paged_attention,
    ref_ragged_paged_attention,
)
from sglang_security_tpu.ops.quant_matmul import (
    dequantize_int4,
    int4_matmul,
    int8_matmul,
    pack_int4,
    quantize_int4,
    quantize_int8_rowwise,
    quantize_int8_weight,
)

RESULTS = []


def check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-6)
    rel = (err / denom).max()
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    RESULTS.append((name, ok, float(err.max()), float(rel)))
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs={err.max():.3e} max_rel={rel:.3e}")
    return ok


def flat(pages):
    Hkv, P, ps, hd = pages.shape
    return pages.reshape(1, Hkv, P * ps, hd)


def decode_attention_serving():
    """B=128 decode, Llama-3-8B heads, page_size=64, kv~200 — the bench shape."""
    rng = np.random.default_rng(0)
    Hkv, Hq, hd, ps = 8, 32, 128, 64
    B, pages_per_seq = 128, 8
    num_pages = B * pages_per_seq + 1
    kv_lens = rng.integers(1, ps * pages_per_seq, B).astype(np.int32)
    kv_lens[:4] = [1, ps, ps + 1, ps * pages_per_seq]  # boundary cases
    k_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    v_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    perm = rng.permutation(num_pages - 1) + 1
    page_indices = np.zeros((B, pages_per_seq), np.int32)
    n = 0
    for b, kl in enumerate(kv_lens):
        used = -(-int(kl) // ps)
        page_indices[b, :used] = perm[n : n + used]
        n += used
    q = rng.standard_normal((B, Hq, hd)).astype(np.float32)

    kf = jnp.asarray(flat(k_pages), jnp.bfloat16)
    vf = jnp.asarray(flat(v_pages), jnp.bfloat16)
    out = paged_decode_attention(
        jnp.asarray(q, jnp.bfloat16), kf, vf,
        jnp.asarray(kv_lens), jnp.asarray(page_indices),
        page_size=ps, interpret=False,
    )
    ref = ref_ragged_paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        kv_lens, page_indices, np.arange(B, dtype=np.int32), np.ones(B, np.int32),
    )
    check("decode_attn B=128 ps=64 bf16", out, ref, 2e-2, 2e-2)

    # fused KV-write mode (the production decode path)
    slots = np.array(
        [page_indices[b, (kv_lens[b] - 1) // ps] * ps + (kv_lens[b] - 1) % ps
         for b in range(B)], np.int32)
    k_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    kf2 = np.array(flat(k_pages), copy=True)
    vf2 = np.array(flat(v_pages), copy=True)
    kf2[0, :, slots] = k_new
    vf2[0, :, slots] = v_new
    ref2 = ref_ragged_paged_attention(
        jnp.asarray(q),
        jnp.asarray(kf2).reshape(Hkv, num_pages, ps, hd),
        jnp.asarray(vf2).reshape(Hkv, num_pages, ps, hd),
        kv_lens, page_indices, np.arange(B, dtype=np.int32), np.ones(B, np.int32),
    )
    out2, k2, v2 = paged_decode_attention(
        jnp.asarray(q, jnp.bfloat16), kf, vf,
        jnp.asarray(kv_lens), jnp.asarray(page_indices),
        page_size=ps, interpret=False,
        k_new=jnp.asarray(k_new, jnp.bfloat16),
        v_new=jnp.asarray(v_new, jnp.bfloat16),
        slots=jnp.asarray(slots),
    )
    check("decode_attn fused-write out", out2, ref2, 2e-2, 2e-2)
    check("decode_attn fused-write k rows", np.asarray(k2[0, :, slots], np.float32),
          k_new, 2e-2, 2e-2)
    check("decode_attn fused-write v rows", np.asarray(v2[0, :, slots], np.float32),
          v_new, 2e-2, 2e-2)


def prefill_attention_serving():
    """Chunked prefill: T=2048 over 4 seqs with cached prefixes."""
    rng = np.random.default_rng(1)
    Hkv, Hq, hd, ps = 8, 32, 128, 64
    q_lens = [512, 512, 512, 512]
    kv_lens = [700, 512, 1024, 513]
    block_q, pages_per_block = 256, 1
    pages_per_seq = 16
    num_pages = 72
    k_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    v_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    S = len(q_lens)
    q_starts, t = [], 0
    for ql in q_lens:
        q_starts.append(t)
        t += -(-ql // block_q) * block_q
    T = t
    perm = rng.permutation(num_pages)
    page_indices = np.zeros((S, pages_per_seq), np.int32)
    n = 0
    for s, kl in enumerate(kv_lens):
        used = -(-kl // ps)
        page_indices[s, :used] = perm[n : n + used]
        n += used
    q = rng.standard_normal((T, Hq, hd)).astype(np.float32)
    q_starts = np.asarray(q_starts, np.int32)
    out = ragged_paged_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(flat(k_pages), jnp.bfloat16),
        jnp.asarray(flat(v_pages), jnp.bfloat16),
        jnp.asarray(kv_lens, jnp.int32), jnp.asarray(page_indices),
        jnp.asarray(q_starts), jnp.asarray(q_lens, jnp.int32),
        page_size=ps, block_q=block_q, pages_per_block=pages_per_block,
        interpret=False,
    )
    ref = ref_ragged_paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        np.asarray(kv_lens), page_indices, q_starts, np.asarray(q_lens),
    )
    ok = True
    for s, (st, ql) in enumerate(zip(q_starts, q_lens)):
        ok &= check(f"prefill_attn T=2048 seq{s}", out[st:st + ql],
                    ref[st:st + ql], 2e-2, 2e-2)


def verify_attention_serving():
    """Fused-spec verify kernel at serving shapes: B=8, bq=8 rows/seq,
    page_size=128, with a page-boundary-crossing row run.  Oracle:
    ref_ragged_paged_attention over pages with the new rows pre-written
    (identical semantics: causal anchored at kv_len - q_len)."""
    from sglang_security_tpu.ops.ragged_paged_attention import (
        paged_verify_attention,
    )

    rng = np.random.default_rng(4)
    Hkv, Hq, hd, ps = 8, 32, 128, 128
    B, bq, pages_per_seq = 8, 8, 4
    num_pages = B * pages_per_seq + 1
    # committed lengths n; rows at n-1 .. n+bq-2; one seq crosses a page
    ns = [200, ps - 3, 40, 2 * ps - 1, 17, 300, 90, 128]
    q_lens_np = np.full(B, bq, np.int32)
    kv_lens = np.asarray([n + bq - 1 for n in ns], np.int32)
    perm = rng.permutation(num_pages - 1) + 1
    page_indices = perm[: B * pages_per_seq].reshape(B, pages_per_seq).astype(
        np.int32
    )
    k_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    v_pages = rng.standard_normal((Hkv, num_pages, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, bq, Hq, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, bq, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, bq, Hkv, hd)).astype(np.float32)

    def slot_of(b, pos):
        return int(page_indices[b, pos // ps]) * ps + pos % ps

    slots = np.zeros((B, bq), np.int32)
    for b in range(B):
        for j in range(bq):
            slots[b, j] = slot_of(b, ns[b] - 1 + j)

    kf2 = np.array(flat(k_pages), copy=True)
    vf2 = np.array(flat(v_pages), copy=True)
    for b in range(B):
        for j in range(bq):
            kf2[0, :, slots[b, j]] = k_new[b, j]
            vf2[0, :, slots[b, j]] = v_new[b, j]
    ref = ref_ragged_paged_attention(
        jnp.asarray(q.reshape(B * bq, Hq, hd)),
        jnp.asarray(kf2).reshape(Hkv, num_pages, ps, hd),
        jnp.asarray(vf2).reshape(Hkv, num_pages, ps, hd),
        kv_lens, page_indices,
        np.arange(B, dtype=np.int32) * bq, q_lens_np,
    )
    out, k2, v2 = paged_verify_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(flat(k_pages), jnp.bfloat16),
        jnp.asarray(flat(v_pages), jnp.bfloat16),
        jnp.asarray(kv_lens), jnp.asarray(q_lens_np),
        jnp.asarray(page_indices),
        jnp.asarray(k_new, jnp.bfloat16), jnp.asarray(v_new, jnp.bfloat16),
        jnp.asarray(slots), page_size=ps, interpret=False,
    )
    check("verify_attn B=8 bq=8 ps=128 out",
          out.reshape(B * bq, Hq, hd), ref, 2e-2, 2e-2)
    k2r = np.asarray(
        k2[0, :, slots.reshape(-1)], np.float32
    ).transpose(1, 0, 2)  # [Hkv, B*bq, hd] -> [B*bq, Hkv, hd]
    v2r = np.asarray(
        v2[0, :, slots.reshape(-1)], np.float32
    ).transpose(1, 0, 2)
    check("verify_attn new k rows", k2r,
          k_new.reshape(B * bq, Hkv, hd), 2e-2, 2e-2)
    check("verify_attn new v rows", v2r,
          v_new.reshape(B * bq, Hkv, hd), 2e-2, 2e-2)


def int4_serving():
    """w4a16 + w4a8 at decode (M=128) and prefill (M=2048) 8B shapes."""
    rng = np.random.default_rng(2)
    G = 128
    for M, K, N, tag in [(128, 4096, 4096, "qkv-o"), (128, 4096, 14336, "mlp-up"),
                         (128, 14336, 4096, "mlp-down"), (2048, 4096, 4096, "prefill")]:
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
        x = rng.standard_normal((M, K)).astype(np.float32)
        q, scale, zero = quantize_int4(jnp.asarray(w), group_size=G)
        wp = pack_int4(q)
        wd = dequantize_int4(q, scale, zero, group_size=G)
        ref = jnp.asarray(x, jnp.bfloat16) @ wd.astype(jnp.bfloat16)
        out = int4_matmul(jnp.asarray(x, jnp.bfloat16), wp, scale, zero,
                          group_size=G, interpret=False)
        check(f"int4 w4a16 M={M} K={K} N={N} {tag}", out, ref, 3e-2, 3e-2)
        if M == 128:
            out8 = int4_matmul(jnp.asarray(x, jnp.bfloat16), wp, scale, zero,
                               group_size=G, act="int8", interpret=False)
            # w4a8 oracle quantizes activations the same way the kernel
            # does: parity here verifies the KERNEL computes its intended
            # math exactly (int8 dots are integer-exact; the fixup dot is
            # HIGHEST-precision f32).  The bf16-activation reference
            # differs by inherent act-quant noise that grows as sqrt(K)
            # (~1.2e-1 at K=14336) — that fidelity question is measured
            # end-to-end by tools/quant_fidelity.py, not here.
            xb = jnp.asarray(x, jnp.bfloat16)
            xq, xs = quantize_int8_rowwise(xb)
            ref8 = jnp.matmul(
                xq.astype(jnp.float32), wd.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ) * xs
            check(f"int4 w4a8  M={M} K={K} N={N} {tag}", out8, ref8, 1e-2, 1e-2)


def w8a8_serving():
    rng = np.random.default_rng(3)
    for M, K, N in [(128, 4096, 4096), (2048, 4096, 14336)]:
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
        x = rng.standard_normal((M, K)).astype(np.float32)
        wq, ws = quantize_int8_weight(jnp.asarray(w))
        xq, xs = quantize_int8_rowwise(jnp.asarray(x))
        ref = (xq.astype(jnp.float32) * xs) @ (wq.astype(jnp.float32) * ws)
        out = int8_matmul(xq, xs, wq, ws, interpret=False)
        check(f"w8a8 M={M} K={K} N={N}", out, ref, 2e-2, 2e-2)


def main():
    print("devices:", jax.devices())
    decode_attention_serving()
    prefill_attention_serving()
    verify_attention_serving()
    int4_serving()
    w8a8_serving()
    n_fail = sum(1 for _, ok, _, _ in RESULTS if not ok)
    print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} parity checks passed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
