"""Slope-calibrated kernel timings at serving shapes (PERF_NOTES rule:
only ITER-chained slopes are trustworthy through the axon tunnel).

Chains serially-dependent calls (output feeds next input's first column)
so XLA cannot overlap/elide them, times ITER_LO vs ITER_HI, and reports
(t_hi - t_lo) / (ITER_HI - ITER_LO) per call.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.ops.quant_matmul import (
    int4_matmul, pack_int4, quantize_int4, quantize_int8_weight, w8a8_matmul,
)
from sglang_security_tpu.ops.ragged_paged_attention import paged_decode_attention

ITER_LO, ITER_HI = 16, 272
REPEATS = 3


def slope(make_chain):
    """make_chain(n) -> jitted fn + args; returns per-iter seconds.

    Per-call times at decode shapes are ~0.1-0.5 ms, so the iteration
    delta must be large (ITER_HI - ITER_LO = 256) to rise above the
    tunnel's ~ms jitter; take the min over repeats."""
    ts = {}
    for n in (ITER_LO, ITER_HI):
        fn, args = make_chain(n)
        float(fn(*args))  # compile+warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(fn(*args))  # scalar host fetch = the only true sync on axon
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[ITER_HI] - ts[ITER_LO]) / (ITER_HI - ITER_LO)


def mm_chain(M, K, N, act, quant="int4"):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
    x0 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)
    if quant == "int4":
        q, s, z = quantize_int4(w)
        wp = pack_int4(q)
        mm = functools.partial(int4_matmul, group_size=128, act=act, interpret=False)
        wargs = (wp, s, z)
    else:
        wq, ws = quantize_int8_weight(w)
        mm = functools.partial(w8a8_matmul, interpret=False)
        wargs = (wq, ws)

    def make(n):
        @jax.jit
        def chain(x, *wa):
            def body(c, _):
                y = mm(c, *wa)  # [M, N]
                # full-output dependency (mean) so nothing can be elided
                return c * (1 + 1e-9 * jnp.mean(y).astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c)
        return chain, (x0, *wargs)
    return make


def attn_chain(B, Hkv, Hq, hd, ps, pages_per_seq, kv_mean):
    rng = np.random.default_rng(0)
    num_pages = B * pages_per_seq + 1
    kv_lens = np.full(B, kv_mean, np.int32)
    kf = jnp.asarray(rng.standard_normal((1, Hkv, num_pages * ps, hd)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((1, Hkv, num_pages * ps, hd)), jnp.bfloat16)
    pi = np.arange(1, B * pages_per_seq + 1, dtype=np.int32).reshape(B, pages_per_seq)
    q0 = jnp.asarray(rng.standard_normal((B, Hq, hd)), jnp.bfloat16)

    def make(n):
        @jax.jit
        def chain(q, kf, vf):
            def body(c, _):
                o = paged_decode_attention(
                    c, kf, vf, jnp.asarray(kv_lens), jnp.asarray(pi),
                    page_size=ps, interpret=False)
                return c + o * 1e-6, ()
            c, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(c)  # scalar: slope() host-fetches a float
        return chain, (q0, kf, vf)
    return make


def report(name, per_iter, flops=None, bytes_=None):
    line = f"{name:48s} {per_iter*1e3:8.3f} ms"
    if flops:
        line += f"  {flops/per_iter/1e12:6.1f} TF/s"
    if bytes_:
        line += f"  {bytes_/per_iter/1e9:6.0f} GB/s"
    print(line, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    shapes = [
        (128, 4096, 6144, "decode qkv"),
        (128, 4096, 4096, "decode o"),
        (128, 4096, 28672, "decode gate+up"),
        (128, 14336, 4096, "decode down"),
        (4096, 4096, 28672, "prefill gate+up"),
        (4096, 4096, 6144, "prefill qkv"),
    ]
    for M, K, N, tag in shapes:
        fl = 2 * M * K * N
        by = K * N // 2 + 8 * (K // 128) * N
        for act in ("bf16", "int8"):
            report(f"int4 {tag} M={M} {act}", slope(mm_chain(M, K, N, act)), fl, by)
        report(f"w8a8 {tag} M={M}", slope(mm_chain(M, K, N, "", "w8a8")), fl, K * N)
        # XLA bf16 dense baseline
        rng = np.random.default_rng(0)
        wd = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

        def dense_make(n):
            @jax.jit
            def chain(x, w):
                def body(c, _):
                    y = c @ w
                    return c * (1 + 1e-9 * jnp.mean(y).astype(c.dtype)), ()
                c, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(c)
            return chain, (x0, wd)
        report(f"bf16 dense {tag} M={M}", slope(dense_make), fl, 2 * K * N)

    # decode attention at bench shape: B=128, kv ~192+, ps=64
    B, Hkv, Hq, hd, ps = 128, 8, 32, 128, 64
    per = slope(attn_chain(B, Hkv, Hq, hd, ps, 4, 250))
    kv_bytes = 2 * B * 256 * Hkv * hd * 2  # padded to page multiple
    report("decode attn B=128 kv=250 (1 layer)", per, None, kv_bytes)
    print(f"  -> x32 layers = {per*32*1e3:.1f} ms/step", flush=True)
