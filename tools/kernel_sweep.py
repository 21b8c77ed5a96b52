"""On-chip sweep of quantized-matmul strategies at serving shapes.

Decides the decode/prefill matmul implementation from measured slopes
(scalar-fetch sync — the only trustworthy timing through the axon
tunnel; see PERF_NOTES).

Candidates:
  xla_bf16       — dense bf16 jnp.dot (HBM-bound ref point)
  xla_int8       — int8 jnp.dot_general + row/col scales (XLA-native w8a8)
  xla_int4g      — bf16 dot over (w4 - z) * s with group reshape, XLA fuses
                   the dequant into the dot operand (weights stored int4)
  pallas_v2      — current group-dot int4 kernel (bf16 / int8 act)
  pallas_w8a8    — current int8 kernel, block sweep
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
    int4_matmul, int8_matmul, pack_int4, quantize_int4,
    quantize_int8_rowwise, quantize_int8_weight,
)

ITER_LO, ITER_HI = 16, 272
G = 128


def slope(fn_maker):
    ts = {}
    for n in (ITER_LO, ITER_HI):
        fn, args = fn_maker(n)
        float(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[ITER_HI] - ts[ITER_LO]) / (ITER_HI - ITER_LO)


def chain(mm, x0, wargs):
    def make(n):
        @jax.jit
        def f(x, *wa):
            def body(c, _):
                y = mm(c, *wa)
                return c * (1 + 1e-9 * jnp.mean(y).astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c)
        return f, (x0, *wargs)
    return make


def report(name, per, flops):
    print(f"{name:52s} {per*1e3:8.3f} ms  {flops/per/1e12:6.1f} TF/s", flush=True)


def run_shape(M, K, N, tag):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
    x0 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)
    fl = 2 * M * K * N

    # xla_bf16
    wd = w.astype(jnp.bfloat16)
    report(f"xla_bf16 {tag}", slope(chain(lambda x, w: x @ w, x0, (wd,))), fl)

    # xla_int8 (w8a8, per-row x scale / per-col w scale)
    wq, ws = quantize_int8_weight(w)
    def xla_int8(x, wq, ws):
        xq, xs = quantize_int8_rowwise(x)
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)
    report(f"xla_int8 {tag}", slope(chain(xla_int8, x0, (wq, ws))), fl)

    # xla_int4g: int4-stored weights, group dequant fused into the dot.
    # quantize_int4 returns unsigned nibbles 0..15; int4 is signed, so
    # shift to q-8 before the cast and fold the +8 into the zero point.
    q, s, z = quantize_int4(w, G)
    q4 = (q.astype(jnp.int32) - 8).astype(jnp.int4)
    z8 = z - 8.0
    def xla_int4g(x, q4, s, z):
        wf = (q4.astype(jnp.bfloat16).reshape(K // G, G, N)
              - z[:, None, :].astype(jnp.bfloat16)) * s[:, None, :].astype(jnp.bfloat16)
        return x @ wf.reshape(K, N)
    report(f"xla_int4g {tag}", slope(chain(xla_int4g, x0, (q4, s, z8))), fl)

    # xla_int4 symmetric per-col (cheapest dequant: one mul)
    qs = jnp.clip(jnp.round(w / (jnp.abs(w).max(0, keepdims=True) / 7)), -8, 7)
    q4s = qs.astype(jnp.int4)
    scol = (jnp.abs(w).max(0, keepdims=True) / 7).astype(jnp.bfloat16)
    def xla_int4c(x, q4, sc):
        return (x @ q4.astype(jnp.bfloat16)) * sc
    report(f"xla_int4col {tag}", slope(chain(xla_int4c, x0, (q4s, scol))), fl)

    # pallas v2 group-dot
    wp = pack_int4(q)
    for act in ("bf16", "int8"):
        for bn in (256, 512):
            mm = functools.partial(int4_matmul, group_size=G, act=act,
                                   block_n=bn, interpret=False)
            report(f"pallas_v2 {tag} act={act} bn={bn}",
                   slope(chain(mm, x0, (wp, s, z))), fl)

    # pallas w8a8 block sweep
    for bn, bk in ((256, 512), (512, 512), (512, 1024)):
        if K % bk:
            continue
        def w8a8(x, wq, ws, bn=bn, bk=bk):
            xq, xs = quantize_int8_rowwise(x)
            return int8_matmul(xq, xs, wq, ws, block_n=bn, block_k=bk,
                               interpret=False)
        report(f"pallas_w8a8 {tag} bn={bn} bk={bk}",
               slope(chain(w8a8, x0, (wq, ws))), fl)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for M, K, N, tag in [
        (128, 14336, 4096, "decode-down"),
        (128, 4096, 28672, "decode-gate+up"),
        (4096, 4096, 28672, "prefill-gate+up"),
    ]:
        run_shape(M, K, N, tag)
