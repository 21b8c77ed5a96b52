"""Block-config sweep for the int4 group-dot kernel at decode shapes
(M=128, int8 acts) — slope-calibrated (PERF_NOTES rule).  Decode matmuls
run ~150-160 TF/s vs 217-229 at prefill shapes; this sweeps block_k /
block_n to find whether small-M efficiency is a tiling artifact."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.ops.quant_matmul import (
    int4_matmul, pack_int4, quantize_int4,
)
from tools.mm_slope import slope, report


def mm_chain_blocks(M, K, N, act, bn, bk):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
    x0 = jnp.asarray(
        rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16
    )
    q, s, z = quantize_int4(w)
    wp = pack_int4(q, block_k=bk)
    mm = functools.partial(
        int4_matmul, group_size=128, act=act, interpret=False,
        block_n=bn, block_k=bk,
    )

    def make(n):
        @jax.jit
        def chain(x, *wa):
            def body(c, _):
                y = mm(c, *wa)
                return c * (1 + 1e-9 * jnp.mean(y).astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c)
        return chain, (x0, wp, s, z)
    return make


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    M = int(os.environ.get("SWEEP_M", 128))
    act = os.environ.get("SWEEP_ACT", "int8")
    shapes = [
        (4096, 28672, "gate+up"),
        (14336, 4096, "down"),
    ]
    for K, N, tag in shapes:
        fl = 2 * M * K * N
        by = K * N // 2 + 8 * (K // 128) * N
        for bk in (256, 512, 1024, 2048):
            if K % bk:
                continue
            for bn in (1024, 2048, 4096):
                if N % bn:
                    continue
                try:
                    report(
                        f"int4 {tag} M={M} {act} bk={bk} bn={bn}",
                        slope(mm_chain_blocks(M, K, N, act, bn, bk)),
                        fl, by,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"  bk={bk} bn={bn}: {type(e).__name__} {e}",
                          flush=True)
