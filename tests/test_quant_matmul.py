"""Quantized matmul kernels vs reference dequant implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_security_tpu.ops.quant_matmul import (
    dequantize_int4,
    int4_matmul,
    int8_matmul,
    pack_int4,
    quantize_int4,
    quantize_int8_rowwise,
    quantize_int8_weight,
    w8a8_matmul,
)


@pytest.mark.parametrize("M", [1, 7, 64])
def test_int4_matmul_matches_dequant(rng, M):
    K, N, G, BK = 1024, 256, 128, 512
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    q, s, z = quantize_int4(w, G)
    packed = pack_int4(q, BK)
    out = int4_matmul(x, packed, s, z, group_size=G, block_k=BK,
                      block_m=64, block_n=128, out_dtype=jnp.float32)
    ref = x @ dequantize_int4(q, s, z, G)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 3e-2, rel


def test_int4_quantization_roundtrip(rng):
    K, N, G = 512, 128, 128
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    q, s, z = quantize_int4(w, G)
    w2 = dequantize_int4(q, s, z, G)
    # group-128 int4 quantization error should be small relative to range
    err = np.abs(np.asarray(w - w2)).max()
    step = np.asarray(s).max()
    assert err <= step * 0.51 + 1e-5


def test_int8_matmul_matches_reference(rng):
    M, K, N = 48, 512, 256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    w_q, w_s = quantize_int8_weight(w)
    out = w8a8_matmul(x, w_q, w_s, block_m=32, block_n=128, block_k=256,
                      out_dtype=jnp.float32)
    ref = x @ w
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 3e-2, rel


def test_int8_rowwise_quant(rng):
    x = jnp.asarray(rng.standard_normal((5, 64)) * 10, jnp.float32)
    q, s = quantize_int8_rowwise(x)
    x2 = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(x2, np.asarray(x), atol=np.asarray(s).max())


@pytest.mark.parametrize("M", [1, 64])
def test_int4_matmul_act_int8(rng, M):
    """w4a8 mode: int8 activation quantization adds ~1/127 relative noise."""
    K, N, G, BK = 1024, 256, 128, 512
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    q, s, z = quantize_int4(w, G)
    packed = pack_int4(q, BK)
    out = int4_matmul(x, packed, s, z, group_size=G, block_k=BK,
                      block_m=64, block_n=128, out_dtype=jnp.float32,
                      act="int8")
    ref = x @ dequantize_int4(q, s, z, G)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 5e-2, rel


def test_int4_matmul_group_ge_half(rng):
    """group_size >= block_k//2 exercises the single-group-per-half path."""
    K, N, G, BK = 512, 128, 256, 512
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.float32)
    q, s, z = quantize_int4(w, G)
    packed = pack_int4(q, BK)
    out = int4_matmul(x, packed, s, z, group_size=G, block_k=BK,
                      block_m=16, block_n=128, out_dtype=jnp.float32)
    ref = x @ dequantize_int4(q, s, z, G)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 3e-2, rel


@pytest.mark.parametrize("M", [512, 700])
def test_int4_matmul_dequant_formulation(rng, M):
    """M >= DEQUANT_MIN_M dispatches the dequant-formulation kernel
    (one big dot per packed half, zero folded into the dequant)."""
    K, N, G, BK = 2048, 256, 128, 1024
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    q, s, z = quantize_int4(w, G)
    packed = pack_int4(q, BK)
    out = int4_matmul(x, packed, s, z, group_size=G, block_k=BK,
                      block_m=512, block_n=256, out_dtype=jnp.float32)
    ref = x @ dequantize_int4(q, s, z, G)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-6
    )
    assert rel < 3e-2, rel
