"""Pallas TPU kernels and their jnp reference implementations.

Hot ops (SURVEY.md §2.3 mapping):
  - ragged_paged_attention: prefill-with-prefix + decode attention over the
    paged KV pool (replaces FlashInfer/FA3/Triton attention backends and
    sgl-kernel cascade/merge kernels — prefix and new tokens live in one
    page pool, so no separate merge-states pass is needed).
  - quantized matmuls: INT4 group dequant×bf16, FP8 GEMM with scales
    (replaces sgl-kernel/csrc/gemm).
  - kv_quant: FP8/INT8 KV-cache write/read.
  - grammar bitmask: vocab-mask AND over logits
    (replaces apply_token_bitmask_inplace_cuda.cu).
"""
