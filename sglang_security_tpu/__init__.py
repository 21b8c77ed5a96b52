"""sglang_security_tpu: a TPU-native LLM serving engine.

A from-scratch re-design (not a port) of the capability set of SGLang
v0.4.6 + the SafeKV privacy-aware KV-cache fork (kexinchu/sglang-security),
built on JAX / XLA / Pallas / pjit.

Architecture stance (see SURVEY.md §7):
  - one process per host; TP/EP/PP are mesh axes + NamedSharding, not ranks
  - static shapes everywhere; bucketed (batch, tokens) paddings replace
    CUDA graphs
  - KV cache = paged jnp buffers in HBM addressed by device page tables;
    the radix tree / allocator are host-side (pure CPU logic)
  - hot ops (paged attention, quantized matmul, grammar mask) are Pallas
    kernels; everything else rides XLA fusion
"""

from sglang_security_tpu.version import __version__
from sglang_security_tpu.global_epoch import global_epoch

__all__ = ["__version__", "global_epoch"]
