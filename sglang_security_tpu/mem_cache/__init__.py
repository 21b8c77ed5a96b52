"""Memory and prefix-cache layer (host-side logic + device KV pool).

Re-creates the reference's ``srt/mem_cache/`` capability set
(memory_pool.py, radix_cache.py + SafeKV fork, paged_allocator.py,
chunk_cache.py) with a TPU-first split: the radix tree and page allocator
are pure host Python/numpy; the KV cache itself is a pair of sharded jnp
page arrays in HBM, updated functionally inside the jitted forward step.
"""

from sglang_security_tpu.mem_cache.page_allocator import PageAllocator
from sglang_security_tpu.mem_cache.kv_pool import KVCachePool
from sglang_security_tpu.mem_cache.radix_cache import RadixCache, MatchResult
from sglang_security_tpu.mem_cache.chunk_cache import ChunkCache
from sglang_security_tpu.mem_cache.tree_node import TreeNode
