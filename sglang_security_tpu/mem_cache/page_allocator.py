"""Host-side KV page allocator.

Capability parity with the reference's ``TokenToKVPoolAllocator`` /
``PagedTokenToKVPoolAllocator`` (``srt/mem_cache/memory_pool.py:169``,
``paged_allocator.py``), simplified to pure page granularity: the TPU KV
pool is always paged (pages are the DMA unit of the attention kernel), so
there is no token-granular free list.  All state is numpy on the host —
allocation never touches the device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class PageAllocator:
    """LIFO free-list allocator over ``num_pages`` physical KV pages.

    Page 0 is reserved as the null page: padded page-table slots point at
    it so kernel DMAs always hit valid memory.
    """

    def __init__(self, num_pages: int, page_size: int):
        assert num_pages > 1
        self.num_pages = num_pages
        self.page_size = page_size
        self._free = list(range(num_pages - 1, 0, -1))  # pop() yields 1,2,3...
        self._allocated = 0

    @property
    def available_pages(self) -> int:
        return len(self._free)

    def available_tokens(self) -> int:
        return len(self._free) * self.page_size

    def alloc(self, n_pages: int) -> Optional[np.ndarray]:
        if n_pages > len(self._free):
            return None
        if n_pages == 0:
            return np.empty(0, dtype=np.int32)
        out = np.array(
            [self._free.pop() for _ in range(n_pages)], dtype=np.int32
        )
        self._allocated += n_pages
        return out

    def alloc_tokens(self, n_tokens: int) -> Optional[np.ndarray]:
        return self.alloc(-(-n_tokens // self.page_size))

    def free(self, pages) -> None:
        pages = np.asarray(pages, dtype=np.int32).reshape(-1)
        if len(pages) == 0:
            return
        if __debug__:
            s = set(int(p) for p in pages)
            assert 0 not in s, "freeing the reserved null page"
            assert len(s) == len(pages), "double free within one call"
            assert not (s & set(self._free)), "double free"
        self._free.extend(int(p) for p in pages)
        self._allocated -= len(pages)

    def clear(self) -> None:
        self._free = list(range(self.num_pages - 1, 0, -1))
        self._allocated = 0

    def check_balance(self) -> bool:
        """Leak check (analog of reference scheduler.check_memory)."""
        return self._allocated == 0 and len(self._free) == self.num_pages - 1
