"""Paged KV host-side machinery: the free-list page allocator.

The device-side paged cache pytree and scatter/gather helpers live in
metalchat_tpu.cache (with the other cache types); this module holds the
host-side allocator the continuous-batching engine drives. See
cache.PagedKVCache for the design notes.
"""

from __future__ import annotations

from typing import List

from metalchat_tpu.cache import (  # noqa: F401  (re-exports for engine users)
    PagedKVCache,
    gather_pages_dense,
    positions_to_pages,
    write_paged_layer,
)


class PageAllocator:
    """Host-side free-list page allocator (slot-level accounting)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, -1, -1))
        self._owned: dict[int, List[int]] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_allocate(self, n: int) -> bool:
        return len(self._free) >= n

    def allocate(self, slot: int, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(f"out of KV pages (want {n}, free {len(self._free)})")
        pages = [self._free.pop() for _ in range(n)]
        self._owned.setdefault(slot, []).extend(pages)
        return pages

    def free_slot(self, slot: int) -> None:
        self._free.extend(reversed(self._owned.pop(slot, [])))
