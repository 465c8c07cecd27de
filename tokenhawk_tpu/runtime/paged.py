"""Paged KV cache: virtual-memory block allocation for KV state.

The dense per-slot cache (`KVCache`) reserves max_seq for every slot;
under continuous batching with mixed sequence lengths that wastes HBM.
The paged cache allocates fixed-size pages on demand and maps them
through a per-sequence page table — the vLLM/paged-attention design,
realized TPU-style:

  k_pages / v_pages : [L, Hkv, n_pages, page_size, Dh]
  page_table        : [B, max_pages]  int32 physical page ids
  lengths           : [B]             tokens currently stored

Appends write through `jax.lax.dynamic_update_slice` at (physical page,
in-page offset); decode attention gathers the sequence's pages.  The
XLA path materializes the gather (portable, tested everywhere); the
Pallas path (ops/pallas/paged_decode.py) streams pages HBM->VMEM with
double-buffered async DMA.

Host-side page allocation is a free list (`PageAllocator`), owned by the
scheduler.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.config import LlamaConfig


class PagedKVCache(NamedTuple):
    k_pages: jax.Array  # [L, Hkv, n_pages, page_size, Dh]
    v_pages: jax.Array

    @staticmethod
    def create(cfg: LlamaConfig, n_pages: int, page_size: int = 128,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.n_layer, cfg.n_kv_head, n_pages, page_size, cfg.head_dim)
        return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[2]


class PageAllocator:
    """Host-side free-list allocator over physical pages."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages - 1, -1, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self, n: int = 1) -> List[int]:
        if n > len(self._free):
            raise MemoryError(f"paged KV: need {n} pages, {len(self._free)} free")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if p < 0 or p >= self.n_pages:
                raise ValueError(f"bad page id {p}")
            self._free.append(p)


def append_kv(
    cache: PagedKVCache,
    k_new: jax.Array,  # [B, T, Hkv, Dh]
    v_new: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] tokens already stored (write offsets)
    layer: jax.Array,  # scalar layer index
) -> PagedKVCache:
    """Append a token block for each sequence into its mapped pages.

    T must not cross more pages than the table covers; each (b, t) write
    lands at page page_table[b, (lengths[b]+t) // ps], slot (..) % ps.
    One dynamic_update_slice per (b, t) — decode (T=1) is the hot case.
    """
    B, T, Hkv, Dh = k_new.shape
    ps = cache.page_size
    k_pages, v_pages = cache.k_pages, cache.v_pages
    for t in range(T):  # static unroll (T is 1 for decode, small for prefill)
        pos = lengths + t
        page = jnp.take_along_axis(page_table, (pos // ps)[:, None], axis=1)[:, 0]
        slot = pos % ps
        k_pages = _batched_write(k_pages, k_new[:, t], page, slot, layer)
        v_pages = _batched_write(v_pages, v_new[:, t], page, slot, layer)
    return PagedKVCache(k_pages, v_pages)


def _batched_write(pages, new, page, slot, layer):
    """Scatter [B, Hkv, Dh] rows into pages at (layer, :, page[b], slot[b])."""
    B = new.shape[0]

    def body(b, pages):
        return jax.lax.dynamic_update_slice(
            pages,
            new[b].astype(pages.dtype)[None, :, None, None, :],
            (layer, 0, page[b], slot[b], 0),
        )

    return jax.lax.fori_loop(0, B, body, pages)


def gather_kv(
    cache: PagedKVCache,
    page_table: jax.Array,  # [B, max_pages]
    layer: jax.Array,
):
    """Materialize [B, Hkv, max_pages*ps, Dh] views (XLA reference path)."""
    k = cache.k_pages[layer]  # [Hkv, n_pages, ps, Dh]
    v = cache.v_pages[layer]
    kg = jnp.swapaxes(k[:, page_table], 0, 1)  # [B, Hkv, max_pages, ps, Dh]
    vg = jnp.swapaxes(v[:, page_table], 0, 1)
    B, Hkv, mp, ps, Dh = kg.shape
    return kg.reshape(B, Hkv, mp * ps, Dh), vg.reshape(B, Hkv, mp * ps, Dh)


def paged_attend_decode(
    cache: PagedKVCache,
    q: jax.Array,  # [B, 1, H, Dh]
    page_table: jax.Array,
    lengths: jax.Array,  # [B] number of valid tokens (incl. current)
    layer: jax.Array,
    scale: Optional[float] = None,
):
    """Decode attention over the paged cache (XLA gather fallback)."""
    from tokenhawk_tpu.ops.attention import attend_cache

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    k, v = gather_kv(cache, page_table, layer)
    positions = (lengths - 1)[:, None]
    return attend_cache(q, k, v, positions, scale=scale)
