"""Paged KV cache: allocator, append, gather, attention vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ops.attention import attend_cache
from tokenhawk_tpu.runtime.paged import (
    PageAllocator,
    PagedKVCache,
    append_kv,
    gather_kv,
    paged_attend_decode,
)

CFG = LlamaConfig.tiny(n_layer=2, n_head=4)  # Dh = 64
PS = 16  # page size


def test_allocator_basics():
    a = PageAllocator(8)
    p1 = a.alloc(3)
    assert len(set(p1)) == 3 and a.n_free == 5
    a.free(p1[:2])
    assert a.n_free == 7
    with pytest.raises(MemoryError):
        a.alloc(8)


def test_append_and_gather_roundtrip(rng):
    B, Hkv, Dh = 2, CFG.n_kv_head, CFG.head_dim
    cache = PagedKVCache.create(CFG, n_pages=8, page_size=PS, dtype=jnp.float32)
    # seq 0 -> pages [3, 1]; seq 1 -> pages [0, 5]
    table = jnp.asarray([[3, 1], [0, 5]], jnp.int32)

    # Append PS + 3 tokens to seq 0 and 5 tokens to seq 1, one at a time.
    n_toks = [PS + 3, 5]
    ks = {0: [], 1: []}
    vs = {0: [], 1: []}
    lengths = jnp.zeros((B,), jnp.int32)
    max_n = max(n_toks)
    for i in range(max_n):
        k_new = rng.standard_normal((B, 1, Hkv, Dh)).astype(np.float32)
        v_new = rng.standard_normal((B, 1, Hkv, Dh)).astype(np.float32)
        for b in range(B):
            if i < n_toks[b]:
                ks[b].append(k_new[b, 0])
                vs[b].append(v_new[b, 0])
        # Only advance lengths for sequences still growing (emulate mask by
        # writing everywhere but tracking lengths independently).
        grow = jnp.asarray([i < n for n in n_toks])
        cache = append_kv(cache, jnp.asarray(k_new), jnp.asarray(v_new),
                          table, lengths, jnp.int32(0))
        lengths = lengths + grow.astype(jnp.int32)

    kg, vg = gather_kv(cache, table, jnp.int32(0))
    assert kg.shape == (B, Hkv, 2 * PS, Dh)
    for b in range(B):
        got = np.asarray(kg)[b, :, : n_toks[b]]  # [Hkv, n, Dh]
        want = np.stack(ks[b], axis=1)  # [Hkv, n, Dh]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_paged_attention_matches_dense(rng):
    B, Hkv, Dh = 2, CFG.n_kv_head, CFG.head_dim
    H = CFG.n_head
    n = 20  # tokens per sequence (crosses a page boundary)
    cache = PagedKVCache.create(CFG, n_pages=6, page_size=PS, dtype=jnp.float32)
    table = jnp.asarray([[4, 2], [1, 5]], jnp.int32)

    k_all = rng.standard_normal((B, n, Hkv, Dh)).astype(np.float32)
    v_all = rng.standard_normal((B, n, Hkv, Dh)).astype(np.float32)
    lengths = jnp.zeros((B,), jnp.int32)
    for i in range(n):
        cache = append_kv(cache, jnp.asarray(k_all[:, i : i + 1]),
                          jnp.asarray(v_all[:, i : i + 1]),
                          table, lengths, jnp.int32(1))
        lengths = lengths + 1

    q = rng.standard_normal((B, 1, H, Dh)).astype(np.float32)
    got = np.asarray(paged_attend_decode(
        cache, jnp.asarray(q), table, lengths, jnp.int32(1)))

    # dense reference: head-major cache [B, Hkv, S, Dh]
    k_dense = jnp.asarray(np.swapaxes(k_all, 1, 2))
    v_dense = jnp.asarray(np.swapaxes(v_all, 1, 2))
    want = np.asarray(attend_cache(
        jnp.asarray(q), k_dense, v_dense,
        jnp.full((B, 1), n - 1, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_append_is_jittable(rng):
    B, Hkv, Dh = 1, CFG.n_kv_head, CFG.head_dim
    cache = PagedKVCache.create(CFG, n_pages=4, page_size=PS, dtype=jnp.float32)
    table = jnp.asarray([[2, 0]], jnp.int32)

    @jax.jit
    def step(cache, k, v, lengths):
        return append_kv(cache, k, v, table, lengths, jnp.int32(0))

    k = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dh)), jnp.float32)
    out = step(cache, k, k, jnp.asarray([0], jnp.int32))
    assert out.k_pages.shape == cache.k_pages.shape
