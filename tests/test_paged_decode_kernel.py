"""Paged flash-decode kernel vs the XLA gather reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.config import LlamaConfig
from tokenhawk_tpu.ops.pallas.paged_decode import paged_flash_decode
from tokenhawk_tpu.runtime.paged import (
    PagedKVCache,
    append_kv,
    paged_attend_decode,
)

CFG = LlamaConfig.tiny(n_layer=1, n_head=4)  # Dh=64
PS = 128


@pytest.mark.parametrize("rep_heads", [(4, 1), (2, 2)])
def test_paged_kernel_matches_gather_reference(rng, rep_heads):
    Hkv, rep = rep_heads  # Hkv * rep == n_head == 4
    cfg = LlamaConfig.tiny(n_layer=1, n_head=4, n_kv_head=Hkv)
    Dh = cfg.head_dim
    B = 2
    n_toks = [PS + 40, 70]  # one crosses a page boundary

    cache = PagedKVCache.create(cfg, n_pages=6, page_size=PS, dtype=jnp.float32)
    table = jnp.asarray([[5, 2], [1, 3]], jnp.int32)
    lengths = jnp.zeros((B,), jnp.int32)
    for i in range(max(n_toks)):
        k = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dh)), jnp.float32)
        cache = append_kv(cache, k, v, table, lengths, jnp.int32(0))
        lengths = lengths + jnp.asarray([i < n for n in n_toks])

    H = cfg.n_head
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.float32)
    want = np.asarray(paged_attend_decode(cache, q, table, lengths, jnp.int32(0)))

    from tokenhawk_tpu.runtime.paged import _contig

    qg = (q[:, 0] / np.sqrt(Dh)).reshape(B, Hkv, rep, Dh)
    got = np.asarray(paged_flash_decode(
        qg, cache.k_pages[0], cache.v_pages[0], table, lengths,
        contig=_contig(), interpret=True
    )).reshape(B, 1, H, Dh)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_gather_pages_dense_matches_fancy_index():
    """Page-gather kernels (ops/pallas/paged_decode.py): the direct
    page-DMA materialization must equal the jnp fancy-index gather,
    bf16 and int8 (payloads + scale pages)."""
    import numpy as np

    from tokenhawk_tpu.ops.pallas.paged_decode import (
        gather_pages_dense,
        gather_pages_dense_int8,
    )

    rng = np.random.default_rng(5)
    Hkv, npg, ps, Dh, B, mp = 4, 9, 128, 128, 3, 4
    kp = jnp.asarray(rng.normal(size=(Hkv, npg, ps, Dh)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(Hkv, npg, ps, Dh)), jnp.float32)
    table = jnp.asarray(rng.integers(0, npg, (B, mp)), jnp.int32)

    def want(pages):
        return np.swapaxes(np.asarray(pages)[:, np.asarray(table)], 0, 1
                           ).reshape(B, Hkv, mp * ps, Dh)

    kg, vg = gather_pages_dense(kp, vp, table, interpret=True)
    np.testing.assert_array_equal(np.asarray(kg), want(kp))
    np.testing.assert_array_equal(np.asarray(vg), want(vp))

    k8 = jnp.asarray(rng.integers(-127, 127, (Hkv, npg, ps, Dh)), jnp.int8)
    ks = jnp.asarray(rng.normal(size=(Hkv, npg, ps)), jnp.float32)
    kq, ksq, vq, vsq = gather_pages_dense_int8(k8, ks, k8, ks, table,
                                               interpret=True)
    np.testing.assert_array_equal(np.asarray(kq), want(k8))
    np.testing.assert_array_equal(
        np.asarray(ksq),
        np.swapaxes(np.asarray(ks)[:, np.asarray(table)], 0, 1
                    ).reshape(B, Hkv, mp * ps))


def test_paged_append_rows_matches_dus():
    """paged_append_rows (aliased slab RMW) == the jnp dus append,
    including two sequences writing the same page (trash-page case)."""
    import numpy as np

    from tokenhawk_tpu.ops.pallas.paged_decode import paged_append_rows

    rng = np.random.default_rng(6)
    Hkv, npg, ps, Dh, B = 4, 6, 16, 128, 3
    pool = jnp.asarray(rng.normal(size=(Hkv, npg, ps, Dh)), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, Hkv, Dh)), jnp.float32)
    page = jnp.asarray([1, 4, 1], jnp.int32)
    slot = jnp.asarray([3, 9, 5], jnp.int32)
    out = paged_append_rows(pool, new, page, slot, interpret=True)
    want = np.asarray(pool).copy()
    for b in range(B):
        want[:, int(page[b]), int(slot[b]), :] = np.asarray(new[b])
    np.testing.assert_array_equal(np.asarray(out), want)


def test_paged_append_scales_matches_dus():
    """int8 scale-page append kernel (whole page-row RMW) == jnp dus."""
    import numpy as np

    from tokenhawk_tpu.ops.pallas.paged_decode import paged_append_scales

    rng = np.random.default_rng(7)
    Hkv, npg, ps, B = 4, 6, 128, 3
    sp = jnp.asarray(rng.normal(size=(Hkv, npg, ps)), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, Hkv)), jnp.float32)
    page = jnp.asarray([1, 4, 1], jnp.int32)
    slot = jnp.asarray([3, 99, 5], jnp.int32)
    out = paged_append_scales(sp, new, page, slot, interpret=True)
    want = np.asarray(sp).copy()
    for b in range(B):
        want[:, int(page[b]), int(slot[b])] = np.asarray(new[b])
    np.testing.assert_array_equal(np.asarray(out), want)

@pytest.mark.parametrize("rep_heads", [(4, 1), (2, 2)])
def test_paged_walk_kernel_matches_grid(rng, rep_heads):
    """paged_flash_decode_walk (multi-slot flattened walk) must equal
    the grid-per-slot kernel on ragged lengths, including an empty-ish
    slot (1 token) and a multi-page one."""
    from tokenhawk_tpu.ops.pallas.paged_decode import paged_flash_decode_walk

    Hkv, rep = rep_heads
    cfg = LlamaConfig.tiny(n_layer=1, n_head=4, n_kv_head=Hkv)
    Dh = cfg.head_dim
    B = 4
    n_toks = [PS + 40, 70, 1, 2 * PS]

    cache = PagedKVCache.create(cfg, n_pages=10, page_size=PS,
                                dtype=jnp.float32)
    table = jnp.asarray(
        [[5, 2, 0], [1, 0, 0], [3, 0, 0], [4, 6, 0]], jnp.int32)
    lengths = jnp.zeros((B,), jnp.int32)
    for i in range(max(n_toks)):
        k = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dh)), jnp.float32)
        cache = append_kv(cache, k, v, table, lengths, jnp.int32(0))
        lengths = lengths + jnp.asarray([i < n for n in n_toks])

    from tokenhawk_tpu.runtime.paged import _contig

    H = cfg.n_head
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.float32)
    qg = (q[:, 0] / np.sqrt(Dh)).reshape(B, Hkv, rep, Dh)
    want = np.asarray(paged_flash_decode(
        qg, cache.k_pages[0], cache.v_pages[0], table, lengths,
        contig=_contig(), interpret=True,
    ))
    got = np.asarray(paged_flash_decode_walk(
        qg, cache.k_pages[0], cache.v_pages[0], table, lengths,
        contig=_contig(), interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
