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

    qg = (q[:, 0] / np.sqrt(Dh)).reshape(B, Hkv, rep, Dh)
    got = np.asarray(paged_flash_decode(
        qg, cache.k_pages[0], cache.v_pages[0], table, lengths, interpret=True
    )).reshape(B, 1, H, Dh)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
