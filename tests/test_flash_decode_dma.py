"""Length-aware DMA flash-decode vs the jnp reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.attention import attend_cache
from tokenhawk_tpu.ops.pallas.flash_decode_dma import flash_decode_dma


@pytest.mark.parametrize("B,S,Hkv,rep,Dh,hb", [
    (2, 256, 2, 2, 64, 2),
    (1, 128, 4, 1, 64, 4),
    (2, 512, 2, 4, 128, 1),
])
def test_dma_decode_matches_reference(rng, B, S, Hkv, rep, Dh, hb):
    H = Hkv * rep
    q = rng.standard_normal((B, 1, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    positions = rng.integers(0, S - 1, size=(B, 1)).astype(np.int32)

    want = np.asarray(attend_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions)))

    qg = (q[:, 0] / np.sqrt(Dh)).reshape(B, Hkv, rep, Dh)
    got = np.asarray(flash_decode_dma(
        jnp.asarray(qg), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(positions[:, 0] + 1), head_block=hb, interpret=True,
    )).reshape(B, 1, H, Dh)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
