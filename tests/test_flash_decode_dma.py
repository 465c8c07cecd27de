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


def test_flash_decode_stats_partials(rng):
    """Stats variant returns mergeable softmax partials; a zero-length
    shard emits the merge identity (0, -inf, 0)."""
    import jax.numpy as jnp
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import flash_decode_stats

    B, Hkv, rep, S, Dh = 2, 2, 2, 256, 128
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, Dh)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, rep, Dh)) / Dh**0.5,
                    jnp.float32)
    lengths = jnp.asarray([100, 0], jnp.int32)

    o, m, l = flash_decode_stats(q, k, v, lengths, interpret=True)

    # normalized output for the live row matches the dense reference
    want = np.asarray(flash_decode_dma(q, k, v, lengths, interpret=True))
    got = np.asarray(o) / np.maximum(np.asarray(l)[:, :, 0:1].reshape(
        B, Hkv, rep, 1), 1e-30)
    np.testing.assert_allclose(got[0], want[0], atol=1e-5, rtol=1e-5)

    # empty shard: exact merge identity
    assert np.all(np.asarray(o)[1] == 0.0)
    assert np.all(np.asarray(m)[1] == -np.inf)
    assert np.all(np.asarray(l)[1] == 0.0)

    # l/m columns replicated
    assert np.allclose(np.asarray(l)[0, :, 0], np.asarray(l)[0, :, 17])
