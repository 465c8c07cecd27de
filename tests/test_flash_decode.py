"""Flash-decode kernel vs the jnp reference attention (interpreter mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.attention import attend_cache
from tokenhawk_tpu.ops.pallas.flash_decode import attend_decode, flash_decode


@pytest.mark.parametrize("B,S,Hkv,rep,Dh", [
    (1, 128, 2, 1, 64),    # MHA
    (2, 256, 2, 4, 64),    # GQA
    (3, 128, 1, 8, 128),   # MQA-ish
])
def test_flash_decode_matches_reference(rng, B, S, Hkv, rep, Dh):
    H = Hkv * rep
    q = rng.standard_normal((B, 1, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    positions = rng.integers(0, S - 1, size=(B, 1)).astype(np.int32)

    want = np.asarray(attend_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions)
    ))
    got = np.asarray(attend_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
        scale=1.0 / np.sqrt(Dh), interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_decode_full_length(rng):
    B, S, Hkv, rep, Dh = 2, 128, 2, 2, 64
    q = rng.standard_normal((B, Hkv, rep, Dh)).astype(np.float32) / np.sqrt(Dh)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    lengths = jnp.asarray([S, S // 2], jnp.int32)
    out = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), lengths, interpret=True
    ))
    # manual check for row 1 (length S//2)
    for h in range(Hkv):
        for r in range(rep):
            s = q[1, h, r] @ k[1, h, : S // 2].T
            p = np.exp(s - s.max())
            p /= p.sum()
            want = p @ v[1, h, : S // 2]
            np.testing.assert_allclose(out[1, h, r], want, atol=2e-5, rtol=1e-4)


def test_flash_decode_odd_block_sizes(rng):
    """S not divisible by the default block: falls back to smaller tiles."""
    B, S, Hkv, rep, Dh = 1, 96, 1, 2, 64  # 96 = 32*3
    q = rng.standard_normal((B, Hkv, rep, Dh)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    lengths = jnp.asarray([70], jnp.int32)
    out = np.asarray(flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), lengths, interpret=True
    ))
    s = q[0, 0] @ k[0, 0, :70].T
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = p @ v[0, 0, :70]
    np.testing.assert_allclose(out[0, 0], want, atol=2e-5, rtol=1e-4)
