"""Flash-attention prefill kernel vs jnp reference (interpreter mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.attention import attend_cache
from tokenhawk_tpu.ops.pallas.flash_attention import attend_prefill


@pytest.mark.parametrize("B,T,S,Hkv,rep,Dh", [
    (1, 16, 64, 2, 1, 64),     # MHA fresh prefill
    (2, 32, 128, 2, 2, 64),    # GQA
    (1, 16, 128, 1, 4, 128),
])
def test_prefill_matches_reference(rng, B, T, S, Hkv, rep, Dh):
    H = Hkv * rep
    q = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    offsets = rng.integers(0, S - T, size=(B,)).astype(np.int32)
    positions = offsets[:, None] + np.arange(T)[None, :]

    want = np.asarray(attend_cache(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions)
    ))
    got = np.asarray(attend_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
        scale=1.0 / np.sqrt(Dh), interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_prefill_zero_offset_causality(rng):
    """First token attends only to itself."""
    B, T, S, Hkv, rep, Dh = 1, 8, 32, 1, 1, 64
    q = rng.standard_normal((B, T, Hkv * rep, Dh)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, Dh)).astype(np.float32)
    positions = np.arange(T)[None, :].astype(np.int32)
    got = np.asarray(attend_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
        scale=1.0, interpret=True,
    ))
    np.testing.assert_allclose(got[0, 0, 0], v[0, 0, 0], atol=1e-5, rtol=1e-5)
