import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops import (
    QWeight,
    apply_rope,
    attend_cache,
    matmul,
    quantize_array,
    rms_norm,
    rope_cos_sin,
    update_kv_cache,
)
from tokenhawk_tpu.models.reference_numpy import rms_norm_np, rope_np, softmax_np


def test_rms_norm_matches_numpy(rng):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    g = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(g)))
    want = rms_norm_np(x, g)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("style", ["interleaved", "half"])
def test_rope_matches_numpy(rng, style):
    B, T, H, Dh = 2, 5, 3, 16
    x = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    offsets = np.array([0, 7])
    positions = offsets[:, None] + np.arange(T)[None, :]
    cos, sin = rope_cos_sin(jnp.asarray(positions), Dh)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin, style))
    for b in range(B):
        want = rope_np(x[b], positions[b], style=style)
        np.testing.assert_allclose(got[b], want, atol=1e-5, rtol=1e-5)


def test_rope_preserves_norm(rng):
    x = rng.standard_normal((1, 4, 2, 32)).astype(np.float32)
    positions = jnp.asarray(np.arange(4)[None, :])
    cos, sin = rope_cos_sin(positions, 32)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )


@pytest.mark.parametrize("kind", ["q8_0", "q4_0", "q4_1"])
def test_quant_matmul_matches_dequantized(rng, kind):
    K, N = 128, 96
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((4, K)).astype(np.float32)
    qw = quantize_array(w, kind)
    got = np.asarray(matmul(jnp.asarray(x), qw))
    want = x @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_quant_matmul_batched_shapes(rng):
    K, N = 64, 32
    qw = quantize_array(rng.standard_normal((K, N)).astype(np.float32), "q8_0")
    x = jnp.asarray(rng.standard_normal((2, 3, K)).astype(np.float32))
    y = matmul(x, qw)
    assert y.shape == (2, 3, N)


def test_attend_cache_matches_numpy(rng):
    B, T, S, H, Dh = 1, 3, 8, 2, 16
    q = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, S, Dh)).astype(np.float32)  # head-major
    v = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    offset = 4  # 4 tokens of history; queries at positions 4, 5, 6
    positions = np.array([[4, 5, 6]])
    got = np.asarray(
        attend_cache(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions))
    )
    for t in range(T):
        for h in range(H):
            n_vis = offset + t + 1
            scores = (q[0, t, h] @ k[0, h, :n_vis].T) / np.sqrt(Dh)
            want = softmax_np(scores) @ v[0, h, :n_vis]
            np.testing.assert_allclose(got[0, t, h], want, atol=1e-5, rtol=1e-4)


def test_update_kv_cache_offsets(rng):
    B, S, H, Dh = 2, 8, 1, 4
    k_cache = jnp.zeros((B, H, S, Dh))
    v_cache = jnp.zeros((B, H, S, Dh))
    k_new = jnp.asarray(rng.standard_normal((B, 2, H, Dh)).astype(np.float32))
    v_new = jnp.asarray(rng.standard_normal((B, 2, H, Dh)).astype(np.float32))
    offsets = jnp.asarray([0, 3])
    kc, vc = update_kv_cache(k_cache, v_cache, k_new, v_new, offsets)
    np.testing.assert_allclose(np.asarray(kc)[0, 0, 0:2],
                               np.asarray(k_new)[0, :, 0])
    np.testing.assert_allclose(np.asarray(kc)[1, 0, 3:5],
                               np.asarray(k_new)[1, :, 0])
    assert np.asarray(kc)[0, 0, 2:].sum() == 0
    assert np.asarray(vc)[1, 0, :3].sum() == 0
