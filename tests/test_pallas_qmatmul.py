"""Pallas fused dequant+matmul kernels, run in interpreter mode on CPU.

On TPU the same kernels compile natively; bench.py exercises that path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.qweight import quantize_array
from tokenhawk_tpu.ops.pallas.qmatmul import q4_matmul, q8_matmul, quant_matmul


@pytest.mark.parametrize("B,K,N", [(8, 128, 256), (8, 256, 128), (16, 512, 384)])
def test_q8_matmul_matches_dequant(rng, B, K, N):
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    qw = quantize_array(w, "q8_0")
    got = np.asarray(q8_matmul(jnp.asarray(x), qw.qs, qw.scales, interpret=True))
    want = x @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("B,K,N", [(8, 128, 256), (8, 256, 128), (16, 512, 384)])
def test_q4_matmul_matches_dequant(rng, B, K, N):
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    qw = quantize_array(w, "q4_0")
    assert qw.qs.shape == (K // 2, N) and qw.qs.dtype == jnp.uint8
    got = np.asarray(q4_matmul(jnp.asarray(x), qw.qs, qw.scales, qw.scales_hi, interpret=True))
    want = x @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_quant_matmul_pads_small_batch(rng):
    K, N = 128, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    qw = quantize_array(w, "q8_0")
    x = rng.standard_normal((3, K)).astype(np.float32)  # B=3 -> padded to 8
    got = np.asarray(quant_matmul(jnp.asarray(x), qw, interpret=True))
    want = x @ np.asarray(qw.dequantize())
    assert got.shape == (3, N)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_quant_matmul_leading_dims(rng):
    K, N = 128, 128
    qw = quantize_array(rng.standard_normal((K, N)).astype(np.float32), "q8_0")
    x = rng.standard_normal((2, 4, K)).astype(np.float32)
    got = np.asarray(quant_matmul(jnp.asarray(x), qw, interpret=True))
    assert got.shape == (2, 4, N)
    want = x.reshape(-1, K) @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got.reshape(-1, N), want, atol=2e-3, rtol=2e-3)


def test_bf16_inputs(rng):
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    qw = quantize_array(w, "q4_0")
    x = rng.standard_normal((8, K)).astype(np.float32)
    got = np.asarray(
        q4_matmul(jnp.asarray(x, jnp.bfloat16), qw.qs, qw.scales, qw.scales_hi, interpret=True)
    ).astype(np.float32)
    want = x @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


def test_xla_fallback_matches_pallas(rng):
    """The packed q4 layout dequantizes identically via both paths."""
    from tokenhawk_tpu.ops.linear import _matmul_quant

    K, N = 128, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    qw = quantize_array(w, "q4_0")
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    a = np.asarray(_matmul_quant(x, qw))
    b = np.asarray(q4_matmul(x, qw.qs, qw.scales, qw.scales_hi, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("kind", ["q8_0", "q4_0", "q4_0_i4"])
@pytest.mark.parametrize("B", [1, 16])
def test_fused_norm_matches_separate(rng, kind, B):
    """quant_matmul(x, qw, gain) == rms_norm(x, gain) @ dequant(qw).

    The in-kernel RMSNorm skips the intermediate bf16 rounding the
    separate form pays, so compare against the f32 norm reference.
    """
    from tokenhawk_tpu.ops.norms import rms_norm
    from tokenhawk_tpu.ops.qweight import q4_packed_to_i4

    K, N = 256, 384
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    gain = (1.0 + 0.1 * rng.standard_normal(K)).astype(np.float32)
    qw = quantize_array(w, "q4_0" if kind == "q4_0_i4" else kind)
    if kind == "q4_0_i4":
        qw = q4_packed_to_i4(qw)
    got = np.asarray(quant_matmul(
        jnp.asarray(x), qw, jnp.asarray(gain), interpret=True))
    xn = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(gain)))
    want = xn @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_fused_norm_k_tiled_fallback(rng):
    """K larger than one tile falls back to the outside norm (still
    correct)."""
    from tokenhawk_tpu.ops.norms import rms_norm

    B, K, N = 8, 512, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    gain = np.ones(K, np.float32)
    qw = quantize_array(w, "q8_0")
    got = np.asarray(q8_matmul(
        jnp.asarray(x), qw.qs, qw.scales, jnp.asarray(gain),
        block_k=256, interpret=True))
    xn = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(gain)))
    want = xn @ np.asarray(qw.dequantize())
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
