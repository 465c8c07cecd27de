"""Native (C++) host kernels vs the numpy reference implementations.

These tests run against libthawk_native.so when built (make -C native)
and degrade to validating the fallbacks against themselves otherwise.
"""

import numpy as np
import pytest

from tokenhawk_tpu.ggml import native
from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.quants import from_blocks, quantize_q4_0, quantize_q8_0, to_blocks


def test_f16_to_f32_exact(rng):
    x = rng.standard_normal((64, 32)).astype(np.float16)
    got = native.f16_to_f32(x)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_f16_to_f32_specials():
    x = np.array([0.0, -0.0, np.inf, -np.inf, 6.1e-5, 5.96e-8, 65504.0],
                 np.float16)
    got = native.f16_to_f32(x)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_q8_decode_transpose_matches_numpy(rng):
    rows, cols = 24, 96
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = to_blocks(quantize_q8_0(x))
    qs, scales = native.q8_decode_transpose(raw, rows, cols)
    qt = from_blocks(GGMLType.Q8_0, raw, (rows, cols))
    np.testing.assert_array_equal(qs, qt.qs.T)
    np.testing.assert_allclose(scales, qt.scales.T)


def test_q4_decode_transpose_pack_matches_numpy(rng):
    rows, cols = 16, 128
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    raw = to_blocks(quantize_q4_0(x))
    packed, scales = native.q4_decode_transpose_pack(raw, rows, cols)
    qt = from_blocks(GGMLType.Q4_0, raw, (rows, cols))
    qs_t = qt.qs.T.astype(np.int16) + 8
    want = (qs_t[: cols // 2] | (qs_t[cols // 2 :] << 4)).astype(np.uint8)
    np.testing.assert_array_equal(packed, want)
    np.testing.assert_allclose(scales, qt.scales.T)


def test_q8_encode_matches_numpy_exactly(rng):
    # Both paths round half-even, so the SAME tensor must produce the
    # SAME codes whether or not the .so loads (reproducible model files).
    x = rng.standard_normal((8, 64)).astype(np.float32)
    raw = native.q8_encode(x)
    want = to_blocks(quantize_q8_0(x))
    qt_a = from_blocks(GGMLType.Q8_0, raw, x.shape)
    qt_b = from_blocks(GGMLType.Q8_0, want, x.shape)
    np.testing.assert_allclose(qt_a.scales, qt_b.scales, rtol=1e-6)
    np.testing.assert_array_equal(qt_a.qs, qt_b.qs)


def test_q8_encode_half_even_ties(rng):
    # Values engineered to land exactly on .5 quantization boundaries:
    # absmax 127 -> d = 1.0 -> v = x exactly; 2.5 rounds to 2, 3.5 to 4.
    x = np.zeros((1, 32), np.float32)
    x[0, 0] = 127.0
    x[0, 1:9] = [0.5, 1.5, 2.5, 3.5, -0.5, -1.5, -2.5, -3.5]
    raw = native.q8_encode(x)
    want = to_blocks(quantize_q8_0(x))
    qt_a = from_blocks(GGMLType.Q8_0, raw, x.shape)
    qt_b = from_blocks(GGMLType.Q8_0, want, x.shape)
    np.testing.assert_array_equal(qt_a.qs, qt_b.qs)
    np.testing.assert_array_equal(qt_a.qs[0, 1:9], [0, 2, 2, 4, 0, -2, -2, -4])


def test_q4_encode_matches_numpy_exactly(rng):
    x = rng.standard_normal((8, 64)).astype(np.float32)
    raw = native.q4_encode(x)
    want = to_blocks(quantize_q4_0(x))
    qt_a = from_blocks(GGMLType.Q4_0, raw, x.shape)
    qt_b = from_blocks(GGMLType.Q4_0, want, x.shape)
    np.testing.assert_allclose(qt_a.scales, qt_b.scales, rtol=1e-6)
    np.testing.assert_array_equal(qt_a.qs, qt_b.qs)


def test_f16_to_bf16_transpose(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((16, 8)).astype(np.float16)
    got = native.f16_to_bf16_transpose(x)
    want = np.asarray(jnp.asarray(x.T.astype(np.float32), jnp.bfloat16)).view(np.uint16)
    np.testing.assert_array_equal(got, want)


def test_native_lib_is_loaded():
    # The build is part of the repo; CI and the bench expect it present.
    assert native.available(), "libthawk_native.so missing — run `make -C native`"
