import numpy as np
import pytest

from tokenhawk_tpu.ggml.format import GGMLType, QK
from tokenhawk_tpu.ggml.quants import (
    dequantize,
    from_blocks,
    quantize,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
    to_blocks,
)


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1])
def test_quant_dequant_error_bound(rng, kind):
    x = rng.standard_normal((16, 256)).astype(np.float32)
    qt = quantize(x, kind)
    y = dequantize(qt)
    assert y.shape == x.shape
    # Per-block max error bounded by half a quantization step.
    xb = x.reshape(-1, QK)
    yb = y.reshape(-1, QK)
    amax = np.abs(xb).max(axis=-1)
    if kind == GGMLType.Q8_0:
        bound = amax / 254.0 + 1e-7  # half a step of d = amax/127
    elif kind == GGMLType.Q4_0:
        # step |d| = amax/8; the positive extreme clips at code 7, so the
        # worst case is a full step, not half.
        bound = amax / 8.0 + 1e-7
    else:  # Q4_1 affine: half a step of d = span/15
        span = xb.max(axis=-1) - xb.min(axis=-1)
        bound = span / 30.0 + 1e-7
    err = np.abs(xb - yb).max(axis=-1)
    assert (err <= bound + 1e-6).all()


def test_q8_0_exact_values():
    # A block whose values are exact multiples of the scale roundtrips exactly.
    d = 0.5
    x = (np.arange(QK, dtype=np.float32) - 16) * d * (127 / 16)
    x = np.clip(x, -127 * d, 127 * d)
    qt = quantize_q8_0(x[None, :])
    y = dequantize(qt)
    np.testing.assert_allclose(y[0], x, atol=qt.scales.max() * 0.5 + 1e-7)


def test_q4_0_signed_absmax_maps_to_minus8(rng):
    x = rng.standard_normal((4, QK)).astype(np.float32)
    qt = quantize_q4_0(x)
    # The largest-magnitude element of each block hits the -8 code exactly.
    for i in range(4):
        j = np.abs(x[i]).argmax()
        assert qt.qs[i, j] == -8
        np.testing.assert_allclose(qt.qs[i, j] * qt.scales[i, 0], x[i, j], rtol=1e-6)


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1])
def test_block_serialization_roundtrip(rng, kind):
    x = rng.standard_normal((8, 128)).astype(np.float32)
    qt = quantize(x, kind)
    raw = to_blocks(qt)
    qt2 = from_blocks(kind, raw, qt.shape)
    np.testing.assert_array_equal(qt.qs, qt2.qs)
    np.testing.assert_array_equal(qt.scales, qt2.scales)
    if kind == GGMLType.Q4_1:
        np.testing.assert_array_equal(qt.mins, qt2.mins)
    np.testing.assert_allclose(dequantize(qt), dequantize(qt2))


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1])
def test_block_bytes_size(rng, kind):
    x = rng.standard_normal((2, 64)).astype(np.float32)
    qt = quantize(x, kind)
    raw = to_blocks(qt)
    assert len(raw) == qt.nbytes_packed
