"""int4-native q4_0 device layout (ops/qweight.py kind "q4_0_i4").

The Pallas kernel itself is TPU-only (XLA:CPU compiles S4 pathologically
slowly — minutes for a concat — so the layout is gated off CPU); these
tests cover the layout decision, byte accounting, and the conversion
semantics at the numpy level.  On-chip kernel correctness is exercised by
bench.py and was verified against a dense reference (rel err 3e-3 at
bf16 activations; see BENCH_NOTES round 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokenhawk_tpu.ops import qweight as qw


def test_layout_auto_is_packed_on_cpu(monkeypatch):
    monkeypatch.setattr(qw, "_Q4_LAYOUT", "auto")
    assert jax.default_backend() != "tpu"
    assert not qw.q4_use_i4()


def test_layout_env_force(monkeypatch):
    monkeypatch.setattr(qw, "_Q4_LAYOUT", "i4")
    assert qw.q4_use_i4()
    monkeypatch.setattr(qw, "_Q4_LAYOUT", "packed")
    assert not qw.q4_use_i4()


def test_maybe_i4_params_noop_on_cpu(monkeypatch):
    monkeypatch.setattr(qw, "_Q4_LAYOUT", "auto")
    w = qw.quantize_array(np.ones((64, 128), np.float32), "q4_0")
    out = qw.maybe_i4_params({"w": w})
    assert out["w"] is w


def test_i4_nbytes_accounting():
    """Sub-byte qs must count 0.5 B/elt (jnp int4 .nbytes reports 1)."""
    K, N = 64, 128
    packed = qw.quantize_array(np.random.default_rng(0).standard_normal((K, N)).astype(np.float32), "q4_0")
    # Construct an i4-kind QWeight without running S4 ops on CPU: the
    # accounting only needs shapes/dtypes, so use a struct-like array.
    qs4 = jnp.zeros((K, N), jnp.int4)
    full_scales = jnp.concatenate([packed.scales, packed.scales_hi], axis=0)
    w4 = qw.QWeight(qs=qs4, scales=full_scales, mins=None, scales_hi=None,
                    kind="q4_0_i4")
    assert w4.nbytes == K * N // 2 + full_scales.nbytes
    assert w4.shape == (K, N)


def test_unpack_semantics_numpy_reference():
    """The device conversion (packed byte -> two int4 rows) must invert
    pack_q4_rows exactly: low nibble = row j, high = row j + K/2."""
    rng = np.random.default_rng(1)
    K, N = 128, 64
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = qw.pack_q4_rows(q)
    lo = (packed & 0x0F).astype(np.int8) - 8
    hi = (packed.astype(np.uint8) >> 4).astype(np.int8) - 8
    np.testing.assert_array_equal(np.concatenate([lo, hi], axis=0), q)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="S4 is TPU-only")
def test_i4_kernel_matches_dense():
    from tokenhawk_tpu.ops.pallas import qmatmul as qm

    rng = np.random.default_rng(0)
    K, N, B = 512, 1024, 8
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    s = (rng.random((K // 32, N), dtype=np.float32) * 0.02 + 1e-3)
    x = (rng.random((B, K), dtype=np.float32) - 0.5).astype(np.float32)
    ref = x @ (q.astype(np.float32) * np.repeat(s, 32, axis=0))
    qd = jax.jit(lambda a: a.astype(jnp.int4))(jnp.asarray(q))
    y = qm.q4_matmul_i4(jnp.asarray(x, jnp.bfloat16), qd, jnp.asarray(s))
    err = np.abs(np.asarray(y, np.float32) - ref).max() / np.abs(ref).max()
    assert err < 2e-2
