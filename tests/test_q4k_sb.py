"""Q4_K SUPER-BLOCK device layout (q4k_sb): 4.63 bpw vs the flat
affine form's 5.0.

The flat qk_i4 form expands Q4_K's two-level quantization (per-256 f16
d/dmin x per-32 6-bit sc/mn) into per-32 bf16 scale+bias at load time —
paying 2x2 B per 32 weights of side traffic.  The sb layout keeps the
levels separate on device (int4 codes + int8 sc|mn + per-256 f16
d/dmin) and the kernel expands s = d*sc, b = 8s - dmin*mn per tile (two
sublane-broadcast multiplies).  These tests pin:
  - codec: extract_q4_k_sb reconstructs exactly what dequant_q4_k does
  - QWeight: from_kquant_raw(..., use_i4=True) produces q4k_sb whose
    dequantize() bit-matches the host codec
  - kernel: qk_sb_matmul == x @ dequantize (interpret mode)
  - fused FFN: sb13 w13 + flat w2 matches the unfused reference
  - to_qk16: exact re-encode (for mixed-kind layer stacking)
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# sb is a measured NEGATIVE result on v5e (default off); the tests pin
# its correctness for re-evaluation.
os.environ["THAWK_Q4K_SB"] = "1"

from tokenhawk_tpu.ggml.format import GGMLType
from tokenhawk_tpu.ggml.kquants import (
    QK_K,
    dequant_q4_k,
    extract_q4_k_sb,
    quantize_q4_k,
)
from tokenhawk_tpu.ops.qweight import from_kquant_raw, to_qk16


def _sb_weight(rng, out_dim, in_dim, scale=0.05):
    raw = quantize_q4_k(
        (rng.standard_normal(out_dim * in_dim) * scale).astype(np.float32))
    w = from_kquant_raw(GGMLType.Q4_K, raw, (out_dim, in_dim), use_i4=True)
    return raw, w


def test_extract_sb_matches_dequant(rng):
    n = 4 * QK_K
    raw = quantize_q4_k(rng.standard_normal(n).astype(np.float32))
    codes, sc, mn, d, dmin = extract_q4_k_sb(raw, n)
    sb = np.repeat(np.arange(n // QK_K), QK_K)
    g = np.repeat(np.arange(n // 32), 32)
    y = (d[sb] * sc[g]) * codes.astype(np.float32) - (dmin[sb] * mn[g])
    np.testing.assert_array_equal(y, dequant_q4_k(raw, n))


def test_from_kquant_raw_sb_kind_and_gate(rng):
    # in_dim % 1024 == 0 -> sb layout
    _, w = _sb_weight(rng, 8, 1024)
    assert w.kind == "q4k_sb"
    assert w.qs.dtype == jnp.int4
    assert w.scales_hi.dtype == jnp.int8
    assert w.scales_hi.shape == (2 * (1024 // 32), 8)
    # misaligned in_dim falls back to the flat form
    _, w2 = _sb_weight(rng, 8, 2 * QK_K)
    assert w2.kind == "qk_i4"
    # sb_ok=False forces flat regardless
    raw = quantize_q4_k(rng.standard_normal(8 * 1024).astype(np.float32))
    w3 = from_kquant_raw(GGMLType.Q4_K, raw, (8, 1024), use_i4=True,
                         sb_ok=False)
    assert w3.kind == "qk_i4"


def test_sb_dequantize_bit_exact(rng):
    out_dim, in_dim = 8, 1024
    raw, w = _sb_weight(rng, out_dim, in_dim)
    host = dequant_q4_k(raw, out_dim * in_dim).reshape(out_dim, in_dim)
    dev = np.asarray(w.dequantize(), np.float32)  # [in, out]
    np.testing.assert_array_equal(dev, host.T)


def test_sb_matches_flat_affine(rng):
    """sb dequant == the flat qk_i4 dequant of the same bytes (both are
    exact reconstructions; pins the two layouts to one another)."""
    out_dim, in_dim = 16, 1024
    raw, w = _sb_weight(rng, out_dim, in_dim)
    flat = from_kquant_raw(GGMLType.Q4_K, raw, (out_dim, in_dim),
                           use_i4=True, sb_ok=False)
    np.testing.assert_array_equal(
        np.asarray(w.dequantize(), np.float32),
        np.asarray(flat.dequantize(), np.float32))


def test_qk_sb_matmul_interpret(rng):
    from tokenhawk_tpu.ops.pallas.qmatmul import quant_matmul

    out_dim, in_dim = 384, 1024
    _, w = _sb_weight(rng, out_dim, in_dim)
    assert w.kind == "q4k_sb"
    x = jnp.asarray(rng.standard_normal((3, in_dim)), jnp.bfloat16)
    y = quant_matmul(x, w, interpret=True)
    ref = np.asarray(x, np.float32) @ np.asarray(w.dequantize(), np.float32)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), ref, atol=2e-2, rtol=2e-2)


def test_qk_sb_matmul_fused_norm(rng):
    from tokenhawk_tpu.ops.norms import rms_norm
    from tokenhawk_tpu.ops.pallas.qmatmul import quant_matmul

    out_dim, in_dim = 256, 1024
    _, w = _sb_weight(rng, out_dim, in_dim)
    gain = jnp.asarray(1.0 + 0.1 * rng.standard_normal(in_dim), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, in_dim)), jnp.bfloat16)
    y = quant_matmul(x, w, gain, interpret=True)
    xn = rms_norm(x, gain)
    ref = np.asarray(xn, np.float32) @ np.asarray(w.dequantize(), np.float32)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), ref, atol=2e-2, rtol=2e-2)


def test_fused_ffn_sb13(rng, monkeypatch):
    """Fused gated-FFN with a q4k_sb w13 and a flat (qk_i4) w2 matches
    the unfused reference computation."""
    import tokenhawk_tpu.ops.pallas.ffn as ffn_mod
    from tokenhawk_tpu.ops.norms import rms_norm

    monkeypatch.setattr(ffn_mod, "_FFN_ENABLED", True)
    monkeypatch.setattr(ffn_mod, "BLOCK_F", 256)
    D, F = 1024, 512
    _, w13 = _sb_weight(rng, 2 * F, D)
    assert w13.kind == "q4k_sb"
    raw2 = quantize_q4_k(
        (rng.standard_normal(D * F) * 0.05).astype(np.float32))
    w2 = from_kquant_raw(GGMLType.Q4_K, raw2, (D, F), use_i4=True,
                         sb_ok=False)
    assert w2.kind == "qk_i4"
    assert ffn_mod.can_fuse_ffn(w13, w2, rows=1)

    gain = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, D)) * 0.5, jnp.bfloat16)
    y = ffn_mod.fused_ffn(x, w13, w2, gain, interpret=True)

    xn = np.asarray(rms_norm(x, gain), np.float32)
    wd13 = np.asarray(w13.dequantize(), np.float32)
    wd2 = np.asarray(w2.dequantize(), np.float32)
    g = xn @ wd13[:, :F]
    u = xn @ wd13[:, F:]
    h = g / (1.0 + np.exp(-g)) * u
    ref = np.asarray(x, np.float32) + h @ wd2
    np.testing.assert_allclose(
        np.asarray(y, np.float32), ref, atol=3e-2, rtol=3e-2)


def test_fused_ffn_rejects_sb_w2(rng):
    from tokenhawk_tpu.ops.pallas.ffn import can_fuse_ffn

    D, F = 1024, 1024
    _, w13 = _sb_weight(rng, 2 * F, D)
    _, w2 = _sb_weight(rng, D, F)
    assert w2.kind == "q4k_sb"
    assert not can_fuse_ffn(w13, w2, rows=1)


def test_to_qk16_sb_exact(rng):
    out_dim, in_dim = 8, 1024
    raw, w = _sb_weight(rng, out_dim, in_dim)
    w16 = to_qk16(w)
    assert w16.kind == "qk_i8" and w16.group == 16
    np.testing.assert_array_equal(
        np.asarray(w.dequantize(), np.float32),
        np.asarray(w16.dequantize(), np.float32))
