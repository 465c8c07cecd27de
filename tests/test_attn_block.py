"""Fused attention block kernel (ops/pallas/attn_block.py).

The kernel fuses append + attend + Wo + residual for one decode token.
It is OFF by default (THAWK_FUSED_ATTN=0: the separate-kernel form
measured faster on v5e because XLA's MSA prefetches Wo slices across
layer boundaries) but stays correct and selectable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tokenhawk_tpu.ops.pallas.attn_block import (
    can_fuse_attn_out,
    fused_attn_out,
)
from tokenhawk_tpu.ops.qweight import quantize_array

H, Dh, S, D = 2, 128, 512, 256
Dq = H * Dh


def _reference(x, q, kn, vn, kc, vc, len_old, wo):
    kref = np.asarray(kc, np.float32)
    vref = np.asarray(vc, np.float32)
    kref[0, :, len_old] = np.asarray(kn, np.float32)[0, 0]
    vref[0, :, len_old] = np.asarray(vn, np.float32)[0, 0]
    qf = np.asarray(q, np.float32)[0, 0] / np.sqrt(Dh)
    ctx = np.zeros((H, Dh), np.float32)
    for h in range(H):
        s = kref[0, h, : len_old + 1] @ qf[h]
        p = np.exp(s - s.max())
        p /= p.sum()
        ctx[h] = p @ vref[0, h, : len_old + 1]
    y = np.asarray(x, np.float32).reshape(D) + ctx.reshape(Dq) @ np.asarray(
        wo.dequantize(), np.float32
    )
    return y, kref, vref


@pytest.mark.parametrize("len_old", [0, 37, 255, 511])
def test_fused_attn_out(rng, len_old):
    x = jnp.asarray(rng.standard_normal((1, 1, D)), dtype=jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((1, 1, H, Dh)), dtype=jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((1, 1, H, Dh)), dtype=jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((1, 1, H, Dh)), dtype=jnp.bfloat16)
    kc = jnp.zeros((1, H, S, Dh), jnp.bfloat16)
    vc = jnp.zeros((1, H, S, Dh), jnp.bfloat16)
    if len_old:
        kc = kc.at[:, :, :len_old].set(
            jnp.asarray(rng.standard_normal((1, H, len_old, Dh)),
                        jnp.bfloat16))
        vc = vc.at[:, :, :len_old].set(
            jnp.asarray(rng.standard_normal((1, H, len_old, Dh)),
                        jnp.bfloat16))
    wo = quantize_array(
        (rng.standard_normal((Dq, D)) * 0.05).astype(np.float32), "q8_0")
    assert can_fuse_attn_out(wo, 1, 1, 1, Dh, S)
    lengths = jnp.asarray([len_old + 1], jnp.int32)

    y, kc2, vc2 = fused_attn_out(
        x, q, kn, vn, kc, vc, lengths, wo, interpret=True)
    ref_y, ref_k, ref_v = _reference(x, q, kn, vn, kc, vc, len_old, wo)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(D), ref_y, atol=3e-2, rtol=3e-2)
    np.testing.assert_array_equal(np.asarray(kc2, np.float32), ref_k)
    np.testing.assert_array_equal(np.asarray(vc2, np.float32), ref_v)


def test_gate(rng):
    wo = quantize_array(
        (rng.standard_normal((Dq, D)) * 0.05).astype(np.float32), "q8_0")
    assert not can_fuse_attn_out(wo, 2, 1, 1, Dh, S)  # batch > 1
    assert not can_fuse_attn_out(wo, 1, 2, 1, Dh, S)  # prefill
    assert not can_fuse_attn_out(wo, 1, 1, 2, Dh, S)  # GQA
    assert not can_fuse_attn_out(wo.qs, 1, 1, 1, Dh, S)  # dense
