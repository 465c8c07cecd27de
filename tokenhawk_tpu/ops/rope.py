"""Rotary position embeddings.

Two conventions:
  - "interleaved": rotate adjacent (x[2i], x[2i+1]) pairs with
    theta_i = base^(-2i/d) — the GGML convention the reference's WGSL
    kernel implements (/root/reference/th.cpp:1457-1492; position comes
    from n_past + z exactly as `positions` does here).
  - "half": rotate (x[i], x[i+d/2]) pairs — the HF/Meta convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jax.Array, head_dim: int, base: float = 10000.0):
    """positions [..., T] int -> cos/sin [..., T, head_dim//2] f32."""
    half = head_dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    freqs = base ** (-2.0 * i / head_dim)
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    style: str = "interleaved",
) -> jax.Array:
    """x [B, T, H, Dh]; cos/sin [B, T, Dh//2] -> same shape/dtype as x."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    c = cos[:, :, None, :]  # broadcast over heads
    s = sin[:, :, None, :]
    if style == "interleaved":
        x0 = x[..., 0::2]
        x1 = x[..., 1::2]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    elif style == "half":
        half = x.shape[-1] // 2
        x0 = x[..., :half]
        x1 = x[..., half:]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.concatenate([r0, r1], axis=-1)
    else:
        raise ValueError(f"unknown rope style {style!r}")
    return out.astype(dtype)
