"""Int8 KV-cache quantization.

Each cached K/V vector quantizes per (sequence, head, token) over the
head dimension: int8 payload + one scale.  Halves KV HBM traffic at long
context versus bf16 (the decode KV read grows linearly with n_past while
weights stay constant).

Scale layout: `[..., S, SCALE_LANES]` with the scale replicated across
SCALE_LANES=8 lanes.  The trailing size-8 lane dim is dim-exact, which
satisfies the TPU last-two-dims tiling rule, and the kernel consumes the
scale as a `[bs, 1]` column that broadcasts along Dh — row-wise K/V
scaling needs no transposes or lane shuffles (scaling the score columns
would).  Storage overhead: 8 x 2B per 128B payload = 12.5%.

Opt-in: the engine integration (cache_dtype="int8") is tracked in
ROADMAP.md; this module provides the codec, the jnp reference attention,
and the Pallas kernel, all tested against the bf16 path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SCALE_LANES = 8


def quantize_kv_block(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., Dh] f32/bf16 -> (int8 [..., Dh], scales [..., SCALE_LANES])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    scales = jnp.broadcast_to(scale, (*x.shape[:-1], SCALE_LANES))
    return q, scales.astype(jnp.bfloat16)


def dequantize_kv(q: jax.Array, scales: jax.Array) -> jax.Array:
    """(int8 [..., Dh], scales [..., SCALE_LANES]) -> f32 [..., Dh]."""
    return q.astype(jnp.float32) * scales[..., 0:1].astype(jnp.float32)


def update_kv_cache_int8(
    k_cache: jax.Array,  # int8 [B, Hkv, S, Dh]
    ks_cache: jax.Array,  # bf16 [B, Hkv, S, SCALE_LANES]
    v_cache: jax.Array,
    vs_cache: jax.Array,
    k_new: jax.Array,  # [B, T, Hkv, Dh] (bf16/f32)
    v_new: jax.Array,
    offsets: jax.Array,  # [B]
):
    """Quantize a new block and write it at each sequence's offset.

    Decode (T == 1) uses a static-unrolled chain of scalar-start
    dynamic_update_slices so the writes alias in place on the donated
    cache (vmap lowers to scatter = whole-cache rewrite per step — the
    context-dependent-cost bug fixed on the bf16 path, BENCH_NOTES)."""
    kq, ks = quantize_kv_block(jnp.swapaxes(k_new, 1, 2))  # [B, Hkv, T, *]
    vq, vs = quantize_kv_block(jnp.swapaxes(v_new, 1, 2))

    if k_new.shape[1] == 1:  # decode
        B = k_cache.shape[0]
        for b in range(B):
            at = (b, 0, offsets[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kq[b][None].astype(k_cache.dtype), at)
            ks_cache = jax.lax.dynamic_update_slice(
                ks_cache, ks[b][None].astype(ks_cache.dtype), at)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vq[b][None].astype(v_cache.dtype), at)
            vs_cache = jax.lax.dynamic_update_slice(
                vs_cache, vs[b][None].astype(vs_cache.dtype), at)
        return k_cache, ks_cache, v_cache, vs_cache

    def upd(cache, new, off):
        return jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (0, off, 0)
        )

    k_cache = jax.vmap(upd)(k_cache, kq, offsets)
    ks_cache = jax.vmap(upd)(ks_cache, ks, offsets)
    v_cache = jax.vmap(upd)(v_cache, vq, offsets)
    vs_cache = jax.vmap(upd)(vs_cache, vs, offsets)
    return k_cache, ks_cache, v_cache, vs_cache


def attend_cache_int8(
    q: jax.Array,  # [B, T, H, Dh]
    k_cache: jax.Array,  # int8 [B, Hkv, S, Dh]
    ks_cache: jax.Array,  # [B, Hkv, S, SCALE_LANES]
    v_cache: jax.Array,
    vs_cache: jax.Array,
    q_positions: jax.Array,  # [B, T]
    scale: float | None = None,
) -> jax.Array:
    """Reference attention over the quantized cache (XLA path)."""
    from tokenhawk_tpu.ops.attention import attend_cache

    k = dequantize_kv(k_cache, ks_cache)
    v = dequantize_kv(v_cache, vs_cache)
    return attend_cache(q, k, v, q_positions, scale=scale)
