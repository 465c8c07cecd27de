"""Flash-decode: single-token attention over a dense KV cache.

One query token per sequence attends to its `length` cached KV slots.
Online-softmax over KV tiles so the [S] score row is never materialized
in HBM; the q heads sharing one KV head (GQA group, `rep`) are batched
into the same MXU matmul (sum-commute trick), and `head_block` KV heads
are processed per grid cell so small-per-head decode work amortizes the
kernel-invocation overhead (matters at larger batch).

Replaces the reference's decode-attention pipeline — materialized
Q·K^T scores + `row_softmax` + probs·V (/root/reference/th-llama.cpp:
361-380 with /root/reference/th.cpp:1865-1961) — with a single kernel
whose HBM traffic is exactly one read of K and V.

Shapes:
  q        [B, Hkv, rep, Dh]   (pre-scaled by 1/sqrt(Dh))
  k_cache  [B, Hkv, S, Dh]     (head-major; (S, Dh) are the tiled dims)
  v_cache  [B, Hkv, S, Dh]
  lengths  [B] int32           number of valid cache slots (query attends
                               to positions < lengths[b])
  out      [B, Hkv, rep, Dh]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    lengths_ref,  # SMEM [B]
    q_ref,  # [1, HB, rep, Dh]
    k_ref,  # [1, HB, BS, Dh]
    v_ref,  # [1, HB, BS, Dh]
    o_ref,  # [1, HB, rep, Dh]
    m_ref,  # VMEM [HB, rep, 128] f32
    l_ref,  # VMEM [HB, rep, 128] f32
    acc_ref,  # VMEM [HB, rep, Dh] f32
    *,
    block_s: int,
    n_s_tiles: int,
    head_block: int,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i * block_s < length)
    def _():
        kpos_row = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], block_s), 1
        )
        for h in range(head_block):  # static unroll over the head block
            q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
            k = k_ref[0, h].astype(jnp.float32)  # [BS, Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rep, BS]
            s = jnp.where(kpos_row < length, s, _MASK)

            m_prev = m_ref[h, :, 0:1]  # [rep, 1]
            l_prev = l_ref[h, :, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_next, l_ref.shape[1:])

            v = v_ref[0, h].astype(jnp.float32)  # [BS, Dh]
            pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv

    @pl.when(i == n_s_tiles - 1)
    def _():
        for h in range(head_block):
            l = l_ref[h, :, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_ref[h] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]
    v_cache: jax.Array,  # [B, Hkv, S, Dh]
    lengths: jax.Array,  # [B] int32
    *,
    block_s: int = 256,
    head_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_s_tiles = S // bs
    hb = min(head_block, Hkv)
    while Hkv % hb:
        hb -= 1

    grid = (B, Hkv // hb, n_s_tiles)
    kernel = functools.partial(
        _kernel, block_s=bs, n_s_tiles=n_s_tiles, head_block=hb
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch refs as trailing args
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, bs, Dh), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, hb, bs, Dh), lambda b, h, i, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb, rep, 128), jnp.float32),
                pltpu.VMEM((hb, rep, 128), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k_cache, v_cache)


def attend_decode(
    q: jax.Array,  # [B, 1, H, Dh]
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_positions: jax.Array,  # [B, 1]
    scale: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """attend_cache-compatible wrapper for the T=1 decode case."""
    B, T, H, Dh = q.shape
    Hkv = k_cache.shape[1]  # cache is head-major [B, Hkv, S, Dh]
    rep = H // Hkv
    qg = (q[:, 0] * scale).reshape(B, Hkv, rep, Dh)
    # attend to positions <= q_pos; clamp to cache capacity so a stale
    # over-advanced slot cannot un-mask the whole cache (length > S makes
    # every kpos pass the `kpos < length` test).
    lengths = jnp.minimum(q_positions[:, 0] + 1, k_cache.shape[2])
    out = flash_decode(qg, k_cache, v_cache, lengths.astype(jnp.int32),
                       interpret=interpret)
    return out.reshape(B, 1, H, Dh).astype(q.dtype)
