"""Flash-decode over an int8-quantized KV cache.

Same online-softmax structure as flash_decode.py; K/V tiles stream as
int8 plus per-token scales (bf16, lane-replicated — see ops/kvquant.py),
dequantized row-wise in VMEM: `k = k_int8 * scale[:, 0:1]` broadcasts
along Dh, so the quantized path adds one multiply per element and no
layout shuffles.  KV HBM traffic: (1 + 8*2/Dh)/2 of the bf16 path
(~0.56x for Dh=128).

Shapes:
  q         [B, Hkv, rep, Dh]  (pre-scaled by 1/sqrt(Dh))
  k_cache   int8 [B, Hkv, S, Dh]
  ks_cache  bf16 [B, Hkv, S, 8]
  v_cache   int8 [B, Hkv, S, Dh]
  vs_cache  bf16 [B, Hkv, S, 8]
  lengths   [B] int32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenhawk_tpu.ops.kvquant import SCALE_LANES

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    lengths_ref,  # SMEM [B]
    q_ref,  # [1, HB, rep, Dh]
    k_ref,  # int8 [1, HB, BS, Dh]
    ks_ref,  # [1, HB, BS, SCALE_LANES]
    v_ref,  # int8 [1, HB, BS, Dh]
    vs_ref,  # [1, HB, BS, SCALE_LANES]
    o_ref,  # [1, HB, rep, Dh]
    m_ref,  # VMEM [HB, rep, 128] f32
    l_ref,
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
        for h in range(head_block):
            q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
            ksc = ks_ref[0, h][:, 0:1].astype(jnp.float32)  # [BS, 1]
            k = k_ref[0, h].astype(jnp.float32) * ksc  # [BS, Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rep, BS]
            s = jnp.where(kpos_row < length, s, _MASK)

            m_prev = m_ref[h, :, 0:1]
            l_prev = l_ref[h, :, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_next, l_ref.shape[1:])

            vsc = vs_ref[0, h][:, 0:1].astype(jnp.float32)
            v = v_ref[0, h].astype(jnp.float32) * vsc  # [BS, Dh]
            pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv

    @pl.when(i == n_s_tiles - 1)
    def _():
        for h in range(head_block):
            l = l_ref[h, :, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_ref[h] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode_int8(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # int8 [B, Hkv, S, Dh]
    ks_cache: jax.Array,  # [B, Hkv, S, SCALE_LANES]
    v_cache: jax.Array,
    vs_cache: jax.Array,
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
    kv_spec = pl.BlockSpec((1, hb, bs, Dh), lambda b, h, i, *_: (b, h, i, 0))
    sc_spec = pl.BlockSpec(
        (1, hb, bs, SCALE_LANES), lambda b, h, i, *_: (b, h, i, 0)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                kv_spec, sc_spec, kv_spec, sc_spec,
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
    )(lengths.astype(jnp.int32), q, k_cache, ks_cache, v_cache, vs_cache)
