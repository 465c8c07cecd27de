"""Flash prefill attention over an int8-quantized KV cache.

Same online-softmax structure as flash_attention.py, but K/V tiles
arrive as int8 payloads + per-token scales (ops/kvquant.py layout:
scales bf16 [.., S], token-innermost).  This removes the XLA fallback's
whole-cache dequantize during prefill (kvquant.attend_cache_int8),
whose [B, Hkv, S, Dh] f32 materialization blows up at long context.

The per-token scales fold into score space rather than dequantizing
the K/V tiles: q.(k_i8*ksc)^T == (q.k_i8^T) * ksc_row and
p.(vsc*v_i8) == (p*vsc_row).v_i8 — the token-innermost layout makes
ksc_row/vsc_row [1, BS] rows that broadcast over the [BT, BS] score
tile with no transposes.  K/V convert int8->f32 once per tile for the
MXU feed (amortized over BT query rows; prefill stays MXU-bound).

Kernel shapes:
  q         [B, Hkv, rep, T, Dh]  (pre-scaled by 1/sqrt(Dh))
  k_cache   int8 [B, Hkv, S, Dh]
  ks_cache  bf16 [B, Hkv, S]
  v_cache   int8 [B, Hkv, S, Dh]
  vs_cache  bf16 [B, Hkv, S]
  offsets   [B] int32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    offsets_ref,  # SMEM [B]
    q_ref,  # [1, 1, rep, BT, Dh]
    k_ref,  # int8 [1, 1, BS, Dh]
    ks_ref,  # bf16 [1, 1, 1, 1, BS]
    v_ref,  # int8 [1, 1, BS, Dh]
    vs_ref,  # bf16 [1, 1, 1, 1, BS]
    o_ref,  # [1, 1, rep, BT, Dh]
    m_ref,
    l_ref,
    acc_ref,
    *,
    block_t: int,
    block_s: int,
    n_s_tiles: int,
    rep: int,
):
    b = pl.program_id(0)
    t = pl.program_id(2)
    i = pl.program_id(3)
    offset = offsets_ref[b]

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    max_qpos = offset + (t + 1) * block_t - 1

    @pl.when(i * block_s <= max_qpos)
    def _():
        # int8 -> f32 convert only (MXU feed); scales fold into score
        # space as [1, BS] rows below.
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        ks_row = ks_ref[0, 0, 0].astype(jnp.float32)  # [1, BS]
        vs_row = vs_ref[0, 0, 0].astype(jnp.float32)  # [1, BS]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_s), 0)
        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_t, block_s), 1
        )
        qpos = offset + t * block_t + row
        causal = kpos <= qpos

        for r in range(rep):
            q = q_ref[0, 0, r].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * ks_row
            s = jnp.where(causal, s, _MASK)

            m_prev = m_ref[r, :, 0:1]
            l_prev = l_ref[r, :, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[r] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[r] = jnp.broadcast_to(l_next, l_ref.shape[1:])

            pv = jnp.dot(p * vs_row, v, preferred_element_type=jnp.float32)
            acc_ref[r] = acc_ref[r] * alpha + pv

    @pl.when(i == n_s_tiles - 1)
    def _():
        for r in range(rep):
            l = l_ref[r, :, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0, r] = (acc_ref[r] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_s", "interpret"))
def flash_attention_int8(
    q: jax.Array,  # [B, Hkv, rep, T, Dh]
    k_cache: jax.Array,  # int8 [B, Hkv, S, Dh]
    ks_cache: jax.Array,  # bf16 [B, Hkv, S]
    v_cache: jax.Array,
    vs_cache: jax.Array,
    offsets: jax.Array,  # [B] int32
    *,
    block_t: int = 256,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, Hkv, rep, T, Dh = q.shape
    S = k_cache.shape[2]
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_s = S // bs

    grid = (B, Hkv, T // bt, n_s)
    kernel = functools.partial(
        _kernel, block_t=bt, block_s=bs, n_s_tiles=n_s, rep=rep
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, rep, bt, Dh), lambda b, h, t, i, *_: (b, h, 0, t, 0)
                ),
                pl.BlockSpec((1, 1, bs, Dh), lambda b, h, t, i, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, 1, 1, bs), lambda b, h, t, i, *_: (b, h, i, 0, 0)
                ),
                pl.BlockSpec((1, 1, bs, Dh), lambda b, h, t, i, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, 1, 1, bs), lambda b, h, t, i, *_: (b, h, i, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rep, bt, Dh), lambda b, h, t, i, *_: (b, h, 0, t, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((rep, bt, 128), jnp.float32),
                pltpu.VMEM((rep, bt, 128), jnp.float32),
                pltpu.VMEM((rep, bt, Dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        offsets.astype(jnp.int32), q,
        k_cache, ks_cache.reshape(B, Hkv, S // bs, 1, bs),
        v_cache, vs_cache.reshape(B, Hkv, S // bs, 1, bs),
    )


def attend_prefill_int8(
    q: jax.Array,  # [B, T, H, Dh]
    k_cache: jax.Array,
    ks_cache: jax.Array,
    v_cache: jax.Array,
    vs_cache: jax.Array,
    q_positions: jax.Array,  # [B, T]
    scale: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """attend_cache-compatible wrapper for int8-KV block prefill."""
    B, T, H, Dh = q.shape
    Hkv = k_cache.shape[1]
    rep = H // Hkv
    qg = (q * scale).reshape(B, T, Hkv, rep, Dh).transpose(0, 2, 3, 1, 4)
    out = flash_attention_int8(qg, k_cache, ks_cache, v_cache, vs_cache,
                               q_positions[:, 0], interpret=interpret)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, Dh).astype(q.dtype)
