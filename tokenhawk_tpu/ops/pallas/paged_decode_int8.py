"""Paged flash-decode over int8-quantized KV pages.

The paged twin of ops/pallas/flash_decode_int8.py: per (sequence,
kv-head) grid cell the kernel walks the page table, double-buffering
int8 page payloads HBM -> VMEM, and keeps the int8 payload native into
the MXU (s8 x s8 -> s32 dots; the query row and the probability rows
quantize on the fly — the f32-convert form measured compute-bound at
~1/3 of the bf16 kernel's bandwidth, BENCH_NOTES round 2).

Per-token scales are f32 with the token axis innermost
([Hkv, n_pages, ps]); each page's scale row DMA-s alongside the payload
as a [1, ps] tile (the page dim is viewed as [.., n_pages, 1, ps] so
the tiled trailing dims stay whole — f32 because bf16's 2-sublane
packing rejects the size-1 sublane slice) and folds into score space.

Shapes:
  lengths     [B] int32            valid tokens per sequence
  page_table  [B, max_pages] int32 physical page per logical block
  q           [B, Hkv, rep, Dh]    (pre-scaled by 1/sqrt(Dh))
  k_pages     int8 [Hkv, n_pages, ps, Dh]  (one layer's pages, HBM)
  ks_pages    f32 [Hkv, n_pages, ps]
  v_pages     int8 [Hkv, n_pages, ps, Dh]
  vs_pages    f32 [Hkv, n_pages, ps]
  out         [B, Hkv, rep, Dh]
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
    tables_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [1, 1, rep, Dh]
    k_hbm,  # ANY int8 [Hkv, n_pages, ps, Dh]
    ks_hbm,  # ANY f32 [Hkv, n_pages, 1, ps]
    v_hbm,
    vs_hbm,
    o_ref,  # VMEM [1, 1, rep, Dh]
    m_ref,  # VMEM [rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [rep, Dh] f32
    qi_ref,  # VMEM [rep, Dh] int8
    qs_ref,  # VMEM [rep, 128] f32
    k_buf,  # VMEM [2, ps, Dh] int8
    ks_buf,  # VMEM [2, 1, ps] f32
    v_buf,
    vs_buf,
    k_sem,  # DMA sems (2,) x4
    ks_sem,
    v_sem,
    vs_sem,
    *,
    page_size: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, page_size)

    def copies(blk, slot):
        page = tables_ref[b, blk]
        mk = pltpu.make_async_copy
        return (
            mk(k_hbm.at[h, page], k_buf.at[slot], k_sem.at[slot]),
            mk(ks_hbm.at[h, page], ks_buf.at[slot], ks_sem.at[slot]),
            mk(v_hbm.at[h, page], v_buf.at[slot], v_sem.at[slot]),
            mk(vs_hbm.at[h, page], vs_buf.at[slot], vs_sem.at[slot]),
        )

    @pl.when(i < n_blocks)
    def _():
        @pl.when(i == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            qf = q_ref[0, 0].astype(jnp.float32)  # [rep, Dh]
            qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            qinv = jnp.where(qmax > 0.0,
                             127.0 / jnp.where(qmax > 0.0, qmax, 1.0), 0.0)
            qi_ref[...] = jnp.round(qf * qinv).astype(jnp.int8)
            qs_ref[...] = jnp.broadcast_to(qmax * (1.0 / 127.0), qs_ref.shape)
            for c in copies(0, 0):
                c.start()

        @pl.when(i + 1 < n_blocks)
        def _():
            for c in copies(i + 1, (i + 1) % 2):
                c.start()

        slot = i % 2
        ck, cks, cv, cvs = copies(i, slot)
        ck.wait()
        cks.wait()

        s_i32 = jax.lax.dot_general(
            qi_ref[...], k_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [rep, ps]
        ks_row = ks_buf[slot].astype(jnp.float32)  # [1, ps]
        s = s_i32.astype(jnp.float32) * qs_ref[:, 0:1] * ks_row
        kpos = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < length, s, _MASK)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        cvs.wait()
        pw = p * vs_buf[slot].astype(jnp.float32)  # [rep, ps]
        pmax = jnp.max(pw, axis=1, keepdims=True)
        pinv = jnp.where(pmax > 0.0,
                         127.0 / jnp.where(pmax > 0.0, pmax, 1.0), 0.0)
        pq = jnp.round(pw * pinv).astype(jnp.int8)

        cv.wait()
        pv = jax.lax.dot_general(
            pq, v_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [rep, Dh]
        acc_ref[...] = acc_ref[...] * alpha + (
            pv.astype(jnp.float32) * (pmax * (1.0 / 127.0))
        )

    @pl.when(i == n_blocks - 1)
    def _():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode_int8(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_pages: jax.Array,  # int8 [Hkv, n_pages, ps, Dh]
    ks_pages: jax.Array,  # f32 [Hkv, n_pages, ps]
    v_pages: jax.Array,
    vs_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] int32
    *,
    interpret: bool = False,
) -> jax.Array:
    B, Hkv, rep, Dh = q.shape
    n_pages, ps = k_pages.shape[1], k_pages.shape[2]
    max_pages = page_table.shape[1]
    sc_view = (Hkv, n_pages, 1, ps)

    grid = (B, Hkv, max_pages)
    kernel = functools.partial(_kernel, page_size=ps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lengths, page_table
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((rep, 128), jnp.float32),
                pltpu.VMEM((rep, 128), jnp.float32),
                pltpu.VMEM((rep, Dh), jnp.float32),
                pltpu.VMEM((rep, Dh), jnp.int8),
                pltpu.VMEM((rep, 128), jnp.float32),
                pltpu.VMEM((2, ps, Dh), k_pages.dtype),
                pltpu.VMEM((2, 1, ps), ks_pages.dtype),
                pltpu.VMEM((2, ps, Dh), v_pages.dtype),
                pltpu.VMEM((2, 1, ps), vs_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), q,
      k_pages, ks_pages.reshape(sc_view), v_pages, vs_pages.reshape(sc_view))
