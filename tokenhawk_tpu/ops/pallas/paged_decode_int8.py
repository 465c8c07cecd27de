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


def _kernel_vec(
    lengths_ref,  # SMEM [B]
    tables_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY int8 [Hkv, n_pages, ps, Dh]
    ks_hbm,  # ANY f32 [Hkv, n_pages, 1, ps]
    v_hbm,
    vs_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB*rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    qi_ref,  # VMEM [HB, rep, Dh] int8
    qs_ref,  # VMEM [HB*rep, 128] f32
    pv_buf,  # VMEM [HB*rep, Dh] int32
    k_buf,  # VMEM [2, HB, ps, Dh] int8
    v_buf,
    ks_buf,  # VMEM [2, HB, 1, ps] f32
    vs_buf,
    k_sem,  # DMA sems (2,) x4
    ks_sem,
    v_sem,
    vs_sem,
    *,
    page_size: int,
    head_block: int,
    contig: bool = False,
):
    """Head-blocked + head-vectorized int8 paged decode (the same two
    fixes that took the bf16 paged kernel 110 -> 724 GB/s: the page
    index is shared across heads so each page's payload+scales land in
    four strided DMAs per slab instead of per-head slivers, and all
    softmax/scale-fold bookkeeping runs once on [HB*rep, ps] tiles).
    Under the contig pool layout the payload slab is one contiguous
    run."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, page_size)
    hs = pl.ds(h0, head_block)

    def copies(blk, slot):
        page = tables_ref[b, blk]
        mk = pltpu.make_async_copy

        def src(ref):
            return ref.at[page, hs] if contig else ref.at[hs, page]

        return (
            mk(src(k_hbm), k_buf.at[slot], k_sem.at[slot]),
            mk(src(ks_hbm), ks_buf.at[slot], ks_sem.at[slot]),
            mk(src(v_hbm), v_buf.at[slot], v_sem.at[slot]),
            mk(src(vs_hbm), vs_buf.at[slot], vs_sem.at[slot]),
        )

    @pl.when(i < n_blocks)
    def _():
        @pl.when(i == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            qf = q_ref[0].astype(jnp.float32)  # [HB, rep, Dh]
            qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            qinv = jnp.where(
                qmax > 0.0, 127.0 / jnp.where(qmax > 0.0, qmax, 1.0), 0.0
            )
            qi_ref[...] = jnp.round(qf * qinv).astype(jnp.int8)
            qs_ref[...] = jnp.broadcast_to(
                (qmax * (1.0 / 127.0)).reshape(head_block * rep, 1),
                qs_ref.shape,
            )
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

        for h in range(head_block):
            s_i32 = jax.lax.dot_general(
                qi_ref[h], k_buf[slot, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rep, ps]
            s_buf[h * rep : (h + 1) * rep, :] = s_i32.astype(jnp.float32)

        def per_row(x):  # [HB, ps] -> [HB*rep, ps]
            if rep == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (head_block, rep, x.shape[-1])
            ).reshape(head_block * rep, x.shape[-1])

        ks_row = per_row(ks_buf[slot, :, 0, :].astype(jnp.float32))
        kpos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = s_buf[...] * qs_ref[:, 0:1] * ks_row
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
        vs_row = per_row(vs_buf[slot, :, 0, :].astype(jnp.float32))
        pw = p * vs_row
        pmax = jnp.max(pw, axis=1, keepdims=True)
        pinv = jnp.where(
            pmax > 0.0, 127.0 / jnp.where(pmax > 0.0, pmax, 1.0), 0.0
        )
        pq = jnp.round(pw * pinv).astype(jnp.int8)

        cv.wait()
        for h in range(head_block):
            pv_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                pq[h * rep : (h + 1) * rep, :], v_buf[slot, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        acc_ref[...] = acc_ref[...] * alpha + (
            pv_buf[...].astype(jnp.float32) * (pmax * (1.0 / 127.0))
        )

    @pl.when(i == n_blocks - 1)
    def _():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (
            (acc_ref[...] * l_inv)
            .reshape(head_block, rep, o_ref.shape[-1])
            .astype(o_ref.dtype)
        )


@functools.partial(jax.jit,
                   static_argnames=("head_block", "contig", "interpret"))
def paged_flash_decode_int8(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_pages: jax.Array,  # int8 [Hkv, n_pages, ps, Dh] | contig page-major
    ks_pages: jax.Array,  # f32 [Hkv, n_pages, ps] | contig [n_pages, Hkv, ps]
    v_pages: jax.Array,
    vs_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] int32
    *,
    head_block: int = 32,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import _pick_hb

    B, Hkv, rep, Dh = q.shape
    n_pages = k_pages.shape[0] if contig else k_pages.shape[1]
    ps = k_pages.shape[2]
    max_pages = page_table.shape[1]
    sc_view = ((n_pages, Hkv, 1, ps) if contig else (Hkv, n_pages, 1, ps))
    hb = _pick_hb(head_block, Hkv, rep, ps, Dh, k_pages.dtype.itemsize)

    grid = (B, Hkv // hb, max_pages)
    kernel = functools.partial(_kernel_vec, page_size=ps, head_block=hb,
                               contig=contig)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lengths, page_table
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, ps), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.int8),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, Dh), jnp.int32),
                pltpu.VMEM((2, hb, ps, Dh), k_pages.dtype),
                pltpu.VMEM((2, hb, ps, Dh), v_pages.dtype),
                pltpu.VMEM((2, hb, 1, ps), ks_pages.dtype),
                pltpu.VMEM((2, hb, 1, ps), vs_pages.dtype),
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

def _kernel_walk(
    lengths_ref,  # SMEM [B]
    tables_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [B, HB, rep, Dh]
    k_hbm,  # ANY int8 [Hkv, n_pages, ps, Dh]
    ks_hbm,  # ANY f32 [Hkv, n_pages, 1, ps]
    v_hbm,
    vs_hbm,
    o_ref,  # VMEM [B, HB, rep, Dh]
    m_ref,  # VMEM [B, HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [B, HB*rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    qi_ref,  # VMEM [B, HB, rep, Dh] int8
    qs_ref,  # VMEM [B, HB*rep, 128] f32
    pv_buf,  # VMEM [HB*rep, Dh] int32
    k_buf,  # VMEM [2, HB, ps, Dh] int8
    v_buf,
    ks_buf,  # VMEM [2, HB, 1, ps] f32
    vs_buf,
    k_sem,
    ks_sem,
    v_sem,
    vs_sem,
    *,
    page_size: int,
    head_block: int,
    batch: int,
    contig: bool = False,
):
    """Multi-slot flattened walk for the int8 paged kernel (see
    paged_decode._kernel_walk): one cell per head group, one uniform
    fori_loop over (slot, page) items, per-slot softmax state and
    per-slot query quantization precomputed before the loop."""
    hg = pl.program_id(0)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    Dh = q_ref.shape[-1]
    hs = pl.ds(h0, head_block)

    max_len = lengths_ref[0]
    for b in range(1, batch):
        max_len = jnp.maximum(max_len, lengths_ref[b])
    nb = jnp.maximum(pl.cdiv(max_len, page_size), 1)

    def walk_copies(b, blk, slot):
        n_b = pl.cdiv(lengths_ref[b], page_size)
        page = tables_ref[b, jnp.where(blk < n_b, blk, 0)]
        mk = pltpu.make_async_copy

        def src(ref):
            return ref.at[page, hs] if contig else ref.at[hs, page]

        return (
            mk(src(k_hbm), k_buf.at[slot], k_sem.at[slot]),
            mk(src(ks_hbm), ks_buf.at[slot], ks_sem.at[slot]),
            mk(src(v_hbm), v_buf.at[slot], v_sem.at[slot]),
            mk(src(vs_hbm), vs_buf.at[slot], vs_sem.at[slot]),
        )

    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    # Per-slot symmetric int8 query quantization, all slots up front.
    qf = q_ref[...].astype(jnp.float32)  # [B, HB, rep, Dh]
    qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qinv = jnp.where(qmax > 0.0, 127.0 / jnp.where(qmax > 0.0, qmax, 1.0),
                     0.0)
    qi_ref[...] = jnp.round(qf * qinv).astype(jnp.int8)
    qs_ref[...] = jnp.broadcast_to(
        (qmax * (1.0 / 127.0)).reshape(batch, head_block * rep, 1),
        qs_ref.shape,
    )
    for c in walk_copies(0, 0, 0):
        c.start()

    total = batch * nb

    def body(idx, _):
        b = idx // nb
        i = idx - b * nb
        slot = idx % 2

        @pl.when(idx + 1 < total)
        def _():
            nxt = idx + 1
            for c in walk_copies(nxt // nb, nxt - (nxt // nb) * nb,
                                 nxt % 2):
                c.start()

        ck, cks, cv, cvs = walk_copies(b, i, slot)
        ck.wait()
        cks.wait()

        for h in range(head_block):
            qih = qi_ref[pl.ds(b, 1), h][0]  # [rep, Dh] int8
            s_i32 = jax.lax.dot_general(
                qih, k_buf[slot, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s_buf[h * rep : (h + 1) * rep, :] = s_i32.astype(jnp.float32)

        def per_row(x):  # [HB, ps] -> [HB*rep, ps]
            if rep == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (head_block, rep, x.shape[-1])
            ).reshape(head_block * rep, x.shape[-1])

        length = lengths_ref[b]
        ks_row = per_row(ks_buf[slot, :, 0, :].astype(jnp.float32))
        kpos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        qs_b = qs_ref[pl.ds(b, 1)][0][:, 0:1]
        s = s_buf[...] * qs_b * ks_row
        s = jnp.where(kpos < length, s, _MASK)
        m_prev = m_ref[pl.ds(b, 1)][0][:, 0:1]
        l_prev = l_ref[pl.ds(b, 1)][0][:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[pl.ds(b, 1)] = jnp.broadcast_to(
            m_next, (1,) + m_ref.shape[1:])
        l_ref[pl.ds(b, 1)] = jnp.broadcast_to(
            l_next, (1,) + l_ref.shape[1:])

        cvs.wait()
        vs_row = per_row(vs_buf[slot, :, 0, :].astype(jnp.float32))
        pw = p * vs_row
        pmax = jnp.max(pw, axis=1, keepdims=True)
        pinv = jnp.where(
            pmax > 0.0, 127.0 / jnp.where(pmax > 0.0, pmax, 1.0), 0.0
        )
        pq = jnp.round(pw * pinv).astype(jnp.int8)

        cv.wait()
        for h in range(head_block):
            pv_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                pq[h * rep : (h + 1) * rep, :], v_buf[slot, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        acc = acc_ref[pl.ds(b, 1)][0]
        acc = acc * alpha + (
            pv_buf[...].astype(jnp.float32) * (pmax * (1.0 / 127.0))
        )
        acc_ref[pl.ds(b, 1)] = acc[None]

        @pl.when(i == nb - 1)
        def _():
            l = l_ref[pl.ds(b, 1)][0][:, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            acc_b = acc_ref[pl.ds(b, 1)][0]
            o_ref[pl.ds(b, 1)] = (
                (acc_b * l_inv)
                .reshape(1, head_block, rep, Dh)
                .astype(o_ref.dtype)
            )
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("head_block", "contig", "interpret"))
def paged_flash_decode_int8_walk(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_pages: jax.Array,  # int8 [Hkv, n_pages, ps, Dh] | contig page-major
    ks_pages: jax.Array,  # f32 [Hkv, n_pages, ps] | contig [n_pages, Hkv, ps]
    v_pages: jax.Array,
    vs_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] int32
    *,
    head_block: int = 32,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """paged_flash_decode_int8 with the multi-slot flattened walk."""
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import _pick_hb

    B, Hkv, rep, Dh = q.shape
    n_pages = k_pages.shape[0] if contig else k_pages.shape[1]
    ps = k_pages.shape[2]
    sc_view = ((n_pages, Hkv, 1, ps) if contig else (Hkv, n_pages, 1, ps))
    hb = _pick_hb(head_block, Hkv, rep, ps, Dh, k_pages.dtype.itemsize)

    grid = (Hkv // hb,)
    kernel = functools.partial(_kernel_walk, page_size=ps, head_block=hb,
                               batch=B, contig=contig)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb * rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, ps), jnp.float32),
                pltpu.VMEM((B, hb, rep, Dh), jnp.int8),
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, Dh), jnp.int32),
                pltpu.VMEM((2, hb, ps, Dh), k_pages.dtype),
                pltpu.VMEM((2, hb, ps, Dh), v_pages.dtype),
                pltpu.VMEM((2, hb, 1, ps), ks_pages.dtype),
                pltpu.VMEM((2, hb, 1, ps), vs_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), q,
      k_pages, ks_pages.reshape(sc_view), v_pages,
      vs_pages.reshape(sc_view))
