"""Paged flash-decode: single-token attention over a paged KV cache.

Pages are non-contiguous in HBM, so the kernel gathers them itself:
per (sequence, kv-head) grid cell it walks the sequence's page table,
DMA-ing each page HBM -> VMEM with double buffering (start page i+1's
copy, then wait on page i and compute), maintaining online-softmax
state across pages.  This is the serving-scale answer to the
reference's dense per-conversation KV buffers sized n_ctx
(/root/reference/th-llama-loader.cpp:428-429).

Shapes:
  lengths     [B] int32            valid tokens per sequence
  page_table  [B, max_pages] int32 physical page per logical block
  q           [B, Hkv, rep, Dh]    (pre-scaled by 1/sqrt(Dh))
  k_pages     [Hkv, n_pages, ps, Dh]  (one layer's pages, HBM)
  v_pages     [Hkv, n_pages, ps, Dh]
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
    k_hbm,  # ANY  [Hkv, n_pages, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,
    v_sem,
    *,
    page_size: int,
    head_block: int,
    contig: bool = False,
):
    """Head-blocked + head-vectorized variant (the same two fixes that
    took the dense DMA kernel from 261 to >700 GB/s, BENCH_NOTES round
    2): each cell gathers a [head_block, ps, Dh] slab of every page —
    the page index is shared across heads, so the slab is one strided
    DMA — and all softmax bookkeeping runs once on an [HB*rep, ps] tile
    instead of per-head slivers.  Under the contig pool layout
    ([n_pages, Hkv, ps, Dh]) the same slab is ONE contiguous run."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    length = lengths_ref[b]
    n_blocks = pl.cdiv(length, page_size)

    def copies(blk, slot):
        page = tables_ref[b, blk]
        if contig:
            k_slab = k_hbm.at[page, pl.ds(h0, head_block)]
            v_slab = v_hbm.at[page, pl.ds(h0, head_block)]
        else:
            k_slab = k_hbm.at[pl.ds(h0, head_block), page]
            v_slab = v_hbm.at[pl.ds(h0, head_block), page]
        k = pltpu.make_async_copy(k_slab, k_buf.at[slot], k_sem.at[slot])
        v = pltpu.make_async_copy(v_slab, v_buf.at[slot], v_sem.at[slot])
        return k, v

    @pl.when(i < n_blocks)
    def _():
        @pl.when(i == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            ck, cv = copies(0, 0)
            ck.start()
            cv.start()

        @pl.when(i + 1 < n_blocks)
        def _():
            nk, nv = copies(i + 1, (i + 1) % 2)
            nk.start()
            nv.start()

        slot = i % 2
        ck, cv = copies(i, slot)
        ck.wait()

        for h in range(head_block):
            q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
            k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
            s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        kpos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = jnp.where(kpos < length, s_buf[...], _MASK)
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
        s_buf[...] = p

        cv.wait()
        for h in range(head_block):
            v = v_buf[slot, h].astype(jnp.float32)
            p_h = s_buf[h * rep : (h + 1) * rep, :]
            pv = jnp.dot(p_h, v, preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha[h * rep : (h + 1) * rep] + pv

    @pl.when(i == n_blocks - 1)
    def _():
        l = l_ref[:, 0:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        for h in range(head_block):
            o_ref[0, h] = (
                acc_ref[h] * l_inv[h * rep : (h + 1) * rep]
            ).astype(o_ref.dtype)


def _append_kernel(
    page_ref,  # SMEM [B] physical page per sequence
    slot_ref,  # SMEM [B] row within the page
    new_ref,  # VMEM [1, Hkv, Dh] this sequence's new row
    pages_in,  # ANY [Hkv, n_pages, ps, Dh] (aliased to out)
    out_ref,  # ANY — the same buffer
    slab,  # VMEM [Hkv, 8, Dh]
    sem,
    *,
    contig: bool = False,
):
    b = pl.program_id(0)
    page = page_ref[b]
    slot = slot_ref[b]
    slab0 = pl.multiple_of((slot // 8) * 8, 8)
    r = slot - slab0

    def pool_slab():
        if contig:
            return out_ref.at[page, :, pl.ds(slab0, 8)]
        return out_ref.at[:, page, pl.ds(slab0, 8)]

    rd = pltpu.make_async_copy(pool_slab(), slab, sem)
    rd.start()
    rd.wait()
    # Insert the row via a masked select (a dynamic single-row store
    # needs sublane alignment Mosaic cannot prove for packed dtypes).
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    newv = jnp.swapaxes(new_ref[...], 0, 1)  # [Hkv, 1, Dh]
    slab[...] = jnp.where(rows == r, newv, slab[...])
    wr = pltpu.make_async_copy(slab, pool_slab(), sem)
    wr.start()
    wr.wait()


@functools.partial(jax.jit, static_argnames=("contig", "interpret"))
def paged_append_rows(
    pages: jax.Array,  # [Hkv, n_pages, ps, Dh] | contig [n_pages, Hkv, ps, Dh]
    new: jax.Array,  # [B, Hkv, Dh]
    page: jax.Array,  # [B] int32 physical page ids
    slot: jax.Array,  # [B] int32 rows within the page
    *,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Append one token row per sequence into its page, IN PLACE.

    A tile-aligned 8-row slab RMW on the aliased pool — the same write
    discipline as the dense fused append kernel (flash_decode_dma.py).
    Exists because the jnp dynamic-update-slice formulation made XLA's
    layout assignment flip the whole pool to a token-contiguous layout
    ({3,0,2,1}) and copy every pool array back to the default layout for
    the attention kernel EVERY STEP — 13.5 ms/step of pure relayout
    copies at 66 pages (round-4 serve trace).  A kernel-side write gives
    layout assignment no reason to leave the default.

    Grid cells run sequentially ("arbitrary"), so concurrent writes to a
    shared page (done slots parked on the trash page) do not race.
    """
    B = new.shape[0]
    if contig:
        _, Hkv, ps, Dh = pages.shape
    else:
        Hkv, _, ps, Dh = pages.shape
    grid = (B,)
    return pl.pallas_call(
        functools.partial(_append_kernel, contig=contig),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # page, slot
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Hkv, Dh), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((Hkv, 8, Dh), pages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        # Operand index counts scalar-prefetch args: (page, slot, new,
        # pages) -> pages is 3.
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page.astype(jnp.int32), slot.astype(jnp.int32),
      new.astype(pages.dtype), pages)


def _append_scales_kernel(
    page_ref,  # SMEM [B]
    slot_ref,  # SMEM [B]
    new_ref,  # VMEM [B, Hkv] per-head scales, all sequences
    scales_in,  # ANY [Hkv, n_pages, ps] (aliased to out)
    out_ref,  # ANY — the same buffer
    row,  # VMEM [Hkv, ps]
    sem,
    *,
    contig: bool = False,
):
    b = pl.program_id(0)
    page = page_ref[b]
    slot = slot_ref[b]

    def pool_row():
        if contig:
            return out_ref.at[page]
        return out_ref.at[:, page]

    rd = pltpu.make_async_copy(pool_row(), row, sem)
    rd.start()
    rd.wait()
    # Select row b of the scales via a masked reduction (a (1, Hkv)
    # block or dynamic sublane read trips Mosaic's tiling rules).
    allv = new_ref[...].astype(jnp.float32)  # [B, Hkv]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, allv.shape, 0)
    vals = jnp.sum(jnp.where(rows_b == b, allv, 0.0), axis=0)  # [Hkv]
    cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    row[...] = jnp.where(cols == slot, vals[:, None].astype(row.dtype),
                         row[...])
    wr = pltpu.make_async_copy(row, pool_row(), sem)
    wr.start()
    wr.wait()


@functools.partial(jax.jit, static_argnames=("contig", "interpret"))
def paged_append_scales(
    spages: jax.Array,  # [Hkv, n_pages, ps] | contig [n_pages, Hkv, ps]
    new: jax.Array,  # [B, Hkv]
    page: jax.Array,  # [B] int32
    slot: jax.Array,  # [B] int32
    *,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """paged_append_rows's twin for int8 scale pages: one scale column
    per sequence lands via a whole page-row RMW ([Hkv, ps] is the
    smallest lane-aligned slice of the token-innermost scale layout)."""
    B = new.shape[0]
    if contig:
        _, Hkv, ps = spages.shape
    else:
        Hkv, _, ps = spages.shape
    return pl.pallas_call(
        functools.partial(_append_scales_kernel, contig=contig),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole [B, Hkv]
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((Hkv, ps), spages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(spages.shape, spages.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page.astype(jnp.int32), slot.astype(jnp.int32),
      new.astype(spages.dtype), spages)


_GATHER_DEPTH = 4  # page DMAs in flight (HBM->HBM copies are
# latency-bound: start-then-wait per cell measured ~26 ms/layer for
# ~270 MB — fixed per-DMA latency, not bytes)


def _gather_kernel(tables_ref, k_src, v_src, k_out, v_out, k_sem, v_sem,
                   *, page_size: int, contig: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nmp = pl.num_programs(1)
    lin = b * nmp + i
    total = pl.num_programs(0) * nmp

    def copies(lin_idx):
        bb = lin_idx // nmp
        ii = lin_idx % nmp
        page = tables_ref[bb, ii]
        slot = lin_idx % _GATHER_DEPTH
        dst = pl.ds(ii * page_size, page_size)
        ks = k_src.at[page] if contig else k_src.at[:, page]
        vs = v_src.at[page] if contig else v_src.at[:, page]
        return (
            pltpu.make_async_copy(ks, k_out.at[bb, :, dst], k_sem.at[slot]),
            pltpu.make_async_copy(vs, v_out.at[bb, :, dst], v_sem.at[slot]),
        )

    # Keep _GATHER_DEPTH cells in flight: start this cell's copies, wait
    # for the cell _GATHER_DEPTH behind (same semaphore slot).
    ck, cv = copies(lin)
    ck.start()
    cv.start()

    @pl.when(lin >= _GATHER_DEPTH)
    def _():
        pk, pv = copies(lin - _GATHER_DEPTH)
        pk.wait()
        pv.wait()

    # Drain the tail on the last cell.
    @pl.when(lin == total - 1)
    def _():
        for back in range(min(_GATHER_DEPTH, 1_000_000)):
            @pl.when(lin - back >= 0)
            def _(back=back):
                tk, tv = copies(lin - back)
                tk.wait()
                tv.wait()


@functools.partial(jax.jit, static_argnames=("contig", "interpret"))
def gather_pages_dense(
    k_pages: jax.Array,  # [Hkv, n_pages, ps, Dh] | contig [n_pages, Hkv, ps, Dh]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    *,
    contig: bool = False,
    interpret: bool = False,
):
    """Materialize each sequence's page-table extent as dense
    [B, Hkv, max_pages*ps, Dh] caches via direct HBM->HBM page DMAs.

    The jnp fancy-index formulation (`pages[:, table]` + swapaxes)
    lowers to an XLA gather that measured ~330 ms per chunked-prefill
    continuation call (vs ~12 ms of raw byte traffic) — it dominated
    prefix-cache serving.  Page granularity makes the copy a plain DMA
    per (sequence, block): no compute, no VMEM staging.
    """
    B, mp = page_table.shape
    if contig:
        _, Hkv, ps, Dh = k_pages.shape
    else:
        Hkv, _, ps, Dh = k_pages.shape
    out_shape = jax.ShapeDtypeStruct((B, Hkv, mp * ps, Dh), k_pages.dtype)
    return pl.pallas_call(
        functools.partial(_gather_kernel, page_size=ps, contig=contig),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, mp),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((_GATHER_DEPTH,)),
                pltpu.SemaphoreType.DMA((_GATHER_DEPTH,)),
            ],
        ),
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), k_pages, v_pages)


def _gather_kernel_int8(tables_ref, k_src, ks_src, v_src, vs_src,
                        k_out, ks_out, v_out, vs_out,
                        k_sem, ks_sem, v_sem, vs_sem, *, page_size: int,
                        contig: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    page = tables_ref[b, i]
    slot = i % 2

    def src(ref):
        return ref.at[page] if contig else ref.at[:, page]

    dst = pl.ds(i * page_size, page_size)
    cps = [
        pltpu.make_async_copy(src(k_src), k_out.at[b, :, dst], k_sem.at[slot]),
        pltpu.make_async_copy(src(ks_src), ks_out.at[b, :, dst],
                              ks_sem.at[slot]),
        pltpu.make_async_copy(src(v_src), v_out.at[b, :, dst], v_sem.at[slot]),
        pltpu.make_async_copy(src(vs_src), vs_out.at[b, :, dst],
                              vs_sem.at[slot]),
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()


@functools.partial(jax.jit, static_argnames=("contig", "interpret"))
def gather_pages_dense_int8(
    k_pages: jax.Array,  # int8 [Hkv, n_pages, ps, Dh] | contig page-major
    ks_pages: jax.Array,  # f32 [Hkv, n_pages, ps] | contig [n_pages, Hkv, ps]
    v_pages: jax.Array,
    vs_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    *,
    contig: bool = False,
    interpret: bool = False,
):
    """gather_pages_dense for int8 pools: payloads + per-token scale
    pages DMA'd per (sequence, block) into dense [B, Hkv, mp*ps, Dh] /
    [B, Hkv, mp*ps] extents."""
    B, mp = page_table.shape
    if contig:
        _, Hkv, ps, Dh = k_pages.shape
    else:
        Hkv, _, ps, Dh = k_pages.shape
    pshape = jax.ShapeDtypeStruct((B, Hkv, mp * ps, Dh), k_pages.dtype)
    sshape = jax.ShapeDtypeStruct((B, Hkv, mp * ps), ks_pages.dtype)
    return pl.pallas_call(
        functools.partial(_gather_kernel_int8, page_size=ps, contig=contig),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, mp),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(4)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2,))] * 4,
        ),
        out_shape=(pshape, sshape, pshape, sshape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), k_pages, ks_pages, v_pages, vs_pages)


@functools.partial(jax.jit,
                   static_argnames=("head_block", "contig", "interpret"))
def paged_flash_decode(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_pages: jax.Array,  # [Hkv, n_pages, ps, Dh] | contig [n_pages, Hkv, ps, Dh]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] int32
    *,
    head_block: int = 32,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import _pick_hb

    B, Hkv, rep, Dh = q.shape
    ps = k_pages.shape[2]
    max_pages = page_table.shape[1]
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
            ],
            out_specs=pl.BlockSpec(
                (1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, ps), jnp.float32),
                pltpu.VMEM((2, hb, ps, Dh), k_pages.dtype),
                pltpu.VMEM((2, hb, ps, Dh), v_pages.dtype),
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
      k_pages, v_pages)

def _kernel_walk(
    lengths_ref,  # SMEM [B]
    tables_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [B, HB, rep, Dh]
    k_hbm,  # ANY  [Hkv, n_pages, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [B, HB, rep, Dh]
    m_ref,  # VMEM [B, HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [B, HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,
    v_sem,
    *,
    page_size: int,
    head_block: int,
    batch: int,
    contig: bool = False,
):
    """Multi-slot flattened walk (see flash_decode_dma._kernel_walk_append
    for the rationale): one grid cell per head group runs a single
    uniform fori_loop over (slot, page) items so the page-DMA double
    buffer stays primed across slot boundaries — the grid-per-slot form
    exposes the first page's fetch latency once per slot per layer,
    which dominates serve-batch decode at 1-2 live pages per slot.
    Every slot walks cdiv(max length, ps) items; a slot's items beyond
    its own table are clamped to its page 0 (a same-pool read whose
    scores mask out)."""
    hg = pl.program_id(0)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    Dh = q_ref.shape[-1]

    max_len = lengths_ref[0]
    for b in range(1, batch):
        max_len = jnp.maximum(max_len, lengths_ref[b])
    nb = jnp.maximum(pl.cdiv(max_len, page_size), 1)

    def walk_copies(b, blk, slot):
        # Clamp dead items to the slot's first table entry: always a
        # pool-resident page (free slots' tables point at the trash
        # page), and the compute mask drops its contribution.
        n_b = pl.cdiv(lengths_ref[b], page_size)
        page = tables_ref[b, jnp.where(blk < n_b, blk, 0)]
        if contig:
            k_slab = k_hbm.at[page, pl.ds(h0, head_block)]
            v_slab = v_hbm.at[page, pl.ds(h0, head_block)]
        else:
            k_slab = k_hbm.at[pl.ds(h0, head_block), page]
            v_slab = v_hbm.at[pl.ds(h0, head_block), page]
        k = pltpu.make_async_copy(k_slab, k_buf.at[slot], k_sem.at[slot])
        v = pltpu.make_async_copy(v_slab, v_buf.at[slot], v_sem.at[slot])
        return k, v

    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    ck0, cv0 = walk_copies(0, 0, 0)
    ck0.start()
    cv0.start()

    total = batch * nb

    def body(idx, _):
        b = idx // nb
        i = idx - b * nb
        slot = idx % 2

        @pl.when(idx + 1 < total)
        def _():
            nxt = idx + 1
            nk, nv = walk_copies(nxt // nb, nxt - (nxt // nb) * nb,
                                 nxt % 2)
            nk.start()
            nv.start()

        ck, cv = walk_copies(b, i, slot)
        ck.wait()

        for h in range(head_block):
            qh = q_ref[pl.ds(b, 1), h][0].astype(jnp.float32)  # [rep, Dh]
            k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
            s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        length = lengths_ref[b]
        kpos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = jnp.where(kpos < length, s_buf[...], _MASK)
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
        s_buf[...] = p

        cv.wait()
        acc = acc_ref[pl.ds(b, 1)][0]  # [HB, rep, Dh]
        pvs = []
        for h in range(head_block):
            v = v_buf[slot, h].astype(jnp.float32)
            p_h = s_buf[h * rep : (h + 1) * rep, :]
            pvs.append(jnp.dot(p_h, v, preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pvs, axis=0).reshape(head_block, rep, Dh)
        acc = acc * alpha.reshape(head_block, rep, 1) + pv
        acc_ref[pl.ds(b, 1)] = acc[None]

        @pl.when(i == nb - 1)
        def _():
            l = l_ref[pl.ds(b, 1)][0][:, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            acc_b = acc_ref[pl.ds(b, 1)][0]
            o_ref[pl.ds(b, 1)] = (
                acc_b * l_inv.reshape(head_block, rep, 1)
            ).astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("head_block", "contig", "interpret"))
def paged_flash_decode_walk(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_pages: jax.Array,  # [Hkv, n_pages, ps, Dh] | contig [n_pages, Hkv, ps, Dh]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] int32
    *,
    head_block: int = 32,
    contig: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """paged_flash_decode with the multi-slot flattened walk."""
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import _pick_hb

    B, Hkv, rep, Dh = q.shape
    ps = k_pages.shape[2]
    hb = _pick_hb(head_block, Hkv, rep, ps, Dh, k_pages.dtype.itemsize)

    grid = (Hkv // hb,)
    kernel = functools.partial(_kernel_walk, page_size=ps, head_block=hb,
                               batch=B, contig=contig)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lengths, page_table
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb, rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, ps), jnp.float32),
                pltpu.VMEM((2, hb, ps, Dh), k_pages.dtype),
                pltpu.VMEM((2, hb, ps, Dh), v_pages.dtype),
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
      k_pages, v_pages)
