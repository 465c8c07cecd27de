"""Length-aware flash-decode: manual DMA fetches only live KV blocks.

The BlockSpec-pipelined flash_decode.py prefetches every S-tile of the
cache each step — predication skips the compute but not the DMA, so at
2048-ctx the dead tail of the cache costs ~30% of decode time (see
BENCH_NOTES.md).  This variant adapts the paged-attention DMA structure
(ops/pallas/paged_decode.py) to the dense cache: the cache is viewed as
[B, Hkv, n_blocks, ps, Dh] and each (batch, head-group) cell walks only
ceil(length/ps) blocks, double-buffering HBM->VMEM copies of a
[head_block, ps, Dh] slab per step.

Shapes:
  q        [B, Hkv, rep, Dh]   (pre-scaled by 1/sqrt(Dh))
  k_cache  [B, Hkv, S, Dh]     (head-major dense cache)
  v_cache  [B, Hkv, S, Dh]
  lengths  [B] int32
"""

from __future__ import annotations

import functools
import os as _os2

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)

# Scoped-VMEM budget for the KV double buffers + score/softmax scratch.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_hb(head_block: int, Hkv: int, rep: int, bs: int, Dh: int,
             itemsize: int) -> int:
    """Largest head_block <= requested that divides Hkv and fits VMEM.

    Bigger head blocks mean fewer grid cells per layer — measured on v5e
    (BENCH_NOTES round 2): hb 8 -> 32 is 7.0 -> 6.3 us/layer at 128 live
    tokens and 696 -> 728 GB/s at 2048 (fixed per-cell cost dominates
    short lengths; fewer, larger DMAs win everywhere).
    """
    def vmem(hb):
        return (
            2 * 2 * hb * bs * Dh * itemsize  # k_buf + v_buf (2 slots each)
            + hb * rep * bs * 4  # s_buf
            + 2 * hb * rep * 128 * 4  # m/l
            + hb * rep * Dh * 4  # acc
        )

    # A PARTIAL head block becomes a BlockSpec sublane dimension, so it
    # must be 8-aligned (Mosaic tiling); only the whole axis is exempt.
    # 13B's Hkv=40 is the live case: 20 divides 40 but lowers as an
    # illegal (1, 20, Dh) block — the valid choices are 40 (whole) or 8.
    if vmem(Hkv) <= _VMEM_BUDGET and Hkv <= 2 * head_block:
        return Hkv  # whole axis: fewest cells, always a legal block
    for hb in range(min(head_block, Hkv), 0, -1):
        if Hkv % hb == 0 and (hb == Hkv or hb % 8 == 0) \
                and vmem(hb) <= _VMEM_BUDGET:
            return hb
    return 1


def _kernel(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    m_ref,  # VMEM [HB, rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB, rep, Dh] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,  # DMA sems (2,)
    v_sem,
    *,
    block_s: int,
    head_block: int,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    # Clamp to the cache capacity: an over-long length would otherwise
    # prefetch past the [B, Hkv, n_blocks, ps, Dh] view (OOB async copy).
    length = jnp.minimum(lengths_ref[b], pl.num_programs(2) * block_s)
    n_blocks = pl.cdiv(length, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
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

        kpos_row = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], block_s), 1
        )
        for h in range(head_block):
            q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
            k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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

            @pl.when(h == 0)
            def _():
                cv.wait()

            v = v_buf[slot, h].astype(jnp.float32)
            pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv

    @pl.when(i == n_blocks - 1)
    def _():
        for h in range(head_block):
            l = l_ref[h, :, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, h] = (acc_ref[h] * l_inv).astype(o_ref.dtype)


def _kernel_vec(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32  per-head scores, vectorized softmax
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,
    v_sem,
    *,
    block_s: int,
    head_block: int,
    vpu: bool = False,
    pack: bool = False,
):
    """Head-vectorized variant: the QK^T and PV dots stay per-head (each
    head contracts its own K/V), but ALL softmax bookkeeping (mask, max,
    exp, rescale) runs once on an [HB*rep, ps] tile instead of HB times
    on [rep, ps] slivers.  At rep=1/Hkv=32 the per-head slivers are
    1-row ops whose fixed VPU cost dominated the kernel (261 GB/s at 256
    live tokens; the pure-DMA floor is ~5 us/layer)."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    length = jnp.minimum(lengths_ref[b], pl.num_programs(2) * block_s)
    n_blocks = pl.cdiv(length, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
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

        if pack:
            # Head-packed (rep==1): ONE MXU dot computes every head's
            # scores against every head's keys ([HB, Dh] x [HB*ps, Dh]T
            # -> [HB, HB*ps]); the off-diagonal (wrong-head) columns are
            # masked to -inf and die in the exp, so the probability
            # matrix is block-diagonal and PV is a second single dot.
            # 32x MXU waste, but the MXU was idle — this trades it for
            # 2 issues instead of 2*HB single-row GEMVs per block.
            kf = k_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            k_flat = kf.reshape(head_block * block_s, kf.shape[-1])
            qa = q_ref[0, :, 0].astype(jnp.float32)  # [HB, Dh]
            full = jax.lax.dot_general(
                qa, k_flat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [HB, HB*ps]  (HIGHEST: default MXU precision truncates
            # the f32 operands to bf16 — 2.8e-3 output error vs the
            # per-head GEMV baseline's 1e-6, verified on chip)
            col = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
            row = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
            own = (col // block_s) == row
            kpos_f = i * block_s + (col % block_s)
            s = jnp.where(own & (kpos_f < length), full, _MASK)
            m_prev = m_ref[:, 0:1]
            l_prev = l_ref[:, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)  # off-diagonal -> exp(_MASK-m) == 0
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

            cv.wait()
            vf = v_buf[slot].astype(jnp.float32)
            v_flat = vf.reshape(head_block * block_s, vf.shape[-1])
            pv = jnp.dot(p, v_flat, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            acc_ref[...] = acc_ref[...] * alpha[:, None, :] + pv[:, None, :]
            return  # this block fully handled
        if vpu:
            # rep==1: the per-head QK "matmuls" are [1, Dh] GEMVs — HB
            # single-row MXU issues per block whose fixed cost dominates
            # short walks.  One broadcast-multiply + lane reduction on
            # the VPU computes every head's scores at once.
            kf = k_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            qa = q_ref[0, :, 0].astype(jnp.float32)  # [HB, Dh]
            s_buf[...] = jnp.sum(qa[:, None, :] * kf, axis=-1)
        else:
            for h in range(head_block):
                q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
                k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
                s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = jnp.where(kpos < length, s_buf[...], _MASK)  # [HB*rep, ps]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)  # [HB*rep, 1]
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
        s_buf[...] = p

        cv.wait()
        if vpu:
            vf = v_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            pv = jnp.sum(s_buf[...][:, :, None] * vf, axis=1)  # [HB, Dh]
            acc_ref[...] = (acc_ref[...] * alpha[:, None, :]
                            + pv[:, None, :])
        else:
            for h in range(head_block):
                v = v_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
                p_h = s_buf[h * rep : (h + 1) * rep, :]
                pv = jnp.dot(p_h, v, preferred_element_type=jnp.float32)
                acc_ref[h] = (acc_ref[h]
                              * alpha[h * rep : (h + 1) * rep] + pv)

    @pl.when(i == n_blocks - 1)
    def _():
        l = l_ref[:, 0:1]  # [HB*rep, 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        for h in range(head_block):
            o_ref[0, h] = (
                acc_ref[h] * l_inv[h * rep : (h + 1) * rep]
            ).astype(o_ref.dtype)


def _kernel_loop(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,
    v_sem,
    *,
    block_s: int,
    head_block: int,
    n_blocks_max: int,
):
    """Dynamic-trip-count variant: grid is (B, Hkv/hb) and the block walk
    is an in-kernel fori_loop over ceil(length/ps) — the grid-per-block
    form pays ~1 us per PREDICATED-OFF cell, which at 2048-ctx cache and
    short live lengths (6 dead blocks x 4 head groups x 32 layers)
    costs more than the attention itself (trace, BENCH_NOTES round 2).
    Softmax state rides the loop carry (registers), not scratch."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    Dh = q_ref.shape[3]
    length = jnp.minimum(lengths_ref[b], n_blocks_max * block_s)
    n_blocks = pl.cdiv(length, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
        return k, v

    @pl.when(n_blocks > 0)
    def _():
        ck, cv = copies(0, 0)
        ck.start()
        cv.start()

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            nk, nv = copies(i + 1, (i + 1) % 2)
            nk.start()
            nv.start()

        ck, cv = copies(i, slot)
        ck.wait()

        s_rows = []
        for h in range(head_block):
            q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
            k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
            s_rows.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        s = jnp.concatenate(s_rows, axis=0)  # [HB*rep, ps]

        kpos = i * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < length, s, _MASK)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=1, keepdims=True)

        cv.wait()
        pvs = []
        for h in range(head_block):
            v = v_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
            p_h = p[h * rep : (h + 1) * rep, :]
            pvs.append(jnp.dot(p_h, v, preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pvs, axis=0)  # [HB*rep, Dh]
        return m_next, l_next, acc * alpha + pv

    hbr = head_block * rep
    m0 = jnp.full((hbr, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((hbr, 1), jnp.float32)
    acc0 = jnp.zeros((hbr, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * l_inv).reshape(head_block, rep, Dh).astype(o_ref.dtype)


def _kernel_vec_append(
    lengths_ref,  # SMEM [B]  (length INCLUDING the token being appended)
    q_ref,  # VMEM [1, HB, rep, Dh]
    kn_ref,  # VMEM [1, HB, Dh]  new K row (cache dtype, RoPE'd)
    vn_ref,  # VMEM [1, HB, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    ko_hbm,  # ANY — aliases k_hbm (in-place cache append target)
    vo_hbm,  # ANY — aliases v_hbm
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    ks_buf,  # VMEM [HB, 8, Dh]  tile-aligned RMW slab for the K append
    vs_buf,
    k_sem,
    v_sem,
    kr_sem,  # DMA sems for the append slab reads
    vr_sem,
    kw_sem,  # DMA sems for the cache append write-backs
    vw_sem,
    *,
    block_s: int,
    head_block: int,
    vpu: bool = False,
):
    """_kernel_vec fused with the KV-cache append.

    The per-step cache update used to be a chain of 2 x B x L host-graph
    dynamic_update_slice ops (O(B) program size, ~us each of fixed
    dispatch cost — the 'glue' tail in the decode trace).  Here the
    kernel walks the OLD cache ([0, length-1)) and merges the new
    token's attention contribution analytically at the end (one extra
    online-softmax column: s_new = q·k_new, value row v_new), while the
    new K/V rows land in the aliased HBM cache via a tile-aligned
    read-modify-write: Mosaic only DMAs (8, 128)-tile-aligned HBM
    slices, so the 8-row slab containing the append slot reads in at
    cell start (overlapped with the walk), the row is masked in, and
    the slab writes back at the end.  Walk reads finish before the
    write-back within a cell, cells touch disjoint head ranges, and
    slab rows below the append slot are rewritten with identical bytes
    — no ordering hazard; outputs are bit-identical to
    update-then-attend.
    """
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    S = pl.num_programs(2) * block_s
    length = jnp.minimum(lengths_ref[b], S)
    pos = jnp.maximum(length - 1, 0)  # slot the new token lands in
    len_old = pos  # valid tokens already in the cache
    n_blocks = pl.cdiv(len_old, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
        return k, v

    blk_w = pos // block_s
    row8 = ((pos % block_s) // 8) * 8  # slab start, 8-row tile aligned

    def slab_reads():
        kr = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            ks_buf, kr_sem,
        )
        vr = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            vs_buf, vr_sem,
        )
        return kr, vr

    def slab_writes():
        kw = pltpu.make_async_copy(
            ks_buf,
            ko_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            kw_sem,
        )
        vw = pltpu.make_async_copy(
            vs_buf,
            vo_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            vw_sem,
        )
        return kw, vw

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        kr, vr = slab_reads()
        kr.start()
        vr.start()

        @pl.when(n_blocks > 0)
        def _():
            ck, cv = copies(0, 0)
            ck.start()
            cv.start()

    @pl.when(i < n_blocks)
    def _():
        @pl.when(i + 1 < n_blocks)
        def _():
            nk, nv = copies(i + 1, (i + 1) % 2)
            nk.start()
            nv.start()

        slot = i % 2
        ck, cv = copies(i, slot)
        ck.wait()

        if vpu:
            # See _kernel_vec: all-heads scores as one VPU
            # broadcast-multiply + lane reduction (rep==1).
            kf = k_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            qa = q_ref[0, :, 0].astype(jnp.float32)  # [HB, Dh]
            s_buf[...] = jnp.sum(qa[:, None, :] * kf, axis=-1)
        else:
            for h in range(head_block):
                q = q_ref[0, h].astype(jnp.float32)  # [rep, Dh]
                k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
                s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = jnp.where(kpos < len_old, s_buf[...], _MASK)
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
        if vpu:
            vf = v_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            pv = jnp.sum(s_buf[...][:, :, None] * vf, axis=1)  # [HB, Dh]
            acc_ref[...] = (acc_ref[...] * alpha[:, None, :]
                            + pv[:, None, :])
        else:
            for h in range(head_block):
                v = v_buf[slot, h].astype(jnp.float32)
                p_h = s_buf[h * rep : (h + 1) * rep, :]
                pv = jnp.dot(p_h, v, preferred_element_type=jnp.float32)
                acc_ref[h] = (acc_ref[h]
                              * alpha[h * rep : (h + 1) * rep] + pv)

    @pl.when(i == jnp.maximum(n_blocks, 1) - 1)
    def _():
        # Merge the just-appended token: one extra online-softmax column.
        hb = head_block
        Dh = q_ref.shape[3]
        qf = q_ref[0].astype(jnp.float32)  # [hb, rep, Dh]
        knf = kn_ref[0].astype(jnp.float32)[:, None, :]  # [hb, 1, Dh]
        vnf = vn_ref[0].astype(jnp.float32)[:, None, :]  # [hb, 1, Dh]
        s_new = jnp.sum(qf * knf, axis=-1).reshape(hb * rep, 1)
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_next = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_next)  # [hb*rep, 1]
        p_new = jnp.exp(s_new - m_next)
        l = alpha * l_prev + p_new
        acc = acc_ref[...] * alpha.reshape(hb, rep, 1) + (
            p_new.reshape(hb, rep, 1) * vnf
        )
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l).reshape(hb, rep, 1)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

        # Masked row insert + slab write-back (no row-granular VMEM or
        # HBM slicing: both would violate Mosaic tiling constraints).
        kr, vr = slab_reads()
        kr.wait()
        vr.wait()
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (hb, 8, Dh), 1)
        at_row = row_ids == (pos % 8)
        ks_buf[...] = jnp.where(
            at_row, kn_ref[0].astype(ks_buf.dtype)[:, None, :], ks_buf[...])
        vs_buf[...] = jnp.where(
            at_row, vn_ref[0].astype(vs_buf.dtype)[:, None, :], vs_buf[...])
        kw, vw = slab_writes()
        kw.start()
        vw.start()
        kw.wait()
        vw.wait()


def _kernel_vec_stats(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh] f32  UNNORMALIZED accumulator
    mo_ref,  # VMEM [1, HB*rep, 128] f32  row max
    lo_ref,  # VMEM [1, HB*rep, 128] f32  row sum
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    k_sem,
    v_sem,
    *,
    block_s: int,
    head_block: int,
):
    """_kernel_vec returning softmax PARTIALS (o*l, m, l) instead of the
    normalized output — the per-shard half of a cross-chip
    online-softmax merge (parallel/ring.decode_attend_cp).  A shard with
    length 0 emits (0, -inf, 0), the merge identity."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    length = jnp.minimum(lengths_ref[b], pl.num_programs(2) * block_s)
    n_blocks = pl.cdiv(length, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
        return k, v

    @pl.when((i == 0) & (n_blocks == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        mo_ref[...] = jnp.full_like(mo_ref, -jnp.inf)
        lo_ref[...] = jnp.zeros_like(lo_ref)

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
            q = q_ref[0, h].astype(jnp.float32)
            k = k_buf[slot, h].astype(jnp.float32)
            s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        kpos = i * block_s + jax.lax.broadcasted_iota(
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
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)
        mo_ref[0] = m_ref[...]
        lo_ref[0] = l_ref[...]


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode_stats(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]
    v_cache: jax.Array,
    lengths: jax.Array,  # [B] int32 (0 allowed: emits the merge identity)
    *,
    block_s: int = 256,
    head_block: int = 32,
    interpret: bool = False,
):
    """Length-aware decode attention returning softmax partials.

    Returns (o_unnorm f32 [B, Hkv, rep, Dh], m f32 [B, Hkv*rep, 128],
    l f32 [B, Hkv*rep, 128]) — columns of m/l are replicated; consume
    [..., 0:1].  o = o_unnorm / l after the cross-shard merge.
    """
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, k_cache.dtype.itemsize)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (B, Hkv // hb, n_blocks)
    kernel = functools.partial(
        _kernel_vec_stats, block_s=bs, head_block=hb
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, hb * rep, 128), lambda b, h, i, *_: (b, h, 0)
                ),
                pl.BlockSpec(
                    (1, hb * rep, 128), lambda b, h, i, *_: (b, h, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, bs), jnp.float32),
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv * rep, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv * rep, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
    )


def _kernel_walk_append(
    lengths_ref,  # SMEM [B]  (length INCLUDING the token being appended)
    q_ref,  # VMEM [B, HB, rep, Dh]
    kn_ref,  # VMEM [B, HB, Dh]
    vn_ref,  # VMEM [B, HB, Dh]
    k_hbm,  # ANY [B, Hkv, n_blocks, ps, Dh]
    v_hbm,
    o_ref,  # VMEM [B, HB, rep, Dh]
    ko_hbm,  # ANY — aliases k_hbm
    vo_hbm,  # ANY — aliases v_hbm
    m_ref,  # VMEM [B, HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [B, HB, rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    k_buf,  # VMEM [2, HB, ps, Dh]
    v_buf,
    ks_buf,  # VMEM [B, HB, 8, Dh]  per-slot tile-aligned RMW slabs
    vs_buf,
    k_sem,
    v_sem,
    kr_sem,  # DMA sems (B,) for the append slab reads
    vr_sem,
    kw_sem,
    vw_sem,
    *,
    block_s: int,
    head_block: int,
    batch: int,
    vpu: bool = False,
    pack: bool = False,
):
    """Multi-slot flattened walk: ONE grid cell per head group runs a
    single uniform fori_loop over (slot, block) items, so the double
    buffer stays primed ACROSS slot boundaries.  The grid-per-slot form
    (_kernel_vec_append) exposes the first block's DMA latency once per
    slot per layer — at B=8 short-context serve shapes that is most of
    the attention cost (each slot only walks 1-2 live blocks, so there
    is nothing within the slot to overlap the first fetch with).  Every
    slot walks the same cdiv(max length, ps) items; blocks past a
    slot's own length are DMA overfetch, masked in compute — slots in a
    serve batch sit within a chunk of each other, so the waste is
    bounded by one block per slot."""
    hg = pl.program_id(0)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    Dh = q_ref.shape[-1]
    S = k_hbm.shape[2] * block_s

    def pos_of(b):
        # Slot the new token lands in == old valid length (clamped).
        return jnp.maximum(jnp.minimum(lengths_ref[b], S) - 1, 0)

    max_old = pos_of(0)
    for b in range(1, batch):
        max_old = jnp.maximum(max_old, pos_of(b))
    # Uniform per-slot walk length; at least one item per slot so the
    # final-item merge/output always runs (all-masked when len_old==0).
    nb = jnp.maximum(pl.cdiv(max_old, block_s), 1)

    def walk_copies(b, blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk], k_buf.at[slot],
            k_sem.at[slot],
        )
        v = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk], v_buf.at[slot],
            v_sem.at[slot],
        )
        return k, v

    def slab_reads(b):
        blk_w = pos_of(b) // block_s
        row8 = ((pos_of(b) % block_s) // 8) * 8
        kr = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            ks_buf.at[b], kr_sem.at[b],
        )
        vr = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            vs_buf.at[b], vr_sem.at[b],
        )
        return kr, vr

    def slab_writes(b):
        blk_w = pos_of(b) // block_s
        row8 = ((pos_of(b) % block_s) // 8) * 8
        kw = pltpu.make_async_copy(
            ks_buf.at[b],
            ko_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            kw_sem.at[b],
        )
        vw = pltpu.make_async_copy(
            vs_buf.at[b],
            vo_hbm.at[b, pl.ds(h0, head_block), blk_w, pl.ds(row8, 8)],
            vw_sem.at[b],
        )
        return kw, vw

    # Prime: all append-slab reads (they overlap the whole walk) and the
    # first walk block.
    for b in range(batch):
        kr, vr = slab_reads(b)
        kr.start()
        vr.start()
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

        if pack:
            # Head-packed scores (see _kernel_vec): one block-diagonal-
            # masked MXU dot for all heads, PV as a second single dot
            # over the (block-diagonal) probability matrix.  Measured
            # -14% on the walk at B=1 short ctx, wash when DMA-bound.
            kf = k_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            k_flat = kf.reshape(head_block * block_s, kf.shape[-1])
            qa = q_ref[pl.ds(b, 1)][0][:, 0].astype(jnp.float32)
            full = jax.lax.dot_general(
                qa, k_flat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [HB, HB*ps]  (HIGHEST: default MXU precision truncates
            # the f32 operands to bf16 — 2.8e-3 output error vs the
            # per-head GEMV baseline's 1e-6, verified on chip)
            colp = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
            rowp = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
            own = (colp // block_s) == rowp
            kpos_f = i * block_s + (colp % block_s)
            len_old_p = pos_of(b)
            s = jnp.where(own & (kpos_f < len_old_p), full, _MASK)
            m_prev = m_ref[pl.ds(b, 1)][0][:, 0:1]
            l_prev = l_ref[pl.ds(b, 1)][0][:, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)  # off-diagonal -> 0
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[pl.ds(b, 1)] = jnp.broadcast_to(
                m_next, (1,) + m_ref.shape[1:])
            l_ref[pl.ds(b, 1)] = jnp.broadcast_to(
                l_next, (1,) + l_ref.shape[1:])

            cv.wait()
            vf = v_buf[slot].astype(jnp.float32)
            v_flat = vf.reshape(head_block * block_s, vf.shape[-1])
            pv = jnp.dot(p, v_flat, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            acc = acc_ref[pl.ds(b, 1)][0]
            acc = (acc * alpha.reshape(head_block, rep, 1)
                   + pv.reshape(head_block, rep, vf.shape[-1]))
            acc_ref[pl.ds(b, 1)] = acc[None]
        elif vpu:
            kf = k_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
            qa = q_ref[pl.ds(b, 1)][0][:, 0].astype(jnp.float32)  # [HB, Dh]
            s_buf[...] = jnp.sum(qa[:, None, :] * kf, axis=-1)
        else:
            for h in range(head_block):
                qh = q_ref[pl.ds(b, 1), h][0].astype(jnp.float32)
                k = k_buf[slot, h].astype(jnp.float32)  # [ps, Dh]
                s_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                    qh, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if not pack:
            len_old = pos_of(b)
            kpos = i * block_s + jax.lax.broadcasted_iota(
                jnp.int32, s_buf.shape, 1
            )
            s = jnp.where(kpos < len_old, s_buf[...], _MASK)
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
            if vpu:
                vf = v_buf[slot].astype(jnp.float32)  # [HB, ps, Dh]
                pv = jnp.sum(s_buf[...][:, :, None] * vf, axis=1)  # [HB, Dh]
                pv = pv.reshape(head_block, rep, Dh)
            else:
                pvs = []
                for h in range(head_block):
                    v = v_buf[slot, h].astype(jnp.float32)
                    p_h = s_buf[h * rep : (h + 1) * rep, :]
                    pvs.append(jnp.dot(p_h, v,
                                       preferred_element_type=jnp.float32))
                pv = jnp.concatenate(pvs, axis=0).reshape(head_block, rep, Dh)
            acc = acc * alpha.reshape(head_block, rep, 1) + pv
            acc_ref[pl.ds(b, 1)] = acc[None]


        @pl.when(i == nb - 1)
        def _():
            # This slot's walk is done: merge the just-appended token
            # (one extra online-softmax column) and emit its output.
            hb = head_block
            qf = q_ref[pl.ds(b, 1)][0].astype(jnp.float32)  # [hb, rep, Dh]
            knf = kn_ref[pl.ds(b, 1)][0].astype(jnp.float32)[:, None, :]
            vnf = vn_ref[pl.ds(b, 1)][0].astype(jnp.float32)[:, None, :]
            s_new = jnp.sum(qf * knf, axis=-1).reshape(hb * rep, 1)
            m_p = m_ref[pl.ds(b, 1)][0][:, 0:1]
            l_p = l_ref[pl.ds(b, 1)][0][:, 0:1]
            m_n = jnp.maximum(m_p, s_new)
            al = jnp.exp(m_p - m_n)
            p_new = jnp.exp(s_new - m_n)
            l = al * l_p + p_new
            acc_b = acc_ref[pl.ds(b, 1)][0]
            acc_b = acc_b * al.reshape(hb, rep, 1) + (
                p_new.reshape(hb, rep, 1) * vnf
            )
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l).reshape(hb, rep, 1)
            o_ref[pl.ds(b, 1)] = (acc_b * l_inv).astype(o_ref.dtype)[None]

            kr, vr = slab_reads(b)
            kr.wait()
            vr.wait()
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (hb, 8, Dh), 1)
            at_row = row_ids == (pos_of(b) % 8)
            knr = kn_ref[pl.ds(b, 1)][0]
            vnr = vn_ref[pl.ds(b, 1)][0]
            ks_buf[pl.ds(b, 1)] = jnp.where(
                at_row, knr.astype(ks_buf.dtype)[:, None, :],
                ks_buf[pl.ds(b, 1)][0])[None]
            vs_buf[pl.ds(b, 1)] = jnp.where(
                at_row, vnr.astype(vs_buf.dtype)[:, None, :],
                vs_buf[pl.ds(b, 1)][0])[None]
            kw, vw = slab_writes(b)
            kw.start()
            vw.start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)
    # Drain the append write-backs only once, after the whole walk:
    # each slot's write was started at its last item, targets a region
    # no other slot reads, and its source slab buffer is never touched
    # again — waiting per slot inside the loop exposed the full write
    # latency batch times per layer.
    for b in range(batch):
        kw, vw = slab_writes(b)
        kw.wait()
        vw.wait()


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"),
                   donate_argnums=(3, 4))
def flash_decode_append_walk(
    q: jax.Array,  # [B, Hkv, rep, Dh]  (pre-scaled by 1/sqrt(Dh))
    k_new: jax.Array,  # [B, Hkv, Dh]  cache dtype, RoPE'd
    v_new: jax.Array,  # [B, Hkv, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]  donated (updated in place)
    v_cache: jax.Array,
    lengths: jax.Array,  # [B] int32: valid tokens INCLUDING the new one
    *,
    block_s: int | None = None,
    head_block: int = 32,
    interpret: bool = False,
):
    """flash_decode_append with the multi-slot flattened walk
    (_kernel_walk_append); same signature and results."""
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    if block_s is None:
        env = _os2.environ.get("THAWK_DECODE_BS")
        block_s = int(env) if env else (128 if S <= 1024 else 256)
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, k_cache.dtype.itemsize)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (Hkv // hb,)
    kernel = functools.partial(
        _kernel_walk_append, block_s=bs, head_block=hb, batch=B,
        vpu=_os2.environ.get("THAWK_ATTN_VPU", "0") == "1" and rep == 1,
        pack=_os2.environ.get("THAWK_ATTN_PACK", "0") == "1" and rep == 1)
    out, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)),
                pl.BlockSpec((B, hb, Dh), lambda h, *_: (0, h, 0)),
                pl.BlockSpec((B, hb, Dh), lambda h, *_: (0, h, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((B, hb, rep, Dh), lambda h, *_: (0, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb * rep, 128), jnp.float32),
                pltpu.VMEM((B, hb, rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, bs), jnp.float32),
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.VMEM((B, hb, 8, Dh), k_cache.dtype),
                pltpu.VMEM((B, hb, 8, Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
                pltpu.SemaphoreType.DMA((B,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_view, k_cache.dtype),
            jax.ShapeDtypeStruct(kv_view, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
    )
    return out, kc.reshape(k_cache.shape), vc.reshape(v_cache.shape)


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"),
                   donate_argnums=(3, 4))
def flash_decode_append(
    q: jax.Array,  # [B, Hkv, rep, Dh]  (pre-scaled by 1/sqrt(Dh))
    k_new: jax.Array,  # [B, Hkv, Dh]  cache dtype, RoPE'd
    v_new: jax.Array,  # [B, Hkv, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]  donated (updated in place)
    v_cache: jax.Array,
    lengths: jax.Array,  # [B] int32: valid tokens INCLUDING the new one
    *,
    block_s: int | None = None,
    head_block: int = 32,
    interpret: bool = False,
):
    """Fused decode attention + KV-cache append.

    Returns (out [B, Hkv, rep, Dh], k_cache, v_cache) where the caches
    have the new token written at slot lengths-1 (clamped to capacity) and
    out attends over all `lengths` tokens.  Replaces the per-layer
    update_kv_cache dus chain + flash_decode_dma pair with one kernel
    (cache buffers alias in place via input_output_aliases).

    THAWK_DECODE_WALK=1 selects the multi-slot flattened-walk variant
    (_kernel_walk_append): one grid cell per head group keeps the DMA
    double buffer primed across slot boundaries instead of exposing the
    first block's fetch latency once per slot.
    """
    if _os2.environ.get("THAWK_DECODE_WALK", "1") == "1":
        return flash_decode_append_walk(
            q, k_new, v_new, k_cache, v_cache, lengths,
            block_s=block_s, head_block=head_block, interpret=interpret,
        )
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    if block_s is None:
        # Walk-block size trades per-cell fixed cost (big blocks win at
        # long contexts) against block-granularity DMA overfetch beyond
        # the live length (small blocks win short: 160.4 -> 162.4 tok/s
        # at the 512-ctx flagship config).  S is the static proxy for
        # the live length.
        env = _os2.environ.get("THAWK_DECODE_BS")
        block_s = int(env) if env else (128 if S <= 1024 else 256)
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, k_cache.dtype.itemsize)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (B, Hkv // hb, n_blocks)
    kernel = functools.partial(
        _kernel_vec_append, block_s=bs, head_block=hb,
        vpu=_os2.environ.get("THAWK_ATTN_VPU", "0") == "1" and rep == 1)
    out, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, Dh), lambda b, h, i, *_: (b, h, 0)),
                pl.BlockSpec((1, hb, Dh), lambda b, h, i, *_: (b, h, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.float32),
                pltpu.VMEM((hb * rep, bs), jnp.float32),
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.VMEM((hb, 8, Dh), k_cache.dtype),
                pltpu.VMEM((hb, 8, Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_view, k_cache.dtype),
            jax.ShapeDtypeStruct(kv_view, v_cache.dtype),
        ],
        # Flattened operand indices (incl. the scalar prefetch arg):
        # 0 lengths, 1 q, 2 k_new, 3 v_new, 4 k_cache, 5 v_cache.
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # Reserve (nearly) all of VMEM as this kernel's scoped space.
            # Without this, XLA's memory-space assignment may decide to
            # stage the aliased CACHE operands/results in alternate
            # memory around the call — a full HBM->VMEM->HBM round trip
            # of the KV cache per layer per step (measured: 55.4 -> 50.6
            # tok/s on the f16 7B config, ~290 cache-sized copies/tok).
            # The kernel streams the cache via its own manual DMA; the
            # reservation tells MSA there is no room to "help".
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
    )
    return out, kc.reshape(k_cache.shape), vc.reshape(v_cache.shape)


import os as _os

DECODE_VEC = _os.environ.get("THAWK_DECODE_VEC", "1") == "1"
# VPU-scores variant (rep==1 only): compute all heads' QK scores and PV
# outputs as broadcast-multiply + reductions instead of per-head
# single-row MXU dots (2*HB GEMV issues per block).  A/B knob.
# NEGATIVE result on v5e (BENCH_NOTES round 5): 46.5 vs 32.7 us/layer
# at B=8 — the VPU reduction traffic costs more than the GEMV issues.
_ATTN_VPU = _os.environ.get("THAWK_ATTN_VPU", "0") == "1"
# Head-packed variant (rep==1 only): one block-diagonal-masked MXU dot
# for all heads' scores and one for PV, instead of 2*HB GEMVs.  A/B
# knob (32x MXU waste traded for 2 issues per block).
_ATTN_PACK = _os.environ.get("THAWK_ATTN_PACK", "0") == "1"
# Negative result (BENCH_NOTES round 2): the in-kernel dynamic block
# loop measured NEUTRAL vs the grid-per-block form (9.5 vs 9.4 us/layer
# at 64 live, S=2048) — Mosaic's predicated-off grid cells are ~free, and
# the short-length floor is per-cell fixed cost + block-granularity DMA
# overfetch (bs=128 trades -13% short for -10% long; bs=256 kept).
# The loop form is kept selectable for shapes where grids explode.
DECODE_LOOP = _os.environ.get("THAWK_DECODE_LOOP", "0") == "1"


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode_loop(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]
    v_cache: jax.Array,
    lengths: jax.Array,  # [B] int32
    *,
    block_s: int = 256,
    head_block: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """flash_decode_dma with the in-kernel dynamic block loop."""
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, k_cache.dtype.itemsize)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (B, Hkv // hb)
    kernel = functools.partial(
        _kernel_loop, block_s=bs, head_block=hb, n_blocks_max=n_blocks
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, rep, Dh), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, hb, rep, Dh), lambda b, h, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
    )


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode_dma(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh]
    v_cache: jax.Array,
    lengths: jax.Array,  # [B] int32
    *,
    block_s: int = 256,
    head_block: int = 32,
    interpret: bool = False,
) -> jax.Array:
    if DECODE_LOOP:
        return flash_decode_loop(
            q, k_cache, v_cache, lengths,
            block_s=block_s, head_block=head_block, interpret=interpret,
        )
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, k_cache.dtype.itemsize)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (B, Hkv // hb, n_blocks)
    if DECODE_VEC:
        kernel = functools.partial(
            _kernel_vec, block_s=bs, head_block=hb,
            vpu=_ATTN_VPU and rep == 1,
            pack=_ATTN_PACK and rep == 1)
        ml_shape = (hb * rep, 128)
        extra = [pltpu.VMEM((hb * rep, bs), jnp.float32)]
    else:
        kernel = functools.partial(_kernel, block_s=bs, head_block=hb)
        ml_shape = (hb, rep, 128)
        extra = []
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
                pltpu.VMEM(ml_shape, jnp.float32),
                pltpu.VMEM(ml_shape, jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.float32),
                *extra,
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
    )
