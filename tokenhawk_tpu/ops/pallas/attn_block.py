"""Fused decode attention block: append + attend + Wo + residual.

One Pallas call computes

    x' = x + attend(q, cache+new_kv) @ Wo

for a single decode token (B=1, rep=1), with the new K/V rows landing in
the aliased HBM cache (same tile-aligned RMW as flash_decode_append).
The grid runs the KV walk cells first, then the Wo column tiles:

    grid = (S//bs walk cells ..., nwo Wo tiles)

Two overlap mechanisms make the fusion pay:

  * The attention accumulator lives as one [8, H*Dh] f32 row (head h at
    lane offset h*Dh), so the Wo phase consumes it directly as the
    matmul LHS — no [H, Dh] -> [1, D] relayout between attention and
    the projection.
  * Wo weights stream through a MANUAL multi-slot DMA ring whose first
    fetches issue at cell 0 — the full weight stream runs concurrently
    with the latency-bound KV walk (a BlockSpec pipeline would only run
    one block ahead, serializing most of the stream behind the walk;
    measured -1.8% in that form vs +~3% with the ring).

The reference runs these as separate dispatches with a full command-
buffer boundary between attention and the output projection
(/root/reference/th-llama.cpp:340-392).

Fallbacks: B > 1, GQA (rep > 1), unsupported Wo kinds, or ragged dims
use flash_decode_append + the standalone qmatmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenhawk_tpu.ops.pallas.qmatmul import (
    GROUP,
    _apply_scales,
    _pick_block,
    _pick_sub,
)

_MASK = -1e30
_RING = 3  # Wo DMA ring depth (tiles in flight during the KV walk)


def _attn_wo_kernel(
    lengths_ref,  # SMEM [1]
    q_ref,  # VMEM [1, H, 1, Dh]  (pre-scaled by 1/sqrt(Dh))
    kn_ref,  # VMEM [1, H, Dh]  new K row (cache dtype, RoPE'd)
    vn_ref,  # VMEM [1, H, Dh]
    k_hbm,  # ANY [1, H, SB, bs, Dh]
    v_hbm,  # ANY
    x_ref,  # VMEM [8, bn]  residual tile (row 0 live)
    wq_hbm,  # ANY [Dq, D]  Wo codes; the ring DMAs [:, t*bn:(t+1)*bn] tiles
    ws_hbm,  # ANY [Dq//32, D]
    xo_ref,  # VMEM [8, bn]  output tile
    ko_hbm,  # ANY — aliases k_hbm
    vo_hbm,  # ANY — aliases v_hbm
    m_ref,  # VMEM [H, 128] f32
    l_ref,  # VMEM [H, 128] f32
    acc_ref,  # VMEM [8, H*Dh] f32 (row 0 = ctx, rows 1..7 zero)
    s_buf,  # VMEM [H, bs] f32
    k_buf,  # VMEM [2, H, bs, Dh]
    v_buf,
    ks_buf,  # VMEM [H, 8, Dh]  RMW slab for the K append
    vs_buf,
    wq_buf,  # VMEM [R, Dq, bn]  Wo ring
    ws_buf,  # VMEM [R, Dq//32, bn]
    k_sem,
    v_sem,
    kr_sem,
    vr_sem,
    kw_sem,
    vw_sem,
    wq_sem,  # [R]
    ws_sem,  # [R]
    *,
    block_s: int,
    n_walk: int,  # static S // block_s
    n_wo: int,
    wo_sub: int,
):
    i = pl.program_id(0)
    H = q_ref.shape[1]
    Dh = q_ref.shape[3]
    S = n_walk * block_s
    length = jnp.minimum(lengths_ref[0], S)
    pos = jnp.maximum(length - 1, 0)
    len_old = pos
    n_blocks = pl.cdiv(len_old, block_s)

    def copies(blk, slot):
        k = pltpu.make_async_copy(
            k_hbm.at[0, :, blk], k_buf.at[slot], k_sem.at[slot])
        v = pltpu.make_async_copy(
            v_hbm.at[0, :, blk], v_buf.at[slot], v_sem.at[slot])
        return k, v

    bn = x_ref.shape[1]

    def wo_copies(t, r):
        wq = pltpu.make_async_copy(
            wq_hbm.at[:, pl.ds(t * bn, bn)], wq_buf.at[r], wq_sem.at[r])
        ws = pltpu.make_async_copy(
            ws_hbm.at[:, pl.ds(t * bn, bn)], ws_buf.at[r], ws_sem.at[r])
        return wq, ws

    blk_w = pos // block_s
    row8 = ((pos % block_s) // 8) * 8

    def slab_reads():
        kr = pltpu.make_async_copy(
            k_hbm.at[0, :, blk_w, pl.ds(row8, 8)], ks_buf, kr_sem)
        vr = pltpu.make_async_copy(
            v_hbm.at[0, :, blk_w, pl.ds(row8, 8)], vs_buf, vr_sem)
        return kr, vr

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        kr, vr = slab_reads()
        kr.start()
        vr.start()
        # Launch the Wo weight stream NOW: it rides the walk's latency.
        for r in range(min(_RING, n_wo)):
            wq, ws = wo_copies(r, r)
            wq.start()
            ws.start()

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

        for h in range(H):
            q = q_ref[0, h].astype(jnp.float32)  # [1, Dh]
            k = k_buf[slot, h].astype(jnp.float32)  # [bs, Dh]
            s_buf[h : h + 1, :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1)
        s = jnp.where(kpos < len_old, s_buf[...], _MASK)
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)  # [H, 1]
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
        s_buf[...] = p

        cv.wait()
        for h in range(H):
            v = v_buf[slot, h].astype(jnp.float32)  # [bs, Dh]
            pv = jnp.dot(s_buf[h : h + 1, :], v,
                         preferred_element_type=jnp.float32)  # [1, Dh]
            lane = slice(h * Dh, (h + 1) * Dh)
            acc_ref[0:1, lane] = acc_ref[0:1, lane] * alpha[h] + pv

    @pl.when(i == jnp.maximum(n_blocks, 1) - 1)
    def _():
        # Merge the appended token as one extra online-softmax column,
        # then normalize the accumulator row in place: the walk is done
        # (this cell), so acc becomes the finished context vector.
        qf = q_ref[0, :, 0].astype(jnp.float32)  # [H, Dh]
        knf = kn_ref[0].astype(jnp.float32)  # [H, Dh]
        vnf = vn_ref[0].astype(jnp.float32)  # [H, Dh]
        s_new = jnp.sum(qf * knf, axis=-1, keepdims=True)  # [H, 1]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_next = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_next)
        p_new = jnp.exp(s_new - m_next)
        l = alpha * l_prev + p_new
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)  # [H, 1]
        for h in range(H):
            lane = slice(h * Dh, (h + 1) * Dh)
            acc_ref[0:1, lane] = (
                acc_ref[0:1, lane] * alpha[h]
                + p_new[h] * vnf[h : h + 1, :]
            ) * l_inv[h]

        kr, vr = slab_reads()
        kr.wait()
        vr.wait()
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, 8, Dh), 1)
        at_row = row_ids == (pos % 8)
        ks_buf[...] = jnp.where(
            at_row, kn_ref[0].astype(ks_buf.dtype)[:, None, :], ks_buf[...])
        vs_buf[...] = jnp.where(
            at_row, vn_ref[0].astype(vs_buf.dtype)[:, None, :], vs_buf[...])
        kw = pltpu.make_async_copy(
            ks_buf, ko_hbm.at[0, :, blk_w, pl.ds(row8, 8)], kw_sem)
        vw = pltpu.make_async_copy(
            vs_buf, vo_hbm.at[0, :, blk_w, pl.ds(row8, 8)], vw_sem)
        kw.start()
        vw.start()
        kw.wait()
        vw.wait()

    @pl.when(i >= n_walk)
    def _():
        # Wo phase: this cell's column tile of x' = x + ctx @ Wo, fed
        # from the DMA ring (tiles launched up to _RING ahead).
        t = i - n_walk
        r = jax.lax.rem(t, _RING)

        @pl.when(t + _RING < n_wo)
        def _():
            nq, ns = wo_copies(t + _RING, jax.lax.rem(t + _RING, _RING))
            nq.start()
            ns.start()

        wq, ws = wo_copies(t, r)
        wq.wait()
        ws.wait()

        Dq = wq_buf.shape[1]
        ctx = acc_ref[...]  # [8, Dq] f32, rows 1..7 zero
        y = None
        for j in range(0, Dq, wo_sub):
            sub = min(wo_sub, Dq - j)
            w = wq_buf[r, j : j + sub, :].astype(jnp.float32)
            sc = ws_buf[r, j // GROUP : (j + sub) // GROUP, :].astype(
                jnp.float32)
            w = _apply_scales(w, sc)
            yj = jax.lax.dot_general(
                ctx[:, j : j + sub], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = yj if y is None else y + yj
        xo_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(
            xo_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "block_n", "interpret"),
)
def _attn_wo(
    q,  # [1, H, 1, Dh] pre-scaled
    k_new,  # [1, H, Dh]
    v_new,  # [1, H, Dh]
    k_cache,  # [1, H, S, Dh] donated
    v_cache,
    lengths,  # [1] int32 (incl. new token)
    x_res,  # [8, D] residual rows (row 0 live)
    wo_qs,  # [Dq, D] int4/int8
    wo_scales,  # [Dq//32, D]
    *,
    block_s: int,
    block_n: int,
    interpret: bool,
):
    B, H, rep, Dh = q.shape
    S = k_cache.shape[2]
    Dq, D = wo_qs.shape
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_walk = S // bs
    bn = _pick_block(D, block_n, 128)
    nwo = D // bn
    sg = Dq // GROUP

    kv_view = (1, H, n_walk, bs, Dh)
    grid = (n_walk + nwo,)
    kernel = functools.partial(
        _attn_wo_kernel, block_s=bs, n_walk=n_walk, n_wo=nwo,
        wo_sub=_pick_sub(Dq, 1024),
    )

    def wo_idx(i):
        return jnp.maximum(i - n_walk, 0)

    out, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, rep, Dh), lambda i, *_: (0, 0, 0, 0)),
                pl.BlockSpec((1, H, Dh), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((1, H, Dh), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, bn), lambda i, *_: (0, wo_idx(i))),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((8, bn), lambda i, *_: (0, wo_idx(i))),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((8, H * Dh), jnp.float32),
                pltpu.VMEM((H, bs), jnp.float32),
                pltpu.VMEM((2, H, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, H, bs, Dh), v_cache.dtype),
                pltpu.VMEM((H, 8, Dh), k_cache.dtype),
                pltpu.VMEM((H, 8, Dh), v_cache.dtype),
                pltpu.VMEM((_RING, Dq, bn), wo_qs.dtype),
                pltpu.VMEM((_RING, sg, bn), wo_scales.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((_RING,)),
                pltpu.SemaphoreType.DMA((_RING,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, D), x_res.dtype),
            jax.ShapeDtypeStruct(kv_view, k_cache.dtype),
            jax.ShapeDtypeStruct(kv_view, v_cache.dtype),
        ],
        # Flattened operand indices (incl. scalar prefetch arg 0):
        # 1 q, 2 k_new, 3 v_new, 4 k_cache, 5 v_cache, 6 x, 7 wq, 8 ws.
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Dq * D + 4 * H * S * Dh,
            bytes_accessed=(
                wo_qs.size // (2 if wo_qs.dtype in (jnp.int4, jnp.uint4)
                               else 1)
                + wo_scales.size * wo_scales.dtype.itemsize
                + 2 * H * S * Dh * k_cache.dtype.itemsize
            ),
            transcendentals=H * S,
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
        k_cache.reshape(kv_view), v_cache.reshape(kv_view),
        x_res, wo_qs, wo_scales,
    )
    return out, kc.reshape(k_cache.shape), vc.reshape(v_cache.shape)


def can_fuse_attn_out(wo, B: int, T: int, rep: int, Dh: int, S: int) -> bool:
    from tokenhawk_tpu.ops.qweight import QWeight

    if not (isinstance(wo, QWeight) and wo.kind in ("q8_0", "q4_0_i4")):
        return False
    if wo.mins is not None:
        return False
    if B != 1 or T != 1 or rep != 1:
        return False
    Dq, D = wo.qs.shape
    return Dh % 128 == 0 and S % 128 == 0 and Dq % 256 == 0 and D % 128 == 0


def fused_attn_out(
    x,  # [1, 1, D] residual input (pre-norm hidden state)
    q,  # [1, 1, H, Dh] post-rope, UNscaled
    k_new,  # [1, 1, H, Dh] post-rope
    v_new,  # [1, 1, H, Dh]
    k_cache,  # [1, H, S, Dh]
    v_cache,
    lengths,  # [1] int32 incl. the new token
    wo,  # QWeight [H*Dh, D]
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """x + attend(q, cache+kv) @ Wo for one decode token; returns
    (x' [1, 1, D], k_cache, v_cache)."""
    B, T, H, Dh = q.shape
    D = x.shape[-1]
    qg = (q[:, 0] * (1.0 / Dh**0.5)).reshape(1, H, 1, Dh)
    x8 = jnp.zeros((8, D), x.dtype).at[0].set(x.reshape(D))
    out, kc, vc = _attn_wo(
        qg, k_new[:, 0], v_new[:, 0], k_cache, v_cache, lengths,
        x8, wo.qs, wo.scales,
        block_s=block_s, block_n=512, interpret=interpret,
    )
    return out[0].reshape(1, 1, D), kc, vc
