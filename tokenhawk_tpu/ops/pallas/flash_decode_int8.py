"""Flash-decode over an int8-quantized KV cache — int8-native MXU path.

Length-aware manual-DMA + head-vectorized, mirroring
flash_decode_dma.py: the cache is viewed as [B, Hkv, n_blocks, ps, Dh]
and each (batch, head-group) cell walks only ceil(length/ps) blocks,
double-buffering the int8 K/V slabs via explicit async copies.  The
per-token scales (bf16, token-innermost — see ops/kvquant.py) are
manually DMA'd as one whole [HB, S] row per cell at block 0 (the token
axis innermost makes their lane dim 128-aligned; the old
lane-replicated [S, 8] layout was not DMA-able at all).  The full-row
copy includes the dead tail, but scales are 2/Dh of the payload bytes
(1.6% at Dh=128) so the waste is noise and it keeps the per-block DMA
machinery to the two big int8 slabs.

The KV stream never dequantizes (the f32-convert variant measured
compute-bound at 259 GB/s vs the bf16 kernel's 692 — the int8 unpack +
convert per element ate the traffic win).  Instead:

  * QK: the query row is quantized once per cell to int8 (per-row
    absmax scale), and scores come from s8 x s8 -> s32 MXU dots.  The
    per-token K scale folds into score space:
    q.(k_i8*ksc)^T == (q_i8.k_i8^T) * qs * ksc_row — with the
    token-innermost scale layout, ksc_row is already a [HB, ps] tile.
  * PV: fold the V scales into the probability rows (p * vsc_row),
    quantize those rows to int8 on the fly (per-row absmax; p is
    bounded by 1 so this is the standard int8-attention step), and run
    a second s8 x s8 -> s32 MXU dot.

Zero per-element VPU work on the KV stream; the only VPU ops touch
[HB, ps] score tiles.  Quantizing q and p adds ~0.4% relative error on
top of the int8 cache rounding — same error class as the cache itself.

The fully-vectorized path requires rep == 1 (MHA: one q row per KV
head, so score tiles are [HB, ps] with one head per sublane).  GQA
(rep > 1) uses a per-head variant of the same math.

KV HBM traffic vs the bf16 cache: (1 + 2/Dh)/2 ~ 0.51x at Dh=128.

Shapes:
  q         [B, Hkv, rep, Dh]  (pre-scaled by 1/sqrt(Dh))
  k_cache   int8 [B, Hkv, S, Dh]
  ks_cache  bf16 [B, Hkv, S]
  v_cache   int8 [B, Hkv, S, Dh]
  vs_cache  bf16 [B, Hkv, S]
  lengths   [B] int32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)

# Budget for the whole-S bf16 scale rows staged in VMEM (2 * hb * S * 2B).
_INT8_SCALE_VMEM = 2 * 1024 * 1024


def _pick_hb_int8(head_block: int, Hkv: int, rep: int, bs: int, Dh: int,
                  itemsize: int, S: int) -> int:
    """_pick_hb, then shrink for the whole-S scale rows — stepping only
    through LEGAL sizes (divides Hkv; 8-aligned or the whole axis).  A
    raw decrement recreated the illegal partial block _pick_hb exists to
    avoid: 13B's Hkv=40 with int8 KV at S>13107 stepped 40 -> 20, a
    20-head sublane block Mosaic rejects."""
    from tokenhawk_tpu.ops.pallas.flash_decode_dma import _pick_hb

    hb = _pick_hb(head_block, Hkv, rep, bs, Dh, itemsize)
    while hb > 1 and 4 * hb * S > _INT8_SCALE_VMEM:
        hb = max((h for h in range(1, hb)
                  if Hkv % h == 0 and (h == Hkv or h % 8 == 0)),
                 default=1)
    return hb


def _kernel(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, HB, rep, Dh]
    k_hbm,  # ANY int8 [B, Hkv, n_blocks, ps, Dh]
    ks_hbm,  # ANY bf16 [B, Hkv, S]
    v_hbm,
    vs_hbm,
    o_ref,  # VMEM [1, HB, rep, Dh]
    m_ref,  # VMEM [HB*rep, 128] f32
    l_ref,
    acc_ref,  # VMEM [HB*rep, Dh] f32
    s_buf,  # VMEM [HB*rep, ps] f32
    qi_ref,  # VMEM [HB, rep, Dh] int8   (quantized query)
    qs_ref,  # VMEM [HB*rep, 128] f32    (query scales, per row)
    pv_buf,  # VMEM [HB*rep, Dh] int32
    k_buf,  # VMEM [2, HB, ps, Dh] int8
    v_buf,
    ks_sbuf,  # VMEM [HB, S] bf16 (whole scale row, fetched at block 0)
    vs_sbuf,
    k_sem,  # DMA sems (2,) x2
    v_sem,
    ks_sem,  # DMA sems () x2
    vs_sem,
    *,
    block_s: int,
    head_block: int,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    i = pl.program_id(2)
    h0 = hg * head_block
    rep = q_ref.shape[2]
    length = jnp.minimum(lengths_ref[b], pl.num_programs(2) * block_s)
    n_blocks = pl.cdiv(length, block_s)

    hs = pl.ds(h0, head_block)

    def copies(blk, slot):
        mk = pltpu.make_async_copy
        return (
            mk(k_hbm.at[b, hs, blk], k_buf.at[slot], k_sem.at[slot]),
            mk(v_hbm.at[b, hs, blk], v_buf.at[slot], v_sem.at[slot]),
        )

    @pl.when(i < n_blocks)
    def _():
        @pl.when(i == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            # Quantize the query rows once per (batch, head-group):
            # per-row absmax -> int8 codes + f32 scale.
            qf = q_ref[0].astype(jnp.float32)  # [HB, rep, Dh]
            qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
            qinv = jnp.where(qmax > 0.0, 127.0 / jnp.where(qmax > 0.0, qmax, 1.0), 0.0)
            qi_ref[...] = jnp.round(qf * qinv).astype(jnp.int8)
            qs_ref[...] = jnp.broadcast_to(
                (qmax * (1.0 / 127.0)).reshape(head_block * rep, 1),
                qs_ref.shape,
            )
            for c in copies(0, 0):
                c.start()
            cks = pltpu.make_async_copy(ks_hbm.at[b, hs], ks_sbuf, ks_sem)
            cvs = pltpu.make_async_copy(vs_hbm.at[b, hs], vs_sbuf, vs_sem)
            cks.start()
            cvs.start()
            cks.wait()
            cvs.wait()

        @pl.when(i + 1 < n_blocks)
        def _():
            for c in copies(i + 1, (i + 1) % 2):
                c.start()

        slot = i % 2
        ck, cv = copies(i, slot)
        ck.wait()

        # s8 x s8 -> s32 MXU dots, one per KV head (each head contracts
        # its own K slab).
        for h in range(head_block):
            s_i32 = jax.lax.dot_general(
                qi_ref[h], k_buf[slot, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rep, ps]
            s_buf[h * rep : (h + 1) * rep, :] = s_i32.astype(jnp.float32)

        def per_row(x):  # [HB, ps] -> [HB*rep, ps] (row h -> rows h*rep..)
            if rep == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (head_block, rep, x.shape[-1])
            ).reshape(head_block * rep, x.shape[-1])

        # Vectorized scale fold + softmax bookkeeping on [HB*rep, ps].
        ks_row = per_row(
            ks_sbuf[:, pl.ds(i * block_s, block_s)].astype(jnp.float32)
        )
        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s_buf.shape, 1
        )
        s = s_buf[...] * qs_ref[:, 0:1] * ks_row
        s = jnp.where(kpos < length, s, _MASK)  # [HB*rep, ps]
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        # Fold V scales into the probability rows, quantize the rows
        # (p*vsc >= 0, so absmax == max), and dot s8 x s8 on the MXU.
        vs_row = per_row(
            vs_sbuf[:, pl.ds(i * block_s, block_s)].astype(jnp.float32)
        )
        pw = p * vs_row  # [HB*rep, ps]
        pmax = jnp.max(pw, axis=1, keepdims=True)
        pinv = jnp.where(pmax > 0.0, 127.0 / jnp.where(pmax > 0.0, pmax, 1.0), 0.0)
        pq = jnp.round(pw * pinv).astype(jnp.int8)

        cv.wait()
        for h in range(head_block):
            pv_buf[h * rep : (h + 1) * rep, :] = jax.lax.dot_general(
                pq[h * rep : (h + 1) * rep, :], v_buf[slot, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rep, Dh]
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


@functools.partial(jax.jit, static_argnames=("block_s", "head_block", "interpret"))
def flash_decode_int8(
    q: jax.Array,  # [B, Hkv, rep, Dh]
    k_cache: jax.Array,  # int8 [B, Hkv, S, Dh]
    ks_cache: jax.Array,  # bf16 [B, Hkv, S]
    v_cache: jax.Array,
    vs_cache: jax.Array,
    lengths: jax.Array,  # [B] int32
    *,
    block_s: int = 256,
    head_block: int = 32,
    interpret: bool = False,
) -> jax.Array:
    B, Hkv, rep, Dh = q.shape
    S = k_cache.shape[2]
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_blocks = S // bs
    # Same fewer-larger-cells rule as the bf16 DMA kernel (BENCH_NOTES
    # round 2: hb 8 -> 32 wins at every length); int8 payload halves the
    # double-buffer bytes, the in-VMEM scale rows add 2*hb*S*2.
    hb = _pick_hb_int8(head_block, Hkv, rep, bs, Dh,
                       k_cache.dtype.itemsize, S)

    kv_view = (B, Hkv, n_blocks, bs, Dh)
    grid = (B, Hkv // hb, n_blocks)
    kernel = functools.partial(_kernel, block_s=bs, head_block=hb)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
                pltpu.VMEM((hb * rep, bs), jnp.float32),
                pltpu.VMEM((hb, rep, Dh), jnp.int8),
                pltpu.VMEM((hb * rep, 128), jnp.float32),
                pltpu.VMEM((hb * rep, Dh), jnp.int32),
                pltpu.VMEM((2, hb, bs, Dh), k_cache.dtype),
                pltpu.VMEM((2, hb, bs, Dh), v_cache.dtype),
                pltpu.VMEM((hb, S), ks_cache.dtype),
                pltpu.VMEM((hb, S), vs_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), q,
        k_cache.reshape(kv_view), ks_cache,
        v_cache.reshape(kv_view), vs_cache,
    )
