"""Flash attention for prefill: a query block attends causally to the cache.

Online softmax over KV tiles (scores never hit HBM), diagonal-block
skipping for causality.  GQA query heads live on a leading axis and are
processed by a static inner loop, so every tile the MXU sees is a plain
2-D [block_t, ...] matrix — no sublane reshapes.

The reference implements prefill attention as a materialized Q·K^T GEMM
plus `masked_softmax` that only supports exactly n_tokens == 8
(/root/reference/th-llama.cpp:367-374, /root/reference/th.cpp:1619-1700);
this kernel handles any bucketed block length at flash-attention memory
cost.

Kernel shapes:
  q        [B, Hkv, rep, T, Dh]  (pre-scaled by 1/sqrt(Dh))
  k_cache  [B, Hkv, S, Dh]       (head-major; (S, Dh) are the tiled dims)
  v_cache  [B, Hkv, S, Dh]
  offsets  [B] int32             absolute position of q[..., 0, :]
  out      [B, Hkv, rep, T, Dh]
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
    k_ref,  # [1, 1, BS, Dh]
    v_ref,  # [1, 1, BS, Dh]
    o_ref,  # [1, 1, rep, BT, Dh]
    m_ref,  # VMEM [rep, BT, 128] f32
    l_ref,  # VMEM [rep, BT, 128] f32
    acc_ref,  # VMEM [rep, BT, Dh] f32
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

    # Last query position in this tile; skip KV tiles entirely beyond it.
    max_qpos = offset + (t + 1) * block_t - 1

    @pl.when(i * block_s <= max_qpos)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, Dh]
        v = v_ref[0, 0].astype(jnp.float32)  # [BS, Dh]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_s), 0)
        kpos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_t, block_s), 1
        )
        qpos = offset + t * block_t + row
        causal = kpos <= qpos

        for r in range(rep):  # static unroll over the GQA group
            q = q_ref[0, 0, r].astype(jnp.float32)  # [BT, Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BT, BS]
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

            pv = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [BT, Dh]
            acc_ref[r] = acc_ref[r] * alpha + pv

    @pl.when(i == n_s_tiles - 1)
    def _():
        for r in range(rep):
            l = l_ref[r, :, 0:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0, r] = (acc_ref[r] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_s", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, Hkv, rep, T, Dh]
    k_cache: jax.Array,  # [B, Hkv, S, Dh] (head-major)
    v_cache: jax.Array,
    offsets: jax.Array,  # [B] int32
    *,
    block_t: int = 256,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, Hkv, rep, T, Dh = q.shape
    S = k_cache.shape[2]
    # Tile-size A/B knobs (prefill attention is per-cell-overhead bound,
    # not MXU bound — ~128 cells/layer at the 512-token default tiles):
    # bigger tiles mean fewer cells but lose the diagonal-block skip.
    import os as _os

    env_bt = _os.environ.get("THAWK_PREFILL_BT")
    env_bs = _os.environ.get("THAWK_PREFILL_BS")
    if env_bt:
        block_t = int(env_bt)
    if env_bs:
        block_s = int(env_bs)
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
                pl.BlockSpec((1, 1, bs, Dh), lambda b, h, t, i, *_: (b, h, i, 0)),
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
    )(offsets.astype(jnp.int32), q, k_cache, v_cache)


def _kernel_stats(
    starts_ref,  # SMEM [B, 2] int32 (q_start, k_start)
    q_ref,  # [1, 1, rep, BT, Dh]
    k_ref,  # [1, 1, BS, Dh]
    v_ref,  # [1, 1, BS, Dh]
    o_ref,  # [1, 1, rep, BT, Dh] f32 (unnormalized)
    mo_ref,  # [1, 1, rep, BT, 128] f32
    lo_ref,  # [1, 1, rep, BT, 128] f32
    m_ref,  # VMEM [rep, BT, 128] f32
    l_ref,
    acc_ref,  # VMEM [rep, BT, Dh] f32
    *,
    stride: int,
    block_t: int,
    block_s: int,
    n_s_tiles: int,
    rep: int,
):
    b = pl.program_id(0)
    t = pl.program_id(2)
    i = pl.program_id(3)
    q_start = starts_ref[b, 0]
    k_start = starts_ref[b, 1]

    @pl.when(i == 0)
    def _():
        # Init m to the finite _MASK (not -inf): fully-masked rows then
        # carry m == _MASK and their pollution (p = exp(0) = 1 rows)
        # cancels to exactly 0 in any online-softmax merge against a
        # real score — the same convention as the jnp ring path, and it
        # keeps exp(m1 - m) NaN-free when both partials are empty.
        m_ref[...] = jnp.full_like(m_ref, _MASK)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Positions are affine in the row index (block layout: stride 1,
    # cyclic/round-robin layout: stride n_shards), so tile-level
    # causality bounds come from scalars.
    max_qpos = q_start + stride * ((t + 1) * block_t - 1)
    min_kpos = k_start + stride * (i * block_s)

    @pl.when(min_kpos <= max_qpos)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, Dh]
        v = v_ref[0, 0].astype(jnp.float32)  # [BS, Dh]
        row = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_s), 1)
        qpos = q_start + stride * (t * block_t + row)
        kpos = k_start + stride * (i * block_s + col)
        causal = kpos <= qpos

        for r in range(rep):
            q = q_ref[0, 0, r].astype(jnp.float32)  # [BT, Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BT, BS]
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

            pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
            acc_ref[r] = acc_ref[r] * alpha + pv

    @pl.when(i == n_s_tiles - 1)
    def _():
        o_ref[0, 0] = acc_ref[...]
        mo_ref[0, 0] = m_ref[...]
        lo_ref[0, 0] = l_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("stride", "block_t", "block_s", "interpret"),
)
def flash_attention_stats(
    q: jax.Array,  # [B, Hkv, rep, T, Dh] (pre-scaled by 1/sqrt(Dh))
    k_block: jax.Array,  # [B, Hkv, S, Dh]
    v_block: jax.Array,
    q_start: jax.Array,  # [B] int32: global position of q[..., 0, :]
    k_start: jax.Array,  # [B] int32: global position of k_block[..., 0, :]
    *,
    stride: int = 1,
    block_t: int = 256,
    block_s: int = 256,
    interpret: bool = False,
):
    """Position-parameterized flash attention returning softmax partials.

    The ring-attention prefill step (parallel/ring.py): each shard's
    query block attends to a visiting KV block whose global positions
    are `k_start + stride*j` (stride 1 = contiguous blocks, stride
    n_shards = the cyclic layout CP decode appends into), under the
    causal mask kpos <= qpos.  Scores never leave VMEM — the jnp
    fallback materializes [B, H, T, S] per ring step, which defeats
    long-context CP.

    Returns (o_unnorm f32 [B, Hkv, rep, T, Dh], m f32
    [B, Hkv, rep, T, 128], l f32 [B, Hkv, rep, T, 128]); lane columns
    of m/l are replicated — consume [..., 0:1].  o = o_unnorm / l after
    the cross-shard merge.  Fully-masked rows carry m == _MASK (finite)
    and l == 0 or the all-ones pollution row; both merge to zero
    against any real partial (see _kernel_stats init comment).
    """
    B, Hkv, rep, T, Dh = q.shape
    S = k_block.shape[2]
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    n_s = S // bs

    starts = jnp.stack(
        [q_start.astype(jnp.int32), k_start.astype(jnp.int32)], axis=1
    )  # [B, 2]
    grid = (B, Hkv, T // bt, n_s)
    kernel = functools.partial(
        _kernel_stats, stride=stride, block_t=bt, block_s=bs,
        n_s_tiles=n_s, rep=rep,
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
                pl.BlockSpec((1, 1, bs, Dh), lambda b, h, t, i, *_: (b, h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, rep, bt, Dh), lambda b, h, t, i, *_: (b, h, 0, t, 0)
                ),
                pl.BlockSpec(
                    (1, 1, rep, bt, 128), lambda b, h, t, i, *_: (b, h, 0, t, 0)
                ),
                pl.BlockSpec(
                    (1, 1, rep, bt, 128), lambda b, h, t, i, *_: (b, h, 0, t, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((rep, bt, 128), jnp.float32),
                pltpu.VMEM((rep, bt, 128), jnp.float32),
                pltpu.VMEM((rep, bt, Dh), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, T, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, rep, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, rep, T, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(starts, q, k_block, v_block)


def attend_prefill(
    q: jax.Array,  # [B, T, H, Dh]
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_positions: jax.Array,  # [B, T]
    scale: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """attend_cache-compatible wrapper for block prefill."""
    B, T, H, Dh = q.shape
    Hkv = k_cache.shape[1]  # cache is head-major [B, Hkv, S, Dh]
    rep = H // Hkv
    # [B, T, H, Dh] -> [B, Hkv, rep, T, Dh]
    qg = (q * scale).reshape(B, T, Hkv, rep, Dh).transpose(0, 2, 3, 1, 4)
    offsets = q_positions[:, 0]
    out = flash_attention(qg, k_cache, v_cache, offsets, interpret=interpret)
    # back to [B, T, H, Dh]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, Dh).astype(q.dtype)
