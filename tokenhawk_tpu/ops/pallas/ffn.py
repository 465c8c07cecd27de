"""Fused gated-FFN decode kernel: one Pallas call for the whole MLP.

Computes  y = x + silu(norm(x) @ W1) * (norm(x) @ W3) @ W2  for
quantized W1|W3 (fused [D, 2F] layout) and W2 [F, D], streaming every
weight byte exactly once.  Because SwiGLU is elementwise over the
intermediate dim F, the output decomposes over F-tiles:

    y = x + sum_t  h_t @ W2[t]        h_t = silu(xn @ W1[:, t]) * (xn @ W3[:, t])

so the kernel walks F in `block_f` tiles, producing each intermediate
tile and immediately consuming it against the matching W2 row-slab while
the Pallas pipeline prefetches the next tiles.  vs the two-kernel form
(w13 matmul -> XLA silu*mul -> w2 matmul) this removes one kernel
boundary per layer per step (32/token of cross-kernel prefetch bubbles,
the dominant decode "glue" in the round-2 trace), the [B, 2F]
intermediate round-trip through HBM, and w2's ragged-K sub-chunk tail
(K=11008 has no even 256-multiple split; here w2 is tiled along F by
construction).

The reference computes the same MLP as three separate GEMV dispatches
plus two elementwise passes (/root/reference/th-llama.cpp:393-430);
fusing them is only possible because the TPU kernel owns the whole
pipeline stage rather than enqueueing fixed-function dispatches.

Decode-only: activation rows <= 8, f32 MXU dots (same DOT_F32 rationale
as qmatmul.py).  Prefill keeps the separate bf16-dot matmuls.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenhawk_tpu.ops.pallas.qmatmul import GROUP, _apply_scales, _pick_sub

# Intermediate-dim tile. 256 is the largest clean divisor of LLaMA's
# F=11008 (= 256*43) that keeps w2's scale slab at the (8, 128) min tile;
# the bn=256 DMA cost vs 512 measured ~2% in-kernel (qkernel_bench).
BLOCK_F = int(_os.environ.get("THAWK_FFN_BLOCK_F", "256"))


def _dequant(q_ref, s_ref, rows, cols, group=GROUP, m_ref=None):
    """Dequantize q_ref[rows, cols]: group scales (+ optional affine
    mins, the k-quant form w = q*s + m) along the rows."""
    w = q_ref[rows, cols].astype(jnp.float32)
    gsl = slice(rows.start // group, rows.stop // group)
    s = s_ref[gsl, cols].astype(jnp.float32)
    if m_ref is None:
        return _apply_scales(w, s, group)
    from tokenhawk_tpu.ops.pallas.qmatmul import _apply_affine

    return _apply_affine(w, s, m_ref[gsl, cols].astype(jnp.float32), group)


def _ones_bd(rows: int, cols: int, group: int):
    """Block-diagonal group-sum matrix (compile-time iota pattern)."""
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // group
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (g_ids == c_ids).astype(jnp.float32)


def _ffn_kernel(
    x_ref, w1_ref, w3_ref, s1_ref, s3_ref, *rest, n_tiles, eps, d_sub,
    o_sub, g13=GROUP, g2=GROUP, mins13=False, mins2=False, sb13=False,
    biasdot=False,
):
    rest = list(rest)
    if sb13:
        # Q4_K super-block w13: s1/s3 are the per-256 d slabs; dmin and
        # the 6-bit sc|mn rows follow.  Expand to per-group affine
        # (s, b) arrays once per F-tile — _dequant slices arrays the
        # same way it slices refs.
        dm1_ref, dm3_ref = rest.pop(0), rest.pop(0)
        sc1_ref, sc3_ref = rest.pop(0), rest.pop(0)
        mn1_ref, mn3_ref = rest.pop(0), rest.pop(0)
        m1_ref = m3_ref = None
    else:
        m1_ref = rest.pop(0) if mins13 else None
        m3_ref = rest.pop(0) if mins13 else None
    w2_ref, s2_ref = rest.pop(0), rest.pop(0)
    m2_ref = rest.pop(0) if mins2 else None
    bias13 = biasdot and (mins13 or sb13)
    bias2 = biasdot and mins2
    if bias13:
        g_ref, o_ref, acc_ref, xn_ref, xs_ref = rest
    else:
        g_ref, o_ref, acc_ref, xn_ref = rest
        xs_ref = None
    t = pl.program_id(0)
    D = w1_ref.shape[0]

    @pl.when(t == 0)
    def _():
        xf = x_ref[...].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
        xn_ref[...] = xf * inv * g_ref[...].astype(jnp.float32)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if bias13:
            # Per-group sums of the normed rows, computed once and
            # reused by every F-tile's gate/up bias dots (same
            # cache-at-first-cell trick as _qk_kernel's).
            xs_ref[...] = jax.lax.dot_general(
                xn_ref[...], _ones_bd(D, D // g13, g13),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    xn = xn_ref[...]

    if sb13:
        from tokenhawk_tpu.ops.pallas.qmatmul import _sb_expand

        s1_eff, m1_eff = _sb_expand(s1_ref, dm1_ref, sc1_ref, mn1_ref)
        s3_eff, m3_eff = _sb_expand(s3_ref, dm3_ref, sc3_ref, mn3_ref)
    else:
        s1_eff, m1_eff = s1_ref, m1_ref
        s3_eff, m3_eff = s3_ref, m3_ref

    # Gate/up projections for this F-tile: whole-K (= D) dots, f32
    # dequant bounded by d_sub chunks exactly like qmatmul's K loop.
    # With biasdot the per-element affine bias becomes one small MXU
    # dot per projection (xsums @ mins), the same trade as _qk_kernel's.
    g = None
    u = None
    for j in range(0, D, d_sub):
        sub = min(d_sub, D - j)
        rows = slice(j, j + sub)
        cols = slice(None)
        xj = xn[:, j : j + sub]
        gj = jax.lax.dot_general(
            xj, _dequant(w1_ref, s1_eff, rows, cols, g13,
                         None if bias13 else m1_eff),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        uj = jax.lax.dot_general(
            xj, _dequant(w3_ref, s3_eff, rows, cols, g13,
                         None if bias13 else m3_eff),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        g = gj if g is None else g + gj
        u = uj if u is None else u + uj
    if bias13:
        xs = xs_ref[...]
        m1 = m1_eff if sb13 else m1_eff[...].astype(jnp.float32)
        m3 = m3_eff if sb13 else m3_eff[...].astype(jnp.float32)
        g += jax.lax.dot_general(
            xs, m1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u += jax.lax.dot_general(
            xs, m3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    h = g * jax.lax.logistic(g) * u  # silu(g) * u, [B, bf] f32

    # Down projection: this F-tile's W2 row-slab feeds the accumulator.
    Dout = w2_ref.shape[1]
    bf = w2_ref.shape[0]
    if bias2:
        # h varies per tile, so its group sums are per-tile — but the
        # ones matrix is tiny ([bf, bf//g2]) next to the w13 one.
        hsum = jax.lax.dot_general(
            h, _ones_bd(bf, bf // g2, g2), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            hsum, m2_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for j in range(0, Dout, o_sub):
        sub = min(o_sub, Dout - j)
        cols = slice(j, j + sub)
        w2j = _dequant(w2_ref, s2_ref, slice(0, bf), cols, g2,
                       None if bias2 else m2_ref)
        acc_ref[:, cols] += jax.lax.dot_general(
            h, w2j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == n_tiles - 1)
    def _():
        # Residual add rides the epilogue: x is already resident.
        o_ref[...] = (
            x_ref[...].astype(jnp.float32) + acc_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_f", "g13", "g2", "interpret")
)
def _fused_ffn(
    x,  # [B, D] (B <= 8, padded to 8 by the wrapper)
    w13_qs,  # int4/int8 [D, 2F]
    w13_s,  # [D//g13, 2F]; q4k_sb: per-256 d [D//256, 2F]
    w13_m,  # [D//g13, 2F] affine mins or None; q4k_sb: dmin [D//256, 2F]
    w13_scmn,  # q4k_sb only: int8 [2*(D//32), 2F] sc rows then mn rows
    w2_qs,  # int4/int8 [F, D]
    w2_s,  # [F//g2, D]
    w2_m,  # [F//g2, D] affine mins or None
    gain,  # [1, D] ffn_norm
    *,
    eps: float,
    block_f: int,
    g13: int,
    g2: int,
    interpret: bool,
):
    B, D = x.shape
    F2 = w13_qs.shape[1]
    F = F2 // 2
    bf = block_f
    nf = F // bf
    sb13 = w13_scmn is not None
    sg_d = D // g13
    sg_f = bf // g2

    d_sub = _pick_sub(D, 2048)
    grid = (nf,)
    from tokenhawk_tpu.ops.pallas.qmatmul import KQ_BIASDOT

    kernel = functools.partial(
        _ffn_kernel, n_tiles=nf, eps=eps, d_sub=d_sub, o_sub=2048,
        g13=g13, g2=g2, mins13=w13_m is not None and not sb13,
        mins2=w2_m is not None, sb13=sb13, biasdot=KQ_BIASDOT,
    )
    s13_rows = D // 256 if sb13 else sg_d
    in_specs = [
        pl.BlockSpec((B, D), lambda t: (0, 0)),  # x (resident)
        pl.BlockSpec((D, bf), lambda t: (0, t)),  # w1 tile
        pl.BlockSpec((D, bf), lambda t, _n=nf: (0, t + _n)),  # w3 tile
        pl.BlockSpec((s13_rows, bf), lambda t: (0, t)),  # w1 scales / d
        pl.BlockSpec((s13_rows, bf), lambda t, _n=nf: (0, t + _n)),  # w3
    ]
    operands = [x, w13_qs, w13_qs, w13_s, w13_s]
    if sb13:
        # dmin slabs then the sc|mn rows (sc block row 0, mn block row 1
        # of the [2*(D//32), 2F] concat), each for w1 then w3 columns.
        in_specs.append(pl.BlockSpec((s13_rows, bf), lambda t: (0, t)))
        in_specs.append(
            pl.BlockSpec((s13_rows, bf), lambda t, _n=nf: (0, t + _n)))
        operands.extend([w13_m, w13_m])
        sgk = D // 32
        in_specs.append(pl.BlockSpec((sgk, bf), lambda t: (0, t)))  # sc1
        in_specs.append(
            pl.BlockSpec((sgk, bf), lambda t, _n=nf: (0, t + _n)))  # sc3
        in_specs.append(pl.BlockSpec((sgk, bf), lambda t: (1, t)))  # mn1
        in_specs.append(
            pl.BlockSpec((sgk, bf), lambda t, _n=nf: (1, t + _n)))  # mn3
        operands.extend([w13_scmn, w13_scmn, w13_scmn, w13_scmn])
    elif w13_m is not None:
        in_specs.append(pl.BlockSpec((sg_d, bf), lambda t: (0, t)))
        in_specs.append(pl.BlockSpec((sg_d, bf), lambda t, _n=nf: (0, t + _n)))
        operands.extend([w13_m, w13_m])
    in_specs.append(pl.BlockSpec((bf, D), lambda t: (t, 0)))  # w2 row-slab
    in_specs.append(pl.BlockSpec((sg_f, D), lambda t: (t, 0)))  # w2 scales
    operands.extend([w2_qs, w2_s])
    if w2_m is not None:
        in_specs.append(pl.BlockSpec((sg_f, D), lambda t: (t, 0)))
        operands.append(w2_m)
    in_specs.append(pl.BlockSpec((1, D), lambda t: (0, 0)))  # ffn_norm gain
    operands.append(gain)
    side_bytes = (w13_s.size + w2_s.size) * w13_s.dtype.itemsize
    if w13_m is not None:
        side_bytes += w13_m.size * w13_m.dtype.itemsize
    if w2_m is not None:
        side_bytes += w2_m.size * w2_m.dtype.itemsize
    if w13_scmn is not None:
        side_bytes += w13_scmn.size  # int8
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, D), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),  # accumulator
            pltpu.VMEM((B, D), jnp.float32),  # normed activations
        ] + ([pltpu.VMEM((B, D // g13), jnp.float32)]  # xn group sums
             if KQ_BIASDOT and w13_m is not None else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * D * F,
            bytes_accessed=(
                w13_qs.size // (2 if w13_qs.dtype in (jnp.int4, jnp.uint4) else 1)
                + w2_qs.size // (2 if w2_qs.dtype in (jnp.int4, jnp.uint4) else 1)
                + side_bytes
            ),
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(*operands)


def _owo_ffn_kernel(
    ctx_ref,  # VMEM [B, Dq]  attention output rows (resident)
    xres_ref,  # VMEM [B, bnw]  residual tile for the current wo cell
    wo_q_ref,  # VMEM [Dq, bnw]
    wo_s_ref,  # VMEM [Dq//32, bnw]
    w1_ref, w3_ref, s1_ref, s3_ref, w2_ref, s2_ref, g_ref,
    o_ref,  # VMEM [B, D]
    acc_ref,  # VMEM [B, D] f32  FFN accumulator
    xn_ref,  # VMEM [B, D] f32  normed hidden
    xacc_ref,  # VMEM [n_wo, B, bnw] f32  post-attention hidden x'
    *, n_wo, n_tiles, eps, dq_sub, d_sub, o_sub,
):
    """[Wo + residual + RMSNorm + SwiGLU-MLP + residual] as ONE kernel.

    Grid = (n_wo wo-tiles ..., n_tiles FFN tiles): every cell is a pure
    weight-streaming step (same shape as the plain FFN kernel), so the
    Pallas pipeline keeps the HBM stream saturated across what used to
    be the wo->ffn kernel boundary.  x' = x + ctx@Wo accumulates in
    slabs (xacc), the norm runs once at the phase boundary, and the
    final output adds the FFN back onto x'.
    """
    i = pl.program_id(0)
    bnw = xres_ref.shape[1]

    @pl.when(i < n_wo)
    def _():
        ctx = ctx_ref[...].astype(jnp.float32)
        Dq = wo_q_ref.shape[0]
        y = None
        for j in range(0, Dq, dq_sub):
            sub = min(dq_sub, Dq - j)
            w = _apply_scales(
                wo_q_ref[j : j + sub, :].astype(jnp.float32),
                wo_s_ref[j // GROUP : (j + sub) // GROUP, :].astype(
                    jnp.float32),
            )
            yj = jax.lax.dot_general(
                ctx[:, j : j + sub], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = yj if y is None else y + yj
        xacc_ref[i] = xres_ref[...].astype(jnp.float32) + y

    @pl.when(i == n_wo)
    def _():
        D = o_ref.shape[1]
        sq = None
        for t in range(n_wo):
            xt = xacc_ref[t]
            st = jnp.sum(xt * xt, axis=1, keepdims=True)
            sq = st if sq is None else sq + st
        inv = jax.lax.rsqrt(sq / D + eps)
        gf = g_ref[...].astype(jnp.float32)
        for t in range(n_wo):
            xn_ref[:, t * bnw : (t + 1) * bnw] = (
                xacc_ref[t] * inv * gf[:, t * bnw : (t + 1) * bnw])
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i >= n_wo)
    def _():
        xn = xn_ref[...]
        D = w1_ref.shape[0]
        g = None
        u = None
        for j in range(0, D, d_sub):
            sub = min(d_sub, D - j)
            rows = slice(j, j + sub)
            cols = slice(None)
            xj = xn[:, j : j + sub]
            gj = jax.lax.dot_general(
                xj, _dequant(w1_ref, s1_ref, rows, cols),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            uj = jax.lax.dot_general(
                xj, _dequant(w3_ref, s3_ref, rows, cols),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            g = gj if g is None else g + gj
            u = uj if u is None else u + uj
        h = g * jax.lax.logistic(g) * u
        Dout = w2_ref.shape[1]
        for j in range(0, Dout, o_sub):
            sub = min(o_sub, Dout - j)
            cols = slice(j, j + sub)
            w2j = _apply_scales(
                w2_ref[:, cols].astype(jnp.float32),
                s2_ref[:, cols].astype(jnp.float32),
            )
            acc_ref[:, cols] += jax.lax.dot_general(
                h, w2j, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(i == n_wo + n_tiles - 1)
    def _():
        for t in range(n_wo):
            cols = slice(t * bnw, (t + 1) * bnw)
            o_ref[:, cols] = (
                xacc_ref[t] + acc_ref[:, cols]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_f", "block_nw", "interpret")
)
def _fused_owo_ffn(
    ctx,  # [B, Dq] attention output rows
    xres,  # [B, D] residual input
    wo_qs, wo_s,  # [Dq, D], [Dq//32, D]
    w13_qs, w13_s,  # [D, 2F], [D//32, 2F]
    w2_qs, w2_s,  # [F, D], [F//32, D]
    gain,  # [1, D]
    *, eps: float, block_f: int, block_nw: int, interpret: bool,
):
    B, Dq = ctx.shape
    D = xres.shape[1]
    F = w13_qs.shape[1] // 2
    bf = block_f
    nf = F // bf
    bnw = block_nw
    nwo = D // bnw
    sg_d = D // GROUP
    sg_f = bf // GROUP
    sg_q = Dq // GROUP

    def wo_i(i):
        return jnp.minimum(i, nwo - 1)

    def f_i(i):
        return jnp.clip(i - nwo, 0, nf - 1)

    kernel = functools.partial(
        _owo_ffn_kernel, n_wo=nwo, n_tiles=nf, eps=eps,
        dq_sub=_pick_sub(Dq, 2048), d_sub=_pick_sub(D, 2048), o_sub=2048,
    )
    return pl.pallas_call(
        kernel,
        grid=(nwo + nf,),
        in_specs=[
            pl.BlockSpec((B, Dq), lambda i: (0, 0)),  # ctx
            pl.BlockSpec((B, bnw), lambda i: (0, wo_i(i))),  # x residual
            pl.BlockSpec((Dq, bnw), lambda i: (0, wo_i(i))),  # wo tile
            pl.BlockSpec((sg_q, bnw), lambda i: (0, wo_i(i))),
            pl.BlockSpec((D, bf), lambda i: (0, f_i(i))),  # w1
            pl.BlockSpec((D, bf), lambda i, _n=nf: (0, f_i(i) + _n)),  # w3
            pl.BlockSpec((sg_d, bf), lambda i: (0, f_i(i))),
            pl.BlockSpec((sg_d, bf), lambda i, _n=nf: (0, f_i(i) + _n)),
            pl.BlockSpec((bf, D), lambda i: (f_i(i), 0)),  # w2 row-slab
            pl.BlockSpec((sg_f, D), lambda i: (f_i(i), 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),  # gain
        ],
        out_specs=pl.BlockSpec((B, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D), xres.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),  # FFN accumulator
            pltpu.VMEM((B, D), jnp.float32),  # normed hidden
            pltpu.VMEM((nwo, B, bnw), jnp.float32),  # x' slabs
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (Dq * D + 3 * D * F),
            bytes_accessed=(
                (wo_qs.size + w13_qs.size + w2_qs.size)
                // (2 if w13_qs.dtype in (jnp.int4, jnp.uint4) else 1)
                + (wo_s.size + w13_s.size + w2_s.size)
                * w13_s.dtype.itemsize
            ),
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(ctx, xres, wo_qs, wo_s, w13_qs, w13_qs, w13_s, w13_s, w2_qs, w2_s,
      gain)


_FFN_ENABLED = _os.environ.get("THAWK_FUSED_FFN", "1") == "1"
# NEGATIVE RESULT, default OFF: fusing Wo into the FFN kernel measured
# 158.3-159.3 vs 161.8-162.4 tok/s (7B q4 v5e, interleaved A/B).  Unlike
# the w13+w2 fusion (which removed w2's ragged-K tail and the [B,2F]
# HBM round-trip), the wo->ffn boundary was already covered by XLA MSA's
# cross-kernel weight prefetch, and the in-kernel x' slab writes + norm
# boundary add VPU cost.  Kept env-gated for re-evaluation.
_OWO_ENABLED = _os.environ.get("THAWK_FUSED_OWO", "0") == "1"
BLOCK_NW = int(_os.environ.get("THAWK_FFN_BLOCK_NW", "512"))


def can_fuse_owo_ffn(wo, w13, w2, rows: int) -> bool:
    """Gate for the wo+FFN fused kernel (subsumes can_fuse_ffn)."""
    from tokenhawk_tpu.ops.qweight import QWeight

    if not _OWO_ENABLED or not can_fuse_ffn(w13, w2, rows):
        return False
    if not isinstance(wo, QWeight) or wo.kind != w13.kind:
        return False
    if wo.mins is not None:
        return False
    Dq, D = wo.qs.shape
    return (D % BLOCK_NW == 0 and BLOCK_NW % (8 * GROUP) == 0
            and Dq % 256 == 0 and D == w13.qs.shape[0])


def fused_owo_ffn(ctx, xres, wo, w13, w2, norm_gain, *, eps: float = 1e-6,
                  interpret: bool = False):
    """xres [..., D], ctx [..., Dq] ->
    x' + MLP(norm(x')), x' = xres + ctx @ Wo.  One Pallas call for the
    whole post-attention half of the layer."""
    lead = xres.shape[:-1]
    D = xres.shape[-1]
    Dq = ctx.shape[-1]
    xb = xres.reshape(-1, D)
    cb = ctx.reshape(-1, Dq)
    B = xb.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        cb = jnp.pad(cb, ((0, Bp - B), (0, 0)))
    y = _fused_owo_ffn(
        cb, xb, wo.qs, wo.scales, w13.qs, w13.scales, w2.qs, w2.scales,
        norm_gain.reshape(1, D),
        eps=eps, block_f=BLOCK_F, block_nw=BLOCK_NW, interpret=interpret,
    )
    if Bp != B:
        y = y[:B]
    return y.reshape(*lead, D)


_FFN_KINDS = ("q8_0", "q4_0_i4", "qk_i4", "qk_i8")


def can_fuse_ffn(w13, w2, rows: int) -> bool:
    """Gate: quantized int-code kinds (symmetric or k-quant affine),
    decode row counts, clean tiling.  w13 and w2 may differ in kind
    (llama.cpp's *_M recipes mix them); w13 may additionally be the
    Q4_K super-block form (w2 may not — its per-F-tile side blocks
    can't satisfy the sb layout's sublane alignment, and the loader
    keeps w2 flat for exactly this reason)."""
    from tokenhawk_tpu.ops.qweight import QWeight

    if not _FFN_ENABLED or rows > 8:
        return False
    if not (isinstance(w13, QWeight) and isinstance(w2, QWeight)):
        return False
    if w13.kind not in _FFN_KINDS + ("q4k_sb",) or w2.kind not in _FFN_KINDS:
        return False
    D, F2 = w13.qs.shape
    F, D2 = w2.qs.shape
    if D != D2 or F2 != 2 * F:
        return False
    if w13.kind == "q4k_sb" and D % 1024 != 0:
        return False  # int8 sc|mn rows slice at D//32-row offsets
    bf = BLOCK_F
    # bf must divide F and keep w2's scale slab >= 8 sublanes.
    return (F % bf == 0 and bf % (8 * w2.group) == 0
            and D % (8 * w13.group) == 0 and D % 256 == 0)


def fused_ffn(x, w13, w2, norm_gain, *, eps: float = 1e-6,
              interpret: bool = False):
    """x [..., D] -> x + SwiGLU-MLP(norm(x)); residual included.

    Caller must have checked `can_fuse_ffn(w13, w2, rows)`.
    """
    lead = x.shape[:-1]
    D = x.shape[-1]
    xb = x.reshape(-1, D)
    B = xb.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        # Zero rows stay zero through the whole pipe (norm of 0 is 0,
        # silu(0)*0 = 0, residual 0) and are sliced off below.
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    y = _fused_ffn(
        xb, w13.qs, w13.scales, w13.mins,
        w13.scales_hi if w13.kind == "q4k_sb" else None,
        w2.qs, w2.scales, w2.mins,
        norm_gain.reshape(1, D),
        eps=eps, block_f=BLOCK_F, g13=w13.group, g2=w2.group,
        interpret=interpret,
    )
    if Bp != B:
        y = y[:B]
    return y.reshape(*lead, D)
