"""Fused dequantize + matmul Pallas kernel.

Computes y = x @ dequant(W) for weight-only-quantized W without ever
materializing the dense matrix in HBM: quantized tiles stream
HBM -> VMEM, dequantize+scale on the VPU, and feed the MXU with one dot
per K-tile.  f32 accumulation across K-tiles in VMEM scratch.

This is the TPU answer to the reference's decode GEMV
`wgsl_vector_mat_mul_transpose` (/root/reference/th.cpp:2839-2892, one
256-thread workgroup per output element) and its packed-f16 in-shader
decode (/root/reference/th.cpp:363-394): the roofline limit is reading
the weight bytes once per token, so the kernel's job is to keep dequant
off the critical path and every byte read exactly once.

Layouts (produced by `tokenhawk_tpu.ops.qweight`):
  q8_0: qs int8 [K, N], scales f32 [K//32, N]
  q4_0 packed: qs uint8 [K//2, N] where byte row j holds logical row j in
        the low nibble and row j + K//2 in the high nibble (offset-binary,
        +8), so both halves dequantize from contiguous slices with no
        lane interleave; scales [K//32, N] ordered by logical row.

The scales BlockSpec covers all K-groups for the current N-tile (its
block index only varies with j, so Pallas fetches it once per N-tile);
per-K-tile rows are sliced inside the kernel.  This sidesteps the
(8, 128) min-tile rule for shapes where K//32 tiles unevenly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32  # quantization block length (ggml QK)

# Default tile sizes; overridable for tuning sweeps.
import os as _os

BLOCK_N = int(_os.environ.get("THAWK_QBLOCK_N", "512"))
BLOCK_K = int(_os.environ.get("THAWK_QBLOCK_K", "4096"))
BLOCK_KP = int(_os.environ.get("THAWK_QBLOCK_KP", "2048"))
# q4 bias-dot: skip the per-element -8 and correct with two tiny MXU dots
# (y -= 8 * group_sums(x) @ scales). Saves one wide VPU op per element.
Q4_BIASDOT = _os.environ.get("THAWK_Q4_BIASDOT", "0") == "1"
# Scale application: "reshape" views the [bk, bn] tile as [sg, GROUP, bn]
# and broadcast-multiplies s[:, None, :] (sublane broadcast, no data
# movement); "repeat" materializes repeat(s, GROUP) (full relayout).
SCALE_MODE = _os.environ.get("THAWK_SCALE_MODE", "reshape")
# MXU input precision for the dequantized tile:
#   auto = f32 at decode row counts (<= 8 rows: skips the wide VPU
#          f32->bf16 convert, measured +8% on q4; MXU FLOPs are trivial),
#          bf16 at prefill row counts (f32 MXU rate is 1/8 and prefill
#          is FLOP-bound);
#   1 / 0 force f32 / bf16 everywhere.
DOT_F32 = _os.environ.get("THAWK_DOT_F32", "auto")
# k-quant affine bias: "1" = two MXU dots per K-tile (group sums @ mins),
# "0" = per-element VPU add inside the dequant.
KQ_BIASDOT = _os.environ.get("THAWK_KQ_BIASDOT", "1") == "1"

# Grid-order A/B switch: "n" (default) puts N tiles OUTER so the weight
# block's index is constant across consecutive cells and each weight
# tile is fetched once per call; "rows" restores the pre-round-5
# rows-outer order (weights re-streamed once per 128-row activation
# tile — 4x at a 512-token prefill).  Decode (a single row tile) lowers
# identically either way.
_ROWS_OUTER = _os.environ.get("THAWK_QMM_ORDER", "n") == "rows"


def _mk_grid(N, bn, B, bb, n_k_tiles):
    if _ROWS_OUTER:
        return (B // bb, N // bn, n_k_tiles)
    return (N // bn, B // bb, n_k_tiles)


def _rt(a, b):
    """Row-tile coordinate from the first two grid args."""
    return a if _ROWS_OUTER else b


def _nt(a, b):
    """N-tile coordinate from the first two grid args."""
    return b if _ROWS_OUTER else a


def _apply_scales(w, s, group=GROUP):
    """w [bk, bn] * s [bk//group, bn] broadcast over each group."""
    if SCALE_MODE == "repeat":
        return w * jnp.repeat(s, group, axis=0)
    bk, bn = w.shape
    sg = bk // group
    return (w.reshape(sg, group, bn) * s[:, None, :]).reshape(bk, bn)


def _qdot(x, w, acc_ref):
    """acc += x @ w with the dequantized tile in f32 or bf16."""
    f32 = x.dtype == jnp.float32 or DOT_F32 == "1" or (
        DOT_F32 == "auto" and x.shape[0] <= 8
    )
    if f32:
        acc_ref[...] += jax.lax.dot_general(
            x.astype(jnp.float32), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[...] += jnp.dot(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        )


def _norm_rows(xf, sq_mean, gain_f32, eps, x_dtype):
    """Fused RMSNorm: xf [bb, bk] f32, gain [1, bk] -> normed rows.

    The norm that precedes every quantized matmul in the model
    (attn_norm -> wqkv, ffn_norm -> w13, final norm -> logits) runs
    in-kernel on the already-resident x tile: outside the kernel it
    costs a reduce fusion + a bf16->f32 convert + an S(1) staging copy
    of the hidden vector per call (trace: ~0.13 ms/tok at 7B decode).
    Only valid on whole-K tiles (the row statistics need the full row);
    the wrappers fall back to the XLA norm when K tiles.

    Returns rows in the dtype `_qdot` wants (f32 at decode row counts,
    the activation dtype at prefill row counts) so the dot-path choice
    is unchanged from the standalone-norm form.
    """
    inv = jax.lax.rsqrt(sq_mean + eps)  # [bb, 1]
    xn = xf * inv * gain_f32
    f32 = DOT_F32 == "1" or (DOT_F32 == "auto" and xf.shape[0] <= 8)
    return xn if f32 else xn.astype(x_dtype)


def _rope_epilogue(y, cos_ref, sin_ref, j, bn, rope_cols, rope_dh):
    """Half-style RoPE on the finished output tile (wqkv fusion).

    rotate_half within each Dh-lane head block is expressed as two
    global lane rolls + a lane-id select (the +-Dh/2 roll lands in the
    right head for every lane its branch is selected on), so the whole
    tile ropes in ~6 VPU ops — no per-head slicing.  cos/sin arrive as
    [rows, Dh] with the sign of the rotate folded into sin
    (sinE = [-sin | +sin]); v-section tiles (j*bn >= rope_cols) pass
    through untouched via the final select.
    """
    reps = bn // rope_dh
    cos = cos_ref[...]
    sin = sin_ref[...]
    if reps > 1:
        cos = jnp.concatenate([cos] * reps, axis=1)
        sin = jnp.concatenate([sin] * reps, axis=1)
    half = rope_dh // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) % rope_dh
    # pltpu.roll matches jnp.roll (out[i] = in[i - shift], cyclic) but
    # requires shift >= 0; -half is expressed as bn - half.
    rot = jnp.where(
        lane < half,
        pltpu.roll(y, y.shape[1] - half, 1),
        pltpu.roll(y, half, 1),
    )
    roped = y * cos + rot * sin
    return jnp.where(j * bn < rope_cols, roped, y)


# In-kernel K sub-chunking bounds the live f32 dequant intermediate
# (whole-K tiles at bn=512 would need >16 MB of scoped VMEM otherwise);
# the accumulator stays in scratch so sub-dots are free of the
# grid-level K-loop's output rewrites.
Q8_SUB = 2048
Q4_SUB = 1024


def _pick_sub(bk: int, target: int) -> int:
    """Sub-chunk length: the largest divisor of bk that is <= target, a
    multiple of 256 (so every scales slice starts at a sublane offset
    Mosaic can prove 8-aligned — sub=1376 compiles to "Expected mask
    vector type"), and >= 1024 (43 tiny subs lose more than a ragged
    tail).  Falls back to `target` with a ragged tail (e.g. K=11008 =
    256*43, 43 prime: 5x2048 + 768)."""
    best = None
    b = 256
    while b <= min(bk, target):
        if bk % b == 0:
            best = b
        b += 256
    return best if best is not None and best >= 1024 else target


def _q8_kernel(x_ref, qs_ref, s_ref, *rest, n_k_tiles, fuse_norm=False,
               eps=1e-6, rope=None):
    k = pl.program_id(2)
    rest = list(rest)
    g_ref = rest.pop(0) if fuse_norm else None
    cos_ref = rest.pop(0) if rope else None
    sin_ref = rest.pop(0) if rope else None
    o_ref, acc_ref = rest

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if fuse_norm:  # fused RMSNorm (whole-K tiles only)
        xf = x.astype(jnp.float32)
        x = _norm_rows(xf, jnp.mean(xf * xf, axis=1, keepdims=True),
                       g_ref[...].astype(jnp.float32), eps, x_ref.dtype)
    bk = qs_ref.shape[0]
    step = _pick_sub(bk, Q8_SUB)
    for j in range(0, bk, step):
        sub = min(step, bk - j)
        w = qs_ref[j : j + sub, :].astype(jnp.float32)  # [sub, bn]
        s = s_ref[j // GROUP : (j + sub) // GROUP, :].astype(jnp.float32)
        w = _apply_scales(w, s)
        _qdot(x[:, j : j + sub], w, acc_ref)

    j_n = pl.program_id(1 if _ROWS_OUTER else 0)

    @pl.when(k == n_k_tiles - 1)
    def _():
        y = acc_ref[...]
        if rope:
            y = _rope_epilogue(y, cos_ref, sin_ref, j_n,
                               y.shape[1], rope[0], rope[1])
        o_ref[...] = y.astype(o_ref.dtype)


def _q4_kernel(
    x_lo_ref, x_hi_ref, qs_ref, s_lo_ref, s_hi_ref, *rest,
    n_k_tiles, biasdot, fuse_norm=False, eps=1e-6,
):
    k = pl.program_id(2)
    if fuse_norm:
        g_lo_ref, g_hi_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic supports neither int8 vector subtraction nor uint8->bf16
    # casts; widen to int32 for the unpack arithmetic, then convert.
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    if fuse_norm:  # fused RMSNorm over the full row (= both halves)
        xf_lo = x_lo.astype(jnp.float32)
        xf_hi = x_hi.astype(jnp.float32)
        sq = (jnp.sum(xf_lo * xf_lo, axis=1, keepdims=True)
              + jnp.sum(xf_hi * xf_hi, axis=1, keepdims=True)) / (
                  2 * x_lo.shape[1])
        x_lo = _norm_rows(xf_lo, sq, g_lo_ref[...].astype(jnp.float32), eps,
                          x_lo_ref.dtype)
        x_hi = _norm_rows(xf_hi, sq, g_hi_ref[...].astype(jnp.float32), eps,
                          x_hi_ref.dtype)

    if biasdot:
        # Offset-binary nibbles used directly (value+8 in [0,15]); the
        # +8 bias contributes 8 * sum_g(sum_{k in g} x_k) * s_g[n],
        # removed with two [bb, sg] x [sg, bn] dots.  Group sums of x
        # come from an MXU dot with a block-diagonal ones matrix (cheap
        # compile-time pattern), avoiding lane-dim reshapes.
        s_lo_full = s_lo_ref[...].astype(jnp.float32)
        s_hi_full = s_hi_ref[...].astype(jnp.float32)
        bkp, sg = qs_ref.shape[0], s_lo_full.shape[0]
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (bkp, sg), 0) // GROUP
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (bkp, sg), 1)
        ones_bd = (g_ids == c_ids).astype(x_lo.dtype)  # [bkp, sg]
        xsum_lo = jnp.dot(x_lo, ones_bd, preferred_element_type=jnp.float32)
        xsum_hi = jnp.dot(x_hi, ones_bd, preferred_element_type=jnp.float32)
        corr = jnp.dot(xsum_lo, s_lo_full, preferred_element_type=jnp.float32)
        corr += jnp.dot(xsum_hi, s_hi_full, preferred_element_type=jnp.float32)
        acc_ref[...] -= 8.0 * corr

    bkp = qs_ref.shape[0]
    for j in range(0, bkp, Q4_SUB):
        sub = min(Q4_SUB, bkp - j)
        p32 = qs_ref[j : j + sub, :].astype(jnp.int32)  # [sub, bn]
        s_lo = s_lo_ref[j // GROUP : (j + sub) // GROUP, :].astype(jnp.float32)
        s_hi = s_hi_ref[j // GROUP : (j + sub) // GROUP, :].astype(jnp.float32)
        if biasdot:
            lo = (p32 & 0x0F).astype(jnp.float32)
            hi = (p32 >> 4).astype(jnp.float32)
        else:
            lo = ((p32 & 0x0F) - 8).astype(jnp.float32)
            hi = ((p32 >> 4) - 8).astype(jnp.float32)
        lo = _apply_scales(lo, s_lo)
        hi = _apply_scales(hi, s_hi)
        _qdot(x_lo[:, j : j + sub], lo, acc_ref)
        _qdot(x_hi[:, j : j + sub], hi, acc_ref)

    @pl.when(k == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q4i4_kernel(x_ref, qs_ref, s_ref, *rest, n_k_tiles, fuse_norm=False,
                 eps=1e-6, rope=None):
    """int4-native q4_0: qs is a packed int4 [K, N] ref in logical row
    order (value-8 fits int4's [-8, 7] exactly, so the offset vanishes at
    load time).  Mosaic's hardware int4->f32 convert replaces the whole
    widen/mask/shift/sub unpack chain: ~2 VPU ops per element (convert +
    scale multiply) vs ~4.5 for the byte-packed kernel."""
    k = pl.program_id(2)
    rest = list(rest)
    g_ref = rest.pop(0) if fuse_norm else None
    cos_ref = rest.pop(0) if rope else None
    sin_ref = rest.pop(0) if rope else None
    o_ref, acc_ref = rest

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if fuse_norm:
        xf = x.astype(jnp.float32)
        x = _norm_rows(xf, jnp.mean(xf * xf, axis=1, keepdims=True),
                       g_ref[...].astype(jnp.float32), eps, x_ref.dtype)
    bk = qs_ref.shape[0]
    step = _pick_sub(bk, Q8_SUB)
    for j in range(0, bk, step):
        sub = min(step, bk - j)
        w = qs_ref[j : j + sub, :].astype(jnp.float32)  # [sub, bn]
        s = s_ref[j // GROUP : (j + sub) // GROUP, :].astype(jnp.float32)
        w = _apply_scales(w, s)
        _qdot(x[:, j : j + sub], w, acc_ref)

    j_n = pl.program_id(1 if _ROWS_OUTER else 0)

    @pl.when(k == n_k_tiles - 1)
    def _():
        y = acc_ref[...]
        if rope:
            y = _rope_epilogue(y, cos_ref, sin_ref, j_n,
                               y.shape[1], rope[0], rope[1])
        o_ref[...] = y.astype(o_ref.dtype)


def _apply_affine(w, s, b, group):
    """w [bk, bn] * s + b broadcast over each group of `group` rows."""
    bk, bn = w.shape
    sg = bk // group
    w3 = w.reshape(sg, group, bn)
    return (w3 * s[:, None, :] + b[:, None, :]).reshape(bk, bn)


def _qk_kernel(x_ref, qs_ref, s_ref, *rest, n_k_tiles, group, has_mins,
               fuse_norm=False, eps=1e-6):
    """Generalized k-quant kernel: int4/int8 codes with per-group scale
    and optional per-group affine bias (mins), group in {16, 32}.

    Serves the NATIVE device layouts of the GGUF k-quant family
    (ggml/kquants.py): Q4_K -> int4 codes + scale + bias (exact, ~5 bpw
    on device vs the old requantize-to-Q8_0 detour's ~8.5 bpw + stacked
    rounding), Q5_K -> int8 + scale + bias, Q6_K -> int8 + scale
    (group 16).  The code path is the q4_0_i4 kernel plus one VPU add
    per element for the bias."""
    k = pl.program_id(2)
    j_n = pl.program_id(1 if _ROWS_OUTER else 0)
    rest = list(rest)
    m_ref = rest.pop(0) if has_mins else None
    g_ref = rest.pop(0) if fuse_norm else None
    if has_mins and KQ_BIASDOT:
        o_ref, acc_ref, xs_ref = rest
    else:
        o_ref, acc_ref = rest

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if fuse_norm:
        xf = x.astype(jnp.float32)
        x = _norm_rows(xf, jnp.mean(xf * xf, axis=1, keepdims=True),
                       g_ref[...].astype(jnp.float32), eps, x_ref.dtype)
    bk = qs_ref.shape[0]

    bias_elt = has_mins and not KQ_BIASDOT
    if has_mins and KQ_BIASDOT:
        # Affine bias via a small MXU dot: sum_g (sum_{k in g} x_k) *
        # m_g[n].  Generating the block-diagonal ones matrix + the
        # group-sum dot per grid cell measured ~16% of kernel time (635
        # vs 757 GB/s against the symmetric kernel at the same shapes),
        # so the group sums are computed ONCE per K-tile at the first
        # N-tile and cached in scratch for the remaining N-tiles (the N
        # grid dim is declared arbitrary: the reuse relies on j=0
        # running first for each i).
        sg_t = bk // group

        @pl.when(j_n == 0)
        def _():
            g_ids = (jax.lax.broadcasted_iota(jnp.int32, (bk, sg_t), 0)
                     // group)
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (bk, sg_t), 1)
            ones_bd = (g_ids == c_ids).astype(jnp.float32)
            xs_ref[k] = jax.lax.dot_general(
                x.astype(jnp.float32), ones_bd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [bb, sg]

        acc_ref[...] += jax.lax.dot_general(
            xs_ref[k], m_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    step = _pick_sub(bk, Q8_SUB)
    for j in range(0, bk, step):
        sub = min(step, bk - j)
        w = qs_ref[j : j + sub, :].astype(jnp.float32)  # [sub, bn]
        sl = slice(j // group, (j + sub) // group)
        s = s_ref[sl, :].astype(jnp.float32)
        if bias_elt:
            w = _apply_affine(w, s, m_ref[sl, :].astype(jnp.float32),
                              group)
        else:
            w = _apply_scales(w, s, group)
        _qdot(x[:, j : j + sub], w, acc_ref)

    @pl.when(k == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_n", "block_k",
                                              "eps", "interpret"))
def qk_matmul(
    x: jax.Array,  # [B, K]
    qs: jax.Array,  # int4/int8 [K, N] codes
    scales: jax.Array,  # [K//group, N]
    mins: jax.Array | None = None,  # [K//group, N] affine bias or None
    norm_gain: jax.Array | None = None,
    *,
    group: int = GROUP,
    block_n: int = BLOCK_N,
    block_k: int = BLOCK_K,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    K2, N = qs.shape
    assert K == K2, (x.shape, qs.shape)
    bk = _pick_block_k(K, block_k, 256)
    bn = _pick_block(N, block_n, 128)
    bb = _pick_block(B, 128, 8)
    n_k_tiles = K // bk
    sg = bk // group

    fuse = norm_gain is not None and n_k_tiles == 1
    if norm_gain is not None and not fuse:
        from tokenhawk_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_gain, eps)

    grid = _mk_grid(N, bn, B, bb, n_k_tiles)
    kernel = functools.partial(_qk_kernel, n_k_tiles=n_k_tiles, group=group,
                               has_mins=mins is not None, fuse_norm=fuse,
                               eps=eps)
    in_specs = [
        pl.BlockSpec((bb, bk), lambda a, b, k: (_rt(a, b), k)),
        pl.BlockSpec((bk, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),
    ]
    operands = [x, qs, scales]
    if mins is not None:
        in_specs.append(pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))))
        operands.append(mins)
    if fuse:
        in_specs.append(pl.BlockSpec((1, bk), lambda a, b, k: (0, k)))
        operands.append(norm_gain.reshape(1, K))
    nbytes_codes = qs.size // (2 if qs.dtype in (jnp.int4, jnp.uint4) else 1)
    nbytes_side = scales.size * scales.dtype.itemsize
    if mins is not None:
        nbytes_side += mins.size * mins.dtype.itemsize
    scratch = [pltpu.VMEM((bb, bn), jnp.float32)]
    if mins is not None and KQ_BIASDOT:
        # Per-K-tile group-sum cache filled at j=0 (see _qk_kernel); the
        # N dim must be "arbitrary" so the j ordering is defined.
        scratch.append(pltpu.VMEM((n_k_tiles, bb, sg), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bn), lambda a, b, k: (_rt(a, b), _nt(a, b))),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "arbitrary", "arbitrary")
                if mins is not None and KQ_BIASDOT
                else ("parallel", "parallel", "arbitrary")),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=nbytes_codes + nbytes_side,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _sb_expand(d_ref, dm_ref, sc_ref, mn_ref):
    """Q4_K super-block sides -> (s_full, b_full) [sg, bn] f32 for the
    tile: s = d*sc per 32-group, b = 8s - dmin*mn (int4 codes are
    code-8) — the cost of keeping the sides at 4.63 bpw instead of
    flattened 5.0.

    The 8x sublane expansion of the per-256 d/dmin rows to per-32 rows
    runs on the MXU (E @ d with a block-diagonal expansion matrix, the
    same compile-time-pattern trick as the biasdot's group sums):
    jnp.broadcast_to + reshape on the sublane dim lowered to a shuffle
    chain that cost ~11% of kernel time AND a 5x compile blowup."""
    sc = sc_ref[...].astype(jnp.float32)  # [sg, bn]
    mn = mn_ref[...].astype(jnp.float32)
    sb, bn = d_ref.shape
    sg = sc.shape[0]
    rep = sg // sb  # 8 groups of 32 per super-block of 256
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (sg, sb), 0) // rep
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (sg, sb), 1)
    expand = (r_ids == c_ids).astype(jnp.float32)  # [sg, sb]
    d = jax.lax.dot_general(
        expand, d_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [sg, bn]
    dm = jax.lax.dot_general(
        expand, dm_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s_full = d * sc
    b_full = 8.0 * s_full - dm * mn
    return s_full, b_full


def _qk_sb_kernel(x_ref, qs_ref, d_ref, dm_ref, sc_ref, mn_ref, *rest,
                  n_k_tiles, fuse_norm=False, eps=1e-6):
    """Q4_K super-block-native kernel: int4 codes + per-256 f16 d/dmin +
    int8 6-bit sc/mn, expanded to per-group affine in VMEM, bias applied
    as two MXU dots (see _qk_kernel)."""
    k = pl.program_id(2)
    rest = list(rest)
    g_ref = rest.pop(0) if fuse_norm else None
    o_ref, acc_ref = rest

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if fuse_norm:
        xf = x.astype(jnp.float32)
        x = _norm_rows(xf, jnp.mean(xf * xf, axis=1, keepdims=True),
                       g_ref[...].astype(jnp.float32), eps, x_ref.dtype)

    s_full, b_full = _sb_expand(d_ref, dm_ref, sc_ref, mn_ref)
    bk = qs_ref.shape[0]
    group = GROUP

    if KQ_BIASDOT:
        sg_t = bk // group
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (bk, sg_t), 0) // group
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (bk, sg_t), 1)
        ones_bd = (g_ids == c_ids).astype(jnp.float32)
        xsum = jax.lax.dot_general(
            x.astype(jnp.float32), ones_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            xsum, b_full, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    step = _pick_sub(bk, Q8_SUB)
    for j in range(0, bk, step):
        sub = min(step, bk - j)
        w = qs_ref[j : j + sub, :].astype(jnp.float32)
        sl = slice(j // group, (j + sub) // group)
        if KQ_BIASDOT:
            w = _apply_scales(w, s_full[sl], group)
        else:
            w = _apply_affine(w, s_full[sl], b_full[sl], group)
        _qdot(x[:, j : j + sub], w, acc_ref)

    @pl.when(k == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "eps",
                                              "interpret"))
def qk_sb_matmul(
    x: jax.Array,  # [B, K]
    qs: jax.Array,  # int4 [K, N], code - 8
    d: jax.Array,  # [K//256, N] f16/bf16 super scales
    dmin: jax.Array,  # [K//256, N]
    scmn: jax.Array,  # int8 [2*(K//32), N]: sc rows then mn rows
    norm_gain: jax.Array | None = None,
    *,
    block_n: int = BLOCK_N,
    block_k: int = BLOCK_K,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    K2, N = qs.shape
    assert K == K2, (x.shape, qs.shape)
    # int8 scmn rows slice at sg-row offsets -> sg must be a 32-sublane
    # multiple (Mosaic int8 tiling); loader gates sb layout accordingly.
    assert K % 1024 == 0, f"q4k_sb needs K % 1024 == 0, got {K}"
    bk = _pick_block_k(K, block_k, 256)
    if K // bk > 1 and bk % 4096 != 0:
        # Partial K-blocks of the f16 d/dmin arrays need 16-sublane
        # alignment (bk % 4096); otherwise fall back to one whole-K
        # block (full-dim side blocks are alignment-free).
        assert K <= 16384, f"q4k_sb whole-K fallback too large: {K}"
        bk = K
    bn = _pick_block(N, block_n, 128)
    bb = _pick_block(B, 128, 8)
    n_k_tiles = K // bk
    sg = bk // GROUP
    sb = bk // 256

    fuse = norm_gain is not None and n_k_tiles == 1
    if norm_gain is not None and not fuse:
        from tokenhawk_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_gain, eps)

    grid = _mk_grid(N, bn, B, bb, n_k_tiles)
    kernel = functools.partial(_qk_sb_kernel, n_k_tiles=n_k_tiles,
                               fuse_norm=fuse, eps=eps)
    in_specs = [
        pl.BlockSpec((bb, bk), lambda a, b, k: (_rt(a, b), k)),
        pl.BlockSpec((bk, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sb, bn), lambda a, b, k: (k, _nt(a, b))),  # d
        pl.BlockSpec((sb, bn), lambda a, b, k: (k, _nt(a, b))),  # dmin
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),  # sc rows
        pl.BlockSpec((sg, bn),
                     lambda a, b, k, _n=n_k_tiles: (k + _n, _nt(a, b))),  # mn rows
    ]
    operands = [x, qs, d, dmin, scmn, scmn]
    if fuse:
        in_specs.append(pl.BlockSpec((1, bk), lambda a, b, k: (0, k)))
        operands.append(norm_gain.reshape(1, K))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bn), lambda a, b, k: (_rt(a, b), _nt(a, b))),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N // 2 + scmn.size
            + (d.size + dmin.size) * d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _pick_block(dim: int, target: int, multiple: int) -> int:
    """Largest divisor of `dim` <= target that is a multiple of `multiple`;
    falls back to `dim` itself (whole-array block).

    The K-tile must be a multiple of 256 so that the per-tile scales
    block (bk//32 sublanes) satisfies the TPU (8, 128) min-tile rule
    without any in-kernel slicing (Mosaic rejects sublane offsets it
    cannot prove 8-aligned)."""
    best = None
    b = multiple
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += multiple
    return best if best is not None else dim


def _pick_block_k(dim: int, target: int, multiple: int) -> int:
    """K-tile choice: like _pick_block, but degenerate small divisors
    fall through to WHOLE-K.  Single-K-tile kernels measure fastest
    (no accumulator revisits/output rewrites, BENCH_NOTES); e.g.
    K=11008 = 256*43 has no 256-multiple divisor between 256 and 4096,
    and a 256-deep K loop with 43 accumulator passes loses badly."""
    best = _pick_block(dim, target, multiple)
    if best < target // 2 and dim <= 4 * target:
        return dim
    return best


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "eps",
                                              "rope_meta", "interpret"))
def q8_matmul(
    x: jax.Array,  # [B, K]
    qs: jax.Array,  # int8 [K, N]
    scales: jax.Array,  # [K//32, N]
    norm_gain: jax.Array | None = None,  # [K]: fuse rms_norm(x)*gain
    rope_cos: jax.Array | None = None,  # [B, Dh] (see _rope_epilogue)
    rope_sin: jax.Array | None = None,
    *,
    block_n: int = BLOCK_N,
    block_k: int = BLOCK_K,
    eps: float = 1e-6,
    rope_meta: tuple | None = None,  # (rope_cols, Dh)
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    K2, N = qs.shape
    assert K == K2, (x.shape, qs.shape)
    bk = _pick_block_k(K, block_k, 256)
    bn = _pick_block(N, block_n, 128)
    bb = _pick_block(B, 128, 8)  # activation-row tile (prefill batches)
    n_k_tiles = K // bk
    sg = bk // GROUP

    fuse = norm_gain is not None and n_k_tiles == 1
    if norm_gain is not None and not fuse:
        # K tiles: the kernel can't see the whole row; normalize outside.
        from tokenhawk_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_gain, eps)

    # N tiles OUTER, activation-row tiles inner: consecutive grid cells
    # then share the weight block (its index map is constant in i), so
    # Mosaic fetches each weight tile ONCE per call instead of B//bb
    # times — the old row-outer order re-streamed the ENTIRE weight
    # matrix B//bb times (4x at a 512-token prefill, ~15 GB of redundant
    # HBM traffic per call).  The re-read side is now the x tiles, which
    # are ~1000x smaller.  Decode (B <= bb) is order-identical.
    grid = _mk_grid(N, bn, B, bb, n_k_tiles)
    kernel = functools.partial(_q8_kernel, n_k_tiles=n_k_tiles,
                               fuse_norm=fuse, eps=eps, rope=rope_meta)
    in_specs = [
        pl.BlockSpec((bb, bk), lambda a, b, k: (_rt(a, b), k)),
        pl.BlockSpec((bk, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),
    ]
    operands = [x, qs, scales]
    if fuse:
        in_specs.append(pl.BlockSpec((1, bk), lambda a, b, k: (0, k)))
        operands.append(norm_gain.reshape(1, K))
    if rope_meta:
        dh = rope_meta[1]
        in_specs.append(pl.BlockSpec((bb, dh), lambda a, b, k: (_rt(a, b), 0)))
        in_specs.append(pl.BlockSpec((bb, dh), lambda a, b, k: (_rt(a, b), 0)))
        operands.extend([rope_cos, rope_sin])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bn), lambda a, b, k: (_rt(a, b), _nt(a, b))),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N + (K // GROUP) * N * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "eps", "interpret"))
def q4_matmul(
    x: jax.Array,  # [B, K]
    qs_packed: jax.Array,  # uint8 [K//2, N]
    scales_lo: jax.Array,  # [K//64, N] low-half group scales
    scales_hi: jax.Array,  # [K//64, N] high-half group scales
    norm_gain: jax.Array | None = None,  # [K]: fuse rms_norm(x)*gain
    *,
    block_n: int = BLOCK_N,
    block_k: int = BLOCK_KP,  # packed rows per tile
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    KP, N = qs_packed.shape
    assert KP * 2 == K, (x.shape, qs_packed.shape)
    bkp = _pick_block_k(KP, block_k, 256)
    bn = _pick_block(N, block_n, 128)
    bb = _pick_block(B, 128, 8)  # activation-row tile (prefill batches)
    n_k_tiles = KP // bkp
    sg = bkp // GROUP

    fuse = norm_gain is not None and n_k_tiles == 1
    if norm_gain is not None and not fuse:
        from tokenhawk_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_gain, eps)

    grid = _mk_grid(N, bn, B, bb, n_k_tiles)
    kernel = functools.partial(_q4_kernel, n_k_tiles=n_k_tiles,
                               biasdot=Q4_BIASDOT, fuse_norm=fuse, eps=eps)
    in_specs = [
        # x low half rows [k*bkp, k*bkp+bkp)
        pl.BlockSpec((bb, bkp), lambda a, b, k: (_rt(a, b), k)),
        # x high half rows [K//2 + k*bkp, ...)
        pl.BlockSpec((bb, bkp), lambda a, b, k, _n=n_k_tiles: (_rt(a, b), k + _n)),
        pl.BlockSpec((bkp, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),
    ]
    operands = [x, x, qs_packed, scales_lo, scales_hi]
    if fuse:
        g2 = norm_gain.reshape(2, KP)  # row 0 = low half, row 1 = high
        in_specs.append(pl.BlockSpec((1, bkp), lambda a, b, k: (0, k)))
        in_specs.append(pl.BlockSpec((1, bkp), lambda a, b, k: (1, k)))
        operands.extend([g2, g2])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bn), lambda a, b, k: (_rt(a, b), _nt(a, b))),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=KP * N + (K // GROUP) * N * scales_lo.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "eps",
                                              "rope_meta", "interpret"))
def q4_matmul_i4(
    x: jax.Array,  # [B, K]
    qs: jax.Array,  # int4 [K, N], logical rows (value - 8)
    scales: jax.Array,  # [K//32, N]
    norm_gain: jax.Array | None = None,  # [K]: fuse rms_norm(x)*gain
    rope_cos: jax.Array | None = None,  # [B, Dh] (see _rope_epilogue)
    rope_sin: jax.Array | None = None,
    *,
    block_n: int = BLOCK_N,
    block_k: int = BLOCK_K,
    eps: float = 1e-6,
    rope_meta: tuple | None = None,  # (rope_cols, Dh)
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    K2, N = qs.shape
    assert K == K2, (x.shape, qs.shape)
    bk = _pick_block_k(K, block_k, 256)
    bn = _pick_block(N, block_n, 128)
    bb = _pick_block(B, 128, 8)
    n_k_tiles = K // bk
    sg = bk // GROUP

    fuse = norm_gain is not None and n_k_tiles == 1
    if norm_gain is not None and not fuse:
        from tokenhawk_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_gain, eps)

    grid = _mk_grid(N, bn, B, bb, n_k_tiles)
    kernel = functools.partial(_q4i4_kernel, n_k_tiles=n_k_tiles,
                               fuse_norm=fuse, eps=eps, rope=rope_meta)
    in_specs = [
        pl.BlockSpec((bb, bk), lambda a, b, k: (_rt(a, b), k)),
        pl.BlockSpec((bk, bn), lambda a, b, k: (k, _nt(a, b))),
        pl.BlockSpec((sg, bn), lambda a, b, k: (k, _nt(a, b))),
    ]
    operands = [x, qs, scales]
    if fuse:
        in_specs.append(pl.BlockSpec((1, bk), lambda a, b, k: (0, k)))
        operands.append(norm_gain.reshape(1, K))
    if rope_meta:
        dh = rope_meta[1]
        in_specs.append(pl.BlockSpec((bb, dh), lambda a, b, k: (_rt(a, b), 0)))
        in_specs.append(pl.BlockSpec((bb, dh), lambda a, b, k: (_rt(a, b), 0)))
        operands.extend([rope_cos, rope_sin])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bn), lambda a, b, k: (_rt(a, b), _nt(a, b))),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N // 2
            + (K // GROUP) * N * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def rope_fusable(qw, rope_cols: int, head_dim: int) -> bool:
    """Can the half-style RoPE epilogue fuse into this weight's kernel?

    Requires a kind with the epilogue implemented, whole-K tiling (the
    epilogue runs at the single K step), N tiles aligned to head
    boundaries, and the q|k section covering whole tiles."""
    if qw.kind not in ("q8_0", "q4_0_i4"):
        return False
    K, N = qw.qs.shape
    bk = _pick_block_k(K, BLOCK_K, 256)
    if K // bk != 1:
        return False
    bn = _pick_block(N, BLOCK_N, 128)
    return bn % head_dim == 0 and rope_cols % bn == 0


def quant_matmul(
    x: jax.Array,
    qw,
    norm_gain: jax.Array | None = None,
    *,
    eps: float = 1e-6,
    rope: tuple | None = None,  # (cosE [rows, Dh], sinE, rope_cols, Dh)
    interpret: bool = False,
) -> jax.Array:
    """Dispatch by QWeight kind. x: [..., K] -> [..., N].

    `qw` is an ops.qweight.QWeight in device layout (q4_0 payload packed).
    Leading dims of x are flattened into B and padded to the f32 sublane
    count (8).  With `norm_gain`, rms_norm(x)*gain fuses into the kernel
    (zero-padded rows normalize to zero: mean of squares 0 -> rsqrt(eps)
    * 0).  With `rope` (caller must check `rope_fusable`), the half-style
    RoPE applies to output columns [0, rope_cols) in the kernel epilogue
    — used for the fused wqkv projection.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    xb = x.reshape(-1, K)
    B = xb.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    rc = rs = None
    rope_meta = None
    if rope is not None:
        rc, rs, rope_cols, dh = rope
        rc = rc.reshape(-1, dh)
        rs = rs.reshape(-1, dh)
        if Bp != B:
            rc = jnp.pad(rc, ((0, Bp - B), (0, 0)))
            rs = jnp.pad(rs, ((0, Bp - B), (0, 0)))
        rope_meta = (rope_cols, dh)
    if qw.kind == "q8_0":
        y = q8_matmul(xb, qw.qs, qw.scales, norm_gain, rc, rs, eps=eps,
                      rope_meta=rope_meta, interpret=interpret)
    elif qw.kind == "q4_0_i4":
        y = q4_matmul_i4(xb, qw.qs, qw.scales, norm_gain, rc, rs, eps=eps,
                         rope_meta=rope_meta, interpret=interpret)
    elif qw.kind in ("qk_i4", "qk_i8"):
        assert rope is None, "rope epilogue not implemented for k-quants"
        y = qk_matmul(xb, qw.qs, qw.scales, qw.mins, norm_gain,
                      group=qw.group, eps=eps, interpret=interpret)
    elif qw.kind == "q4k_sb":
        assert rope is None, "rope epilogue not implemented for k-quants"
        y = qk_sb_matmul(xb, qw.qs, qw.scales, qw.mins, qw.scales_hi,
                         norm_gain, eps=eps, interpret=interpret)
    elif qw.kind == "q4_0":
        assert rope is None, "rope epilogue not implemented for q4_0 packed"
        y = q4_matmul(xb, qw.qs, qw.scales, qw.scales_hi, norm_gain,
                      eps=eps, interpret=interpret)
    else:
        raise NotImplementedError(f"pallas path for {qw.kind}")
    if Bp != B:
        y = y[:B]
    return y.reshape(*lead, y.shape[-1])
