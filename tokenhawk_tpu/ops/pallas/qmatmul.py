"""Fused dequantize + matmul Pallas kernel.

Computes y = x @ dequant(W) for weight-only-quantized W without ever
materializing the dense matrix in HBM: quantized tiles stream
HBM -> VMEM, dequantize on the VPU, and feed the MXU per 32-element
quantization group; the per-group scale is applied to the [B, TN] partial
sum (cheap) instead of the [TK, TN] weight tile (expensive).

This is the TPU answer to the reference's decode GEMV
`wgsl_vector_mat_mul_transpose` (/root/reference/th.cpp:2839-2892, one
256-thread workgroup per output element) and its packed-f16 in-shader
decode (/root/reference/th.cpp:363-394): the roofline limit is reading
the weight bytes once per token, so the kernel's only job is to keep the
dequant off the critical path.

Layouts (produced by `tokenhawk_tpu.ops.qweight`):
  q8_0: qs int8 [K, N], scales [K//32, N]
  q4_0 packed: qs uint8 [K//2, N] where byte row j holds logical row j in
        the low nibble and row j + K//2 in the high nibble (offset-binary,
        +8), so both halves dequantize from contiguous slices with no
        lane interleave; scales [K//32, N] ordered by logical row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32  # quantization block length (ggml QK)


def _group_dot_acc(x, w_q, scales, acc, *, in_dtype):
    """acc += sum_g (x[:, g] @ w_q[g]) * scales[g]  over groups of GROUP rows."""
    n_groups = w_q.shape[0] // GROUP
    for g in range(n_groups):
        xg = x[:, g * GROUP : (g + 1) * GROUP]
        wg = w_q[g * GROUP : (g + 1) * GROUP, :].astype(in_dtype)
        pg = jnp.dot(xg, wg, preferred_element_type=jnp.float32)  # [B, TN]
        acc = acc + pg * scales[g, :][None, :].astype(jnp.float32)
    return acc


def _q8_kernel(x_ref, qs_ref, s_ref, o_ref, acc_ref, *, n_k_tiles, in_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] = _group_dot_acc(
        x_ref[...], qs_ref[...], s_ref[...], acc_ref[...], in_dtype=in_dtype
    )

    @pl.when(pl.program_id(1) == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q4_kernel(
    x_lo_ref, x_hi_ref, qs_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
    *, n_k_tiles, in_dtype,
):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic supports neither int8 vector subtraction nor uint8->bf16
    # casts; widen to int32 for the unpack arithmetic, then convert.
    p32 = qs_ref[...].astype(jnp.int32)  # uint8 [TKP, TN] widened
    lo = ((p32 & 0x0F) - 8).astype(in_dtype)
    hi = ((p32 >> 4) - 8).astype(in_dtype)

    acc = acc_ref[...]
    acc = _group_dot_acc(x_lo_ref[...], lo, s_lo_ref[...], acc, in_dtype=in_dtype)
    acc = _group_dot_acc(x_hi_ref[...], hi, s_hi_ref[...], acc, in_dtype=in_dtype)
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_block(dim: int, target: int, multiple: int) -> Optional[int]:
    """Largest divisor of `dim` that is <= target and a multiple of `multiple`."""
    best = None
    b = multiple
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += multiple
    return best


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def q8_matmul(
    x: jax.Array,  # [B, K]
    qs: jax.Array,  # int8 [K, N]
    scales: jax.Array,  # [K//32, N]
    *,
    block_n: int = 256,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    K2, N = qs.shape
    assert K == K2, (x.shape, qs.shape)
    bk = _pick_block(K, block_k, GROUP)
    bn = _pick_block(N, block_n, 128)
    if bk is None or bn is None:
        raise ValueError(f"untileable shapes K={K} N={N}")
    n_k_tiles = K // bk

    grid = (N // bn, n_k_tiles)
    kernel = functools.partial(_q8_kernel, n_k_tiles=n_k_tiles, in_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
            pl.BlockSpec((bk // GROUP, bn), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=K * N + (K // GROUP) * N * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qs, scales)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def q4_matmul(
    x: jax.Array,  # [B, K]
    qs_packed: jax.Array,  # uint8 [K//2, N]
    scales: jax.Array,  # [K//32, N]
    *,
    block_n: int = 256,
    block_k: int = 512,  # packed rows per tile
    interpret: bool = False,
) -> jax.Array:
    B, K = x.shape
    KP, N = qs_packed.shape
    assert KP * 2 == K, (x.shape, qs_packed.shape)
    bkp = _pick_block(KP, block_k, GROUP)
    bn = _pick_block(N, block_n, 128)
    if bkp is None or bn is None:
        raise ValueError(f"untileable shapes K={K} N={N}")
    n_k_tiles = KP // bkp
    sg = bkp // GROUP  # scale rows per (half) tile

    grid = (N // bn, n_k_tiles)
    kernel = functools.partial(_q4_kernel, n_k_tiles=n_k_tiles, in_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # x low half rows [k*bkp, k*bkp+bkp)
            pl.BlockSpec((B, bkp), lambda j, k: (0, k)),
            # x high half rows [K//2 + k*bkp, ...)
            pl.BlockSpec((B, bkp), lambda j, k, _n=n_k_tiles: (0, k + _n)),
            pl.BlockSpec((bkp, bn), lambda j, k: (k, j)),
            # scales for the low half: groups [k*sg, k*sg+sg)
            pl.BlockSpec((sg, bn), lambda j, k: (k, j)),
            # scales for the high half: offset by KP // GROUP group rows
            pl.BlockSpec((sg, bn), lambda j, k, _n=n_k_tiles: (k + _n, j)),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=KP * N + (K // GROUP) * N * scales.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, qs_packed, scales, scales)


def pack_q4(qs: jax.Array) -> jax.Array:
    """int8 [K, N] in [-8, 7] -> packed uint8 [K//2, N].

    Byte row j = (qs[j] + 8) | ((qs[j + K//2] + 8) << 4): the low nibbles
    hold the first half of the rows, the high nibbles the second half, so
    the kernel dequantizes both halves with contiguous slices.
    """
    K = qs.shape[0]
    u = (qs.astype(jnp.int32) + 8).astype(jnp.uint8)
    lo = u[: K // 2]
    hi = u[K // 2 :]
    return (lo | (hi << 4)).astype(jnp.uint8)


def quant_matmul(
    x: jax.Array,
    qw,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch by QWeight kind. x: [..., K] -> [..., N].

    `qw` is an ops.qweight.QWeight whose payload has been device-packed
    (q4_0 -> packed nibbles).  Leading dims of x are flattened into B and
    padded to the f32 sublane count (8).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    xb = x.reshape(-1, K)
    B = xb.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    if qw.kind == "q8_0":
        y = q8_matmul(xb, qw.qs, qw.scales, interpret=interpret)
    elif qw.kind == "q4_0":
        y = q4_matmul(xb, qw.qs, qw.scales, interpret=interpret)
    else:
        raise NotImplementedError(f"pallas path for {qw.kind}")
    if Bp != B:
        y = y[:B]
    return y.reshape(*lead, y.shape[-1])
