"""Device-side quantized weight container.

The host loader produces `tokenhawk_tpu.ggml.quants.QuantizedTensor`
(unpacked int8 + f32 scales).  On device we keep:

  qs:     int8 [K, N]   quantized integers, K = input dim (contraction)
  scales: f32  [K//G, N] per-(group-of-G input rows, output col) scale
  mins:   f32  [K//G, N] affine offset (Q4_1 only)

i.e. weights are stored *transposed* relative to GGML ([out, in] on disk
-> [in, out] on device) so activations contract with `x @ W` directly on
the MXU, and the quantization groups run down the contraction dimension —
the layout the fused Pallas dequant+matmul kernel wants.

This is the TPU-native answer to the reference's packed-f16-in-u32
buffers + in-shader decode (/root/reference/th.cpp:363-394).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tokenhawk_tpu.ggml.format import GGMLType, QK
from tokenhawk_tpu.ggml.quants import QuantizedTensor


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QWeight:
    """Quantized weight.

    q8_0:  qs int8 [K, N]
    q4_0:  qs uint8 [K//2, N] PACKED — byte row j holds logical row j in
           its low nibble and row j + K//2 in its high nibble, both
           offset-binary (+8).  This is the canonical device layout: both
           halves dequantize from contiguous slices (no lane interleave),
           which the Pallas kernel exploits; see pallas/qmatmul.py.
    q4_1:  qs int8 [K, N] in [0, 15] with affine mins.
    """

    qs: jax.Array
    scales: jax.Array  # [K//G, N]; q4_0: LOW-half scales [K//(2G), N]
    mins: Optional[jax.Array]  # [K//G, N] or None
    # q4_0 only: scales of the high-half rows [K//(2G), N].  Kept as a
    # separate array so Pallas BlockSpecs can tile each half without
    # unaligned sublane slicing (Mosaic requires provable 8-multiples).
    scales_hi: Optional[jax.Array] = None
    kind: str = dataclasses.field(metadata=dict(static=True), default="q8_0")
    group: int = dataclasses.field(metadata=dict(static=True), default=QK)

    @property
    def shape(self):
        if self.kind == "q4_0":
            s = self.qs.shape
            return (*s[:-2], s[-2] * 2, s[-1])
        return self.qs.shape

    @property
    def dtype(self):
        return self.scales.dtype

    @property
    def nbytes(self) -> int:
        n = self.qs.nbytes + self.scales.nbytes
        if self.mins is not None:
            n += self.mins.nbytes
        if self.scales_hi is not None:
            n += self.scales_hi.nbytes
        return n

    def full_scales(self) -> jax.Array:
        """Scales at logical group order [..., K//G, N]."""
        if self.scales_hi is None:
            return self.scales
        return jnp.concatenate([self.scales, self.scales_hi], axis=-2)

    def unpacked_qs(self) -> jax.Array:
        """Integer codes at logical shape [..., K, N] (sign already applied)."""
        if self.kind != "q4_0":
            return self.qs
        lo = (self.qs & 0x0F).astype(jnp.int8) - 8
        hi = (self.qs >> 4).astype(jnp.int8) - 8
        return jnp.concatenate([lo, hi], axis=-2)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the dense [K, N] matrix (tests / XLA fallback)."""
        qs = self.unpacked_qs()
        K, N = qs.shape[-2:]
        g = self.group
        lead = qs.shape[:-2]
        q = qs.astype(jnp.float32).reshape(*lead, K // g, g, N)
        w = q * self.full_scales().astype(jnp.float32)[..., :, None, :]
        if self.mins is not None:
            w = w + self.mins.astype(jnp.float32)[..., :, None, :]
        return w.reshape(*lead, K, N).astype(dtype)


ArrayOrQ = Union[jax.Array, QWeight]


def pack_q4_rows(qs_t: np.ndarray, k_shards: int = 1) -> np.ndarray:
    """int8 [K, N] in [-8,7] -> packed uint8 [K//2, N].

    Packing is per K-shard: within each of `k_shards` contiguous row
    blocks, row j pairs with row j + block//2 (offset-binary +8).  With
    k_shards == tp, slicing the packed array into tp row chunks yields
    exactly the pack of each shard's local rows — required when the
    contraction dim is sharded (row-parallel wo/w2 under shard_map TP).
    """
    K = qs_t.shape[0]
    if K % (64 * k_shards):
        raise ValueError(f"q4_0 input dim {K} must be a multiple of {64 * k_shards}")
    u = (qs_t.astype(np.int16) + 8).astype(np.uint8)
    blk = K // k_shards
    parts = []
    for s in range(k_shards):
        b = u[s * blk : (s + 1) * blk]
        parts.append(b[: blk // 2] | (b[blk // 2 :] << 4))
    return np.concatenate(parts, axis=0)


def concat_qweights(ws, axis: int = -1) -> QWeight:
    """Concatenate QWeights along the output (column) axis.

    Column-wise concatenation is always valid for group-quantized
    weights: each column's groups quantize independently.  Used to fuse
    wq|wk|wv and w1|w3 into single matmuls.
    """
    kinds = {w.kind for w in ws}
    if len(kinds) != 1:
        raise ValueError(f"cannot concat mixed kinds {kinds}")

    def cat(field):
        vals = [getattr(w, field) for w in ws]
        if vals[0] is None:
            return None
        return jnp.concatenate(vals, axis=axis)

    return QWeight(
        qs=cat("qs"), scales=cat("scales"), mins=cat("mins"),
        scales_hi=cat("scales_hi"), kind=ws[0].kind, group=ws[0].group,
    )


def split_q4_scales(scales_t: np.ndarray, k_shards: int = 1):
    """[K//32, N] group scales -> (lo, hi) halves matching pack_q4_rows.

    Per K-shard block, the first half of its group rows scales the low
    nibbles and the second half the high nibbles.  With k_shards > 1 the
    returned arrays are ordered shard-major, so slicing them into
    k_shards row chunks yields each shard's local lo/hi scales (the
    layout shard_map sees).
    """
    G = scales_t.shape[0]
    blk = G // k_shards
    lo_parts, hi_parts = [], []
    for s in range(k_shards):
        b = scales_t[s * blk : (s + 1) * blk]
        lo_parts.append(b[: blk // 2])
        hi_parts.append(b[blk // 2 :])
    return np.concatenate(lo_parts, 0), np.concatenate(hi_parts, 0)


def from_quantized_tensor(
    qt: QuantizedTensor, scale_dtype=jnp.float32, k_shards: int = 1
) -> QWeight:
    """GGML host tensor [out, in] -> device QWeight [in, out] (q4_0 packed)."""
    if qt.qs.ndim != 2:
        raise ValueError(f"expected 2-D weight, got {qt.shape}")
    kind = {GGMLType.Q8_0: "q8_0", GGMLType.Q4_0: "q4_0", GGMLType.Q4_1: "q4_1"}[
        qt.kind
    ]
    qs_t = np.ascontiguousarray(qt.qs.T)  # [in, out] int8
    scales_t = np.ascontiguousarray(qt.scales.T).astype(np.float32)
    scales_hi = None
    if kind == "q4_0":
        qs = jnp.asarray(pack_q4_rows(qs_t, k_shards))
        lo, hi = split_q4_scales(scales_t, k_shards)
        scales = jnp.asarray(lo, dtype=scale_dtype)
        scales_hi = jnp.asarray(hi, dtype=scale_dtype)
    else:
        qs = jnp.asarray(qs_t)
        scales = jnp.asarray(scales_t, dtype=scale_dtype)
    mins = None
    if qt.mins is not None:
        mins = jnp.asarray(np.ascontiguousarray(qt.mins.T), dtype=scale_dtype)
    return QWeight(qs=qs, scales=scales, mins=mins, scales_hi=scales_hi, kind=kind)


def quantize_array(
    w, kind: str, group: int = QK, scale_dtype=jnp.float32, k_shards: int = 1
) -> QWeight:
    """Quantize a dense [K, N] device/host array into a QWeight (tests)."""
    from tokenhawk_tpu.ggml import quants as hq

    w = np.asarray(w, dtype=np.float32).T  # -> [N, K]: groups along last axis
    gk = {"q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1}[kind]
    qt = hq.quantize(w, gk)
    return from_quantized_tensor(qt, scale_dtype=scale_dtype, k_shards=k_shards)
