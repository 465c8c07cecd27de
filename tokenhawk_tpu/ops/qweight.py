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
    # kind "q4_0_i4": qs is a PACKED int4 [K, N] array in logical row
    # order (the q4_0 value-8 fits int4's [-8, 7] exactly) and `scales`
    # holds all groups [K//G, N] (scales_hi is None).  Same 0.5 B/elt
    # HBM footprint as the byte-packed layout, but Mosaic's hardware
    # int4->f32 convert replaces the widen/mask/shift/sub unpack chain
    # (~2 VPU ops/elt vs ~4.5): 657 vs 450 GB/s measured on v5e.
    # TPU-only (XLA:CPU compiles S4 ops pathologically slowly).
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
        def nb(a):
            if a is None:
                return 0
            # sub-byte dtypes pack 2/byte in HBM but report itemsize 1
            if a.dtype in (jnp.int4, jnp.uint4):
                return a.size // 2
            return a.nbytes

        return nb(self.qs) + nb(self.scales) + nb(self.mins) + nb(self.scales_hi)

    def full_scales(self) -> jax.Array:
        """Scales at logical group order [..., K//G, N]."""
        if self.scales_hi is None:
            return self.scales
        return jnp.concatenate([self.scales, self.scales_hi], axis=-2)

    def unpacked_qs(self) -> jax.Array:
        """Integer codes at logical shape [..., K, N] (sign already applied)."""
        if self.kind in ("q4_0_i4", "qk_i4", "q4k_sb"):
            return self.qs.astype(jnp.int8)
        if self.kind != "q4_0":
            return self.qs
        lo = (self.qs & 0x0F).astype(jnp.int8) - 8
        hi = (self.qs >> 4).astype(jnp.int8) - 8
        return jnp.concatenate([lo, hi], axis=-2)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the dense [K, N] matrix (tests / XLA fallback)."""
        if self.kind == "q4k_sb":
            # super-block form: qs = code-8 int4; scales/mins = per-256
            # d/dmin; scales_hi = [sc6 | mn6] int8 rows.
            q = self.qs.astype(jnp.float32)  # [..., K, N], code - 8
            K, N = q.shape[-2:]
            sg = K // self.group
            sc = self.scales_hi[..., :sg, :].astype(jnp.float32)
            mn = self.scales_hi[..., sg:, :].astype(jnp.float32)
            d = jnp.repeat(self.scales.astype(jnp.float32), 8, axis=-2)
            dm = jnp.repeat(self.mins.astype(jnp.float32), 8, axis=-2)
            s = d * sc  # [..., K//32, N]
            b = 8.0 * s - dm * mn
            lead = q.shape[:-2]
            q3 = q.reshape(*lead, sg, self.group, N)
            w = q3 * s[..., :, None, :] + b[..., :, None, :]
            return w.reshape(*lead, K, N).astype(dtype)
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

# q4_0 device layout: "auto" picks int4-native on TPU, byte-packed
# elsewhere; "i4" / "packed" force.  See QWeight docstring.
import os as _os

_Q4_LAYOUT = _os.environ.get("THAWK_Q4_LAYOUT", "auto")


def q4_use_i4() -> bool:
    if _Q4_LAYOUT == "i4":
        return True
    if _Q4_LAYOUT == "packed":
        return False
    return jax.default_backend() == "tpu"


@jax.jit
def _q4_unpack_to_i4(qs, slo, shi):
    """Packed uint8 [..., KP, N] (k_shards=1 semantics) -> int4 [..., K, N]
    + full scales, on device."""
    p = qs.astype(jnp.int32)
    lo = ((p & 0x0F) - 8).astype(jnp.int4)
    hi = ((p >> 4) - 8).astype(jnp.int4)
    q4 = jnp.concatenate([lo, hi], axis=-2)
    s = jnp.concatenate([slo, shi], axis=-2)
    return q4, s


def q4_packed_to_i4(w: QWeight) -> QWeight:
    """Convert a k_shards=1 byte-packed q4_0 QWeight to the int4-native
    device layout (kind "q4_0_i4").  One-time load cost: reads the packed
    bytes once on device and writes the (equally sized) int4 array."""
    if w.kind != "q4_0":
        raise ValueError(f"expected q4_0, got {w.kind}")
    q4, s = _q4_unpack_to_i4(w.qs, w.scales, w.scales_hi)
    return QWeight(qs=q4, scales=s, mins=None, scales_hi=None,
                   kind="q4_0_i4", group=w.group)


def maybe_i4_params(tree):
    """Tree-map q4_0 leaves to the int4 layout when enabled (TPU)."""
    if not q4_use_i4():
        return tree

    def conv(leaf):
        if isinstance(leaf, QWeight) and leaf.kind == "q4_0":
            return q4_packed_to_i4(leaf)
        return leaf

    return jax.tree_util.tree_map(
        conv, tree, is_leaf=lambda x: isinstance(x, QWeight))


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


def from_kquant_raw(
    gtype, raw: bytes, shape, scale_dtype=jnp.float32,
    use_i4: bool | None = None, sb_ok: bool = True,
) -> QWeight:
    """GGUF k-quant block stream ([out, in] tensor) -> native device
    QWeight (bit-exact with scale_dtype=f32).

    Exactness caveat: the derived per-group scale s = d*sc (an f16 x
    6-bit product, exactly representable in f32 but usually not in
    bf16) and the affine bias 8s-m / 16s-m are rounded to
    `scale_dtype`.  The loader's default bf16 sides therefore carry
    ~0.2% relative side rounding — the same class as the bf16 scale
    rounding q4_0/q8_0 take for the halved side traffic; pass
    scale_dtype=f32 for bit-exact dequantization.

    The k-quant super-block structure (ggml/kquants.py) reduces to
    per-group affine codes:  w = s[g]*code - m[g].  On device that is
      Q4_K: int4 qs = code-8,  scales = s, mins = 8*s  - m  (group 32)
      Q5_K: int8 qs = code-16, scales = s, mins = 16*s - m  (group 32)
      Q6_K: int8 qs = code,    scales = s, mins = None      (group 16)
    with dequant w = qs*scales + mins — exactly QWeight.dequantize's
    affine form, so the generic qk Pallas kernel serves these at native
    bandwidth (~5 bpw for Q4_K) instead of the former requantize-to-Q8_0
    detour (~8.5 bpw on device plus a second rounding).
    """
    from tokenhawk_tpu.ggml.format import GGMLType
    from tokenhawk_tpu.ggml.kquants import (
        extract_q2_k,
        extract_q3_k,
        extract_q4_k,
        extract_q5_k,
        extract_q6_k,
    )

    out_dim, in_dim = shape
    n = out_dim * in_dim
    if use_i4 is None:
        use_i4 = q4_use_i4()  # int4 codes are TPU-only (XLA:CPU S4 pathology)

    if gtype == GGMLType.Q4_K:
        group = 32
        if (sb_ok and use_i4 and in_dim % 1024 == 0
                and (in_dim % 4096 == 0 or in_dim <= 16384)
                and _os.environ.get("THAWK_Q4K_SB", "0") == "1"):
            # NEGATIVE RESULT, default OFF (THAWK_Q4K_SB=1 re-enables):
            # keeping Q4_K's two quantization levels separate on device
            # (4.63 bpw vs the flat form's 5.0) measured SLOWER than
            # flat: 556-564 vs 635 GB/s in-kernel (0.275-0.279 vs 0.264
            # ms/pass at square-4096 decode shapes, v5e), plus a ~6x
            # Mosaic compile blowup — the per-tile expansion of the
            # per-256 d/dmin to per-32 (sublane-interleaved broadcast
            # AND a block-diagonal-MXU-dot variant both measured) plus
            # the two extra side streams cost more than the 7.5% byte
            # saving buys on a VPU-saturated kernel.  End-to-end 7B:
            # 129.5 (sb) vs 140.1 (flat) tok/s.
            # Alignment gate: the kernel slices int8 sc|mn rows at
            # sg-row offsets (needs K % 1024) and tiles K either in
            # 4096-multiples (16-sublane f16 d blocks) or as one
            # whole-K block (<= 16384 keeps the VMEM tile sane).
            # SUPER-BLOCK device layout (4.63 bpw vs the flat form's
            # 5.0): int4 codes + int8 6-bit sc|mn + per-256 f16 d|dmin;
            # the kernel expands s = d*sc / b = 8s - dmin*mn per tile
            # (two sublane-broadcast multiplies).
            from tokenhawk_tpu.ggml.kquants import extract_q4_k_sb

            codes, sc6, mn6, d, dmin = extract_q4_k_sb(raw, n)
            qs_t = np.ascontiguousarray(
                (codes.astype(np.int16) - 8).astype(np.int8)
                .reshape(out_dim, in_dim).T)
            scmn = np.concatenate([
                np.ascontiguousarray(
                    sc6.reshape(out_dim, in_dim // 32).T),
                np.ascontiguousarray(
                    mn6.reshape(out_dim, in_dim // 32).T),
            ], axis=0).astype(np.int8)  # [2*(K//32), N]
            d_t = np.ascontiguousarray(
                d.reshape(out_dim, in_dim // 256).T)
            dm_t = np.ascontiguousarray(
                dmin.reshape(out_dim, in_dim // 256).T)
            return QWeight(
                qs=jnp.asarray(qs_t, dtype=jnp.int4),
                scales=jnp.asarray(d_t, dtype=scale_dtype),
                mins=jnp.asarray(dm_t, dtype=scale_dtype),
                scales_hi=jnp.asarray(scmn),
                kind="q4k_sb", group=group,
            )
        codes, s, m = extract_q4_k(raw, n)
        if use_i4:
            qs_np = (codes.astype(np.int16) - 8).astype(np.int8)
            qdtype = jnp.int4
            bias = 8.0 * s - m
        else:
            qs_np = codes.astype(np.int8)
            qdtype = jnp.int8
            bias = -m
    elif gtype == GGMLType.Q5_K:
        codes, s, m = extract_q5_k(raw, n)
        group = 32
        qs_np = (codes.astype(np.int16) - 16).astype(np.int8)
        qdtype = jnp.int8
        bias = 16.0 * s - m
    elif gtype == GGMLType.Q6_K:
        codes, s = extract_q6_k(raw, n)
        group = 16
        qs_np = codes
        qdtype = jnp.int8
        bias = None
    elif gtype == GGMLType.Q2_K:
        codes, s, m = extract_q2_k(raw, n)
        group = 16
        if use_i4:
            qs_np = (codes.astype(np.int16) - 2).astype(np.int8)
            qdtype = jnp.int4
            bias = 2.0 * s - m
        else:
            qs_np = codes.astype(np.int8)
            qdtype = jnp.int8
            bias = -m
    elif gtype == GGMLType.Q3_K:
        codes, s = extract_q3_k(raw, n)
        group = 16
        qs_np = codes  # already [-4, 3]
        qdtype = jnp.int4 if use_i4 else jnp.int8
        bias = None
    else:
        raise ValueError(f"not a supported k-quant: {gtype!r}")

    # [out, in] -> [in, out] device orientation; groups run down `in`.
    qs_t = np.ascontiguousarray(qs_np.reshape(out_dim, in_dim).T)
    s_t = np.ascontiguousarray(
        s.reshape(out_dim, in_dim // group).T).astype(np.float32)
    qs_dev = jnp.asarray(qs_t, dtype=qdtype)
    mins_dev = None
    if bias is not None:
        m_t = np.ascontiguousarray(
            bias.reshape(out_dim, in_dim // group).T).astype(np.float32)
        mins_dev = jnp.asarray(m_t, dtype=scale_dtype)
    return QWeight(
        qs=qs_dev, scales=jnp.asarray(s_t, dtype=scale_dtype),
        mins=mins_dev, scales_hi=None,
        kind="qk_i4" if qdtype == jnp.int4 else "qk_i8", group=group,
    )


def to_qk16(w: QWeight) -> QWeight:
    """EXACT re-encode of an affine/symmetric int-code QWeight to the
    common (int8 codes, group 16, with mins) form.

    Used to stack per-layer weights when a GGUF file mixes kinds within
    one tensor family across layers (llama.cpp's *_M recipes put Q6_K in
    attention.wv / feed_forward.w2 on some layers): group-32 scales
    repeat to group-16, missing mins become zeros, int4 codes widen to
    int8 — every represented value is unchanged, only the container
    grows (group-16 affine int8 = 1.25 B/elt)."""
    if w.kind == "qk_i8" and w.group == 16 and w.mins is not None:
        return w
    if w.kind == "q4k_sb":
        # expand the super-block structure to flat per-16 affine int8
        K = w.qs.shape[-2]
        sg = K // w.group
        sc = w.scales_hi[..., :sg, :].astype(jnp.float32)
        mn = w.scales_hi[..., sg:, :].astype(jnp.float32)
        d = jnp.repeat(w.scales.astype(jnp.float32), 8, axis=-2)
        dm = jnp.repeat(w.mins.astype(jnp.float32), 8, axis=-2)
        s = d * sc
        b = 8.0 * s - dm * mn
        return QWeight(
            qs=w.qs.astype(jnp.int8),
            scales=jnp.repeat(s, 2, axis=-2),  # f32: keeps d*sc exact
            mins=jnp.repeat(b, 2, axis=-2),
            scales_hi=None, kind="qk_i8", group=16,
        )
    if w.kind in ("qk_i4", "qk_i8", "q8_0"):
        qs = w.qs.astype(jnp.int8)
        rep = w.group // 16
        if rep > 1:
            scales = jnp.repeat(w.scales, rep, axis=-2)
            mins = (jnp.repeat(w.mins, rep, axis=-2)
                    if w.mins is not None else None)
        else:
            scales = w.scales
            mins = w.mins
        if mins is None:
            mins = jnp.zeros_like(scales)
        return QWeight(qs=qs, scales=scales, mins=mins, scales_hi=None,
                       kind="qk_i8", group=16)
    raise ValueError(f"cannot re-encode kind {w.kind!r} to qk16")


def from_quantized_tensor(
    qt: QuantizedTensor, scale_dtype=jnp.float32, k_shards: int = 1
) -> QWeight:
    """GGML host tensor [out, in] -> device QWeight [in, out] (q4_0 packed)."""
    if qt.qs.ndim != 2:
        raise ValueError(f"expected 2-D weight, got {qt.shape}")
    if qt.kind in (GGMLType.Q5_0, GGMLType.Q5_1):
        # 5-bit codes don't pack into int4; serve via the generic affine
        # int8 kernel (qk_i8): Q5_0 symmetric [-16,15], Q5_1 affine
        # [0,31] with per-group mins.
        qs_t = jnp.asarray(np.ascontiguousarray(qt.qs.T))  # int8 [in, out]
        s_t = jnp.asarray(np.ascontiguousarray(qt.scales.T),
                          dtype=scale_dtype)
        m_t = None
        if qt.mins is not None:
            m_t = jnp.asarray(np.ascontiguousarray(qt.mins.T),
                              dtype=scale_dtype)
        return QWeight(qs=qs_t, scales=s_t, mins=m_t, scales_hi=None,
                       kind="qk_i8", group=QK)
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
