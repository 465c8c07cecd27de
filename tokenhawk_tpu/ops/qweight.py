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
    qs: jax.Array  # int8 [K, N]
    scales: jax.Array  # [K//G, N]
    mins: Optional[jax.Array]  # [K//G, N] or None
    kind: str = dataclasses.field(metadata=dict(static=True), default="q8_0")
    group: int = dataclasses.field(metadata=dict(static=True), default=QK)

    @property
    def shape(self):
        return self.qs.shape

    @property
    def dtype(self):
        return self.scales.dtype

    @property
    def nbytes(self) -> int:
        n = self.qs.size + self.scales.nbytes
        if self.mins is not None:
            n += self.mins.nbytes
        if self.kind in ("q4_0", "q4_1"):
            n -= self.qs.size // 2  # int4 payload packs two per byte on TPU
        return n

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the dense [K, N] matrix (tests / XLA fallback)."""
        K, N = self.qs.shape
        g = self.group
        q = self.qs.astype(jnp.float32).reshape(K // g, g, N)
        w = q * self.scales.astype(jnp.float32)[:, None, :]
        if self.mins is not None:
            w = w + self.mins.astype(jnp.float32)[:, None, :]
        return w.reshape(K, N).astype(dtype)


ArrayOrQ = Union[jax.Array, QWeight]


def from_quantized_tensor(
    qt: QuantizedTensor, scale_dtype=jnp.float32
) -> QWeight:
    """GGML host tensor [out, in] -> device QWeight [in, out]."""
    if qt.qs.ndim != 2:
        raise ValueError(f"expected 2-D weight, got {qt.shape}")
    out_dim, in_dim = qt.qs.shape
    qs = jnp.asarray(np.ascontiguousarray(qt.qs.T))  # [in, out] int8
    scales = jnp.asarray(np.ascontiguousarray(qt.scales.T), dtype=scale_dtype)
    mins = None
    if qt.mins is not None:
        mins = jnp.asarray(np.ascontiguousarray(qt.mins.T), dtype=scale_dtype)
    kind = {GGMLType.Q8_0: "q8_0", GGMLType.Q4_0: "q4_0", GGMLType.Q4_1: "q4_1"}[
        qt.kind
    ]
    return QWeight(qs=qs, scales=scales, mins=mins, kind=kind)


def quantize_array(w, kind: str, group: int = QK, scale_dtype=jnp.float32) -> QWeight:
    """Quantize a dense [K, N] device/host array into a QWeight (tests)."""
    from tokenhawk_tpu.ggml import quants as hq

    w = np.asarray(w, dtype=np.float32).T  # -> [N, K]: groups along last axis
    gk = {"q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1}[kind]
    qt = hq.quantize(w, gk)
    return from_quantized_tensor(qt, scale_dtype=scale_dtype)
