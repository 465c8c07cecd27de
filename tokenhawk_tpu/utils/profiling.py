"""Profiling and roofline accounting.

The reference's only instrumentation is wall-clock timing
(/root/reference/th.cpp:23-28; GPU timestamp queries are disabled,
cli/main.cpp:92).  Here:

  - `trace()` wraps `jax.profiler` for real device traces (TensorBoard
    or xprof-compatible);
  - roofline accounting: bytes a decode step must move vs the chip's HBM
    bandwidth, giving the speed-of-light tok/s the BASELINE holds
    kernels against (>=90% target).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

# Per-chip HBM bandwidth (GB/s). Sources: public TPU spec sheets.
HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}

DEFAULT_CHIP = "v5e"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def weight_stream_bytes(params) -> int:
    """Bytes of parameters streamed from HBM per decoded token.

    Every weight is read exactly once per token except the embedding
    table (a single-row gather).
    """
    from tokenhawk_tpu.ops.qweight import QWeight

    total = 0
    for leaf in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QWeight)
    ):
        total += leaf.nbytes
    total -= params.tok_embd.nbytes
    return total


def kv_stream_bytes(cfg, n_past: int, batch: int = 1, dtype_bytes: int = 2) -> int:
    """KV-cache bytes read per decode step at a given context depth."""
    return 2 * cfg.n_layer * batch * cfg.n_kv_head * n_past * cfg.head_dim * dtype_bytes


def decode_speed_of_light(
    params, cfg=None, n_past: int = 0, batch: int = 1,
    chip: str = DEFAULT_CHIP,
) -> float:
    """Roofline decode tok/s: HBM bandwidth / bytes-per-token."""
    bw = HBM_GBPS[chip] * 1e9
    bytes_per_tok = weight_stream_bytes(params)
    if cfg is not None and n_past:
        bytes_per_tok += kv_stream_bytes(cfg, n_past, batch) // max(batch, 1)
    return bw / bytes_per_tok


def roofline_fraction(achieved_tok_s: float, params, **kw) -> float:
    return achieved_tok_s / decode_speed_of_light(params, **kw)
