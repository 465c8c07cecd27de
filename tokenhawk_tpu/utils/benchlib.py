"""Reliable device timing under an async/relayed runtime.

`block_until_ready` can acknowledge early when the device sits behind a
relay (observed on the tunneled single-chip environment: impossible
multi-TB/s readings).  `measure_iter_seconds` forces a host readback of a
scalar derived from the result and cancels fixed dispatch/transfer
overhead by differencing two in-graph iteration counts:

    T(n) = fixed_overhead + n * per_iter  =>  per_iter = (T(n2)-T(n1))/(n2-n1)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_call(fn, args) -> float:
    t0 = time.perf_counter()
    out = fn(*args)
    # Force a real round-trip: a scalar readback cannot complete before the
    # computation that produces it.
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
    return time.perf_counter() - t0


def measure_iter_seconds(
    make_fn: Callable[[int], Callable],
    args,
    n_small: int = 16,
    n_large: int = 64,
    trials: int = 3,
    reduce: str = "min",
) -> float:
    """make_fn(n) returns a jitted callable running n in-graph iterations.

    reduce: "min" picks the cleanest trial (right for long-running model
    chunks where noise only ADDS time); "median" resists the relay's
    ack jitter making t_large - t_small too SMALL (which "min" would
    happily turn into an impossibly fast reading — a matrix run once
    recorded a 2.2 TB/s HBM probe that way)."""
    f_small = make_fn(n_small)
    f_large = make_fn(n_large)
    # warmup/compile both
    _time_call(f_small, args)
    _time_call(f_large, args)
    per_iters = []
    for _ in range(trials):
        t_small = _time_call(f_small, args)
        t_large = _time_call(f_large, args)
        per_iters.append((t_large - t_small) / (n_large - n_small))
    if reduce == "median":
        est = sorted(per_iters)[len(per_iters) // 2]
    else:
        est = min(per_iters)
    return max(est, 1e-9)


def _stream_sum_kernel(seed_ref, x_ref, o_ref):
    """Reduce one block to a scalar; the DMA of the full block into VMEM
    is the measured work, the VPU sum just guarantees nothing is elided.

    `seed` is threaded through so repeated calls form a dependency chain
    — without it XLA hoists the (loop-invariant) kernel out of the
    timing loop and the probe measures nothing.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o_ref[0, 0] = seed_ref[0, 0]

    o_ref[0, 0] += jnp.sum(x_ref[...].astype(jnp.float32))


def hbm_stream_gbps(
    nbytes: int = 1 << 31,
    block_rows: int = 1024,
    trials: int = 5,
) -> float:
    """Independent HBM speed-of-light probe: pure read-stream bandwidth.

    The decode roofline claim ("X% of HBM SoL") needs a yardstick that is
    NOT the model itself — a same-session f16-model calibration is
    circular if a shared inefficiency caps both.  This streams `nbytes`
    of bf16 from HBM through the standard Pallas double-buffered block
    pipeline (the same mechanism the quantized matmul kernels use to
    stream weights) and reduces each block to a scalar, so the only HBM
    traffic is one sequential read of the array.  Returns achieved GB/s.

    Methodology matches `measure_iter_seconds`: the array is re-read n
    times inside ONE jitted executable (lax.fori_loop over the kernel —
    HBM has no cache, every pass pays full price), and two iteration
    counts are differenced to cancel dispatch/relay overhead.
    """
    cols = 1024
    rows = max(block_rows, int(nbytes) // (2 * cols) // block_rows * block_rows)
    x = jnp.ones((rows, cols), jnp.bfloat16)
    actual_bytes = rows * cols * 2

    stream = pl.pallas_call(
        _stream_sum_kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM, block_shape=(1, 1),
                         index_map=lambda i: (0, 0)),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pltpu.SMEM, block_shape=(1, 1), index_map=lambda i: (0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def make_fn(n):
        @jax.jit
        def f(x):
            def body(_, acc):
                return stream(acc, x)

            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((1, 1), jnp.float32))

        return f

    # Wide iteration spread (20 extra passes = ~0.7 s of pure streaming)
    # + median-of-trials: the relay's ack jitter is tens of ms, which at
    # a narrow spread with min-reduction once produced a 2.2 TB/s
    # "measurement" (2.7x the physical bus).
    per_iter = measure_iter_seconds(
        make_fn, (x,), n_small=4, n_large=24, trials=trials,
        reduce="median",
    )
    return actual_bytes / per_iter / 1e9
