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
) -> float:
    """make_fn(n) returns a jitted callable running n in-graph iterations."""
    f_small = make_fn(n_small)
    f_large = make_fn(n_large)
    # warmup/compile both
    _time_call(f_small, args)
    _time_call(f_large, args)
    best = float("inf")
    for _ in range(trials):
        t_small = _time_call(f_small, args)
        t_large = _time_call(f_large, args)
        per_iter = (t_large - t_small) / (n_large - n_small)
        best = min(best, per_iter)
    return max(best, 1e-9)
