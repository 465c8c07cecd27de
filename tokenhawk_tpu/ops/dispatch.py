"""Kernel backend selection.

"auto" uses Pallas kernels when running on TPU and the portable XLA path
elsewhere; tests force "pallas_interpret" to exercise the kernels on CPU.
"""

from __future__ import annotations

import os

import jax

_BACKEND = os.environ.get("TOKENHAWK_BACKEND", "auto")
_VALID = ("auto", "xla", "pallas", "pallas_interpret")


def set_backend(backend: str) -> None:
    global _BACKEND
    if backend not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}")
    _BACKEND = backend


def get_backend() -> str:
    return _BACKEND


def pallas_mode() -> str | None:
    """None (use XLA), "compiled", or "interpret"."""
    if _BACKEND == "xla":
        return None
    if _BACKEND == "pallas":
        return "compiled"
    if _BACKEND == "pallas_interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else None
