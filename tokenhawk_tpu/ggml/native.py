"""ctypes binding for the native host-side weight kernels.

`libthawk_native.so` (built from /root/repo/native/, `make -C native`)
provides threaded one-pass conversions from GGML block streams to device
layouts.  Every entry point has a numpy fallback, so the library is an
accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SEARCH = [
    _NATIVE_DIR / "libthawk_native.so",
    Path(os.environ.get("THAWK_NATIVE_LIB", "")),
]


def _build_from_source() -> None:
    """Build the .so from thawk_native.cpp if missing or stale.

    The binary is not checked into version control (unreviewable,
    platform-specific); it is compiled on first use and the numpy
    fallback covers any build failure.  Set THAWK_NO_NATIVE_BUILD=1 to
    skip."""
    if os.environ.get("THAWK_NO_NATIVE_BUILD"):
        return
    src = _NATIVE_DIR / "thawk_native.cpp"
    so = _NATIVE_DIR / "libthawk_native.so"
    if not src.is_file():
        return
    if so.is_file() and so.stat().st_mtime >= src.stat().st_mtime:
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    _build_from_source()
    for p in _SEARCH:
        if p and p.is_file():
            try:
                lib = ctypes.CDLL(str(p))
            except OSError:
                continue
            c_i64 = ctypes.c_int64
            vp = ctypes.c_void_p
            lib.thawk_f16_to_f32.argtypes = [vp, vp, c_i64]
            lib.thawk_f16_to_bf16_transpose.argtypes = [vp, vp, c_i64, c_i64]
            lib.thawk_f32_to_bf16_transpose.argtypes = [vp, vp, c_i64, c_i64]
            lib.thawk_q8_decode_transpose.argtypes = [vp, vp, vp, c_i64, c_i64]
            lib.thawk_q4_decode_transpose_pack.argtypes = [vp, vp, vp, c_i64, c_i64]
            lib.thawk_q8_encode.argtypes = [vp, vp, c_i64, c_i64]
            lib.thawk_q4_encode.argtypes = [vp, vp, c_i64, c_i64]
            for kq in ("q2_k", "q3_k", "q4_k", "q5_k", "q6_k"):
                getattr(lib, f"thawk_dequant_{kq}").argtypes = [
                    vp, vp, c_i64]
            lib.thawk_write_tiny_gguf.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_uint64]
            lib.thawk_write_tiny_gguf.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------


def f16_to_f32(src: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src)
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, np.float32)
    lib.thawk_f16_to_f32(_ptr(src.view(np.uint16)), _ptr(out), src.size)
    return out


def q8_decode_transpose(raw: bytes | memoryview, rows: int, cols: int):
    """ggjt q8_0 block stream -> (qs int8 [cols, rows], scales f32 [cols/32, rows])."""
    lib = _load()
    if lib is None:
        from tokenhawk_tpu.ggml.format import GGMLType
        from tokenhawk_tpu.ggml.quants import from_blocks

        qt = from_blocks(GGMLType.Q8_0, bytes(raw), (rows, cols))
        return (
            np.ascontiguousarray(qt.qs.T),
            np.ascontiguousarray(qt.scales.T.astype(np.float32)),
        )
    buf = np.frombuffer(raw, np.uint8)
    qs = np.empty((cols, rows), np.int8)
    scales = np.empty((cols // 32, rows), np.float32)
    lib.thawk_q8_decode_transpose(_ptr(buf), _ptr(qs), _ptr(scales), rows, cols)
    return qs, scales


def q4_decode_transpose_pack(raw: bytes | memoryview, rows: int, cols: int):
    """ggjt q4_0 block stream -> (packed uint8 [cols/2, rows], scales f32 [cols/32, rows])."""
    lib = _load()
    if lib is None:
        from tokenhawk_tpu.ggml.format import GGMLType
        from tokenhawk_tpu.ggml.quants import from_blocks

        qt = from_blocks(GGMLType.Q4_0, bytes(raw), (rows, cols))
        qs_t = np.ascontiguousarray(qt.qs.T)  # [cols, rows] int8 in [-8,7]
        u = (qs_t.astype(np.int16) + 8).astype(np.uint8)
        packed = u[: cols // 2] | (u[cols // 2 :] << 4)
        return packed, np.ascontiguousarray(qt.scales.T.astype(np.float32))
    buf = np.frombuffer(raw, np.uint8)
    qs = np.zeros((cols // 2, rows), np.uint8)
    scales = np.empty((cols // 32, rows), np.float32)
    lib.thawk_q4_decode_transpose_pack(_ptr(buf), _ptr(qs), _ptr(scales), rows, cols)
    return qs, scales


def f16_to_bf16_transpose(src: np.ndarray) -> np.ndarray:
    """f16 [rows, cols] -> bf16-as-uint16 [cols, rows] (view with jnp)."""
    lib = _load()
    rows, cols = src.shape
    if lib is None:
        import jax.numpy as jnp

        return np.asarray(
            jnp.asarray(np.ascontiguousarray(src.T), jnp.bfloat16)
        ).view(np.uint16)
    src = np.ascontiguousarray(src)
    out = np.empty((cols, rows), np.uint16)
    lib.thawk_f16_to_bf16_transpose(_ptr(src.view(np.uint16)), _ptr(out), rows, cols)
    return out


def q8_encode(x: np.ndarray) -> bytes:
    """f32 [rows, cols] -> ggjt q8_0 block stream."""
    lib = _load()
    if lib is None:
        from tokenhawk_tpu.ggml.quants import quantize_q8_0, to_blocks

        return to_blocks(quantize_q8_0(x))
    x = np.ascontiguousarray(x, np.float32)
    rows, cols = x.shape
    out = np.empty((rows * (cols // 32) * 36,), np.uint8)
    lib.thawk_q8_encode(_ptr(x), _ptr(out), rows, cols)
    return out.tobytes()


def q4_encode(x: np.ndarray) -> bytes:
    lib = _load()
    if lib is None:
        from tokenhawk_tpu.ggml.quants import quantize_q4_0, to_blocks

        return to_blocks(quantize_q4_0(x))
    x = np.ascontiguousarray(x, np.float32)
    rows, cols = x.shape
    out = np.empty((rows * (cols // 32) * 20,), np.uint8)
    lib.thawk_q4_encode(_ptr(x), _ptr(out), rows, cols)
    return out.tobytes()


def dequant_kquant_c(kind, raw: bytes, n: int):
    """Scalar C reference dequantizer for the k-quant family, or None if
    the native library is unavailable.

    An INDEPENDENT second implementation (element-at-a-time C, the shape
    of llama.cpp's scalar code) used by tests to cross-check the
    vectorized numpy codecs — the strongest layout validation available
    without llama.cpp binaries or real weight files in this environment.
    """
    lib = _load()
    if lib is None:
        return None
    from tokenhawk_tpu.ggml.format import GGMLType
    from tokenhawk_tpu.ggml.kquants import KQUANT_BLOCK_BYTES, QK_K

    fn = {
        GGMLType.Q2_K: lib.thawk_dequant_q2_k,
        GGMLType.Q3_K: lib.thawk_dequant_q3_k,
        GGMLType.Q4_K: lib.thawk_dequant_q4_k,
        GGMLType.Q5_K: lib.thawk_dequant_q5_k,
        GGMLType.Q6_K: lib.thawk_dequant_q6_k,
    }[kind]
    nb = n // QK_K
    buf = np.frombuffer(raw, np.uint8, count=nb * KQUANT_BLOCK_BYTES[kind])
    buf = np.ascontiguousarray(buf)
    out = np.empty((n,), np.float32)
    fn(_ptr(buf), _ptr(out), nb)
    return out


def write_tiny_gguf(path, n_vocab: int, n_embd: int, n_head: int,
                    n_layer: int, n_ff: int, seed: int = 1) -> bool:
    """Write a complete tiny GGUF v3 llama file via the INDEPENDENT C
    container writer (native/thawk_native.cpp thawk_write_tiny_gguf) —
    the container-level half of the codec cross-check: the Python GGUF
    parser must load a file whose header, kv encoding, tensor infos,
    alignment, and quant block streams were produced from the spec by a
    second implementation.  Weights are a reproducible LCG stream (see
    the C source for the per-tensor seeding rule).  Returns False when
    the native library is unavailable (tests skip)."""
    lib = _load()
    if lib is None or not hasattr(lib, "thawk_write_tiny_gguf"):
        return False
    rc = lib.thawk_write_tiny_gguf(
        str(path).encode(), n_vocab, n_embd, n_head, n_layer, n_ff, seed)
    return rc == 0
