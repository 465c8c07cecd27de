"""Model quantization tool: GGML/GGUF f16/f32 -> Q8_0 / Q4_0 / Q4_1 (ggjt).

    python -m tokenhawk_tpu.tools.quantize in-f16.{bin,gguf} out-q4_0.bin q4_0

The reference has no conversion tooling (it rejects quantized files,
/root/reference/th-llama-loader.cpp:157-160); this supplies the
llama.cpp-quantize-equivalent capability.  2-D projection weights are
quantized; norms, the embedding table and 1-D tensors stay in their
source dtype (standard weight-only policy).  Uses the threaded native
encoders when libthawk_native.so is built.
"""

from __future__ import annotations

import argparse
import struct
import sys
import time

import numpy as np

from tokenhawk_tpu.ggml.format import GGML_MAGIC, GGML_VERSION, GGMLType
from tokenhawk_tpu.ggml.quants import quantize
from tokenhawk_tpu.ggml import native
from tokenhawk_tpu.ggml.reader import GGMLFile

_ALIGN = 32

# ggml ftype header values (model-level), matching llama.cpp numbering.
_MODEL_FTYPE = {GGMLType.Q4_0: 2, GGMLType.Q4_1: 3, GGMLType.Q8_0: 7}

_SKIP_QUANT_SUFFIXES = ("norm.weight",)
_SKIP_QUANT_NAMES = ("tok_embeddings.weight",)


def _encode(dense: np.ndarray, kind: GGMLType) -> bytes:
    if kind == GGMLType.Q8_0 and native.available():
        return native.q8_encode(dense)
    if kind == GGMLType.Q4_0 and native.available():
        return native.q4_encode(dense)
    from tokenhawk_tpu.ggml.quants import to_blocks

    return to_blocks(quantize(dense, kind))


def quantize_file(src_path: str, dst_path: str, kind: GGMLType,
                  verbose: bool = True) -> dict:
    from tokenhawk_tpu.ggml.gguf import GGUFFile, is_gguf

    src = GGUFFile(src_path) if is_gguf(src_path) else GGMLFile(src_path)
    hp = src.hparams
    n_quantized = 0
    in_bytes = out_bytes = 0

    with open(dst_path, "wb") as out:
        out.write(struct.pack("<II", GGML_MAGIC, GGML_VERSION))
        out.write(struct.pack(
            "<7I", hp.n_vocab, hp.n_embd, hp.n_mult, hp.n_head, hp.n_layer,
            hp.n_rot, _MODEL_FTYPE[kind],
        ))
        for tok, score in zip(src.vocab.tokens, src.vocab.scores):
            out.write(struct.pack("<I", len(tok)))
            out.write(tok)
            out.write(struct.pack("<f", float(score)))

        for rec in src:
            t0 = time.perf_counter()
            arr = src.load_tensor(rec.name, dequant=True)
            arr = np.asarray(arr, dtype=np.float32)
            do_quant = (
                arr.ndim == 2
                and not rec.name.endswith(_SKIP_QUANT_SUFFIXES)
                and rec.name not in _SKIP_QUANT_NAMES
                and arr.shape[-1] % 32 == 0
            )
            if do_quant:
                payload = _encode(arr, kind)
                ftype = int(kind)
                n_quantized += 1
            else:
                # keep f16 for non-quantized tensors (matches input scale)
                payload = arr.astype(np.float16).tobytes()
                ftype = int(GGMLType.F16)

            dims = list(reversed(rec.shape))
            name_b = rec.name.encode("utf-8")
            out.write(struct.pack("<iii", len(dims), len(name_b), ftype))
            for d in dims:
                out.write(struct.pack("<i", int(d)))
            out.write(name_b)
            pad = ((out.tell() + _ALIGN - 1) & -_ALIGN) - out.tell()
            out.write(b"\x00" * pad)
            out.write(payload)
            in_bytes += rec.data_nbytes
            out_bytes += len(payload)
            if verbose:
                print(f"  {rec.name:48s} {str(rec.shape):18s} "
                      f"{'->' if do_quant else '=='} "
                      f"{len(payload) / 1e6:8.1f} MB "
                      f"({time.perf_counter() - t0:.2f}s)", file=sys.stderr)
    src.close()
    return {
        "tensors_quantized": n_quantized,
        "input_bytes": in_bytes,
        "output_bytes": out_bytes,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tokenhawk-quantize")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("kind", choices=["q8_0", "q4_0", "q4_1"])
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args(argv)
    kind = {"q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0,
            "q4_1": GGMLType.Q4_1}[args.kind]
    t0 = time.perf_counter()
    stats = quantize_file(args.input, args.output, kind, verbose=not args.quiet)
    print(
        f"quantized {stats['tensors_quantized']} tensors: "
        f"{stats['input_bytes'] / 1e9:.2f} GB -> "
        f"{stats['output_bytes'] / 1e9:.2f} GB "
        f"in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
