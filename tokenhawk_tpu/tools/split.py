"""Split a GGML model into TH chunk files (streaming-load format).

    python -m tokenhawk_tpu.tools.split model.bin chunks/ --max-mb 128

Parity with the reference's chunked distribution flow (the `-d` CLI
option and the browser's per-chunk upload,
/root/reference/th-llama-loader.cpp:437-483, web/chat.js:146-354).
"""

from __future__ import annotations

import argparse
import sys

from tokenhawk_tpu.ggml.chunked import split_ggml


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tokenhawk-split")
    p.add_argument("input")
    p.add_argument("out_dir")
    p.add_argument("--max-mb", type=int, default=128)
    args = p.parse_args(argv)
    paths = split_ggml(args.input, args.out_dir,
                       max_chunk_bytes=args.max_mb * 1024 * 1024)
    for pth in paths:
        print(pth)
    print(f"{len(paths)} chunks written", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
