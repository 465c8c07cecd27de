"""flash-decode kernel microbenchmark: achieved KV-stream GB/s.

Times the decode attention kernel over a batch of layers' worth of
distinct KV caches (so nothing caches), at 7B decode shapes
(B=1, Hkv=32, rep=1, Dh=128), at a chosen live length.

    python experiments/decode_attn_bench.py --s 2048 --length 2048
    python experiments/decode_attn_bench.py --variant dma|pipeline
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=1)
    p.add_argument("--hkv", type=int, default=32)
    p.add_argument("--rep", type=int, default=1)
    p.add_argument("--dh", type=int, default=128)
    p.add_argument("--s", type=int, default=2048, help="cache capacity")
    p.add_argument("--length", type=int, default=2048, help="live tokens")
    p.add_argument("--layers", type=int, default=32, help="distinct caches chained")
    p.add_argument("--variant", default="dma")
    p.add_argument("--bs", type=int, default=256, help="kernel block_s")
    p.add_argument("--hb", type=int, default=32, help="kernel head_block")
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--layout", choices=["head", "contig"], default="head",
                   help="page-pool layout for the paged* variants")
    args = p.parse_args()

    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    B, H, R, D, S = args.b, args.hkv, args.rep, args.dh, args.s

    if args.variant == "dma":
        from tokenhawk_tpu.ops.pallas.flash_decode_dma import flash_decode_dma as fn
    elif args.variant == "pipeline":
        from tokenhawk_tpu.ops.pallas.flash_decode import flash_decode as fn
    elif args.variant == "int8":
        from tokenhawk_tpu.ops.pallas.flash_decode_int8 import flash_decode_int8 as fn
    elif args.variant in ("paged", "paged_walk"):
        from tokenhawk_tpu.ops.pallas.paged_decode import (
            paged_flash_decode,
            paged_flash_decode_walk,
        )

        _pfn = (paged_flash_decode_walk if args.variant == "paged_walk"
                else paged_flash_decode)

        def fn(q, k_pages, v_pages, table, lengths, block_s=None,
               head_block=32):
            return _pfn(q, k_pages, v_pages, table, lengths,
                        head_block=head_block,
                        contig=(args.layout == "contig"))
    elif args.variant in ("paged_int8", "paged_int8_walk"):
        from tokenhawk_tpu.ops.pallas.paged_decode_int8 import (
            paged_flash_decode_int8,
            paged_flash_decode_int8_walk,
        )

        _pfn8 = (paged_flash_decode_int8_walk
                 if args.variant == "paged_int8_walk"
                 else paged_flash_decode_int8)

        def fn(q, k_pages, ks, v_pages, vs, table, lengths, block_s=None,
               head_block=32):
            return _pfn8(q, k_pages, ks, v_pages, vs, table, lengths,
                         head_block=head_block,
                         contig=(args.layout == "contig"))
    elif args.variant in ("append", "append_walk"):
        from tokenhawk_tpu.ops.pallas.flash_decode_dma import (
            flash_decode_append,
            flash_decode_append_walk,
        )

        fn = (flash_decode_append_walk if args.variant == "append_walk"
              else flash_decode_append)
    else:
        raise SystemExit(f"unknown variant {args.variant}")

    caches = []
    for i in range(args.layers):
        if args.variant in ("paged", "paged_walk"):
            ps = 128
            n_pages = max(1, -(-S // ps))
            pshape = ((n_pages, H, ps, D) if args.layout == "contig"
                      else (H, n_pages, ps, D))
            k = jnp.full(pshape, 0.01 * (i + 1), jnp.bfloat16)
            v = jnp.full(pshape, 0.02 * (i + 1), jnp.bfloat16)
            table = jnp.tile(jnp.arange(n_pages, dtype=jnp.int32), (B, 1))
            caches.append((k, v, table))
        elif args.variant in ("paged_int8", "paged_int8_walk"):
            ps = 128
            n_pages = max(1, -(-S // ps))
            pshape = ((n_pages, H, ps, D) if args.layout == "contig"
                      else (H, n_pages, ps, D))
            sshape = ((n_pages, H, ps) if args.layout == "contig"
                      else (H, n_pages, ps))
            k = jnp.full(pshape, i % 7 - 3, jnp.int8)
            v = jnp.full(pshape, i % 5 - 2, jnp.int8)
            ks = jnp.full(sshape, 0.01, jnp.float32)
            vs = jnp.full(sshape, 0.02, jnp.float32)
            table = jnp.tile(jnp.arange(n_pages, dtype=jnp.int32), (B, 1))
            caches.append((k, ks, v, vs, table))
        elif args.variant == "int8":
            k = jnp.full((B, H, S, D), i % 7 - 3, jnp.int8)
            v = jnp.full((B, H, S, D), i % 5 - 2, jnp.int8)
            ks = jnp.full((B, H, S), 0.01, jnp.bfloat16)
            vs = jnp.full((B, H, S), 0.02, jnp.bfloat16)
            caches.append((k, ks, v, vs))
        else:
            k = jnp.full((B, H, S, D), 0.01 * (i + 1), jnp.bfloat16)
            v = jnp.full((B, H, S, D), 0.02 * (i + 1), jnp.bfloat16)
            caches.append((k, v))
    caches = jax.block_until_ready(caches)
    lengths = jnp.full((B,), args.length, jnp.int32)
    # live KV bytes actually streamed per pass
    if args.variant == "int8":
        live = (2 * B * H * min(args.length, S) * D  # int8 payload
                + 2 * B * H * S * 2  # scales (full-S pipelined)
                ) * args.layers
    elif args.variant in ("paged_int8", "paged_int8_walk"):
        live = (2 * B * H * min(args.length, S) * D  # int8 payload
                + 2 * B * H * min(args.length, S) * 4  # f32 scale rows
                ) * args.layers
    else:
        live = 2 * B * H * min(args.length, S) * D * 2 * args.layers
    print(f"live KV: {live/1e6:.0f} MB per pass", file=sys.stderr)

    def make_fn(n):
        if args.variant in ("append", "append_walk"):
            # Fused append+attend mutates the caches: carry them through
            # the scan so the in-place aliasing is real (captured arrays
            # would be copy-per-step and bench the copies, not the
            # kernel).  k_new/v_new reuse a q slice (bytes are free).
            @jax.jit
            def run(q, caches, lengths):
                def body(carry, _):
                    q, caches = carry
                    new = []
                    for kc, vc in caches:
                        o, kc, vc = fn(q, q[:, :, 0], q[:, :, 0] * 0.5,
                                       kc, vc, lengths,
                                       block_s=args.bs, head_block=args.hb)
                        q = o.astype(q.dtype) * 1e-3 + q * 1e-3
                        new.append((kc, vc))
                    return (q, tuple(new)), ()

                (q, _), _ = jax.lax.scan(body, (q, tuple(tuple(c) for c in caches)), None, length=n)
                return q

            return run

        @jax.jit
        def run(q, caches, lengths):
            def body(q, _):
                for c in caches:
                    o = fn(q, *c, lengths, block_s=args.bs,
                           head_block=args.hb)
                    q = o * 1e-3 + q * 1e-3
                return q, ()

            q, _ = jax.lax.scan(body, q, None, length=n)
            return q

        return run

    q0 = jnp.full((B, H, R, D), 0.5, jnp.bfloat16)
    from tokenhawk_tpu.utils.benchlib import _time_call

    n_s, n_l = 4, 4 + args.iters
    f_s, f_l = make_fn(n_s), make_fn(n_l)
    t0 = time.perf_counter()
    _time_call(f_s, (q0, caches, lengths))
    _time_call(f_l, (q0, caches, lengths))
    ts_all, tl_all = [], []
    for _ in range(args.trials):
        ts = _time_call(f_s, (q0, caches, lengths))
        tl = _time_call(f_l, (q0, caches, lengths))
        ts_all.append(ts)
        tl_all.append(tl)
        print(f"  T({n_s})={ts*1e3:.1f} T({n_l})={tl*1e3:.1f} "
              f"-> {(tl-ts)/args.iters*1e3:.3f} ms/pass", file=sys.stderr)
    per = (min(tl_all) - min(ts_all)) / args.iters
    gbps = live / per / 1e9
    print(f"compile+measure {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    print(f"decode-attn variant={args.variant} S={S} len={args.length} "
          f"Hkv={H} rep={R}: {per*1e3:.3f} ms/pass ({per/args.layers*1e6:.1f} "
          f"us/layer) -> {gbps:.0f} GB/s ({gbps/819*100:.0f}% of v5e HBM)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
