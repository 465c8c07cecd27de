"""Summarize a jax.profiler device trace: per-op-family ms/token table.

Usage:
    python experiments/trace_summarize.py <trace_dir> [tokens_in_trace]

trace_dir is the directory passed to utils.profiling.trace(); the script
finds plugins/profile/*/vm.trace.json.gz inside it.  Raw traces are not
committed (tens of MB); commit the printed table instead
(see BENCH_NOTES.md round-2 trace section).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def main() -> int:
    d = sys.argv[1]
    tok = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    paths = glob.glob(d + "/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print(f"no trace under {d}", file=sys.stderr)
        return 1
    with gzip.open(paths[0]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in pids.items() if "TPU" in n or n.startswith("/device")}
    fam = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e["name"]
            if name.startswith(("jit_", "while")):
                if "decode" in name or "prefill" in name:
                    total += e["dur"]
                continue
            base = re.sub(r"[.\d]+$", "", name)
            fam[base] += e["dur"]
            cnt[base] += 1
    print(f"top-level jit time: {total/1e3/tok:.3f} ms/tok ({tok} tokens)")
    agg = 0.0
    for n, dd in sorted(fam.items(), key=lambda kv: -kv[1]):
        if dd / 1e3 / tok < 0.0005:
            continue
        agg += dd
        print(f"{dd/1e3/tok:9.4f} ms/tok  x{cnt[n]//max(tok,1):5d}/tok  {n[:64]}")
    print(f"---- op sum {agg/1e3/tok:.3f} ms/tok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
