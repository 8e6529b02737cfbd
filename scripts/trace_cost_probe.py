"""Per-manifest-entry cold cost: trace/lower wall vs execute wall.

Serially fires a sample of manifest entries in a fresh process, timing each.
jax.jit tracing happens inside the first call; we split it out by timing
.lower() explicitly where the entry resolves to a jitted function, else the
whole first call.

Usage: python scripts/trace_cost_probe.py [--limit 30] [--sample stride]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=30)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument(
        "--budget", type=float, default=0.0,
        help="per-entry seconds budget: entries exceeding it are reported "
             "as failures and the exit code is 1 (pack validation mode)",
    )
    args = ap.parse_args()

    import jax

    from roibasedimagecompression_tpu.utils import warmup

    with open(warmup.default_manifest_path()) as f:
        entries = json.load(f)
    print(f"{len(entries)} manifest entries; timing "
          f"{min(args.limit, len(entries))} (stride {args.stride})", flush=True)

    rows = []
    picked = entries[:: args.stride][: args.limit]
    for e in picked:
        try:
            fn = warmup._resolve(e["fn"])
            fargs = [warmup._build(s) for s in e["args"]]
            fkwargs = {k: warmup._build(s) for k, s in e["kwargs"].items()}
        except Exception as ex:
            print(f"skip {e['fn']}: {ex}", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            out = fn(*fargs, **fkwargs)
            t_dispatch = time.perf_counter() - t0
            jax.block_until_ready(out)
        except Exception as ex:
            print(f"ERR {e['fn']}: {ex}", flush=True)
            continue
        t_total = time.perf_counter() - t0
        shapes = ",".join(
            "x".join(map(str, s.get("shape", []))) for s in e["args"][:3]
        )
        rows.append((t_total, t_dispatch, e["fn"], shapes))
        print(
            f"{t_total:7.2f}s (dispatch {t_dispatch:6.2f}s) {e['fn']} [{shapes}]",
            flush=True,
        )
    rows.sort(reverse=True)
    print("\n=== top 10 by total ===", flush=True)
    for t_total, t_dispatch, fn, shapes in rows[:10]:
        print(f"{t_total:7.2f}s (dispatch {t_dispatch:6.2f}s) {fn} [{shapes}]")
    print(f"sum over sample: {sum(r[0] for r in rows):.1f}s "
          f"(dispatch {sum(r[1] for r in rows):.1f}s)", flush=True)
    if args.budget > 0:
        slow = [r for r in rows if r[0] > args.budget]
        if slow:
            print(f"VALIDATION FAILED: {len(slow)} entries exceeded the "
                  f"{args.budget:.0f}s load budget (they compiled — the "
                  f"pack is missing them or its keys are stale)", flush=True)
            raise SystemExit(1)
        print(f"VALIDATION OK: all {len(rows)} entries loaded within "
              f"{args.budget:.0f}s", flush=True)


if __name__ == "__main__":
    main()
