"""Regenerate the committed warm-compile pack (warm_cache/).

The driver benches from a fresh checkout, where every jit graph is a real
compile through the remote service — the dominant cold-start cost (round 2
measured a 1,004 s warm-up walk; the manifest prewarm collapses it to one
concurrent wave, the warm pack removes it entirely).  This script captures
exactly the bench-path executables:

  1. Runs bench.py (and optionally the multichip dryrun) with the cache
     pointed at a FRESH directory, so only graphs the bench actually
     compiles land in it.
  2. Moves that directory to warm_cache/ at the repo root.

The pack must be rebuilt whenever traced code changes (the cache key hashes
the HLO): run this LAST, on the real chip, before a round ends.  Usage:

    python scripts/build_warm_cache.py [--skip-bench] [--dryrun-cpu]
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(env_extra, argv, timeout):
    env = dict(os.environ, **env_extra)
    print("+", " ".join(argv), {k: v for k, v in env_extra.items()}, flush=True)
    r = subprocess.run(argv, env=env, cwd=REPO, timeout=timeout)
    if r.returncode != 0:
        print(f"warning: exit {r.returncode} (partial cache kept)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true",
                    help="only rebuild the CPU dryrun entries")
    ap.add_argument("--dryrun-cpu", action="store_true",
                    help="also capture the 8-device CPU-mesh dryrun entries")
    ap.add_argument("--out", default=os.path.join(REPO, "warm_cache"))
    args = ap.parse_args()

    fresh = tempfile.mkdtemp(prefix="rhccq_warm_", dir="/tmp")
    base = {"RHCCQ_JAX_CACHE": fresh, "RHCCQ_WARM_PACK": "0",
            "PYTHONPATH": f"{REPO}:" + os.environ.get("PYTHONPATH", "")}

    if not args.skip_bench:
        # The bench covers the full default encode/decode surface plus the
        # low-latency preset — on the default (TPU) backend its entries are
        # remote-compiled and host-independent.
        run(base, [sys.executable, os.path.join(REPO, "bench.py")], 7200)

    if args.dryrun_cpu:
        # CPU AOT entries embed host ISA features; they live under a
        # cpu-<fingerprint>/ subdir and only a matching host reads them.
        run({**base, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"], 3600)

    n = sum(len(fs) for _, _, fs in os.walk(fresh))
    sz = sum(os.path.getsize(os.path.join(d, f))
             for d, _, fs in os.walk(fresh) for f in fs)
    print(f"captured {n} cache entries, {sz / 1e6:.1f} MB")
    if n == 0:
        print("nothing captured; leaving existing pack untouched")
        return
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    shutil.move(fresh, args.out)
    print(f"warm pack written to {args.out}")


if __name__ == "__main__":
    main()
