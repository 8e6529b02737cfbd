"""Regenerate the committed warm-compile pack (warm_cache/).

The driver benches from a fresh checkout, where every jit graph is a real
compile through the remote service — the dominant cold-start cost (round 2
measured a 1,004 s warm-up walk; the manifest prewarm collapses it to one
concurrent wave, the warm pack removes it entirely).  This script captures
exactly the bench-path executables:

  1. Runs bench.py (and optionally the multichip dryrun) with the cache
     pointed at a FRESH directory, so only graphs the bench actually
     compiles land in it.
  2. Packs the captured entries into warm_cache/pack.tar.zst — ONE solid
     zstd stream over the RAW (decompressed) entries.  The bench path is
     dozens of shape variants of the same few programs, so solid
     compression beats the per-entry frames ~8x, and each rebuild adds one
     git blob instead of ~140.  The package unpacks it into the cache dir
     at import (roibasedimagecompression_tpu._unpack_solid_pack).

The pack must be rebuilt whenever traced code changes (the cache key hashes
the HLO): run this LAST, on the real chip, before a round ends.  Usage:

    python scripts/build_warm_cache.py [--skip-bench] [--dryrun-cpu]
    python scripts/build_warm_cache.py --repack-only   # loose files -> solid
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


def write_solid_pack(src_dir, out_path):
    """Tar the RAW (decompressed) cache entries and zstd them as one stream.

    Members are ordered by (family, size) so near-identical shape variants
    sit adjacent inside the compressor window; long-distance matching covers
    the rest of the stream.
    """
    import io
    import re
    import tarfile

    import zstandard

    entries = []
    for d, _, fs in os.walk(src_dir):
        for f in fs:
            # Never embed the solid pack itself (it IS a valid zstd frame,
            # so the non-zstd skip below would not catch it: a --repack-only
            # over a dir already holding pack.tar.zst would decompress the
            # whole old pack into the new one), nor in-progress/stale files.
            if (f in ("pack.tar.zst", "pack.tar.zst.new", "PACK_META.json")
                    or ".tmp-" in f or f.startswith(".")):
                continue
            p = os.path.join(d, f)
            rel = os.path.relpath(p, src_dir)
            fam = re.sub(r"-[0-9a-f]{16,}.*$", "", f)
            entries.append((fam, os.path.getsize(p), rel, p))
    entries.sort()
    dctx = zstandard.ZstdDecompressor()
    params = zstandard.ZstdCompressionParameters.from_level(
        19, enable_ldm=True, window_log=27
    )
    cctx = zstandard.ZstdCompressor(compression_params=params)
    raw_total = 0
    with open(out_path, "wb") as fh:
        with cctx.stream_writer(fh) as zs:
            with tarfile.open(fileobj=zs, mode="w|") as tar:
                for _, _, rel, p in entries:
                    blob = open(p, "rb").read()
                    try:
                        raw = dctx.decompressobj().decompress(blob)
                    except zstandard.ZstdError:
                        raw = blob  # not a zstd frame (zlib-era entry): store
                        # as-is; the unpacker re-wraps it in zstd, which jax
                        # would fail to read — so skip instead.
                        print(f"skip non-zstd entry {rel}", flush=True)
                        continue
                    raw_total += len(raw)
                    info = tarfile.TarInfo(rel)
                    info.size = len(raw)
                    tar.addfile(info, io.BytesIO(raw))
    print(f"solid pack: {len(entries)} entries, {raw_total / 1e6:.1f} MB raw "
          f"-> {os.path.getsize(out_path) / 1e6:.1f} MB", flush=True)


def build_from_live(args):
    """Pack the bench's executables out of the LIVE cache instead of a fresh
    dir.  The fresh-dir build recompiles every graph through the remote
    service (minutes EACH when the service is loaded); this mode runs the
    bench against the live cache — hits load, only genuinely new graphs
    compile once — while RHCCQ_CACHE_LOG records every cache key the run
    touches, and then packs exactly those entries.  Stable cache keys
    (utils/cachekey.py) are what make the live entries reusable here."""
    import glob
    import json

    live = os.path.join(REPO, ".jax_cache")
    keylog = os.path.join(tempfile.mkdtemp(prefix="rhccq_keys_"), "keys.log")
    base = {"RHCCQ_RECORD_MANIFEST": "1", "RHCCQ_CACHE_LOG": keylog,
            "PYTHONPATH": f"{REPO}:" + os.environ.get("PYTHONPATH", "")}
    run(base, [sys.executable, os.path.join(REPO, "bench.py")], 7200)
    if args.dryrun_cpu:
        run({**base, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"], 3600)
    try:
        keys = sorted(set(open(keylog).read().split()))
    except OSError:
        print("no key log recorded; aborting"); return
    roots = [live] + sorted(glob.glob(os.path.join(live, "cpu-*")))
    stage = tempfile.mkdtemp(prefix="rhccq_stage_", dir="/tmp")
    found = missing = 0
    for key in keys:
        hit = False
        for root in roots:
            p = os.path.join(root, f"{key}-cache")
            if os.path.exists(p):
                rel = os.path.relpath(p, live)
                dst = os.path.join(stage, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(p, dst)
                except OSError:
                    shutil.copyfile(p, dst)
                hit = True
        if hit:
            found += 1
        else:
            missing += 1
    print(f"key log: {len(keys)} keys, {found} packed, {missing} missing "
          f"from the live cache (those entries compiled too fast to "
          f"persist, or failed to write)")
    os.makedirs(args.out, exist_ok=True)
    solid = os.path.join(args.out, "pack.tar.zst")
    write_solid_pack(stage, solid + ".new")
    for d, _, fs in os.walk(args.out):
        for f in fs:
            if f not in ("pack.tar.zst.new",):
                os.unlink(os.path.join(d, f))
    for d, _, _ in os.walk(args.out, topdown=False):
        if d != args.out:
            try:
                os.rmdir(d)
            except OSError:
                pass
    os.replace(solid + ".new", solid)
    shutil.rmtree(stage)
    _stamp_meta(args.out)
    print(f"warm pack written to {solid}")


def validate_pack(args):
    """Replay the manifest in a fresh process against a pack-only cache.

    Every entry must LOAD (sub-~5 s trace+load), not compile (minutes via
    the remote service).  This is the gate the round-4 VERDICT asked for: a
    stale pack fails loudly here instead of silently costing the driver its
    cold start."""
    cache = tempfile.mkdtemp(prefix="rhccq_validate_", dir="/tmp")
    env = {"RHCCQ_JAX_CACHE": cache,
           "PYTHONPATH": f"{REPO}:" + os.environ.get("PYTHONPATH", "")}
    print(f"validating pack against fresh cache {cache}", flush=True)
    run(env, [sys.executable, os.path.join(REPO, "scripts", "trace_cost_probe.py"),
              "--limit", "100000", "--budget", "5"], 7200)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true",
                    help="only rebuild the CPU dryrun entries")
    ap.add_argument("--dryrun-cpu", action="store_true",
                    help="also capture the 8-device CPU-mesh dryrun entries")
    ap.add_argument("--repack-only", action="store_true",
                    help="convert existing loose warm_cache/ entries to the "
                         "solid pack.tar.zst without re-running the bench")
    ap.add_argument("--from-live", action="store_true",
                    help="pack the bench-touched entries out of the live "
                         ".jax_cache (no fresh-dir recompile wave)")
    ap.add_argument("--validate", action="store_true",
                    help="replay the manifest against a pack-only cache and "
                         "report entries that compile instead of load")
    ap.add_argument("--out", default=os.path.join(REPO, "warm_cache"))
    args = ap.parse_args()

    if args.from_live:
        build_from_live(args)
        if args.validate:
            validate_pack(args)
        return
    if args.validate and not any((args.repack_only, args.skip_bench)):
        # bare --validate: check the committed pack as-is
        validate_pack(args)
        return

    if args.repack_only:
        solid = os.path.join(args.out, "pack.tar.zst")
        write_solid_pack(args.out, solid + ".new")
        os.replace(solid + ".new", solid)
        for d, _, fs in os.walk(args.out):
            for f in fs:
                if f not in ("pack.tar.zst", "PACK_META.json"):
                    os.unlink(os.path.join(d, f))
        # Drop now-empty subdirs (e.g. cpu-<hash>/) so the seeder doesn't
        # recreate them as empty dirs in every cache target.  Bottom-up, and
        # rmdir itself decides emptiness (walk's listings are pre-unlink).
        for d, _, _ in os.walk(args.out, topdown=False):
            if d != args.out:
                try:
                    os.rmdir(d)
                except OSError:
                    pass  # not empty
        print(f"repacked {args.out} -> {solid}")
        return

    fresh = tempfile.mkdtemp(prefix="rhccq_warm_", dir="/tmp")
    base = {"RHCCQ_JAX_CACHE": fresh, "RHCCQ_WARM_PACK": "0",
            "PYTHONPATH": f"{REPO}:" + os.environ.get("PYTHONPATH", "")}

    if not args.skip_bench:
        # The bench covers the full default encode/decode surface plus the
        # low-latency preset — on the default (TPU) backend its entries are
        # remote-compiled and host-independent.  RHCCQ_RECORD_MANIFEST
        # refreshes warm_manifest.json in the same run, so the pack and the
        # prewarm manifest can never drift apart (manifest entry order =
        # bench call order = single-image graphs first, which prioritizes
        # the first encode's executables in the prewarm wave).
        run({**base, "RHCCQ_RECORD_MANIFEST": "1"},
            [sys.executable, os.path.join(REPO, "bench.py")], 7200)

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
    # Compress BEFORE touching the existing pack: the level-19 solid pass
    # takes minutes, and an interruption mid-way must not lose the previous
    # good pack.  Write to .new beside the target, then swap atomically.
    os.makedirs(args.out, exist_ok=True)
    solid = os.path.join(args.out, "pack.tar.zst")
    write_solid_pack(fresh, solid + ".new")
    for d, _, fs in os.walk(args.out):
        for f in fs:
            if f not in ("pack.tar.zst.new",):
                os.unlink(os.path.join(d, f))
    for d, _, _ in os.walk(args.out, topdown=False):
        if d != args.out:
            try:
                os.rmdir(d)
            except OSError:
                pass
    os.replace(solid + ".new", solid)
    shutil.rmtree(fresh)
    _stamp_meta(args.out)
    print(f"warm pack written to {solid}")


def _stamp_meta(out_dir):
    """Record the source fingerprint the pack was built from, so bench.py
    can warn loudly when the pack has gone stale (utils/warmup.
    check_pack_freshness)."""
    import json

    sys.path.insert(0, REPO)
    from roibasedimagecompression_tpu.utils import warmup

    head = ""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True,
            text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        pass
    # Backend identity: the pack's executables are keyed on the STABLE
    # identity (utils/cachekey.py); record both the stable basis and the raw
    # platform_version so the next key drift is attributable from the repo.
    identity = {}
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import json; from roibasedimagecompression_tpu.utils import "
             "cachekey; print(json.dumps(cachekey.identity_report()))"],
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:" + os.environ.get("PYTHONPATH", "")},
            capture_output=True, text=True, timeout=600,
        )
        identity = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as ex:
        print(f"warning: identity report failed ({ex})", flush=True)
    with open(os.path.join(out_dir, "PACK_META.json"), "w") as fh:
        json.dump(
            {"source_fingerprint": warmup.source_fingerprint(),
             "git_head": head, "backend_identity": identity}, fh, indent=1,
        )


if __name__ == "__main__":
    main()
