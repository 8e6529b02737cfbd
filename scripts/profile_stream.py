"""Steady-state profile of the batched encode path.

Runs encode_many on the same batch TWICE in one process: run 1 pays every
compile; run 2 is pure execution (identical shapes hit the jit cache).  The
per-stage wall-clock split of run 2 is the number that matters for
throughput work — compile time amortizes to zero in deployment.

Usage: python scripts/profile_stream.py [--images 8] [--runs 2]
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
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--log-compiles", action="store_true")
    ap.add_argument(
        "--cprofile", default="",
        help="dump cProfile stats of the LAST run to this path",
    )
    args = ap.parse_args()

    import jax

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import timing

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13][: args.images]
    if os.path.exists(f"{kodak}/1.png"):
        imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    else:
        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 256, (512, 768, 3), dtype=np.uint8)
            for _ in range(args.images)
        ]

    cfg = CodecConfig()
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6

    # Replay the committed compile manifest so the cold walk is one parallel
    # wave (same as bench.py) instead of a stage-by-stage compile/load chain.
    from roibasedimagecompression_tpu.utils import warmup

    t0 = time.perf_counter()
    futs = warmup.prewarm(warmup.default_manifest_path())
    print(
        f"prewarm: {len(futs)} manifest graphs dispatched "
        f"({time.perf_counter() - t0:.1f}s)",
        file=sys.stderr,
    )

    last = None
    for run in range(args.runs):
        if run == args.runs - 1 and args.log_compiles:
            jax.config.update("jax_log_compiles", True)
        timing.reset_stages()
        prof = None
        if args.cprofile and run == args.runs - 1:
            import cProfile

            prof = cProfile.Profile()
            prof.enable()
        t0 = time.perf_counter()
        blobs = stream.encode_many(imgs, cfg)
        dt = time.perf_counter() - t0
        if prof is not None:
            prof.disable()
            prof.dump_stats(args.cprofile)
        stages = {
            k: round(v["seconds"], 3) for k, v in timing.stage_report().items()
        }
        cpu = {
            k: round(v["cpu_seconds"], 3)
            for k, v in timing.stage_report().items()
        }
        print(
            f"run {run}: {dt:.2f}s = {mp / dt:.4f} MP/s  stages={stages}",
            file=sys.stderr,
        )
        print(f"run {run} cpu: {cpu}", file=sys.stderr)
        last = {"seconds": round(dt, 2), "mpps": round(mp / dt, 5), "stages": stages}
    print(json.dumps(last))


if __name__ == "__main__":
    main()
