"""Dissect cold start: where do the first-encode seconds go?

Run each mode in a FRESH process (the measurement is per-process state):

  --mode import    time package import + warm-pack cache seed only
  --mode prewarm   import, then warmup.prewarm(block=True) timed
  --mode encode    import, then ONE codec.encode (no prewarm) timed
  --mode bench     import, prewarm (non-blocking, bench-style), encode,
                   then a 4-image encode_many — the driver's exact warm-up
                   shape, step-timed

With RHCCQ_TRACE_TIMING=1 jax tracing/lowering wall is sampled via a
monotonic counter around dispatch.submit first-calls.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bench")
    args = ap.parse_args()

    t_start = time.perf_counter()
    import jax  # noqa: F401

    import roibasedimagecompression_tpu  # triggers cache seed
    from roibasedimagecompression_tpu.io import image_io

    t_import = time.perf_counter() - t_start
    print(f"import+seed: {t_import:.1f}s", flush=True)
    if args.mode == "import":
        return

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.models import codec
    from roibasedimagecompression_tpu.utils import warmup

    img = image_io.imread_rgb("/root/reference/images/png/3.png")
    cfg = CodecConfig()

    if args.mode == "prewarm":
        t0 = time.perf_counter()
        futs = warmup.prewarm(warmup.default_manifest_path(), block=True)
        print(
            f"prewarm(block=True): {time.perf_counter() - t0:.1f}s "
            f"({len(futs)} entries)",
            flush=True,
        )
        t0 = time.perf_counter()
        codec.encode(img, cfg)
        print(f"encode after prewarm: {time.perf_counter() - t0:.1f}s", flush=True)
        return

    if args.mode == "encode":
        t0 = time.perf_counter()
        codec.encode(img, cfg)
        print(f"first encode (no prewarm): {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        codec.encode(img, cfg)
        print(f"second encode: {time.perf_counter() - t0:.1f}s", flush=True)
        return

    # bench-style: non-blocking prewarm, then encode, then one stream batch
    t0 = time.perf_counter()
    futs = warmup.prewarm(warmup.default_manifest_path())
    print(f"prewarm dispatched: {len(futs)} in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    codec.encode(img, cfg)
    print(f"warm-up encode 1: {time.perf_counter() - t0:.1f}s", flush=True)
    from roibasedimagecompression_tpu.parallel import stream

    imgs = [
        image_io.imread_rgb(f"/root/reference/images/png/{i}.png")
        for i in (3, 5, 6, 7)
    ]
    t0 = time.perf_counter()
    stream.encode_many(imgs, cfg)
    print(f"first encode_many(4): {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for f in futs:
        try:
            f.result()
        except Exception:
            pass
    print(f"drain remaining prewarm futures: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
