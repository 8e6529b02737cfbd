"""Measure what limits stream overlap: workers, stagger, batch size.

One warm process, the bench's 64-image stream, several (workers, stagger)
points measured back-to-back.  Prints one line per point.

Usage: python scripts/sweep_overlap.py [--points "8,1 12,1 16,1 8,0"]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="8 12 16 6")
    ap.add_argument("--bsz", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import warmup

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13, 1, 2, 14, 16, 20, 21, 22, 24]
    imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    all_imgs = (
        imgs
        + [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, :]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, ::-1]) for im in imgs]
    )
    cfg = CodecConfig()
    mp = sum(im.shape[0] * im.shape[1] for im in all_imgs) / 1e6
    bsz = args.bsz
    batches = [all_imgs[i : i + bsz] for i in range(0, len(all_imgs), bsz)]

    warmup.prewarm(warmup.default_manifest_path())
    t0 = time.perf_counter()
    stream.encode_stream(batches, cfg, workers=8)
    print(f"warm pass: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # Converge before measuring
    for _ in range(3):
        t0 = time.perf_counter()
        stream.encode_stream(batches, cfg, workers=8)
        dt = time.perf_counter() - t0
        print(f"converge pass: {dt:.1f}s", file=sys.stderr)

    for spec in args.points.split():
        w = int(spec)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            stream.encode_stream(batches, cfg, workers=w)
            best = min(best, time.perf_counter() - t0)
        print(
            f"workers={w:3d} bsz={bsz}: {best:.1f}s = {mp / best:.3f} MP/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
