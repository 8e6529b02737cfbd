"""Quick quality+time A/B of encode_many knobs on the bench 8-image batch.

Usage: [env knobs] python scripts/qcheck.py [--runs 2] [--images 8]
Prints one line: wall seconds (best), MP/s, mean PSNR, mean bpp.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--images", type=int, default=8)
    args = ap.parse_args()

    import jax

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.models import codec
    from roibasedimagecompression_tpu.ops import metrics as M
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import timing

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13][: args.images]
    imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    cfg = CodecConfig()

    best = float("inf")
    best_stages = {}
    blobs = None
    for r in range(args.runs):
        timing.reset_stages()
        t0 = time.perf_counter()
        blobs = stream.encode_many(imgs, cfg)
        dt = time.perf_counter() - t0
        # Keep the stage profile OF THE BEST RUN so the printed stages match
        # the reported wall time (stages from a slower run can disagree).
        if dt < best:
            best = dt
            best_stages = {
                k: round(v["seconds"], 2)
                for k, v in timing.stage_report().items()
            }
        print(f"run {r}: {dt:.2f}s", file=sys.stderr, flush=True)
    print(f"stages(best run)={best_stages}", file=sys.stderr, flush=True)

    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    psnrs, bpps = [], []
    for im, data in zip(imgs, blobs):
        q = M.quality_metrics(im, codec.decode(data))
        psnrs.append(q["psnr"])
        bpps.append(len(data) * 8.0 / (im.shape[0] * im.shape[1]))
    print(
        f"best={best:.2f}s mpps={mp / best:.3f} "
        f"psnr={np.mean(psnrs):.3f} bpp={np.mean(bpps):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
