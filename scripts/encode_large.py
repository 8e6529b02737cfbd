"""Large-input demonstration: encode a 22.2 MP image end-to-end.

The reference's largest shipped input is the 6064x3660 Napoli encode
(images/rhccq/Napoli_compressed.rhccq, BASELINE.md).  Its PNG original is not
shipped and the artifact's reconstruction is ~75% pure-black canvas (black is
the codec's background sentinel, so re-encoding it measures the sentinel
semantics, not large-image quality).  Default input is therefore a 6064x3660
mosaic of Kodak tiles — natural content at exactly the Napoli dimensions.
Pass --source napoli to use the decoded artifact anyway.  Usage:

    python scripts/encode_large.py [--scale 1.0] [--out large_report.json]

--scale crops the input (e.g. 0.5 -> 3032x1830) for cheaper smoke runs.
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
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--source", default="kodak-mosaic")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import jax

    import roibasedimagecompression_tpu as rtc
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.ops import metrics as M
    from roibasedimagecompression_tpu.utils import timing

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    if args.source == "napoli":
        img = rtc.decode("/root/reference/images/rhccq/Napoli_compressed.rhccq")
    elif args.source == "kodak-mosaic":
        # 6064x3660 (Napoli dimensions) tiled from landscape Kodak images.
        kodak = [
            image_io.imread_rgb(f"/root/reference/images/png/{i}.png")
            for i in (1, 2, 3, 5, 6, 7, 8, 11, 12, 13, 14, 15, 16, 20, 21, 22,
                      23, 24, 1, 2, 3, 5, 6, 7, 8, 11, 12, 13, 14, 15, 16, 20,
                      21, 22, 23, 24, 1, 2, 3, 5)
        ]
        rows = []
        k = 0
        for _ in range(8):  # 8 rows x 512 = 4096 -> crop to 3660
            rows.append(np.concatenate(kodak[k : k + 8], axis=1))  # 8*768=6144
            k += 8
            if k + 8 > len(kodak):
                k = 0
        img = np.ascontiguousarray(np.concatenate(rows, axis=0)[:3660, :6064])
    else:
        img = rtc.decode(args.source)
    if args.scale < 1.0:
        h, w = img.shape[:2]
        img = np.ascontiguousarray(
            img[: int(h * args.scale), : int(w * args.scale)]
        )
    h, w = img.shape[:2]
    mp = h * w / 1e6
    print(f"input: {w}x{h} = {mp:.1f} MP", file=sys.stderr, flush=True)

    cfg = rtc.CodecConfig()
    # Two passes in ONE process: the remote backend recompiles fresh graphs
    # per process (the on-disk cache does not shortcut its compiles), so the
    # first pass pays the giant-shape compile and the second is warm.
    warm = None
    for attempt in range(args.passes):
        timing.reset_stages()
        t0 = time.perf_counter()
        data = rtc.encode(img, cfg)
        dt = time.perf_counter() - t0
        print(f"pass {attempt}: {dt:.1f}s", file=sys.stderr, flush=True)
        warm = dt

    rec = rtc.decode(data)
    q = M.quality_metrics(img, rec)
    report = {
        "input": f"{w}x{h}",
        "megapixels": round(mp, 2),
        "encode_seconds": round(warm, 1),
        "mpps": round(mp / warm, 4),
        "bytes": len(data),
        "bpp": round(len(data) * 8 / (h * w), 3),
        "psnr_db": round(q["psnr"], 2),
        "ssim": round(q["ssim"], 4),
        "stages": {
            k: round(v["seconds"], 1) for k, v in timing.stage_report().items()
        },
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
