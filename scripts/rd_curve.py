"""Rate-distortion curve: our codec at several presets vs JPEG, on Kodak.

Produces RD points for quality presets (roi, nonroi) on a Kodak subset, the
matching JPEG curve, and a plot — the generalization of other/comparison.py's
single-point R-D scatter to the full quality knob.

Usage: RHCCQ_FORCE_CPU=1 python scripts/rd_curve.py [out_prefix]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import roibasedimagecompression_tpu as rtc
from roibasedimagecompression_tpu.io import image_io
from roibasedimagecompression_tpu.ops import metrics as M

PRESETS = [(10, 5), (20, 10), (35, 20), (50, 35)]
IMAGES = [1, 13]


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rd_curve"
    rows = []
    for i in IMAGES:
        img = image_io.imread_rgb(f"/root/reference/images/png/{i}.png")
        pixels = img.shape[0] * img.shape[1]
        for roi_q, nonroi_q in PRESETS:
            data = rtc.encode(
                img, rtc.CodecConfig(roi_quality=roi_q, nonroi_quality=nonroi_q)
            )
            q = M.quality_metrics(img, rtc.decode(data))
            rows.append(
                {
                    "image": i,
                    "codec": "rhccq-tpu",
                    "preset": f"{roi_q}/{nonroi_q}",
                    "bpp": len(data) * 8 / pixels,
                    "psnr": q["psnr"],
                    "ssim": q["ssim"],
                }
            )
            print(rows[-1], flush=True)
        for jq in (20, 40, 60, 80, 92):
            jdata = image_io.jpeg_bytes(img, quality=jq)
            jm = M.quality_metrics(img, image_io.decode_jpeg(jdata))
            rows.append(
                {
                    "image": i,
                    "codec": "jpeg",
                    "preset": str(jq),
                    "bpp": len(jdata) * 8 / pixels,
                    "psnr": jm["psnr"],
                    "ssim": jm["ssim"],
                }
            )

    with open(prefix + ".json", "w") as f:
        json.dump(rows, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for codec, color in (("rhccq-tpu", "#4878a8"), ("jpeg", "#b8562c")):
        pts = [(r["bpp"], r["psnr"]) for r in rows if r["codec"] == codec]
        # Average across images per preset for a clean curve.
        presets = sorted({r["preset"] for r in rows if r["codec"] == codec},
                         key=lambda p: np.mean([r["bpp"] for r in rows
                                                if r["codec"] == codec and r["preset"] == p]))
        xs, ys = [], []
        for p in presets:
            sel = [r for r in rows if r["codec"] == codec and r["preset"] == p]
            xs.append(np.mean([r["bpp"] for r in sel]))
            ys.append(np.mean([r["psnr"] for r in sel]))
        ax.plot(xs, ys, "o-", label=codec, color=color)
    ax.set_xlabel("rate (bits per pixel)")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(f"Rate-distortion, Kodak images {IMAGES}")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(prefix + ".png", dpi=120)
    print(f"wrote {prefix}.json / {prefix}.png")


if __name__ == "__main__":
    main()
