"""Visual pipeline walkthrough — the rhccq.ipynb equivalent as a script.

Runs the full encoder on one image with every intermediate exposed and writes
a panel figure: original, ROI mask, segment map, tier-1/2/3 reconstructions,
final decode + metrics.

Usage: RHCCQ_FORCE_CPU=1 python scripts/demo.py [image.png] [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import roibasedimagecompression_tpu as rtc
from roibasedimagecompression_tpu.io import container, image_io
from roibasedimagecompression_tpu.models.codec import encode_debug
from roibasedimagecompression_tpu.ops import metrics as M


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/images/png/Lenna.png"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rhccq_demo.png"
    img = image_io.imread_rgb(src)

    cfg = rtc.CodecConfig()
    result = encode_debug(img, cfg)
    recon = rtc.decode(result["data"])
    q = M.quality_metrics(img, recon)
    payload = container.unpack(result["data"])
    bpp = len(result["data"]) * 8 / (img.shape[0] * img.shape[1])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 4, figsize=(18, 9))
    panels = [
        (img, "original"),
        (result["roi_mask"], "ROI mask"),
        (np.where(result["seg_map"] > 0, result["seg_map"] % 20, -1), "SLIC segments"),
        (result["tier1"], f"tier 1 (q={cfg.roi_quality:.0f}/{cfg.nonroi_quality:.0f})"),
        (result["tier2"], f"tier 2 (q={cfg.roi_tier2_quality:.0f}/{cfg.nonroi_tier2_quality:.0f})"),
        (result["tier3"], f"tier 3 (q={cfg.image_quality:.0f})"),
        (recon, f"decoded: {payload.n_colors} colors"),
        (np.abs(img.astype(int) - recon.astype(int)).sum(2), "abs error"),
    ]
    for ax, (data, title) in zip(axes.ravel(), panels):
        if data.ndim == 2:
            ax.imshow(data, cmap="tab20" if "segment" in title.lower() else "gray")
        else:
            ax.imshow(data)
        ax.set_title(title)
        ax.axis("off")
    fig.suptitle(
        f"RHCCQ-TPU pipeline — {os.path.basename(src)}: "
        f"{len(result['data']):,} B ({bpp:.2f} bpp), "
        f"PSNR {q['psnr']:.2f} dB, SSIM {q['ssim']:.4f}"
    )
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")
    print(f"psnr={q['psnr']:.2f} ssim={q['ssim']:.4f} bpp={bpp:.2f} colors={payload.n_colors}")


if __name__ == "__main__":
    main()
