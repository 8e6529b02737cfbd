"""Bisect the batch>=4 vmapped fused-ROI v5e worker fault to a single stage.

Rounds 1-2 observed that `jax.vmap(roi_masks_device)` at batch >= 4
reproducibly kills the tunneled v5e worker (an unrecoverable runtime fault:
the process loses the device), so `parallel/stream.py` chunks the fused ROI
frontend to batch 2.  This script isolates WHICH stage of the chain faults:

  python scripts/bisect_roi_fault.py            # parent: bisect over stages
  python scripts/bisect_roi_fault.py --stage K  # child: run prefix [0..K]

Each child runs the vmapped PREFIX of the ROI chain up to stage K at the
requested batch in a fresh process (a dead worker only costs that child).
The parent reports the first faulting stage.  Stages mirror
models/roi_fused.roi_masks_device (reference chain:
/root/reference/encoder/ROI/roi.py:527-607).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    "gradient_nms",       # 0: Canny gradient + NMS
    "hysteresis",         # 1: double-threshold hysteresis propagation
    "density_filter",     # 2: box density + masked mean threshold
    "thin_structures",    # 3: EDT + CC thinness removal
    "small_noise",        # 4: density-aware denoise (white+black CC passes)
    "close",              # 5: elliptical closing
    "bridge1",            # 6: directional gap bridging
    "border_unify",       # 7: sobel border + protected closing union
    "bridge2",            # 8: second gap bridging
    "fill_closed",        # 9: hole filling (inverted CC)
    "small_regions",      # 10: closing + min-size filter
    "buffer_split",       # 11: scipy-style dilations + buffer zone
]


def run_prefix(stage: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from roibasedimagecompression_tpu import config as cfg
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.models import roi_fused as RF
    from roibasedimagecompression_tpu.ops import canny as CANNY
    from roibasedimagecompression_tpu.ops import conv as CONV
    from roibasedimagecompression_tpu.ops import hist as H
    from roibasedimagecompression_tpu.ops import morphology as M

    rc = cfg.RoiConfig()
    kodak = "/root/reference/images/png"
    if os.path.exists(f"{kodak}/3.png"):
        ids = [3, 5, 6, 7, 8, 11, 12, 13][:batch]
        imgs = np.stack([image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids])
    else:
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (batch, 512, 768, 3), np.uint8)

    def prefix(image_rgb, low, high):
        mag, nms = CANNY.gradient_and_nms(image_rgb)
        if stage == 0:
            return mag
        edges = CANNY.hysteresis(mag, nms, low, high)
        if stage == 1:
            return edges
        density = CONV.box_density(edges, rc.density_kernel)
        thr = H.masked_mean(density, edges) / 100.0
        binary = edges & (density > thr)
        if stage == 2:
            return binary
        binary = RF._remove_thin_structures(binary, rc)
        if stage == 3:
            return binary
        binary = RF._remove_small_noise(binary, rc)
        if stage == 4:
            return binary
        binary = M.close(binary, M.ellipse_kernel(rc.close_distance * 2 + 1))
        if stage == 5:
            return binary
        binary = RF._bridge_gaps(binary, rc.bridge1_max_gap, rc)
        if stage == 6:
            return binary
        x = binary.astype(jnp.float32)
        gx, gy = CONV.sobel_cv2(x)
        gmag = jnp.sqrt(gx * gx + gy * gy)
        gmag = gmag / jnp.maximum(jnp.max(gmag), 1e-12)
        strong = gmag > (rc.border_sensitivity * 0.5)
        ones3 = np.ones((3, 3), bool)
        border = M.dilate(M.close(strong, ones3), ones3, iterations=2)
        closed_white = M.close(
            binary, np.ones((rc.border_protect_kernel,) * 2, bool)
        )
        binary = binary | ((~binary) & closed_white & (~border))
        if stage == 7:
            return binary
        binary = RF._bridge_gaps(binary, rc.bridge2_max_gap, rc)
        if stage == 8:
            return binary
        binary = RF._fill_closed_regions(binary, rc)
        if stage == 9:
            return binary
        region_map = RF._remove_small_regions(binary, rc.clean_min_size)
        if stage == 10:
            return region_map
        roi_exp = M.binary_dilation_scipy(region_map, iterations=rc.buffer_size)
        nonroi_exp = M.binary_dilation_scipy(~region_map, iterations=rc.buffer_size)
        buffer = roi_exp & nonroi_exp
        return region_map | buffer

    lows, highs = CANNY.select_thresholds_many(imgs)
    fn = jax.jit(jax.vmap(prefix))
    out = fn(jnp.asarray(imgs), jnp.asarray(lows, jnp.float32),
             jnp.asarray(highs, jnp.float32))
    jax.block_until_ready(out)
    print(f"stage {stage} ({STAGES[stage]}) batch={batch}: OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=-1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()
    if args.stage >= 0:
        run_prefix(args.stage, args.batch)
        return

    for k in range(args.start, len(STAGES)):
        print(f"--- stage {k} ({STAGES[k]}) batch={args.batch}", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", str(k),
             "--batch", str(args.batch)],
            timeout=3600,
        )
        if r.returncode != 0:
            print(
                f"FAULT at stage {k} ({STAGES[k]}): rc={r.returncode}",
                flush=True,
            )
            return
    print("no fault: every prefix ran", flush=True)


if __name__ == "__main__":
    main()
