"""Microbenchmark: per-sub-stage device timing of the fused ROI mask graph.

Each sub-stage of roi_masks_device is jitted separately and timed warm on a
real 512x768 Kodak input propagated through the preceding stages, so every
number is the stage's own steady-state cost (block_until_ready).

Usage: python scripts/microbench_roi.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    from roibasedimagecompression_tpu import config as cfg
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.models import roi_fused as RF
    from roibasedimagecompression_tpu.ops import canny as CANNY
    from roibasedimagecompression_tpu.ops import colors as COL
    from roibasedimagecompression_tpu.ops import conv as CONV
    from roibasedimagecompression_tpu.ops import hist as H
    from roibasedimagecompression_tpu.ops import morphology as M

    rc = cfg.RoiConfig()
    img = image_io.imread_rgb("/root/reference/images/png/3.png")
    image = jnp.asarray(img)
    print(f"backend={jax.default_backend()} shape={img.shape}", flush=True)

    low, high, mag_c, nms_c = CANNY.select_thresholds(img)

    results = {}

    def stage(name, fn, *args):
        dt, out = timeit(jax.jit(fn), *args)
        results[name] = round(dt * 1000, 1)
        print(f"{name}: {dt*1000:.1f} ms", flush=True)
        return out

    edges = stage(
        "hysteresis",
        lambda m, n: CANNY.hysteresis(m, n, jnp.float32(low), jnp.float32(high)),
        jnp.asarray(mag_c), jnp.asarray(nms_c),
    )

    def densfilter(edges):
        density = CONV.box_density(edges, rc.density_kernel)
        thr = H.masked_mean(density, edges) / 100.0
        return edges & (density > thr)

    binary = stage("density_filter", densfilter, edges)
    binary = stage("thin_structures", lambda b: RF._remove_thin_structures(b, rc), binary)
    binary = stage("small_noise", lambda b: RF._remove_small_noise(b, rc), binary)
    binary = stage(
        "close", lambda b: M.close(b, M.ellipse_kernel(rc.close_distance * 2 + 1)), binary
    )
    binary = stage("bridge1", lambda b: RF._bridge_gaps(b, rc.bridge1_max_gap, rc), binary)

    def unify(binary):
        x = binary.astype(jnp.float32)
        gx, gy = CONV.sobel_cv2(x)
        gmag = jnp.sqrt(gx * gx + gy * gy)
        gmag = gmag / jnp.maximum(jnp.max(gmag), 1e-12)
        strong = gmag > (rc.border_sensitivity * 0.5)
        ones3 = np.ones((3, 3), bool)
        border = M.dilate(M.close(strong, ones3), ones3, iterations=2)
        closed_white = M.close(binary, np.ones((rc.border_protect_kernel,) * 2, bool))
        return binary | ((~binary) & closed_white & (~border))

    binary = stage("unify_borders", unify, binary)
    binary = stage("bridge2", lambda b: RF._bridge_gaps(b, rc.bridge2_max_gap, rc), binary)
    binary = stage("fill_closed", lambda b: RF._fill_closed_regions(b, rc), binary)
    region_map = stage(
        "remove_small", lambda b: RF._remove_small_regions(b, rc.clean_min_size), binary
    )

    def buffers(region_map):
        roi_exp = M.binary_dilation_scipy(region_map, iterations=rc.buffer_size)
        nonroi_exp = M.binary_dilation_scipy(~region_map, iterations=rc.buffer_size)
        buffer = roi_exp & nonroi_exp
        return region_map | buffer, (~region_map) | buffer

    stage("buffer_split", buffers, region_map)

    # Whole fused graph for reference.
    dt, _ = timeit(
        lambda im: RF.roi_masks_device(im, rc, jnp.float32(low), jnp.float32(high)),
        image,
    )
    results["fused_total"] = round(dt * 1000, 1)
    print(f"fused_total: {dt*1000:.1f} ms", flush=True)
    print(results)


if __name__ == "__main__":
    main()
