"""The entire ROI mask pipeline as ONE fused XLA graph.

models/roi.py keeps the stage-by-stage host-orchestrated version (used by
tests and debugging); this module compiles the same chain — adaptive Canny
selection, density filter, thin-structure removal, density-aware denoise,
closing, gap bridging, border-protected unification, hole filling, cleanup,
buffer-zone split — into a single jitted function.  Per-component statistics
(areas, mean density, EDT thinness, bbox dims) are evaluated in-graph with
segment reductions over raw min-index labels, so no host compaction or
transfer happens anywhere in the chain.

Rationale: each host round-trip through this environment's device tunnel
costs ~30 ms and each freshly-seen graph minutes of remote compile; one big
graph pays one compile and zero intermediate transfers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.ops import canny as CANNY
from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import distance as DIST
from roibasedimagecompression_tpu.ops import hist as H
from roibasedimagecompression_tpu.ops import morphology as M


def _per_component(mask, *values, connectivity=8):
    """Raw CC labels + per-pixel component reductions.

    Returns (flat_labels, counts_at_pixel, [sum_at_pixel for each value]).
    Background pixels read bucket h*w (zeros).
    """
    h, w = mask.shape
    labels = CC.propagate_labels(mask, connectivity=connectivity)
    flat = jnp.where(mask, labels, h * w).reshape(-1)
    counts = jax.ops.segment_sum(
        mask.reshape(-1).astype(jnp.float32), flat, num_segments=h * w + 1
    )
    count_at = counts[flat].reshape(h, w)
    sums_at = []
    for v in values:
        s = jax.ops.segment_sum(
            jnp.where(mask, v, 0.0).reshape(-1).astype(jnp.float32),
            flat,
            num_segments=h * w + 1,
        )
        sums_at.append(s[flat].reshape(h, w))
    return flat, count_at, sums_at


def _remove_thin_structures(binary, rc: cfg.RoiConfig):
    """thin_regions2 semantics in-graph: thinness = 1 - 2*mean(EDT)/max(bbox
    dim); thin components in low-density areas are dropped."""
    h, w = binary.shape
    density = CONV.box_density(binary, rc.thin_window)
    dist = DIST.distance_transform_l2(binary)
    labels = CC.propagate_labels(binary, connectivity=8)
    flat = jnp.where(binary, labels, h * w).reshape(-1)
    ones = binary.reshape(-1).astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, flat, num_segments=h * w + 1)
    dist_sum = jax.ops.segment_sum(
        jnp.where(binary, dist, 0.0).reshape(-1), flat, num_segments=h * w + 1
    )
    dens_sum = jax.ops.segment_sum(
        jnp.where(binary, density, 0.0).reshape(-1), flat, num_segments=h * w + 1
    )
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    big = jnp.float32(1e9)
    minr = jax.ops.segment_min(jnp.where(binary.reshape(-1), rows, big), flat, num_segments=h * w + 1)
    maxr = jax.ops.segment_max(jnp.where(binary.reshape(-1), rows, -big), flat, num_segments=h * w + 1)
    minc = jax.ops.segment_min(jnp.where(binary.reshape(-1), cols, big), flat, num_segments=h * w + 1)
    maxc = jax.ops.segment_max(jnp.where(binary.reshape(-1), cols, -big), flat, num_segments=h * w + 1)
    max_dim = jnp.maximum(maxr - minr + 1.0, maxc - minc + 1.0)
    avg_dist = dist_sum / jnp.maximum(counts, 1.0)
    mean_dens = dens_sum / jnp.maximum(counts, 1.0)
    thinness = 1.0 - jnp.where(max_dim > 0, avg_dist * 2.0 / max_dim, 0.0)
    drop = (
        (thinness > rc.thin_thinness_threshold)
        & (counts >= rc.thin_min_region_size)
        & (mean_dens < rc.thin_density_threshold)
    )
    return binary & ~drop[flat].reshape(h, w)


def _remove_small_noise(binary, rc: cfg.RoiConfig):
    """remove_small_noise_regions: density computed once, shared by the white
    and black passes."""
    density = CONV.box_density(binary, rc.noise_window)

    def one_pass(mask):
        h, w = mask.shape
        flat, count_at, (dens_at,) = _per_component(mask, density)
        mean_dens = dens_at / jnp.maximum(count_at, 1.0)
        drop = (count_at < rc.noise_min_size) & (mean_dens < rc.noise_density_threshold)
        return mask & ~drop

    white = one_pass(binary)
    return ~one_pass(~white)


def _bridge_gaps(binary, max_gap, rc: cfg.RoiConfig):
    density = CONV.box_density(binary, rc.bridge_regional_window)
    candidates = (~binary) & (density > rc.bridge1_density)
    kernels = CONV.directional_reach_kernels(max_gap, rc.bridge_local_window)
    xf = binary.astype(jnp.float32) * 255.0
    reach = CONV.conv2d_same_multi(xf, jnp.asarray(kernels), reflect=True) > 0
    gaps = jnp.zeros_like(binary)
    for p in range(4):
        gaps = gaps | (candidates & reach[2 * p] & reach[2 * p + 1])
    return binary | gaps


def _fill_closed_regions(binary, rc: cfg.RoiConfig):
    inverted = ~binary
    _, count_at, _ = _per_component(inverted, connectivity=4)
    fill = inverted & (count_at >= rc.fill_min_hole) & (count_at <= rc.fill_max_hole)
    return binary | fill


def _remove_small_regions(binary, min_size):
    closed = M.close(binary, np.ones((3, 3), bool))
    _, count_at, _ = _per_component(closed)
    return closed & (count_at >= min_size)


@functools.partial(jax.jit, static_argnames=("rc",))
def roi_masks_device(image_rgb: jax.Array, rc: cfg.RoiConfig, low=None, high=None):
    """(h, w, 3) uint8 + chosen Canny thresholds -> (roi_mask, nonroi_mask).

    Threshold selection is HOISTED OUT of the graph (canny.select_thresholds:
    a single device analysis call + host union-find scoring) — the in-graph
    20-candidate propagation sweep was ~3.7 s of the 5.6 s round-1 ROI stage.
    low=None keeps the fully-fused legacy behavior (sweep in-graph) for the
    shardable single-graph demo path.
    """
    if low is None:
        gray = COL.rgb_to_gray_cv2(image_rgb)
        cands = CANNY.adaptive_thresholds(gray)
        scores = CANNY.edge_quality_scores(gray, cands)
        best = jnp.argmax(scores)
        low, high = cands[best, 0], cands[best, 1]
    mag, nms = CANNY.gradient_and_nms(image_rgb)
    edges = CANNY.hysteresis(mag, nms, low, high)

    density = CONV.box_density(edges, rc.density_kernel)
    thr = H.masked_mean(density, edges) / 100.0
    binary = edges & (density > thr)

    binary = _remove_thin_structures(binary, rc)
    binary = _remove_small_noise(binary, rc)
    binary = M.close(binary, M.ellipse_kernel(rc.close_distance * 2 + 1))
    binary = _bridge_gaps(binary, rc.bridge1_max_gap, rc)

    # Directional unification.
    x = binary.astype(jnp.float32)
    gx, gy = CONV.sobel_cv2(x)
    gmag = jnp.sqrt(gx * gx + gy * gy)
    gmag = gmag / jnp.maximum(jnp.max(gmag), 1e-12)
    strong = gmag > (rc.border_sensitivity * 0.5)
    ones3 = np.ones((3, 3), bool)
    border = M.dilate(M.close(strong, ones3), ones3, iterations=2)

    closed_white = M.close(binary, np.ones((rc.border_protect_kernel,) * 2, bool))
    binary = binary | ((~binary) & closed_white & (~border))

    binary = _bridge_gaps(binary, rc.bridge2_max_gap, rc)
    binary = _fill_closed_regions(binary, rc)
    region_map = _remove_small_regions(binary, rc.clean_min_size)

    roi_exp = M.binary_dilation_scipy(region_map, iterations=rc.buffer_size)
    nonroi_exp = M.binary_dilation_scipy(~region_map, iterations=rc.buffer_size)
    buffer = roi_exp & nonroi_exp
    return region_map | buffer, (~region_map) | buffer


def roi_masks(image_rgb: np.ndarray, config: cfg.CodecConfig):
    """Host wrapper matching models/roi.roi_masks (hybrid threshold
    selection + one fused mask graph)."""
    if config.fast_edges:
        lows, highs = CANNY.fast_thresholds_many(np.asarray(image_rgb)[None])
        low, high = float(lows[0]), float(highs[0])
        from roibasedimagecompression_tpu import native

        out = native.roi_pipeline(image_rgb, low, high, config.roi)
        if out is not None:
            return out
        roi, nonroi = roi_masks_device(
            jnp.asarray(image_rgb), config.roi, jnp.float32(low), jnp.float32(high)
        )
        return np.asarray(roi), np.asarray(nonroi)
    low, high = CANNY.select_thresholds_pair(image_rgb)
    roi, nonroi = roi_masks_device(
        jnp.asarray(image_rgb), config.roi, jnp.float32(low), jnp.float32(high)
    )
    return np.asarray(roi), np.asarray(nonroi)


def roi_masks_fast(image_rgb: np.ndarray, config: cfg.CodecConfig, low, high):
    """Low-latency ROI masks: native C++ pipeline when available, else the
    fused device graph.

    The mask chain is dominated by connected-components passes that cost
    ~0.4-0.5 s each as device propagation sweeps but milliseconds as host
    union-find (native/rhccq_native.cpp roi_pipeline).  The encode paths call
    this uniformly — singles, batches and mesh runs — so batched==singles and
    sharded==unsharded byte-equality contracts hold with either backend.
    """
    from roibasedimagecompression_tpu import native

    out = native.roi_pipeline(image_rgb, float(low), float(high), config.roi)
    if out is not None:
        return out
    roi, nonroi = roi_masks_device(
        jnp.asarray(image_rgb), config.roi, jnp.float32(low), jnp.float32(high)
    )
    return np.asarray(roi), np.asarray(nonroi)
