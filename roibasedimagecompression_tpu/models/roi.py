"""ROI mask pipeline: edge density -> cleaned, unified binary ROI map.

Rebuilds the full chain of process_and_unify_borders (encoder/ROI/roi.py:
527-607) with device kernels:

  density filter -> thin-structure removal -> density-aware denoise ->
  morphological closing -> gap bridging -> border-protected unification ->
  hole filling -> small-region cleanup -> ROI/non-ROI split with buffer zone

Stage constants live in config.RoiConfig with the reference call-site values.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.ops import canny as CANNY
from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import distance as DIST
from roibasedimagecompression_tpu.ops import hist as H
from roibasedimagecompression_tpu.ops import morphology as M


def remove_thin_structures(
    binary: np.ndarray,
    density_threshold: float,
    thinness_threshold: float,
    window_size: int,
    min_region_size: int,
) -> np.ndarray:
    """Drop elongated components in low-density areas.

    remove_thin_structures_optimized + identify_thin_regions_ultrafast
    (encoder/ROI/thin_regions2.py:14-99,157-243): thinness = 1 - 2*mean(EDT)/
    max(bbox dims); thin components (> thinness_threshold, area >=
    min_region_size) whose mean local density < density_threshold are removed.
    """
    if not binary.any():
        return binary
    density = np.asarray(CONV.box_density(jnp.asarray(binary), window_size))
    labels, num = CC.connected_components(binary, connectivity=8)
    if num <= 1:
        return binary
    dist = np.asarray(DIST.distance_transform_l2(jnp.asarray(binary)))
    stats = CC.component_stats(labels, num)
    avg_dist = CC.label_means(labels, dist, num)
    max_dim = np.maximum(stats.width(), stats.height()).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        thinness = 1.0 - np.where(max_dim > 0, (avg_dist * 2.0) / max_dim, 0.0)
    is_thin = (thinness > thinness_threshold) & (stats.areas >= min_region_size)
    is_thin[0] = False
    densities = CC.label_means(labels, density, num)
    drop = np.flatnonzero(is_thin & (densities < density_threshold))
    return CC.remove_labels(binary, labels, drop)


def remove_small_noise_regions(
    binary: np.ndarray, min_size: int, density_threshold: float, window_size: int
) -> np.ndarray:
    """Remove small white then small black components, only in low-density
    areas (remove_small_noise_regions, roi.py:925-968; density computed once
    from the input and shared by both passes)."""
    density = np.asarray(CONV.box_density(jnp.asarray(binary), window_size))

    def one_pass(mask):
        labels, num = CC.connected_components(mask, connectivity=8)
        if num <= 1:
            return mask
        areas = CC.component_stats(labels, num).areas
        dens = CC.label_means(labels, density, num)
        drop = np.flatnonzero((areas < min_size) & (dens < density_threshold))
        drop = drop[drop > 0]
        return CC.remove_labels(mask, labels, drop)

    white = one_pass(binary)
    black = one_pass(~white)
    return ~black


def bridge_small_gaps(
    binary: np.ndarray,
    max_gap: int,
    density_threshold: float,
    local_window: int,
    regional_window: int,
) -> np.ndarray:
    """Turn black pixels white when the region is dense and white pixels exist
    in opposite directions (bridge_small_gaps_fast, small_gaps.py:221-271).

    The 8 directional-reach convolutions run as one fused device pass.
    """
    x = jnp.asarray(binary)
    density = CONV.box_density(x, regional_window)
    candidates = (~x) & (density > density_threshold)
    kernels = CONV.directional_reach_kernels(max_gap, local_window)
    xf = x.astype(jnp.float32) * 255.0
    reach = CONV.conv2d_same_multi(xf, jnp.asarray(kernels), reflect=True) > 0
    gaps = jnp.zeros_like(x)
    for p in range(4):
        gaps = gaps | (candidates & reach[2 * p] & reach[2 * p + 1])
    return np.asarray(x | gaps)


def detect_meaningful_borders(binary: np.ndarray, sensitivity: float) -> np.ndarray:
    """Gradient-based border mask (detect_meaningful_borders, roi.py:784-822)."""
    x = jnp.asarray(binary).astype(jnp.float32)  # 0/1 scale (ref divides by 255)
    gx, gy = CONV.sobel_cv2(x)
    mag = jnp.sqrt(gx * gx + gy * gy)
    mag = mag / jnp.maximum(jnp.max(mag), 1e-12)
    strong = mag > (sensitivity * 0.5)
    ones3 = np.ones((3, 3), bool)
    enhanced = M.close(strong, ones3)
    return np.asarray(M.dilate(enhanced, ones3, iterations=2))


def protect_border_regions(binary: np.ndarray, border: np.ndarray, kernel_size: int) -> np.ndarray:
    """Fill internal black noise away from borders (protect_border_regions,
    roi.py:824-857): black pixels inside the closed white neighborhood that are
    not in the border safe zone become white."""
    x = jnp.asarray(binary)
    closed = M.close(x, np.ones((kernel_size, kernel_size), bool))
    internal = (~x) & closed & (~jnp.asarray(border))
    return np.asarray(x | internal)


def fill_closed_regions(
    binary: np.ndarray, min_hole: int, max_hole: int, connectivity: int
) -> np.ndarray:
    """Fill holes with min_hole <= area <= max_hole (fill_closed_regions,
    roi.py:881-918)."""
    inverted = ~binary
    labels, num = CC.connected_components(inverted, connectivity=connectivity)
    if num <= 1:
        return binary
    areas = CC.component_stats(labels, num).areas
    fill = np.flatnonzero((areas >= min_hole) & (areas <= max_hole))
    fill = fill[fill > 0]
    out = binary.copy()
    out[np.isin(labels, fill)] = True
    return out


def remove_small_regions(binary: np.ndarray, min_size: int) -> np.ndarray:
    """3x3 closing then drop components below min_size (remove_small_regions,
    small_regions.py:4-21)."""
    closed = np.asarray(M.close(jnp.asarray(binary), np.ones((3, 3), bool)))
    labels, num = CC.connected_components(closed, connectivity=8)
    if num <= 1:
        return closed
    areas = CC.component_stats(labels, num).areas
    keep = areas >= min_size
    keep[0] = False
    return np.isin(labels, np.flatnonzero(keep))


def roi_masks(image_rgb: np.ndarray, config: cfg.CodecConfig):
    """Full pipeline: RGB image -> (roi_mask, nonroi_mask) bool maps.

    get_regions + process_and_unify_borders + extract_roi_nonroi
    (roi.py:14-40, 527-607, 685-718).
    """
    rc = config.roi
    edges, _ = CANNY.get_edge_map(image_rgb)
    density = np.asarray(CONV.box_density(jnp.asarray(edges), rc.density_kernel))
    thr = float(H.masked_mean(jnp.asarray(density), jnp.asarray(edges))) / 100.0

    binary = edges & (density > thr)

    binary = remove_thin_structures(
        binary,
        density_threshold=rc.thin_density_threshold,
        thinness_threshold=rc.thin_thinness_threshold,
        window_size=rc.thin_window,
        min_region_size=rc.thin_min_region_size,
    )
    binary = remove_small_noise_regions(
        binary, rc.noise_min_size, rc.noise_density_threshold, rc.noise_window
    )
    binary = np.asarray(
        M.close(jnp.asarray(binary), M.ellipse_kernel(rc.close_distance * 2 + 1))
    )
    binary = bridge_small_gaps(
        binary, rc.bridge1_max_gap, rc.bridge1_density,
        rc.bridge_local_window, rc.bridge_regional_window,
    )

    # Directional region unification (roi.py:720-782).
    border = detect_meaningful_borders(binary, rc.border_sensitivity)
    binary = protect_border_regions(binary, border, rc.border_protect_kernel)
    binary = bridge_small_gaps(
        binary, rc.bridge2_max_gap, rc.bridge1_density,
        rc.bridge_local_window, rc.bridge_regional_window,
    )
    binary = fill_closed_regions(binary, rc.fill_min_hole, rc.fill_max_hole, connectivity=4)
    region_map = remove_small_regions(binary, rc.clean_min_size)

    # ROI / non-ROI with dilated buffer zone (roi.py:685-718).
    roi_core = jnp.asarray(region_map)
    nonroi_core = ~roi_core
    roi_exp = M.binary_dilation_scipy(roi_core, iterations=rc.buffer_size)
    nonroi_exp = M.binary_dilation_scipy(nonroi_core, iterations=rc.buffer_size)
    buffer = roi_exp & nonroi_exp
    roi_mask = np.asarray(roi_core | buffer)
    nonroi_mask = np.asarray(nonroi_core | buffer)
    return roi_mask, nonroi_mask
