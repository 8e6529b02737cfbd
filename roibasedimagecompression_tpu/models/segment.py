"""Region extraction and sub-region segmentation (split score + SLIC).

Rebuilds encoder/subregions/* and the region bookkeeping of encoder/ROI/roi.py:
regions are connected components of the ROI / non-ROI masks; each region gets a
split score (color + texture complexity) that sets its SLIC segment count
through the logistic window law; SLIC runs at a <= 500 px working resolution
and labels are upsampled back (slic.py:41-104).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import lbp as LBP
from roibasedimagecompression_tpu.ops import slic as SLIC


@dataclasses.dataclass
class Region:
    """A connected region of the ROI or non-ROI mask (roi.py:349-358 dict)."""

    bbox: tuple  # (minr, minc, maxr, maxc), exclusive max
    bbox_mask: np.ndarray  # (bh, bw) bool
    area: int
    kind: str  # "roi" | "nonroi"


def extract_regions(mask: np.ndarray, kind: str) -> list:
    """Connected components (8-conn) of a binary mask -> Region list
    (extract_connected_regions_fast, roi.py:285-360)."""
    labels, num = CC.connected_components(mask, connectivity=8)
    if num <= 1:
        return []
    stats = CC.component_stats(labels, num)
    out = []
    for lab in range(1, num):
        minr, minc, maxr, maxc = stats.bboxes[lab]
        out.append(
            Region(
                bbox=(int(minr), int(minc), int(maxr), int(maxc)),
                bbox_mask=labels[minr:maxr, minc:maxc] == lab,
                area=int(stats.areas[lab]),
                kind=kind,
            )
        )
    return out


def reassign_small_roi(roi_regions: list, nonroi_regions: list, min_size: int):
    """ROI regions below min_size become non-ROI (extract_regions,
    roi.py:59-83)."""
    big = [r for r in roi_regions if r.area >= min_size]
    small = [
        dataclasses.replace(r, kind="nonroi") for r in roi_regions if r.area < min_size
    ]
    return big, nonroi_regions + small


def _pow2_bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@jax.jit
def _split_score_jit(rgb: jnp.ndarray, mask: jnp.ndarray):
    """Jitted body of calculate_split_score (split_score.py:15-142)."""
    maskf = mask.astype(jnp.float32)
    count = jnp.sum(maskf)
    safe = jnp.maximum(count, 1.0)

    def masked_mean(x):
        return jnp.sum(x * maskf) / safe

    def masked_std(x):
        mu = masked_mean(x)
        return jnp.sqrt(jnp.maximum(masked_mean(x * x) - mu * mu, 0.0))

    gray = COL.rgb_to_gray_skimage(rgb)
    lab = COL.rgb_to_lab(rgb)

    # Color complexity: LAB channel std mix + sobel-gradient mean.
    l_std = masked_std(lab[..., 0])
    a_std = masked_std(lab[..., 1])
    b_std = masked_std(lab[..., 2])
    color_variance = (l_std / 100.0 + a_std / 128.0 + b_std / 128.0) / 3.0
    # Reference quirk (split_score.py:48-51): grad_x and grad_y are BOTH the
    # sobel magnitude, so the "gradient magnitude" is sqrt(2)*|sobel| summed
    # over the three LAB channels.
    gm = jnp.zeros_like(gray)
    for ch in range(3):
        s = CONV.sobel_skimage(lab[..., ch])
        gm = gm + jnp.sqrt(s * s + s * s)
    gradient_score = masked_mean(gm) / 3.0
    color_score = jnp.clip(0.7 * color_variance + 0.3 * gradient_score, 0.0, 1.0)

    # Texture complexity: LBP entropy, gradient variance, intensity entropy,
    # intensity std (split_score.py:60-124).
    lbp_codes = LBP.local_binary_pattern_uniform(gray).astype(jnp.float32)
    lbp_hist = LBP.masked_histogram_density(lbp_codes, mask, 0.0, 10.0, 10)
    lbp_entropy = -jnp.sum(lbp_hist * jnp.log2(lbp_hist + 1e-8))
    lbp_score = jnp.clip(lbp_entropy / 3.0, 0.0, 1.0)

    grad = CONV.sobel_skimage(gray)
    grad_mu = masked_mean(grad)
    grad_var = masked_mean(grad * grad) - grad_mu * grad_mu
    grad_score = jnp.clip(grad_var * 50.0, 0.0, 1.0)

    int_hist = LBP.masked_histogram_density(gray, mask, 0.0, 1.0, 32)
    int_entropy = -jnp.sum(int_hist * jnp.log2(int_hist + 1e-8))
    entropy_score = jnp.clip(int_entropy / 5.0, 0.0, 1.0)

    std_score = jnp.clip(masked_std(gray) * 2.0, 0.0, 1.0)

    texture_score = jnp.clip(
        (lbp_score + grad_score + entropy_score + std_score) / 4.0, 0.0, 1.0
    )
    overall = 0.4 * color_score + 0.6 * texture_score
    return overall, color_score, texture_score, count


def split_score(bbox_rgb: np.ndarray, bbox_mask: np.ndarray):
    """(overall, color, texture) for a region crop; tiny regions score 0."""
    h, w = bbox_mask.shape
    ph, pw = _pow2_bucket(h), _pow2_bucket(w)
    rgb = np.zeros((ph, pw, 3), np.uint8)
    rgb[:h, :w] = bbox_rgb
    m = np.zeros((ph, pw), bool)
    m[:h, :w] = bbox_mask
    overall, color, texture, count = _split_score_jit(jnp.asarray(rgb), jnp.asarray(m))
    if int(count) < 100:
        return 0.0, 0.0, 0.0
    return float(overall), float(color), float(texture)


def optimal_segments(bbox_rgb: np.ndarray, bbox_mask: np.ndarray) -> int:
    """Split score -> SLIC segment count via the logistic window law
    (encoder/compression/subregions.py:133-138)."""
    overall, _, _ = split_score(bbox_rgb, bbox_mask)
    window = cfg.segment_window(bbox_rgb.size)
    return cfg.logistic_segments(overall, window)


def _resize_uint8(img: np.ndarray, shape: tuple) -> np.ndarray:
    """Antialiased downscale on host (PIL).

    Host by choice: region geometries are unbounded, so device resizes would
    compile one graph per (in, out) shape pair; the resize itself is a few
    hundred kB of pixel work.
    """
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((shape[1], shape[0]), Image.BILINEAR),
        dtype=np.uint8,
    )


def _resize_nearest(arr: np.ndarray, shape: tuple) -> np.ndarray:
    """Nearest-neighbor resize via index maps (half-pixel centers)."""
    h, w = arr.shape[:2]
    nh, nw = shape
    rows = np.minimum(((np.arange(nh) + 0.5) * h / nh).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(nw) + 0.5) * w / nw).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def region_segments(
    bbox_rgb: np.ndarray,
    bbox_mask: np.ndarray,
    n_segments: int,
    compactness: float = 10.0,
    sigma: float = 1.0,
) -> np.ndarray:
    """SLIC at <= 500 px working resolution, labels upsampled back
    (enhanced_slic_with_texture, slic.py:41-104).

    Returns (bh, bw) int32 labels, 0 outside mask.
    """
    h, w = bbox_mask.shape
    scale = cfg.slic_scale_factor(max(bbox_rgb.shape))
    if scale < 1.0:
        nh, nw = int(h * scale), int(w * scale)
        nh, nw = max(nh, 1), max(nw, 1)
        small_img = _resize_uint8(bbox_rgb, (nh, nw))
        small_mask = _resize_nearest(bbox_mask, (nh, nw))
        n_scaled = max(1, math.ceil(n_segments * scale * scale))
        if not small_mask.any():
            return np.zeros((h, w), np.int32)
        small_labels = SLIC.slic(
            small_img, small_mask, n_scaled, compactness=compactness, sigma=sigma
        )
        labels = _resize_nearest(small_labels, (h, w)).astype(np.int32)
        # Upsampled labels can leak outside the full-res mask; clamp.
        labels[~bbox_mask] = 0
        return labels
    return SLIC.slic(bbox_rgb, bbox_mask, n_segments, compactness=compactness, sigma=sigma)
