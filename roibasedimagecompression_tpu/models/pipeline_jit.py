"""Fully-jittable device core of the encoder — one fused XLA computation.

This is the "forward step" of the codec: everything between raw pixels and the
clustered palette that runs on device with static shapes.  The host pipeline
(models/codec.py) orchestrates ragged region bookkeeping around it; this module
is the compile-checkable, shardable unit used by __graft_entry__, the batched
throughput path and the multi-chip dry-run.

Stages fused here (all reference laws preserved):
  adaptive Canny threshold selection (20 candidates scored in-graph) ->
  final RGB Canny -> edge density + automatic ROI threshold ->
  SLIC assignment over a regular center grid -> palette extraction (sorted
  unique packed colors) -> eps-graph palette clustering at the quality preset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.ops import canny as CANNY
from roibasedimagecompression_tpu.ops import cluster as CL
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import hist as H
from roibasedimagecompression_tpu.ops import slic as SLIC
from roibasedimagecompression_tpu.ops import unique as U


def _grid_centers(h: int, w: int, n_side: int):
    """Regular n_side x n_side grid of initial SLIC centers (static)."""
    ys = (jnp.arange(n_side, dtype=jnp.float32) + 0.5) * (h / n_side)
    xs = (jnp.arange(n_side, dtype=jnp.float32) + 0.5) * (w / n_side)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=1)


@functools.partial(
    jax.jit, static_argnames=("n_centers_side", "palette_cap", "quality")
)
def analysis_step(
    image_rgb: jax.Array,
    n_centers_side: int = 8,
    palette_cap: int = 4096,
    quality: float = 20.0,
):
    """Device encoder core for one (h, w, 3) uint8 image.

    Returns a dict with the edge map, ROI seed mask, SLIC segment labels and
    the clustered palette (padded to palette_cap with cluster assignment).
    """
    h, w, _ = image_rgb.shape
    gray = COL.rgb_to_gray_cv2(image_rgb)

    # Adaptive Canny: score all 20 threshold candidates, pick in-graph.
    cands = CANNY.adaptive_thresholds(gray)
    scores = CANNY.edge_quality_scores(gray, cands)
    best = jnp.argmax(scores)
    low, high = cands[best, 0], cands[best, 1]
    mag, nms = CANNY.gradient_and_nms(image_rgb)
    edges = CANNY.hysteresis(mag, nms, low, high)

    # Edge density + automatic threshold (roi.py:23-25).
    density = CONV.box_density(edges, 3)
    thr = H.masked_mean(density, edges) / 100.0
    roi_seed = edges & (density > thr)

    # SLIC assignment over the full frame (the fused ops/slic core).
    n_centers = n_centers_side * n_centers_side
    step = jnp.float32((h * w / n_centers) ** 0.5)
    centers_yx = _grid_centers(h, w, n_centers_side)
    cyi = jnp.clip(jnp.round(centers_yx[:, 0]).astype(jnp.int32), 0, h - 1)
    cxi = jnp.clip(jnp.round(centers_yx[:, 1]).astype(jnp.int32), 0, w - 1)
    mask = jnp.ones((h, w), jnp.bool_)
    segments = SLIC._slic_core(
        image_rgb,
        mask,
        jnp.stack([cyi, cxi], axis=1),
        jnp.ones((n_centers,), jnp.bool_),
        step,
        n_centers=n_centers,
        iters=10,
        compactness=10.0,
        sigma=1.0,
        chunk=min(16384, h * w),
    )

    # Palette extraction + eps clustering at the quality preset.
    packed = U.pack_rgb(image_rgb.reshape(-1, 3))
    values, count, inverse = U.unique_packed_padded(packed, capacity=palette_cap)
    n = jnp.minimum(count, palette_cap)
    palette = U.unpack_rgb(values).astype(jnp.float32)
    valid = jnp.arange(palette_cap) < n
    params = cfg.clustering_params(1, quality)  # eps depends only on quality
    labels = CL.eps_components(
        palette, jnp.float32(params.eps), valid, None, chunk=min(512, palette_cap)
    )
    return {
        "edges": edges,
        "roi_seed": roi_seed,
        "segments": segments,
        "palette": palette,
        "palette_count": n,
        "palette_clusters": labels,
        "canny_low": low,
        "canny_high": high,
        "inverse": inverse,
    }


def batched_analysis_step(images: jax.Array, **kw):
    """vmapped device core over a batch of images (B, h, w, 3)."""
    return jax.vmap(lambda im: analysis_step(im, **kw))(images)
