"""Masked SLIC superpixels as 5-D k-means on device.

Replaces the Cython skimage.segmentation.slic call at encoder/subregions/
slic.py:89-96: CIELAB color + spatial coordinates, compactness-scaled distance,
fixed Lloyd iterations, then connectivity enforcement (small fragments absorbed
into neighboring segments).  Unlike the original's per-center local windows,
assignment here is one dense (pixels x centers) distance computed in MXU matmul
form — center counts in this codec are small (<= ~100, the split-score window
law), so dense assignment is both simpler and faster on TPU.

Output convention matches masked skimage slic: labels are 1..n inside the mask,
0 outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV


@functools.partial(jax.jit, static_argnames=("n_centers", "iters"))
def _slic_assign(
    lab: jnp.ndarray,
    mask: jnp.ndarray,
    init_centers: jnp.ndarray,
    step: jnp.ndarray,
    compactness: float,
    n_centers: int,
    iters: int = 10,
) -> jnp.ndarray:
    """Lloyd iterations over 5-D features; returns (h, w) int32 center ids
    (0..n_centers-1) inside mask, -1 outside."""
    h, w, _ = lab.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # Classic SLIC distance: D^2 = dc^2 + (m/S)^2 * ds^2  (argmin-equivalent
    # to skimage's 1/m color scaling).
    ratio = compactness / step
    feats = jnp.concatenate(
        [
            lab.astype(jnp.float32),
            (yy * ratio)[..., None],
            (xx * ratio)[..., None],
        ],
        axis=-1,
    ).reshape(-1, 5)
    valid = mask.reshape(-1)

    def lloyd(_, centers):
        d2 = (
            jnp.sum(feats * feats, axis=1, keepdims=True)
            + jnp.sum(centers * centers, axis=1)[None, :]
            - 2.0
            * jax.lax.dot_general(
                feats, centers,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
        seg = jnp.where(valid, assign, n_centers)
        sums = jax.ops.segment_sum(
            jnp.where(valid[:, None], feats, 0.0), seg, num_segments=n_centers + 1
        )[:n_centers]
        counts = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=n_centers + 1
        )[:n_centers]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, lloyd, init_centers)
    d2 = (
        jnp.sum(feats * feats, axis=1, keepdims=True)
        + jnp.sum(centers * centers, axis=1)[None, :]
        - 2.0
        * jax.lax.dot_general(
            feats, centers,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return jnp.where(valid, assign, -1).reshape(h, w)


def _pow2(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def slic(
    image_rgb: np.ndarray,
    mask: np.ndarray,
    n_segments: int,
    compactness: float = 10.0,
    sigma: float = 1.0,
    iters: int = 10,
    enforce_connectivity: bool = True,
    min_size_factor: float = 0.5,
) -> np.ndarray:
    """Masked SLIC: (h, w, 3) uint8 + (h, w) bool -> (h, w) int32 labels
    (0 = outside mask, 1..n inside).

    Shapes are padded to power-of-two buckets (mask-padded, centers padded
    with unreachable sentinels) so the assignment kernel compiles once per
    bucket instead of once per region geometry.
    """
    mask = np.asarray(mask, bool)
    h0, w0 = mask.shape
    ph, pw = _pow2(h0), _pow2(w0)
    if (ph, pw) != (h0, w0):
        img_p = np.zeros((ph, pw, 3), np.uint8)
        img_p[:h0, :w0] = image_rgb
        mask_p = np.zeros((ph, pw), bool)
        mask_p[:h0, :w0] = mask
        return slic(
            img_p, mask_p, n_segments, compactness, sigma, iters,
            enforce_connectivity, min_size_factor,
        )[:h0, :w0]
    h, w = mask.shape
    area = int(mask.sum())
    if area == 0:
        return np.zeros((h, w), np.int32)
    n_segments = max(1, int(n_segments))

    lab = COL.rgb_to_lab(jnp.asarray(image_rgb))
    if sigma > 0:
        lab = CONV.gaussian_blur(lab, sigma)

    # Grid initialization at spacing S = sqrt(area / n), snapped into the mask.
    step = float(np.sqrt(area / n_segments))
    ys = np.arange(step / 2, h, step)
    xs = np.arange(step / 2, w, step)
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    grid_int = np.clip(np.round(grid).astype(np.int64), 0, [h - 1, w - 1])
    inside = mask[grid_int[:, 0], grid_int[:, 1]]
    if inside.any():
        centers_yx = grid_int[inside]
    else:
        # Snap every grid point to its nearest mask pixel.
        mask_yx = np.argwhere(mask)
        d = np.abs(mask_yx[None, :, 0] - grid_int[:, :1]).astype(np.float64) ** 2 + (
            np.abs(mask_yx[None, :, 1] - grid_int[:, 1:2]) ** 2
        )
        centers_yx = np.unique(mask_yx[np.argmin(d, axis=1)], axis=0)
    if len(centers_yx) > n_segments:
        # Keep a uniform subsample to hit the requested count.
        take = np.linspace(0, len(centers_yx) - 1, n_segments).astype(np.int64)
        centers_yx = centers_yx[np.unique(take)]
    n_centers = len(centers_yx)

    lab_np = np.asarray(lab)
    ratio = compactness / step
    init_centers = np.concatenate(
        [
            lab_np[centers_yx[:, 0], centers_yx[:, 1]],
            centers_yx.astype(np.float32) * ratio,
        ],
        axis=1,
    ).astype(np.float32)

    # Pad the center count to a power of two with unreachable sentinels so the
    # assignment kernel compiles per bucket, not per center count.
    n_pad = _pow2(n_centers, minimum=4)
    if n_pad != n_centers:
        sentinels = np.full((n_pad - n_centers, 5), 1e6, np.float32)
        init_centers = np.vstack([init_centers, sentinels])

    assign = _slic_assign(
        lab,
        jnp.asarray(mask),
        jnp.asarray(init_centers),
        jnp.float32(step),
        float(compactness),
        n_pad,
        iters,
    )
    labels = np.asarray(assign)

    if enforce_connectivity and n_centers > 1:
        labels = _enforce_connectivity(
            labels, mask, min_size=max(1, int(min_size_factor * area / n_centers))
        )

    # Compact to 1..n inside mask.
    out = np.zeros((h, w), np.int32)
    vals = labels[mask]
    uniq, inv = np.unique(vals, return_inverse=True)
    out[mask] = inv.astype(np.int32) + 1
    return out


def _enforce_connectivity(labels: np.ndarray, mask: np.ndarray, min_size: int) -> np.ndarray:
    """Split segments into connected fragments; absorb small ones into
    neighbors (skimage _enforce_label_connectivity_cython behavior)."""
    frag = np.asarray(
        CC.propagate_equal_labels(jnp.asarray(labels), jnp.asarray(mask), connectivity=4)
    )
    fg = mask
    vals = frag[fg]
    uniq, inv = np.unique(vals, return_inverse=True)
    sizes = np.bincount(inv)
    compact = np.zeros(labels.shape, np.int64)
    compact[fg] = inv
    keep_frag = sizes >= min_size
    if not keep_frag.any():
        keep_frag[np.argmax(sizes)] = True
    keep = np.zeros(labels.shape, bool)
    keep[fg] = keep_frag[inv]
    adopted = np.asarray(
        CC.adopt_labels(
            jnp.asarray(compact.astype(np.int32)),
            jnp.asarray(keep),
            jnp.asarray(mask),
        )
    )
    return adopted
