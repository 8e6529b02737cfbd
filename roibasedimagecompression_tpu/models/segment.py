"""Region extraction and sub-region segmentation (split score + SLIC).

Rebuilds encoder/subregions/* and the region bookkeeping of encoder/ROI/roi.py:
regions are connected components of the ROI / non-ROI masks; each region gets a
split score (color + texture complexity) that sets its SLIC segment count
through the logistic window law; SLIC runs at a <= 500 px working resolution
and labels are upsampled back (slic.py:41-104).
"""

from __future__ import annotations

import dataclasses
import functools
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
from roibasedimagecompression_tpu.utils import dispatch as DISPATCH
from roibasedimagecompression_tpu.utils.timing import stage_timer


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


def fuse_adjacent_regions(regions: list, image_shape: tuple, kind: str) -> list:
    """Merge same-kind regions that touch (8-connectivity).

    fuse_adjacent_regions_optimized (encoder/ROI/roi.py:190-249): rasterize
    every region onto a shared canvas and re-extract connected components —
    regions whose masks are adjacent become one region.  Returns the input
    list unchanged when nothing fuses (the reference's early-out at :215-217).
    """
    if len(regions) <= 1:
        return regions
    combined = np.zeros(image_shape[:2], bool)
    for r in regions:
        minr, minc, maxr, maxc = r.bbox
        combined[minr:maxr, minc:maxc] |= r.bbox_mask
    fused = extract_regions(combined, kind)
    if len(fused) == len(regions):
        return regions
    return fused


def process_regions_with_reassignment(
    image_rgb: np.ndarray, roi_mask: np.ndarray, nonroi_mask: np.ndarray
):
    """Extract + bidirectionally reassign small regions + fuse adjacent ones.

    process_regions_with_reassignment (encoder/ROI/roi.py:109-188): small ROI
    regions become non-ROI AND small non-ROI regions become ROI (unlike the
    main-path reassignment which only demotes ROI), then each kind is fused.
    NOTE: this path's min size law counts PIXELS (roi.py:115-116), not h*w*3
    elements like the main path.
    """
    h, w = image_rgb.shape[:2]
    min_size = cfg.min_region_size(h * w)
    roi_regions = extract_regions(roi_mask, "roi")
    nonroi_regions = extract_regions(nonroi_mask, "nonroi")

    new_roi = [r for r in roi_regions if r.area >= min_size]
    new_nonroi = [
        dataclasses.replace(r, kind="nonroi")
        for r in roi_regions
        if r.area < min_size
    ]
    new_nonroi += [r for r in nonroi_regions if r.area >= min_size]
    new_roi += [
        dataclasses.replace(r, kind="roi")
        for r in nonroi_regions
        if r.area < min_size
    ]

    if len(new_roi) > 1:
        new_roi = fuse_adjacent_regions(new_roi, image_rgb.shape, "roi")
    if len(new_nonroi) > 1:
        new_nonroi = fuse_adjacent_regions(new_nonroi, image_rgb.shape, "nonroi")
    return new_roi, new_nonroi


class DeviceBatch:
    """Device-resident image batch + region-id rasters for in-graph crops.

    The tunneled chip uploads at ~41 MB/s with ~24 ms fixed cost per
    transfer (scripts/ceiling.py, round 4), so the old host-packed crop
    buckets (every bucket re-uploading its padded crops) were upload-bound.
    Instead the same-shape image batch and two region-id rasters (ROI and
    non-ROI regions can overlap in the 3-px buffer zone, extract_roi_nonroi
    roi.py:685-718 — hence one map per kind; uint8 when the batch has <255
    regions, uint16 otherwise) upload ONCE, zero-padded by 256 px on device
    so every bucket window is a clean dynamic_slice; each bucket's kernel
    gathers its own crops in-graph.  Zeroing beyond each region's bbox
    inside the window reproduces the host packing exactly (conv boundary
    parity).  The tier-1 device pair table (ops/pairs.py) reuses `img`, so
    batch pixels cross the tunnel exactly once per encode.
    """

    PAD = 256  # >= max bucket overshoot (score tiers step <= 256, SLIC < 128)

    def __init__(self, images: np.ndarray, reg_nonroi: np.ndarray,
                 reg_roi: np.ndarray, mesh=None):
        self.hw = images.shape[1:3]
        self.mesh = mesh
        img, ra, rb = _pad_device_batch(
            _replicated(images, mesh),
            _replicated(reg_nonroi, mesh),
            _replicated(reg_roi, mesh),
        )
        self.img, self.reg_a, self.reg_b = img, ra, rb
        self._t = None

    def transposed(self):
        if self._t is None:
            self._t = _transpose_device_batch(self.img, self.reg_a, self.reg_b)
        return self._t


def _replicated(x, mesh):
    if mesh is None:
        return jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(np.asarray(x), NamedSharding(mesh, P()))


@jax.jit
def _pad_device_batch(img, reg_a, reg_b):
    p = DeviceBatch.PAD
    return (
        jnp.pad(img, ((0, 0), (0, p), (0, p), (0, 0))),
        jnp.pad(reg_a, ((0, 0), (0, p), (0, p))),
        jnp.pad(reg_b, ((0, 0), (0, p), (0, p))),
    )


@jax.jit
def _transpose_device_batch(img, reg_a, reg_b):
    return (
        jnp.transpose(img, (0, 2, 1, 3)),
        jnp.transpose(reg_a, (0, 2, 1)),
        jnp.transpose(reg_b, (0, 2, 1)),
    )


def gather_crop_args(ids, sources, transposed_flags, mesh=None):
    """Stack per-row gather descriptors (img, top, left, h0, w0, rid, kind)
    into padded int32 arrays for the in-graph crop gather."""
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    rows = len(ids)
    cols = np.zeros((7, max(rows, 1)), np.int32)
    for row, i in enumerate(ids):
        k, top, left, h0, w0, rid, kind = sources[i]
        if transposed_flags[row]:
            top, left, h0, w0 = left, top, w0, h0
        cols[:, row] = (k, top, left, h0, w0, rid, kind)
    return cols


def _pow2_bucket(n: int, minimum: int = 64) -> int:
    """Shape-bucket a split-score dim: coarse tiers (256, 512, 768, 1024),
    then multiples of 64.

    Split-score compute is cheap (~25 ns/padded px on the chip) while every
    kernel launch costs ~35 ms through the tunnel — measured: a (64, 64)
    bucket took 39 ms, the (768, 512) bucket 131 ms.  Coarse tiers collapse
    the 14 per-batch buckets of the Kodak stream to ~3, trading ~200 ms of
    padded compute for ~400 ms of launches.  (SLIC keeps its fine 64-step
    grid: its Lloyd compute is ~10x costlier per padded pixel.)"""
    for tier in (256, 512, 768, 1024):
        if n <= tier:
            return tier
    return -(-n // 64) * 64


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


@jax.jit
def _split_score_batch(rgbs: jnp.ndarray, masks: jnp.ndarray):
    return jax.vmap(_split_score_jit)(rgbs, masks)


def _gather_crop(img_pad, reg_a, reg_b, k, top, left, h0, w0, rid, kind, ph, pw):
    """One (ph, pw) crop + region mask sliced from the padded device batch.

    The rgb window zeroes beyond the (h0, w0) bbox — identical layout to the
    host-packed buckets, so conv boundary behavior matches bit-for-bit."""
    crop = jax.lax.dynamic_slice(img_pad, (k, top, left, 0), (1, ph, pw, 3))[0]
    ra = jax.lax.dynamic_slice(reg_a, (k, top, left), (1, ph, pw))[0]
    rb = jax.lax.dynamic_slice(reg_b, (k, top, left), (1, ph, pw))[0]
    inb = (jnp.arange(ph)[:, None] < h0) & (jnp.arange(pw)[None, :] < w0)
    rgb = jnp.where(inb[..., None], crop, 0)
    mask = jnp.where(kind == 1, rb == rid, ra == rid) & inb
    return rgb, mask


@functools.partial(jax.jit, static_argnames=("ph", "pw"))
def _split_score_batch_gather(img_pad, reg_a, reg_b, rows, *, ph, pw):
    """rows: (bsz, 7) int32 [img, top, left, h0, w0, rid, kind] descriptors."""

    def one(r):
        rgb, mask = _gather_crop(
            img_pad, reg_a, reg_b, r[0], r[1], r[2], r[3], r[4], r[5], r[6],
            ph, pw,
        )
        return _split_score_jit(rgb, mask)

    return jax.vmap(one)(rows)


def _pad_batch(b: int, row_pixels: int = 0) -> int:
    """Batch padding: pow2 to 32, then multiples of 32.

    Coarser than the mult-of-4 policy on purpose: the split-score graph is
    by far the most expensive graph in the codec to compile remotely (~6 s
    server work per variant, vs ~1 s for SLIC/eps-CC/k-means), so its batch
    dimension gets the fewest distinct values — different batches of images
    then reuse the same compiled set.  Padded rows are ~25 ns/px of wasted
    kernel work and four floats of download each: noise.  Huge-row buckets
    (>= 2 MP per row — the 22 MP single-region case) still pad exactly: a
    padded row is a full image of wasted work there."""
    if row_pixels >= 2_000_000:
        return b
    p = 4
    while p < b and p < 32:
        p *= 2
    if p >= b:
        return p
    return -(-b // 32) * 32


def split_scores_many(
    crops: list, masks: list, mesh=None, sources: list | None = None,
    dbatch: DeviceBatch | None = None,
) -> list:
    """Batched split scores: one vmapped device call per shape bucket.

    With `sources`/`dbatch`, rows gather their crops in-graph from the
    device-resident batch (no per-bucket host packing or upload); rows whose
    sources entry is None use the host-packed path.

    Returns a list of (overall, color, texture) tuples; tiny regions
    (<100 px) score 0 (split_score.py:20-23 early-out).
    """
    n = len(crops)
    out: list = [None] * n
    if sources is None:
        sources = [None] * n
    # Orientation canonicalization (EXACT: every split-score statistic is
    # transpose-invariant — masked moments/histograms, isotropic Sobel
    # magnitudes, rotation-invariant-uniform LBP codes) halves the number of
    # compiled shape buckets.
    canon = []
    buckets: dict = {}
    for i in range(n):
        c, m = crops[i], masks[i]
        transposed = m.shape[1] > m.shape[0]
        if transposed:
            c = None if sources[i] is not None else np.ascontiguousarray(
                np.transpose(c, (1, 0, 2))
            )
            m = m.T
        elif sources[i] is not None:
            c = None
        canon.append((c, m, transposed))
        h, w = m.shape
        src = sources[i] is not None and dbatch is not None
        buckets.setdefault((_pow2_bucket(h), _pow2_bucket(w), src), []).append(i)
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    with stage_timer("seg.score"):
        # Dispatch every bucket's call first (JAX dispatch is async), then
        # collect — overlaps the per-call device round-trip latency across
        # buckets instead of serializing it.
        pending = []
        for (ph, pw, src), ids in buckets.items():
            if src:
                # Transposed rows slice the transposed batch (a different
                # static source orientation), so orientations dispatch
                # separately within the bucket.
                with stage_timer("score.dispatch"):
                    tflags = [canon[i][2] for i in ids]
                    rows = gather_crop_args(ids, sources, tflags, mesh)
                    for flag in (False, True):
                        sel = [r for r in range(len(ids)) if tflags[r] == flag]
                        if not sel:
                            continue
                        sub = np.zeros(
                            (SHARD.pad_rows(_pad_batch(len(sel), ph * pw), mesh), 7),
                            np.int32,
                        )
                        sub[: len(sel)] = rows[:, sel].T
                        img, ra, rb = (
                            dbatch.transposed() if flag
                            else (dbatch.img, dbatch.reg_a, dbatch.reg_b)
                        )
                        pending.append(
                            ([ids[r] for r in sel], DISPATCH.submit(
                                _split_score_batch_gather,
                                img, ra, rb, SHARD.shard_rows(sub, mesh),
                                ph=ph, pw=pw,
                            ))
                        )
                continue
            with stage_timer("score.pack"):
                bsz = SHARD.pad_rows(_pad_batch(len(ids), ph * pw), mesh)
                rgb_b = np.zeros((bsz, ph, pw, 3), np.uint8)
                mask_b = np.zeros((bsz, ph, pw), bool)
                for row, i in enumerate(ids):
                    c, m, _ = canon[i]
                    h, w = m.shape
                    rgb_b[row, :h, :w] = c
                    mask_b[row, :h, :w] = m
            with stage_timer("score.dispatch"):
                pending.append(
                    (ids, DISPATCH.submit(
                        _split_score_batch,
                        SHARD.shard_rows(rgb_b, mesh), SHARD.shard_rows(mask_b, mesh)
                    ))
                )
        with stage_timer("score.collect"):
            flat = SHARD.collect_all(
                [x for _, r in pending for x in r.result()]
            )
        for j, (ids, _) in enumerate(pending):
            overall, color, texture, count = flat[4 * j : 4 * j + 4]
            for row, i in enumerate(ids):
                if count[row] < 100:
                    out[i] = (0.0, 0.0, 0.0)
                else:
                    out[i] = (float(overall[row]), float(color[row]), float(texture[row]))
    return out


def split_score(bbox_rgb: np.ndarray, bbox_mask: np.ndarray):
    """(overall, color, texture) for a region crop; tiny regions score 0."""
    return split_scores_many([bbox_rgb], [bbox_mask])[0]


def optimal_segments_many(
    crops: list, masks: list, mesh=None, sources: list | None = None,
    dbatch: DeviceBatch | None = None,
) -> list:
    """Batched split score -> SLIC segment counts via the logistic window law
    (encoder/compression/subregions.py:133-138)."""
    scores = split_scores_many(crops, masks, mesh=mesh, sources=sources, dbatch=dbatch)
    return [
        cfg.logistic_segments(scores[i][0], cfg.segment_window(crops[i].size))
        for i in range(len(crops))
    ]


def optimal_segments(bbox_rgb: np.ndarray, bbox_mask: np.ndarray) -> int:
    """Split score -> SLIC segment count via the logistic window law
    (encoder/compression/subregions.py:133-138)."""
    return optimal_segments_many([bbox_rgb], [bbox_mask])[0]


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


def region_segments_many(
    crops: list,
    masks: list,
    n_segments: list,
    compactness: float = 10.0,
    sigma: float = 1.0,
    mesh=None,
    sources: list | None = None,
    dbatch: DeviceBatch | None = None,
) -> list:
    """Batched SLIC at <= 500 px working resolution, labels upsampled back
    (enhanced_slic_with_texture, slic.py:41-104).

    The working-resolution resize is host-side (small pixel counts, unbounded
    geometry variety); the SLIC kernel itself runs in shape-bucketed vmapped
    batches — one device call per bucket instead of one per region.

    Returns a list of (bh_i, bw_i) int32 label maps, 0 outside mask.
    """
    n = len(crops)
    if sources is None:
        sources = [None] * n
    work_imgs: list = [None] * n
    work_masks: list = [None] * n
    work_n: list = [0] * n
    work_src: list = [None] * n
    scaled = [False] * n
    out: list = [None] * n
    run_ids = []
    for i in range(n):
        h, w = masks[i].shape
        scale = cfg.slic_scale_factor(max(crops[i].shape))
        if scale < 1.0:
            nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
            small_mask = _resize_nearest(masks[i], (nh, nw))
            if not small_mask.any():
                out[i] = np.zeros((h, w), np.int32)
                continue
            work_imgs[i] = _resize_uint8(crops[i], (nh, nw))
            work_masks[i] = small_mask
            work_n[i] = max(1, math.ceil(n_segments[i] * scale * scale))
            scaled[i] = True
        else:
            # Unscaled rows can gather their crop in-graph from the
            # device-resident batch (PIL-resized rows cannot — the resized
            # pixels only exist on host).
            work_imgs[i] = crops[i]
            work_masks[i] = masks[i]
            work_n[i] = n_segments[i]
            work_src[i] = sources[i]
        run_ids.append(i)

    with stage_timer("seg.slic"):
        labels_small = SLIC.slic_many(
            [work_imgs[i] for i in run_ids],
            [work_masks[i] for i in run_ids],
            [work_n[i] for i in run_ids],
            compactness=compactness,
            sigma=sigma,
            mesh=mesh,
            sources=[work_src[i] for i in run_ids],
            dbatch=dbatch,
        )
    for pos, i in enumerate(run_ids):
        lab = labels_small[pos]
        if scaled[i]:
            lab = _resize_nearest(lab, masks[i].shape).astype(np.int32)
            # Upsampled labels can leak outside the full-res mask; clamp.
            lab[~masks[i]] = 0
        out[i] = lab
    return out


def region_segments(
    bbox_rgb: np.ndarray,
    bbox_mask: np.ndarray,
    n_segments: int,
    compactness: float = 10.0,
    sigma: float = 1.0,
) -> np.ndarray:
    """Single-region SLIC (see region_segments_many)."""
    return region_segments_many(
        [bbox_rgb], [bbox_mask], [n_segments],
        compactness=compactness, sigma=sigma,
    )[0]
