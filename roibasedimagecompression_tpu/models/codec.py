"""Top-level codec: encode() / decode() public API.

Pipeline (encoder/compression/test.py:77-151 driver structure):
  ROI mask pipeline -> region extraction -> per-region SLIC segmentation ->
  tier-1 per-segment palette clustering -> per-region canvas merge ->
  tier-2 per-group re-cluster (q2 = min(2q, 100)) ->
  tier-3 whole-image re-cluster (q3 = min(q2_roi + q2_nonroi, 100)) ->
  zlib container.

config.single_region short-circuits the ROI stage and treats the whole image
as one ROI region — the degenerate path the reference falls into when region
extraction fails (test.py:124-128).
"""

from __future__ import annotations

import numpy as np

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.io import container
from roibasedimagecompression_tpu.models import quantize as Q
from roibasedimagecompression_tpu.models import segment as SEG
from roibasedimagecompression_tpu.utils.timing import stage_timer


def _black_repair(pixels: np.ndarray) -> np.ndarray:
    """Replace black pixels inside a segment with the nearest non-black color.

    Reference semantics (encoder/compression/subregions.py:392-421): the
    "nearest" color to [0,0,0] is by L2 in color space, i.e. every black pixel
    receives the segment's darkest non-black color.
    """
    black = np.all(pixels == 0, axis=1)
    if not black.any():
        return pixels
    non_black = pixels[~black]
    if len(non_black) == 0:
        return pixels
    norms = (non_black.astype(np.int64) ** 2).sum(axis=1)
    darkest = non_black[np.argmin(norms)]
    out = pixels.copy()
    out[black] = darkest
    return out


def subregion_quantization(
    image_rgb: np.ndarray,
    regions: list,
    quality: float,
    config: cfg.CodecConfig,
) -> list:
    """Tier 1: per-region SLIC segmentation + per-segment palette clustering
    (encoder/compression/subregions.py:90-683).  Returns one merged Component
    per region."""
    h, w = image_rgb.shape[:2]
    out = []
    for region in regions:
        minr, minc, maxr, maxc = region.bbox
        crop = image_rgb[minr:maxr, minc:maxc]
        mask = region.bbox_mask

        n_seg = SEG.optimal_segments(crop, mask)
        labels = SEG.region_segments(
            crop, mask, n_seg,
            compactness=config.slic_compactness, sigma=config.slic_sigma,
        )

        comps = []
        for seg_id in range(1, int(labels.max()) + 1):
            seg_mask = labels == seg_id
            if not seg_mask.any():
                continue
            rows = np.flatnonzero(seg_mask.any(axis=1))
            cols = np.flatnonzero(seg_mask.any(axis=0))
            pad = config.segment_pad
            r0 = max(0, rows[0] - pad)
            r1 = min(crop.shape[0] - 1, rows[-1] + pad)
            c0 = max(0, cols[0] - pad)
            c1 = min(crop.shape[1] - 1, cols[-1] + pad)

            seg_crop_mask = seg_mask[r0 : r1 + 1, c0 : c1 + 1]
            bbox_crop = crop[r0 : r1 + 1, c0 : c1 + 1]
            seg_img = np.zeros_like(bbox_crop)
            seg_img[seg_crop_mask] = _black_repair(bbox_crop[seg_crop_mask])

            comp = Q.from_pixels(seg_img, (minr + r0, minc + c0))
            comp = Q.cluster_component(comp, quality, seed=config.seed)
            comps.append(comp)

        if not comps:
            continue
        if len(comps) > 1:
            out.append(Q.merge_components(comps, region.bbox))
        else:
            out.append(comps[0])
    return out


def _extract_and_assign(image_rgb, roi_mask, nonroi_mask, config, min_size):
    """Region extraction + reassignment, with the optional fusion pass.

    Default: main-path extract + small-ROI demotion (roi.py:45-103).  With
    config.region_fusion: the alternative bidirectional-reassign + adjacency
    fusion (roi.py:109-249)."""
    if config.region_fusion:
        return SEG.process_regions_with_reassignment(
            image_rgb, roi_mask, nonroi_mask
        )
    roi_regions = SEG.extract_regions(roi_mask, "roi")
    nonroi_regions = SEG.extract_regions(nonroi_mask, "nonroi")
    return SEG.reassign_small_roi(roi_regions, nonroi_regions, min_size)


def build_segment_maps_many(
    images: list,
    regions_per_image: list,
    config: cfg.CodecConfig,
    mesh=None,
    return_dbatch: bool = False,
) -> list:
    """Rasterize per-region SLIC segments into global (h, w) id maps — for a
    whole BATCH of images in shape-bucketed device calls.

    Args:
      images: list of (h, w, 3) uint8 images.
      regions_per_image: list of (roi_regions, nonroi_regions) tuples.
    Returns:
      list of (seg_map, seg_quality (n+1,), seg_group (n+1,)) per image,
      with 1=roi, 2=nonroi group ids.  ROI regions rasterize last so they win
      buffer-zone overlaps (tier-3 merge order: ROI component first => ROI
      wins, image.py:246-254).

    All regions of all images pool into the same split-score and SLIC batches
    (one vmapped call per shape bucket) — the round-1 per-region loop cost
    14 of 31.7 s/image; this is the VERDICT round-2 item 1 fix.
    """
    flat_regions = []  # (image_idx, region), nonroi first then roi per image
    for k, (roi_regions, nonroi_regions) in enumerate(regions_per_image):
        for region in list(nonroi_regions) + list(roi_regions):
            flat_regions.append((k, region))

    crops = []
    masks = []
    for k, region in flat_regions:
        minr, minc, maxr, maxc = region.bbox
        crops.append(images[k][minr:maxr, minc:maxc])
        masks.append(region.bbox_mask)

    # Device-resident crop sources: upload the batch + per-kind region-id
    # rasters ONCE; split-score and unscaled SLIC buckets gather their crops
    # in-graph (the host-packed buckets were upload-bound through the
    # tunnel).  Requires same-shape images and uint16 region ids.
    dbatch = None
    sources = None
    shapes = {im.shape for im in images}
    if len(shapes) == 1 and 0 < len(flat_regions) < 65535:
        h, w = images[0].shape[:2]
        # Narrowest raster dtype that fits: the tunnel moves ~41 MB/s, so a
        # u8 raster pair saves ~6 MB of upload per 8-image batch (the usual
        # case — a batch rarely exceeds 254 regions).
        reg_dtype = np.uint8 if len(flat_regions) < 255 else np.uint16
        reg_a = np.zeros((len(images), h, w), reg_dtype)  # nonroi regions
        reg_b = np.zeros((len(images), h, w), reg_dtype)  # roi regions
        sources = []
        for j, (k, region) in enumerate(flat_regions):
            minr, minc, maxr, maxc = region.bbox
            kind = 1 if region.kind == "roi" else 0
            target = reg_b if kind else reg_a
            view = target[k, minr:maxr, minc:maxc]
            view[region.bbox_mask] = j + 1
            sources.append(
                (k, minr, minc, maxr - minr, maxc - minc, j + 1, kind)
            )
        with stage_timer("seg.upload"):
            dbatch = SEG.DeviceBatch(
                np.stack([np.asarray(im, np.uint8) for im in images]),
                reg_a, reg_b, mesh=mesh,
            )

    n_segs = SEG.optimal_segments_many(
        crops, masks, mesh=mesh, sources=sources, dbatch=dbatch
    )
    labels_list = SEG.region_segments_many(
        crops, masks, n_segs,
        compactness=config.slic_compactness, sigma=config.slic_sigma,
        mesh=mesh, sources=sources, dbatch=dbatch,
    )

    results = []
    pos = 0
    for k, (roi_regions, nonroi_regions) in enumerate(regions_per_image):
        h, w = images[k].shape[:2]
        seg_map = np.zeros((h, w), np.int32)
        qualities = [0.0]
        groups = [0]
        next_id = 1
        for region in list(nonroi_regions) + list(roi_regions):
            labels = labels_list[pos]
            pos += 1
            n_local = int(labels.max())
            if n_local == 0:
                continue
            minr, minc, maxr, maxc = region.bbox
            view = seg_map[minr:maxr, minc:maxc]
            sel = labels > 0
            view[sel] = labels[sel] + (next_id - 1)
            q = config.roi_quality if region.kind == "roi" else config.nonroi_quality
            g = 1 if region.kind == "roi" else 2
            qualities.extend([q] * n_local)
            groups.extend([g] * n_local)
            next_id += n_local
        results.append(
            (seg_map, np.asarray(qualities, np.float64), np.asarray(groups, np.int32))
        )
    if return_dbatch:
        # The device-resident batch (images + rasters) is reusable by the
        # tier-1 device pair table — same pixels, zero extra upload.
        return results, dbatch
    return results


def build_segment_map(
    image_rgb: np.ndarray,
    roi_regions: list,
    nonroi_regions: list,
    config: cfg.CodecConfig,
):
    """Single-image segment map (see build_segment_maps_many)."""
    return build_segment_maps_many(
        [image_rgb], [(roi_regions, nonroi_regions)], config
    )[0]


def _cluster_color_map(
    colors_rgb: np.ndarray, sel: np.ndarray, quality: float, seed: int,
    weighted: bool = True,
):
    """Cluster the palette of colors_rgb[sel] (+ pinned black) and map them.

    Returns (mapped_colors (n_sel, 3) uint8) — the tier-2/3 re-cluster applied
    as a per-pixel color substitution (canvas-merge collapse; see
    quantize_batched module docstring).
    """
    from roibasedimagecompression_tpu.ops import unique as U

    pixels = colors_rgb[sel]
    palette, idx = U.unique_colors(pixels)
    if not (palette == 0).all(axis=1).any():
        # Canvas background black is part of the merged palette
        # (merging.py:42-44) and feeds the n_colors law.
        palette = np.vstack([np.zeros((1, 3), np.uint8), palette])
        idx = idx + 1
    weights = np.bincount(idx, minlength=len(palette)) if weighted else None
    new_palette, mapping = Q.cluster_palette(
        palette, quality, seed=seed, weights=weights
    )
    return new_palette[mapping[idx]]


def tiers23_colors_many(t1_list: list, group_map_list: list, config: cfg.CodecConfig, mesh=None):
    """Tier-2 + tier-3 color maps for a batch of images in TWO batched calls.

    Every image's per-group tier-2 clustering problems pool into one
    cluster_color_maps_many call; tier-3 (which consumes tier-2) pools into a
    second.  Replaces the per-image, per-group _cluster_color_map loop.

    Returns (t2_list, t3_list) of (h, w, 3) uint8 color maps.
    """
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    # ---- tier 2: one problem per (image, group) -----------------------------
    colors_in, sels, quals, owner = [], [], [], []
    for k, (t1, gm) in enumerate(zip(t1_list, group_map_list)):
        for g, q2 in ((1, config.roi_tier2_quality), (2, config.nonroi_tier2_quality)):
            sel = gm == g
            if sel.any():
                colors_in.append(t1)
                sels.append(sel)
                quals.append(q2)
                owner.append(k)
    t2_list = [np.zeros_like(t1) for t1 in t1_list]
    if colors_in:
        QB.cluster_color_maps_many(
            colors_in, sels, quals, seed=config.seed,
            weighted=config.weighted_palette, mesh=mesh,
            out_list=[t2_list[k] for k in owner],
            split_method=config.split_method,
            split_margin=config.split_margin,
            weighted_split=config.weighted_split,
        )

    # ---- optional black-hole fill before tier 3 (image.py:259 call point) ---
    if config.fill_black_holes > 0:
        from roibasedimagecompression_tpu.models import holes as HOLES

        t2_list = [
            HOLES.fill_black_holes(t2, config.fill_black_holes) for t2 in t2_list
        ]

    # ---- tier 3: one problem per image --------------------------------------
    colors_in, sels, owner = [], [], []
    for k, (t2, gm) in enumerate(zip(t2_list, group_map_list)):
        sel = gm > 0
        if config.fill_black_holes > 0:
            # Filled pixels join the tier-3 clustering problem even when they
            # sit outside every region (the reference clusters the whole
            # merged canvas, filled holes included).
            sel = sel | (t2 != 0).any(axis=-1)
        if sel.any():
            colors_in.append(t2)
            sels.append(sel)
            owner.append(k)
    t3_list = [np.zeros_like(t2) for t2 in t2_list]
    if colors_in:
        QB.cluster_color_maps_many(
            colors_in, sels, [config.image_quality] * len(colors_in),
            seed=config.seed, weighted=config.weighted_palette, mesh=mesh,
            out_list=[t3_list[k] for k in owner],
            split_method=config.split_method, split_margin=config.split_margin,
            weighted_split=config.weighted_split,
        )
    return t2_list, t3_list


def _pow2_refit(n: int, minimum: int = 64) -> int:
    """pow2 bucket for the refit table's per-image stride (bounds the
    _refit_sums compile count across palette sizes)."""
    p = minimum
    while p < n:
        p *= 2
    return p


def _apply_refit_sums(palette: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Finish the device refit: rows = (len(palette), 4) int32
    [count, sum_r, sum_g, sum_b] — same frozen-black law and f64
    round(sums/count) as refine.refit_pixels, so the result is
    bit-identical to the host bincount path."""
    pal = np.asarray(palette, np.uint8)
    if len(pal) == 0:
        return pal.copy()
    frozen = (pal == 0).all(axis=1)
    if bool(frozen.all()):
        return pal.copy()
    cnt = rows[:, 0].astype(np.int64)
    sums = rows[:, 1:4].astype(np.float64)
    upd = (~frozen) & (cnt > 0)
    out = pal.copy()
    out[upd] = np.round(sums[upd] / cnt[upd, None]).astype(np.uint8)
    return out


def tiers23_palette_indices(
    table: dict,
    seg_group: np.ndarray,
    image_of_seg: np.ndarray,
    n_images: int,
    shape: tuple,
    config: cfg.CodecConfig,
    mesh=None,
    refit_originals: np.ndarray | None = None,
) -> list:
    """Tiers 2/3 + final palette, composed on the tier-1 CLUSTER table.

    The canvas-merge pipeline (reference encoder/compression/merging.py +
    clustering.py re-reading every merged canvas) collapses algebraically:
    each tier-1 cluster paints one uint8 color, so the tier-2 problem's
    palette is exactly the unique (problem, color) set over cluster colors,
    tier-3's the unique (image, tier-2 color) set, and the final palette the
    unique tier-3 colors — all tables of cluster-count length (thousands),
    never pixel-count length.  Pixels are touched exactly once here: the
    final palette-index paint.

    Args:
      table: tier1_table output for the TALL stacked image (images
        concatenated along rows).
      seg_group: (n_seg_total+1,) int group id per global segment (1=roi,
        2=nonroi).
      image_of_seg: (n_seg_total+1,) int image index per global segment.
      n_images: number of images in the stack.
      shape: (h, w) of one image.
      refit_originals: optional (b, h, w, 3) uint8 original images.  When
        given and the config enables the zero-rate palette refit, the
        returned palettes are ALREADY refitted (models/refine.refit_pixels
        semantics, bit-identical): the device-pair path accumulates the
        count/RGB-sum table on device (ops/pairs._refit_sums) so the host
        bincount chain drops out; the host-paint path falls back to
        refit_pixels.  Callers passing this must skip their own
        maybe_refit (refit is idempotent, but doubled host work defeats
        the point).
    Returns:
      list of (palette (m, 3) uint8, indices (h, w) minimal unsigned dtype)
      per image — identical to unique_colors over the tier-3 canvas of the
      per-pixel path.
    """
    from roibasedimagecompression_tpu.io import container as C
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    h, w = shape
    b = n_images
    cop = table["cluster_of_pair"]
    cluster_colors = table["cluster_colors"]
    n_clusters = len(cluster_colors)

    with stage_timer("t23.compose"):
        # Per-cluster attributes (a tier-1 cluster never spans segments).
        seg_of_cluster = np.zeros(n_clusters, np.int64)
        seg_of_cluster[cop] = table["seg_of_pair"]
        w_cluster = np.bincount(
            cop, weights=table["pair_weights"], minlength=n_clusters
        )
        img_of_cluster = image_of_seg[seg_of_cluster].astype(np.int64)
        grp_of_cluster = seg_group[seg_of_cluster].astype(np.int64)
        packed1 = (
            (cluster_colors[:, 0].astype(np.int64) << 16)
            | (cluster_colors[:, 1].astype(np.int64) << 8)
            | cluster_colors[:, 2].astype(np.int64)
        )

        # ---- tier 2: one problem per (image, group) ------------------------
        prob2 = img_of_cluster * 2 + (grp_of_cluster - 1)
        uniq2, inv2 = QB._unique_inverse(prob2 << 24 | packed1)
        w2 = np.bincount(inv2, weights=w_cluster)
        qual2 = [
            config.roi_tier2_quality if p % 2 == 0 else config.nonroi_tier2_quality
            for p in range(2 * b)
        ]
    out2 = QB.cluster_pair_table(
        uniq2, w2, qual2,
        seed=config.seed, mesh=mesh, split_method=config.split_method,
        split_margin=config.split_margin,
        weighted_split=config.weighted_split,
        weighted=config.weighted_palette,
    )
    with stage_timer("t23.compose"):
        c2_packed = (
            (out2[:, 0].astype(np.int64) << 16)
            | (out2[:, 1].astype(np.int64) << 8)
            | out2[:, 2].astype(np.int64)
        )[inv2]

        # ---- tier 3: one problem per image ---------------------------------
        uniq3, inv3 = QB._unique_inverse(img_of_cluster << 24 | c2_packed)
        w3 = np.bincount(inv3, weights=w_cluster)
    out3 = QB.cluster_pair_table(
        uniq3, w3,
        [config.image_quality] * b, seed=config.seed, mesh=mesh,
        split_method=config.split_method, split_margin=config.split_margin,
        weighted_split=config.weighted_split,
        weighted=config.weighted_palette,
    )
    with stage_timer("t23.compose"):
        c3_packed = (
            (out3[:, 0].astype(np.int64) << 16)
            | (out3[:, 1].astype(np.int64) << 8)
            | out3[:, 2].astype(np.int64)
        )[inv3]

        # ---- final palette per image (unique_colors semantics) -------------
        uniq4, inv4 = QB._unique_inverse(img_of_cluster << 24 | c3_packed)
        img4 = (uniq4 >> 24).astype(np.int64)
        col4 = uniq4 & 0xFFFFFF
        starts4 = np.searchsorted(img4, np.arange(b + 1))
        # Background black: pixels outside every segment stay black, joining
        # the palette exactly when the image has any (or a tier-3 color is
        # already black).
        mask = table["mask"]
        bg_counts = (h * w) - mask.reshape(b, h * w).sum(axis=1)
        sizes4 = np.diff(starts4)
        first_is_black = np.zeros(b, bool)
        nonempty = sizes4 > 0
        first_is_black[nonempty] = col4[starts4[:-1][nonempty]] == 0
        add_black = (bg_counts > 0) & ~first_is_black
        # Final index of each cluster: rank within its image's palette.
        idx_of_cluster = (
            inv4 - starts4[:-1][img_of_cluster] + add_black[img_of_cluster]
        ).astype(np.int64)

        results = []
        for i in range(b):
            pal_packed = col4[starts4[i] : starts4[i + 1]]
            if add_black[i]:
                pal_packed = np.concatenate([[0], pal_packed])
            palette = np.stack(
                [
                    (pal_packed >> 16) & 0xFF,
                    (pal_packed >> 8) & 0xFF,
                    pal_packed & 0xFF,
                ],
                axis=1,
            ).astype(np.uint8)
            results.append(palette)

        # ---- global palette refinement (models/refine.py) ------------------
        # Lloyd on the (cluster color, pixel mass) table against the final
        # palette: exactly the pixel-MSE objective (bias-variance split),
        # bit-identical to the canvas form's unique-color rows.
        from roibasedimagecompression_tpu.models import refine as RF

        refine_iters = RF.effective_iters(config)
        if refine_iters > 0:
            with stage_timer("t23.refine"):
                for i in range(b):
                    sel = img_of_cluster == i
                    if not sel.any():
                        continue
                    new_pal, assign = RF.refine_palette(
                        cluster_colors[sel], w_cluster[sel], results[i],
                        refine_iters,
                    )
                    results[i] = new_pal
                    idx_of_cluster[sel] = assign

        # ---- the ONE pixel pass: paint palette indices ---------------------
        from roibasedimagecompression_tpu import native

        idx_of_pair = idx_of_cluster[cop].astype(np.int32)
        inverse = table["inverse"]
        do_refit = refit_originals is not None and RF.effective_refit(config)
        out = []
        if inverse is None:
            # Device-pair path: the pixel -> pair mapping lives on device;
            # one gather + scatter paints the final indices and only the
            # narrow per-pixel index map (u8/u16) crosses the tunnel.
            refit_bins = None
            # int32 sums stay exact only while 255 * hw < 2^31 (refine.py
            # exactness contract); bigger images fall back to host refit.
            if do_refit and 255 * h * w < 2**31:
                k_pad = _pow2_refit(max(len(p) for p in results))
                refit_bins = (b, h * w, k_pad)
            painted = table["device_pairs"].paint(
                idx_of_pair, table["repair_remap"], refit_bins=refit_bins
            )
            if refit_bins is not None:
                flat, sums = painted
                for i in range(b):
                    results[i] = _apply_refit_sums(
                        results[i], sums[i * k_pad : i * k_pad + len(results[i])]
                    )
            else:
                flat = painted
            for i in range(b):
                pal = results[i]
                dt = C.min_index_dtype(max(len(pal) - 1, 0))
                idx_map = flat[i * h * w : (i + 1) * h * w].reshape(h, w)
                if refit_bins is None and do_refit:
                    pal = RF.refit_pixels(refit_originals[i], pal, idx_map)
                out.append((pal, idx_map.astype(dt, copy=False)))
            return out
        n_masked = (h * w) - bg_counts
        offs = np.concatenate([[0], np.cumsum(n_masked)])
        for i in range(b):
            pal = results[i]
            dt = C.min_index_dtype(max(len(pal) - 1, 0))
            idx_map = np.zeros((h, w), dt)
            inv_i = inverse[offs[i] : offs[i + 1]]
            mask_i = mask[i * h : (i + 1) * h]
            if not native.paint_masked_indices(idx_of_pair, inv_i, mask_i, idx_map):
                idx_map.reshape(-1)[np.flatnonzero(mask_i.ravel())] = idx_of_pair[
                    inv_i
                ].astype(dt)
            if do_refit:
                pal = RF.refit_pixels(refit_originals[i], pal, idx_map)
            out.append((pal, idx_map))
    return out


def _coerce_rgb(image: np.ndarray) -> np.ndarray:
    """Accept (h, w), (h, w, 1), (h, w, 3) or (h, w, 4) uint8 input."""
    image = np.asarray(image, dtype=np.uint8)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    elif image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    elif image.shape[-1] == 4:
        image = image[..., :3]
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError(f"expected an RGB image, got shape {image.shape}")
    return np.ascontiguousarray(image)


def encode_batched(image_rgb: np.ndarray, config: cfg.CodecConfig) -> bytes:
    """Batched encode path: device-bucketed tier-1, color-map tiers 2/3."""
    from roibasedimagecompression_tpu.io import container as C
    from roibasedimagecompression_tpu.models import quantize_batched as QB
    from roibasedimagecompression_tpu.ops import unique as U

    image_rgb = _coerce_rgb(image_rgb)
    h, w = image_rgb.shape[:2]
    min_size = cfg.min_region_size(image_rgb.size)

    with stage_timer("roi"):
        if config.single_region:
            roi_regions = [
                SEG.Region(
                    bbox=(0, 0, h, w),
                    bbox_mask=np.ones((h, w), bool),
                    area=h * w,
                    kind="roi",
                )
            ]
            nonroi_regions = []
        else:
            from roibasedimagecompression_tpu.models import roi_fused as ROI
            from roibasedimagecompression_tpu.ops import canny as CANNY

            if config.fast_edges:
                # Same reduced-candidate law as the batched frontend
                # (stream.py) — the preset knob was silently ignored here,
                # which broke single==batched parity for fast-edges configs.
                lows, highs = CANNY.fast_thresholds_many(
                    image_rgb[None]
                )
                low, high = float(lows[0]), float(highs[0])
            else:
                low, high = CANNY.select_thresholds_pair(image_rgb)
            roi_mask, nonroi_mask = ROI.roi_masks_fast(image_rgb, config, low, high)
            roi_regions, nonroi_regions = _extract_and_assign(
                image_rgb, roi_mask, nonroi_mask, config, min_size
            )

    with stage_timer("segment"):
        seg_map, seg_quality, seg_group = build_segment_map(
            image_rgb, roi_regions, nonroi_regions, config
        )

    with stage_timer("tier1"):
        table = QB.tier1_table(
            image_rgb, seg_map, seg_quality, seed=config.seed,
            weighted=config.weighted_palette,
            split_method=config.split_method,
            split_margin=config.split_margin,
            weighted_split=config.weighted_split,
        )

    import os as _os

    with stage_timer("tier23"):
        if (
            config.fill_black_holes > 0
            or table is None
            or _os.environ.get("RHCCQ_CANVAS_TIERS") == "1"
        ):
            # Canvas path: hole filling edits the tier-2 canvas; an empty
            # table means an all-background image.
            t1 = np.zeros_like(image_rgb)
            if table is not None:
                from roibasedimagecompression_tpu import native as NATIVE

                if not NATIVE.paint_masked_colors(
                    table["cluster_colors"], table["cluster_of_pair"],
                    table["inverse"], table["mask"], t1,
                ):
                    t1[table["mask"]] = table["cluster_colors"][
                        table["cluster_of_pair"][table["inverse"]]
                    ]
            group_map = seg_group[seg_map]
            t2_list, t3_list = tiers23_colors_many([t1], [group_map], config)
            t3 = t3_list[0]
            palette, indices = U.unique_colors(t3.reshape(-1, 3))
            indices = indices.reshape(h, w)
            from roibasedimagecompression_tpu.models import refine as RF

            if RF.effective_iters(config) > 0:
                palette, indices = RF.refine_canvas(
                    t1, palette, RF.effective_iters(config)
                )
        else:
            image_of_seg = np.zeros(len(seg_quality), np.int32)
            ((palette, indices),) = tiers23_palette_indices(
                table, seg_group, image_of_seg, 1, (h, w), config
            )
        from roibasedimagecompression_tpu.models import refine as RF

        palette = RF.maybe_refit(image_rgb, palette, indices, config)

    with stage_timer("container"):
        return C.pack(palette, indices, level=config.container_level)


def encode_debug(image_rgb: np.ndarray, config: cfg.CodecConfig | None = None) -> dict:
    """Encode while exposing every intermediate tier (the reference's
    show_reconstruction_result / partial_decompress debug surface,
    subregions.py:459, regions.py:75, image.py:296).

    Returns dict with 'roi_mask', 'nonroi_mask', 'seg_map', 'tier1', 'tier2',
    'tier3' (RGB images), and 'data' (.rhccq bytes).
    """
    from roibasedimagecompression_tpu.io import container as C
    from roibasedimagecompression_tpu.models import quantize_batched as QB
    from roibasedimagecompression_tpu.ops import unique as U

    config = config or cfg.CodecConfig()
    image_rgb = np.ascontiguousarray(np.asarray(image_rgb, dtype=np.uint8))
    h, w = image_rgb.shape[:2]
    min_size = cfg.min_region_size(image_rgb.size)

    if config.single_region:
        roi_mask = np.ones((h, w), bool)
        nonroi_mask = np.zeros((h, w), bool)
        roi_regions = [
            SEG.Region(bbox=(0, 0, h, w), bbox_mask=roi_mask.copy(), area=h * w, kind="roi")
        ]
        nonroi_regions = []
    else:
        from roibasedimagecompression_tpu.models import roi_fused as ROI

        roi_mask, nonroi_mask = ROI.roi_masks(image_rgb, config)
        roi_regions, nonroi_regions = _extract_and_assign(
            image_rgb, roi_mask, nonroi_mask, config, min_size
        )

    seg_map, seg_quality, seg_group = build_segment_map(
        image_rgb, roi_regions, nonroi_regions, config
    )
    t1 = QB.tier1_colors(
        image_rgb, seg_map, seg_quality, seed=config.seed,
        weighted=config.weighted_palette, split_method=config.split_method,
        split_margin=config.split_margin,
        weighted_split=config.weighted_split,
    )
    group_map = np.where(seg_map > 0, seg_group[seg_map], 0)
    t2_list, t3_list = tiers23_colors_many([t1], [group_map], config)
    t2, t3 = t2_list[0], t3_list[0]
    palette, indices = U.unique_colors(t3.reshape(-1, 3))
    indices = indices.reshape(h, w)
    from roibasedimagecompression_tpu.models import refine as RF

    if RF.effective_iters(config) > 0:
        palette, indices = RF.refine_canvas(t1, palette, RF.effective_iters(config))
    palette = RF.maybe_refit(image_rgb, palette, indices, config)
    return {
        "roi_mask": roi_mask,
        "nonroi_mask": nonroi_mask,
        "seg_map": seg_map,
        "tier1": t1,
        "tier2": t2,
        "tier3": t3,
        "data": C.pack(palette, indices, level=config.container_level),
    }


def encode(image_rgb: np.ndarray, config: cfg.CodecConfig | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image to .rhccq bytes."""
    config = config or cfg.CodecConfig()
    if config.batched:
        return encode_batched(image_rgb, config)
    image_rgb = np.ascontiguousarray(np.asarray(image_rgb, dtype=np.uint8))
    h, w = image_rgb.shape[:2]
    min_size = cfg.min_region_size(image_rgb.size)

    with stage_timer("roi"):
        if config.single_region:
            roi_regions = [
                SEG.Region(
                    bbox=(0, 0, h, w),
                    bbox_mask=np.ones((h, w), bool),
                    area=h * w,
                    kind="roi",
                )
            ]
            nonroi_regions = []
        else:
            from roibasedimagecompression_tpu.models import roi as ROI

            roi_mask, nonroi_mask = ROI.roi_masks(image_rgb, config)
            roi_regions, nonroi_regions = _extract_and_assign(
                image_rgb, roi_mask, nonroi_mask, config, min_size
            )

    with stage_timer("tier1"):
        roi_comps = subregion_quantization(
            image_rgb, roi_regions, config.roi_quality, config
        )
        nonroi_comps = subregion_quantization(
            image_rgb, nonroi_regions, config.nonroi_quality, config
        )

    with stage_timer("tier2"):
        image_components = []
        if roi_comps:
            image_components.append(
                Q.region_quantization(
                    roi_comps, h, w, config.roi_tier2_quality, seed=config.seed
                )
            )
        if nonroi_comps:
            image_components.append(
                Q.region_quantization(
                    nonroi_comps, h, w, config.nonroi_tier2_quality, seed=config.seed
                )
            )

    with stage_timer("tier3"):
        final = Q.quantize_image(
            image_components, h, w, config.image_quality, seed=config.seed
        )

    with stage_timer("container"):
        palette, indices = final.palette, final.indices
        from roibasedimagecompression_tpu.models import refine as RF

        if RF.effective_iters(config) > 0:
            # The tier-1 canvas is the merge of all tier-1 components
            # (first-wins, black never writes — identical to the batched
            # path's masked cluster paint).
            t1 = Q.merge_components(
                roi_comps + nonroi_comps, (0, 0, h, w)
            ).to_rgb()
            palette, indices = RF.refine_canvas(
                t1, palette, RF.effective_iters(config)
            )
        palette = RF.maybe_refit(image_rgb, palette, indices, config)
        return container.pack(palette, indices, level=config.container_level)


def decode(source) -> np.ndarray:
    """Decode .rhccq bytes or a file path to (h, w, 3) uint8 RGB."""
    if isinstance(source, (bytes, bytearray)):
        return container.unpack(bytes(source)).to_rgb()
    return container.decode_file(source)
