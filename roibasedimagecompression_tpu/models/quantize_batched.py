"""Batched tier-1 quantization: every segment's palette clustered in a handful
of device calls.

The reference loops segment-by-segment (encoder/compression/subregions.py:315,
one DBSCAN + thread-pool splits per segment).  On TPU that becomes hundreds of
tiny dispatches; instead this module exploits two facts:

  1. Segments are disjoint and black pixels never write during canvas merges,
     so tier-1 + per-region merge + tier-2 merge is equivalent to a per-pixel
     map: each pixel takes its own segment's quantized color (merging.py
     semantics collapse — see models/quantize.py for the canvas form).
  2. eps-graph clustering with a group id per point is block-diagonal, so
     MANY segment palettes concatenate into one padded batch and cluster under
     vmap; oversized-cluster k-means splitting batches the same way,
     level-synchronously.

Pipeline per image: (segment_id, packed_color) pair extraction -> black repair
-> bucketed vmapped eps-components / k-means -> level-synchronous batched
splits -> per-cluster mean colors -> per-pixel tier-1 color map.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.ops import cluster as CL

_BUCKETS = (64, 256, 1024, 4096, 9999)  # eps-CC path caps (>=10k goes to k-means)


def _pairs(image_rgb: np.ndarray, seg_map: np.ndarray):
    """Unique (segment, color) pairs + per-pixel inverse.

    Returns (seg_of_pair, color_of_pair (packed int64 free repr), inverse)
    over pixels with seg_map > 0.
    """
    mask = seg_map > 0
    packed = (
        (image_rgb[..., 0].astype(np.int64) << 16)
        | (image_rgb[..., 1].astype(np.int64) << 8)
        | image_rgb[..., 2].astype(np.int64)
    )
    key = seg_map.astype(np.int64) << 24 | packed
    flat = key[mask]
    uniq, inverse = np.unique(flat, return_inverse=True)
    seg_of_pair = (uniq >> 24).astype(np.int32)
    color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
    return seg_of_pair, color_of_pair, inverse.astype(np.int64), mask


def _unpack(colors_packed: np.ndarray) -> np.ndarray:
    return np.stack(
        [
            (colors_packed >> 16) & 0xFF,
            (colors_packed >> 8) & 0xFF,
            colors_packed & 0xFF,
        ],
        axis=1,
    ).astype(np.uint8)


def _black_repair_pairs(seg_of_pair, color_of_pair, inverse):
    """Per-segment black repair on the pair table.

    Black pixels take the segment's darkest non-black color (the reference's
    'nearest to [0,0,0]' rule, subregions.py:392-421).  Returns updated
    (seg_of_pair, color_of_pair, inverse) with black pairs dropped in segments
    that have non-black colors.
    """
    rgb = _unpack(color_of_pair).astype(np.int64)
    norm2 = (rgb**2).sum(axis=1)
    is_black = color_of_pair == 0
    n_seg = int(seg_of_pair.max()) + 1 if len(seg_of_pair) else 1

    # Darkest non-black pair index per segment (key = norm2 << 44 | pair id).
    # norm2 < 3*255^2 < 2^18, so the key fits int64 for tables up to 2^44
    # pairs (the 1k-image stream path concatenates all images' pairs — a u24
    # color x 2^20 segments bound keeps any realistic table far below that).
    if len(seg_of_pair) >= (1 << 44):
        raise ValueError(f"pair table too large: {len(seg_of_pair)}")
    sentinel = np.iinfo(np.int64).max
    order_key = np.where(
        is_black, sentinel, norm2 << 44 | np.arange(len(seg_of_pair))
    )
    darkest = np.full(n_seg, sentinel, np.int64)
    np.minimum.at(darkest, seg_of_pair, order_key)
    has_nonblack = darkest < sentinel
    darkest_idx = np.where(has_nonblack, darkest & ((1 << 44) - 1), -1)

    # Remap black pairs onto their segment's darkest pair.
    target = np.arange(len(seg_of_pair), dtype=np.int64)
    repairable = is_black & has_nonblack[seg_of_pair]
    target[repairable] = darkest_idx[seg_of_pair[repairable]]

    keep = ~repairable
    new_index = np.cumsum(keep) - 1
    remap = new_index[target]
    return (
        seg_of_pair[keep],
        color_of_pair[keep],
        remap[inverse],
        remap,
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _eps_components_batched(points, eps, valid, chunk):
    return jax.vmap(
        lambda p, e, v: CL.eps_components(p, e, v, None, chunk=chunk)
    )(points, eps, valid)


@functools.partial(jax.jit, static_argnames=("k_max", "iters", "chunk", "plusplus"))
def _kmeans_batched(points, valid, ks, k_max, iters, seed, chunk, plusplus):
    def one(p, v, k):
        labels, _ = CL.kmeans(
            p, v, k, k_max=k_max, iters=iters, seed=seed, chunk=chunk,
            plusplus=plusplus,
        )
        return labels

    return jax.vmap(one)(points, valid, ks)


def _bucketize(sizes: np.ndarray, caps) -> dict:
    """Group problem ids by the smallest cap that fits them."""
    out: dict = {}
    for cap in caps:
        sel = np.flatnonzero((sizes <= cap) & (sizes > (caps[caps.index(cap) - 1] if caps.index(cap) else 0)))
        if len(sel):
            out[cap] = sel
    return out


def _pad_batch(b: int) -> int:
    """Round the problem count up to a power of FOUR so the vmapped kernels
    compile once per (batch_bucket, size_bucket) instead of once per image."""
    p = 1
    while p < b:
        p *= 4
    return p


def _pad_kmax(k: int) -> int:
    """Quantize k_max to powers of four — bounds the distinct kernel shapes."""
    p = 2
    while p < k:
        p *= 4
    return p


def _gather_bucket(ids, starts, sizes, colors_f32, cap):
    """Pack per-problem color runs (sorted layout) into a (B_pad, cap, 3)
    batch; padded rows are all-invalid."""
    b = _pad_batch(len(ids))
    pts = np.zeros((b, cap, 3), np.float32)
    valid = np.zeros((b, cap), bool)
    for row, pid in enumerate(ids):
        s, n = starts[pid], sizes[pid]
        pts[row, :n] = colors_f32[s : s + n]
        valid[row, :n] = True
    return pts, valid


def tier1_colors(
    image_rgb: np.ndarray,
    seg_map: np.ndarray,
    seg_quality: np.ndarray,
    *,
    seed: int = 42,
    weighted: bool = True,
) -> np.ndarray:
    """Per-pixel tier-1 quantized colors for the whole image in one pass.

    Args:
      image_rgb: (h, w, 3) uint8.
      seg_map: (h, w) int32 global segment ids, 0 = no segment (stays black).
      seg_quality: (n_seg+1,) float quality per segment id.
    Returns:
      (h, w, 3) uint8 tier-1 colors (black where seg_map == 0).
    """
    seg_of_pair, color_of_pair, inverse, mask = _pairs(image_rgb, seg_map)
    if len(seg_of_pair) == 0:
        return np.zeros_like(image_rgb)
    seg_of_pair, color_of_pair, inverse, _ = _black_repair_pairs(
        seg_of_pair, color_of_pair, inverse
    )
    colors = _unpack(color_of_pair).astype(np.float32)
    n_pairs = len(seg_of_pair)

    # Pair table is sorted by (segment, color): contiguous runs per segment.
    seg_ids, starts, sizes = np.unique(
        seg_of_pair, return_index=True, return_counts=True
    )
    qualities = seg_quality[seg_ids]
    # Reference n_colors counts the bbox-crop black too (subregions.py:426-437).
    n_colors_law = sizes + 1
    eps = 128.0 - 1.28 * qualities
    eps[eps == 0] = 1.0
    max_colors = np.ceil(
        (n_colors_law - n_colors_law * qualities / 100.0) / qualities
    ).astype(np.int64)
    max_colors[max_colors == 0] = 1

    # ---- initial clustering: bucketed vmapped eps-CC (or k-means >= 10k) ----
    cluster_of_pair = np.full(n_pairs, -1, np.int64)
    next_cluster = 0

    big = np.flatnonzero(sizes >= cfg.KMEANS_SWITCH_COLORS)
    small_sizes = sizes.copy()
    small_sizes[big] = 0  # excluded from buckets
    for cap, ids in _bucketize(small_sizes, list(_BUCKETS)).items():
        pts, valid = _gather_bucket(ids, starts, sizes, colors, cap)
        eps_b = np.ones(len(pts), np.float32)
        eps_b[: len(ids)] = eps[ids]
        labels = np.asarray(
            _eps_components_batched(
                jnp.asarray(pts),
                jnp.asarray(eps_b),
                jnp.asarray(valid),
                chunk=min(512, cap),
            )
        )
        for row, pid in enumerate(ids):
            s, n = starts[pid], sizes[pid]
            lab = labels[row, :n]
            uniq, inv = np.unique(lab, return_inverse=True)
            cluster_of_pair[s : s + n] = next_cluster + inv
            next_cluster += len(uniq)

    for pid in big:
        s, n = starts[pid], sizes[pid]
        k = cfg.kmeans_n_clusters(n, qualities[pid])
        lab = CL.kmeans_host(colors[s : s + n], k, seed=seed)
        uniq, inv = np.unique(lab, return_inverse=True)
        cluster_of_pair[s : s + n] = next_cluster + inv
        next_cluster += len(uniq)

    # ---- level-synchronous oversized-cluster splitting ----
    pair_max_colors = np.repeat(max_colors, sizes)  # per pair, via run layout
    cluster_of_pair, next_cluster = _split_oversized_batched(
        colors, cluster_of_pair, pair_max_colors, next_cluster, seed
    )

    # ---- cluster mean colors (truncated uint8, clustering.py:305,347) ----
    # weighted=True weights each palette color by its pixel count so the
    # cluster color minimizes pixel-level MSE; weighted=False reproduces the
    # reference's unweighted palette-entry mean.
    if weighted:
        w = np.bincount(inverse, minlength=len(seg_of_pair)).astype(np.float64)
    else:
        w = np.ones(len(seg_of_pair), np.float64)
    counts = np.bincount(cluster_of_pair, weights=w, minlength=next_cluster)
    means = np.zeros((next_cluster, 3), np.float64)
    for c in range(3):
        means[:, c] = np.bincount(
            cluster_of_pair, weights=colors[:, c] * w, minlength=next_cluster
        )
    means /= np.maximum(counts, 1.0)[:, None]
    cluster_colors = means.astype(np.uint8)

    out = np.zeros_like(image_rgb)
    out[mask] = cluster_colors[cluster_of_pair[inverse]]
    return out


def _split_oversized_batched(colors, cluster_of_pair, pair_max_colors, next_cluster, seed):
    """Split clusters above their per-segment max size with batched k-means.

    Mirrors split_large_cluster recursion (clustering.py:720-775) but level-
    synchronously: each level gathers ALL oversized clusters image-wide,
    buckets them by size, and runs one vmapped k-means per bucket.
    """
    for _level in range(8):  # recursion depth bound (sizes shrink ~max/level)
        order = np.argsort(cluster_of_pair, kind="stable")
        sorted_cluster = cluster_of_pair[order]
        uniq, starts, sizes = np.unique(
            sorted_cluster, return_index=True, return_counts=True
        )
        limits = pair_max_colors[order[starts]]
        oversized = np.flatnonzero((sizes > limits) & (sizes > 2))
        if len(oversized) == 0:
            break

        # n_splits law: min(max(2, ceil(n/max)), n).
        n = sizes[oversized]
        lim = np.maximum(limits[oversized], 1)
        ks = np.minimum(np.maximum(2, -(-n // lim)), n)

        caps = [64, 256, 1024, 4096, 16384, 65536]
        # Clusters beyond the biggest bucket cap (a >65536-color palette in one
        # cluster) are split one-by-one with chunked device k-means — rare, but
        # silently skipping them would break the max_colors_per_cluster law.
        huge_rows = np.flatnonzero(sizes[oversized] > caps[-1])
        for row in huge_rows:
            cid = oversized[row]
            s, m = starts[cid], sizes[cid]
            lab = CL.kmeans_host(colors[order[s : s + m]], int(ks[row]), seed=seed)
            uniq_l, inv = np.unique(lab, return_inverse=True)
            cluster_of_pair[order[s : s + m]] = next_cluster + inv
            next_cluster += len(uniq_l)
        for cap, rows in _bucketize(sizes[oversized], caps).items():
            ids = oversized[rows]
            b = _pad_batch(len(ids))
            pts = np.zeros((b, cap, 3), np.float32)
            valid = np.zeros((b, cap), bool)
            for r, cid in enumerate(ids):
                s, m = starts[cid], sizes[cid]
                pts[r, :m] = colors[order[s : s + m]]
                valid[r, :m] = True
            k_max = _pad_kmax(int(ks[rows].max()))
            ks_b = np.ones(b, np.int32)
            ks_b[: len(ids)] = ks[rows]
            labels = np.asarray(
                _kmeans_batched(
                    jnp.asarray(pts),
                    jnp.asarray(valid),
                    jnp.asarray(ks_b),
                    k_max=int(k_max),
                    iters=25,
                    seed=seed,
                    chunk=min(2048, cap),
                    plusplus=k_max <= 256,
                )
            )
            for r, cid in enumerate(ids):
                s, m = starts[cid], sizes[cid]
                lab = labels[r, :m]
                uniq_l, inv = np.unique(lab, return_inverse=True)
                pair_idx = order[s : s + m]
                cluster_of_pair[pair_idx] = next_cluster + inv
                next_cluster += len(uniq_l)
    return cluster_of_pair, next_cluster
