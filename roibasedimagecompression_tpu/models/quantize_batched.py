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
from roibasedimagecompression_tpu import native
from roibasedimagecompression_tpu.ops import cluster as CL
from roibasedimagecompression_tpu.parallel import shard as SHARD
from roibasedimagecompression_tpu.utils import dispatch as DISPATCH
from roibasedimagecompression_tpu.utils.timing import stage_timer

_BUCKETS = (64, 256, 1024, 4096, 9999)  # eps-CC path caps (>=10k goes to k-means)


def _unique_inverse(keys: np.ndarray, return_counts: bool = False):
    """np.unique(return_inverse) through the native radix sort when available
    (the pair-table unique was a measured hot spot of the batched encode)."""
    from roibasedimagecompression_tpu import native

    return native.unique_inverse_i64(keys, return_counts)


def _runs_of_sorted(sorted_arr: np.ndarray):
    """(values, starts, counts) of equal runs in an already-sorted array —
    np.unique(return_index, return_counts) without re-sorting.  One native
    pass when the runtime is available (called every split level over the
    full pair table; the NumPy diff chain profiled at ~0.1 s/batch)."""
    from roibasedimagecompression_tpu import native

    _, starts, sizes = native.runs_of_sorted_i64(sorted_arr)
    return sorted_arr[starts], starts, sizes


def _pairs(image_rgb: np.ndarray, seg_map: np.ndarray):
    """Unique (segment, color) pairs + per-pixel inverse.

    Returns (seg_of_pair, color_of_pair (packed int64 free repr), inverse,
    mask, pixel_counts) over pixels with seg_map > 0.  pixel_counts is the
    per-pair pixel multiplicity (the weighted-palette weights), a free
    by-product of the native dedup; None on the NumPy fallback.
    """
    from roibasedimagecompression_tpu import native

    mask = seg_map > 0
    out = native.pack_pairs(image_rgb, seg_map)
    if out is not None:
        uniq, inverse, counts = out
        seg_of_pair = (uniq >> 24).astype(np.int32)
        color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
        return seg_of_pair, color_of_pair, inverse, mask, counts
    packed = (
        (image_rgb[..., 0].astype(np.int64) << 16)
        | (image_rgb[..., 1].astype(np.int64) << 8)
        | image_rgb[..., 2].astype(np.int64)
    )
    key = seg_map.astype(np.int64) << 24 | packed
    flat = key[mask]
    uniq, inverse = _unique_inverse(flat)
    seg_of_pair = (uniq >> 24).astype(np.int32)
    color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
    return seg_of_pair, color_of_pair, inverse.astype(np.int64), mask, None


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



@functools.partial(jax.jit, static_argnames=("cap", "chunk"))
def _eps_components_gather(colors_dev, starts, sizes, eps, *, cap, chunk):
    """Bucketed eps-CC with in-graph point gathering.

    Each bucket row is a contiguous run [start, start+size) of the
    device-resident colors table (the pair table is sorted by segment), so
    the bucket upload shrinks from (B, cap, 3) f32 padded points to three
    (B,) scalars per row — the split/epscc bucket uploads were ~18 MB per
    level at ~80 MB/s tunnel bandwidth.
    """
    pos = jnp.arange(cap)

    def one(s0, sz, e):
        v = pos < sz
        pts = jnp.where(
            v[:, None],
            colors_dev[jnp.where(v, s0 + pos, 0)].astype(jnp.float32),
            0.0,
        )
        return CL.eps_components(pts, e, v, None, chunk=chunk)

    # Narrowest dtype that fits (labels are row-local point indices < cap):
    # the tunneled chip downloads at ~22 MB/s, so label bytes are wall-clock.
    dt = jnp.uint8 if cap <= 256 else jnp.uint16
    return jax.vmap(one)(starts, sizes, eps).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("cap", "k_max", "iters", "chunk", "plusplus")
)
def _kmeans_gather(
    colors_dev, order_dev, ssk, *, cap, k_max, iters, seed, chunk,
    plusplus,
):
    """Bucketed k-means over runs of the ORDER permutation (the per-level
    argsort by cluster id): row points are colors[order[start+j]].  ssk packs
    (starts, sizes, ks) columns in one int32 upload."""
    starts, sizes, ks = ssk[:, 0], ssk[:, 1], ssk[:, 2]
    pos = jnp.arange(cap)

    def one(s0, sz, k):
        v = pos < sz
        idx = order_dev[jnp.where(v, s0 + pos, 0)]
        pts = jnp.where(v[:, None], colors_dev[idx].astype(jnp.float32), 0.0)
        labels, _ = CL.kmeans(
            pts, v, k, k_max=k_max, iters=iters, seed=seed, chunk=chunk,
            plusplus=plusplus,
        )
        return labels

    # Labels < k_max: uint8 covers every k_max <= 256 bucket (the common
    # case), halving the biggest split-level download payloads.
    dt = jnp.uint8 if k_max <= 256 else jnp.uint16
    return jax.vmap(one)(starts, sizes, ks).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("cap", "k_max", "iters", "chunk", "plusplus")
)
def _kmeans_gather_w(
    colors_dev, weights_dev, order_dev, ssk, *, cap, k_max,
    iters, seed, chunk, plusplus,
):
    """_kmeans_gather with per-point pixel-count weights gathered from the
    device-resident weights table (weighted Lloyd: see ops.cluster.kmeans)."""
    starts, sizes, ks = ssk[:, 0], ssk[:, 1], ssk[:, 2]
    pos = jnp.arange(cap)

    def one(s0, sz, k):
        v = pos < sz
        idx = order_dev[jnp.where(v, s0 + pos, 0)]
        pts = jnp.where(v[:, None], colors_dev[idx].astype(jnp.float32), 0.0)
        w = jnp.where(v, weights_dev[idx], 0.0)
        labels, _ = CL.kmeans(
            pts, v, k, k_max=k_max, iters=iters, seed=seed, chunk=chunk,
            plusplus=plusplus, weights=w,
        )
        return labels

    dt = jnp.uint8 if k_max <= 256 else jnp.uint16
    return jax.vmap(one)(starts, sizes, ks).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("cap", "k_max", "iters", "chunk")
)
def _kmeans_gather_init(
    colors_dev, order_dev, ssk, inits, *, cap, k_max, iters,
    chunk,
):
    """_kmeans_gather with explicit per-row init centers (b, k_max, 3) —
    skips the SEQUENTIAL k-means++ init (k_max serial distance passes per
    kernel) in favor of host-computed PCA-chunk means."""
    starts, sizes, ks = ssk[:, 0], ssk[:, 1], ssk[:, 2]
    pos = jnp.arange(cap)

    def one(s0, sz, k, init):
        v = pos < sz
        idx = order_dev[jnp.where(v, s0 + pos, 0)]
        pts = jnp.where(v[:, None], colors_dev[idx].astype(jnp.float32), 0.0)
        labels, _ = CL.kmeans(
            pts, v, k, k_max=k_max, iters=iters, chunk=chunk,
            plusplus=False, init_centers=init,
        )
        return labels

    dt = jnp.uint8 if k_max <= 256 else jnp.uint16
    return jax.vmap(one)(starts, sizes, ks, inits).astype(dt)


def _pow2(n: int, minimum: int = 1024) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _colors_device(colors: np.ndarray, mesh=None):
    """Pad the (n, 3) colors table to a pow2 row bucket and upload once
    (replicated across the mesh when sharding).

    Uploaded as uint8 — the values are exact 0..255 integers, the kernels
    cast to f32 AFTER their gathers (bit-identical math), and the padded
    f32 table was a 25 MB device_put per batch through the ~40 MB/s tunnel
    (a 1.3M-pair Kodak batch pads to 2^21 rows)."""
    n = len(colors)
    pad = _pow2(n)
    buf = np.zeros((pad, 3), np.uint8)
    buf[:n] = colors  # f32 -> u8 truncation; values are exact small ints
    return _replicated(buf, mesh)


@functools.partial(jax.jit, static_argnames=("grid",))
def _embed_order(small: jax.Array, *, grid: int) -> jax.Array:
    """Embed a small uploaded order prefix into the full-size grid buffer
    the k-means gather kernels expect (zeros past the prefix are never
    gathered — starts/sizes only address real rows)."""
    return jax.lax.dynamic_update_slice(jnp.zeros(grid, jnp.int32), small, (0,))


def _order_device(order: np.ndarray, mesh=None, grid: int | None = None):
    """Pad the split-level permutation to the same pow2 grid as the colors
    table — an unpadded operand compiles one _kmeans_gather graph per
    distinct pair-table length (measured: a single 256x256 CPU encode spent
    >10 min compiling because every split level hit a fresh shape).

    With `grid` (single-device path), only pow2(len(order)) int32 rows cross
    the tunnel and a device-side embed pads them to the grid: levels >= 1 of
    the split recursion touch a shrinking active subset, but uploading the
    full grid was a fixed 4 B x grid (~8 MB/level for a Kodak batch)."""
    n = len(order)
    small_pad = _pow2(n)
    if grid is not None and mesh is None and small_pad < grid:
        buf = np.zeros(small_pad, np.int32)
        buf[:n] = order
        return _embed_order(jnp.asarray(buf), grid=grid)
    buf = np.zeros(grid if grid is not None else small_pad, np.int32)
    buf[:n] = order
    return _replicated(buf, mesh)


def _replicated(x: np.ndarray, mesh=None):
    if mesh is None:
        return jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P()))


def _flat_run_positions(starts_b: np.ndarray, sizes_b: np.ndarray):
    """(flat_pos, flat_row, flat_within) enumerating every real point of the
    bucket's runs — the scatter-back side of the in-graph gather, built over
    REAL points only (the old padded pair_idx gather materialized cap-padded
    index tables).  One native pass when the runtime is available."""
    from roibasedimagecompression_tpu import native

    return native.flat_run_positions(starts_b, sizes_b)



def _bucketize(sizes: np.ndarray, caps) -> dict:
    """Group problem ids by the smallest cap that fits them."""
    out: dict = {}
    for cap in caps:
        sel = np.flatnonzero((sizes <= cap) & (sizes > (caps[caps.index(cap) - 1] if caps.index(cap) else 0)))
        if len(sel):
            out[cap] = sel
    return out


def _weighted_split_on(flag: bool) -> bool:
    """RHCCQ_WEIGHTED_SPLIT env override for the config flag."""
    import os

    env = os.environ.get("RHCCQ_WEIGHTED_SPLIT")
    if env is None:
        return flag
    return env not in ("", "0")


_WEIGHT_DROP_WARNED: set = set()


def _warn_weights_dropped(reason: str) -> None:
    """One-time signal that weighted_split fell back to unweighted here.

    The median-cut / PCA-init / >65536-color host split paths have no
    weighted kernel; silently ignoring the knob made A/B studies lie."""
    if reason in _WEIGHT_DROP_WARNED:
        return
    _WEIGHT_DROP_WARNED.add(reason)
    import warnings

    warnings.warn(
        f"weighted_split: {reason} has no weighted kernel; those splits run "
        "unweighted (pixel-mass weighting applies to the device Lloyd path "
        "only)",
        RuntimeWarning,
        stacklevel=3,
    )


def _pad_batch(b: int) -> int:
    """Round the problem count up: pow2 to 32, then multiples of 32.

    Was pow4 — padding (say) 300 eps-CC problems to 1024 tripled the batched
    kernel's real work.  The tiered grid caps pad waste at ~11% while keeping
    the compiled batch-shape count small (all persistent-cached)."""
    p = 1
    while p < b and p < 32:
        p *= 2
    if p >= b:
        return p
    return -(-b // 32) * 32


def _pad_kmax(k: int) -> int:
    """Quantize k_max to powers of two — bounds the distinct kernel shapes
    (was pow4, which padded k=40 to 128; the k-means++ init is sequential in
    k_max, so k padding is latency, not just flops)."""
    p = 2
    while p < k:
        p *= 2
    return p



def _assign_trivial_runs(cluster_keys, colors, starts, sizes_inout, eps,
                         key_base) -> np.int64:
    """One-component eps-CC shortcut: label runs whose palette bbox diagonal
    is <= eps without a device sweep.

    Exactness: every pairwise distance within a run is bounded by its
    bounding-box diagonal, so diag2 <= eps2 makes the eps-graph complete —
    the device sweep would label every point with the run minimum (one
    component), which is what one shared key reproduces.  The comparison
    runs in float32 to mirror the kernel predicate (d2 <= eps2,
    ops/cluster.py:86,98); uint8-color squares are exact in f32.

    Mutates `cluster_keys` (one fresh key per trivial run, starting at
    key_base) and zeroes `sizes_inout` for skipped runs (excluding them from
    the device buckets).  Returns the number of keys consumed.
    """
    valid = np.flatnonzero(sizes_inout > 0)
    if len(valid) == 0:
        return np.int64(0)
    n = len(colors)
    st = starts[valid].astype(np.int64)
    en = st + sizes_inout[valid]
    # Segmented min/max via reduceat over explicit [start, end) bounds — the
    # runs need not partition `colors` (tier-2/3 skips pinned black pairs, so
    # gaps exist between runs).  An end of n is dropped (reduceat's trailing
    # segment already extends to the end); gap segments starting at other
    # ends are computed but never selected.
    bounds = np.unique(np.concatenate([st, en[en < n]]))
    seg_of_run = np.searchsorted(bounds, st)
    cmin = np.minimum.reduceat(colors, bounds, axis=0)[seg_of_run]
    cmax = np.maximum.reduceat(colors, bounds, axis=0)[seg_of_run]
    # Single-element runs get their own point back regardless of bounds.
    diag2 = ((cmax - cmin).astype(np.float32) ** 2).sum(axis=1)
    diag2[sizes_inout[valid] == 1] = 0.0
    eps2 = eps[valid].astype(np.float32) ** 2
    triv = valid[diag2 <= eps2]
    if len(triv) == 0:
        return np.int64(0)
    flat_pos, flat_row, _ = _flat_run_positions(starts[triv], sizes_inout[triv])
    cluster_keys[flat_pos] = key_base + flat_row
    sizes_inout[triv] = 0
    return np.int64(len(triv))


def _epscc_native_on() -> bool:
    """eps-CC backend pick: native grid union-find when the library is
    available (RHCCQ_EPSCC=device forces the bucketed device sweeps)."""
    import os

    env = os.environ.get("RHCCQ_EPSCC")
    if env == "device":
        return False
    if env == "native":
        return True
    return native.available()


def _epscc_assign_keys(
    cluster_keys, colors, color_of_pair, starts, sizes_masked, eps, key_base,
    mesh,
):
    """Assign eps-CC cluster keys for every non-zero run, in place.

    Two backends with BIT-IDENTICAL keys: the native grid union-find
    (native.epscc_labels_runs) and the bucketed vmapped device sweeps
    (_eps_components_gather).  Both produce run-local minimum-member labels;
    the key arithmetic (key_base + row * (cap+1) + label over the same
    bucket grid) is shared, so every downstream id is the same either way.
    Returns the advanced key_base.
    """
    buckets = _bucketize(sizes_masked, list(_BUCKETS))
    if _epscc_native_on():
        for cap, ids in buckets.items():
            labels = native.epscc_labels_runs(
                color_of_pair, starts[ids], sizes_masked[ids], eps[ids]
            )
            flat_pos, flat_row, _ = _flat_run_positions(
                starts[ids], sizes_masked[ids]
            )
            cluster_keys[flat_pos] = (
                key_base + flat_row * np.int64(cap + 1) + labels
            )
            key_base += np.int64(len(ids)) * (cap + 1)
        return key_base
    colors_dev = _colors_device(colors, mesh)
    # Dispatch all buckets, then collect (overlaps device round-trips).
    pending = []
    for cap, ids in buckets.items():
        b = SHARD.pad_rows(_pad_batch(len(ids)), mesh)
        starts_b = np.zeros(b, np.int32)
        starts_b[: len(ids)] = starts[ids]
        sizes_b = np.zeros(b, np.int32)
        sizes_b[: len(ids)] = sizes_masked[ids]
        eps_b = np.ones(b, np.float32)
        eps_b[: len(ids)] = eps[ids]
        result = DISPATCH.submit(
            _eps_components_gather,
            colors_dev,
            SHARD.shard_rows(starts_b, mesh),
            SHARD.shard_rows(sizes_b, mesh),
            SHARD.shard_rows(eps_b, mesh),
            cap=cap, chunk=min(512, cap),
        )
        pending.append((cap, ids, starts[ids], sizes_masked[ids], result))
    collected = SHARD.collect_all([p[4].result() for p in pending])
    for (cap, ids, st_b, sz_b, _), labels in zip(pending, collected):
        # Row-local min-index labels -> globally unique keys, scattered
        # back over the runs' real points only.
        flat_pos, flat_row, within = _flat_run_positions(st_b, sz_b)
        cluster_keys[flat_pos] = (
            key_base
            + flat_row * (cap + 1)
            + labels[flat_row, within].astype(np.int64)
        )
        key_base += np.int64(len(ids)) * (cap + 1)
    return key_base


def tier1_colors(
    image_rgb: np.ndarray,
    seg_map: np.ndarray,
    seg_quality: np.ndarray,
    *,
    seed: int = 42,
    weighted: bool = True,
    mesh=None,
    split_method: str = "kmeans",
    split_margin: float = 1.0,
    weighted_split: bool = False,
) -> np.ndarray:
    """Per-pixel tier-1 quantized colors for the whole image in one pass.

    Args:
      image_rgb: (h, w, 3) uint8.
      seg_map: (h, w) int32 global segment ids, 0 = no segment (stays black).
      seg_quality: (n_seg+1,) float quality per segment id.
    Returns:
      (h, w, 3) uint8 tier-1 colors (black where seg_map == 0).
    """
    table = tier1_table(
        image_rgb, seg_map, seg_quality, seed=seed, weighted=weighted,
        mesh=mesh, split_method=split_method, split_margin=split_margin,
        weighted_split=weighted_split,
    )
    out = np.zeros_like(image_rgb)
    if table is None:
        return out
    from roibasedimagecompression_tpu import native

    if not native.paint_masked_colors(
        table["cluster_colors"], table["cluster_of_pair"], table["inverse"],
        table["mask"], out,
    ):
        out[table["mask"]] = table["cluster_colors"][
            table["cluster_of_pair"][table["inverse"]]
        ]
    return out


def tier1_table(
    image_rgb: np.ndarray,
    seg_map: np.ndarray,
    seg_quality: np.ndarray,
    *,
    seed: int = 42,
    weighted: bool = True,
    mesh=None,
    split_method: str = "kmeans",
    split_margin: float = 1.0,
    weighted_split: bool = False,
    device_pairs=None,
) -> dict | None:
    """Tier-1 clustering as a pair/cluster TABLE (no canvas paint).

    With `device_pairs` (an ops.pairs.DevicePairTable built from the same
    seg_map), the pair table comes from the device sort instead of the host
    radix pack, the black repair runs table-only (native), and `inverse`
    stays None — per-pixel state lives on device and the final paint is a
    device gather (codec.tiers23_palette_indices).

    Returns None when no pixel has a segment; otherwise a dict:
      seg_of_pair     (n_pairs,) int32   segment id per unique pair
      cluster_of_pair (n_pairs,) int64   dense tier-1 cluster id per pair
      cluster_colors  (n_clusters, 3) u8 truncated cluster means
      inverse         (n_masked,) int64  pair row per masked pixel (row-major)
      mask            (h, w) bool        seg_map > 0
      pair_weights    (n_pairs,) f64     pixel multiplicity per pair

    Tiers 2/3 + the final palette compose from this table without touching
    pixels again (see codec.tiers23_palette_indices): each tier's palette is
    exactly the unique (problem, color) set over the previous tier's cluster
    colors, so the reference's canvas-merge/re-extract cycle
    (encoder/compression/merging.py + clustering.py re-reading the merged
    canvas) collapses to gathers on cluster ids.
    """
    with stage_timer("t1.pairs"):
        mask = seg_map > 0
        repaired_counts = None
        repair_remap = None
        inverse = None
        colors = None
        if device_pairs is not None and native.available():
            # Device pair path: bit-identical table to native.pack_pairs
            # (same (seg, color) sort), table-only black repair; the pixel
            # -> pair mapping never touches the host.
            uniq = device_pairs.uniq.copy()
            counts = device_pairs.counts.copy()
            if len(uniq) == 0:
                return None
            m, remap = native.black_repair_pairs(
                uniq, counts, None, return_remap=True
            )
            seg_of_pair, color_of_pair, colors = native.split_pair_uniq(
                uniq[:m]
            )
            counts = counts[:m]
            repaired_counts = counts
            repair_remap = remap
            out = None
        else:
            device_pairs = None
            out = native.pack_pairs(image_rgb, seg_map)
        if device_pairs is not None:
            pass
        elif out is not None:
            # Fully-native pair path: dedup + black repair in C++ (the NumPy
            # repair's minimum.at/cumsum chain was ~0.25 s/batch of host CPU).
            uniq, inverse, counts = out
            if len(uniq) == 0:
                return None
            m = native.black_repair_pairs(uniq, counts, inverse)
            if m is not None:
                counts = counts[:m]
                seg_of_pair, color_of_pair, colors = native.split_pair_uniq(
                    uniq[:m]
                )
                repaired_counts = counts
            else:
                seg_of_pair = (uniq >> 24).astype(np.int32)
                color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
                pre_repair_counts = counts
                (
                    seg_of_pair, color_of_pair, inverse, repair_remap,
                ) = _black_repair_pairs(seg_of_pair, color_of_pair, inverse)
        else:
            seg_of_pair, color_of_pair, inverse, _mask2, _ = _pairs(
                image_rgb, seg_map
            )
            if len(seg_of_pair) == 0:
                return None
            pre_repair_counts = None
            (
                seg_of_pair, color_of_pair, inverse, repair_remap,
            ) = _black_repair_pairs(seg_of_pair, color_of_pair, inverse)
    if colors is None:
        colors = _unpack(color_of_pair).astype(np.float32)
    n_pairs = len(seg_of_pair)

    # Pair table is sorted by (segment, color): contiguous runs per segment.
    seg_ids, starts, sizes = _runs_of_sorted(seg_of_pair)
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
    # Cluster identity is carried as provisional KEYS (disjoint per bucket
    # row), compacted to dense ids with ONE global np.unique — the round-1
    # per-segment np.unique loop is gone.
    cluster_keys = np.full(n_pairs, -1, np.int64)
    key_base = np.int64(0)

    with stage_timer("t1.epscc"):
        big = np.flatnonzero(sizes >= cfg.KMEANS_SWITCH_COLORS)
        small_sizes = sizes.copy()
        small_sizes[big] = 0  # excluded from buckets
        # One-component shortcut (exact): if a run's palette bounding-box
        # diagonal is <= eps, EVERY pairwise distance is <= eps (the diagonal
        # bounds all pairs), so the eps-graph is complete and the sweep's
        # min-index labels are all 0 — assign one key per run and skip the
        # device call.  f32 arithmetic mirrors the kernel predicate
        # (d2 <= eps2, ops/cluster.py); integer-color squares are f32-exact.
        n_trivial = _assign_trivial_runs(
            cluster_keys, colors, starts, small_sizes, eps, key_base
        )
        key_base += n_trivial
        key_base = _epscc_assign_keys(
            cluster_keys, colors, color_of_pair, starts, small_sizes, eps,
            key_base, mesh,
        )

        if len(big):
            labs = CL.kmeans_host_many(
                [
                    (
                        colors[starts[p] : starts[p] + sizes[p]],
                        cfg.kmeans_n_clusters(int(sizes[p]), qualities[p]),
                    )
                    for p in big
                ],
                seed=seed,
            )
            for pid, lab in zip(big, labs):
                s, n = starts[pid], sizes[pid]
                cluster_keys[s : s + n] = key_base + lab
                key_base += np.int64(lab.max()) + 1

        _, cluster_of_pair = _unique_inverse(cluster_keys)
        next_cluster = int(cluster_of_pair.max()) + 1

    # Per-pair pixel multiplicities (used by the weighted split AND the
    # final cluster means).
    if repaired_counts is not None:
        # The native repair folded repaired pairs' pixel counts into
        # their targets in place.
        pair_weights = repaired_counts.astype(np.float64)
    elif pre_repair_counts is not None:
        # Per-pair pixel counts fell out of the native dedup; the
        # black repair folds repaired pairs' counts into their
        # targets through the remap.
        pair_weights = np.bincount(
            repair_remap,
            weights=pre_repair_counts.astype(np.float64),
            minlength=len(seg_of_pair),
        )
    else:
        pair_weights = np.bincount(
            inverse, minlength=len(seg_of_pair)
        ).astype(np.float64)

    # ---- level-synchronous oversized-cluster splitting ----
    with stage_timer("t1.split"):
        pair_max_colors = np.repeat(max_colors, sizes)  # per pair, via run layout
        cluster_of_pair, next_cluster = _split_oversized_batched(
            colors, cluster_of_pair, pair_max_colors, next_cluster, seed,
            mesh=mesh, method=split_method, margin=split_margin,
            weights=pair_weights if _weighted_split_on(weighted_split) else None,
            colors_dev_pre=(
                device_pairs.colors_dev if device_pairs is not None else None
            ),
        )

    # ---- cluster mean colors (truncated uint8, clustering.py:305,347) ----
    # weighted=True weights each palette color by its pixel count so the
    # cluster color minimizes pixel-level MSE; weighted=False reproduces the
    # reference's unweighted palette-entry mean.
    with stage_timer("t1.means"):
        w = pair_weights if weighted else None
        cluster_colors = native.cluster_means_u8(
            cluster_of_pair, color_of_pair, w, next_cluster
        )
        if cluster_colors is None:
            wv = w if w is not None else np.ones(len(seg_of_pair), np.float64)
            counts = np.bincount(
                cluster_of_pair, weights=wv, minlength=next_cluster
            )
            means = np.zeros((next_cluster, 3), np.float64)
            for c in range(3):
                means[:, c] = np.bincount(
                    cluster_of_pair, weights=colors[:, c] * wv,
                    minlength=next_cluster,
                )
            means /= np.maximum(counts, 1.0)[:, None]
            cluster_colors = means.astype(np.uint8)
    return {
        "seg_of_pair": seg_of_pair,
        "cluster_of_pair": cluster_of_pair,
        "cluster_colors": cluster_colors,
        "inverse": inverse,  # None on the device-pair path
        "mask": mask,
        "pair_weights": pair_weights,
        "device_pairs": device_pairs,
        "repair_remap": repair_remap,
    }


def cluster_color_maps_many(
    colors_list: list,
    sel_list: list,
    quality_list: list,
    *,
    seed: int = 42,
    weighted: bool = True,
    mesh=None,
    out_list: list | None = None,
    split_method: str = "kmeans",
    split_margin: float = 1.0,
    weighted_split: bool = False,
) -> list:
    """Batched tier-2/3 color-map clustering across MANY problems.

    With `out_list` ((h, w, 3) uint8 canvases aligned with the problems — an
    entry may repeat when several problems share one canvas), the mapped
    colors paint straight into the canvases at the sel pixels (native when
    available) and out_list is returned; otherwise a list of (n_sel_i, 3)
    arrays is returned.

    Each problem is (colors_rgb (h, w, 3) uint8, sel (h, w) bool, quality):
    cluster the palette of colors_rgb[sel] with black pinned (never clustered,
    counted in the n-colors law — clustering.py:188-199 / merging.py:42-44)
    and return the per-pixel mapped colors, exactly like
    codec._cluster_color_map but for all problems in ONE set of bucketed
    device calls.  In encode_many this folds every image's tier-2 (or tier-3)
    clustering into a single batch.

    Returns a list of (n_sel_i, 3) uint8 arrays.
    """
    n_prob = len(colors_list)
    assert len(sel_list) == n_prob and len(quality_list) == n_prob

    # ---- pooled (problem, color) pair table --------------------------------
    from roibasedimagecompression_tpu import native

    with stage_timer("t23.pairs"):
        if native.available():
            # Native packing into one preallocated key buffer (the NumPy
            # boolean-select + shift chain was the dominant host cost of the
            # 22 MP encode's tier-2/3 stage).
            cap = sum(int(np.prod(s.shape)) for s in sel_list)
            keys = np.empty(cap, np.int64)
            pixel_counts = []
            off = 0
            for i in range(n_prob):
                m = native.pack_sel_keys(colors_list[i], sel_list[i], i, keys, off)
                pixel_counts.append(m)
                off += m
            keys = keys[:off]
        else:
            keys_parts = []
            pixel_counts = []
            for i in range(n_prob):
                c = colors_list[i][sel_list[i]]
                pixel_counts.append(len(c))
                packed = (
                    (c[:, 0].astype(np.int64) << 16)
                    | (c[:, 1].astype(np.int64) << 8)
                    | c[:, 2].astype(np.int64)
                )
                keys_parts.append(np.int64(i) << 24 | packed)
            keys = (
                np.concatenate(keys_parts) if keys_parts else np.zeros(0, np.int64)
            )
        if sum(pixel_counts) == 0:
            if out_list is not None:
                return out_list
            return [np.zeros((0, 3), np.uint8) for _ in range(n_prob)]
        uniq, inverse, pair_pixel_counts = _unique_inverse(keys, return_counts=True)

    pair_colors = cluster_pair_table(
        uniq, pair_pixel_counts, quality_list,
        seed=seed, mesh=mesh, split_method=split_method,
        split_margin=split_margin, weighted_split=weighted_split,
        weighted=weighted,
    )

    if out_list is not None:
        # Paint straight into the caller's canvases (sel pixels only) — the
        # pooled gather + per-problem boolean scatter was a dominant host
        # cost at large image sizes.
        off = 0
        for i in range(n_prob):
            cnt = pixel_counts[i]
            inv_slice = inverse[off : off + cnt]
            if not native.paint_masked_colors(
                pair_colors, None, inv_slice, sel_list[i], out_list[i]
            ):
                out_list[i][sel_list[i]] = pair_colors[inv_slice]
            off += cnt
        return out_list

    mapped = pair_colors[inverse]
    out = []
    off = 0
    for i in range(n_prob):
        out.append(mapped[off : off + pixel_counts[i]])
        off += pixel_counts[i]
    return out


def cluster_pair_table(
    uniq: np.ndarray,
    weights: np.ndarray | None,
    quality_list,
    *,
    seed: int = 42,
    mesh=None,
    split_method: str = "kmeans",
    split_margin: float = 1.0,
    weighted_split: bool = False,
    weighted: bool = True,
) -> np.ndarray:
    """Cluster a pooled, already-deduped (problem, color) pair table.

    `uniq` is the sorted int64 key table `prob << 24 | packed_rgb` (unique
    rows); `weights` the per-pair pixel multiplicities (pass them whenever
    known — `weighted` controls whether the cluster MEANS use them, while
    `weighted_split` independently controls the oversized-split Lloyd, so
    weighted_split works even with weighted_palette off);
    `quality_list` maps problem id -> quality.  Black pairs are pinned
    (never clustered, counted by the n-colors law — reference
    encoder/compression/clustering.py:188-199, merging.py:42-44).  Returns
    the (n_pairs, 3) uint8 output color of every pair.

    This is the tier-2/3 clustering core: callers build the table either
    from pixels (cluster_color_maps_many) or by composing the previous
    tier's cluster table (tiers 2/3 palettes are exactly the unique
    (problem, color) sets of the tier-1 cluster colors — no pixel pass).
    """
    prob_of_pair = (uniq >> 24).astype(np.int32)
    color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
    colors = _unpack(color_of_pair).astype(np.float32)
    n_pairs = len(uniq)

    # Pair table is sorted by (problem, color): contiguous runs per problem.
    prob_ids, starts, sizes = _runs_of_sorted(prob_of_pair)
    # Laws (clustering_params): n counts black even when absent from the
    # pixels (the canvas background black joins the merged palette,
    # merging.py:42-44 — codec._cluster_color_map prepends it).
    first_key = color_of_pair[starts]
    has_black = first_key == 0  # sorted runs: black (0) is first if present
    n_black_incl = sizes + (~has_black)
    qualities = np.asarray([quality_list[p] for p in prob_ids], np.float64)
    eps = 128.0 - 1.28 * qualities
    eps[eps == 0] = 1.0
    max_colors = np.ceil(
        (n_black_incl - n_black_incl * qualities / 100.0) / qualities
    ).astype(np.int64)
    max_colors[max_colors == 0] = 1

    # Black pairs are pinned: excluded from clustering, mapped to themselves.
    is_black_pair = color_of_pair == 0
    nb_sizes = sizes - has_black  # non-black run sizes (black sorts first)
    nb_starts = starts + has_black

    cluster_keys = np.full(n_pairs, -1, np.int64)
    key_base = np.int64(0)

    with stage_timer("t23.epscc"):
        big = np.flatnonzero(nb_sizes >= cfg.KMEANS_SWITCH_COLORS)
        small_sizes = nb_sizes.copy()
        small_sizes[big] = 0
        # One-component bbox shortcut (see _assign_trivial_runs) — exact.
        n_trivial = _assign_trivial_runs(
            cluster_keys, colors, nb_starts, small_sizes, eps, key_base
        )
        key_base += n_trivial
        key_base = _epscc_assign_keys(
            cluster_keys, colors, color_of_pair, nb_starts, small_sizes, eps,
            key_base, mesh,
        )

        if len(big):
            labs = CL.kmeans_host_many(
                [
                    (
                        colors[nb_starts[r] : nb_starts[r] + nb_sizes[r]],
                        cfg.kmeans_n_clusters(int(nb_sizes[r]), qualities[r]),
                    )
                    for r in big
                ],
                seed=seed,
            )
            for row, lab in zip(big, labs):
                s, m = nb_starts[row], nb_sizes[row]
                cluster_keys[s : s + m] = key_base + lab
                key_base += np.int64(lab.max()) + 1

        # Every black pair is its own singleton cluster (pinned verbatim).
        black_rows = np.flatnonzero(is_black_pair)
        cluster_keys[black_rows] = key_base + np.arange(len(black_rows))

        _, cluster_of_pair = _unique_inverse(cluster_keys)
        next_cluster = int(cluster_of_pair.max()) + 1

    # Oversized splits (black singletons can never be oversized).
    with stage_timer("t23.split"):
        pair_limits = np.repeat(max_colors, sizes)
        cluster_of_pair, next_cluster = _split_oversized_batched(
            colors, cluster_of_pair, pair_limits, next_cluster, seed,
            mesh=mesh, method=split_method, margin=split_margin,
            weights=(
                weights.astype(np.float64)
                if _weighted_split_on(weighted_split) and weights is not None
                else None
            ),
        )

    # ---- cluster mean colors (truncated uint8, clustering.py:305,347) ------
    # Per-pair pixel multiplicities fall out of the radix dedup — no
    # repair/remap happens on this path (black pairs are pinned), so they
    # ARE the weights.
    w = weights.astype(np.float64) if (weighted and weights is not None) else None
    cluster_colors = native.cluster_means_u8(
        cluster_of_pair, color_of_pair, w, next_cluster
    )
    if cluster_colors is None:
        wv = w if w is not None else np.ones(n_pairs)
        counts = np.bincount(cluster_of_pair, weights=wv, minlength=next_cluster)
        means = np.zeros((next_cluster, 3), np.float64)
        for c in range(3):
            means[:, c] = np.bincount(
                cluster_of_pair, weights=colors[:, c] * wv, minlength=next_cluster
            )
        means /= np.maximum(counts, 1.0)[:, None]
        cluster_colors = means.astype(np.uint8)
    # Pinned black stays exactly black regardless of weighting.
    pair_colors = cluster_colors[cluster_of_pair]
    pair_colors[black_rows] = 0
    return pair_colors


def _pca_chunk_ranks(colors, order, starts, sizes, oversized):
    """(pos, flat_row, rank, n): within-cluster ranks of every point of the
    oversized clusters along each cluster's OWN principal axis.

    Vectorized across all clusters: per-cluster 3x3 covariances by
    segmented bincounts, principal axes by 12 rounds of batched power iteration
    (BT.601 luma fallback for degenerate clusters), one global lexsort for
    the within-cluster ranks.  Shared by the median-cut split (binary cuts
    at the median rank) and the k-means-mc init (k-way chunk means).
    """
    n = sizes[oversized].astype(np.int64)
    flat_pos, flat_row, _ = _flat_run_positions(
        starts[oversized], sizes[oversized]
    )
    pos = order[flat_pos]
    pts = colors[pos].astype(np.float64)

    m = len(n)
    # Segmented sums via bincount — np.add.at is an order of magnitude
    # slower on these row counts (hundreds of thousands per split level).
    sums = np.stack(
        [np.bincount(flat_row, weights=pts[:, c], minlength=m) for c in range(3)],
        axis=1,
    )
    mu = sums / n[:, None]
    d = pts - mu[flat_row]
    cov = np.zeros((m, 3, 3))
    for a in range(3):
        for b in range(a, 3):
            s = np.bincount(flat_row, weights=d[:, a] * d[:, b], minlength=m)
            cov[:, a, b] = s
            cov[:, b, a] = s
    v = np.full((m, 3), 0.577350269)
    for _ in range(12):
        v = np.einsum("mij,mj->mi", cov, v)
        nv = np.linalg.norm(v, axis=1, keepdims=True)
        small = nv[:, 0] < 1e-12
        if small.any():
            v[small] = [0.299, 0.587, 0.114]  # degenerate cluster: luma axis
            nv[small] = 1.0
        v /= nv
    proj = np.einsum("ij,ij->i", d, v[flat_row])

    sidx = np.lexsort((proj, flat_row))  # stable: ties keep color order
    off = np.zeros(m, np.int64)
    np.cumsum(n[:-1], out=off[1:])
    rank = np.empty(len(pos), np.int64)
    rank[sidx] = np.arange(len(pos), dtype=np.int64) - np.repeat(off, n)
    return pos, flat_row, rank, n


def _pca_chunk_init_means(colors, pos, flat_row, rank, n, ks, k_max):
    """(m, k_max, 3) float32 stratified init centers for the split k-means:
    the ACTUAL point at the center rank of each k-way PCA chunk (rows >=
    ks[i] stay zero; they are masked by center_valid in the kernel).

    Picking real points (like k-means++) rather than chunk means preserves
    isolated outlier colors — chunk-mean init measured ~0.4 dB worse."""
    m = len(n)
    chunk = rank * ks[flat_row] // n[flat_row]
    # Center rank of chunk c: floor((c + 0.5) * n / k).
    target = (2 * chunk + 1) * n[flat_row] // (2 * ks[flat_row])
    is_center = rank == target
    key = flat_row * k_max + chunk
    inits = np.zeros((m * k_max, 3), np.float32)
    inits[key[is_center]] = colors[pos[is_center]]
    return inits.reshape(m, k_max, 3)


def _split_oversized_mediancut(colors, cluster_of_pair, pair_max_colors,
                               next_cluster):
    """Split oversized clusters by recursive median cut — zero device calls.

    Level-synchronous binary PCA cuts: every oversized cluster projects onto
    its OWN principal axis (vectorized power iteration on the per-cluster
    3x3 covariances) and splits at the median; children above their limit
    split again next level.  This is the classic median-cut palette
    quantizer generalized to per-cluster axes — the spiritual upgrade of the
    reference's luminance-sort split fallback (clustering.py:778-801), which
    chunks along fixed luminance (measured 7 dB worse when the split is the
    dominant quantizer, as it is at low quality where eps-CC lumps the whole
    palette into one cluster).

    Sizes halve per level, so the max_colors_per_cluster law is reached in
    ceil(log2(n/max)) levels (clusters of size <= 2 are never split,
    matching the k-means path's guard).  Cluster means are recomputed from
    the split labels afterwards, exactly as in the k-means path.
    """
    active = None  # None = all positions (level 0)
    any_split = False
    for _level in range(40):  # sizes halve per level: 2^40 rows is unreachable
        if active is None:
            order = native.argsort_i64(cluster_of_pair)
        else:
            if len(active) == 0:
                break
            order = active[native.argsort_i64(cluster_of_pair[active])]
        _, starts, sizes = _runs_of_sorted(cluster_of_pair[order])
        limits = pair_max_colors[order[starts]]
        oversized = np.flatnonzero((sizes > limits) & (sizes > 2))
        if len(oversized) == 0:
            break
        any_split = True
        pos, flat_row, rank, n = _pca_chunk_ranks(
            colors, order, starts, sizes, oversized
        )
        m = len(n)
        child = rank >= (n[flat_row] + 1) // 2  # median cut, left = ceil(n/2)
        cluster_of_pair[pos] = next_cluster + flat_row * 2 + child
        next_cluster += 2 * m
        active = pos  # only just-split children can still be oversized
    if any_split:
        _, cluster_of_pair = _unique_inverse(cluster_of_pair)
        next_cluster = int(cluster_of_pair.max()) + 1
    return cluster_of_pair, next_cluster


def _split_oversized_batched(colors, cluster_of_pair, pair_max_colors,
                             next_cluster, seed, mesh=None, method="kmeans",
                             margin=1.0, weights=None, colors_dev_pre=None):
    """Split clusters above their per-segment max size with batched k-means.

    Mirrors split_large_cluster recursion (clustering.py:720-775) but level-
    synchronously: each level gathers ALL oversized clusters image-wide,
    buckets them by size, and runs one vmapped k-means per bucket.  All host
    bookkeeping is vectorized (key assignment + one np.unique per level).

    method="mediancut" (or RHCCQ_SPLIT_METHOD=mediancut overriding it) swaps
    in the zero-launch median-cut split (_split_oversized_mediancut);
    method="kmeans-mc" keeps the device Lloyd iterations but replaces the
    SEQUENTIAL in-kernel k-means++ init (k_max serial distance passes) with
    host-computed PCA-chunk means (_pca_chunk_init_means).
    """
    import os as _os

    method = _os.environ.get("RHCCQ_SPLIT_METHOD") or method
    if method == "mediancut":
        if weights is not None:
            _warn_weights_dropped("split_method='mediancut'")
        with stage_timer("split.lum"):
            return _split_oversized_mediancut(
                colors, cluster_of_pair, pair_max_colors, next_cluster
            )

    # Active-subset recursion: after level 0, only pairs whose cluster was
    # just split can still be oversized (clusters never grow), so each level
    # sorts/buckets only those positions — the per-level argsort shrinks from
    # the full pair table (~1.5M rows, 112 ms) to the split frontier (~1/3,
    # then ~1/20, ...).  Ids are compacted ONCE after the loop instead of per
    # level: split keys are strictly larger than every live id, so one final
    # sorted compaction assigns the same numbering the per-level compaction
    # did (untouched ids first in order, then children in construction order).
    active = None  # None = all positions (level 0)
    any_split = False
    # The colors/weights tables are LEVEL-INVARIANT: upload once for the
    # whole recursion.  They were re-uploaded inside every level's dispatch
    # block — 9.4 MB of colors per level through the ~41 MB/s tunnel was the
    # real split.kmeans cost (the k-means graphs themselves measure < 1 ms
    # warm; scripts/microbench_split.py).
    colors_dev = None
    weights_dev = None
    for _level in range(8):  # recursion depth bound (sizes shrink ~max/level)
        if active is None:
            order = native.argsort_i64(cluster_of_pair)
        else:
            if len(active) == 0:
                break
            sub_order = native.argsort_i64(cluster_of_pair[active])
            order = active[sub_order]
        sorted_cluster = cluster_of_pair[order]
        _, starts, sizes = _runs_of_sorted(sorted_cluster)
        limits = pair_max_colors[order[starts]]
        oversized = np.flatnonzero((sizes > limits) & (sizes > 2))
        if len(oversized) == 0:
            break
        any_split = True
        next_active = []
        key_base = np.int64(next_cluster)

        if method == "hybrid":
            # Tiny oversized clusters take host PCA median cuts (zero
            # launches); only clusters above the cutoff earn a device
            # k-means.  The split levels' tail is thousands of <= 64-color
            # problems whose serial device waves dominate split.kmeans.
            # Cuts run to limit/margin WITHIN the level (the same rate
            # over-provisioning the k-means path gets from k = ceil(n*m/max),
            # which carries most of split-margin's R-D gain), so tiny
            # clusters never re-enter the level loop.
            cutoff = int(_os.environ.get("RHCCQ_HYBRID_CUTOFF") or 64)
            m_h = float(
                _os.environ.get("RHCCQ_HYBRID_MARGIN")
                or _os.environ.get("RHCCQ_SPLIT_MARGIN")
                or margin
            )
            tiny = oversized[sizes[oversized] <= cutoff]
            if len(tiny):
                if weights is not None:
                    _warn_weights_dropped("hybrid's tiny median cuts")
                flat_pos_t, _, _ = _flat_run_positions(
                    starts[tiny], sizes[tiny]
                )
                tiny_pos = order[flat_pos_t]
                # Sizes halve per cut, so log2(cutoff)+2 rounds always reach
                # the limit — a fixed bound would break the max-colors law
                # for large RHCCQ_HYBRID_CUTOFF overrides.
                n_cuts = max(12, cutoff.bit_length() + 2)
                for _cut in range(n_cuts):
                    o_t = tiny_pos[native.argsort_i64(cluster_of_pair[tiny_pos])]
                    _, st_t, sz_t = _runs_of_sorted(cluster_of_pair[o_t])
                    lim_t = np.maximum(
                        1, -(-pair_max_colors[o_t[st_t]] // max(m_h, 1.0))
                    ).astype(np.int64)
                    ov_t = np.flatnonzero((sz_t > lim_t) & (sz_t > 2))
                    if len(ov_t) == 0:
                        break
                    pos2, row2, rank2, n2 = _pca_chunk_ranks(
                        colors, o_t, st_t, sz_t, ov_t
                    )
                    child = rank2 >= (n2[row2] + 1) // 2
                    cluster_of_pair[pos2] = key_base + row2 * 2 + child
                    key_base += np.int64(2 * len(ov_t))
                    # Only the children just assigned can still be oversized
                    # (cluster sizes never grow), so the next round's argsort
                    # shrinks geometrically instead of re-sorting every tiny
                    # position each cut — the cut loop was ~1 s/batch of host
                    # bookkeeping against < 0.2 s of actual PCA math.
                    tiny_pos = pos2
                oversized = oversized[sizes[oversized] > cutoff]
                if len(oversized) == 0:
                    next_cluster = int(key_base)
                    active = (
                        np.concatenate(next_active)
                        if next_active
                        else np.empty(0, np.int64)
                    )
                    continue

        # n_splits law: min(max(2, ceil(n/max)), n).  RHCCQ_SPLIT_MARGIN
        # over-provisions k by that factor (max_colors_per_cluster is a MAX
        # constraint, so more clusters never violate it): k-means children
        # are uneven, so the minimal k re-splits ~half the mass for 2-3 more
        # levels — each level is a serial device round-trip wave.
        n = sizes[oversized]
        lim = np.maximum(limits[oversized], 1)
        m_eff = float(_os.environ.get("RHCCQ_SPLIT_MARGIN") or margin)
        ks = np.minimum(np.maximum(2, -(-(n * m_eff).astype(np.int64) // lim)), n)

        inits = None
        if method == "kmeans-mc":
            if weights is not None:
                _warn_weights_dropped("split_method='kmeans-mc'")
            pos_mc, row_mc, rank_mc, n_mc = _pca_chunk_ranks(
                colors, order, starts, sizes, oversized
            )
            k_max_all = _pad_kmax(int(ks.max()))
            inits = _pca_chunk_init_means(
                colors, pos_mc, row_mc, rank_mc, n_mc,
                ks.astype(np.int64), k_max_all,
            )

        # NOTE: merging the small caps (64+256 -> 256) to save launches was
        # measured SLOWER (split.kmeans 1.9s -> 2.8s per batch): the split
        # levels carry thousands of tiny problems and the padded k-means
        # rows cost more than the saved dispatches.  Keep the fine caps.
        caps = [64, 256, 1024, 4096, 16384, 65536]
        # Clusters beyond the biggest bucket cap (a >65536-color palette in one
        # cluster) are split one-by-one with chunked device k-means — rare, but
        # silently skipping them would break the max_colors_per_cluster law.
        huge_rows = np.flatnonzero(sizes[oversized] > caps[-1])
        if len(huge_rows):
            if weights is not None:
                _warn_weights_dropped(">65536-color host k-means")
            labs = CL.kmeans_host_many(
                [
                    (
                        colors[
                            order[
                                starts[oversized[r]] : starts[oversized[r]]
                                + sizes[oversized[r]]
                            ]
                        ],
                        int(ks[r]),
                    )
                    for r in huge_rows
                ],
                seed=seed,
            )
            for row, lab in zip(huge_rows, labs):
                cid = oversized[row]
                s, m = starts[cid], sizes[cid]
                cluster_of_pair[order[s : s + m]] = key_base + lab
                key_base += np.int64(lab.max()) + 1
                next_active.append(order[s : s + m])
        # Dispatch all buckets, then collect (overlaps device round-trips).
        import os as _os

        trace = _os.environ.get("RHCCQ_TRACE", "") not in ("", "0")
        pending = []
        with stage_timer("split.kmeans"):
            if colors_dev is None:
                # Pair path: the post-repair colors table already sits on
                # device (ops/pairs._post_repair_colors) — zero upload.
                colors_dev = (
                    colors_dev_pre
                    if colors_dev_pre is not None and mesh is None
                    else _colors_device(colors, mesh)
                )
            order_dev = _order_device(
                order.astype(np.int32), mesh, grid=int(colors_dev.shape[0])
            )
            if weights is not None and weights_dev is None:
                wbuf = np.zeros(_pow2(len(weights)), np.float32)
                wbuf[: len(weights)] = weights
                weights_dev = _replicated(wbuf, mesh)
            for cap, rows in _bucketize(sizes[oversized], caps).items():
                ids = oversized[rows]
                k_max = _pad_kmax(int(ks[rows].max()))
                if trace:
                    print(
                        f"[rhccq] split level={_level} cap={cap} rows={len(ids)} "
                        f"k_max={k_max}",
                        flush=True,
                    )
                b = SHARD.pad_rows(_pad_batch(len(ids)), mesh)
                ssk_b = np.zeros((b, 3), np.int32)
                ssk_b[:, 2] = 1  # padded rows keep k=1
                ssk_b[: len(ids), 0] = starts[ids]
                ssk_b[: len(ids), 1] = sizes[ids]
                ssk_b[: len(ids), 2] = ks[rows]
                if inits is not None:
                    inits_b = np.zeros((b, k_max, 3), np.float32)
                    inits_b[: len(ids)] = inits[rows][:, :k_max]
                    result = DISPATCH.submit(
                        _kmeans_gather_init,
                        colors_dev, order_dev,
                        SHARD.shard_rows(ssk_b, mesh),
                        SHARD.shard_rows(inits_b, mesh),
                        cap=cap, k_max=int(k_max), iters=10,
                        chunk=min(2048, cap),
                    )
                    pending.append((ids, starts[ids], sizes[ids], k_max, result))
                    continue
                if weights_dev is not None:
                    result = DISPATCH.submit(
                        _kmeans_gather_w,
                        colors_dev, weights_dev, order_dev,
                        SHARD.shard_rows(ssk_b, mesh),
                        cap=cap, k_max=int(k_max), iters=10, seed=seed,
                        chunk=min(2048, cap), plusplus=k_max <= 256,
                    )
                    pending.append((ids, starts[ids], sizes[ids], k_max, result))
                    continue
                result = DISPATCH.submit(
                    _kmeans_gather,
                    colors_dev, order_dev,
                    SHARD.shard_rows(ssk_b, mesh),
                    cap=cap,
                    k_max=int(k_max),
                    # Oversized-split problems are small and near-separable
                    # (a cluster marginally above its size cap): Lloyd is
                    # within noise of converged after ~10 rounds, and the
                    # split only bounds cluster SIZE, not the final palette
                    # (means are recomputed from the split labels).
                    iters=10,
                    seed=seed,
                    chunk=min(2048, cap),
                    plusplus=k_max <= 256,
                )
                pending.append((ids, starts[ids], sizes[ids], k_max, result))
        with stage_timer("split.kmeans"):
            collected = SHARD.collect_all([p[4].result() for p in pending])
        for (ids, st_b, sz_b, k_max, _), labels in zip(pending, collected):
            flat_pos, flat_row, within = _flat_run_positions(st_b, sz_b)
            cluster_of_pair[order[flat_pos]] = (
                key_base
                + flat_row * (k_max + 1)
                + labels[flat_row, within].astype(np.int64)
            )
            key_base += np.int64(len(ids)) * (k_max + 1)
            next_active.append(order[flat_pos])
        next_cluster = int(key_base)
        active = (
            np.concatenate(next_active) if next_active else np.empty(0, np.int64)
        )
    if any_split:
        _, cluster_of_pair = _unique_inverse(cluster_of_pair)
        next_cluster = int(cluster_of_pair.max()) + 1
    return cluster_of_pair, next_cluster
