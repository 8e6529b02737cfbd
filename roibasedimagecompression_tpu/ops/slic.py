"""Masked SLIC superpixels as 5-D k-means on device.

Replaces the Cython skimage.segmentation.slic call at encoder/subregions/
slic.py:89-96: CIELAB color + spatial coordinates, compactness-scaled distance,
fixed Lloyd iterations, then connectivity enforcement (small fragments absorbed
into neighboring segments).  Unlike the original's per-center local windows,
assignment here is one dense (pixels x centers) distance computed in MXU matmul
form — center counts in this codec are small (<= ~100, the split-score window
law), so dense assignment is both simpler and faster on TPU.

The device core (`_slic_core`) fuses LAB conversion, Gaussian blur, center
initialization (gather at grid coordinates) and the Lloyd loop into ONE jitted
graph, so a region costs a single host->device round trip.  `slic_many` vmaps
that core over shape-bucketed batches of regions — the encode pipeline's
per-region loop collapses to one device call per bucket.

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
from roibasedimagecompression_tpu.parallel import shard as SHARD
from roibasedimagecompression_tpu.utils import dispatch as DISPATCH
from roibasedimagecompression_tpu.utils.timing import stage_timer


def _slic_pallas_mode() -> str:
    """'on' (Pallas tile kernel), 'interpret', or 'off' (chunked XLA map).

    Default OFF everywhere: measured on v5e, XLA fuses the argmin into the
    distance matmul (d2 never hits HBM) and runs the assign in ~3 ms vs
    ~11 ms for the VPU broadcast kernel — the scatter in the center UPDATE
    was the real cost (see lloyd()).  RHCCQ_SLIC_PALLAS=1 forces the kernel
    (interpret mode off-TPU) for experiments.  Read at trace time.
    """
    import os

    flag = os.environ.get("RHCCQ_SLIC_PALLAS")
    if flag != "1":
        return "off"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return "on" if on_tpu else "interpret"


@functools.partial(
    jax.jit, static_argnames=("n_centers", "iters", "compactness", "sigma", "chunk")
)
def _slic_core(
    rgb_u8: jnp.ndarray,
    mask: jnp.ndarray,
    centers_yx: jnp.ndarray,
    center_valid: jnp.ndarray,
    step: jnp.ndarray,
    *,
    n_centers: int,
    iters: int = 10,
    compactness: float = 10.0,
    sigma: float = 1.0,
    chunk: int = 16384,
) -> jnp.ndarray:
    """Fused SLIC region kernel: uint8 RGB in, center ids out.

    LAB + blur + center gather + Lloyd run in one graph; assignment is chunked
    over pixels so the (pixels x centers) distance tile stays small enough to
    vmap whole batches of regions.

    Args:
      rgb_u8: (h, w, 3) uint8 (mask-padded region crop).
      mask: (h, w) bool.
      centers_yx: (n_centers, 2) int32 grid-initialized coordinates.
      center_valid: (n_centers,) bool — padding rows False.
      step: scalar f32 SLIC grid spacing S (D^2 = dc^2 + (m/S)^2 ds^2).
    Returns:
      (h, w) int32 center ids (0..n_centers-1) inside mask, -1 outside.
    """
    if n_centers > 256:
        raise ValueError("_slic_core returns uint8 ids; n_centers must be <= 256")
    # uint8 ids use 255 as the wrapped -1 outside-mask sentinel.  n_centers is
    # the PAD size; callers must mark at most 255 rows center_valid so no
    # real id aliases the sentinel (_prepare_centers enforces this).
    h, w, _ = rgb_u8.shape
    lab = COL.rgb_to_lab(rgb_u8)
    if sigma > 0:
        lab = CONV.gaussian_blur(lab, sigma)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ratio = (compactness / step).astype(jnp.float32)
    feats = jnp.concatenate(
        [lab, (yy * ratio)[..., None], (xx * ratio)[..., None]], axis=-1
    ).reshape(-1, 5)
    valid = mask.reshape(-1)

    # Center init on device: LAB gathered at the (few) grid coordinates.
    c_lab = lab[centers_yx[:, 0], centers_yx[:, 1]]
    init_centers = jnp.concatenate(
        [c_lab, centers_yx.astype(jnp.float32) * ratio], axis=1
    )
    init_centers = jnp.where(center_valid[:, None], init_centers, 1e6)

    m = feats.shape[0]
    pallas_mode = _slic_pallas_mode()
    if pallas_mode != "off":
        chunk = 2048  # the Pallas tile; pad the pixel count to it
    else:
        chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    mp = feats.shape[0]
    big = jnp.float32(3.4e38)

    def assign(centers):
        if pallas_mode != "off":
            # Fused VMEM-resident distance+argmin tile kernel: the d2 matrix
            # never hits HBM (measured ~6x over the chunked XLA map at the
            # dominant bucket shapes).  Invalid centers ride the 1e6
            # sentinel (distances ~1e12 >> any real <=5e5).
            from roibasedimagecompression_tpu.ops.pallas import slic_assign as PS

            centers_m = jnp.where(center_valid[:, None], centers, 1e6)
            return PS.slic_assign_pallas(
                feats, centers_m, interpret=pallas_mode == "interpret"
            )
        c2 = jnp.sum(centers * centers, axis=1)

        def one_chunk(start):
            rows = jax.lax.dynamic_slice_in_dim(feats, start, chunk)
            d2 = (
                jnp.sum(rows * rows, axis=1, keepdims=True)
                + c2[None, :]
                - 2.0
                * jax.lax.dot_general(
                    rows, centers,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # HIGHEST: this fallback also runs on TPU when the pallas
                    # kernel is disabled; the default bf16 multiply would
                    # flip borderline argmins vs the exact f32 CPU/pallas
                    # paths and break cross-backend byte identity.
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            d2 = jnp.where(center_valid[None, :], d2, big)
            return jnp.argmin(d2, axis=1).astype(jnp.int32)

        starts = jnp.arange(0, mp, chunk)
        return jax.lax.map(one_chunk, starts).reshape(mp)

    def _update(assign_ids, centers):
        # Center update via chunked one-hot MXU matmuls: TPU scatter-adds
        # (segment_sum) measured ~25 ms per iteration at the dominant bucket
        # shape — ~90% of the whole SLIC stage; the one-hot contraction is
        # sub-ms on the MXU and never materializes beyond one chunk.
        kids = jnp.arange(n_centers)[None, :]

        def upd_chunk(carry, start):
            sums, counts = carry
            rows = jax.lax.dynamic_slice_in_dim(feats, start, chunk)
            ids = jax.lax.dynamic_slice_in_dim(assign_ids, start, chunk)
            v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
            oh = ((ids[:, None] == kids) & v[:, None]).astype(jnp.float32)
            sums = sums + jax.lax.dot_general(
                oh, rows,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: feats carry spatial coordinates (> 2^8, inexact
                # under the TPU default bf16 multiply); exact center updates
                # keep TPU segment labels identical to the f32 CPU path.
                precision=jax.lax.Precision.HIGHEST,
            )
            return (sums, counts + oh.sum(axis=0)), None

        init = (
            jnp.zeros((n_centers, 5), jnp.float32),
            jnp.zeros((n_centers,), jnp.float32),
        )
        (sums, counts), _ = jax.lax.scan(
            upd_chunk, init, jnp.arange(0, mp, chunk)
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, centers)

    # Early-exit Lloyd (bit-identical to the fixed-count loop: once
    # assignments stop changing the update is a fixed point, so the
    # remaining iterations are no-ops — see ops/cluster.py kmeans).
    def _cond(state):
        i, _, _, changed = state
        return changed & (i < iters)

    def _body(state):
        i, centers, prev_ids, _ = state
        assign_ids = assign(centers)
        centers = _update(assign_ids, centers)
        return i + 1, centers, assign_ids, jnp.any(assign_ids != prev_ids)

    _, centers, _, _ = jax.lax.while_loop(
        _cond, _body,
        (0, init_centers, jnp.full((mp,), -1, jnp.int32), jnp.bool_(True)),
    )
    out = assign(centers)[: h * w]
    # uint8 return (n_centers <= 256): the tunneled chip downloads at
    # ~22 MB/s, so label-map bytes are wall-clock.  -1 (outside mask) wraps
    # to 255; every consumer gates on the mask, never on the sentinel.
    return jnp.where(mask.reshape(-1), out, -1).reshape(h, w).astype(jnp.uint8)


def _unpack_slic_meta(meta, k, lead):
    """Split the single packed int32 upload back into (lead cols, centers_yx,
    center_valid, step).  Layout: [lead | cyx flat 2k | cval k | step bits].
    One host->device transfer replaces four per bucket call (each small
    upload pays ~0.8 ms of dispatch overhead on the single-core host)."""
    rows = meta[:, :lead]
    cyx = meta[:, lead : lead + 2 * k].reshape(meta.shape[0], k, 2)
    cval = meta[:, lead + 2 * k : lead + 3 * k] != 0
    step = jax.lax.bitcast_convert_type(meta[:, lead + 3 * k], jnp.float32)
    return rows, cyx, cval, step


def _pack_slic_meta(bsz, k, lead):
    """Host-side buffer for _unpack_slic_meta's layout."""
    return np.zeros((bsz, lead + 3 * k + 1), np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("ph", "pw", "n_centers", "iters", "compactness", "sigma", "chunk"),
)
def _slic_core_batch_gather(
    img_pad, reg_a, reg_b, meta,
    *, ph, pw, n_centers, iters, compactness, sigma, chunk,
):
    """Bucketed SLIC with in-graph crop gathering from the device-resident
    padded batch (models/segment.DeviceBatch).  meta packs rows (bsz, 7)
    int32 [img, top, left, h0, w0, rid, kind] + centers + valid + step in a
    single upload; layout matches the host packing (region pixels at the
    window origin, zeros beyond the bbox)."""
    ri = jnp.arange(ph)[:, None]
    ci = jnp.arange(pw)[None, :]
    rows, centers_yx, center_valid, step = _unpack_slic_meta(
        meta, n_centers, 7
    )

    def one(r, cyx, cv, st):
        crop = jax.lax.dynamic_slice(
            img_pad, (r[0], r[1], r[2], 0), (1, ph, pw, 3)
        )[0]
        ra = jax.lax.dynamic_slice(reg_a, (r[0], r[1], r[2]), (1, ph, pw))[0]
        rb = jax.lax.dynamic_slice(reg_b, (r[0], r[1], r[2]), (1, ph, pw))[0]
        inb = (ri < r[3]) & (ci < r[4])
        rgb = jnp.where(inb[..., None], crop, 0)
        mask = jnp.where(r[6] == 1, rb == r[5], ra == r[5]) & inb
        return _slic_core(
            rgb, mask, cyx, cv, st,
            n_centers=n_centers, iters=iters, compactness=compactness,
            sigma=sigma, chunk=chunk,
        )

    return jax.vmap(one)(rows, centers_yx, center_valid, step)


@functools.partial(
    jax.jit, static_argnames=("n_centers", "iters", "compactness", "sigma", "chunk")
)
def _slic_core_batch(
    rgb_u8, mask, meta,
    *, n_centers, iters, compactness, sigma, chunk,
):
    _, centers_yx, center_valid, step = _unpack_slic_meta(meta, n_centers, 0)
    return jax.vmap(
        lambda im, mk, cyx, cv, st: _slic_core(
            im, mk, cyx, cv, st,
            n_centers=n_centers, iters=iters, compactness=compactness,
            sigma=sigma, chunk=chunk,
        )
    )(rgb_u8, mask, centers_yx, center_valid, step)


@jax.jit
def _fragments_batch(values, masks):
    """Connected fragments of equal-label runs for a batch of label maps."""
    return jax.vmap(
        lambda v, m: CC.propagate_equal_labels(v, m, connectivity=4)
    )(values, masks)


@jax.jit
def _adopt_batch(labels, keeps, masks):
    return jax.vmap(CC.adopt_labels)(labels, keeps, masks)


def _pad_dim(n: int, minimum: int = 64) -> int:
    """Shape-bucket a SLIC dim: tiers {64, 128, 256} up to 256, then
    multiples of 64.

    Two measured forces: padded pixels are real Lloyd work (~220 ns/px —
    pow2 padding of the dominant ~537x358 bucket to (1024, 512) cost 2.4x)
    AND real download bytes (labels ride the ~22 MB/s tunnel), but every
    kernel launch costs ~35 ms through the tunnel.  Above 256 the compute
    term wins (fine 64-step grid); at or below 256 a launch dwarfs the
    pixels, so small regions collapse into three tiers (a real Kodak batch
    measured 2.7x padded-over-real pixels with the old {128, 256} floor —
    tiny regions quadrupled their label download)."""
    if n <= 64:
        return 64
    if n <= 128:
        return 128
    if n <= 256:
        return 256
    return -(-n // 64) * 64


def _pad_batch(b: int) -> int:
    """Round batch counts up: {1, 2} stay exact, then multiples of four.

    Was min-4 (and before that pow4): a real Kodak batch carries ~10
    singleton dim-buckets per 8 images, each paying 4x its label download
    and Lloyd work at the 4-row floor.  Rows 1/2/4k keep the compiled
    batch-shape count bounded (all persistent-cached)."""
    if b <= 2:
        return b
    return -(-b // 4) * 4


def _prepare_centers(mask: np.ndarray, n_segments: int):
    """Host center initialization: grid at spacing S = sqrt(area/n), snapped
    into the mask.  Pure mask geometry — no image data needed."""
    h, w = mask.shape
    area = int(mask.sum())
    n_segments = max(1, int(n_segments))
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
    if len(centers_yx) > 255:
        # The fused core returns uint8 ids with 255 as the outside-mask
        # sentinel; cap valid centers at 255 so no real id aliases it.  The
        # logistic window law keeps real counts <= ~150 even at 22 MP, so
        # this subsample only fires on hand-built inputs.
        take = np.linspace(0, len(centers_yx) - 1, 255).astype(np.int64)
        centers_yx = centers_yx[np.unique(take)]
    return centers_yx.astype(np.int32), step


def _compact_labels(labels: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Relabel to 1..n inside the mask, 0 outside."""
    out = np.zeros(labels.shape, np.int32)
    vals = labels[mask]
    if vals.size == 0:
        return out
    _, inv = np.unique(vals, return_inverse=True)
    out[mask] = inv.astype(np.int32) + 1
    return out


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

    Single-region convenience wrapper over the batched path.
    """
    return slic_many(
        [image_rgb], [mask], [n_segments],
        compactness=compactness, sigma=sigma, iters=iters,
        enforce_connectivity=enforce_connectivity,
        min_size_factor=min_size_factor,
    )[0]


def slic_many(
    images: list,
    masks: list,
    n_segments: list,
    compactness: float = 10.0,
    sigma: float = 1.0,
    iters: int = 10,
    enforce_connectivity: bool = True,
    min_size_factor: float = 0.5,
    mesh=None,
    sources: list | None = None,
    dbatch=None,
) -> list:
    """Batched masked SLIC over many regions.

    Regions are grouped by power-of-two padded shape; each bucket runs ONE
    vmapped fused kernel call (and, with connectivity enforcement, one
    fragment-labeling call + one adoption call).  Replaces the reference's
    region-by-region skimage.slic loop (encoder/compression/subregions.py:98)
    with O(buckets) device dispatches.

    Returns a list of (h_i, w_i) int32 label maps (0 outside mask, 1..n in).
    """
    n = len(images)
    out: list = [None] * n
    if sources is None:
        sources = [None] * n

    # Orientation canonicalization: landscape regions are transposed to
    # portrait before bucketing (EXACT — the 5-D distance, Lloyd updates,
    # connectivity and adoption are all coordinate-order invariant), halving
    # the number of compiled shape buckets.  k_max is FIXED at 256 (the
    # logistic window law keeps real center counts <= ~150 even at 22 MP), so
    # the kernel never recompiles over center-count variation.
    k_max = 256
    buckets: dict = {}
    metas: dict = {}
    for i in range(n):
        mask = np.asarray(masks[i], bool)
        img = images[i]
        src = sources[i] if dbatch is not None else None
        transposed = mask.shape[1] > mask.shape[0]
        if transposed:
            mask = mask.T
            if src is None:
                img = np.ascontiguousarray(np.transpose(img, (1, 0, 2)))
        h0, w0 = mask.shape
        area = int(mask.sum())
        if area == 0:
            out[i] = np.zeros(np.asarray(masks[i], bool).shape, np.int32)
            continue
        centers_yx, step = _prepare_centers(mask, n_segments[i])
        if len(centers_yx) > k_max:
            raise ValueError(f"SLIC center count {len(centers_yx)} exceeds {k_max}")
        metas[i] = (mask, img, centers_yx, step, area, transposed, src)
        # Sub-bucket by center count: most regions need <= 64 centers (the
        # logistic window law), and the dense assignment's cost is linear in
        # the padded center count — a 4x saving over always padding to 256.
        k_cap = 64 if len(centers_yx) <= 64 else k_max
        # In-graph-gather rows dispatch separately per orientation (the
        # transposed batch is a different static source array).
        key = (_pad_dim(h0), _pad_dim(w0), k_cap,
               transposed if src is not None else None)
        buckets.setdefault(key, []).append(i)

    # Dispatch every bucket's core call first (JAX dispatch is async), then
    # collect + enforce connectivity — the per-call device round-trip latency
    # overlaps across buckets instead of serializing.
    pending = []
    with stage_timer("slic.core"):
        for (ph, pw, k_cap, tflag), ids in buckets.items():
            bsz = SHARD.pad_rows(_pad_batch(len(ids)), mesh)
            gather = tflag is not None
            lead = 7 if gather else 0
            masks_b = np.zeros((bsz, ph, pw), bool)
            meta_b = _pack_slic_meta(bsz, k_cap, lead)
            # Padding rows keep step bits = 1.0f (a 0 step would divide by
            # zero inside the padded lanes' Lloyd updates).
            meta_b[:, lead + 3 * k_cap] = np.float32(1.0).view(np.int32)
            imgs_b = None if gather else np.zeros((bsz, ph, pw, 3), np.uint8)
            for row, i in enumerate(ids):
                mask, img, centers_yx, step, _, transposed, src = metas[i]
                h0, w0 = mask.shape
                masks_b[row, :h0, :w0] = mask
                if gather:
                    k0, top, left, sh, sw, rid, kind = src
                    if transposed:
                        top, left, sh, sw = left, top, sw, sh
                    meta_b[row, :7] = (k0, top, left, sh, sw, rid, kind)
                else:
                    imgs_b[row, :h0, :w0] = img
                k = len(centers_yx)
                meta_b[row, lead : lead + 2 * k] = centers_yx.reshape(-1)
                meta_b[row, lead + 2 * k_cap : lead + 2 * k_cap + k] = 1
                meta_b[row, lead + 3 * k_cap] = np.float32(step).view(np.int32)

            common = dict(
                n_centers=k_cap,
                iters=iters,
                compactness=float(compactness),
                sigma=float(sigma),
                chunk=min(16384, ph * pw),
            )
            if gather:
                src_img, src_a, src_b = (
                    dbatch.transposed() if tflag
                    else (dbatch.img, dbatch.reg_a, dbatch.reg_b)
                )
                result = DISPATCH.submit(
                    _slic_core_batch_gather,
                    src_img, src_a, src_b,
                    SHARD.shard_rows(meta_b, mesh),
                    ph=ph, pw=pw, **common,
                )
            else:
                result = DISPATCH.submit(
                    _slic_core_batch,
                    SHARD.shard_rows(imgs_b, mesh),
                    SHARD.shard_rows(masks_b, mesh),
                    SHARD.shard_rows(meta_b, mesh),
                    **common,
                )
            pending.append((ids, masks_b, result))

    with stage_timer("slic.core"):
        collected = SHARD.collect_all([p[2].result() for p in pending])
    for (ids, masks_b, _), assign_b in zip(pending, collected):
        if enforce_connectivity:
            with stage_timer("slic.conn"):
                labels_rows = _enforce_connectivity_bucket(
                    assign_b, masks_b, ids, metas, min_size_factor, mesh
                )
        else:
            labels_rows = [assign_b[row] for row in range(len(ids))]

        for row, i in enumerate(ids):
            mask, _, centers_yx, _, _, transposed, _ = metas[i]
            h0, w0 = mask.shape
            if len(centers_yx) > 1 or not enforce_connectivity:
                lab = labels_rows[row][:h0, :w0]
            else:
                lab = assign_b[row, :h0, :w0]
            compacted = _compact_labels(lab, mask)
            out[i] = compacted.T.copy() if transposed else compacted
    return out


def _enforce_connectivity_bucket(assign_b, masks_b, ids, metas, min_size_factor, mesh=None):
    """Batched connectivity enforcement: split segments into connected
    fragments, absorb small ones into neighbors (skimage
    _enforce_label_connectivity_cython behavior).

    Authoritative path: the native host runtime (union-find fragments +
    multi-source BFS adoption, threaded across the bucket rows) — the arrays
    live on host either side of this step, and the device variant costs
    O(fragment diameter) sequential stencil sweeps.  Device fragment+adopt
    calls remain as the fallback when the native library is unavailable.
    """
    b = len(ids)
    from roibasedimagecompression_tpu import native

    if native.available():
        import concurrent.futures

        def one(row):
            i = ids[row]
            mask, _, centers_yx, _, area, _, _ = metas[i]
            min_size = max(1, int(min_size_factor * area / len(centers_yx)))
            return native.slic_enforce(assign_b[row], masks_b[row], min_size)

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            rows = list(pool.map(one, range(b)))
        if all(r is not None for r in rows):
            return rows
    with stage_timer("slic.frag"):
        frag_b = np.asarray(
            _fragments_batch(SHARD.shard_rows(assign_b, mesh), SHARD.shard_rows(masks_b, mesh))
        )

    compact_b = np.zeros(assign_b.shape, np.int32)
    keep_b = np.zeros(assign_b.shape, bool)
    for row, i in enumerate(ids):
        mask, _, centers_yx, _, area, _, _ = metas[i]
        h0, w0 = mask.shape
        min_size = max(1, int(min_size_factor * area / len(centers_yx)))
        fg = np.zeros(masks_b.shape[1:], bool)
        fg[:h0, :w0] = mask
        vals = frag_b[row][fg]
        _, inv = np.unique(vals, return_inverse=True)
        sizes = np.bincount(inv)
        keep_frag = sizes >= min_size
        if not keep_frag.any():
            keep_frag[np.argmax(sizes)] = True
        compact_b[row][fg] = inv
        keep_b[row][fg] = keep_frag[inv]

    with stage_timer("slic.adopt"):
        adopted_b = np.asarray(
            _adopt_batch(
                SHARD.shard_rows(compact_b, mesh),
                SHARD.shard_rows(keep_b, mesh),
                SHARD.shard_rows(masks_b, mesh),
            )
        )
    return [adopted_b[row] for row in range(b)]
