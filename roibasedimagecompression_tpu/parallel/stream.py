"""Batched multi-image encoding: the deployment throughput path.

BASELINE.json config 5 is a 1k-image stream with device-pipelined encode.
Three batching levers applied here:

  1. ROI masks for a whole same-shape batch come from ONE vmapped fused graph.
  2. Tier-1 palette clustering runs ONCE for the whole batch: per-image
     segment maps stack into a single tall map with globally-unique segment
     ids (the eps-CC kernel's group blocking makes this exact).
  3. Host-side container packing (zlib) overlaps the next batch's device work
     through a thread pool.

The reference's only concurrency was a thread pool inside palette clustering
(encoder/compression/clustering.py:439-467); here the parallel dimension is
whole images.
"""

from __future__ import annotations

import concurrent.futures
import functools
import threading

import numpy as np

import jax
import jax.numpy as jnp

from roibasedimagecompression_tpu import config as cfg
from roibasedimagecompression_tpu.io import container
from roibasedimagecompression_tpu.models import codec as CODEC
from roibasedimagecompression_tpu.models import quantize_batched as QB
from roibasedimagecompression_tpu.models import roi_fused as RF
from roibasedimagecompression_tpu.utils.timing import stage_timer


@functools.partial(jax.jit, static_argnames=("rc",))
def _roi_masks_batch(images: jax.Array, lows: jax.Array, highs: jax.Array, rc: cfg.RoiConfig):
    return jax.vmap(lambda im, lo, hi: RF.roi_masks_device(im, rc, lo, hi))(
        images, lows, highs
    )


# Shared container-packing pool: zlib releases the GIL, so one process-wide
# pool serves every encode_many (per-call pools cost thread churn and, under
# encode_stream, stacked 4x oversubscription on the single host core).
_IO_POOL: concurrent.futures.ThreadPoolExecutor | None = None
_IO_LOCK = threading.Lock()


def _io_pool() -> concurrent.futures.ThreadPoolExecutor:
    global _IO_POOL
    with _IO_LOCK:
        if _IO_POOL is None:
            _IO_POOL = concurrent.futures.ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="rhccq-io"
            )
        return _IO_POOL


def encode_many(
    images: list, config: cfg.CodecConfig | None = None, mesh=None,
    _start_gate: threading.Event | None = None,
    _frontend_done: threading.Event | None = None,
) -> list:
    """Encode a list of same-shape (h, w, 3) uint8 images -> list of bytes.

    With `mesh` (a jax.sharding.Mesh with a 'data' axis), the batched ROI
    frontend shards images across devices — the data-parallel deployment path.

    _start_gate/_frontend_done stagger concurrent pipelines (encode_stream):
    the batch waits on _start_gate before doing any work and sets
    _frontend_done once its host-serial frontend (thresholds + ROI masks +
    extraction) is finished — the point where it stops monopolizing the host
    core and starts alternating device waits with host stages.
    """
    config = config or cfg.CodecConfig()
    try:
        if _start_gate is not None:
            _start_gate.wait()
        return _encode_many_inner(images, config, mesh, _frontend_done)
    finally:
        # Always unblock the successor, even on failure mid-frontend.
        if _frontend_done is not None:
            _frontend_done.set()


def _encode_many_inner(
    images: list, config: cfg.CodecConfig, mesh,
    frontend_done: threading.Event | None,
) -> list:
    if not images:
        return []
    shape = images[0].shape
    for im in images:
        if im.shape != shape:
            raise ValueError("encode_many requires same-shape images")
    batch = np.stack([np.asarray(im, np.uint8) for im in images])
    b, h, w, _ = batch.shape
    min_size = cfg.min_region_size(h * w * 3)

    # 1. Batched ROI masks, optionally sharded over the mesh's data axis.
    #    Rounds 1-2 observed the vmapped fused graph killing the v5e worker
    #    at B >= 4; re-tested round 3 (scripts/bisect_roi_fault.py) the fault
    #    no longer reproduces at B=4 or B=8 on the current graph, so the
    #    chunked dispatch is now just a shape-reuse policy (chunk 8 matches
    #    the stream batch).  RHCCQ_ROI_BATCH overrides the chunk size.
    if config.single_region:
        roi_masks = np.ones((b, h, w), bool)
        nonroi_masks = np.zeros((b, h, w), bool)
    else:
        from roibasedimagecompression_tpu.ops import canny as CANNY

        # Hybrid threshold selection for the whole batch (one device call +
        # threaded host CC scoring), then the mask pipeline.
        with stage_timer("s.thresholds"):
            if config.fast_edges:
                lows, highs = CANNY.fast_thresholds_many(batch)
            else:
                lows, highs = CANNY.select_thresholds_many(batch)
        from roibasedimagecompression_tpu import native as NATIVE

        if NATIVE.available():
            # Native mask pipeline, threaded across the batch (the chain is
            # CC-dominated host work; see roi_fused.roi_masks_fast).  Used on
            # mesh runs too — sharded == unsharded stays byte-identical
            # because every arm picks the same backend.
            with stage_timer("s.roi_masks"):
                def one_mask(k):
                    return RF.roi_masks_fast(batch[k], config, lows[k], highs[k])

                import os as _os2

                if (_os2.cpu_count() or 1) > 1:
                    with concurrent.futures.ThreadPoolExecutor(
                        max_workers=8
                    ) as pool:
                        masks = list(pool.map(one_mask, range(b)))
                else:
                    # One host core: the pool only adds switch overhead to a
                    # chain that is pure native CPU work.
                    masks = [one_mask(k) for k in range(b)]
                roi_masks = np.stack([m[0] for m in masks])
                nonroi_masks = np.stack([m[1] for m in masks])
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            with stage_timer("s.roi_masks"):
                x = jax.device_put(
                    jnp.asarray(batch), NamedSharding(mesh, P("data"))
                )
                lo = jax.device_put(jnp.asarray(lows), NamedSharding(mesh, P("data")))
                hi = jax.device_put(jnp.asarray(highs), NamedSharding(mesh, P("data")))
                with mesh:
                    rm, nm = _roi_masks_batch(x, lo, hi, config.roi)
                roi_masks, nonroi_masks = np.asarray(rm), np.asarray(nm)
        else:
            import os

            default_chunk = 8 if jax.default_backend() == "tpu" else 64
            chunk = int(os.environ.get("RHCCQ_ROI_BATCH", default_chunk))
            with stage_timer("s.roi_masks"):
                try:
                    rms, nms = [], []
                    for s in range(0, b, chunk):
                        part = batch[s : s + chunk]
                        if len(part) == 1:
                            rm, nm = RF.roi_masks_device(
                                jnp.asarray(part[0]), config.roi,
                                jnp.float32(lows[s]), jnp.float32(highs[s]),
                            )
                            rms.append(np.asarray(rm)[None])
                            nms.append(np.asarray(nm)[None])
                        else:
                            rm, nm = _roi_masks_batch(
                                jnp.asarray(part),
                                jnp.asarray(lows[s : s + chunk]),
                                jnp.asarray(highs[s : s + chunk]),
                                config.roi,
                            )
                            rms.append(np.asarray(rm))
                            nms.append(np.asarray(nm))
                    roi_masks = np.concatenate(rms)
                    nonroi_masks = np.concatenate(nms)
                except Exception:
                    # Per-image graph fallback (works for transient faults; a
                    # dead TPU worker is unrecoverable either way).
                    masks = [RF.roi_masks(batch[k], config) for k in range(b)]
                    roi_masks = np.stack([m[0] for m in masks])
                    nonroi_masks = np.stack([m[1] for m in masks])

    # 2. Batched segmentation -> one stacked tall segment map.  All regions
    #    of all images pool into the same shape-bucketed split-score / SLIC
    #    device batches (build_segment_maps_many).
    with stage_timer("s.extract"):
        regions_per_image = []
        for k in range(b):
            regions_per_image.append(
                CODEC._extract_and_assign(
                    batch[k], roi_masks[k], nonroi_masks[k], config, min_size
                )
            )
    if frontend_done is not None:
        # Host-serial prefix over: from here on this batch alternates device
        # waits (GIL released) with host stages — let the next batch's
        # frontend claim the core (encode_stream stagger).
        frontend_done.set()
    with stage_timer("s.segment"):
        seg_results, dbatch = CODEC.build_segment_maps_many(
            [batch[k] for k in range(b)], regions_per_image, config,
            mesh=mesh, return_dbatch=True,
        )
    seg_maps = []
    qualities = [np.zeros(1)]
    groups_list = [np.zeros(1, np.int32)]
    images_list = [np.zeros(1, np.int32)]
    next_id = 0
    for k, (seg_map, seg_q, seg_g) in enumerate(seg_results):
        shifted = np.where(seg_map > 0, seg_map + next_id, 0)
        seg_maps.append(shifted)
        qualities.append(seg_q[1:])
        groups_list.append(seg_g[1:])
        images_list.append(np.full(len(seg_q) - 1, k, np.int32))
        next_id += len(seg_q) - 1

    tall_img = batch.reshape(b * h, w, 3)
    tall_seg = np.concatenate(seg_maps, axis=0)
    seg_quality = np.concatenate(qualities)
    seg_group = np.concatenate(groups_list)
    image_of_seg = np.concatenate(images_list)

    # 3. ONE tier-1 pass across every segment of every image — as a cluster
    #    TABLE (no canvas paint).  When the segment stage already holds the
    #    batch pixels on device (dbatch) and the run is single-device, the
    #    pair table is built by a device sort (ops/pairs.py) — the host
    #    radix pack and the host index paint drop out of the steady state.
    import os as _os

    device_pairs = None
    if (
        dbatch is not None
        and mesh is None
        and config.fill_black_holes == 0
        and _os.environ.get("RHCCQ_CANVAS_TIERS") != "1"
        and _os.environ.get("RHCCQ_DEVICE_PAIRS", "1") != "0"
    ):
        from roibasedimagecompression_tpu import native as NATIVE2
        from roibasedimagecompression_tpu.ops import pairs as PAIRS

        if NATIVE2.available():
            with stage_timer("t1.pairs_dev"):
                device_pairs = PAIRS.DevicePairTable(
                    tall_seg, images_dev=dbatch.img, hw=(h, w)
                )
    with stage_timer("s.tier1"):
        table = QB.tier1_table(
            tall_img, tall_seg, seg_quality, seed=config.seed,
            weighted=config.weighted_palette, mesh=mesh,
            split_method=config.split_method,
            split_margin=config.split_margin,
            weighted_split=config.weighted_split,
            device_pairs=device_pairs,
        )

    if config.fill_black_holes > 0 or _os.environ.get("RHCCQ_CANVAS_TIERS") == "1":
        # Hole filling operates on the tier-2 canvas — per-pixel path.
        # RHCCQ_CANVAS_TIERS=1 forces it (byte-identity cross-check vs the
        # composed path, asserted in tests).
        return _finish_canvas_path(
            table, tall_seg, seg_group, batch, config, mesh
        )

    # 4. Tiers 2/3 + final palettes composed on the cluster table: tables of
    #    cluster-count length, no pixel repacking (codec.tiers23_palette_
    #    indices); pixels are touched once more, for the final index paint.
    if table is None:
        pal_idx = [
            (np.zeros((1, 3), np.uint8), np.zeros((h, w), np.uint8))
        ] * b
    else:
        with stage_timer("s.tier23"):
            # refit_originals: the zero-rate palette refit happens inside
            # (on device for the pair path) — finish() must not re-apply it.
            pal_idx = CODEC.tiers23_palette_indices(
                table, seg_group, image_of_seg, b, (h, w), config, mesh=mesh,
                refit_originals=batch,
            )

    # 5. Container packing: host DEFLATE parallelized in a thread pool (zlib
    #    releases the GIL; device work is already done at this point).
    def finish(k: int) -> bytes:
        palette, indices = pal_idx[k]
        return container.pack(palette, indices, level=config.container_level)

    results: list = [None] * b
    with stage_timer("s.container"):
        pool = _io_pool()
        futures = {pool.submit(finish, k): k for k in range(b)}
        for fut in concurrent.futures.as_completed(futures):
            results[futures[fut]] = fut.result()
    return results


def _finish_canvas_path(table, tall_seg, seg_group, batch, config, mesh):
    """Per-pixel tier-2/3 path (kept for fill_black_holes, which edits the
    tier-2 canvas before tier 3)."""
    b, h, w, _ = batch.shape
    t1_tall = np.zeros((b * h, w, 3), np.uint8)
    if table is not None:
        from roibasedimagecompression_tpu import native as NATIVE

        if not NATIVE.paint_masked_colors(
            table["cluster_colors"], table["cluster_of_pair"],
            table["inverse"], table["mask"], t1_tall,
        ):
            t1_tall[table["mask"]] = table["cluster_colors"][
                table["cluster_of_pair"][table["inverse"]]
            ]
    t1_list = [t1_tall[k * h : (k + 1) * h] for k in range(b)]
    group_maps = [
        np.where(
            tall_seg[k * h : (k + 1) * h] > 0,
            seg_group[tall_seg[k * h : (k + 1) * h]],
            0,
        )
        for k in range(b)
    ]
    with stage_timer("s.tier23"):
        _, t3_list = CODEC.tiers23_colors_many(t1_list, group_maps, config, mesh=mesh)

    def finish(k: int) -> bytes:
        from roibasedimagecompression_tpu.models import refine as RF
        from roibasedimagecompression_tpu.ops import unique as U

        palette, indices = U.unique_colors(t3_list[k].reshape(-1, 3))
        indices = indices.reshape(h, w)
        if RF.effective_iters(config) > 0:
            # Only reachable via RHCCQ_CANVAS_TIERS (effective_iters gates
            # itself off under fill_black_holes); must match the table path
            # byte-for-byte.
            palette, indices = RF.refine_canvas(
                t1_list[k], palette, RF.effective_iters(config)
            )
        palette = RF.maybe_refit(batch[k], palette, indices, config)
        return container.pack(palette, indices, level=config.container_level)

    results: list = [None] * b
    with stage_timer("s.container"):
        pool = _io_pool()
        futures = {pool.submit(finish, k): k for k in range(b)}
        for fut in concurrent.futures.as_completed(futures):
            results[futures[fut]] = fut.result()
    return results


def encode_stream(
    batches: list, config: cfg.CodecConfig | None = None, workers: int = 2,
    mesh=None,
) -> list:
    """Encode a stream of same-shape batches with host/device overlap.

    Several encode_many pipelines run on separate threads: while one blocks
    on a device result (the wait releases the GIL), another runs its host
    stages (native ROI, pair packing, zlib) — on a single-core host this
    hides most host wall-clock behind device compute.  Starts are STAGGERED:
    batch k begins only when batch k-1 finishes its host-serial frontend
    (thresholds + ROI + extraction), so concurrent pipelines stay phase-
    shifted instead of hitting the same device-wait points in lockstep (a
    simultaneous start leaves the core idle at every shared sync point —
    measured as the round-4 ~10% overlap).  Device dispatches from all
    threads serialize on the chip; each batch's bytes are identical to a
    sequential encode_many (asserted in tests).

    Returns a list of per-batch result lists, in input order.
    """
    config = config or cfg.CodecConfig()
    if workers <= 1 or len(batches) <= 1:
        return [encode_many(b, config, mesh=mesh) for b in batches]
    gates = [threading.Event() for _ in range(len(batches) + 1)]
    gates[0].set()

    def run(k: int) -> list:
        return encode_many(
            batches[k], config, mesh=mesh,
            _start_gate=gates[k], _frontend_done=gates[k + 1],
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(run, range(len(batches))))
