"""Benchmark: batched encode throughput (megapixels/sec) + quality.

Prints ONE JSON line:
  {"metric": "encode_throughput_mpps", "value": ..., "unit": "MP/s",
   "vs_baseline": ...}

Measures the deployment regime (BASELINE.json config 5 — a stream of
same-shape images through encode_many): warm up on two images to populate the
shape-bucket compile cache, then time a batch of 8 fresh Kodak images
end-to-end (ROI -> segmentation -> tiers 1-3 -> container bytes).

Baseline convention: the reference publishes no numbers (BASELINE.md); its
architecture implies at most ~1 MP/s on a desktop CPU (minutes/image per-pixel
Python loops).  vs_baseline = value / 1.0 MP/s.

Extra context (quality at the produced rate, per-stage timing, single-image
latency) goes to stderr so the JSON line stays clean.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _probe_backend() -> bool:
    """Bounded liveness probe of the default (TPU) backend, in a subprocess.

    The axon TPU backend has a measured failure mode where jax.devices()
    blocks for tens of minutes before raising (wedged worker / orphaned
    remote-compile jobs).  Probing in a separate process with a timeout keeps
    THIS process clean: on failure we fall back to the CPU backend in-process
    (RHCCQ_FORCE_CPU path) and say so in the output, instead of hanging the
    driver's bench run.  The probe only initializes the backend (no compile),
    so killing it on timeout cannot orphan remote compile jobs.
    """
    import subprocess

    timeout = float(os.environ.get("RHCCQ_TPU_PROBE_TIMEOUT", "300"))
    # Outages measured on this backend last minutes-to-hours but end abruptly;
    # a single probe that happens to land mid-outage would demote the whole
    # bench to the CPU backend.  Retry within a bounded budget instead (the
    # driver's own run timeout is far longer than this).
    budget = float(os.environ.get("RHCCQ_TPU_PROBE_BUDGET", "1500"))
    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "assert d, d; print(d[0].platform)"],
                capture_output=True, timeout=timeout, text=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.perf_counter() - t0 + timeout > budget:
            return False
        log(f"backend probe attempt {attempt} failed; retrying "
            f"({time.perf_counter() - t0:.0f}s of {budget:.0f}s budget)")
        time.sleep(30)


def main():
    if (os.environ.get("RHCCQ_FORCE_CPU") != "1"
            and "cpu" not in os.environ.get("JAX_PLATFORMS", "").lower()
            and not _probe_backend()):
        log("backend probe failed/timed out -> forcing CPU backend "
            "(set RHCCQ_TPU_PROBE_TIMEOUT to wait longer)")
        os.environ["RHCCQ_FORCE_CPU"] = "1"

    import jax

    # The persistent compilation cache is enabled by the package import
    # (see roibasedimagecompression_tpu._enable_compilation_cache).

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import container, image_io
    from roibasedimagecompression_tpu.models import codec
    from roibasedimagecompression_tpu.ops import metrics as M
    from roibasedimagecompression_tpu.parallel import stream
    from roibasedimagecompression_tpu.utils import timing

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    kodak = "/root/reference/images/png"
    # Deployment steady state (BASELINE config 5 is a 1k-image stream): one
    # full warm-up pass over the measured batches (pays every compile), then
    # the timed pass through encode_stream — two encode_many pipelines on
    # separate threads so host stages overlap device compute.  No results are
    # cached between passes — the second pass re-runs all host+device work.
    bench_ids = [3, 5, 6, 7, 8, 11, 12, 13,
                 1, 2, 14, 16, 20, 21, 22, 24]  # all 16 landscape Kodak
    if os.path.exists(f"{kodak}/1.png"):
        bench_imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in bench_ids]
    else:
        rng = np.random.default_rng(0)
        bench_imgs = [rng.integers(0, 256, (512, 768, 3), dtype=np.uint8) for _ in range(16)]
    warm_imgs = bench_imgs

    size = int(os.environ.get("RHCCQ_BENCH_SIZE", "0"))
    if size:
        bench_imgs = [im[:size, :size] for im in bench_imgs]
    n_bench = int(os.environ.get("RHCCQ_BENCH_IMAGES", "0"))
    if n_bench:
        bench_imgs = bench_imgs[:n_bench]
    warm_imgs = bench_imgs

    cfg = CodecConfig()

    # 64 images: the 16 landscape originals plus their three mirror variants
    # (distinct content, same shapes).  Longer streams amortize the pipeline
    # fill/drain: measured on-chip (round 4) the same work rate reads
    # 0.80 MP/s over 4x8 and 0.89 MP/s over 8x8 — config 5 of BASELINE.json
    # is a 1k-image stream, so the steadier number is the honest one.
    all_imgs = (
        bench_imgs
        + [np.ascontiguousarray(im[:, ::-1]) for im in bench_imgs]
        + [np.ascontiguousarray(im[::-1, :]) for im in bench_imgs]
        + [np.ascontiguousarray(im[::-1, ::-1]) for im in bench_imgs]
    )
    # Batch size knob: bigger device batches amortize launches and pack the
    # padded buckets denser; smaller ones overlap better across workers.
    # Round-5 worker sweep (64-image set, warm, repeated): bsz4/w8 1.12-1.19
    # MP/s vs bsz8/w4 1.02-1.13, bsz4/w12+ and bsz2 worse — finer batches
    # interleave host stages into device waits better than any worker count
    # can at bsz>=8, and below 4 the fixed per-batch host costs win again.
    bsz = int(os.environ.get("RHCCQ_BENCH_BATCH", "0")) or max(
        1, min(4, len(bench_imgs))
    )
    bench_batches = [
        all_imgs[i: i + bsz] for i in range(0, len(all_imgs), bsz)
    ]
    bench_imgs = all_imgs

    # Prewarm: replay the committed compile manifest (recorded from this very
    # stream) so every stage's graphs compile in ONE concurrent wave instead
    # of a stage-by-stage walk — the remote compile service parallelizes
    # concurrent requests almost perfectly.  Non-blocking: the warm-up encode
    # below joins the in-flight compiles.
    from roibasedimagecompression_tpu.utils import warmup

    warmup.check_pack_freshness(log)
    t0 = time.perf_counter()
    futs = warmup.prewarm(warmup.default_manifest_path())
    log(f"prewarm: {len(futs)} manifest graphs dispatched "
        f"({time.perf_counter() - t0:.1f}s)")

    # Warm-up: populates the shape-bucket compile cache AND exercises the
    # single-image API.
    t0 = time.perf_counter()
    codec.encode(warm_imgs[0], cfg)
    log(f"warm-up encode 1: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    stream.encode_stream(bench_batches, cfg)
    log(f"warm-up encode_stream {len(bench_batches)}x{bsz}: {time.perf_counter() - t0:.1f}s")

    # Measured run: warm until CONVERGED — two consecutive passes within 10%
    # — then report the best of the converged tail.  Round 4's best-of-4
    # reported a moving target (51.3 -> 25.4 s, still warming executable
    # loads through the tunnel at pass 4); a pass count can't be right for
    # every driver environment, a convergence predicate can.  Worker sweep
    # (scripts/sweep_stream.py, warm, round 4, workers <= n_batches so the
    # knob is real): bsz=8 -> w1 0.728 / w2 0.805 / w3 0.795 / w4 0.940
    # MP/s; bsz=16 -> w1 0.768 / w2 0.934.
    workers = int(os.environ.get("RHCCQ_STREAM_WORKERS", "8"))
    max_passes = int(os.environ.get("RHCCQ_BENCH_PASSES", "8"))
    pass_times = []
    converged = False
    for attempt in range(max_passes):
        timing.reset_stages()
        t0 = time.perf_counter()
        blob_batches = stream.encode_stream(bench_batches, cfg, workers=workers)
        dt_i = time.perf_counter() - t0
        pass_times.append(dt_i)
        log(f"measured pass {attempt}: {dt_i:.1f}s")
        if (len(pass_times) >= 2
                and abs(pass_times[-1] - pass_times[-2])
                <= 0.10 * min(pass_times[-1], pass_times[-2])):
            converged = True
            break
    if not converged:
        log(f"WARNING: passes did not converge within {max_passes} "
            f"(times: {[round(t, 1) for t in pass_times]}) — executable "
            f"loads/compiles were likely still arriving; reporting the "
            f"best pass anyway")
        dt = min(pass_times)
    else:
        # Best of the converged tail (the two agreeing passes): steady
        # state, robust to single-pass host noise.
        dt = min(pass_times[-2:])
    blobs = [b for batch in blob_batches for b in batch]

    mp = sum(im.shape[0] * im.shape[1] for im in bench_imgs) / 1e6
    mpps = mp / dt

    # Quality/rate over the measured batch (the decode loop doubles as the
    # decode-throughput measurement — reference decode is minutes/image of
    # per-pixel Python, decoder/uncompression/uncompression.py).
    psnrs, ssims, bpps, colors = [], [], [], []
    t_dec = time.perf_counter()
    recs = [codec.decode(data) for data in blobs]
    decode_mpps = mp / (time.perf_counter() - t_dec)
    for im, data, rec in zip(bench_imgs, blobs, recs):
        q = M.quality_metrics(im, rec)
        psnrs.append(q["psnr"])
        ssims.append(q["ssim"])
        bpps.append(len(data) * 8.0 / (im.shape[0] * im.shape[1]))
        colors.append(container.unpack(data).n_colors)

    # Single-image warm latency for reference: best of 3 (single samples
    # still carry executable-load stragglers through the tunnel — round 4
    # recorded an inverted low-latency preset purely from a half-cold
    # one-shot sample).
    single = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        codec.encode(bench_imgs[0], cfg)
        single = min(single, time.perf_counter() - t0)

    # Interactive preset latency (fast_edges + wide-margin split + ld-7):
    # one compile-and-discard pass, then best-of-3 warm.
    ll_cfg = CodecConfig.low_latency(
        roi_quality=cfg.roi_quality, nonroi_quality=cfg.nonroi_quality
    )
    codec.encode(bench_imgs[0], ll_cfg)
    single_ll = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ll_blob = codec.encode(bench_imgs[0], ll_cfg)
        single_ll = min(single_ll, time.perf_counter() - t0)
    ll_q = M.quality_metrics(bench_imgs[0], codec.decode(ll_blob))

    log(
        f"encode_stream x{len(bench_imgs)} ({mp:.2f} MP): {dt:.1f}s = {mpps:.4f} MP/s; "
        f"mean psnr={np.mean(psnrs):.2f}, ssim={np.mean(ssims):.4f}, "
        f"bpp={np.mean(bpps):.3f}, colors={np.mean(colors):.0f}"
    )
    log(f"single-image warm encode: {single:.1f}s")

    # Throughput mode: container_level=7 (libdeflate probe, BASELINE.md —
    # DEFLATE-10 costs 134-200 ms/MP vs ld-7's 38-45 ms/MP at ~+6.5% rate).
    # Same graphs, same indices/palette, bit-identical decode — only the
    # entropy-coder level changes, so PSNR is the measured ld-10 value by
    # construction and only rate + wall move.
    import dataclasses

    cfg7 = dataclasses.replace(cfg, container_level=7)
    dt7 = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        blob_batches7 = stream.encode_stream(bench_batches, cfg7, workers=workers)
        dt7 = min(dt7, time.perf_counter() - t0)
    blobs7 = [b for batch in blob_batches7 for b in batch]
    bpp7 = sum(len(b) * 8.0 for b in blobs7) / (mp * 1e6)
    mpps7 = mp / dt7
    log(
        f"throughput mode (container_level=7) x{len(bench_imgs)}: {dt7:.1f}s "
        f"= {mpps7:.4f} MP/s; bpp={bpp7:.3f} (psnr identical to ld-10: "
        f"same indices+palette, entropy level only)"
    )
    log(
        f"single-image low-latency preset: {single_ll:.2f}s "
        f"(psnr={ll_q['psnr']:.2f}, "
        f"bpp={len(ll_blob) * 8.0 / bench_imgs[0].shape[0] / bench_imgs[0].shape[1]:.3f})"
    )

    # Persist a stage profile for the multi-chip scaling projection
    # (parallel/scaling.py; read by __graft_entry__.dryrun_multichip).
    # Measured on ONE solo warm batch — threaded-stream stage sums
    # double-count waits on the single-core host (every worker's blocking
    # collect counts the same wall), which inflated the round-2 numbers.
    solo_dt = float("inf")
    for _ in range(2):  # best-of-2: single samples swing 1.5x on this host
        timing.reset_stages()
        t0 = time.perf_counter()
        stream.encode_many(bench_batches[0], cfg)
        dt_i = time.perf_counter() - t0
        if dt_i < solo_dt:
            solo_dt = dt_i
            solo_stages = timing.stage_report()
    solo_mp = sum(im.shape[0] * im.shape[1] for im in bench_batches[0]) / 1e6
    log(f"solo batch x{len(bench_batches[0])}: {solo_dt:.1f}s "
        f"({solo_mp / solo_dt:.3f} MP/s)")

    # Host vs device wall per MP (VERDICT r4 item 5): the solo stage profile
    # split by parallel/scaling.py's host/device classification — the same
    # split the multi-chip projection uses, now a driver-captured number.
    # "device" here = device compute + tunnel transfer + launch latency (the
    # stages that shard over chips); "host" = the single-core serial stages
    # (thresholds law, native ROI chain, pair/means bookkeeping, DEFLATE).
    from roibasedimagecompression_tpu.parallel import scaling as SCALING

    host_s, device_s = SCALING.split_profile(
        {k: v["seconds"] for k, v in solo_stages.items()}
    )
    host_ms_per_mp = host_s / solo_mp * 1000.0
    device_ms_per_mp = device_s / solo_mp * 1000.0
    # Overlap efficiency of the measured stream: 0 = serial batches (stream
    # wall == n_batches * solo wall), 1 = perfect host/device overlap
    # (stream wall == n_batches * max(host, device)).
    n_batches = len(bench_batches)
    serial_est = solo_dt * n_batches
    ideal = max(host_s, device_s) * n_batches
    overlap = (serial_est - dt) / max(serial_est - ideal, 1e-9)
    log(
        f"host wall {host_ms_per_mp:.0f} ms/MP, device+tunnel wall "
        f"{device_ms_per_mp:.0f} ms/MP (solo batch); stream overlap "
        f"efficiency {overlap:.2f} (0=serial, 1=max(host,device) floor)"
    )
    try:
        if jax.default_backend() != "tpu":
            raise OSError  # CPU smoke runs must not overwrite the TPU profile
        stages_out = {
            k: round(v["seconds"], 3) for k, v in solo_stages.items()
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_STAGES.json"), "w") as f:
            json.dump(
                {"stages": stages_out, "megapixels": round(solo_mp, 3),
                 "seconds": round(solo_dt, 3), "note":
                 "solo warm encode_many stage walls (serial, no thread "
                 "double-counting); stream throughput is the headline metric"},
                f, indent=1,
            )
    except OSError:
        pass
    if os.environ.get("RHCCQ_RECORD_MANIFEST"):
        n = warmup.save(warmup.default_manifest_path())
        log(f"manifest: saved {n} entries to {warmup.default_manifest_path()}")
    log(f"stages: { {k: round(v['seconds'], 2) for k, v in solo_stages.items()} }")

    # MFU accounting pass: one more solo batch with XLA cost analysis
    # accumulating executed device flops (utils/flops.py).  Run AFTER the
    # timed passes — the first sight of each signature pays a lowering.
    from roibasedimagecompression_tpu.utils import flops as FLOPS

    FLOPS.enable()
    FLOPS.reset()
    t0 = time.perf_counter()
    stream.encode_many(bench_batches[0], cfg)
    mfu_dt = time.perf_counter() - t0
    FLOPS.disable()
    fl, byt = FLOPS.totals()
    mfu = fl / mfu_dt / FLOPS.V5E_PEAK_F32 if mfu_dt > 0 else 0.0
    log(
        f"device flops (solo batch): {fl/1e9:.2f} GFLOP, {byt/1e9:.2f} GB "
        f"accessed, over {mfu_dt:.1f}s wall -> {fl/mfu_dt/1e9:.1f} GFLOP/s "
        f"= {mfu*100:.5f}% of v5e f32 peak (the encode is transfer/latency-"
        f"bound, not flop-bound — see BASELINE.md ceiling analysis)"
    )

    print(
        json.dumps(
            {
                "metric": "encode_throughput_mpps",
                "value": round(mpps, 5),
                "unit": "MP/s",
                "vs_baseline": round(mpps / 1.0, 5),
                "backend": jax.default_backend(),
                "psnr_db": round(float(np.mean(psnrs)), 2),
                "ssim": round(float(np.mean(ssims)), 4),
                "bpp": round(float(np.mean(bpps)), 3),
                "palette_colors": int(np.mean(colors)),
                "batch_images": len(bench_imgs),
                "decode_mpps": round(decode_mpps, 3),
                "single_image_seconds": round(single, 2),
                "single_image_low_latency_seconds": round(single_ll, 2),
                "throughput_mode_mpps": round(mpps7, 5),
                "throughput_mode_bpp": round(bpp7, 3),
                "host_wall_ms_per_mp": round(host_ms_per_mp, 1),
                "device_wall_ms_per_mp": round(device_ms_per_mp, 1),
                "overlap_efficiency": round(overlap, 3),
                "passes_converged": converged,
                "mfu": round(mfu, 8),
                "device_gflops_solo_batch": round(fl / 1e9, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
