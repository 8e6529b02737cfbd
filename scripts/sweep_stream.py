"""Sweep encode_stream workers x batch size on the bench image set.

Finds the throughput-optimal (workers, batch) for the deployment stream —
the bench's defaults should match the winner.  Run warm (after the compile
cache is populated); each config is measured best-of-2.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.parallel import stream

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13, 1, 2, 14, 16, 20, 21, 22, 24]
    imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    imgs = imgs + [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    cfg = CodecConfig()

    # A worker only does work if it gets a batch: workers > n_batches measures
    # the same execution as workers == n_batches (ThreadPoolExecutor spawns
    # threads lazily), so those configs are skipped WITH a log line — silently
    # dropping requested SWEEP_W/SWEEP_BSZ values made past sweeps lie.
    configs = []
    for bsz in (int(x) for x in (os.environ.get("SWEEP_BSZ") or "4,8,16").split(",")):
        n_batches = -(-len(imgs) // bsz)
        for workers in (int(x) for x in (os.environ.get("SWEEP_W") or "1,2,3,4").split(",")):
            if workers > n_batches:
                print(f"skip bsz={bsz} workers={workers}: only {n_batches} "
                      "batches (knob would be a no-op)", file=sys.stderr)
                continue
            configs.append((bsz, workers))

    # Warm every batch size once (pays any uncached compiles).
    for bsz in sorted({b for b, _ in configs}):
        batches = [imgs[i: i + bsz] for i in range(0, len(imgs), bsz)]
        t0 = time.perf_counter()
        stream.encode_stream(batches, cfg, workers=4)
        print(f"warm bsz={bsz}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    for bsz, workers in configs:
        batches = [imgs[i: i + bsz] for i in range(0, len(imgs), bsz)]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            stream.encode_stream(batches, cfg, workers=workers)
            best = min(best, time.perf_counter() - t0)
        print(f"bsz={bsz} workers={workers}: {best:.1f}s = {mp / best:.3f} MP/s",
              flush=True)


if __name__ == "__main__":
    main()
