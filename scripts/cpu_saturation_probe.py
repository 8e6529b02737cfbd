"""Is the single host core saturated during the stream?

Compares process CPU time (all threads, incl. the jax client's off-GIL RPC
work) against wall clock over warm stream passes.  cpu/wall ~= 1 means the
core is the binding resource and only less host work helps; cpu/wall << 1
means real idle waits remain and better overlap can still pay.
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
    from roibasedimagecompression_tpu.utils import warmup

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    kodak = "/root/reference/images/png"
    ids = [3, 5, 6, 7, 8, 11, 12, 13, 1, 2, 14, 16, 20, 21, 22, 24]
    imgs = [image_io.imread_rgb(f"{kodak}/{i}.png") for i in ids]
    all_imgs = (
        imgs
        + [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, :]) for im in imgs]
        + [np.ascontiguousarray(im[::-1, ::-1]) for im in imgs]
    )
    cfg = CodecConfig()
    mp = sum(im.shape[0] * im.shape[1] for im in all_imgs) / 1e6
    batches = [all_imgs[i : i + 4] for i in range(0, len(all_imgs), 4)]

    warmup.prewarm(warmup.default_manifest_path())
    for label in ("warm0", "warm1", "meas0", "meas1", "meas2"):
        c0 = time.process_time()
        t0 = time.perf_counter()
        stream.encode_stream(batches, cfg, workers=8)
        wall = time.perf_counter() - t0
        cpu = time.process_time() - c0
        print(
            f"{label}: wall {wall:.1f}s cpu {cpu:.1f}s "
            f"(cpu/wall {cpu / wall:.2f}) {mp / wall:.3f} MP/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
