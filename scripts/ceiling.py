"""Measured throughput-ceiling analysis for this environment.

Quantifies every hard resource bound on the encode pipeline — tunnel
bandwidth, round-trip latency, single-core host stages, device kernel
walls — and prints the implied MP/s ceilings.  BASELINE.md's "achievable
ceiling" section quotes this output; re-run to reproduce:

    python scripts/ceiling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bw_probe():
    import jax

    rng = np.random.default_rng(0)
    buf = rng.integers(0, 255, 32 * 1024 * 1024).astype(np.uint8)
    d = jax.device_put(buf)
    jax.block_until_ready(d)
    _ = np.asarray(d)
    ups, downs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        d2 = jax.device_put(buf)
        jax.block_until_ready(d2)
        ups.append(32 / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        _ = np.asarray(d2)
        downs.append(32 / (time.perf_counter() - t0))
    x = jax.device_put(np.ones(8, np.float32))
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(f(x))
    rt = (time.perf_counter() - t0) / 10
    return max(ups), max(downs), rt


def host_stages(img):
    from roibasedimagecompression_tpu import config as cfg, native
    from roibasedimagecompression_tpu.models import roi_fused as RF
    from roibasedimagecompression_tpu.ops import canny as CANNY

    mp = img.shape[0] * img.shape[1] / 1e6
    batch = img[None]
    t0 = time.perf_counter()
    lows, highs = CANNY.select_thresholds_many(batch)
    thr = time.perf_counter() - t0
    c = cfg.CodecConfig()
    RF.roi_masks_fast(img, c, lows[0], highs[0])
    t0 = time.perf_counter()
    RF.roi_masks_fast(img, c, lows[0], highs[0])
    roi = time.perf_counter() - t0

    # DEFLATE on a representative index payload (uniform-ish u8 indices).
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 140, img.shape[0] * img.shape[1]).astype(np.uint8)
    deflate = {}
    for level in (7, 10):
        t0 = time.perf_counter()
        native.zlib_compress_fast(idx.tobytes(), level=level)
        deflate[level] = time.perf_counter() - t0
    return mp, thr, roi, deflate


def main():
    import jax

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    up, down, rt = bw_probe()
    print(f"tunnel: up {up:.1f} MB/s, down {down:.1f} MB/s, "
          f"round-trip {rt*1e3:.1f} ms")

    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/images/png/5.png").convert("RGB")
    )
    mp, thr, roi, deflate = host_stages(img)
    print(f"host (1 core): thresholds {thr/mp*1e3:.0f} ms/MP, "
          f"ROI chain {roi/mp*1e3:.0f} ms/MP, "
          f"DEFLATE ld-10 {deflate[10]/mp*1e3:.0f} ms/MP / "
          f"ld-7 {deflate[7]/mp*1e3:.0f} ms/MP")

    # Mandatory tunnel traffic per megapixel of batched encode:
    #   up:   3 B/px pixels + 2 B/px region rasters (u8 x2) + 2 B/px seg map
    #   down: ~1 B/px SLIC labels + ~3 B/px pair table (content-dependent,
    #         measured ~0.25 pairs/px x 12 B) + 1 B/px final index map
    up_mb = 3.0 + 2.0 + 2.0
    down_mb = 1.0 + 3.0 + 1.0
    t_tunnel = up_mb / up + down_mb / down
    print(f"tunnel traffic: {up_mb:.0f} MB/MP up + {down_mb:.0f} MB/MP down "
          f"-> {t_tunnel*1e3:.0f} ms/MP = {1/t_tunnel:.1f} MP/s ceiling "
          f"(transfers alone, perfect overlap of everything else)")
    ideal = 3.0 / up + 1.0 / down
    print(f"  zero-overhead variant (pixels up + indices down only): "
          f"{1/ideal:.1f} MP/s")

    t_host = thr / mp + roi / mp + deflate[10] / mp
    print(f"host serial floor (thresholds + ROI + DEFLATE-10): "
          f"{t_host*1e3:.0f} ms/MP = {1/t_host:.1f} MP/s ceiling "
          f"(single core, everything else hidden)")

    print(f"round-trip budget: ~30 device calls/batch x {rt*1e3:.0f} ms "
          f"= {30*rt:.1f} s/batch floor if serialized (async dispatch "
          f"overlaps most of this)")


if __name__ == "__main__":
    main()
