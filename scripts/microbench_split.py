"""Microbenchmark the oversized-split k-means bucket kernels on chip.

Measures _kmeans_gather (k-means++ init, the default) vs _kmeans_gather_init
(host-stratified init, plusplus skipped) vs the host median-cut pass at the
bucket shapes a real Kodak batch produces (RHCCQ_TRACE split lines), to
attribute the split stage's wall-clock between the sequential ++ init, the
Lloyd iterations, launch latency, and label downloads.

Usage: python scripts/microbench_split.py  (TPU env; CPU works for smoke)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:  # env JAX_PLATFORMS=cpu is overridden by axon's register()
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from roibasedimagecompression_tpu.models import quantize_batched as QB

# Representative level-0 buckets of an 8-image Kodak batch (tall 3.1 MP,
# ~1.3M pairs): (bucket cap, padded rows, k_max).  Levels 1+ shrink ~3x.
SHAPES = [
    (64, 2048, 16),
    (256, 512, 32),
    (1024, 128, 64),
    (4096, 32, 128),
    (16384, 8, 256),
]
N_PAIRS = 1 << 21  # padded colors-table rows

if "--small" in sys.argv:  # CPU smoke: one tiny bucket
    SHAPES = [(64, 32, 8), (256, 8, 16)]
    N_PAIRS = 1 << 14


def bench(fn, args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 256, (N_PAIRS, 3)).astype(np.float32)
    order = rng.permutation(N_PAIRS).astype(np.int32)
    colors_dev = jnp.asarray(colors)
    order_dev = jnp.asarray(order)
    print(f"backend={jax.default_backend()}")

    total_pp = total_mc = 0.0
    for cap, b, k_max in SHAPES:
        starts = (rng.integers(0, N_PAIRS - cap, b)).astype(np.int32)
        sizes = rng.integers(cap // 2, cap + 1, b).astype(np.int32)
        ks = rng.integers(2, k_max + 1, b).astype(np.int32)
        inits = rng.integers(0, 256, (b, k_max, 3)).astype(np.float32)
        a = (colors_dev, order_dev, jnp.asarray(starts), jnp.asarray(sizes),
             jnp.asarray(ks))

        t_pp = bench(
            lambda *x: QB._kmeans_gather(
                *x, cap=cap, k_max=k_max, iters=10, seed=42,
                chunk=min(2048, cap), plusplus=k_max <= 256,
            ), a,
        )
        t_mc = bench(
            lambda *x: QB._kmeans_gather_init(
                *x[:5], x[5], cap=cap, k_max=k_max, iters=10,
                chunk=min(2048, cap),
            ), (*a, jnp.asarray(inits)),
        )
        total_pp += t_pp
        total_mc += t_mc
        print(
            f"cap={cap:6d} b={b:5d} k_max={k_max:4d}: "
            f"++init {t_pp*1e3:8.1f} ms   host-init {t_mc*1e3:8.1f} ms"
        )
    print(f"level-0 total: ++ {total_pp*1e3:.0f} ms vs host-init {total_mc*1e3:.0f} ms")


if __name__ == "__main__":
    main()
