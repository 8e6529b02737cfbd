"""Microbenchmark eps-CC bucket kernels at realistic shapes vs chunk size."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from roibasedimagecompression_tpu.ops import cluster as CL
import functools


@functools.partial(jax.jit, static_argnames=("chunk",))
def batched(points, eps, valid, chunk):
    return jax.vmap(
        lambda p, e, v: CL.eps_components(p, e, v, None, chunk=chunk)
    )(points, eps, valid).astype(jnp.uint16)


def run(rows, cap, chunk, n=3):
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 256, (rows, cap, 3)).astype(np.float32)
    valid = np.zeros((rows, cap), bool)
    valid[:, : cap * 3 // 4] = True
    eps = np.full(rows, 102.4, np.float32)
    args = (jnp.asarray(pts), jnp.asarray(eps), jnp.asarray(valid))
    out = jax.block_until_ready(batched(*args, chunk=chunk))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(batched(*args, chunk=chunk))
    print(f"rows={rows} cap={cap} chunk={chunk}: {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for rows, cap in ((8, 4096), (32, 1024), (160, 256), (2048, 64)):
        for chunk in (min(512, cap), min(1024, cap), cap):
            if chunk > cap:
                continue
            run(rows, cap, chunk)


if __name__ == "__main__":
    main()

# Finding (2026-08-17, v5e): the eps-CC sweep kernel itself measures ~0 ms at
# every realistic bucket shape — convergence takes 1-2 sweeps on clustered
# color data and the distance tiles are tiny.  The t1.epscc stage's ~1.2 s is
# host-side bucket gathering, launch overhead and label downloads, NOT device
# compute; chunk-size tuning is pointless here.
