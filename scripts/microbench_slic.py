"""Microbenchmark SLIC core variants on the chip.

The dominant real bucket (8x Kodak batch) is 9-16 rows of ~537x358 working
resolution padded to (1024, 512) pow2 with k_cap=64.  Times the current
kernel against tighter shape padding, coarser chunking, and tighter batch
padding to guide the bucketing policy.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from roibasedimagecompression_tpu.ops import slic as SLIC


def run(tag, bsz, ph, pw, k, chunk, iters=10, n=3):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (bsz, ph, pw, 3), dtype=np.uint8)
    masks = np.zeros((bsz, ph, pw), bool)
    masks[:, :537, :358] = True  # real content window
    cyx = np.zeros((bsz, k, 2), np.int32)
    cval = np.zeros((bsz, k), bool)
    grid = int(np.sqrt(40))
    kk = 0
    for gy in range(7):
        for gx in range(6):
            if kk >= min(40, k):
                break
            cyx[:, kk] = (gy * 70 + 35, gx * 55 + 27)
            kk += 1
    cval[:, :kk] = True
    steps = np.full(bsz, 75.0, np.float32)

    meta = SLIC._pack_slic_meta(bsz, k, 0)
    meta[:, : 2 * k] = cyx.reshape(bsz, -1)
    meta[:, 2 * k : 3 * k] = cval
    meta[:, 3 * k] = steps.view(np.int32)
    args = (jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(meta))
    kw = dict(n_centers=k, iters=iters, compactness=10.0, sigma=1.0, chunk=chunk)
    out = jax.block_until_ready(SLIC._slic_core_batch(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(SLIC._slic_core_batch(*args, **kw))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.0f} ms  (bsz={bsz} {ph}x{pw} k={k} chunk={chunk})",
          flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    # Current production shape.
    run("pow2/pow4 (current)", 16, 1024, 512, 64, chunk=16384)
    # Tighter shape padding (multiples of 128).
    run("shape 576x384", 16, 576, 384, 64, chunk=16384)
    # Tighter batch pad.
    run("batch 12, 576x384", 12, 576, 384, 64, chunk=16384)
    # Coarser chunks.
    run("chunk 65536", 12, 576, 384, 64, chunk=65536)
    run("chunk 65536 @pow2", 16, 1024, 512, 64, chunk=65536)


if __name__ == "__main__":
    main()
