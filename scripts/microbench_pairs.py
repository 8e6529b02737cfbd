"""Microbenchmark the device primitives for a device-resident pair table.

Measures, on the real chip:
  1. lexicographic 2-key sort of N elements (seg, color, iota payload)
  2. unique-flag + cumsum pair-id assignment
  3. scatter of final u8 indices through the sort permutation
  4. compaction of the unique table (flag sort)
  5. host<->device tunnel bandwidth (up and down)

Run: python scripts/microbench_pairs.py [N_megapixels]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


@jax.jit
def sort2(seg, col):
    iota = jnp.arange(seg.shape[0], dtype=jnp.int32)
    return jax.lax.sort((seg, col, iota), num_keys=2)


@jax.jit
def sort1_i64(keys):
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    return jax.lax.sort((keys, iota), num_keys=1)


@jax.jit
def pair_ids(seg_s, col_s):
    new = (seg_s != jnp.roll(seg_s, 1)) | (col_s != jnp.roll(col_s, 1))
    new = new.at[0].set(True)
    pid = jnp.cumsum(new.astype(jnp.int32)) - 1
    return pid, new


@jax.jit
def scatter_u8(perm, vals):
    out = jnp.zeros(perm.shape[0], jnp.uint8)
    return out.at[perm].set(vals, unique_indices=True)


@jax.jit
def compact(seg_s, col_s, new, pid):
    # Move unique reps to the front, in order: sort by (1-new, position).
    notnew = (~new).astype(jnp.int32)
    return jax.lax.sort((notnew, seg_s, col_s, pid), num_keys=1)


def main():
    mp = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n = int(mp * 1024 * 1024)
    print(f"backend={jax.default_backend()} n={n}")
    rng = np.random.default_rng(0)
    seg = rng.integers(0, 3000, n).astype(np.int32)
    col = rng.integers(0, 1 << 24, n).astype(np.int32)
    keys = (seg.astype(np.int64) << 24) | col

    # tunnel bandwidth
    buf = rng.integers(0, 255, 32 * 1024 * 1024).astype(np.uint8)
    t0 = time.perf_counter()
    dbuf = jax.device_put(buf)
    jax.block_until_ready(dbuf)
    up = 32 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(dbuf)
    down = 32 / (time.perf_counter() - t0)
    print(f"tunnel: up {up:.1f} MB/s, down {down:.1f} MB/s")

    dseg = jax.device_put(seg)
    dcol = jax.device_put(col)
    dkeys = jax.device_put(keys)

    t = timeit(sort2, dseg, dcol)
    print(f"sort2 (2-key i32 + payload) N={n}: {t*1e3:.1f} ms")
    t = timeit(sort1_i64, dkeys)
    print(f"sort1 (i64 + payload) N={n}: {t*1e3:.1f} ms")

    seg_s, col_s, perm = sort2(dseg, dcol)
    t = timeit(pair_ids, seg_s, col_s)
    print(f"pair_ids (cmp+cumsum): {t*1e3:.1f} ms")

    pid, new = pair_ids(seg_s, col_s)
    vals = jnp.asarray(rng.integers(0, 255, n).astype(np.uint8))
    t = timeit(scatter_u8, perm, vals)
    print(f"scatter u8 by perm: {t*1e3:.1f} ms")

    t = timeit(compact, seg_s, col_s, new, pid)
    print(f"compact (flag sort): {t*1e3:.1f} ms")

    n_pairs = int(jnp.sum(new))
    print(f"n_pairs={n_pairs}")


if __name__ == "__main__":
    main()
