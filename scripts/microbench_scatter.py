"""Microbenchmark: scatter (segment_sum) vs compare/matmul forms of the two
hot kernels' reductions.

1. split-score masked histograms (10 + 32 bins over ~400k px) — scatter vs
   broadcast-compare reduction.
2. SLIC Lloyd update (sums into <= 64 centers) — scatter vs one-hot matmul.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def hist_scatter(values, mask, bins):
    v = values.reshape(values.shape[0], -1)
    m = mask.reshape(mask.shape[0], -1)
    idx = jnp.clip(jnp.floor(v), 0, bins - 1).astype(jnp.int32)

    def one(vv, mm, ii):
        return jax.ops.segment_sum(
            mm.astype(jnp.float32), jnp.where(mm, ii, bins), num_segments=bins + 1
        )[:bins]

    return jax.vmap(one)(v, m, idx)


def hist_compare(values, mask, bins):
    v = values.reshape(values.shape[0], -1)
    m = mask.reshape(mask.shape[0], -1)
    idx = jnp.clip(jnp.floor(v), 0, bins - 1).astype(jnp.int32)
    sel = (idx[:, None, :] == jnp.arange(bins)[None, :, None]) & m[:, None, :]
    return jnp.sum(sel.astype(jnp.float32), axis=2)


def lloyd_scatter(feats, labels, valid, k):
    def one(f, l, v):
        lv = jnp.where(v, l, k)
        sums = jax.ops.segment_sum(
            jnp.where(v[:, None], f, 0.0), lv, num_segments=k + 1
        )[:k]
        counts = jax.ops.segment_sum(v.astype(jnp.float32), lv, num_segments=k + 1)[:k]
        return sums, counts

    return jax.vmap(one)(feats, labels, valid)


def lloyd_matmul(feats, labels, valid, k):
    def one(f, l, v):
        oh = (l[:, None] == jnp.arange(k)[None, :]) & v[:, None]
        ohf = oh.astype(jnp.float32)
        sums = jax.lax.dot_general(
            ohf, f, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(ohf, axis=0)
        return sums, counts

    return jax.vmap(one)(feats, labels, valid)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    B, H, W = 12, 768, 512
    vals = jnp.asarray(rng.random((B, H, W), np.float32) * 9.99)
    mask = jnp.asarray(rng.random((B, H, W)) < 0.6)
    for bins in (10, 32):
        f1 = jax.jit(lambda v, m, b=bins: hist_scatter(v, m, b))
        f2 = jax.jit(lambda v, m, b=bins: hist_compare(v, m, b))
        t1 = timeit(f1, vals, mask)
        t2 = timeit(f2, vals, mask)
        print(f"hist bins={bins}: scatter {t1*1000:.1f} ms vs compare {t2*1000:.1f} ms", flush=True)

    n, k = 221184, 64  # 576x384 SLIC working bucket
    feats = jnp.asarray(rng.random((B, n, 5), np.float32))
    labels = jnp.asarray(rng.integers(0, k, (B, n)).astype(np.int32))
    valid = jnp.asarray(rng.random((B, n)) < 0.8)
    f1 = jax.jit(lambda f, l, v: lloyd_scatter(f, l, v, k))
    f2 = jax.jit(lambda f, l, v: lloyd_matmul(f, l, v, k))
    t1 = timeit(f1, feats, labels, valid)
    t2 = timeit(f2, feats, labels, valid)
    print(f"lloyd k={k}: scatter {t1*1000:.1f} ms vs one-hot matmul {t2*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
