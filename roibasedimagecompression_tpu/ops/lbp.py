"""Local Binary Patterns (uniform, P=8, R=1) as a vectorized JAX op.

Replaces skimage.feature.local_binary_pattern at split_score.py:76: 8 neighbors
on the unit circle (4 axis-aligned, 4 bilinear-interpolated diagonals),
thresholded >= center; 'uniform' coding maps patterns with <= 2 circular
transitions to their popcount and everything else to P+1 = 9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _neighbor_offsets(p: int = 8, r: float = 1.0) -> np.ndarray:
    i = np.arange(p)
    rr = -r * np.sin(2 * np.pi * i / p)
    cc = r * np.cos(2 * np.pi * i / p)
    # skimage snaps near-integer coordinates to integers.
    rr = np.where(np.abs(rr - np.round(rr)) < 1e-8, np.round(rr), rr)
    cc = np.where(np.abs(cc - np.round(cc)) < 1e-8, np.round(cc), cc)
    return np.stack([rr, cc], axis=1)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img sampled at (r+dy, c+dx), zero outside (skimage mode 'C', cval 0)."""
    h, w = img.shape
    padded = jnp.pad(img, ((1, 1), (1, 1)))
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))


@jax.jit
def local_binary_pattern_uniform(gray: jnp.ndarray) -> jnp.ndarray:
    """(h, w) float image -> (h, w) int32 uniform LBP codes in [0, 9]."""
    gray = gray.astype(jnp.float32)
    offsets = _neighbor_offsets()
    bits = []
    for dy, dx in offsets:
        fy, fx = int(np.floor(dy)), int(np.floor(dx))
        wy, wx = float(dy - fy), float(dx - fx)
        if wy == 0.0 and wx == 0.0:
            sample = _shift(gray, fy, fx)
        else:
            s00 = _shift(gray, fy, fx)
            s01 = _shift(gray, fy, fx + 1)
            s10 = _shift(gray, fy + 1, fx)
            s11 = _shift(gray, fy + 1, fx + 1)
            sample = (
                s00 * (1 - wy) * (1 - wx)
                + s01 * (1 - wy) * wx
                + s10 * wy * (1 - wx)
                + s11 * wy * wx
            )
            # skimage treats |interpolated - center| < 1e-7-ish as equal via
            # exact float compare; keep plain >= (matches to float precision).
        bits.append(sample >= gray)
    b = jnp.stack(bits, axis=0)  # (8, h, w) bool
    transitions = jnp.zeros(gray.shape, jnp.int32)
    for i in range(8):
        transitions = transitions + (b[i] != b[(i + 1) % 8]).astype(jnp.int32)
    popcount = jnp.sum(b.astype(jnp.int32), axis=0)
    return jnp.where(transitions <= 2, popcount, 9)


@functools.partial(jax.jit, static_argnames=("bins",))
def masked_histogram_density(
    values: jnp.ndarray, mask: jnp.ndarray, low: float, high: float, bins: int
) -> jnp.ndarray:
    """np.histogram(values[mask], bins, range=(low, high), density=True),
    jit-safe (mask instead of boolean indexing)."""
    v = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    width = (high - low) / bins
    idx = jnp.clip(jnp.floor((v - low) / width), 0, bins - 1).astype(jnp.int32)
    # np.histogram puts values == high into the last bin; values outside the
    # range are dropped entirely.
    in_range = (v >= low) & (v <= high) & m
    # One-hot reduction, not scatter-add (TPU scatters serialize; the fused
    # compare+reduce never materializes the (n, bins) one-hot).
    oh = (idx[:, None] == jnp.arange(bins, dtype=jnp.int32)[None, :]) & in_range[:, None]
    counts = jnp.sum(oh.astype(jnp.float32), axis=0)
    total = jnp.sum(counts)
    return counts / jnp.maximum(total * width, 1e-30)
