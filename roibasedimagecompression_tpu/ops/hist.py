"""Histogram / threshold statistics: 256-bin histogram, Otsu, masked percentile.

Replaces cv2.threshold(..., THRESH_OTSU) (edges.py:107,145) and the
np.percentile calls on masked gradient magnitudes (edges.py:118-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hist256(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a uint8 image.

    One-hot reduction instead of scatter-add: TPU scatters serialize (the
    SLIC/k-means center updates measured ~25 ms per scatter at comparable
    sizes), while XLA fuses the comparison into the row reduction."""
    flat = gray_u8.reshape(-1).astype(jnp.int32)
    oh = flat[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
    return jnp.sum(oh.astype(jnp.float32), axis=0)


def otsu_threshold(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold on a uint8 image; returns the bin value as float.

    cv2 maximizes between-class variance over thresholds t where a pixel is
    background if value <= t; first maximum wins.
    """
    h = hist256(gray_u8)
    total = jnp.sum(h)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(h)
    sum0 = jnp.cumsum(h * bins)
    mu_total = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1e-9)
    mu1 = (mu_total - sum0) / jnp.maximum(w1, 1e-9)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile(values[mask], q) with linear interpolation, jit-safe.

    Invalid entries sort to +inf; the interpolation index comes from the
    dynamic count of valid entries.
    """
    v = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n = jnp.sum(m.astype(jnp.int32))
    sorted_v = jnp.sort(jnp.where(m, v, jnp.inf))
    pos = (n.astype(jnp.float32) - 1.0) * (q / 100.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, v.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, v.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    val = sorted_v[lo] * (1.0 - frac) + sorted_v[jnp.minimum(hi, n - 1)] * frac
    return jnp.where(n > 0, val, 0.0)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.reshape(-1).astype(jnp.float32)
    v = values.reshape(-1).astype(jnp.float32)
    return jnp.sum(v * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_std(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mu = masked_mean(values, mask)
    var = masked_mean(values * values, mask) - mu * mu
    return jnp.sqrt(jnp.maximum(var, 0.0))


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_percentile(values, mask, 50.0)
