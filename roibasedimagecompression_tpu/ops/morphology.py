"""Binary morphology on device: dilate / erode / open / close with arbitrary
structuring elements.

Replaces the cv2 morphology call sites (encoder/ROI/small_regions.py:10,60-66,
175-194; roi.py:813-820,848).  Binary dilation/erosion are expressed as a
hit-count convolution so XLA maps them onto the conv units; border semantics
match cv2's defaults (border never dilates, never erodes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) bit-compatible."""
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    out = np.zeros((ksize, ksize), bool)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            if r:
                dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            else:
                dx = c
            j1, j2 = max(c - dx, 0), min(c + dx + 1, ksize)
            out[i, j1:j2] = True
    return out


def rect_kernel(ksize: int) -> np.ndarray:
    return np.ones((ksize, ksize), bool)


def cross_kernel() -> np.ndarray:
    """scipy.ndimage default structure (connectivity-1 cross)."""
    k = np.zeros((3, 3), bool)
    k[1, :] = True
    k[:, 1] = True
    return k


def _hit_count(x: jnp.ndarray, se: jnp.ndarray, pad_value: float) -> jnp.ndarray:
    kh, kw = se.shape
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(
        x.astype(jnp.float32),
        ((ph, kh - 1 - ph), (pw, kw - 1 - pw)),
        constant_values=pad_value,
    )
    # Correlation footprint (cv2 morphology does not mirror the SE).
    # Default precision is fine: mask and SE entries are 0/1, exact in the
    # TPU's bf16 multiply, and accumulation is f32.
    out = jax.lax.conv_general_dilated(
        x[None, None],
        se.astype(jnp.float32)[None, None],
        window_strides=(1, 1),
        padding="VALID",
    )
    return out[0, 0]


def dilate(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation; outside-image pixels never contribute (cv2 default)."""
    se_j = jnp.asarray(np.asarray(se, bool))
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        out = _hit_count(out, se_j, 0.0) > 0.5
    return out


def erode(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion; outside-image pixels count as foreground (cv2 default)."""
    se_np = np.asarray(se, bool)
    se_j = jnp.asarray(se_np)
    total = float(se_np.sum())
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        out = _hit_count(out, se_j, 1.0) > total - 0.5
    return out


def close(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return erode(dilate(mask, se), se)


def open_(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return dilate(erode(mask, se), se)


@functools.partial(jax.jit, static_argnames=("iterations",))
def binary_dilation_scipy(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """scipy.ndimage.binary_dilation with the default cross structure
    (extract_roi_nonroi buffer zones, roi.py:697-698)."""
    return dilate(mask, cross_kernel(), iterations=iterations)
