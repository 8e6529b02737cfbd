"""Edge-preserving bilateral filter (decoder post-processing helper).

Replaces cv2.bilateralFilter in apply_edge_preserving_blur
(decoder/uncompression/test.py:6-27, an optional reconstruction smoother):
gaussian spatial weights x gaussian range weights over a (2r+1)^2 window,
expressed as a stack of shifted multiplies so XLA fuses it into one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("diameter",))
def bilateral_filter(
    image: jnp.ndarray,
    diameter: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
) -> jnp.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) uint8 bilateral-smoothed."""
    x = image.astype(jnp.float32)
    h, w, _ = x.shape
    r = diameter // 2
    pad = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="edge")

    inv_2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    inv_2sc = 1.0 / (2.0 * sigma_color * sigma_color)

    num = jnp.zeros_like(x)
    den = jnp.zeros((h, w, 1), jnp.float32)
    for dr in range(-r, r + 1):
        for dc in range(-r, r + 1):
            if dr * dr + dc * dc > r * r:
                continue  # cv2 uses a circular window within the diameter
            shifted = jax.lax.dynamic_slice(pad, (r + dr, r + dc, 0), (h, w, 3))
            s_w = jnp.exp(jnp.float32(-(dr * dr + dc * dc)) * inv_2ss)
            color_d2 = jnp.sum((shifted - x) ** 2, axis=2, keepdims=True)
            w_total = s_w * jnp.exp(-color_d2 * inv_2sc)
            num = num + shifted * w_total
            den = den + w_total
    out = num / jnp.maximum(den, 1e-12)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
