"""CLAHE (contrast-limited adaptive histogram equalization) on device.

Replaces cv2.createCLAHE at encoder/enhancer/clahe.py:68-72.  The reference
applies CLAHE to the masked shadow pixels reshaped to an n x 1 column, which
with a 16x16 tile grid degenerates to 1-D CLAHE over 16 row tiles — the
faithful shadow path here (`clahe_1d`).  A standard 2-D tiled variant is
provided for the enhancer's full-image modes (clahe.py:115-184).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _clipped_cdf_lut(hist: jnp.ndarray, clip_limit_abs: jnp.ndarray, n_pixels):
    """cv2 CLAHE per-tile LUT: clip histogram, redistribute excess uniformly,
    then scale the CDF to 0..255."""
    clipped = jnp.minimum(hist, clip_limit_abs)
    excess = jnp.sum(hist - clipped)
    clipped = clipped + excess / 256.0
    cdf = jnp.cumsum(clipped)
    scale = 255.0 / jnp.maximum(n_pixels, 1)
    return jnp.clip(jnp.round(cdf * scale), 0, 255)


@functools.partial(jax.jit, static_argnames=("n_tiles",))
def clahe_1d(values: jnp.ndarray, clip_limit: float = 3.0, n_tiles: int = 16) -> jnp.ndarray:
    """1-D CLAHE over a uint8 vector, n_tiles row tiles, linear interpolation
    between neighboring tile LUTs (cv2 semantics for an n x 1 image)."""
    n = values.shape[0]
    v = values.astype(jnp.int32)
    tile_size = -(-n // n_tiles)  # ceil
    padded_n = tile_size * n_tiles
    pad = padded_n - n
    # cv2 pads with reflected border rows to reach a grid multiple.
    vp = jnp.concatenate([v, jnp.flip(v[n - pad - 1 : n - 1])]) if pad else v
    tiles = vp.reshape(n_tiles, tile_size)

    clip_abs = jnp.maximum(clip_limit * tile_size / 256.0, 1.0)

    def tile_lut(tile):
        hist = jax.ops.segment_sum(
            jnp.ones_like(tile, jnp.float32), tile, num_segments=256
        )
        return _clipped_cdf_lut(hist, clip_abs, tile_size)

    luts = jax.vmap(tile_lut)(tiles)  # (n_tiles, 256)

    idx = jnp.arange(n, dtype=jnp.float32)
    # Tile centers at (t + 0.5) * tile_size.
    pos = idx / tile_size - 0.5
    t0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_tiles - 1)
    t1 = jnp.clip(t0 + 1, 0, n_tiles - 1)
    frac = jnp.clip(pos - t0, 0.0, 1.0)
    lo = luts[t0, v]
    hi = luts[t1, v]
    out = lo * (1.0 - frac) + hi * frac
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("grid",))
def clahe_2d(gray: jnp.ndarray, clip_limit: float = 3.0, grid: int = 8) -> jnp.ndarray:
    """Standard 2-D tiled CLAHE over a (h, w) uint8 image."""
    h, w = gray.shape
    th = -(-h // grid)
    tw = -(-w // grid)
    ph, pw = th * grid - h, tw * grid - w
    g = gray.astype(jnp.int32)
    gp = jnp.pad(g, ((0, ph), (0, pw)), mode="reflect")
    tiles = gp.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(
        grid * grid, th * tw
    )
    clip_abs = jnp.maximum(clip_limit * th * tw / 256.0, 1.0)

    def tile_lut(tile):
        hist = jax.ops.segment_sum(
            jnp.ones_like(tile, jnp.float32), tile, num_segments=256
        )
        return _clipped_cdf_lut(hist, clip_abs, th * tw)

    luts = jax.vmap(tile_lut)(tiles).reshape(grid, grid, 256)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    py = yy / th - 0.5
    px = xx / tw - 0.5
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    fx = jnp.clip(px - x0, 0.0, 1.0)

    v00 = luts[y0, x0, g]
    v01 = luts[y0, x1, g]
    v10 = luts[y1, x0, g]
    v11 = luts[y1, x1, g]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
