"""Euclidean distance transform via jump flooding — O(log n) gather passes.

Replaces cv2.distanceTransform(..., DIST_L2, 3) call sites (encoder/ROI/
thin_regions2.py:165, small_regions.py:131,150).  Note cv2 with maskSize=3 is
a chamfer *approximation* (weights 0.955/1.3693); jump flooding computes the
exact L2 distance, which only sharpens the thinness statistics derived from it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def distance_transform_l2(foreground: jnp.ndarray) -> jnp.ndarray:
    """Distance from each foreground pixel to the nearest background pixel.

    foreground: (h, w) bool (True = inside).  Background pixels get 0.

    Implementation note: the JFA step loop is a lax.fori_loop (not an unrolled
    Python loop) — unrolling lets XLA fuse/duplicate the pad+slice chains of
    consecutive steps, which blows up to exponential recompute.  The loop body
    pads by the static maximum step once and dynamic-slices at traced offsets.
    """
    h, w = foreground.shape
    fg = foreground.astype(jnp.bool_)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 20)
    seed_y = jnp.where(fg, big, yy)
    seed_x = jnp.where(fg, big, xx)

    def d2(sy, sx):
        dy = (sy - yy).astype(jnp.float32)
        dx = (sx - xx).astype(jnp.float32)
        return dy * dy + dx * dx

    # Static maximum jump; per-iteration jump k = max_step >> i (traced).
    max_step = 1
    n_steps = 1
    while max_step < max(h, w):
        max_step *= 2
        n_steps += 1
    pad = max_step

    def body(i, state):
        sy, sx = state
        k = jnp.int32(max_step) >> i
        py = jnp.pad(sy, pad, constant_values=big)
        px = jnp.pad(sx, pad, constant_values=big)
        best = d2(sy, sx)
        for dr_s, dc_s in (
            (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)
        ):
            dr = k * dr_s
            dc = k * dc_s
            cy = jax.lax.dynamic_slice(py, (pad + dr, pad + dc), (h, w))
            cx = jax.lax.dynamic_slice(px, (pad + dr, pad + dc), (h, w))
            cand = d2(cy, cx)
            better = cand < best
            sy = jnp.where(better, cy, sy)
            sx = jnp.where(better, cx, sx)
            best = jnp.where(better, cand, best)
        return sy, sx

    sy, sx = jax.lax.fori_loop(0, n_steps, body, (seed_y, seed_x))
    dist = jnp.sqrt(d2(sy, sx))
    return jnp.where(fg, dist, 0.0)
