"""Zhang-Suen skeletonization as an iterative masked device update.

Replaces cv2.ximgproc.thinning at encoder/ROI/small_regions.py:164 (the
skeleton-based connection strategy).  Each Zhang-Suen sub-iteration is a pure
stencil: 8-neighborhood counts + transition counts + direction-specific
conditions, looped under lax.while_loop until no pixel changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighbors(x: jnp.ndarray):
    """P2..P9 clockwise from north (Zhang-Suen convention)."""
    h, w = x.shape
    p = jnp.pad(x, 1)

    def s(dr, dc):
        return jax.lax.dynamic_slice(p, (1 + dr, 1 + dc), (h, w))

    return [
        s(-1, 0),   # P2 N
        s(-1, 1),   # P3 NE
        s(0, 1),    # P4 E
        s(1, 1),    # P5 SE
        s(1, 0),    # P6 S
        s(1, -1),   # P7 SW
        s(0, -1),   # P8 W
        s(-1, -1),  # P9 NW
    ]


def _subiter(x: jnp.ndarray, first: bool) -> jnp.ndarray:
    n = _neighbors(x.astype(jnp.int32))
    b = sum(n)
    ring = n + [n[0]]
    a = sum(
        ((ring[i] == 0) & (ring[i + 1] == 1)).astype(jnp.int32) for i in range(8)
    )
    p2, p3, p4, p5, p6, p7, p8, p9 = n
    if first:
        c1 = (p2 * p4 * p6) == 0
        c2 = (p4 * p6 * p8) == 0
    else:
        c1 = (p2 * p4 * p8) == 0
        c2 = (p2 * p6 * p8) == 0
    remove = (
        (x > 0)
        & (b >= 2)
        & (b <= 6)
        & (a == 1)
        & c1
        & c2
    )
    return jnp.where(remove, 0, x)


@jax.jit
def zhang_suen_thinning(mask: jnp.ndarray, max_iters: int = 256) -> jnp.ndarray:
    """Binary skeleton via Zhang-Suen; input/output (h, w) bool."""
    x0 = mask.astype(jnp.int32)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        x, _, it = state
        y = _subiter(x, True)
        y = _subiter(y, False)
        return y, jnp.any(y != x), it + 1

    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.bool_(True), 0))
    return x > 0
