"""Pallas TPU kernel for the eps-graph label-propagation sweep.

This is the codec's north-star kernel (BASELINE.json): DBSCAN(min_samples=1)
over palette colors == connected components of the eps-distance graph,
computed as iterated masked-min label sweeps.  The XLA formulation lives in
ops/cluster.py; this kernel keeps the whole sweep resident in VMEM:

  - palette points, labels and validity stay on-chip across the sweep
  - each grid step owns a row block, computes its (R, N) distance tile on the
    VPU via exact broadcast arithmetic (D=3, so the MXU matmul form would
    waste 40x padding lanes; the VPU form is also exactly integer-precise,
    which the eps comparison requires), masks by eps/validity/group and
    reduces to the blockwise min label

The convergence loop (sweep + pointer jumping) stays in XLA around the
kernel.  Falls back transparently to interpret mode off-TPU, so the same code
path is testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = jnp.iinfo(jnp.int32).max
_ROW_BLOCK = 256


def _sweep_kernel(eps2_ref, points_ref, labels_ref, valid_ref, groups_ref, out_ref):
    """One row block: new_label[i] = min_{j: d2(i,j)<=eps2, same group} label[j]."""
    i = pl.program_id(0)
    r0 = i * _ROW_BLOCK

    rows = points_ref[pl.ds(r0, _ROW_BLOCK), :]          # (R, 3)
    row_groups = groups_ref[0, pl.ds(r0, _ROW_BLOCK)]     # (R,)
    all_pts = points_ref[:, :]                            # (N, 3)
    labels = labels_ref[0, :]                             # (N,)
    valid = valid_ref[0, :]                               # (N,)
    groups = groups_ref[0, :]                             # (N,)
    eps2 = eps2_ref[0, 0]

    # Exact distances on the VPU: per-channel broadcast squares (D = 3).
    d2 = jnp.zeros((_ROW_BLOCK, all_pts.shape[0]), jnp.float32)
    for c in range(3):
        diff = rows[:, c][:, None] - all_pts[:, c][None, :]
        d2 = d2 + diff * diff

    adj = (
        (d2 <= eps2)
        & (valid[None, :] > 0)
        & (row_groups[:, None] == groups[None, :])
        & (row_groups[:, None] >= 0)
    )
    masked = jnp.where(adj, labels[None, :].astype(jnp.float32), jnp.float32(_INT_MAX))
    out_ref[0, :] = jnp.min(masked, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def eps_sweep_pallas(points, labels, valid, groups, eps2, *, interpret: bool = False):
    """One masked-min label sweep over all points.

    points: (N, 3) f32 with N a multiple of 256; labels/valid/groups: (N,).
    Returns (N,) int32 proposed labels (not yet min-combined with the input).
    """
    n = points.shape[0]
    grid = n // _ROW_BLOCK
    out = pl.pallas_call(
        _sweep_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            # Whole palette + label state stay resident in VMEM across the
            # sweep (N <= ~16k: ~300 KB total).
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROW_BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=interpret,
    )(
        eps2.reshape(1, 1),
        points,
        labels.reshape(1, -1),
        valid.reshape(1, -1).astype(jnp.int32),
        groups.reshape(1, -1),
    )
    return out[0]


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def eps_components_pallas(
    points: jax.Array,
    eps: jax.Array,
    valid: jax.Array,
    groups: jax.Array | None = None,
    *,
    max_iters: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """eps-graph connected components with the Pallas sweep kernel.

    Same contract as ops.cluster.eps_components: (n,) int32 min-index labels,
    invalid points get n.  max_iters=None uses n — guaranteed convergence
    (diameter <= n-1 sweeps); the while_loop exits early once labels settle.
    """
    n = points.shape[0]
    if max_iters is None:
        max_iters = n
    pad = (-n) % _ROW_BLOCK
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        if groups is not None:
            groups = jnp.pad(groups, (0, pad), constant_values=-1)
    m = points.shape[0]
    points = points.astype(jnp.float32)
    eps2 = jnp.asarray(eps, jnp.float32) ** 2
    if groups is None:
        groups = jnp.zeros((m,), jnp.int32)
    groups = jnp.where(valid, groups, -1)
    init = jnp.where(valid, jnp.arange(m, dtype=jnp.int32), _INT_MAX)

    def hop(lab):
        safe = jnp.where(lab < m, lab, 0)
        return jnp.where(valid, jnp.minimum(lab, lab[safe]), _INT_MAX)

    # Full path compression between sweeps (see ops/cluster.py eps_components):
    # ceil(log2 m) O(m) gather-hops bound the number of O(m^2) sweeps by the
    # hooking depth (~log n) instead of the eps-graph diameter.
    n_hops = max(1, (m - 1).bit_length())

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        proposed = eps_sweep_pallas(
            points, lab, valid, groups, eps2, interpret=interpret
        )
        new = jnp.where(valid, jnp.minimum(lab, proposed), _INT_MAX)
        new = jax.lax.fori_loop(0, n_hops, lambda _, l: hop(l), new)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return jnp.where(labels == _INT_MAX, n, labels)[:n]
