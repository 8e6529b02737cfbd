"""Pallas TPU kernel for the SLIC assignment step.

The SLIC Lloyd loop's hot op is the (pixels x centers) nearest-center
assignment.  The XLA formulation (ops/slic._slic_core `assign`) materializes
the d2 matrix in HBM through a chunked lax.map — measured ~32 ms per
iteration for an (8, 196k, 256) bucket, i.e. ~85% of the whole SLIC stage.
This kernel keeps everything in VMEM: each grid step owns a pixel tile,
computes its (TILE, K) squared distances on the VPU via per-dimension
broadcast accumulation (D = 5, so the MXU matmul form wastes 25x padding
lanes), and reduces straight to the argmin index — d2 never touches HBM.

Centers carry the 1e6 invalid-row sentinel from _slic_core's init (an
invalid center's distance is ~1e12, far above any real 5-D color+space
distance of <= ~5e5), so no validity operand is needed.

Ties resolve to the first (lowest-index) center, matching jnp.argmin.
Falls back to interpret mode off-TPU so the CPU mesh can exercise it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048


def _assign_kernel(feats_ref, centers_ref, out_ref):
    f = feats_ref[...]  # (TILE, 5)
    c = centers_ref[...]  # (K, 5)
    k = c.shape[0]
    d2 = jnp.zeros((f.shape[0], k), jnp.float32)
    for d in range(f.shape[1]):
        diff = f[:, d][:, None] - c[:, d][None, :]
        d2 = d2 + diff * diff
    dmin = jnp.min(d2, axis=1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    first = jnp.min(jnp.where(d2 == dmin, idx, k), axis=1)
    # Lane-aligned (TILE/128, 128) output layout (a 1-D block would violate
    # the (8, 128) tile constraint once vmap lifts the batch dim).
    out_ref[...] = first.astype(jnp.int32).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def slic_assign_pallas(feats: jnp.ndarray, centers: jnp.ndarray, *, interpret: bool = False):
    """Nearest-center ids for (MP, 5) features against (K, 5) centers.

    MP must be a multiple of 2048 (callers already pad to the chunk grid).
    Safe under vmap (the batch dimension lifts into the pallas grid).
    """
    mp, d = feats.shape
    k = centers.shape[0]
    assert mp % _TILE == 0, mp
    out = pl.pallas_call(
        _assign_kernel,
        out_shape=jax.ShapeDtypeStruct((mp // 128, 128), jnp.int32),
        grid=(mp // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(feats, centers)
    return out.reshape(mp)
