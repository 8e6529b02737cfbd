"""Row-sharding helpers for the batched kernel paths (leaf module, no model
imports — safe to use from ops/ and models/ without cycles).

Every bucketed batch in the codec (split-score crops, SLIC regions, eps-CC
palette problems, k-means splits) is embarrassingly parallel over its rows, so
data parallelism is one device_put with a ('data', None, ...) NamedSharding:
XLA SPMD runs each row's computation on its shard owner with no collectives
(the while_loop convergence `any` reduces with one small psum per sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def data_axis_size(mesh) -> int:
    """Size of the mesh's 'data' axis (1 when mesh is None)."""
    if mesh is None:
        return 1
    return int(mesh.shape["data"])


def pad_rows(b: int, mesh) -> int:
    """Round a power-of-four padded batch count up to a multiple of the data
    axis so rows shard evenly."""
    d = data_axis_size(mesh)
    return -(-b // d) * d


def shard_rows(x, mesh):
    """Device-put a batched array with rows sharded over the 'data' axis.

    Row count must already be a multiple of the data axis size (pad_rows).
    With mesh=None this is a plain jnp.asarray — the single-chip path.
    """
    x = jnp.asarray(x)
    if mesh is None:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def collect_all(results):
    """Download a list of device arrays with ONE round trip of latency.

    The tunneled chip pays ~33 ms per synchronous per-array fetch even when
    the result is already computed (measured: 20 ready results cost 654 ms
    fetched one-by-one vs 64 ms with async host copies).  Starting every
    copy first lets the round trips overlap; np.asarray then finds the host
    buffer already (or nearly) filled.  Pass the raw jax arrays straight
    from the dispatched calls; returns a list of numpy arrays in order.
    """
    import numpy as np

    started = []
    for r in results:
        try:
            r.copy_to_host_async()
        except AttributeError:
            pass  # numpy / non-jax entries pass through
        started.append(r)
    return [np.asarray(r) for r in started]
