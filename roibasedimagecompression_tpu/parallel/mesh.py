"""Multi-chip scaling: device meshes, sharded batch encode, spatial partitioning.

The reference is a single-process tool whose only concurrency is a thread pool
(encoder/compression/clustering.py:439-467).  The TPU framework scales two
ways instead:

  - data parallelism: independent images sharded over the 'data' mesh axis
    (the Kodak sweep / 1k-image stream configs in BASELINE.json)
  - spatial partitioning: the stencil frontend (Sobel/NMS/density convs) is
    sharded over image rows on the 'space' axis; XLA SPMD inserts the halo
    exchanges for the convolutions, and reductions ride psum over ICI

Clustering operates on small palettes, so it runs replicated after a gather —
sharding it would put collectives inside the while_loop hot path for no win.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roibasedimagecompression_tpu.models import pipeline_jit


def make_mesh(n_devices: int | None = None, space: int = 1) -> Mesh:
    """Build a (data, space) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % space != 0:
        raise ValueError(f"n_devices {n_devices} not divisible by space {space}")
    return Mesh(devices.reshape(n_devices // space, space), ("data", "space"))


def sharded_batch_analysis(mesh: Mesh, images: np.ndarray, **kw):
    """Run the device encoder core over a batch sharded on ('data', 'space').

    images: (B, h, w, 3) uint8 with B divisible by the data axis and h by the
    space axis.  Returns the analysis dict with batch-sharded leaves.
    """
    sharding = NamedSharding(mesh, P("data", "space"))
    x = jax.device_put(jnp.asarray(images), sharding)

    @jax.jit
    def run(imgs):
        out = pipeline_jit.batched_analysis_step(imgs, **kw)
        # Batch-level quality statistic reduced across the whole mesh: mean
        # edge coverage (exercises a cross-device reduction on the output).
        out["edge_fraction"] = jnp.mean(out["edges"].astype(jnp.float32))
        return out

    with mesh:
        return run(x)


def sharded_stencil_frontend(mesh: Mesh, images: np.ndarray):
    """Spatially-partitioned conv frontend: gradient magnitude + local density
    with rows sharded over 'space' and batch over 'data'.

    XLA SPMD materializes the halo exchanges for the 3x3/boxfilter stencils —
    this is the codec's analogue of sequence parallelism (SURVEY.md §2.8).
    """
    from roibasedimagecompression_tpu.ops import colors as COL
    from roibasedimagecompression_tpu.ops import conv as CONV

    sharding = NamedSharding(mesh, P("data", "space", None, None))
    x = jax.device_put(jnp.asarray(images), sharding)

    @jax.jit
    def run(imgs):
        def one(im):
            gray = COL.rgb_to_gray_cv2(im).astype(jnp.float32)
            gx, gy = CONV.sobel_cv2(gray)
            mag = jnp.abs(gx) + jnp.abs(gy)
            density = CONV.box_density(mag > 64.0, 15)
            return mag, density

        mag, density = jax.vmap(one)(imgs)
        mag = jax.lax.with_sharding_constraint(
            mag, NamedSharding(mesh, P("data", "space", None))
        )
        return mag, density

    with mesh:
        return run(x)


def data_parallel_encode_throughput(mesh: Mesh, images: np.ndarray, repeats: int = 3):
    """Timed DP run of the device core; returns (seconds_per_batch, out)."""
    import time

    out = sharded_batch_analysis(mesh, images)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = sharded_batch_analysis(mesh, images)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats, out
