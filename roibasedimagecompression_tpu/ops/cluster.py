"""Palette clustering kernels: eps-connectivity components and k-means.

The reference clusters palettes with sklearn DBSCAN(min_samples=1) — which is
exactly single-linkage connected components of the eps-threshold graph — and
splits oversized clusters with recursive KMeans (encoder/compression/
clustering.py:160-437, 720-801).  Irregular neighbor expansion does not map to
a TPU, so the eps-graph components are computed as masked dense distance sweeps:
tiled pairwise distances (MXU matmul form) + iterative min-label propagation
with pointer jumping.  All kernels are pure, padded and vmap-friendly so whole
batches of segment palettes can be clustered in one device call.

Scale note: the reference switches DBSCAN -> MiniBatchKMeans at >=10k colors
(clustering.py:207), so eps-components only ever sees n < 10k; k-means handles
the large path with chunked assignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from roibasedimagecompression_tpu.utils import dispatch as DISPATCH

_INT_MAX = jnp.iinfo(jnp.int32).max


def _sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(m, d) x (n, d) -> (m, n) squared euclidean distances via MXU matmul."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    # HIGHEST precision: palette points are integer-valued (u8 colors), so the
    # expansion |a|^2+|b|^2-2ab is *exact* in f32 — but only if the MXU doesn't
    # demote the product to bf16 (default TPU matmul precision flips borderline
    # eps comparisons).
    ab = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "max_iters"))
def eps_components(
    points: jax.Array,
    eps: jax.Array,
    valid: jax.Array,
    groups: jax.Array | None = None,
    *,
    chunk: int = 512,
    max_iters: int | None = None,
) -> jax.Array:
    """Connected components of the eps-distance graph (DBSCAN, min_samples=1).

    Args:
      points: (n, d) float32, padded; invalid rows may hold anything.
      eps: scalar distance threshold (same scale as points).
      valid: (n,) bool validity mask.
      groups: optional (n,) int32; edges only connect equal group ids.  This is
        how many segment palettes cluster in ONE call: concatenate them and tag
        each point with its segment id (block-diagonal adjacency).
      max_iters: iteration cap; None (default) uses n, which GUARANTEES
        convergence (each sweep propagates the min label one graph hop, so
        diameter <= n-1 sweeps always suffice; the while_loop exits as soon as
        labels stop changing, so typical cost is unchanged).
    Returns:
      (n,) int32 labels; each component is labelled by its minimum point index.
      Invalid points get n.
    """
    n, _ = points.shape
    if max_iters is None:
        max_iters = n
    pad = (-n) % chunk
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

    def sweep(labels):
        def one_chunk(start):
            rows = jax.lax.dynamic_slice_in_dim(points, start, chunk)
            g = jax.lax.dynamic_slice_in_dim(groups, start, chunk)
            d2 = _sq_dists(rows, points)
            adj = (d2 <= eps2) & (g[:, None] == groups[None, :]) & (g[:, None] >= 0)
            return jnp.min(jnp.where(adj, labels[None, :], _INT_MAX), axis=1)

        starts = jnp.arange(0, m, chunk)
        new = jax.lax.map(one_chunk, starts).reshape(m)
        return jnp.where(valid, jnp.minimum(labels, new), _INT_MAX)

    def hop(labels):
        # Pointer jumping: labels[i] <- labels[labels[i]] (log-depth shortcuts).
        safe = jnp.where(labels < m, labels, 0)
        return jnp.where(valid, jnp.minimum(labels, labels[safe]), _INT_MAX)

    # Pointer-jump to FIXPOINT between sweeps (ceil(log2 m) hops fully
    # compress any label chain; each hop is an O(m) gather against the
    # sweep's O(m^2/chunk) distance passes).  With only a constant number of
    # hops per round, a chain-shaped eps graph needs O(diameter) expensive
    # sweeps — measured 2.1 s for one (64, 9999) bucket on v5e; full
    # compression bounds the sweep count by O(log n) hooking rounds.
    n_hops = max(1, (m - 1).bit_length())

    def hops(labels):
        return jax.lax.fori_loop(0, n_hops, lambda _, l: hop(l), labels)

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = hops(sweep(labels))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    # Canonicalize pad sentinel to n for the caller's original length.
    return jnp.where(labels == _INT_MAX, n, labels)[:n]


@functools.partial(jax.jit, static_argnames=("k_max", "iters", "chunk", "plusplus"))
def kmeans(
    points: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    *,
    k_max: int,
    iters: int = 25,
    seed: int = 42,
    chunk: int = 2048,
    plusplus: bool = True,
    init_centers: jax.Array | None = None,
    weights: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd k-means with k-means++ (or seeded-random) init, padded shapes.

    Args:
      points: (n, d) float32 padded; valid: (n,) bool; k: dynamic cluster count
        (<= k_max, static padding bound).
      init_centers: optional (k_max, d) explicit initial centers (rows >= k
        are masked by center_valid); skips the ++/random init entirely —
        the ++ init is SEQUENTIAL in k_max and dominates the split kernels'
        device latency, so callers with a cheap stratified host init
        (PCA-chunk means) pass it here.
      weights: optional (n,) float32 per-point weights.  Weighted Lloyd:
        ++ sampling goes proportional to w*d^2 and center updates become
        weighted means (assignment is unchanged).  The palette-split callers
        pass per-color PIXEL counts so split centers minimize pixel-level
        MSE, not palette-entry MSE.
    Returns:
      (labels (n,) int32 in [0, k), centers (k_max, d) float32).
    Replaces sklearn KMeans/MiniBatchKMeans at clustering.py:211,751 — the
    assignment step is a chunked MXU matmul, the update a segment-sum.
    """
    n, d = points.shape
    pad = (-n) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        if weights is not None:
            weights = jnp.pad(weights, (0, pad))
    m = points.shape[0]
    points = points.astype(jnp.float32)
    w_pts = None
    if weights is not None:
        w_pts = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    key = jax.random.PRNGKey(seed)
    k = jnp.asarray(k, jnp.int32)
    center_valid = jnp.arange(k_max) < k
    big = jnp.float32(3.4e38)

    n_valid = jnp.sum(valid.astype(jnp.int32))

    if init_centers is not None:
        centers = init_centers.astype(jnp.float32)
    elif plusplus:
        # k-means++: first center sampled uniformly, the rest proportional to
        # the squared distance to the nearest chosen center.
        def init_step(i, state):
            centers, min_d2, key = state
            key, sub = jax.random.split(key)
            mass = min_d2 if w_pts is None else min_d2 * w_pts
            logits = jnp.where(valid & (mass > 0), jnp.log(mass + 1e-20), -jnp.inf)
            # Degenerate case (all remaining distances zero): uniform over valid.
            logits = jnp.where(
                jnp.any(jnp.isfinite(logits)), logits, jnp.where(valid, 0.0, -jnp.inf)
            )
            idx = jax.random.categorical(sub, logits)
            new_center = points[idx]
            centers = jnp.where(i < k, centers.at[i].set(new_center), centers)
            d2_new = jnp.sum((points - new_center[None, :]) ** 2, axis=1)
            min_d2 = jnp.where(i < k, jnp.minimum(min_d2, d2_new), min_d2)
            return centers, min_d2, key

        key, sub = jax.random.split(key)
        first_logits = (
            jnp.where(valid, 0.0, -jnp.inf)
            if w_pts is None
            else jnp.where(valid & (w_pts > 0), jnp.log(w_pts + 1e-20), -jnp.inf)
        )
        first = jax.random.categorical(sub, first_logits)
        centers0 = jnp.zeros((k_max, d), jnp.float32).at[0].set(points[first])
        min_d2 = jnp.sum((points - points[first][None, :]) ** 2, axis=1)
        min_d2 = jnp.where(valid, min_d2, 0.0)
        # Dynamic trip count: steps i >= k are masked no-ops (the key splits
        # they consume feed nothing earlier), so bounding the loop by the
        # REAL k is bit-identical and cuts the init's sequential depth —
        # k_max is a pow2 shape bucket, often several times k, and this
        # sequential chain dominates the split kernels' device latency.
        centers, _, _ = jax.lax.fori_loop(
            1, jnp.maximum(k, 1), init_step, (centers0, min_d2, key)
        )
    else:
        # Seeded random distinct-point init (large-k path, one shot).
        scores = jax.random.uniform(key, (m,)) + jnp.where(valid, 0.0, 2.0)
        order = jnp.argsort(scores)  # valid points first, random order
        # k_max may exceed the padded point count (shape-bucket quantization);
        # wrap around — surplus centers are masked by center_valid.
        take = order[jnp.arange(k_max) % m]
        centers = points[take]

    def assign(centers):
        def one_chunk(start):
            rows = jax.lax.dynamic_slice_in_dim(points, start, chunk)
            d2 = _sq_dists(rows, centers)
            d2 = jnp.where(center_valid[None, :], d2, big)
            return jnp.argmin(d2, axis=1).astype(jnp.int32)

        starts = jnp.arange(0, m, chunk)
        return jax.lax.map(one_chunk, starts).reshape(m)

    def _update(labels, centers):
        # Center update via chunked one-hot MXU contractions — TPU
        # scatter-adds (segment_sum) dominate the iteration otherwise
        # (measured ~25 ms/iter vs sub-ms at the SLIC bucket shapes; same
        # structure here).
        kids = jnp.arange(k_max)[None, :]

        def upd_chunk(carry, start):
            sums, counts = carry
            rows = jax.lax.dynamic_slice_in_dim(points, start, chunk)
            ids = jax.lax.dynamic_slice_in_dim(labels, start, chunk)
            v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
            oh = ((ids[:, None] == kids) & v[:, None]).astype(jnp.float32)
            if w_pts is not None:
                oh = oh * jax.lax.dynamic_slice_in_dim(w_pts, start, chunk)[:, None]
            sums = sums + jax.lax.dot_general(
                oh, rows,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: with weights, oh entries are pixel counts (> 2^8,
                # inexact in the TPU's default bf16 multiply); exact centers
                # keep TPU bytes identical to the f32 CPU path.
                precision=jax.lax.Precision.HIGHEST,
            )
            return (sums, counts + oh.sum(axis=0)), None

        init = (
            jnp.zeros((k_max, d), jnp.float32),
            jnp.zeros((k_max,), jnp.float32),
        )
        (sums, counts), _ = jax.lax.scan(upd_chunk, init, jnp.arange(0, m, chunk))
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous center.
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    # Early-exit Lloyd: once assignments stop changing the update is a
    # fixed point, so the remaining iterations are no-ops — the final
    # (labels, centers) are bit-identical to the fixed-count loop, the
    # device just skips the dead iterations (in vmapped use the batch runs
    # lock-step until every row converges).
    def _cond(state):
        i, _, _, changed = state
        return changed & (i < iters)

    def _body(state):
        i, centers, prev_labels, _ = state
        labels = assign(centers)
        centers = _update(labels, centers)
        return i + 1, centers, labels, jnp.any(labels != prev_labels)

    _, centers, _, _ = jax.lax.while_loop(
        _cond, _body, (0, centers, jnp.full((m,), -1, jnp.int32), jnp.bool_(True))
    )
    labels = assign(centers)
    return labels[:n], centers


def _bucket(n: int, minimum: int = 8) -> int:
    """Round up to the next power of two (bounded shape-bucketing for jit)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("k_max", "iters", "chunk", "plusplus"))
def kmeans_packed(pv, k, *, k_max, iters=25, seed=42, chunk=2048, plusplus=True):
    """kmeans over a single packed upload: pv = (n, d+1) float32 with the
    validity flag in the last column (two small host->device transfers per
    problem halved to one; each costs ~0.8 ms of dispatch on this host)."""
    labels, _ = kmeans(
        pv[:, :-1], pv[:, -1] > 0, k, k_max=k_max, iters=iters, seed=seed,
        chunk=chunk, plusplus=plusplus,
    )
    return labels


def kmeans_host(points: np.ndarray, k: int, *, seed: int = 42, iters: int = 25) -> np.ndarray:
    """Host wrapper: bucket-padded k-means labels for an (n, d) float array."""
    points = np.asarray(points, dtype=np.float32)
    n, d = points.shape
    if k <= 1 or n <= 1:
        return np.zeros(n, dtype=np.int32)
    k = min(k, n)
    n_pad = _bucket(n)
    k_max = _bucket(k, minimum=2)
    pts = np.zeros((n_pad, d), np.float32)
    pts[:n] = points
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    chunk = min(2048, n_pad)
    labels, _ = kmeans(
        jnp.asarray(pts),
        jnp.asarray(valid),
        k,
        k_max=k_max,
        iters=iters,
        seed=seed,
        chunk=chunk,
        plusplus=k_max <= 256,
    )
    return np.asarray(labels[:n])


def kmeans_host_many(problems: list, *, seed: int = 42, iters: int = 25) -> list:
    """Batched host wrapper: k-means labels for many (points, k) problems.

    Dispatches every problem's padded kernel first, then collects with one
    round trip (parallel.shard.collect_all) — the tunneled chip pays ~40 ms
    per synchronous per-call fetch, which serialized the reference-law
    >=10k-color segments (clustering.py:207-230) one sync at a time.
    """
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    pending = []
    for points, k in problems:
        points = np.asarray(points, dtype=np.float32)
        n, d = points.shape
        if k <= 1 or n <= 1:
            pending.append((n, None))
            continue
        k = min(k, n)
        n_pad = _bucket(n)
        k_max = _bucket(k, minimum=2)
        pv = np.zeros((n_pad, d + 1), np.float32)
        pv[:n, :d] = points
        pv[:n, d] = 1.0
        labels = DISPATCH.submit(
            lambda pv, k, k_max, n_pad: kmeans_packed(
                jnp.asarray(pv), k, k_max=k_max,
                iters=iters, seed=seed, chunk=min(2048, n_pad),
                plusplus=k_max <= 256,
            ),
            pv, k, k_max, n_pad,
        )
        pending.append((n, labels))
    collected = SHARD.collect_all(
        [p[1].result() for p in pending if p[1] is not None]
    )
    out, j = [], 0
    for n, lab in pending:
        if lab is None:
            out.append(np.zeros(n, dtype=np.int32))
        else:
            out.append(collected[j][:n])
            j += 1
    return out


def _use_pallas() -> bool:
    """Route eps-components through the Pallas kernel on TPU backends.

    RHCCQ_USE_PALLAS=1 forces it (interpret mode off-TPU), =0 disables.
    """
    import os

    flag = os.environ.get("RHCCQ_USE_PALLAS")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def eps_components_host(
    points: np.ndarray, eps: float, groups: np.ndarray | None = None
) -> np.ndarray:
    """Host wrapper: bucket-padded eps-graph component labels."""
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    n_pad = _bucket(n)
    pts = np.zeros((n_pad, points.shape[1]), np.float32)
    pts[:n] = points
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    g = None
    if groups is not None:
        g = np.full(n_pad, -1, np.int32)
        g[:n] = groups
        g = jnp.asarray(g)
    if _use_pallas() and points.shape[1] == 3:
        from roibasedimagecompression_tpu.ops.pallas import epscc

        labels = epscc.eps_components_pallas(
            jnp.asarray(pts), jnp.float32(eps), jnp.asarray(valid), g,
            interpret=jax.default_backend() != "tpu",
        )
        return np.asarray(labels[:n])
    chunk = min(512, n_pad)
    labels = eps_components(
        jnp.asarray(pts), jnp.float32(eps), jnp.asarray(valid), g, chunk=chunk
    )
    return np.asarray(labels[:n])
