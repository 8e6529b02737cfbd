"""Clustering kernels vs independent oracles (sklearn/NumPy)."""

import numpy as np
import pytest

from roibasedimagecompression_tpu.models import quantize as Q
from roibasedimagecompression_tpu.ops import cluster as C
from roibasedimagecompression_tpu.ops import unique as U


def _partition_sets(labels):
    out = {}
    for i, l in enumerate(labels):
        out.setdefault(int(l), set()).add(i)
    return sorted(map(frozenset, out.values()), key=lambda s: min(s))


def test_unique_colors_matches_numpy(rng):
    pixels = rng.integers(0, 4, (5000, 3), dtype=np.uint8) * 77
    palette, idx = U.unique_colors(pixels)
    ref_palette, ref_idx = np.unique(pixels, axis=0, return_inverse=True)
    np.testing.assert_array_equal(palette, ref_palette)
    np.testing.assert_array_equal(palette[idx], pixels)
    np.testing.assert_array_equal(idx, ref_idx.reshape(idx.shape))


def test_eps_components_matches_dbscan(rng):
    """Exact partition parity with sklearn DBSCAN(min_samples=1) on integer
    color points (the real domain: u8 palettes, where f32 distances are exact)."""
    from sklearn.cluster import DBSCAN

    pts = np.unique(
        rng.integers(0, 256, (400, 3), dtype=np.int32), axis=0
    ).astype(np.float32)
    for eps in (25.0, 51.2, 102.4):
        ours = C.eps_components_host(pts, eps)
        ref = DBSCAN(eps=eps, min_samples=1).fit_predict(pts.astype(np.float64))
        assert _partition_sets(ours) == _partition_sets(ref), eps


def test_eps_components_two_blobs():
    a = np.zeros((10, 3), np.float32)
    b = np.full((10, 3), 200.0, np.float32)
    labels = C.eps_components_host(np.vstack([a, b]), eps=10.0)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_eps_components_chain_links():
    """Single linkage: a chain of points spaced < eps forms one component."""
    pts = np.stack([np.arange(50) * 9.0, np.zeros(50), np.zeros(50)], axis=1).astype(
        np.float32
    )
    labels = C.eps_components_host(pts, eps=10.0)
    assert len(set(labels.tolist())) == 1


def test_eps_components_long_chain_shuffled(rng):
    """Worst-case diameter: a long shuffled chain (spacing < eps) is ONE
    component, and labels still come out as the component-minimum index.

    Guards the pointer-jump-to-fixpoint convergence (each round fully
    compresses label chains, so rounds scale with hooking depth, not the
    eps-graph diameter — the (64, 9999) bucket cost 2.1 s on v5e without it).
    """
    n = 1500
    chain = np.stack(
        [np.arange(n) * 0.9, np.zeros(n), np.zeros(n)], axis=1
    ).astype(np.float32)
    perm = rng.permutation(n)
    labels = C.eps_components_host(chain[perm], eps=1.0)
    assert len(set(labels.tolist())) == 1
    assert labels.min() == 0  # component labeled by its minimum point index


def test_eps_components_groups_block_edges(rng):
    pts = np.zeros((20, 3), np.float32)  # all identical -> fully connected
    groups = np.array([0] * 10 + [1] * 10, np.int32)
    labels = C.eps_components_host(pts, eps=10.0, groups=groups)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_kmeans_weighted_centers_follow_mass(rng):
    """Weighted Lloyd: with k=1 effective cluster mass, the center is the
    WEIGHTED mean of its members, not the plain mean."""
    import jax.numpy as jnp

    pts = np.zeros((8, 3), np.float32)
    pts[0] = [0, 0, 0]
    pts[1] = [90, 90, 90]
    pts[2:] = [10, 10, 10]
    w = np.ones(8, np.float32)
    w[1] = 1000.0  # the bright point carries almost all pixel mass
    valid = np.ones(8, bool)
    labels, centers = C.kmeans(
        jnp.asarray(pts), jnp.asarray(valid), 1, k_max=2, iters=5,
        weights=jnp.asarray(w),
    )
    labels_u, centers_u = C.kmeans(
        jnp.asarray(pts), jnp.asarray(valid), 1, k_max=2, iters=5,
    )
    c_w = np.asarray(centers)[0]
    c_u = np.asarray(centers_u)[0]
    # Weighted center sits near the heavy point; unweighted near the plain mean.
    assert np.linalg.norm(c_w - 90) < 5.0, c_w
    assert np.linalg.norm(c_u - 90) > 50.0, c_u


def test_kmeans_partition_quality(rng):
    from sklearn.cluster import KMeans

    centers = rng.uniform(0, 255, (8, 3))
    pts = (centers[rng.integers(0, 8, 2000)] + rng.normal(0, 3, (2000, 3))).astype(
        np.float32
    )
    labels = C.kmeans_host(pts, 8, seed=0)
    assert labels.min() >= 0 and labels.max() < 8

    def inertia(lab, k):
        tot = 0.0
        for c in range(k):
            sel = pts[lab == c]
            if len(sel):
                tot += ((sel - sel.mean(0)) ** 2).sum()
        return tot

    ref = KMeans(n_clusters=8, random_state=0, n_init="auto").fit(pts)
    ours = inertia(labels, 8)
    theirs = inertia(ref.labels_, 8)
    assert ours <= theirs * 1.25  # within 25% of sklearn inertia


def test_kmeans_init_centers_respected(rng):
    """With explicit init_centers and iters=0, labels are exactly the
    nearest-init-center assignment (masked by center_valid)."""
    import jax.numpy as jnp

    pts = rng.uniform(0, 255, (64, 3)).astype(np.float32)
    inits = np.zeros((8, 3), np.float32)
    inits[:3] = [[0, 0, 0], [128, 128, 128], [255, 255, 255]]
    labels, centers = C.kmeans(
        jnp.asarray(pts), jnp.ones(64, bool), 3, k_max=8, iters=0,
        chunk=64, init_centers=jnp.asarray(inits),
    )
    want = np.argmin(
        ((pts[:, None, :] - inits[None, :3, :]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(np.asarray(labels), want)


def test_kmeans_k_larger_than_points():
    pts = np.array([[0, 0, 0], [255, 255, 255]], np.float32)
    labels = C.kmeans_host(pts, 5)
    assert len(labels) == 2


def test_cluster_palette_black_preserved(rng):
    palette = np.vstack(
        [np.zeros((1, 3), np.uint8), rng.integers(1, 256, (50, 3), dtype=np.uint8)]
    )
    new_palette, mapping = Q.cluster_palette(palette, quality=20)
    assert (new_palette[mapping[0]] == 0).all()
    assert tuple(new_palette[0]) == (0, 0, 0)
    assert mapping.shape == (51,)
    assert mapping.max() < len(new_palette)


def test_cluster_palette_reduces_colors(rng):
    # 1000 colors in two tight blobs: quality 20 (eps 102.4) joins each blob,
    # then splits by the max-colors law -> far fewer colors than inputs.
    blob1 = rng.integers(10, 40, (500, 3))
    blob2 = rng.integers(200, 230, (500, 3))
    palette = np.unique(np.vstack([blob1, blob2]).astype(np.uint8), axis=0)
    new_palette, mapping = Q.cluster_palette(palette, quality=20)
    assert len(new_palette) < len(palette) / 5
    # Every original color maps to a palette entry within ~blob radius.
    err = np.abs(
        new_palette[mapping].astype(int) - palette.astype(int)
    ).max()
    assert err < 60


def test_cluster_palette_max_colors_law(rng):
    """Oversized single-linkage clusters are split: with n colors in one blob
    and quality q, sub-clusters have <= ceil((n - n*q/100)/q) members."""
    palette = np.unique(rng.integers(100, 140, (300, 3)).astype(np.uint8), axis=0)
    n = len(palette)
    from roibasedimagecompression_tpu.config import clustering_params

    params = clustering_params(n, 20)
    _, mapping = Q.cluster_palette(palette, quality=20)
    sizes = np.bincount(mapping)
    assert sizes.max() <= max(params.max_colors_per_cluster, 2)


def _merge_oracle(components, bbox):
    """Brute-force canvas merge following merging.py:52-83 exactly."""
    minr, minc, maxr, maxc = bbox
    h, w = maxr - minr, maxc - minc
    canvas = np.zeros((h, w, 3), np.int32)
    placed = np.zeros((h, w), bool)
    for comp in reversed(components):
        rgb = comp.palette[comp.indices]
        for r in range(comp.shape[0]):
            for c in range(comp.shape[1]):
                rr, cc = comp.top_left[0] - minr + r, comp.top_left[1] - minc + c
                if 0 <= rr < h and 0 <= cc < w and tuple(rgb[r, c]) != (0, 0, 0):
                    canvas[rr, cc] = rgb[r, c]
    return canvas.astype(np.uint8)


def test_merge_components_matches_oracle(rng):
    comps = []
    for k in range(4):
        palette = rng.integers(0, 256, (10, 3), dtype=np.uint8)
        palette[0] = 0
        indices = rng.integers(0, 10, (12, 15)).astype(np.int32)
        comps.append(
            Q.Component(top_left=(int(rng.integers(0, 20)), int(rng.integers(0, 20))),
                        palette=palette, indices=indices)
        )
    bbox = (0, 0, 40, 40)
    merged = Q.merge_components(comps, bbox)
    np.testing.assert_array_equal(merged.to_rgb(), _merge_oracle(comps, bbox))
    assert tuple(merged.palette[0]) == (0, 0, 0)


def test_merge_first_component_wins():
    p1 = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    p2 = np.array([[0, 0, 0], [0, 255, 0]], np.uint8)
    c1 = Q.Component((0, 0), p1, np.ones((2, 2), np.int32))
    c2 = Q.Component((0, 0), p2, np.ones((2, 2), np.int32))
    merged = Q.merge_components([c1, c2], (0, 0, 2, 2))
    assert (merged.to_rgb() == [255, 0, 0]).all()


def test_merge_black_is_transparent():
    p1 = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    idx = np.zeros((2, 2), np.int32)
    idx[0, 0] = 1  # only one colored pixel
    p2 = np.array([[0, 0, 0], [0, 0, 255]], np.uint8)
    c1 = Q.Component((0, 0), p1, idx)
    c2 = Q.Component((0, 0), p2, np.ones((2, 2), np.int32))
    merged = Q.merge_components([c1, c2], (0, 0, 2, 2))
    rgb = merged.to_rgb()
    assert tuple(rgb[0, 0]) == (255, 0, 0)  # c1's colored pixel wins
    assert tuple(rgb[1, 1]) == (0, 0, 255)  # c1 black is transparent -> c2 shows


def test_from_pixels_roundtrip(rng):
    patch = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    comp = Q.from_pixels(patch, (3, 4))
    np.testing.assert_array_equal(comp.to_rgb(), patch)
    assert comp.top_left == (3, 4)


def test_kmeans_kmax_above_point_count(rng):
    """Shape-bucket quantization can push k_max above the padded point count;
    the random-init branch must not break (regression)."""
    import jax.numpy as jnp

    pts = rng.uniform(0, 255, (200, 3)).astype(np.float32)
    labels, _ = C.kmeans(
        jnp.asarray(pts), jnp.ones(200, bool), 150, k_max=512, chunk=200, plusplus=False
    )
    labels = np.asarray(labels)
    assert labels.shape == (200,)
    assert labels.max() < 512


def test_hierarchical_palette_clustering():
    """Capability parity with the reference's unused alternative reducer
    (clustering.py:824-849): k-means the palette to n*q/100 colors."""
    from roibasedimagecompression_tpu.models import quantize as Q

    rng = np.random.default_rng(0)
    palette = rng.integers(0, 256, (100, 3)).astype(np.uint8)
    indices = rng.integers(0, 100, (16, 16))
    new_pal, new_idx = Q.hierarchical_palette_clustering(palette, indices, 50.0)
    assert len(new_pal) <= 50
    assert new_idx.shape == indices.shape
    assert new_idx.max() < len(new_pal)
    # Reconstruction stays within quantization distance of the original.
    err = np.abs(
        new_pal[new_idx].astype(int) - palette[indices].astype(int)
    ).mean()
    assert err < 64
    # No-op above the target.
    same_pal, same_idx = Q.hierarchical_palette_clustering(palette, indices, 100.0)
    assert np.array_equal(same_pal, palette)


def test_assign_trivial_runs_bbox_shortcut(rng):
    """The eps-CC bbox shortcut labels exactly the runs whose palette
    bounding-box diagonal is <= eps, handles gaps between runs (tier-2/3
    skips pinned black pairs), size-1 runs, and a run ending at n."""
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    colors = np.zeros((12, 3), np.float32)
    colors[0:3] = [[10, 10, 10], [12, 10, 10], [10, 13, 10]]   # diag ~3.6
    colors[3] = [99, 99, 99]                                   # gap entry
    colors[4:6] = [[0, 0, 0], [200, 200, 200]]                 # diag ~346
    colors[6] = [42, 0, 7]                                     # size-1 run
    colors[7] = [77, 77, 77]                                   # gap entry
    colors[8:12] = [[5, 5, 5], [6, 5, 5], [5, 6, 5], [5, 5, 7]]  # ends at n
    starts = np.array([0, 4, 6, 8], np.int64)
    sizes = np.array([3, 2, 1, 4], np.int64)
    eps = np.array([10.0, 10.0, 10.0, 10.0], np.float32)
    keys = np.full(12, -1, np.int64)
    n = QB._assign_trivial_runs(keys, colors, starts, sizes, eps, np.int64(100))
    # Runs 0 (diag 3.6), 2 (singleton), 3 (diag ~2.4) are trivial; run 1 is not.
    assert n == 3
    assert sizes.tolist() == [0, 2, 0, 0]
    assert keys[0] == keys[1] == keys[2]
    assert keys[6] != keys[0] and keys[6] >= 100
    assert keys[8] == keys[9] == keys[10] == keys[11]
    assert keys[3] == keys[7] == -1 and keys[4] == keys[5] == -1
    # Exactly n fresh keys, all >= key_base.
    used = {int(keys[0]), int(keys[6]), int(keys[8])}
    assert len(used) == 3 and all(k >= 100 for k in used)

    # Borderline exactness: diagonal exactly eps is trivial (d2 <= eps2).
    colors2 = np.array([[0, 0, 0], [3, 4, 0]], np.float32)  # diag = 5
    keys2 = np.full(2, -1, np.int64)
    sizes2 = np.array([2], np.int64)
    n2 = QB._assign_trivial_runs(
        keys2, colors2, np.array([0], np.int64), sizes2,
        np.array([5.0], np.float32), np.int64(0),
    )
    assert n2 == 1 and sizes2[0] == 0
    # ... and a hair below eps is not.
    keys3 = np.full(2, -1, np.int64)
    sizes3 = np.array([2], np.int64)
    n3 = QB._assign_trivial_runs(
        keys3, colors2, np.array([0], np.int64), sizes3,
        np.array([4.999], np.float32), np.int64(0),
    )
    assert n3 == 0 and sizes3[0] == 2 and keys3[0] == -1
