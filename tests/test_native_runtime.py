"""Tests for the native host runtime additions (round 2 performance work):
the C++ ROI mask pipeline and the SLIC connectivity enforcement.

Both are authoritative on the encode paths when the library is available, so
they are pinned (a) against the device graphs they replace (tolerance: the
box-filter densities accumulate in a different order than the XLA conv, so a
handful of borderline threshold pixels may flip) and (b) against hand-built
oracles for their discrete semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from roibasedimagecompression_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def lenna128():
    from roibasedimagecompression_tpu.io import image_io

    return image_io.imread_rgb("/root/reference/images/png/Lenna.png")[::4, ::4]


def test_native_roi_pipeline_matches_device(lenna128):
    """Native C++ mask chain vs the fused device graph: >= 99.9% agreement."""
    from roibasedimagecompression_tpu.config import RoiConfig
    from roibasedimagecompression_tpu.models import roi_fused as RF
    from roibasedimagecompression_tpu.ops import canny as CANNY

    rc = RoiConfig()
    low, high, _, _ = CANNY.select_thresholds(lenna128)
    rn, nn = native.roi_pipeline(lenna128, low, high, rc)
    rd, nd = (
        np.asarray(x)
        for x in RF.roi_masks_device(
            jnp.asarray(lenna128), rc, jnp.float32(low), jnp.float32(high)
        )
    )
    assert (rn == rd).mean() > 0.999
    assert (nn == nd).mean() > 0.999


def test_native_roi_pipeline_pre_matches_internal(lenna128):
    """roi_pipeline(pre=(mag, nms)) with the gradient the pipeline would
    compute itself must be byte-identical to the self-computing call —
    callers that already hold the color gradient (e.g. after get_edge_map)
    can skip the pipeline's own gradient pass."""
    from roibasedimagecompression_tpu.config import RoiConfig
    from roibasedimagecompression_tpu.ops import canny as CANNY

    rc = RoiConfig()
    low, high = CANNY.select_thresholds_pair(lenna128)
    mag, nms = native.gradient_nms_rgb(lenna128)
    r0, n0 = native.roi_pipeline(lenna128, low, high, rc)
    r1, n1 = native.roi_pipeline(lenna128, low, high, rc, pre=(mag, nms))
    assert (r0 == r1).all()
    assert (n0 == n1).all()


def test_native_roi_pipeline_shapes_and_cover():
    """ROI and non-ROI masks must cover the image (buffer overlap allowed)."""
    from roibasedimagecompression_tpu.config import RoiConfig

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    roi, nonroi = native.roi_pipeline(img, 50.0, 120.0, RoiConfig())
    assert roi.shape == (80, 120) and roi.dtype == bool
    assert (roi | nonroi).all()


def test_native_slic_enforce_absorbs_small_fragment():
    """A fragment below min_size is adopted by the nearest kept fragment."""
    assign = np.zeros((8, 12), np.int32)
    assign[:, 6:] = 1
    # A 2-pixel island of segment 1 inside segment 0's area: same segment id
    # but disconnected -> its own fragment.
    assign[3, 1] = 1
    assign[3, 2] = 1
    mask = np.ones((8, 12), bool)
    out = native.slic_enforce(assign, mask, min_size=4)
    assert out is not None
    # The island joined the surrounding fragment (segment 0's fragment).
    assert out[3, 1] == out[0, 0]
    assert out[3, 2] == out[0, 0]
    # The two big fragments stay distinct.
    assert out[0, 0] != out[0, 11]


def test_native_slic_enforce_keeps_largest_when_all_small():
    assign = np.arange(6, dtype=np.int32).reshape(1, 6).repeat(2, axis=0)
    assign[1] = assign[0]
    mask = np.ones((2, 6), bool)
    mask[:, 5] = False
    out = native.slic_enforce(assign, mask, min_size=100)
    assert out is not None
    inside = out[mask]
    assert len(np.unique(inside)) == 1  # everything adopted by the largest
    assert (out[~mask] == -1).all()


def test_native_slic_enforce_respects_mask_geodesic():
    """Adoption never crosses the mask: a small fragment in a separated
    region keeps its own label."""
    assign = np.zeros((5, 9), np.int32)
    assign[:, 6:] = 7
    mask = np.ones((5, 9), bool)
    mask[:, 4:6] = False  # wall between the two areas
    out = native.slic_enforce(assign, mask, min_size=10)
    # Right-side fragment (size 15 >= 10? 5*3=15 -> kept).  Make it small:
    out2 = native.slic_enforce(assign, mask, min_size=16)
    # Left side (20 px) is the largest kept; right side unreachable -> keeps
    # its own fragment id rather than adopting across the wall.
    right = out2[0, 6]
    assert (out2[:, 6:] == right).all()
    assert right != out2[0, 0]
    assert out is not None


def test_native_roi_pipeline_wired_into_encode(lenna128):
    """encode_many and single batched encode produce identical bytes with the
    native ROI backend (the uniform-backend contract)."""
    import roibasedimagecompression_tpu as rtc
    from roibasedimagecompression_tpu.parallel import stream

    img = lenna128[:96, :96]
    batch = stream.encode_many([img], rtc.CodecConfig())
    single = rtc.encode(img, rtc.CodecConfig())
    assert batch[0] == single


def test_native_pack_pairs_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 30, (40, 50, 3), dtype=np.uint8)
    seg = rng.integers(0, 4, (40, 50)).astype(np.int32)
    uniq, inverse, counts = native.pack_pairs(img, seg)
    mask = seg > 0
    packed = (
        (img[..., 0].astype(np.int64) << 16)
        | (img[..., 1].astype(np.int64) << 8)
        | img[..., 2].astype(np.int64)
    )
    key = (seg.astype(np.int64) << 24 | packed)[mask]
    u2, i2, c2 = np.unique(key, return_inverse=True, return_counts=True)
    assert np.array_equal(uniq, u2)
    assert np.array_equal(inverse, i2)
    assert np.array_equal(counts, c2)


def test_native_black_repair_pairs_matches_numpy_oracle():
    """Native in-place black repair == the NumPy pair-table repair, including
    the pixel-count folding used by the weighted palette."""
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    rng = np.random.default_rng(4)
    # Low-entropy colors force black pairs and collisions; segment 2 is
    # all-black (kept verbatim), segment 3 is empty.
    img = (rng.integers(0, 4, (60, 70, 3)) * 60).astype(np.uint8)
    seg = rng.integers(0, 3, (60, 70)).astype(np.int32)
    seg[50:, :] = np.where(seg[50:, :] > 0, 2, 0)
    img[50:, :] = 0
    uniq, inverse, counts = native.pack_pairs(img, seg)
    uniq_n, inv_n, cnt_n = uniq.copy(), inverse.copy(), counts.copy()
    m = native.black_repair_pairs(uniq_n, cnt_n, inv_n)
    assert m is not None

    seg_of_pair = (uniq >> 24).astype(np.int32)
    color_of_pair = (uniq & 0xFFFFFF).astype(np.int32)
    seg2, col2, inv2, remap2 = QB._black_repair_pairs(
        seg_of_pair, color_of_pair, inverse
    )
    assert m == len(seg2)
    assert np.array_equal((uniq_n[:m] >> 24).astype(np.int32), seg2)
    assert np.array_equal((uniq_n[:m] & 0xFFFFFF).astype(np.int32), col2)
    assert np.array_equal(inv_n, inv2)
    folded = np.bincount(remap2, weights=counts.astype(np.float64), minlength=m)
    assert np.array_equal(cnt_n[:m].astype(np.float64), folded)


def test_native_component_stats_matches_numpy_oracle():
    from roibasedimagecompression_tpu.ops import cc as CC

    rng = np.random.default_rng(6)
    labels = rng.integers(0, 9, (45, 67)).astype(np.int32)
    labels[labels == 5] = 4  # an absent label (zeroed bbox row)
    num = 9
    got = native.component_stats(labels, num)
    assert got is not None
    areas, bboxes = got
    flat = labels.ravel()
    want_areas = np.bincount(flat, minlength=num)
    h, w = labels.shape
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    minr = np.full(num, h, np.int64); maxr = np.zeros(num, np.int64)
    minc = np.full(num, w, np.int64); maxc = np.zeros(num, np.int64)
    np.minimum.at(minr, flat, rows); np.maximum.at(maxr, flat, rows)
    np.minimum.at(minc, flat, cols); np.maximum.at(maxc, flat, cols)
    want_bb = np.stack([minr, minc, maxr + 1, maxc + 1], axis=1).astype(np.int32)
    want_bb[want_areas == 0] = 0
    assert np.array_equal(areas, want_areas)
    assert np.array_equal(bboxes, want_bb)
    st = CC.component_stats(labels, num)
    assert np.array_equal(st.areas, want_areas)
    assert np.array_equal(st.bboxes, want_bb)


def test_native_cluster_means_matches_numpy_oracle():
    rng = np.random.default_rng(5)
    n_pairs, n_clusters = 4000, 37
    cluster = rng.integers(0, n_clusters, n_pairs).astype(np.int64)
    cluster[cluster == 11] = 12  # an empty cluster (guarded divide)
    packed = rng.integers(0, 1 << 24, n_pairs).astype(np.int32)
    w = rng.random(n_pairs) * 7.0
    for weights in (w, None):
        got = native.cluster_means_u8(cluster, packed, weights, n_clusters)
        colors = np.stack(
            [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=1
        ).astype(np.float32)
        wv = weights if weights is not None else np.ones(n_pairs, np.float64)
        counts = np.bincount(cluster, weights=wv, minlength=n_clusters)
        means = np.zeros((n_clusters, 3), np.float64)
        for c in range(3):
            means[:, c] = np.bincount(
                cluster, weights=colors[:, c] * wv, minlength=n_clusters
            )
        means /= np.maximum(counts, 1.0)[:, None]
        assert np.array_equal(got, means.astype(np.uint8))


def test_native_pack_sel_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    colors = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    sel = rng.random((20, 30)) < 0.4
    out = np.empty(20 * 30, np.int64)
    m = native.pack_sel_keys(colors, sel, 7, out, 0)
    c = colors[sel]
    want = (
        np.int64(7) << 24
        | (c[:, 0].astype(np.int64) << 16)
        | (c[:, 1].astype(np.int64) << 8)
        | c[:, 2].astype(np.int64)
    )
    assert m == len(want)
    assert np.array_equal(out[:m], want)


def test_native_unique_inverse_counts():
    rng = np.random.default_rng(3)
    keys = rng.integers(-1000, 1000, 5000).astype(np.int64)
    u, i, c = native.unique_inverse_i64(keys, return_counts=True)
    u2, i2, c2 = np.unique(keys, return_inverse=True, return_counts=True)
    assert np.array_equal(u, u2) and np.array_equal(i, i2) and np.array_equal(c, c2)


def test_native_score_candidates_matches_python(lenna128):
    from roibasedimagecompression_tpu.ops import canny as CANNY

    gray, mag, nms, cands = native.canny_analysis(lenna128)
    best_native = native.score_candidates(gray, mag, nms, cands)
    best_python = CANNY.score_candidates_host(gray, mag, nms, cands)
    assert best_native == best_python


def test_native_paint_masked_indices_matches_numpy():
    rng = np.random.default_rng(5)
    idx_of_pair = rng.integers(0, 300, 64).astype(np.int32)
    mask = rng.random((16, 24)) < 0.5
    inv = rng.integers(0, 64, int(mask.sum())).astype(np.int64)
    for dt in (np.uint8, np.uint16, np.uint32):
        out = np.zeros((16, 24), dt)
        if not native.paint_masked_indices(idx_of_pair, inv, mask, out):
            continue  # no toolchain: fallback covered by codec tests
        want = np.zeros((16, 24), dt)
        want[mask] = idx_of_pair[inv].astype(dt)
        assert np.array_equal(out, want)


def test_select_thresholds_pair_matches_full(lenna128):
    """select_thresholds_pair must pick the same (low, high) as the full
    variant — it only skips the color gradient/NMS ride-along that the
    mask-building callers recompute anyway."""
    from roibasedimagecompression_tpu.ops import canny as CANNY

    low, high, _, _ = CANNY.select_thresholds(lenna128)
    low_p, high_p = CANNY.select_thresholds_pair(lenna128)
    assert (low_p, high_p) == (low, high)


def test_unpack_pair_table_and_split():
    """One-pass native unpack of the device pair-table download matches the
    NumPy view/shift chain bit-for-bit (ops/pairs.DevicePairTable,
    quantize_batched.tier1_table)."""
    import numpy as np

    from roibasedimagecompression_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    n = 4321
    seg = np.sort(rng.integers(1, 500, n)).astype(np.int64)
    col = rng.integers(0, 1 << 24, n).astype(np.int64)
    cnt = rng.integers(1, 1 << 22, n).astype(np.int64)
    a = (seg << 16) | (cnt & 0xFFFF)
    b = ((cnt >> 16) << 24) | col
    packed = np.stack([a, b], axis=1).astype(np.uint32).view(np.int32)
    uniq, counts = native.unpack_pair_table(packed)
    assert np.array_equal(uniq, (seg << 24) | col)
    assert np.array_equal(counts, cnt)
    rows = np.stack([seg, col, cnt], axis=1).astype(np.int32)
    uniq2, counts2 = native.unpack_pair_table(rows)
    assert np.array_equal(uniq2, (seg << 24) | col)
    s, c, f = native.split_pair_uniq(uniq)
    assert np.array_equal(s, seg.astype(np.int32))
    assert np.array_equal(c, col.astype(np.int32))
    exp = np.stack(
        [(col >> 16) & 0xFF, (col >> 8) & 0xFF, col & 0xFF], axis=1
    ).astype(np.float32)
    assert np.array_equal(f, exp)


def test_runs_of_sorted_and_flat_run_positions():
    """Native one-pass run finder / enumerator matches the NumPy oracle
    (models/quantize_batched._runs_of_sorted / _flat_run_positions)."""
    import numpy as np

    from roibasedimagecompression_tpu import native

    rng = np.random.default_rng(11)
    for n in (0, 1, 2, 1000):
        a = np.sort(rng.integers(0, 17, n)).astype(np.int64)
        vals, starts, sizes = native.runs_of_sorted_i64(a)
        if n == 0:
            assert len(vals) == len(starts) == len(sizes) == 0
        else:
            ev, es, ec = np.unique(a, return_index=True, return_counts=True)
            assert np.array_equal(vals, ev)
            assert np.array_equal(starts, np.sort(es))
            assert np.array_equal(sizes, ec)
        pos, row, within = native.flat_run_positions(starts, sizes)
        assert np.array_equal(pos, np.arange(n))
        assert np.array_equal(row, np.repeat(np.arange(len(sizes)), sizes))
        exp_within = np.concatenate(
            [np.arange(s) for s in sizes] or [np.zeros(0, np.int64)]
        )
        assert np.array_equal(within, exp_within)
