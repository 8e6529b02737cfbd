"""Side modules: CLAHE enhancer, spline codec, contours, thinning, native lib,
RLE container mode, adaptive metrics, reports, ROI extras."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


# ---------------------------------------------------------------------- CLAHE
def test_clahe_1d_monotone_lut(rng):
    from roibasedimagecompression_tpu.ops.clahe import clahe_1d

    vals = rng.integers(0, 80, 4096).astype(np.uint8)  # dark values
    out = np.asarray(clahe_1d(jnp.asarray(vals), clip_limit=3.0, n_tiles=16))
    assert out.shape == vals.shape
    assert out.mean() > vals.mean()  # equalization brightens a dark patch
    assert out.max() <= 255


def test_clahe_2d_vs_cv2(rng):
    import cv2

    from roibasedimagecompression_tpu.ops.clahe import clahe_2d

    gray = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    ours = np.asarray(clahe_2d(jnp.asarray(gray), clip_limit=2.0, grid=8))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(gray)
    # Implementations differ in clip redistribution details; demand close
    # agreement, not bit parity.
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 6.0


def test_enhance_shadows_brightens_only_shadows():
    from roibasedimagecompression_tpu.models.enhance import enhance_shadows

    img = np.full((64, 64, 3), 200, np.uint8)
    img[:32] = 20  # dark top half
    out = enhance_shadows(img)
    assert out.shape == img.shape
    # Bright half must be (nearly) untouched.
    assert np.abs(out[40:].astype(int) - 200).max() <= 2


# --------------------------------------------------------------------- spline
def test_spline_roundtrip_circle():
    from roibasedimagecompression_tpu.models import spline as SP

    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    coords = np.column_stack([100 + 40 * np.cos(t), 100 + 40 * np.sin(t)])
    result = SP.compress_shape(coords, num_sublists=3, compression_ratio=0.2)
    assert result["overall_metrics"]["mean_error"] < 2.0
    keys = SP.minimal_storage(result)
    assert len(keys) < len(coords) * 0.4
    recon = SP.reconstruct_from_minimal(keys, num_points=400)
    # Reconstruction stays near the circle radius.
    r = np.linalg.norm(recon - [100, 100], axis=1)
    assert np.abs(r - 40).mean() < 2.5


def test_spline_save_load(tmp_path):
    from roibasedimagecompression_tpu.models import spline as SP

    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    for name in ("k.npy", "k.csv"):
        path = tmp_path / name
        SP.save_key_points(pts, path)
        back = SP.load_key_points(path)
        np.testing.assert_allclose(back, pts, atol=1e-3)


# ------------------------------------------------------------------- contours
def test_find_contours_square():
    from roibasedimagecompression_tpu.ops.contours import find_contours

    mask = np.zeros((10, 10), bool)
    mask[3:7, 2:8] = True
    contours = find_contours(mask)
    assert len(contours) == 1
    c = contours[0]
    # Closed path around a 4x6 region: perimeter ~ 2*(4+6) in half steps.
    assert np.allclose(c[0], c[-1])
    assert c[:, 0].min() >= 2.0 and c[:, 0].max() <= 7.0


def test_segment_boundaries_matches_reference_shape():
    from roibasedimagecompression_tpu.ops.contours import segment_boundaries

    seg = np.zeros((12, 12), np.int32)
    seg[2:6, 2:6] = 1
    seg[7:11, 7:11] = 2
    mask = seg > 0
    out = segment_boundaries(seg, mask)
    assert {d["segment_id"] for d in out} == {1, 2}
    for d in out:
        assert d["area"] == 16
        assert d["num_points"] > 8


# ------------------------------------------------------------------- thinning
def test_zhang_suen_thins_rectangle():
    from roibasedimagecompression_tpu.ops.thinning import zhang_suen_thinning

    mask = np.zeros((20, 40), bool)
    mask[8:13, 5:35] = True  # 5-thick bar
    skel = np.asarray(zhang_suen_thinning(jnp.asarray(mask)))
    assert skel.sum() < mask.sum() * 0.35
    assert skel.any()
    # Skeleton stays inside the original shape.
    assert not (skel & ~mask).any()


# ----------------------------------------------------------------- native lib
def test_native_rle_roundtrip(rng):
    from roibasedimagecompression_tpu import native

    data = np.repeat(
        rng.integers(0, 300, 50).astype(np.uint16), rng.integers(1, 900, 50)
    )
    pairs = native.rle_encode(data)
    back = native.rle_decode(pairs, len(data))
    np.testing.assert_array_equal(back, data)
    assert pairs.shape[1] == 2


def test_native_rle_long_runs():
    from roibasedimagecompression_tpu import native

    data = np.full(200_000, 7, np.uint16)
    pairs = native.rle_encode(data)
    assert (pairs[:, 1].astype(np.int64).sum()) == 200_000
    back = native.rle_decode(pairs, len(data))
    np.testing.assert_array_equal(back, data)


def test_native_ccl_matches_cv2(rng):
    import cv2

    from roibasedimagecompression_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    mask = (rng.random((80, 90)) > 0.55).astype(np.uint8)
    for conn in (4, 8):
        labels, n, stats = native.cc_label(mask, conn)
        ref_n, ref_labels, ref_stats, _ = cv2.connectedComponentsWithStats(
            mask, connectivity=conn
        )
        assert n == ref_n - 1
        pairs = set(zip(labels.ravel().tolist(), ref_labels.ravel().tolist()))
        assert len(pairs) == ref_n
        assert sorted(stats[:, 0].tolist()) == sorted(
            ref_stats[1:, cv2.CC_STAT_AREA].tolist()
        )


def test_container_rle_mode(rng):
    from roibasedimagecompression_tpu.io import container

    palette = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    indices = np.repeat(rng.integers(0, 40, 64), 64).reshape(64, 64).astype(np.uint16)
    data = container.pack(palette, indices, use_rle=True)
    out = container.unpack(data)
    np.testing.assert_array_equal(out.indices, indices)
    np.testing.assert_array_equal(out.palette, palette)


# ----------------------------------------------------------- adaptive metrics
def test_adaptive_metrics_structure(rng):
    from roibasedimagecompression_tpu.eval.adaptive import adaptive_quality_metrics

    a = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    b = a.copy()
    b[:4, :4] = 255  # concentrated outlier block
    b = np.clip(b.astype(int) + rng.integers(-3, 3, b.shape), 0, 255).astype(np.uint8)
    m = adaptive_quality_metrics(a, b)
    assert m["all_pixels"]["psnr"] < m["without_outliers"]["psnr"]
    assert 0.1 <= m["outlier_detection"]["outlier_percentage"] <= 10.0
    assert "percentile_99" in m and "percentile_75" in m
    assert m["ssim"]["full"] <= 1.0


# -------------------------------------------------------------------- reports
def test_report_surfaces(tmp_path, reference_images):
    from roibasedimagecompression_tpu.eval import report

    # Use a JPEG generated from the PNG so shapes match.
    jpg_path = tmp_path / "lenna.jpg"
    stats = report.compress_with_jpeg(
        reference_images / "png" / "Lenna.png", jpg_path, quality=85
    )
    assert stats["jpeg_bytes"] > 0
    row = report.three_way_comparison(
        reference_images / "png" / "Lenna.png",
        jpg_path,
        reference_images / "rhccq_20_10" / "Lenna_compressed.rhccq",
    )
    assert row["rhccq"]["psnr"] == pytest.approx(33.26, abs=0.05)
    rows = [row]
    report.summary_csv(rows, tmp_path / "summary.csv")
    assert (tmp_path / "summary.csv").read_text().count("AVERAGE") == 1
    report.html_report(rows, tmp_path / "report.html")
    html = (tmp_path / "report.html").read_text()
    assert "RHCCQ" in html and "JPEG" in html
    report.rd_scatter(rows, tmp_path / "rd.png")
    assert (tmp_path / "rd.png").stat().st_size > 1000


def test_batch_evaluation_and_summary(reference_images, tmp_path):
    from roibasedimagecompression_tpu.eval import report
    from roibasedimagecompression_tpu.eval.harness import kodak_pairs, evaluate_pairs, summarize

    results = evaluate_pairs(kodak_pairs(reference_images)[:3])
    summary = summarize(results)
    text = report.format_summary_report(summary)
    assert "PSNR" in text and "bpp" in text
    report.save_metric_histograms(results, tmp_path / "hist.png")
    assert (tmp_path / "hist.png").stat().st_size > 1000


# ----------------------------------------------------------------- ROI extras
def test_connect_strategies_smoke(rng):
    from roibasedimagecompression_tpu.models import roi_extras as RX

    mask = np.zeros((40, 40), bool)
    mask[10, 5:15] = True
    mask[10, 18:30] = True  # two bars with a 3px gap
    for method in ("dilation", "closing", "skeleton", "region_growing"):
        out = RX.connect_nearby_pixels(mask, connection_distance=3, method=method,
                                       min_region_size=2)
        assert out.dtype == np.bool_ or out.dtype == bool
        assert out.sum() >= mask.sum() * 0.5
    # region_growing dilates by the connection distance: the 3px gap closes.
    grown = RX.connect_by_region_growing(mask, 3, 2)
    from roibasedimagecompression_tpu.ops import cc as CC

    _, n = CC.connected_components(grown, 8)
    assert n == 2  # one foreground component (+ background)


def test_thinness_v1_distinguishes_shapes():
    from roibasedimagecompression_tpu.models.roi_extras import region_thinness_v1

    thin = np.zeros((40, 40), bool)
    thin[20, 2:38] = True  # 1px line
    blob = np.zeros((40, 40), bool)
    blob[10:30, 10:30] = True
    assert region_thinness_v1(thin) > region_thinness_v1(blob)


def test_contextual_cleaning_flips_nested():
    from roibasedimagecompression_tpu.models import roi_extras as RX
    from roibasedimagecompression_tpu.models.segment import Region

    parent = Region(bbox=(0, 0, 40, 40), bbox_mask=np.ones((40, 40), bool),
                    area=1600, kind="roi")
    child = Region(bbox=(10, 10, 14, 14), bbox_mask=np.ones((4, 4), bool),
                   area=16, kind="nonroi")
    roi, nonroi = RX.contextual_region_cleaning([parent], [child])
    assert len(roi) == 2 and len(nonroi) == 0


def test_watershed_segments_mask(rng):
    from roibasedimagecompression_tpu.models.roi_extras import watershed_segments

    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    mask = np.zeros((48, 48), bool)
    mask[4:44, 4:20] = True
    mask[4:44, 28:44] = True
    labels = watershed_segments(img, mask, n_segments=8)
    assert labels[~mask].max() == 0
    assert labels[mask].min() >= 0
    assert len(np.unique(labels[mask])) >= 2


def test_fast_edge_map(reference_images):
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.ops import canny as CANNY

    img = image_io.imread_rgb(reference_images / "png" / "Lenna.png")[::4, ::4]
    edges, (low, high) = CANNY.get_edge_map_fast(img)
    assert edges.shape == img.shape[:2]
    assert 10 <= low < high <= 255
    assert 0 < edges.mean() < 0.5


def test_encode_debug_intermediates(reference_images):
    import roibasedimagecompression_tpu as rtc
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.models.codec import encode_debug

    img = image_io.imread_rgb(reference_images / "png" / "Lenna.png")[::4, ::4]
    out = encode_debug(img, rtc.CodecConfig(single_region=True))
    assert out["tier1"].shape == img.shape
    assert out["data"] == rtc.encode(img, rtc.CodecConfig(single_region=True))
    # tiers reduce color counts monotonically
    n1 = len(np.unique(out["tier1"].reshape(-1, 3), axis=0))
    n3 = len(np.unique(out["tier3"].reshape(-1, 3), axis=0))
    assert n3 <= n1


def test_difference_maps(rng):
    from roibasedimagecompression_tpu.eval.report import difference_maps

    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    maps = difference_maps(a, b)
    assert set(maps) == {"absolute", "squared", "weighted"}
    assert maps["weighted"].shape == (16, 16)
    assert maps["absolute"].max() == 255


def test_bilateral_filter_vs_cv2(rng):
    import cv2

    from roibasedimagecompression_tpu.ops.bilateral import bilateral_filter

    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    ours = np.asarray(bilateral_filter(jnp.asarray(img), 9, 50.0, 50.0))
    ref = cv2.bilateralFilter(img, 9, 50.0, 50.0)
    # Different window/normalization details; close agreement suffices.
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 8.0
    # Edge preservation: a hard edge must stay sharp.
    edge = np.zeros((32, 32, 3), np.uint8)
    edge[:, 16:] = 200
    sm = np.asarray(bilateral_filter(jnp.asarray(edge), 9, 30.0, 30.0))
    assert int(sm[16, 15, 0]) < 30 and int(sm[16, 16, 0]) > 170


def test_container_describe(reference_images):
    from roibasedimagecompression_tpu.io import container

    data = (reference_images / "rhccq_20_10" / "Lenna_compressed.rhccq").read_bytes()
    text = container.describe(data)
    assert "147 colors" in text
    assert "512x512" in text
    assert "bpp" in text


def test_spline_viz_surface(tmp_path):
    """Spline visualization module (visualization.py:5-323 equivalent):
    analysis text + all four figure builders produce files, and the quality
    metrics follow the reference's index-aligned error convention."""
    import numpy as np
    from roibasedimagecompression_tpu.models import spline as SP
    from roibasedimagecompression_tpu.models import spline_viz as SV

    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    coords = np.column_stack([50 + 30 * np.cos(t), 50 + 20 * np.sin(t)])
    result = SP.compress_shape(coords, num_sublists=3, compression_ratio=0.25)

    text = SV.compression_analysis(result)
    assert "DIVIDED COMPRESSION ANALYSIS" in text and "sublists: 3" in text

    key_points = SP.minimal_storage(result)
    recon = SP.reconstruct_from_minimal(key_points, num_points=400)

    SV.plot_divided_compression(coords, result, tmp_path / "d.png")
    SV.plot_minimal_storage(coords, key_points, recon, tmp_path / "m.png")
    SV.plot_reconstruction_overlay(coords, key_points, recon, tmp_path / "o.png")
    m = SV.plot_quality_metrics(coords, recon, tmp_path / "q.png")
    for f in ("d.png", "m.png", "o.png", "q.png"):
        assert (tmp_path / f).stat().st_size > 5000
    assert m["mean_error"] >= 0 and m["max_error"] >= m["mean_error"]
    # Index-aligned error (the reference's convention) includes the phase
    # drift between the original's arc-length indexing and the spline's
    # uniform parameter — even an ellipse lands at a few px, not ~0.
    assert m["mean_error"] < 20.0, m


def test_clahe_parameter_sweep(tmp_path):
    """Enhancer parameter sweep (test_clahe_parameters, clahe.py:257-293):
    all six named presets run, brightening maps are nonnegative in shadows
    and zero outside, and the comparison figure is written."""
    import numpy as np
    from roibasedimagecompression_tpu.models import enhance as EN

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    img[:24] //= 4  # dark half = shadows
    import jax.numpy as jnp
    from roibasedimagecompression_tpu.ops import colors as COL

    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(img)))
    mask = lab[..., 0] < 100
    out = EN.clahe_parameter_sweep(img, mask, figure_path=tmp_path / "sweep.png")
    assert set(out) == {n for n, _ in EN.CLAHE_PRESETS}
    for r in out.values():
        assert r["enhanced"].shape == img.shape
        assert np.all(r["brightening"][~mask] == 0)
    assert (tmp_path / "sweep.png").stat().st_size > 10000
