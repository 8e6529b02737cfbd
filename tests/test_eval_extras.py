"""Tests for the round-2 evaluation surface additions: black-hole fill,
the 12-panel comparison figure, the adaptive-metrics printer, SSIM map."""

import os

import numpy as np
import pytest

from roibasedimagecompression_tpu.io import image_io

KODAK = "/root/reference/images/png"


def test_fill_black_holes_basic():
    from roibasedimagecompression_tpu.models.holes import fill_black_holes

    img = np.full((16, 16, 3), 100, np.uint8)
    img[4:6, 4:6] = 0          # 4-px hole -> filled
    img[10:14, 10:14] = 0      # 16-px hole -> too big at max=10
    out = fill_black_holes(img, max_hole_size=10)
    assert (out[4:6, 4:6] == 100).all()
    assert (out[10:14, 10:14] == 0).all()
    # Input untouched.
    assert (img[4:6, 4:6] == 0).all()


def test_fill_black_holes_most_common_neighbor():
    from roibasedimagecompression_tpu.models.holes import fill_black_holes

    img = np.full((8, 8, 3), 200, np.uint8)
    img[0:4, :] = 50           # top half a different color
    img[3:5, 3:5] = 0          # hole straddling the boundary
    out = fill_black_holes(img, max_hole_size=10)
    # Ring: rows 2 and 5 contribute 4 pixels each; rows 3-4 contribute
    # 2 side pixels each per color band -> 8 votes for each color band?
    # Count: dilated ring has 12 pixels: rows 2 (cols 2-5: color 50) = 4,
    # row 5 (cols 2-5: color 200) = 4, rows 3-4 cols 2 and 5: row 3 is 50
    # (2 px), row 4 is 200 (2 px) -> 6 votes each; tie -> smaller packed
    # color (50,50,50).
    filled = out[3:5, 3:5]
    assert (filled == filled[0, 0]).all()
    assert tuple(filled[0, 0]) in ((50, 50, 50), (200, 200, 200))
    assert not (filled == 0).any()


def test_fill_black_holes_all_black_neighbors_stay():
    from roibasedimagecompression_tpu.models.holes import fill_black_holes

    img = np.zeros((8, 8, 3), np.uint8)  # everything black, one big region
    out = fill_black_holes(img, max_hole_size=100)
    assert (out == 0).all()


def test_encode_with_hole_fill_roundtrips():
    import roibasedimagecompression_tpu as rtc

    img = image_io.imread_rgb(f"{KODAK}/5.png")[:96, :128]
    data = rtc.encode(img, rtc.CodecConfig(fill_black_holes=50))
    rec = rtc.decode(data)
    assert rec.shape == img.shape


def test_ssim_map_shape_and_range():
    from roibasedimagecompression_tpu.ops import metrics as M

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    noise = rng.integers(-10, 10, a.shape)
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    smap = M.ssim_map(a, b)
    assert smap.shape == (64, 48)
    assert float(M.ssim(a, a)) == pytest.approx(1.0)
    assert (M.ssim_map(a, a) > 0.999).all()
    assert smap.mean() == pytest.approx(float(M.ssim(a, b)), abs=0.05)


def test_comparison_figure_writes_png(tmp_path):
    from roibasedimagecompression_tpu.eval import report

    img = image_io.imread_rgb(f"{KODAK}/3.png")[:96, :128]
    rec = img.copy()
    rec[::2] = np.clip(rec[::2].astype(int) + 6, 0, 255).astype(np.uint8)
    out = tmp_path / "panels.png"
    metrics = report.comparison_figure(img, rec, out)
    assert out.exists() and out.stat().st_size > 10_000
    assert metrics["psnr"] > 20


def test_adaptive_report_format():
    from roibasedimagecompression_tpu.eval import adaptive as A

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    b = a.copy()
    b[:2, :2] = 255 - b[:2, :2]  # a few large-error outliers
    b[10:] = np.clip(b[10:].astype(int) + 3, 0, 255).astype(np.uint8)
    m = A.adaptive_quality_metrics(a, b)
    text = A.format_adaptive_report(m, a.shape)
    assert "ADAPTIVE QUALITY METRICS" in text
    assert "OUTLIER DETECTION" in text
    assert "ALL PIXELS" in text
    assert f"{m['all_pixels']['psnr']:8.2f}" in text


def test_cli_compare_panels(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "fig.png"
    r = subprocess.run(
        [
            sys.executable, "-m", "roibasedimagecompression_tpu", "compare",
            f"{KODAK}/Lenna.png",
            "/root/reference/images/rhccq_20_10/Lenna_compressed.rhccq",
            "--panels", str(out),
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "RHCCQ_FORCE_CPU": "1"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
