"""Metric ops vs independent NumPy oracles + golden baseline regression."""

import numpy as np
import pytest

from roibasedimagecompression_tpu.eval import harness
from roibasedimagecompression_tpu.ops import metrics as M


def _ssim_oracle(a, b, data_range=255.0, win=7):
    """Straightforward NumPy SSIM (uniform window, sample covariance)."""
    from numpy.lib.stride_tricks import sliding_window_view

    a = a.astype(np.float64)
    b = b.astype(np.float64)

    def f(x):
        return sliding_window_view(x, (win, win)).mean(axis=(-1, -2))

    cov_norm = win * win / (win * win - 1.0)
    ux, uy = f(a), f(b)
    vx = cov_norm * (f(a * a) - ux * ux)
    vy = cov_norm * (f(b * b) - uy * uy)
    vxy = cov_norm * (f(a * b) - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_psnr_identity(rng):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert np.isinf(float(M.psnr(img, img)))


def test_psnr_known_value():
    a = np.zeros((16, 16), np.uint8)
    b = np.full((16, 16), 16, np.uint8)
    expected = 10 * np.log10(255.0**2 / 256.0)
    assert float(M.psnr(a, b)) == pytest.approx(expected, abs=1e-4)


def test_ssim_matches_oracle(rng):
    a = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-12, 12, a.shape), 0, 255).astype(
        np.uint8
    )
    ours = float(M.ssim_single(a, b))
    assert ours == pytest.approx(_ssim_oracle(a, b), abs=2e-4)


def test_ssim_multichannel_is_channel_mean(rng):
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    per = [float(M.ssim_single(a[..., c], b[..., c])) for c in range(3)]
    assert float(M.ssim(a, b)) == pytest.approx(np.mean(per), abs=1e-5)


def test_quality_metrics_fields(rng):
    a = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    q = M.quality_metrics(a, b)
    for key in ("psnr", "ssim", "mse", "rmse", "mae", "max_error", "mse_r", "mse_g", "mse_b"):
        assert key in q
    assert q["mse"] == pytest.approx(np.mean((a.astype(float) - b.astype(float)) ** 2), rel=1e-5)


def test_kodak_baseline_regression(reference_images):
    """The shipped artifact set must reproduce BASELINE.md:
    mean PSNR 33.30 dB (min 28.32, max 37.10), mean rate 3.17 bpp, N=24."""
    pairs = harness.kodak_pairs(reference_images)
    assert len(pairs) == 24
    results = harness.evaluate_pairs(pairs)
    summary = harness.summarize(results)
    assert summary["psnr_mean"] == pytest.approx(33.30, abs=0.02)
    assert summary["psnr_min"] == pytest.approx(28.32, abs=0.02)
    assert summary["psnr_max"] == pytest.approx(37.10, abs=0.02)
    assert summary["bpp_mean"] == pytest.approx(3.17, abs=0.02)
    colors = [r.n_colors for r in results]
    assert min(colors) >= 102 and max(colors) <= 149


def test_lenna_baseline(reference_images):
    res = harness.evaluate_pair(
        reference_images / "png" / "Lenna.png",
        reference_images / "rhccq_20_10" / "Lenna_compressed.rhccq",
    )
    assert res.psnr == pytest.approx(33.26, abs=0.02)
    assert res.file_bytes == 122736
    assert res.bpp == pytest.approx(3.75, abs=0.01)


def test_ssim_smooth_gradient_tight(rng):
    """Near-cancelling variance regression: smooth bright content made the
    TPU conv's default bf16 multiplies blow SSIM past [-1, 1] (observed
    -7.2).  Precision.HIGHEST in the uniform filter is load-bearing; this
    pins a tight oracle match on adversarially smooth content."""
    ramp = np.linspace(180, 250, 64, dtype=np.float32)
    a = np.broadcast_to(ramp, (64, 64)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    ours = float(M.ssim_single(a, b))
    oracle = _ssim_oracle(a, b)
    assert abs(ours - oracle) < 1e-4
    assert -1.0 <= ours <= 1.0
