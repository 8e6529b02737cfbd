"""Global palette refinement (models/refine.py): exactness, black-sentinel
pinning, grouping invariance, cross-path byte identity."""

import hashlib
import os

import numpy as np
import pytest

import roibasedimagecompression_tpu as rtc
from roibasedimagecompression_tpu.io import image_io
from roibasedimagecompression_tpu.models import codec, refine as RF
from roibasedimagecompression_tpu.ops import metrics as M


@pytest.fixture(scope="module")
def lenna():
    return image_io.imread_rgb("/root/reference/images/png/Lenna.png")


def _mse(colors, mass, palette, assign):
    d = colors.astype(np.float64) - palette[assign].astype(np.float64)
    return float((mass * (d * d).sum(axis=1)).sum())


def test_refine_reduces_weighted_mse():
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 256, (400, 3), np.uint8)
    mass = rng.integers(1, 50, 400)
    palette = rng.integers(1, 256, (24, 3), np.uint8)  # no black entry
    # baseline: nearest assignment against the unrefined palette
    p0, a0 = RF.refine_palette(colors, mass, palette, 0)
    d2 = (
        (colors.astype(np.float64) ** 2).sum(1)[:, None]
        + (palette.astype(np.float64) ** 2).sum(1)[None, :]
        - 2.0 * colors.astype(np.float64) @ palette.astype(np.float64).T
    )
    base = _mse(colors, mass, palette, np.argmin(d2, axis=1))
    p1, a1 = RF.refine_palette(colors, mass, palette, 3)
    assert _mse(colors, mass, p1, a1) <= base
    # assign-last: returned indices are nearest entries of the final palette
    d2f = (
        (colors.astype(np.float64) ** 2).sum(1)[:, None]
        + (p1.astype(np.float64) ** 2).sum(1)[None, :]
        - 2.0 * colors.astype(np.float64) @ p1.astype(np.float64).T
    )
    assert (a1 == np.argmin(d2f, axis=1)).all()


def test_refine_black_sentinel_pinned():
    """Black palette entries freeze; exactly-black rows pin to the black
    entry; non-black rows never land on it (models/quantize.py:11 law)."""
    colors = np.array([[0, 0, 0], [1, 1, 1], [200, 10, 10], [190, 5, 5]], np.uint8)
    mass = np.array([1000, 50, 10, 10])
    palette = np.array([[0, 0, 0], [3, 3, 3], [180, 8, 8]], np.uint8)
    pal, assign = RF.refine_palette(colors, mass, palette, 4)
    assert (pal[0] == 0).all()
    assert assign[0] == 0
    assert (assign[1:] != 0).all()  # (1,1,1) is nearest to black but excluded


def test_refine_grouping_invariance():
    """Duplicate rows (cluster-table form) and mass-merged unique rows
    (canvas form) must produce bit-identical palettes and assignments."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (60, 3), np.uint8)
    reps = rng.integers(1, 5, 60)
    dup_colors = np.repeat(base, reps, axis=0)
    dup_mass = rng.integers(1, 9, len(dup_colors))
    palette = np.vstack([[[0, 0, 0]], rng.integers(1, 256, (15, 3))]).astype(np.uint8)

    packed = (
        (dup_colors[:, 0].astype(np.int64) << 16)
        | (dup_colors[:, 1].astype(np.int64) << 8)
        | dup_colors[:, 2].astype(np.int64)
    )
    uniq, inv = np.unique(packed, return_inverse=True)
    u_colors = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], 1
    ).astype(np.uint8)
    u_mass = np.bincount(inv, weights=dup_mass.astype(np.float64))

    p_dup, a_dup = RF.refine_palette(dup_colors, dup_mass, palette, 3)
    p_uni, a_uni = RF.refine_palette(u_colors, u_mass, palette, 3)
    assert np.array_equal(p_dup, p_uni)
    assert np.array_equal(a_dup, a_uni[inv])


def test_refine_cross_path_identity(lenna):
    """Table path (encode/encode_many), canvas-tiers path, and encode_debug
    produce identical bytes with refinement enabled."""
    from roibasedimagecompression_tpu.parallel import stream

    img = lenna[:192, :192]
    cfg = rtc.CodecConfig(palette_refine_iters=2)
    a = rtc.encode(img, cfg)
    os.environ["RHCCQ_CANVAS_TIERS"] = "1"
    try:
        b = stream.encode_many([img], cfg)[0]
    finally:
        del os.environ["RHCCQ_CANVAS_TIERS"]
    c = codec.encode_debug(img, cfg)["data"]
    d = stream.encode_many([img], cfg)[0]
    assert len({hashlib.sha256(x).hexdigest() for x in (a, b, c, d)}) == 1


def test_refine_improves_quality_at_bounded_rate(lenna):
    """R-D contract on a real image: PSNR strictly up at a sane rate cost.
    (Full-image Kodak slopes measured 2.7-10.5 dB/bpp, mean ~5 — above the
    ~2.6 quality-ladder slope; small crops can dip lower, e.g. this Lenna
    crop pays ~1.5 dB/bpp, so the per-image bound here is deliberately
    loose.)"""
    img = lenna[:256, :256]
    d0 = rtc.encode(img, rtc.CodecConfig(palette_refine_iters=0))
    d1 = rtc.encode(img, rtc.CodecConfig(palette_refine_iters=1))
    q0 = M.quality_metrics(img, rtc.decode(d0))
    q1 = M.quality_metrics(img, rtc.decode(d1))
    dbpp = (len(d1) - len(d0)) * 8 / img.shape[0] / img.shape[1]
    assert q1["psnr"] > q0["psnr"] + 0.1
    assert (q1["psnr"] - q0["psnr"]) > 1.0 * max(dbpp, 0.0)


def test_refit_minimizes_mse_at_fixed_indices(lenna):
    """refit_pixels is the exact Lloyd centroid step at the pixel level:
    MSE cannot increase (rounded means are the integer minimizers per
    channel), indices are untouched, black entries freeze."""
    from roibasedimagecompression_tpu.io import container as C

    img = lenna[:256, :256]
    dbg = codec.encode_debug(img, rtc.CodecConfig(palette_refit=False))
    pay = C.unpack(dbg["data"])
    pal2 = RF.refit_pixels(img, pay.palette, pay.indices)
    f = img.astype(np.float64)
    mse0 = ((f - pay.palette[pay.indices]) ** 2).mean()
    mse1 = ((f - pal2[pay.indices]) ** 2).mean()
    assert mse1 <= mse0
    frozen = (pay.palette == 0).all(axis=1)
    assert (pal2[frozen] == 0).all()
    # Non-contiguous views are accepted (reshape(-1) copies when needed).
    half = RF.refit_pixels(img[:128], pal2, pay.indices[:128])
    assert half.shape == pal2.shape


def test_refit_zero_rate_identical_index_stream(lenna):
    """palette_refit changes palette VALUES only: the decoded index matrix is
    identical and quality does not regress."""
    from roibasedimagecompression_tpu.io import container as C

    img = lenna[:192, :192]
    d0 = rtc.encode(img, rtc.CodecConfig(palette_refit=False))
    d1 = rtc.encode(img, rtc.CodecConfig(palette_refit=True))
    p0, p1 = C.unpack(d0), C.unpack(d1)
    assert np.array_equal(p0.indices, p1.indices)
    assert p0.palette.shape == p1.palette.shape
    q0 = M.quality_metrics(img, p0.to_rgb())
    q1 = M.quality_metrics(img, p1.to_rgb())
    assert q1["psnr"] >= q0["psnr"]


def test_refit_gated_off_under_hole_filling():
    assert RF.effective_refit(rtc.CodecConfig())
    assert not RF.effective_refit(rtc.CodecConfig(fill_black_holes=3))
    assert not RF.effective_refit(rtc.CodecConfig(palette_refit=False))
    os.environ["RHCCQ_PALETTE_REFIT"] = "0"
    try:
        assert not RF.effective_refit(rtc.CodecConfig())
    finally:
        del os.environ["RHCCQ_PALETTE_REFIT"]


def test_refine_gated_off_under_hole_filling():
    cfg = rtc.CodecConfig(palette_refine_iters=2, fill_black_holes=3)
    assert RF.effective_iters(cfg) == 0
    os.environ["RHCCQ_PALETTE_REFINE"] = "3"
    try:
        assert RF.effective_iters(rtc.CodecConfig()) == 3
        assert RF.effective_iters(cfg) == 0
    finally:
        del os.environ["RHCCQ_PALETTE_REFINE"]
