"""Device ops vs cv2/scipy oracles (the native kernels the reference relied on)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from roibasedimagecompression_tpu.ops import canny as CANNY
from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import distance as DIST
from roibasedimagecompression_tpu.ops import hist as H
from roibasedimagecompression_tpu.ops import morphology as M


@pytest.fixture(scope="module")
def lenna_gray():
    from roibasedimagecompression_tpu.io import image_io

    img = image_io.imread_rgb("/root/reference/images/png/Lenna.png")[::2, ::2]
    return np.asarray(COL.rgb_to_gray_cv2(jnp.asarray(img)))


def test_gray_cv2_parity():
    from roibasedimagecompression_tpu.io import image_io

    img = image_io.imread_rgb("/root/reference/images/png/Lenna.png")[::4, ::4]
    ours = np.asarray(COL.rgb_to_gray_cv2(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    # cv2 uses fixed-point arithmetic; allow off-by-one on rounding boundaries.
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    assert (ours == ref).mean() > 0.99


def test_otsu_matches_cv2(lenna_gray):
    ours = float(H.otsu_threshold(jnp.asarray(lenna_gray)))
    ref, _ = cv2.threshold(lenna_gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert ours == pytest.approx(ref, abs=1.0)


def test_masked_percentile(rng):
    vals = rng.normal(100, 30, (50, 50)).astype(np.float32)
    mask = vals > 90
    for q in (10, 50, 70, 90):
        ours = float(H.masked_percentile(jnp.asarray(vals), jnp.asarray(mask), q))
        ref = np.percentile(vals[mask].astype(np.float64), q)
        assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.parametrize("k", [3, 5, 11, 15])
def test_ellipse_kernel_matches_cv2(k):
    ours = M.ellipse_kernel(k).astype(np.uint8)
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("k", [3, 11])
def test_morphology_matches_cv2(rng, k):
    mask = (rng.random((64, 80)) > 0.7).astype(np.uint8) * 255
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    ours_d = np.asarray(M.dilate(jnp.asarray(mask > 0), se > 0))
    ref_d = cv2.dilate(mask, se) > 0
    np.testing.assert_array_equal(ours_d, ref_d)
    ours_e = np.asarray(M.erode(jnp.asarray(mask > 0), se > 0))
    ref_e = cv2.erode(mask, se) > 0
    np.testing.assert_array_equal(ours_e, ref_e)
    ours_c = np.asarray(M.close(jnp.asarray(mask > 0), se > 0))
    ref_c = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, se) > 0
    np.testing.assert_array_equal(ours_c, ref_c)


def test_box_density_matches_cv2(rng):
    mask = (rng.random((40, 52)) > 0.6).astype(np.uint8) * 255
    for k in (3, 15, 25):
        ours = np.asarray(CONV.box_density(jnp.asarray(mask), k))
        kernel = np.ones((k, k), np.float32) / (k * k)
        ref = cv2.filter2D((mask / 255.0).astype(np.float32), -1, kernel)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sobel_matches_cv2(lenna_gray):
    gx, gy = CONV.sobel_cv2(jnp.asarray(lenna_gray))
    ref_x = cv2.Sobel(lenna_gray, cv2.CV_64F, 1, 0, ksize=3)
    ref_y = cv2.Sobel(lenna_gray, cv2.CV_64F, 0, 1, ksize=3)
    np.testing.assert_allclose(np.asarray(gx), ref_x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), ref_y, atol=1e-3)


def test_connected_components_partition_matches_cv2(rng):
    mask = (rng.random((60, 60)) > 0.55).astype(np.uint8)
    for conn in (4, 8):
        ours, ours_n = CC.connected_components(mask, connectivity=conn)
        ref_n, ref = cv2.connectedComponents(mask, connectivity=conn)
        assert ours_n == ref_n
        # Same partition up to label permutation.
        pairs = set(zip(ours.ravel().tolist(), ref.ravel().tolist()))
        assert len(pairs) == ours_n  # bijection incl. background


def test_component_stats_matches_cv2(rng):
    mask = (rng.random((50, 70)) > 0.6).astype(np.uint8)
    ours_labels, n = CC.connected_components(mask, connectivity=8)
    stats = CC.component_stats(ours_labels, n)
    ref_n, ref_labels, ref_stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    assert n == ref_n
    # Match by area multiset and bbox dims multiset.
    ours_areas = sorted(stats.areas[1:].tolist())
    ref_areas = sorted(ref_stats[1:, cv2.CC_STAT_AREA].tolist())
    assert ours_areas == ref_areas
    ours_dims = sorted(zip(stats.height()[1:].tolist(), stats.width()[1:].tolist()))
    ref_dims = sorted(
        zip(ref_stats[1:, cv2.CC_STAT_HEIGHT].tolist(), ref_stats[1:, cv2.CC_STAT_WIDTH].tolist())
    )
    assert ours_dims == ref_dims


def test_distance_transform_exact(rng):
    mask = (rng.random((48, 64)) > 0.4)
    ours = np.asarray(DIST.distance_transform_l2(jnp.asarray(mask)))
    ref = ndi.distance_transform_edt(mask)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_canny_agreement_with_cv2(lenna_gray):
    """Canny parity: NMS tie-breaking differs at a handful of pixels, but the
    edge sets must agree almost everywhere."""
    for low, high in ((50, 150), (30, 90)):
        ours = np.asarray(CANNY.canny(jnp.asarray(lenna_gray), low, high))
        ref = cv2.Canny(lenna_gray, low, high) > 0
        union = (ours | ref).sum()
        inter = (ours & ref).sum()
        assert union > 0
        assert inter / union > 0.93, (low, high, inter / union)


def test_adaptive_thresholds_shape(lenna_gray):
    cands = np.asarray(CANNY.adaptive_thresholds(jnp.asarray(lenna_gray)))
    assert cands.shape == (20, 2)
    assert (cands[:, 0] >= 10).all() and (cands[:, 1] <= 255).all()
    assert (cands[:, 1] > cands[:, 0]).all()


def test_rgb_to_lab_known_values():
    # White -> L=100, a~0, b~0; pure red -> standard CIELAB value.
    rgb = np.array([[[255, 255, 255], [255, 0, 0], [0, 0, 0]]], np.uint8)
    lab = np.asarray(COL.rgb_to_lab(jnp.asarray(rgb)))[0]
    assert lab[0, 0] == pytest.approx(100.0, abs=0.01)
    assert abs(lab[0, 1]) < 0.01 and abs(lab[0, 2]) < 0.01
    assert lab[1, 0] == pytest.approx(53.24, abs=0.1)
    assert lab[1, 1] == pytest.approx(80.09, abs=0.2)
    assert lab[1, 2] == pytest.approx(67.2, abs=0.2)
    assert lab[2, 0] == pytest.approx(0.0, abs=0.01)


def test_lab_roundtrip(rng):
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    back = np.asarray(COL.lab_to_rgb(COL.rgb_to_lab(jnp.asarray(rgb))))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1


def test_propagate_keys_tagging(rng):
    """Tagged-key propagation: a component's min is negative iff it contains a
    tagged pixel; untagged components keep non-negative minima."""
    mask = np.zeros((16, 32), bool)
    mask[2, 1:30] = True          # long horizontal path (raster-aligned)
    mask[10:14, 5:9] = True       # separate blob, untagged
    ids = (np.arange(16 * 32, dtype=np.int32)).reshape(16, 32)
    keys = ids.copy()
    keys[2, 29] -= 1 << 30        # tag the FAR END of the path
    out = np.asarray(CC.propagate_keys(jnp.asarray(keys), jnp.asarray(mask), 8))
    path = out[mask & (ids // 32 == 2)]
    assert (path < 0).all()       # tag reached the whole path
    blob = out[10:14, 5:9]
    assert (blob >= 0).all()
    assert len(np.unique(blob)) == 1


def test_propagate_labels_long_snake(rng):
    """Convergence regression: a raster-order snake must fully converge
    (the 2-hop pointer-jumping version silently hit the iteration cap)."""
    h, w = 64, 128
    mask = np.zeros((h, w), bool)
    for r in range(0, h, 2):
        mask[r, :] = True
        if r + 1 < h:
            mask[r + 1, -1 if (r // 2) % 2 == 0 else 0] = True
    labels, num = CC.connected_components(mask, 8, prefer_native=False)
    assert num == 2  # one snake + background


def test_mxu_ops_pin_precision_or_document_exactness():
    """Cross-backend byte-identity contract: every MXU-lowered op in the
    package (dot_general / conv_general_dilated / matmul) must either pass
    an explicit `precision=` (the TPU default multiplies in bf16, which
    rounds operands with > 8 significant bits and flips downstream argmin /
    threshold decisions vs the exact f32 CPU path) or carry a comment
    within the call's preceding lines explaining why bf16 is exact for its
    operands (e.g. u8 values with +-1/+-2 taps)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "roibasedimagecompression_tpu"
    pattern = re.compile(r"dot_general\(|conv_general_dilated\(|jnp\.matmul\(|jnp\.dot\(")
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if not pattern.search(line):
                continue
            stripped = line.split("#")[0]
            if not pattern.search(stripped):
                continue  # only a comment/docstring mention
            if "def " in stripped or "over" in stripped:
                continue  # prose/docstring line
            window = "\n".join(lines[max(0, i - 8): i + 10])
            if "precision" in window or "bf16-exact" in window or "exact in" in window:
                continue
            offenders.append(f"{path.name}:{i + 1}: {line.strip()}")
    assert not offenders, (
        "MXU ops without explicit precision or a bf16-exactness comment:\n"
        + "\n".join(offenders)
    )
