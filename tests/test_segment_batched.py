"""Equivalence tests for the batched segmentation stage (round-2 perf work).

The batched path (split_scores_many / region_segments_many /
build_segment_maps_many) must produce identical outputs to independent
per-region / per-image calls — batching is a scheduling change, not a
semantic one.
"""

import numpy as np
import pytest

from roibasedimagecompression_tpu import CodecConfig
from roibasedimagecompression_tpu.io import image_io
from roibasedimagecompression_tpu.models import codec as CODEC
from roibasedimagecompression_tpu.models import segment as SEG

KODAK = "/root/reference/images/png"


@pytest.fixture(scope="module")
def kodak_crops():
    img1 = image_io.imread_rgb(f"{KODAK}/3.png")[:160, :224]
    img2 = image_io.imread_rgb(f"{KODAK}/5.png")[:160, :224]
    return img1, img2


def _checker_regions(img):
    """Two synthetic regions with different shapes from one image."""
    h, w = img.shape[:2]
    m1 = np.zeros((h, w), bool)
    m1[: h // 2, : w // 2] = True
    m2 = np.zeros((h - 40, w), bool)
    m2[:, w // 3 :] = True
    return [
        (img[: h // 2, : w // 2], m1[: h // 2, : w // 2]),
        (img[40:, :], m2),
    ]


def test_split_scores_many_matches_singles(kodak_crops):
    img1, img2 = kodak_crops
    pairs = _checker_regions(img1) + _checker_regions(img2)
    crops = [p[0] for p in pairs]
    masks = [p[1] for p in pairs]
    batched = SEG.split_scores_many(crops, masks)
    for i in range(len(pairs)):
        single = SEG.split_scores_many([crops[i]], [masks[i]])[0]
        assert batched[i] == pytest.approx(single, abs=1e-5)


def test_region_segments_many_matches_singles(kodak_crops):
    img1, img2 = kodak_crops
    pairs = _checker_regions(img1) + _checker_regions(img2)
    crops = [p[0] for p in pairs]
    masks = [p[1] for p in pairs]
    n_segs = SEG.optimal_segments_many(crops, masks)
    batched = SEG.region_segments_many(crops, masks, n_segs)
    for i in range(len(pairs)):
        single = SEG.region_segments(crops[i], masks[i], n_segs[i])
        np.testing.assert_array_equal(batched[i], single)


def test_build_segment_maps_many_matches_per_image(kodak_crops):
    """Pooling two images' regions into one batch must not change either
    image's segment map, qualities, or groups."""
    img1, img2 = kodak_crops
    config = CodecConfig()
    per_image = []
    for img in (img1, img2):
        from roibasedimagecompression_tpu import config as cfg
        from roibasedimagecompression_tpu.models import roi_fused as ROI

        roi_mask, nonroi_mask = ROI.roi_masks(img, config)
        roi_r = SEG.extract_regions(roi_mask, "roi")
        nonroi_r = SEG.extract_regions(nonroi_mask, "nonroi")
        per_image.append(
            SEG.reassign_small_roi(roi_r, nonroi_r, cfg.min_region_size(img.size))
        )

    pooled = CODEC.build_segment_maps_many([img1, img2], per_image, config)
    for k, img in enumerate((img1, img2)):
        solo_map, solo_q, solo_g = CODEC.build_segment_map(
            img, per_image[k][0], per_image[k][1], config
        )
        np.testing.assert_array_equal(pooled[k][0], solo_map)
        np.testing.assert_allclose(pooled[k][1], solo_q)
        np.testing.assert_array_equal(pooled[k][2], solo_g)


def test_region_fusion_merges_adjacent():
    """Bidirectional reassignment + fusion (roi.py:109-249): a small non-ROI
    strip between two large ROI blocks is promoted to ROI and the three
    fragments fuse into ONE region."""
    img = np.zeros((64, 64, 3), np.uint8)
    roi_mask = np.zeros((64, 64), bool)
    roi_mask[10:40, 5:35] = True       # block A (900 px)
    roi_mask[10:40, 37:64] = True      # block B (810 px)
    nonroi_mask = np.zeros((64, 64), bool)
    nonroi_mask[10:40, 35:37] = True   # 60 px strip between them (small)

    roi_r, nonroi_r = SEG.process_regions_with_reassignment(
        img, roi_mask, nonroi_mask
    )
    # min size law: ceil(4096 / 10^(ceil(log10 4096)-3)) = 410
    assert len(roi_r) == 1 and len(nonroi_r) == 0
    assert roi_r[0].area == 30 * 59
    assert roi_r[0].kind == "roi"


def test_region_fusion_noop_when_disjoint():
    img = np.zeros((64, 64, 3), np.uint8)
    roi_mask = np.zeros((64, 64), bool)
    roi_mask[2:30, 2:30] = True
    roi_mask[34:62, 34:62] = True
    nonroi_mask = np.zeros((64, 64), bool)
    roi_r, nonroi_r = SEG.process_regions_with_reassignment(
        img, roi_mask, nonroi_mask
    )
    assert len(roi_r) == 2 and len(nonroi_r) == 0


def test_encode_with_region_fusion_roundtrips():
    import roibasedimagecompression_tpu as rtc

    img = image_io.imread_rgb(f"{KODAK}/3.png")[:128, :160]
    cfg = rtc.CodecConfig(region_fusion=True)
    data = rtc.encode(img, cfg)
    rec = rtc.decode(data)
    assert rec.shape == img.shape
