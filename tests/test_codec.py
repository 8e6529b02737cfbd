"""End-to-end codec tests: round-trips, quality laws, path equivalence."""

import numpy as np
import pytest

import roibasedimagecompression_tpu as rtc
from roibasedimagecompression_tpu.io import container, image_io
from roibasedimagecompression_tpu.models import codec
from roibasedimagecompression_tpu.ops import metrics as M


@pytest.fixture(scope="module")
def lenna128():
    return image_io.imread_rgb("/root/reference/images/png/Lenna.png")[::4, ::4]


def test_encode_decode_roundtrip(lenna128):
    data = rtc.encode(lenna128, rtc.CodecConfig(single_region=True))
    rec = rtc.decode(data)
    assert rec.shape == lenna128.shape
    q = M.quality_metrics(lenna128, rec)
    assert q["psnr"] > 28.0  # preset 20/10 regime
    payload = container.unpack(data)
    assert payload.n_colors < 600


def test_full_mode_encode(lenna128):
    data = rtc.encode(lenna128)
    rec = rtc.decode(data)
    q = M.quality_metrics(lenna128, rec)
    assert q["psnr"] > 27.0
    assert len(data) * 8 / lenna128.size * 3 < 8.0  # sane bpp


def test_batched_matches_loop_path_quality(lenna128):
    """The batched tier-1 and the reference-shaped per-segment loop must land
    in the same rate-distortion neighbourhood (same laws, different k-means
    tie-breaking)."""
    img = lenna128[:96, :96]
    a = rtc.encode(img, rtc.CodecConfig(single_region=True, batched=True))
    b = rtc.encode(img, rtc.CodecConfig(single_region=True, batched=False))
    qa = M.quality_metrics(img, rtc.decode(a))
    qb = M.quality_metrics(img, rtc.decode(b))
    assert abs(qa["psnr"] - qb["psnr"]) < 2.0
    assert abs(len(a) - len(b)) / max(len(a), len(b)) < 0.35


def test_composed_tiers_match_canvas_path_bytes(lenna128, monkeypatch):
    """The cluster-table composition of tiers 2/3 + final palette must be
    byte-identical to the per-pixel canvas path it replaced (the two are
    algebraically equal: each tier-1 cluster paints one color, so the canvas
    re-extraction sees exactly the composed (problem, color) sets)."""
    from roibasedimagecompression_tpu.parallel import stream

    img = lenna128[:96, :96]
    cfg_full = rtc.CodecConfig()
    cfg_single = rtc.CodecConfig(single_region=True)

    composed_single = rtc.encode(img, cfg_single)
    composed_full = rtc.encode(img, cfg_full)
    composed_batch = stream.encode_many([img, lenna128[32:128, 32:128]], cfg_full)

    monkeypatch.setenv("RHCCQ_CANVAS_TIERS", "1")
    assert rtc.encode(img, cfg_single) == composed_single
    assert rtc.encode(img, cfg_full) == composed_full
    assert (
        stream.encode_many([img, lenna128[32:128, 32:128]], cfg_full)
        == composed_batch
    )


def test_quality_knob_monotone(lenna128):
    """Higher quality preset => higher PSNR and (weakly) larger files."""
    img = lenna128[:96, :96]
    lo = rtc.encode(img, rtc.CodecConfig(single_region=True, roi_quality=10, nonroi_quality=5))
    hi = rtc.encode(img, rtc.CodecConfig(single_region=True, roi_quality=45, nonroi_quality=30))
    q_lo = M.quality_metrics(img, rtc.decode(lo))
    q_hi = M.quality_metrics(img, rtc.decode(hi))
    assert q_hi["psnr"] > q_lo["psnr"]


def test_encoded_file_decodable_by_reference_format(lenna128, tmp_path):
    """Our writer must produce files the reference reader logic accepts:
    magic + zlib(pickle(dict with s/l/p/i/d))."""
    import pickle
    import struct
    import zlib

    data = rtc.encode(lenna128, rtc.CodecConfig(single_region=True))
    assert data[:5] == b"RHCCQ"
    (size,) = struct.unpack("<I", data[5:9])
    payload = pickle.loads(zlib.decompress(data[9 : 9 + size]))
    assert set(payload.keys()) == {"s", "l", "p", "i", "d"}
    palette = np.frombuffer(zlib.decompress(payload["p"]), np.uint8).reshape(-1, 3)
    assert len(palette) == payload["l"]
    h, w = payload["s"]
    idx = np.frombuffer(zlib.decompress(payload["i"]), payload["d"]).reshape(h, w)
    rgb = palette[idx]
    np.testing.assert_array_equal(rgb, rtc.decode(data))


def test_black_repair():
    """Black pixels inside a segment take the darkest non-black color."""
    px = np.array([[0, 0, 0], [10, 20, 30], [200, 10, 10]], np.uint8)
    out = codec._black_repair(px.copy())
    assert tuple(out[0]) == (10, 20, 30)
    assert tuple(out[1]) == (10, 20, 30)


def test_tier1_colors_segment_isolation():
    """Colors never leak across segment boundaries in batched tier-1."""
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = [200, 0, 0]
    img[:, 4:] = [0, 200, 0]
    seg = np.ones((8, 8), np.int32)
    seg[:, 4:] = 2
    qual = np.array([0.0, 50.0, 50.0])
    out = QB.tier1_colors(img, seg, qual)
    assert (out[:, :4] == [200, 0, 0]).all()
    assert (out[:, 4:] == [0, 200, 0]).all()


def test_tier1_respects_max_colors_law():
    from roibasedimagecompression_tpu.models import quantize_batched as QB
    from roibasedimagecompression_tpu.config import clustering_params

    rng = np.random.default_rng(0)
    img = rng.integers(100, 140, (32, 32, 3)).astype(np.uint8)
    seg = np.ones((32, 32), np.int32)
    qual = np.array([0.0, 20.0])
    out = QB.tier1_colors(img, seg, qual)
    n_in = len(np.unique(img.reshape(-1, 3), axis=0))
    n_out = len(np.unique(out.reshape(-1, 3), axis=0))
    # One tight blob -> split law: ~n/max_colors clusters, far fewer than input.
    params = clustering_params(n_in + 1, 20.0)
    assert n_out <= max(-(-n_in // params.max_colors_per_cluster) * 3, 30)
    assert n_out < n_in


def test_mediancut_split_respects_max_colors_law():
    """split_method='mediancut' satisfies the max_colors_per_cluster law:
    recursive binary PCA cuts halve every oversized cluster until all are
    within their limit (clusters of size <= 2 are never split, matching the
    k-means path's guard)."""
    from roibasedimagecompression_tpu.config import clustering_params
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    rng = np.random.default_rng(1)
    img = rng.integers(100, 140, (32, 32, 3)).astype(np.uint8)
    seg = np.ones((32, 32), np.int32)
    seg[16:, :] = 2
    qual = np.array([0.0, 20.0, 35.0])
    table = QB.tier1_table(img, seg, qual, split_method="mediancut")
    seg_of_pair, cop = table["seg_of_pair"], table["cluster_of_pair"]
    for s in (1, 2):
        selp = seg_of_pair == s
        params = clustering_params(int(selp.sum()) + 1, float(qual[s]))
        sizes = np.bincount(cop[selp], minlength=int(cop.max()) + 1)
        assert sizes.max() <= max(params.max_colors_per_cluster, 2)


def test_hybrid_split_respects_max_colors_law():
    """split_method='hybrid' (device k-means above the 64-color cutoff, host
    median cut below) also satisfies the max_colors_per_cluster law."""
    from roibasedimagecompression_tpu.config import clustering_params
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    rng = np.random.default_rng(2)
    img = rng.integers(60, 200, (48, 48, 3)).astype(np.uint8)
    seg = np.ones((48, 48), np.int32)
    seg[24:, :] = 2
    qual = np.array([0.0, 15.0, 30.0])
    table = QB.tier1_table(img, seg, qual, split_method="hybrid")
    seg_of_pair, cop = table["seg_of_pair"], table["cluster_of_pair"]
    for s in (1, 2):
        selp = seg_of_pair == s
        params = clustering_params(int(selp.sum()) + 1, float(qual[s]))
        sizes = np.bincount(cop[selp], minlength=int(cop.max()) + 1)
        assert sizes.max() <= max(params.max_colors_per_cluster, 2)


def test_mediancut_split_encode_roundtrip(lenna128):
    """Full encode with the median-cut split: deterministic, within its
    measured R-D corridor (a LOWER-rate operating point than the k-means
    split — see CodecConfig.split_method), and batched == single."""
    from roibasedimagecompression_tpu.parallel import stream

    c = rtc.CodecConfig(split_method="mediancut")
    d1 = rtc.encode(lenna128, c)
    assert d1 == rtc.encode(lenna128, c)
    q = M.quality_metrics(lenna128, rtc.decode(d1))
    bpp = len(d1) * 8 / (128 * 128)
    assert q["psnr"] > 28.0, (q["psnr"], bpp)
    assert bpp < 4.5, (q["psnr"], bpp)
    assert stream.encode_many([lenna128], c) == [d1]


def test_hybrid_split_encode_roundtrip(lenna128):
    """Full encode with the hybrid split: deterministic, near the k-means
    R-D corridor (tiny clusters take margin-scaled host median cuts), and
    batched == single."""
    from roibasedimagecompression_tpu.parallel import stream

    c = rtc.CodecConfig(split_method="hybrid")
    d1 = rtc.encode(lenna128, c)
    assert d1 == rtc.encode(lenna128, c)
    q = M.quality_metrics(lenna128, rtc.decode(d1))
    bpp = len(d1) * 8 / (128 * 128)
    assert q["psnr"] > 30.0, (q["psnr"], bpp)
    assert bpp < 6.5, (q["psnr"], bpp)
    assert stream.encode_many([lenna128], c) == [d1]


def test_split_margin_law_and_levels():
    """split_margin > 1 still satisfies max_colors_per_cluster (it's a MAX
    law) and produces at least as many clusters as margin 1."""
    from roibasedimagecompression_tpu.config import clustering_params
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    rng = np.random.default_rng(3)
    img = rng.integers(90, 150, (32, 32, 3)).astype(np.uint8)
    seg = np.ones((32, 32), np.int32)
    qual = np.array([0.0, 20.0])
    counts = {}
    for m in (1.0, 3.0):
        t = QB.tier1_table(img, seg, qual, split_margin=m)
        cop = t["cluster_of_pair"]
        sizes = np.bincount(cop)
        params = clustering_params(int(len(cop)) + 1, 20.0)
        assert sizes.max() <= max(params.max_colors_per_cluster, 2), m
        counts[m] = int(cop.max()) + 1
    assert counts[3.0] >= counts[1.0]


def test_weighted_split_decoupled_from_weighted_palette(monkeypatch):
    """weighted_split reaches the tier-2/3 split even with weighted_palette
    off: cluster_pair_table threads the pixel counts to the split whenever
    weighted_split is on; the `weighted` flag gates only the cluster means."""
    from roibasedimagecompression_tpu.models import quantize_batched as QB

    captured = {}
    real = QB._split_oversized_batched

    def spy(colors, cop, lim, nxt, seed, **kw):
        captured["weights"] = kw.get("weights")
        return real(colors, cop, lim, nxt, seed, **kw)

    monkeypatch.setattr(QB, "_split_oversized_batched", spy)
    rng = np.random.default_rng(4)
    colors = rng.integers(1, 255, (60, 3)).astype(np.int64)
    keys = np.unique(colors[:, 0] << 16 | colors[:, 1] << 8 | colors[:, 2])
    counts = np.arange(1, len(keys) + 1, dtype=np.int64)
    QB.cluster_pair_table(
        keys, counts, [20.0], weighted=False, weighted_split=True
    )
    assert captured["weights"] is not None
    QB.cluster_pair_table(
        keys, counts, [20.0], weighted=False, weighted_split=False
    )
    assert captured["weights"] is None


def test_weighted_split_drop_warns_once():
    """Split paths with no weighted kernel (median cut) signal the drop
    instead of silently ignoring the weighted_split knob — and only once."""
    import warnings

    from roibasedimagecompression_tpu.models import quantize_batched as QB

    QB._WEIGHT_DROP_WARNED.clear()
    colors = np.array([[0.0, 0, 0], [10, 0, 0], [20, 0, 0], [255, 0, 0]],
                      np.float32)
    cop = np.zeros(4, np.int64)
    lim = np.ones(4, np.int64)
    with pytest.warns(RuntimeWarning, match="weighted_split"):
        QB._split_oversized_batched(
            colors, cop.copy(), lim, 1, 42, method="mediancut",
            weights=np.ones(4),
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        QB._split_oversized_batched(
            colors, cop.copy(), lim, 1, 42, method="mediancut",
            weights=np.ones(4),
        )


def test_low_latency_preset_roundtrip(lenna128):
    """CodecConfig.low_latency(): decodable output, deterministic, within
    the fast-mode R-D corridor; overrides pass through."""
    c = rtc.CodecConfig.low_latency()
    assert c.fast_edges and c.split_margin == 3.0
    assert rtc.CodecConfig.low_latency(roi_quality=40.0).roi_quality == 40.0
    d = rtc.encode(lenna128, c)
    assert d == rtc.encode(lenna128, c)
    q = M.quality_metrics(lenna128, rtc.decode(d))
    assert q["psnr"] > 29.0, q["psnr"]


def test_fused_roi_matches_modular(lenna128):
    """The single-graph ROI pipeline must reproduce the stage-by-stage host
    version exactly."""
    import roibasedimagecompression_tpu as rtc
    from roibasedimagecompression_tpu.models import roi as ROI
    from roibasedimagecompression_tpu.models import roi_fused as RF

    cfg_ = rtc.CodecConfig()
    a_roi, a_non = ROI.roi_masks(lenna128, cfg_)
    b_roi, b_non = RF.roi_masks(lenna128, cfg_)
    np.testing.assert_array_equal(a_roi, b_roi)
    np.testing.assert_array_equal(a_non, b_non)


def test_encode_many_matches_single(lenna128):
    """Stacked batch encoding must be bit-identical to per-image encoding."""
    from roibasedimagecompression_tpu.parallel import stream

    imgs = [lenna128[:96, :96], lenna128[32:, 32:][:96, :96]]
    batch = stream.encode_many(imgs, rtc.CodecConfig(single_region=True))
    singles = [rtc.encode(im, rtc.CodecConfig(single_region=True)) for im in imgs]
    assert batch == singles


def test_encode_many_device_refit_matches_single(lenna128):
    """Default config (palette_refit on): the batched path's DEVICE refit
    (ops/pairs._refit_sums int32 accumulation) must be bit-identical to the
    per-image host refit (refine.refit_pixels f64 bincount)."""
    from roibasedimagecompression_tpu.parallel import stream

    cfg_ = rtc.CodecConfig()
    assert cfg_.palette_refit  # the law this test pins
    imgs = [lenna128, lenna128[::-1].copy()]
    batch = stream.encode_many(imgs, cfg_)
    singles = [rtc.encode(im, cfg_) for im in imgs]
    assert batch == singles


def test_encode_accepts_gray_and_rgba(lenna128):
    gray = lenna128[..., 0]
    d1 = rtc.encode(gray, rtc.CodecConfig(single_region=True))
    assert rtc.decode(d1).shape == (*gray.shape, 3)
    rgba = np.concatenate([lenna128, np.full((*lenna128.shape[:2], 1), 255, np.uint8)], -1)
    d2 = rtc.encode(rgba, rtc.CodecConfig(single_region=True))
    d3 = rtc.encode(lenna128, rtc.CodecConfig(single_region=True))
    assert d2 == d3


def test_quality_regression_pin(lenna128):
    """Round-1 quality pin: catch regressions in future optimization rounds.

    Full-mode encode of 128x128 Lenna must stay in the measured R-D corridor."""
    data = rtc.encode(lenna128)
    q = M.quality_metrics(lenna128, rtc.decode(data))
    bpp = len(data) * 8 / (128 * 128)
    assert q["psnr"] > 29.0, (q["psnr"], bpp)
    assert bpp < 7.5, (q["psnr"], bpp)


def test_reference_law_parity_mode():
    """Reference-parity contract (VERDICT round-2 item 7): with
    weighted_palette=False, the literal reference split (recursive k-means,
    margin 1.0 — clustering.py:720-775) and the byte-compat zlib-9 entropy
    stage, the encoder follows the reference laws exactly; its R-D point on
    a fixed input must stay inside the measured corridor.

    The parity knobs are pinned EXPLICITLY so this contract does not float
    when tuning defaults (split_method/split_margin) move.

    Pinned 2026-08-16 on 256x256 Lenna: batched 35.53 dB @ 4.443 bpp,
    loop path 35.33 dB @ 4.387 bpp.  (Full-image corridor vs the shipped
    artifact: ours 33.16 dB @ 3.586 bpp vs reference 33.26 dB @ 3.75 bpp —
    within 0.1 dB at 0.16 bpp lower rate.)
    """
    img = image_io.imread_rgb("/root/reference/images/png/Lenna.png")[:256, :256]
    parity = dict(
        weighted_palette=False, container_level=0,
        split_method="kmeans", split_margin=1.0,
        palette_refine_iters=0, palette_refit=False,
    )

    data = rtc.encode(img, rtc.CodecConfig(**parity))
    q = M.quality_metrics(img, rtc.decode(data))
    bpp = len(data) * 8 / (256 * 256)
    assert abs(q["psnr"] - 35.53) < 0.5, q["psnr"]
    assert abs(bpp - 4.443) < 0.3, bpp

    data = rtc.encode(img, rtc.CodecConfig(batched=False, **parity))
    q = M.quality_metrics(img, rtc.decode(data))
    bpp = len(data) * 8 / (256 * 256)
    assert abs(q["psnr"] - 35.33) < 0.5, q["psnr"]
    assert abs(bpp - 4.387) < 0.3, bpp


def test_encode_stream_matches_sequential(lenna128):
    """Threaded encode_stream must produce the same bytes as sequential
    encode_many calls (host/device overlap is a scheduling change only)."""
    from roibasedimagecompression_tpu.parallel import stream

    a = lenna128[:96, :96]
    b = lenna128[32:, 32:][:96, :96]
    batches = [[a, b], [b, a]]
    cfg_ = rtc.CodecConfig()
    got = stream.encode_stream(batches, cfg_, workers=2)
    want = [stream.encode_many(batch, cfg_) for batch in batches]
    assert got == want


def test_low_latency_single_matches_batched(lenna128):
    """fast_edges configs must give single==batched byte identity too — the
    single-image frontend silently ignored the flag before round 5."""
    from roibasedimagecompression_tpu.parallel import stream

    ll = rtc.CodecConfig.low_latency()
    im = lenna128[:96, :96]
    assert stream.encode_many([im], ll) == [rtc.encode(im, ll)]
