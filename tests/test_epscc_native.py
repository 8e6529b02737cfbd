"""Native grid eps-CC (native.epscc_labels_runs) vs the device kernel.

The native union-find must reproduce ops/cluster.eps_components labels
EXACTLY (run-local minimum member index per eps-component) so that the two
backends assign bit-identical cluster keys in models/quantize_batched.
Reference law: DBSCAN(eps, min_samples=1) over palette colors
(encoder/compression/clustering.py:233-235).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from roibasedimagecompression_tpu import native
from roibasedimagecompression_tpu.ops import cluster as CL

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime unavailable"
)


def _unpack(packed):
    return np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=1
    ).astype(np.float32)


def _device_labels(packed, eps):
    n = len(packed)
    colors = _unpack(packed)
    return np.asarray(
        CL.eps_components(
            jnp.asarray(colors), jnp.float32(eps), jnp.ones(n, bool), None,
            chunk=256,
        )
    )


@pytest.mark.parametrize("quality", [5.0, 20.0, 50.0, 90.0, 99.0])
def test_epscc_native_matches_device(rng, quality):
    eps = 128.0 - 1.28 * quality
    k = int(rng.integers(1, 12))
    centers = rng.integers(0, 256, (k, 3))
    pts = (
        centers[rng.integers(0, k, 700)]
        + rng.normal(0, 25, (700, 3))
    ).clip(0, 255).astype(np.int64)
    packed = np.unique((pts[:, 0] << 16) | (pts[:, 1] << 8) | pts[:, 2])
    ref = _device_labels(packed, eps)
    got = native.epscc_labels_runs(
        packed.astype(np.int32),
        np.array([0]), np.array([len(packed)]), np.array([eps]),
    )
    np.testing.assert_array_equal(ref, got)


def test_epscc_native_multirun_concat(rng):
    starts, sizes, epss, parts = [], [], [], []
    off = 0
    for _ in range(12):
        n = int(rng.integers(1, 300))
        p = np.unique(rng.integers(0, 1 << 24, n).astype(np.int32))
        starts.append(off)
        sizes.append(len(p))
        epss.append(float(rng.uniform(1.3, 120.0)))
        parts.append(p)
        off += len(p)
    table = np.concatenate(parts)
    labels = native.epscc_labels_runs(
        table, np.asarray(starts), np.asarray(sizes), np.asarray(epss)
    )
    o = 0
    for s, n, e in zip(starts, sizes, epss):
        ref = _device_labels(table[s : s + n].astype(np.int64), e)
        np.testing.assert_array_equal(ref, labels[o : o + n])
        o += n


def test_device_pair_table_matches_native_pack(rng):
    """ops.pairs.DevicePairTable must reproduce native.pack_pairs exactly."""
    from roibasedimagecompression_tpu.ops import pairs as PAIRS

    h, w = 48, 64
    img = np.asarray(rng.integers(0, 256, (h, w, 3)), np.uint8)
    seg = np.asarray(rng.integers(0, 5, (h, w)), np.int32)
    out = native.pack_pairs(img, seg)
    assert out is not None
    uniq, inverse, counts = out
    dpt = PAIRS.DevicePairTable(seg, tall_img=img)
    np.testing.assert_array_equal(uniq, dpt.uniq)
    np.testing.assert_array_equal(counts, dpt.counts)
    # paint: identity index table reproduces the pair ids per pixel
    idx = np.arange(len(uniq), dtype=np.int64)
    flat = dpt.paint(idx)
    mask = seg.reshape(-1) > 0
    np.testing.assert_array_equal(flat[mask], inverse)
    assert (flat[~mask] == 0).all()


def test_device_pair_table_post_repair_colors(rng):
    """The device-resident colors table (ops/pairs._post_repair_colors) must
    equal the host post-repair table bit-for-bit: same kept-row predicate and
    order-preserving compaction as native.black_repair_pairs."""
    from roibasedimagecompression_tpu.ops import pairs as PAIRS

    h, w = 48, 64
    img = np.asarray(rng.integers(0, 4, (h, w, 3)), np.uint8)  # many blacks
    img[0] = 0  # guaranteed black pixels in segment 1
    seg = np.asarray(rng.integers(0, 5, (h, w)), np.int32)
    seg[0] = 1
    seg[1] = 6  # a black-only segment candidate
    img[1] = 0
    dpt = PAIRS.DevicePairTable(seg, tall_img=img)
    assert dpt.colors_dev is not None
    uniq = dpt.uniq.copy()
    counts = dpt.counts.copy()
    m, _ = native.black_repair_pairs(uniq, counts, None, return_remap=True)
    host_colors = _unpack(uniq[:m] & 0xFFFFFF).astype(np.uint8)
    dev_colors = np.asarray(dpt.colors_dev)
    np.testing.assert_array_equal(dev_colors[:m], host_colors)
    assert (dev_colors[m:] == 0).all()


def test_device_pair_table_cap_boundary():
    """n_pairs == compaction cap: the closing count must stay exact.

    4096 distinct (segment, color) pairs hit the minimum pow2 cap exactly;
    the starts-scatter drop target regression corrupted the LAST pair's
    pixel count in precisely this case.
    """
    from roibasedimagecompression_tpu.ops import pairs as PAIRS

    vals = np.arange(4096, dtype=np.int64) + 1  # distinct non-black colors
    img = np.stack(
        [(vals >> 16) & 0xFF, (vals >> 8) & 0xFF, vals & 0xFF], axis=1
    ).astype(np.uint8).reshape(64, 64, 3)
    seg = np.ones((64, 64), np.int32)
    out = native.pack_pairs(img, seg)
    assert out is not None
    uniq, _, counts = out
    assert len(uniq) == 4096
    dpt = PAIRS.DevicePairTable(seg, tall_img=img)
    np.testing.assert_array_equal(uniq, dpt.uniq)
    np.testing.assert_array_equal(counts, dpt.counts)


def test_device_pair_table_wide_counts():
    """Packed 8 B/row download: a pair count above 2^16 must round-trip
    through the count_hi8 bits exactly (a 300x300 single-color segment)."""
    from roibasedimagecompression_tpu.ops import pairs as PAIRS

    img = np.full((300, 300, 3), 77, np.uint8)
    img[0, 0] = (1, 2, 3)  # a second pair so compaction is non-trivial
    seg = np.ones((300, 300), np.int32)
    out = native.pack_pairs(img, seg)
    assert out is not None
    uniq, _, counts = out
    assert counts.max() > (1 << 16)
    dpt = PAIRS.DevicePairTable(seg, tall_img=img)
    np.testing.assert_array_equal(uniq, dpt.uniq)
    np.testing.assert_array_equal(counts, dpt.counts)


def test_stream_device_pairs_bitstream_identical(rng, monkeypatch):
    """encode_many bytes must not depend on the pair-table backend."""
    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.parallel import stream

    imgs = []
    for k in range(2):
        im = np.zeros((48, 48, 3), np.uint8)
        im[..., 0] = np.asarray(rng.integers(0, 256, (48, 48)), np.uint8)
        im[..., 1] = (np.arange(48)[:, None] * 5 + k) % 256
        im[..., 2] = 128
        imgs.append(im)
    cfg = CodecConfig()
    monkeypatch.setenv("RHCCQ_DEVICE_PAIRS", "0")
    a = stream.encode_many(imgs, cfg)
    monkeypatch.setenv("RHCCQ_DEVICE_PAIRS", "1")
    b = stream.encode_many(imgs, cfg)
    assert a == b


def test_stream_device_pairs_u16_paint(rng, monkeypatch):
    """>256-color palettes take the u16 paint variant; bytes must still
    match the host path."""
    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.io import container
    from roibasedimagecompression_tpu.parallel import stream

    # High quality keeps most colors -> final palette well above 256.
    im = np.asarray(rng.integers(0, 256, (64, 64, 3)), np.uint8)
    # q=95 -> tier-2 law min(2q,100)=100, tier-3 min(q2r+q2n,100)=100.
    cfg = CodecConfig(roi_quality=95, nonroi_quality=95)
    monkeypatch.setenv("RHCCQ_DEVICE_PAIRS", "0")
    a = stream.encode_many([im], cfg)
    monkeypatch.setenv("RHCCQ_DEVICE_PAIRS", "1")
    b = stream.encode_many([im], cfg)
    assert a == b
    assert container.unpack(b[0]).n_colors > 256


def test_epscc_backend_bitstream_identical(rng, monkeypatch):
    """encode() bytes must not depend on the eps-CC backend."""
    from roibasedimagecompression_tpu import CodecConfig
    from roibasedimagecompression_tpu.models import codec

    im = np.zeros((64, 64, 3), np.uint8)
    yy, xx = np.mgrid[:64, :64]
    im[..., 0] = (xx * 4) % 256
    im[..., 1] = np.asarray(rng.integers(0, 256, (64, 64)), np.uint8)
    im[..., 2] = (yy * 4) % 256
    cfg = CodecConfig()
    monkeypatch.setenv("RHCCQ_EPSCC", "device")
    a = codec.encode(im, cfg)
    monkeypatch.setenv("RHCCQ_EPSCC", "native")
    b = codec.encode(im, cfg)
    assert a == b
