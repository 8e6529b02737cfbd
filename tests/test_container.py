"""Container round-trip + golden decode tests against the shipped artifacts."""

import pathlib
import pickle
import struct
import zlib

import numpy as np
import pytest

from roibasedimagecompression_tpu.io import container, image_io


def test_pack_unpack_roundtrip(rng):
    palette = rng.integers(0, 256, size=(300, 3), dtype=np.uint8)
    indices = rng.integers(0, 300, size=(64, 48)).astype(np.uint16)
    data = container.pack(palette, indices)
    out = container.unpack(data)
    assert out.shape == (64, 48)
    assert out.n_colors == 300
    np.testing.assert_array_equal(out.palette, palette)
    np.testing.assert_array_equal(out.indices, indices)
    np.testing.assert_array_equal(out.to_rgb(), palette[indices])


def test_pack_minimal_dtype(rng):
    palette = rng.integers(0, 256, size=(10, 3), dtype=np.uint8)
    indices = rng.integers(0, 10, size=(8, 8)).astype(np.uint32)
    out = container.unpack(container.pack(palette, indices))
    assert out.indices.dtype == np.uint8


def test_pack_flat_indices_requires_shape(rng):
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    flat = rng.integers(0, 4, size=64)
    with pytest.raises(ValueError):
        container.pack(palette, flat)
    out = container.unpack(container.pack(palette, flat, shape=(8, 8)))
    assert out.shape == (8, 8)


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        container.unpack(b"NOPEX" + b"\x00" * 16)


def test_hostile_pickle_rejected():
    """A container whose pickle references a global must be refused."""
    evil = pickle.dumps({"s": (1, 1), "l": 1, "p": b"", "i": b"", "d": np.uint8})
    blob = zlib.compress(evil, 9)
    data = container.MAGIC + struct.pack("<I", len(blob)) + blob
    with pytest.raises(Exception):
        container.unpack(data)


def test_reference_writer_byte_compat(rng):
    """Our pack() must produce the identical bytes the reference writer would."""
    palette = rng.integers(0, 256, size=(150, 3), dtype=np.uint8)
    indices = rng.integers(0, 150, size=(32, 32))
    ours = container.pack(palette, indices)

    # Independent reimplementation of the reference writer
    # (compression.py:151-202 + save_compressed :119-142).
    d = {
        "s": (32, 32),
        "l": 150,
        "p": zlib.compress(palette.tobytes(), 9),
        "i": zlib.compress(indices.astype(np.uint8).tobytes(), 9),
        "d": "uint8",
    }
    blob = zlib.compress(pickle.dumps(d, protocol=5), 9)
    theirs = b"RHCCQ" + struct.pack("<I", len(blob)) + blob
    assert ours == theirs


@pytest.mark.parametrize("idx", list(range(1, 25)) + ["Lenna_compressed"])
def test_golden_decode_kodak(reference_images, idx):
    """Every shipped rhccq_20_10 artifact decodes to a valid palette image of
    the right shape, with every index inside the palette."""
    name = f"compressed_{idx}.rhccq" if isinstance(idx, int) else f"{idx}.rhccq"
    path = reference_images / "rhccq_20_10" / name
    png = (
        reference_images / "png" / (f"{idx}.png" if isinstance(idx, int) else "Lenna.png")
    )
    payload = container.load(path)
    original = image_io.imread_rgb(png)
    assert payload.shape == original.shape[:2]
    assert payload.indices.max() < payload.n_colors
    rgb = payload.to_rgb()
    assert rgb.shape == original.shape
    assert rgb.dtype == np.uint8


def test_golden_decode_legacy_set(reference_images):
    """The high-quality artifact set (larger palettes, possibly legacy keys)
    must also parse."""
    root = reference_images / "rhccq"
    files = sorted(root.glob("*.rhccq"))
    assert files
    for path in files:
        payload = container.load(path)
        assert payload.indices.max() < payload.n_colors
        h, w = payload.shape
        assert payload.indices.shape == (h, w)


def test_golden_lenna_stats(reference_images):
    """Measured golden numbers from BASELINE.md: Lenna has 147 colors and
    decodes to 512x512."""
    payload = container.load(reference_images / "rhccq_20_10" / "Lenna_compressed.rhccq")
    assert payload.n_colors == 147
    assert payload.shape == (512, 512)


def test_fast_entropy_levels_roundtrip(rng):
    """libdeflate entropy levels emit standard zlib streams: the payload must
    decode with plain zlib (reference-decoder compatibility) and round-trip."""
    palette = rng.integers(0, 256, size=(150, 3), dtype=np.uint8)
    indices = rng.integers(0, 150, size=(64, 96)).astype(np.uint16)
    for level in (0, 1, 7, 10, 12):
        data = container.pack(palette, indices, level=level)
        # Pure-zlib parse (the reference decoder's exact steps,
        # uncompression.py:129-150): proves format compatibility.
        (size,) = struct.unpack("<I", data[5:9])
        payload = pickle.loads(zlib.decompress(data[9 : 9 + size]))
        assert zlib.decompress(payload["p"]) == palette.tobytes()
        got = np.frombuffer(zlib.decompress(payload["i"]), dtype=np.uint8)
        assert np.array_equal(got.reshape(64, 96), indices.astype(np.uint8))
        # Our own reader too.
        out = container.unpack(data)
        assert np.array_equal(out.to_rgb(), palette[indices])


def test_fast_entropy_level10_not_larger_than_legacy(rng):
    """The default codec level (10) must not lose rate vs byte-compat zlib-9
    on realistic index data (smooth-ish palette indices)."""
    palette = rng.integers(0, 256, size=(140, 3), dtype=np.uint8)
    base = rng.integers(0, 140, size=(96, 128))
    smooth = np.repeat(np.repeat(base[::4, ::4], 4, 0), 4, 1)  # runs, like real maps
    legacy = container.pack(palette, smooth.astype(np.uint16), level=0)
    fast = container.pack(palette, smooth.astype(np.uint16), level=10)
    assert len(fast) <= len(legacy) * 1.02


def test_zlib_decompress_fast_unknown_size():
    from roibasedimagecompression_tpu import native

    blob = bytes(range(256)) * 4096
    comp = zlib.compress(blob, 6)
    assert native.zlib_decompress_fast(comp) == blob
    with pytest.raises(ValueError):
        native.zlib_decompress_fast(comp, len(blob) + 5)
