"""The .rhccq container: palette + index-matrix with zlib entropy coding.

Format (read/write compatible with the reference bitstream so the 35 shipped
golden artifacts decode bit-exactly):

    file := b"RHCCQ" | <u32 little-endian payload length> | zlib(pickle(dict))
    dict := {'s': (h, w), 'l': n_colors, 'p': zlib(palette u8 bytes),
             'i': zlib(indices minimal-dtype bytes), 'd': dtype name}

Reference: encoder/compression/compression.py:119-202 (writer),
decoder/uncompression/uncompression.py:58-150 (reader).  An older legacy layout
uses key 'ps' instead of 'l' and omits 'd' (defaults to uint16,
compression.py:85-116 / uncompression.py:75).

The embedded pickle only ever contains builtin types (tuple/int/str/bytes), so
reading uses a restricted unpickler that refuses to resolve any global — no
arbitrary-code execution is possible from a hostile file.

This module is pure host code by design: the bitstream is zlib/DEFLATE which
stays on the CPU; the device side produces the (palette, indices) tensors.
"""

from __future__ import annotations

import dataclasses
import io as _io
import pickle
import struct
import zlib

import numpy as np

MAGIC = b"RHCCQ"

_DTYPES = {"uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32}


# The reference writer pickles dicts that may contain numpy scalars/arrays
# (e.g. shape entries that are np.intp).  These constructors only build data —
# they cannot execute code — so they are the entire allowlist.
_SAFE_GLOBALS = {
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy", "dtype"),
    ("numpy", "ndarray"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler that only resolves a tiny numpy data-constructor allowlist."""

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS:
            import importlib

            return getattr(importlib.import_module(module), name)
        raise pickle.UnpicklingError(
            f"rhccq container may not reference globals ({module}.{name})"
        )


def _restricted_loads(data: bytes):
    return _RestrictedUnpickler(_io.BytesIO(data)).load()


def min_index_dtype(max_index: int) -> np.dtype:
    """Smallest unsigned dtype for palette indices (compression.py:179-190)."""
    if max_index < 256:
        return np.dtype(np.uint8)
    if max_index < 65536:
        return np.dtype(np.uint16)
    return np.dtype(np.uint32)


@dataclasses.dataclass
class Rhccq:
    """Decoded container payload: a palette image in indexed form."""

    palette: np.ndarray  # (n, 3) uint8
    indices: np.ndarray  # (h, w) unsigned int
    shape: tuple  # (h, w)

    @property
    def n_colors(self) -> int:
        return int(self.palette.shape[0])

    def to_rgb(self) -> np.ndarray:
        """Palette gather -> (h, w, 3) uint8 (uncompression.py:202-209)."""
        return self.palette[self.indices]


def _compress(data: bytes, level: int) -> bytes:
    """Entropy stage: level 0 = zlib.compress(.., 9) (byte-compatible with
    the reference writer); 1-12 = libdeflate at that level (same zlib stream
    format — any inflater, including the reference decoder, reads it)."""
    if level == 0:
        return zlib.compress(data, 9)
    from roibasedimagecompression_tpu import native

    return native.zlib_compress_fast(data, level)


def pack(
    palette: np.ndarray,
    indices: np.ndarray,
    shape=None,
    *,
    use_rle: bool = False,
    level: int = 0,
) -> bytes:
    """Serialize palette + indices to .rhccq bytes (reference-compatible).

    With level=0 (default) this matches lossless_compress_optimized +
    save_compressed byte-for-byte given the same inputs: zlib level 9 for
    both streams and for the pickled dict, pickle protocol 5, minimal index
    dtype chosen from the max index.  level 1-12 swaps the entropy stage for
    libdeflate at that level — the output is still a standard zlib stream
    (format-identical, byte-different), decodable by the reference decoder
    (uncompression.py:58-127).  The outer pickled-dict blob is mostly the two
    already-compressed streams, so fast mode compresses it at level 1.
    """
    palette = np.ascontiguousarray(np.asarray(palette, dtype=np.uint8).reshape(-1, 3))
    indices = np.asarray(indices)
    if shape is None:
        if indices.ndim != 2:
            raise ValueError("shape required when indices are flat")
        shape = indices.shape
    h, w = int(shape[0]), int(shape[1])
    flat = indices.reshape(-1)
    max_index = int(flat.max()) if flat.size else 0
    if max_index >= palette.shape[0]:
        raise ValueError(f"index {max_index} out of range for palette of {palette.shape[0]}")
    dtype = min_index_dtype(max_index)
    if use_rle and max_index >= 65536:
        raise ValueError(
            f"RLE mode stores u16 indices; palette has {max_index + 1} colors"
        )
    if use_rle:
        # RLE(value, run u16 pairs) + zlib — the reference's alternative
        # entropy mode (compression.py:25-66).  Marked with 'm' so unpack can
        # dispatch; reference files never carry this key.
        from roibasedimagecompression_tpu import native

        pairs = native.rle_encode(flat.astype(np.uint16))
        payload = {
            "s": (h, w),
            "l": int(palette.shape[0]),
            "p": _compress(palette.tobytes(), level),
            "i": _compress(np.ascontiguousarray(pairs).tobytes(), level),
            "d": "uint16",
            "m": "rle",
        }
    else:
        payload = {
            "s": (h, w),
            "l": int(palette.shape[0]),
            "p": _compress(palette.tobytes(), level),
            "i": _compress(np.ascontiguousarray(flat.astype(dtype)).tobytes(), level),
            "d": dtype.name,
        }
    blob = _compress(pickle.dumps(payload, protocol=5), 0 if level == 0 else 1)
    return MAGIC + struct.pack("<I", len(blob)) + blob


def unpack(data: bytes) -> Rhccq:
    """Parse .rhccq bytes (both the 'l'/'d' and legacy 'ps' layouts)."""
    from roibasedimagecompression_tpu import native

    if data[:5] != MAGIC:
        raise ValueError("Invalid file format")
    (size,) = struct.unpack("<I", data[5:9])
    payload = _restricted_loads(native.zlib_decompress_fast(data[9 : 9 + size]))
    if not isinstance(payload, dict):
        raise ValueError("corrupt container payload")
    h, w = payload["s"]
    if "l" not in payload and "ps" not in payload:
        raise ValueError("corrupt container payload (no palette length)")
    n_colors = int(payload.get("l", payload.get("ps")))
    palette = np.frombuffer(
        native.zlib_decompress_fast(payload["p"], n_colors * 3), dtype=np.uint8
    )
    palette = palette.reshape(n_colors, 3).copy()
    raw = native.zlib_decompress_fast(payload["i"])
    if payload.get("m") == "rle":
        from roibasedimagecompression_tpu import native

        pairs = np.frombuffer(raw, dtype=np.uint16).reshape(-1, 2)
        indices = native.rle_decode(pairs, h * w).reshape(h, w)
        return Rhccq(palette=palette, indices=indices, shape=(int(h), int(w)))
    dtype_name = payload.get("d")
    if dtype_name in _DTYPES:
        dtype = _DTYPES[dtype_name]
    else:
        # Legacy layout default, with size-based inference fallback
        # (uncompression.py:75, :116-124).
        total = h * w
        bpp = len(raw) / total if total else 2
        dtype = np.uint8 if bpp <= 1 else (np.uint16 if bpp <= 2 else np.uint32)
    indices = np.frombuffer(raw, dtype=dtype).reshape(h, w).copy()
    return Rhccq(palette=palette, indices=indices, shape=(int(h), int(w)))


def save(palette: np.ndarray, indices: np.ndarray, path, shape=None, *, use_rle: bool = False) -> int:
    """Write an .rhccq file; returns total file size in bytes."""
    data = pack(palette, indices, shape, use_rle=use_rle)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load(path) -> Rhccq:
    with open(path, "rb") as f:
        return unpack(f.read())


def describe(data: bytes) -> str:
    """Human-readable type/size report for a container.

    The library equivalent of print_compressed_data_types /
    optimize_compressed_dtype's report (encoder/compression/
    compression.py:233-413).
    """
    payload = unpack(data)
    h, w = payload.shape
    n = payload.n_colors
    dtype = payload.indices.dtype
    optimal = min_index_dtype(int(payload.indices.max()) if payload.indices.size else 0)
    raw = h * w * 3
    lines = [
        f"shape: {w}x{h} ({h * w:,} pixels)",
        f"palette: {n} colors ({n * 3:,} bytes raw)",
        f"indices: dtype {dtype.name} ({payload.indices.nbytes:,} bytes raw); "
        f"optimal dtype {optimal.name}"
        + ("" if dtype == optimal else "  <- downgradable"),
        f"file: {len(data):,} bytes = {len(data) * 8 / (h * w):.3f} bpp, "
        f"{raw / len(data):.2f}:1 vs raw RGB",
    ]
    return "\n".join(lines)


def decode_file(path) -> np.ndarray:
    """Load + reconstruct: .rhccq path -> (h, w, 3) uint8 RGB."""
    return load(path).to_rgb()
