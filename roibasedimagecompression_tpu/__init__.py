"""roibasedimagecompression_tpu — a TPU-native rebuild of the RHCCQ image codec.

Region-based Hierarchical Clustering Color Quantization (after
Riccardoalfieri2003/ROIBasedImageCompression), re-designed for TPU hardware:
JAX/XLA for the pipeline, Pallas kernels for the hot clustering ops, host-side
zlib for the .rhccq bitstream.

Public API:
    encode(image, config)  -> .rhccq bytes
    decode(path_or_bytes)  -> (h, w, 3) uint8 RGB
    CodecConfig            -> quality preset + pipeline knobs
"""

from roibasedimagecompression_tpu.config import (
    CodecConfig,
    RoiConfig,
    clustering_params,
    tier2_quality,
    tier3_quality,
)
from roibasedimagecompression_tpu.io.container import (
    Rhccq,
    decode_file,
    load,
    pack,
    save,
    unpack,
)

__version__ = "0.1.0"


def decode(source):
    """Decode a .rhccq file path or bytes to an (h, w, 3) uint8 RGB image."""
    if isinstance(source, (bytes, bytearray)):
        return unpack(bytes(source)).to_rgb()
    return decode_file(source)


def encode(image, config: CodecConfig | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image to .rhccq bytes."""
    from roibasedimagecompression_tpu.models.codec import encode as _encode

    return _encode(image, config or CodecConfig())


__all__ = [
    "CodecConfig",
    "RoiConfig",
    "Rhccq",
    "clustering_params",
    "tier2_quality",
    "tier3_quality",
    "encode",
    "decode",
    "decode_file",
    "load",
    "pack",
    "save",
    "unpack",
]
