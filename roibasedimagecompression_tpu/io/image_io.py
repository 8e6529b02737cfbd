"""Host-side image file IO (PNG/JPEG) for the eval harness and drivers.

The reference loads with cv2.imread + BGR->RGB (encoder/compression/test.py:79-81);
PIL yields identical RGB values for PNG/JPEG so we use it here.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def imread_rgb(path) -> np.ndarray:
    """Read an image file as (h, w, 3) uint8 RGB."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def imwrite(path, image: np.ndarray, **kwargs) -> None:
    Image.fromarray(np.asarray(image, dtype=np.uint8)).save(path, **kwargs)


def jpeg_bytes(image: np.ndarray, quality: int = 85) -> bytes:
    """Encode RGB image to JPEG bytes at the given quality.

    Stand-in for the cv2 IMWRITE_JPEG_QUALITY baseline generator
    (other/jpg_compressor.py:5-44).
    """
    import io

    buf = io.BytesIO()
    Image.fromarray(np.asarray(image, dtype=np.uint8)).save(
        buf, format="JPEG", quality=int(quality)
    )
    return buf.getvalue()


def decode_jpeg(data: bytes) -> np.ndarray:
    import io

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)
