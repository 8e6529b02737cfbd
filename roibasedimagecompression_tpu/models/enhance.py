"""Shadow enhancement pre-processing (CLAHE on dark LAB regions).

Rebuilds encoder/enhancer/clahe.py: pixels whose 8-bit-scaled L channel is
below `shadow_threshold` form the shadow mask; CLAHE runs over exactly those
pixels gathered into a 1-D sequence (the reference reshapes them to an n x 1
column, which with a 16x16 tile grid is 1-D CLAHE — clahe.py:69-75), then the
enhanced L values scatter back and the image returns to RGB.

The reference imports this before encoding but does not feed the enhanced
image into the codec (rhccq.ipynb cell 4); here it is an optional pre-stage:
`encode(enhance_shadows(img), cfg)`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roibasedimagecompression_tpu.ops import clahe as CL
from roibasedimagecompression_tpu.ops import colors as COL


def clahe_custom_shadows(
    image_rgb: np.ndarray,
    shadow_mask: np.ndarray,
    clip_limit: float = 4.0,
    tile_size: int = 4,
) -> np.ndarray:
    """Apply CLAHE only to the masked pixels (clahe_custom_shadows,
    enhancer/clahe.py:28-100)."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    mask = np.asarray(shadow_mask, bool)
    if mask.any():
        shadow_l = lab[..., 0][mask]
        enhanced = np.asarray(
            CL.clahe_1d(jnp.asarray(shadow_l), clip_limit=clip_limit, n_tiles=tile_size)
        )
        lab = lab.copy()
        l_channel = lab[..., 0].copy()
        l_channel[mask] = enhanced
        lab[..., 0] = l_channel
    return np.asarray(COL.lab_cv2_to_rgb(jnp.asarray(lab)))


def enhance_shadows(
    image_rgb: np.ndarray,
    shadow_threshold: int = 100,
    clip_limit: float = 3.0,
    tile_size: int = 16,
) -> np.ndarray:
    """get_enhanced_image (enhancer/clahe.py:8-26): shadow mask = scaled-L <
    threshold, CLAHE over shadow pixels only."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    shadow_mask = lab[..., 0] < shadow_threshold
    return clahe_custom_shadows(
        image_rgb, shadow_mask, clip_limit=clip_limit, tile_size=tile_size
    )


def clahe_full_image(image_rgb: np.ndarray, clip_limit: float = 3.0, grid: int = 8) -> np.ndarray:
    """Whole-image L-channel CLAHE (the enhancer's non-masked variant,
    enhancer/clahe.py:115-184)."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    lab = lab.copy()
    lab[..., 0] = np.asarray(
        CL.clahe_2d(jnp.asarray(lab[..., 0]), clip_limit=clip_limit, grid=grid)
    )
    return np.asarray(COL.lab_cv2_to_rgb(jnp.asarray(lab)))
