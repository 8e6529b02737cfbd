"""Color space conversions as jittable JAX ops.

Two grayscale variants exist because the reference mixes libraries with
different weights: OpenCV's BT.601 (used for Canny input, edges.py:41) and
skimage's BT.709-ish rgb2gray (used in the split score, split_score.py:29).
rgb2lab reproduces skimage.color.rgb2lab (sRGB -> linear -> XYZ D65 -> CIELAB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_gray_cv2(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(..., COLOR_RGB2GRAY): 0.299 R + 0.587 G + 0.114 B, rounded
    back to uint8 (cv2 output dtype matches input)."""
    x = rgb.astype(jnp.float32)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def rgb_to_gray_skimage(rgb: jnp.ndarray) -> jnp.ndarray:
    """skimage.color.rgb2gray on a uint8 image: float in [0, 1],
    weights 0.2125 / 0.7154 / 0.0721."""
    x = rgb.astype(jnp.float32) / 255.0
    return 0.2125 * x[..., 0] + 0.7154 * x[..., 1] + 0.0721 * x[..., 2]


_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    jnp.float32,
)

# D65 reference white (skimage 2-degree observer).
_XYZ_REF = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """skimage.color.rgb2lab for uint8 RGB input -> float32 (..., 3) Lab.

    L in [0, 100]; a, b roughly in [-128, 127].
    """
    s = rgb.astype(jnp.float32) / 255.0
    linear = jnp.where(s > 0.04045, ((s + 0.055) / 1.055) ** 2.4, s / 12.92)
    # HIGHEST: the TPU default matmul precision multiplies in bf16; Lab feeds
    # SLIC features and the split score, so demoted products would flip
    # segment labels vs the exact f32 CPU path (cross-backend byte identity).
    xyz = jnp.matmul(linear, _RGB2XYZ.T, precision=jax.lax.Precision.HIGHEST)
    t = xyz / _XYZ_REF
    eps = 0.008856  # (6/29)^3
    kappa_term = 7.787 * t + 16.0 / 116.0
    f = jnp.where(t > eps, jnp.cbrt(t), kappa_term)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_lab_cv2(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(..., COLOR_RGB2LAB) for uint8: 8-bit scaled CIELAB.

    L mapped to 0..255 (L * 255/100), a/b offset by +128.  The CLAHE shadow
    enhancer thresholds this scaled L (enhancer/clahe.py:21-22).
    """
    lab = rgb_to_lab(rgb)
    L = lab[..., 0] * (255.0 / 100.0)
    a = lab[..., 1] + 128.0
    b = lab[..., 2] + 128.0
    return jnp.clip(jnp.round(jnp.stack([L, a, b], axis=-1)), 0, 255).astype(jnp.uint8)


def lab_cv2_to_rgb(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_to_lab_cv2."""
    L = lab_u8[..., 0].astype(jnp.float32) * (100.0 / 255.0)
    a = lab_u8[..., 1].astype(jnp.float32) - 128.0
    b = lab_u8[..., 2].astype(jnp.float32) - 128.0
    return lab_to_rgb(jnp.stack([L, a, b], axis=-1))


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_to_lab -> uint8 RGB (used by the CLAHE enhancer)."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    eps = 6.0 / 29.0

    def inv_f(f):
        return jnp.where(f > eps, f**3, (f - 16.0 / 116.0) / 7.787)

    xyz = jnp.stack([inv_f(fx), inv_f(fy), inv_f(fz)], axis=-1) * _XYZ_REF
    linear = jnp.matmul(
        xyz, jnp.linalg.inv(_RGB2XYZ).T, precision=jax.lax.Precision.HIGHEST
    )
    s = jnp.where(
        linear > 0.0031308, 1.055 * jnp.maximum(linear, 1e-12) ** (1 / 2.4) - 0.055,
        12.92 * linear,
    )
    return jnp.clip(jnp.round(s * 255.0), 0, 255).astype(jnp.uint8)
