"""2-D convolution primitives: Sobel variants, box density, Gaussian, custom
kernels.  All are thin wrappers over lax.conv_general_dilated so XLA fuses the
surrounding elementwise work; they replace the cv2.filter2D / cv2.Sobel /
skimage.filters.sobel call sites of the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray, *, reflect: bool = True) -> jnp.ndarray:
    """Single-channel 2-D CORRELATION, SAME size output.

    Correlation (no kernel flip) matches cv2.filter2D / cv2.Sobel semantics —
    the reference's directional gap kernels are asymmetric, so the distinction
    matters.  cv2 defaults to BORDER_REFLECT_101 ('reflect' padding);
    reflect=False uses zero padding.
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = x.astype(jnp.float32)
    if reflect:
        x = jnp.pad(x, ((ph, kh - 1 - ph), (pw, kw - 1 - pw)), mode="reflect")
        padding = "VALID"
    else:
        padding = [(ph, kh - 1 - ph), (pw, kw - 1 - pw)]
    out = jax.lax.conv_general_dilated(
        x[None, None],
        kernel.astype(jnp.float32)[None, None],
        window_strides=(1, 1),
        padding=padding,
        # HIGHEST: box/Gaussian weights (e.g. 1/k^2) are inexact under the
        # TPU default bf16 multiply; density thresholds and score windows
        # must match the exact f32 CPU path bit-for-bit.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


# cv2.Sobel ksize=3 kernels (un-normalized).
_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T


def _sep3(img: jnp.ndarray, vker, hker) -> jnp.ndarray:
    """Separable 3-tap correlation with reflect-101 borders as shifted adds.

    The 3x3 Sobel family factors exactly into a vertical and a horizontal
    3-tap pass.  Written as pad + three shifted slices per axis it lowers to
    pure elementwise HLO that XLA fuses and compiles in milliseconds, where
    the equivalent lax.conv_general_dilated pays the TPU conv emitter's much
    slower compilation for no runtime benefit at 3x3 (the split-score graph
    carries eight of these, and its remote-compile cost dominated cold-start
    encode profiles).
    """
    x = img.astype(jnp.float32)
    p = jnp.pad(x, ((1, 1), (0, 0)), mode="reflect")
    v = vker[0] * p[:-2] + vker[1] * p[1:-1] + vker[2] * p[2:]
    p = jnp.pad(v, ((0, 0), (1, 1)), mode="reflect")
    return hker[0] * p[:, :-2] + hker[1] * p[:, 1:-1] + hker[2] * p[:, 2:]


def sobel_cv2(gray: jnp.ndarray) -> tuple:
    """cv2.Sobel(gray, CV_64F, 1, 0/0, 1, ksize=3) pair (gx, gy).

    cv2 uses BORDER_REFLECT_101 ('reflect' in numpy terms).
    """
    g = gray.astype(jnp.float32)
    gx = _sep3(g, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    gy = _sep3(g, (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))
    return gx, gy


def sobel_magnitude_cv2(gray: jnp.ndarray) -> jnp.ndarray:
    gx, gy = sobel_cv2(gray)
    return jnp.sqrt(gx * gx + gy * gy)


def sobel_skimage(img: jnp.ndarray) -> jnp.ndarray:
    """skimage.filters.sobel edge magnitude: kernels /4, magnitude /sqrt(2).

    (split_score.py:48-53,92 feeds float images in skimage scaling.)
    """
    h = _sep3(img, (-0.25, 0.0, 0.25), (1.0, 2.0, 1.0))
    v = _sep3(img, (0.25, 0.5, 0.25), (-1.0, 0.0, 1.0))
    return jnp.sqrt(h * h + v * v) / np.sqrt(2.0)


def box_density(binary: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Local density of non-zero pixels: normalized box filter.

    compute_local_density (encoder/ROI/edges.py:173-195): input scaled to 0-1
    if max > 1, kernel = ones(k, k)/k^2, cv2.filter2D with reflected borders.
    """
    x = binary.astype(jnp.float32)
    x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)
    kernel = jnp.ones((kernel_size, kernel_size), jnp.float32) / float(kernel_size**2)
    return conv2d_same(x, kernel)


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur (scipy.ndimage.gaussian_filter semantics,
    reflect borders), applied over the leading two axes."""
    if sigma <= 0:
        return img.astype(jnp.float32)
    k = jnp.asarray(gaussian_kernel1d(sigma))
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]

    def blur_hw(ch):
        ch = conv2d_same(ch, k[:, None])
        return conv2d_same(ch, k[None, :])

    out = jnp.stack([blur_hw(x[..., c]) for c in range(x.shape[-1])], axis=-1)
    return out[..., 0] if squeeze else out


def conv2d_same_multi(x: jnp.ndarray, kernels: jnp.ndarray, *, reflect: bool = True) -> jnp.ndarray:
    """N same-size 2-D correlations in ONE conv: (h, w) x (n, kh, kw) -> (n, h, w).

    The gap-bridging stage runs 8 directional-reach kernels; as separate
    conv2d_same calls each pays its own pad + dispatch (~700 ms/stage on the
    tunneled chip) — one multi-output-channel conv is a single XLA op.
    """
    n, kh, kw = kernels.shape
    ph, pw = kh // 2, kw // 2
    x = x.astype(jnp.float32)
    if reflect:
        x = jnp.pad(x, ((ph, kh - 1 - ph), (pw, kw - 1 - pw)), mode="reflect")
        padding = "VALID"
    else:
        padding = [(ph, kh - 1 - ph), (pw, kw - 1 - pw)]
    out = jax.lax.conv_general_dilated(
        x[None, None],
        kernels.astype(jnp.float32)[:, None],
        window_strides=(1, 1),
        padding=padding,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def directional_reach_kernels(max_gap: int, local_window: int) -> np.ndarray:
    """The 8 gap-bridging kernels (4 opposite-direction pairs).

    create_gap_detection_kernels (encoder/ROI/small_gaps.py:274-320): each
    kernel marks cells 1..max_gap along one direction inside a
    (2*local_window+1)^2 window, normalized to sum 1.  Returns (8, k, k) in
    pair order [lr0, lr1, ud0, ud1, d0, d1, a0, a1].
    """
    size = local_window * 2 + 1
    dirs = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (1, 1), (-1, 1), (1, -1)]
    kernels = np.zeros((8, size, size), np.float32)
    c = local_window
    for i, (dx, dy) in enumerate(dirs):
        for d in range(1, max_gap + 1):
            x, y = c + dx * d, c + dy * d
            if 0 <= x < size and 0 <= y < size:
                kernels[i, y, x] = 1.0
        s = kernels[i].sum()
        if s > 0:
            kernels[i] /= s
    return kernels
