"""Image quality metrics (PSNR / SSIM / MSE family) as jittable JAX ops.

Numerically matches the skimage implementations the reference evaluates with
(decoder/uncompression/comparison.py:30-80): PSNR with data_range=255, SSIM with
a 7x7 uniform window, sample covariance normalization, K1=0.01/K2=0.03, computed
per channel and averaged (channel_axis=2 behavior).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    m = mse(a, b)
    return jnp.where(m > 0, 10.0 * jnp.log10(data_range * data_range / m), jnp.inf)


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean filter with a win x win box, 'valid' output (2-D input).

    Precision.HIGHEST is load-bearing: the TPU's default conv precision
    multiplies in bf16, and the SSIM variance terms are near-cancelling
    differences (uxx - ux^2 at ~2e4 magnitude) — bf16's ~90-unit error
    swamps C2 = 58.5 and produced SSIM values like -7.2 on smooth skies.
    """
    kernel = jnp.ones((win, win), jnp.float32) / float(win * win)
    return jax.lax.conv_general_dilated(
        x[None, None, :, :].astype(jnp.float32),
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def ssim_single(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """SSIM over one 2-D channel, skimage-compatible.

    Uses the uniform filter (gaussian_weights=False), sample covariance
    normalization NP/(NP-1), and averages the SSIM map over the region where
    the window fully fits (skimage crops `pad` border pixels).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    np_pts = float(win_size * win_size)
    cov_norm = np_pts / (np_pts - 1.0)

    # Center by the joint mean before filtering: the variance terms are the
    # difference of two nearly-equal large numbers (uxx - ux^2); shrinking the
    # magnitudes keeps f32 cancellation error negligible vs C2.  SSIM itself is
    # shift-sensitive only through the mean terms, which we un-shift below.
    shift = 0.5 * (jnp.mean(a) + jnp.mean(b))
    a = a - shift
    b = b - shift

    ux = _uniform_filter_valid(a, win_size)
    uy = _uniform_filter_valid(b, win_size)
    uxx = _uniform_filter_valid(a * a, win_size)
    uyy = _uniform_filter_valid(b * b, win_size)
    uxy = _uniform_filter_valid(a * b, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    # Un-shift the luminance (mean) terms; (co)variances are shift-invariant.
    ux = ux + shift
    uy = uy + shift

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)


def ssim_map(a: np.ndarray, b: np.ndarray, data_range: float = 255.0, win_size: int = 7) -> np.ndarray:
    """Per-pixel SSIM map (channel-averaged), padded back to input size.

    The skimage full=True map feeding the 12-panel comparison figure
    (decoder/uncompression/comparison.py:198-205).  Valid-window interior;
    border pixels replicate the nearest interior value.
    """

    @functools.partial(jax.jit, static_argnames=("win_size",))
    def one(x, y, win_size):
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        np_pts = float(win_size * win_size)
        cov_norm = np_pts / (np_pts - 1.0)
        shift = 0.5 * (jnp.mean(xf) + jnp.mean(yf))
        xf = xf - shift
        yf = yf - shift
        ux = _uniform_filter_valid(xf, win_size)
        uy = _uniform_filter_valid(yf, win_size)
        uxx = _uniform_filter_valid(xf * xf, win_size)
        uyy = _uniform_filter_valid(yf * yf, win_size)
        uxy = _uniform_filter_valid(xf * yf, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        ux = ux + shift
        uy = uy + shift
        return (2.0 * ux * uy + c1) * (2.0 * vxy + c2) / (
            (ux * ux + uy * uy + c1) * (vx + vy + c2)
        )

    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    maps = [np.asarray(one(jnp.asarray(a[..., c]), jnp.asarray(b[..., c]), win_size))
            for c in range(a.shape[-1])]
    interior = np.mean(maps, axis=0)
    pad = win_size // 2
    return np.pad(interior, pad, mode="edge")


def ssim(a: jax.Array, b: jax.Array, data_range: float = 255.0, win_size: int = 7) -> jax.Array:
    """SSIM for (h, w) or (h, w, c) images; channels averaged like skimage."""
    if a.ndim == 2:
        return ssim_single(a, b, data_range, win_size)
    per_channel = jax.vmap(
        lambda x, y: ssim_single(x, y, data_range, win_size), in_axes=(2, 2)
    )(a, b)
    return jnp.mean(per_channel)


@functools.partial(jax.jit, static_argnames=("win_size",))
def _quality_metrics_jit(a: jax.Array, b: jax.Array, win_size: int = 7):
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    m = jnp.mean((af - bf) ** 2)
    per_channel_mse = jnp.mean((af - bf) ** 2, axis=(0, 1))
    abs_err = jnp.abs(af - bf)
    return {
        "mse": m,
        "psnr": jnp.where(m > 0, 10.0 * jnp.log10(255.0 * 255.0 / m), jnp.inf),
        "ssim": ssim(a, b, 255.0, win_size),
        "rmse": jnp.sqrt(m),
        "mae": jnp.mean(abs_err),
        "max_error": jnp.max(abs_err),
        "mse_per_channel": per_channel_mse,
    }


def quality_metrics(original: np.ndarray, reconstructed: np.ndarray) -> dict:
    """Full metric dict (PSNR/SSIM/MSE/RMSE/MAE/max/per-channel MSE).

    Mirrors calculate_quality_metrics (decoder/uncompression/comparison.py:30-80)
    but runs as one fused XLA computation.
    """
    out = _quality_metrics_jit(jnp.asarray(original), jnp.asarray(reconstructed))
    out = jax.device_get(out)
    result = {k: float(v) for k, v in out.items() if k != "mse_per_channel"}
    for name, v in zip("rgb", np.asarray(out["mse_per_channel"])):
        result[f"mse_{name}"] = float(v)
    return result
