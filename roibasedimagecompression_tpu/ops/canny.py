"""Canny edge detection and the adaptive-threshold sweep, TPU-batched.

The reference's get_edge_map runs 4 threshold methods x 5 sensitivities = 20
full cv2.Canny passes plus 20 connected-component scorings (encoder/ROI/
edges.py:35-85) — its top-of-pipeline hot spot.  The TPU redesign computes the
Sobel gradient and non-maximum suppression ONCE (both are threshold-
independent), then evaluates all 20 (low, high) candidates as one vmapped
hysteresis + scoring pass.

Parity notes vs cv2.Canny: 3x3 Sobel with replicate border, L1 gradient
magnitude (L2gradient=False default), 4-sector NMS with cv2's tan(22.5deg)
sector boundaries and > / >= tie-breaking, hysteresis as 8-connected
reachability from strong pixels.  Multi-channel input takes the per-pixel
max-magnitude channel's gradient (cv2 behavior for the final RGB Canny at
edges.py:37).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from roibasedimagecompression_tpu.ops import cc as CC
from roibasedimagecompression_tpu.ops import colors as COL
from roibasedimagecompression_tpu.ops import conv as CONV
from roibasedimagecompression_tpu.ops import hist as H

_TAN22 = math.tan(math.pi / 8.0)  # 0.4142...
_TAN67 = math.tan(3.0 * math.pi / 8.0)  # 2.4142...


def _sobel_replicate(gray: jnp.ndarray):
    """3x3 Sobel with replicate border (cv2.Canny's internal border mode)."""
    g = jnp.pad(gray.astype(jnp.float32), 1, mode="edge")
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    h, w = gray.shape

    def conv(k):
        # Correlation — cv2.Sobel semantics (sign feeds the NMS sector logic).
        # No HIGHEST needed: u8 values (<= 255) and +-1/+-2 taps are exact in
        # the TPU's bf16 multiply, and accumulation is f32.
        out = jax.lax.conv_general_dilated(
            g[None, None],
            k[None, None],
            window_strides=(1, 1),
            padding="VALID",
        )
        return out[0, 0]

    return conv(kx), conv(kx.T)


def _shift(x: jnp.ndarray, dr: int, dc: int, fill=0.0) -> jnp.ndarray:
    h, w = x.shape
    padded = jnp.pad(x, 1, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (1 + dr, 1 + dc), (h, w))


def gradient_and_nms(image: jnp.ndarray):
    """Gradient magnitude + the NMS survivor mask (threshold-independent).

    image: (h, w) uint8 gray or (h, w, 3) uint8 RGB.
    Returns (mag f32, nms_pass bool).
    """
    if image.ndim == 3:
        mags, gxs, gys = [], [], []
        for c in range(3):
            gx, gy = _sobel_replicate(image[..., c])
            gxs.append(gx)
            gys.append(gy)
            mags.append(jnp.abs(gx) + jnp.abs(gy))
        mag_stack = jnp.stack(mags)
        best = jnp.argmax(mag_stack, axis=0)
        mag = jnp.max(mag_stack, axis=0)
        gx = jnp.take_along_axis(jnp.stack(gxs), best[None], axis=0)[0]
        gy = jnp.take_along_axis(jnp.stack(gys), best[None], axis=0)[0]
    else:
        gx, gy = _sobel_replicate(image)
        mag = jnp.abs(gx) + jnp.abs(gy)

    ax, ay = jnp.abs(gx), jnp.abs(gy)
    # Sector selection (cv2): horizontal if |gy| < TG22*|gx|; vertical if
    # |gy| > TG67*|gx|; else diagonal, signed by gx*gy.
    horizontal = ay < _TAN22 * ax
    vertical = ay > _TAN67 * ax
    diag = ~horizontal & ~vertical
    same_sign = (gx * gy) >= 0

    m_l, m_r = _shift(mag, 0, -1), _shift(mag, 0, 1)
    m_u, m_d = _shift(mag, -1, 0), _shift(mag, 1, 0)
    m_ul, m_dr = _shift(mag, -1, -1), _shift(mag, 1, 1)
    m_ur, m_dl = _shift(mag, -1, 1), _shift(mag, 1, -1)

    def keep(a, b):
        return (mag > a) & (mag >= b)

    pass_h = keep(m_l, m_r)
    pass_v = keep(m_u, m_d)
    pass_d1 = keep(m_ul, m_dr)  # gradient along main diagonal
    pass_d2 = keep(m_ur, m_dl)

    nms = (
        (horizontal & pass_h)
        | (vertical & pass_v)
        | (diag & same_sign & pass_d1)
        | (diag & ~same_sign & pass_d2)
    )
    return mag, nms


_STRONG_OFFSET = jnp.int32(1 << 30)


def hysteresis_labeled(mag: jnp.ndarray, nms: jnp.ndarray, low, high):
    """Hysteresis + component bookkeeping, scatter-free.

    Min-label propagation runs over the weak graph with strong pixels' keys
    offset by -2^30: a component's propagated minimum is negative iff it
    contains a strong pixel — hysteresis, component counting and sizing all
    come out of stencil mins + gathers (TPU scatters serialize; segment_max
    over h*w buckets was the dominant cost of the Canny sweep).

    Returns (edges, n_kept_components, n_edge_pixels).
    """
    weak = nms & (mag > low)
    strong = nms & (mag > high)
    h, w = mag.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    keys = jnp.where(strong, ids - _STRONG_OFFSET, ids)
    prop = CC.propagate_keys(keys, weak, connectivity=8)
    edges = weak & (prop < 0)
    # One representative per kept component: the pixel whose own key equals
    # the propagated minimum (and that minimum is negative).
    n_comp = jnp.sum((prop == keys) & weak & (prop < 0))
    return edges, n_comp, jnp.sum(edges)


def hysteresis(mag: jnp.ndarray, nms: jnp.ndarray, low, high) -> jnp.ndarray:
    """Edges = NMS survivors above `low` 8-connected to one above `high`."""
    return hysteresis_labeled(mag, nms, low, high)[0]


@jax.jit
def canny(image: jnp.ndarray, low, high) -> jnp.ndarray:
    """cv2.Canny analogue -> bool edge map."""
    mag, nms = gradient_and_nms(image)
    return hysteresis(mag, nms, jnp.float32(low), jnp.float32(high))


def _clip_pair(low, high):
    low = jnp.clip(low, 10.0, 200.0)
    high = jnp.clip(high, low + 10.0, 255.0)
    return low, high


@jax.jit
def adaptive_thresholds(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """All 20 (low, high) candidates of compute_adaptive_canny_thresholds
    (edges.py:87-169): 4 methods x sensitivities [0.5, 0.7, 1.0, 1.3, 1.5].

    Returns (20, 2) float32 in method-major order [otsu, percentile, gradient,
    hybrid] to match the reference's scan order (ties keep the first best).
    """
    g = gray_u8
    otsu = H.otsu_threshold(g)
    gx, gy = CONV.sobel_cv2(g.astype(jnp.float32))
    grad = jnp.sqrt(gx * gx + gy * gy)
    nz = grad > 0
    p70 = H.masked_percentile(grad, nz, 70.0)
    p90 = H.masked_percentile(grad, nz, 90.0)
    any_nz = jnp.any(nz)
    mean_g = jnp.mean(grad)
    std_g = jnp.std(grad)

    sens = jnp.asarray([0.5, 0.7, 1.0, 1.3, 1.5], jnp.float32)
    pairs = []
    for i in range(5):
        s = sens[i]
        # otsu: ints via truncation (reference uses int()).
        lo = jnp.maximum(10.0, jnp.floor(otsu * 0.5 * s))
        hi = jnp.minimum(255.0, jnp.floor(otsu * 1.5 * s))
        pairs.append(_clip_pair(lo, hi))
    for i in range(5):
        s = sens[i]
        lo = jnp.where(any_nz, p70 * s, 50.0 * s)
        hi = jnp.where(any_nz, p90 * s, 150.0 * s)
        pairs.append(_clip_pair(jnp.maximum(10.0, jnp.floor(lo)), jnp.minimum(255.0, jnp.floor(hi))))
    for i in range(5):
        s = sens[i]
        lo = jnp.maximum(10.0, jnp.floor((mean_g - 0.5 * std_g) * s))
        hi = jnp.minimum(255.0, jnp.floor((mean_g + 0.5 * std_g) * s))
        pairs.append(_clip_pair(lo, hi))
    for i in range(5):
        s = sens[i]
        lo = jnp.maximum(10.0, jnp.floor((otsu * 0.5 + mean_g * 0.5) * s))
        hi = jnp.minimum(255.0, jnp.floor((otsu * 1.5 + mean_g * 1.0) * s))
        pairs.append(_clip_pair(lo, hi))
    return jnp.stack([jnp.stack(p) for p in pairs])


@jax.jit
def edge_quality_scores(gray_u8: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """Score every (low, high) candidate in one batched pass.

    evaluate_edge_quality (edges.py:73-85): score = mean component size
    (8-conn) x std of gray at edge pixels.  Gradient + NMS are shared; the
    hysteresis/labeling/scoring runs under vmap over the candidate axis.
    """
    mag, nms = gradient_and_nms(gray_u8)
    grayf = gray_u8.astype(jnp.float32)

    def score_one(pair):
        edges, n_comp, n_edge = hysteresis_labeled(mag, nms, pair[0], pair[1])
        avg_size = n_edge.astype(jnp.float32) / jnp.maximum(n_comp, 1).astype(jnp.float32)
        contrast = H.masked_std(grayf, edges)
        return jnp.where(n_comp > 0, avg_size * contrast, -jnp.inf)

    return jax.vmap(score_one)(thresholds)


@functools.partial(jax.jit, static_argnames=("method",))
def fast_thresholds(gray_u8: jnp.ndarray, method: str = "percentile_fast"):
    """One-shot threshold estimation (compute_fast_canny_thresholds,
    edges.py:245-299) — no Canny sweep."""
    g = gray_u8.astype(jnp.float32)

    def percentile_fast():
        low_val = H.masked_percentile(g, jnp.ones_like(g, jnp.bool_), 25.0)
        high_val = H.masked_percentile(g, jnp.ones_like(g, jnp.bool_), 75.0)
        low = jnp.clip(jnp.floor(low_val * 0.7), 10.0, 100.0)
        high = jnp.clip(jnp.floor(high_val * 1.3), 50.0, 200.0)
        high = jnp.where(high < low * 2.0, jnp.minimum(low * 2.0, 255.0), high)
        return low, high

    def gradient_fast():
        gx, gy = CONV.sobel_cv2(g)
        mag = jnp.abs(gx) + jnp.abs(gy)
        nz = mag > 0
        n = jnp.sum(nz)
        low = jnp.floor(H.masked_percentile(mag, nz, 10.0))
        high = jnp.floor(H.masked_percentile(mag, nz, 90.0))
        low = jnp.where(n > 100, low, 50.0)
        high = jnp.where(n > 100, high, 150.0)
        return low, high

    if method == "percentile_fast":
        low, high = percentile_fast()
    elif method == "gradient_fast":
        low, high = gradient_fast()
    else:  # hybrid_fast
        l1, h1 = percentile_fast()
        l2, h2 = gradient_fast()
        low, high = jnp.floor((l1 + l2) / 2.0), jnp.floor((h1 + h2) / 2.0)
    low = jnp.clip(low, 10.0, 100.0)
    high = jnp.maximum(low * 2.0, jnp.minimum(high, 200.0))
    return low, high


def get_edge_map_fast(image_rgb: np.ndarray):
    """Single-Canny fast path (get_edge_map_fast, edges.py:210-243): blend the
    percentile thresholds with 10th/90th gradient percentiles, run Canny once
    on the grayscale image."""
    rgb = jnp.asarray(image_rgb)
    gray = COL.rgb_to_gray_cv2(rgb)

    @jax.jit
    def fused(gray):
        low, high = fast_thresholds(gray, "percentile_fast")
        gx, gy = CONV.sobel_cv2(gray.astype(jnp.float32))
        mag = jnp.sqrt(gx * gx + gy * gy)
        nz = mag > 0
        glow = H.masked_percentile(mag, nz, 10.0)
        ghigh = H.masked_percentile(mag, nz, 90.0)
        low = jnp.floor((low + glow) / 2.0)
        high = jnp.floor((high + ghigh) / 2.0)
        m, nms = gradient_and_nms(gray)
        return hysteresis(m, nms, low, high), low, high

    edges, low, high = fused(gray)
    return np.asarray(edges), (float(low), float(high))


@jax.jit
def _fast_blend_batch(images: jnp.ndarray):
    """(B, h, w, 3) u8 -> (lows, highs) via the fast single-shot estimator
    (get_edge_map_fast's blend of percentile and gradient-percentile
    thresholds, edges.py:210-243) — ONE device call for a whole batch."""

    def one(im):
        gray = COL.rgb_to_gray_cv2(im)
        low, high = fast_thresholds(gray, "percentile_fast")
        gx, gy = CONV.sobel_cv2(gray.astype(jnp.float32))
        mag = jnp.sqrt(gx * gx + gy * gy)
        nz = mag > 0
        glow = H.masked_percentile(mag, nz, 10.0)
        ghigh = H.masked_percentile(mag, nz, 90.0)
        return jnp.floor((low + glow) / 2.0), jnp.floor((high + ghigh) / 2.0)

    return jax.vmap(one)(images)


def fast_thresholds_many(images) -> tuple:
    """Batched fast threshold selection (the reduced-candidate MODE of the
    reference, exposed as CodecConfig.fast_edges).  Skips the 20-candidate
    adaptive sweep entirely; ~one device call per batch."""
    lows, highs = _fast_blend_batch(jnp.asarray(images))
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    lows, highs = SHARD.collect_all([lows, highs])
    return lows.astype(np.float32), highs.astype(np.float32)


@jax.jit
def edge_analysis(image_rgb: jnp.ndarray):
    """The threshold-independent device work of the adaptive sweep, fused:
    candidate table + gray gradient/NMS (for scoring) + color gradient/NMS
    (for the final Canny).  One device call; everything downstream of it is
    per-candidate connected-components work that a host union-find does in
    milliseconds (the in-graph propagation sweep cost ~3.7 s of the round-1
    ROI stage)."""
    gray = COL.rgb_to_gray_cv2(image_rgb)
    cands = adaptive_thresholds(gray)
    mag_g, nms_g = gradient_and_nms(gray)
    mag_c, nms_c = gradient_and_nms(image_rgb)
    return gray, cands, mag_g, nms_g, mag_c, nms_c


@jax.jit
def _edge_analysis_gray(image_rgb: jnp.ndarray):
    """Gray-only analysis for batched threshold selection (the color
    gradient/NMS stays on device — the fused mask graph recomputes it)."""
    gray = COL.rgb_to_gray_cv2(image_rgb)
    cands = adaptive_thresholds(gray)
    mag_g, nms_g = gradient_and_nms(gray)
    return gray, cands, mag_g, nms_g


@jax.jit
def edge_analysis_batch(images: jnp.ndarray):
    return jax.vmap(_edge_analysis_gray)(images)


def hysteresis_host(mag: np.ndarray, nms: np.ndarray, low, high):
    """Host hysteresis: native union-find over the weak graph; components
    containing a strong pixel survive.  Returns None without the native lib."""
    from roibasedimagecompression_tpu import native

    weak = nms & (mag > low)
    out = native.cc_label(weak, connectivity=8)
    if out is None:
        return None
    labels, num, _ = out
    if num == 0:
        return np.zeros(mag.shape, bool)
    strong = nms & (mag > high)
    keep = np.zeros(num + 1, bool)
    keep[labels[strong]] = True
    keep[0] = False
    return keep[labels]


def score_candidates_host(gray: np.ndarray, mag: np.ndarray, nms: np.ndarray, cands: np.ndarray):
    """Score all (low, high) candidates with host union-find CC.

    evaluate_edge_quality (edges.py:73-85): score = mean kept-component size x
    std of gray at edge pixels; first best wins (strict >, matching the
    device argmax tie-break).  Returns the best index, or None without the
    native library.
    """
    from roibasedimagecompression_tpu import native

    if not native.available():
        return None
    grayf = gray.astype(np.float64)
    best, best_score = 0, -np.inf
    for i in range(len(cands)):
        low, high = cands[i]
        weak = nms & (mag > low)
        out = native.cc_label(weak, connectivity=8)
        if out is None:
            return None
        labels, num, stats = out
        if num == 0:
            continue
        strong = nms & (mag > high)
        keep = np.zeros(num + 1, bool)
        keep[labels[strong]] = True
        keep[0] = False
        n_comp = int(keep.sum())
        if n_comp == 0:
            continue
        edges = keep[labels]
        n_edge = int(stats[keep[1:], 0].sum())
        vals = grayf[edges]
        contrast = float(vals.std())
        score = (n_edge / n_comp) * contrast
        if score > best_score:
            best_score, best = score, i
    return best


def _select_thresholds_native(image_rgb: np.ndarray):
    """All-host threshold selection: native analysis + native CC scoring.

    Returns (low, high) or None without the native library.  No device
    dispatch and no tunnel transfer of the (h, w) analysis tensors.
    """
    from roibasedimagecompression_tpu import native

    out = native.canny_analysis(image_rgb)
    if out is None:
        return None
    gray, mag_g, nms_g, cands = out
    best = native.score_candidates(gray, mag_g, nms_g, cands)
    if best is None:
        best = score_candidates_host(gray, mag_g, nms_g, cands)
    if best is None:
        return None
    return float(cands[best][0]), float(cands[best][1])


def select_thresholds(image_rgb: np.ndarray):
    """Adaptive threshold selection: native host path when available, else
    device analysis + host CC scoring.

    Returns (low, high, mag_c, nms_c) — the color gradient/NMS ride along so
    callers can finish the final hysteresis without another device pass
    (native ints on the host path).  Falls back to the all-device scoring
    path when the native CC library is unavailable.
    """
    from roibasedimagecompression_tpu import native

    pair = _select_thresholds_native(image_rgb)
    if pair is not None:
        low, high = pair
        mag_c, nms_c = native.gradient_nms_rgb(image_rgb)
        return low, high, mag_c.astype(np.float32), nms_c
    out = edge_analysis(jnp.asarray(image_rgb))
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    gray, cands, mag_g, nms_g, mag_c, nms_c = SHARD.collect_all(out)
    best = score_candidates_host(gray, mag_g, nms_g, cands)
    if best is None:
        scores = edge_quality_scores(jnp.asarray(gray), jnp.asarray(cands))
        best = int(jnp.argmax(scores))
    low, high = cands[best]
    return float(low), float(high), mag_c, nms_c


def select_thresholds_pair(image_rgb: np.ndarray):
    """Adaptive (low, high) only — no color gradient/NMS ride-along.

    The mask-building callers (roi_masks_fast -> native roi_pipeline)
    recompute the color gradient internally, so select_thresholds'
    ride-along tensors are dead weight there: on the native path they cost
    an extra full-image gradient+NMS pass (~15 ms/image on this host) that
    this variant skips.
    """
    pair = _select_thresholds_native(image_rgb)
    if pair is not None:
        return pair
    low, high, _, _ = select_thresholds(image_rgb)
    return low, high


def select_thresholds_many(images: np.ndarray):
    """Batched adaptive threshold selection.

    Native path: per-image host analysis + scoring (single-core hosts gain
    nothing from threads; the native chain is ~60 ms/image).  Fallback: ONE
    device analysis call for the whole (B, h, w, 3) batch, host CC scoring
    per image (threaded).

    Returns (lows (B,), highs (B,)) float32 arrays.
    """
    import concurrent.futures

    b = len(images)
    native_pairs = []
    for k in range(b):
        pair = _select_thresholds_native(images[k])
        if pair is None:
            break
        native_pairs.append(pair)
    if len(native_pairs) == b:
        lows = np.asarray([p[0] for p in native_pairs], np.float32)
        highs = np.asarray([p[1] for p in native_pairs], np.float32)
        return lows, highs

    out = edge_analysis_batch(jnp.asarray(images))
    from roibasedimagecompression_tpu.parallel import shard as SHARD

    gray, cands, mag_g, nms_g = SHARD.collect_all(out)

    def score(k):
        best = score_candidates_host(gray[k], mag_g[k], nms_g[k], cands[k])
        if best is None:
            scores = edge_quality_scores(jnp.asarray(gray[k]), jnp.asarray(cands[k]))
            best = int(jnp.argmax(scores))
        return cands[k][best]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        pairs = list(pool.map(score, range(b)))
    lows = np.asarray([p[0] for p in pairs], np.float32)
    highs = np.asarray([p[1] for p in pairs], np.float32)
    return lows, highs


def get_edge_map(image_rgb: np.ndarray):
    """Adaptive Canny (get_edge_map, edges.py:35-38): pick the best-scoring
    (low, high) on the grayscale image, then run Canny on the RGB image.

    Returns (edges bool (h, w), (low, high)).
    """
    low, high, mag_c, nms_c = select_thresholds(image_rgb)
    edges = hysteresis_host(mag_c, nms_c, low, high)
    if edges is None:
        edges = np.asarray(canny(jnp.asarray(image_rgb), low, high))
    return edges, (float(low), float(high))
