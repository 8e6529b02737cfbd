"""Codec configuration: every bitstream-visible "law" of the RHCCQ codec in one place.

The reference scatters these knobs as function defaults and driver literals; here
they live in frozen dataclasses so the whole codec is configured from a single
object.  Each law cites the reference location it reproduces (parity contract):

- quality -> DBSCAN params:      encoder/compression/clustering.py:108-135
- tier quality laws (2q, q2+q2): encoder/compression/test.py:116-141
- adaptive size laws:            encoder/ROI/roi.py:17-29, encoder/compression/subregions.py:133
- SLIC working-resolution cap:   encoder/subregions/slic.py:42-44
- ROI mask pipeline constants:   encoder/ROI/roi.py:527-607
- split-score logistic:          encoder/subregions/split_score.py:144-145
- k-means switch at >=10k colors: encoder/compression/clustering.py:207-210
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class ClusteringParams:
    """Resolved DBSCAN-style clustering parameters for one palette."""

    eps: float  # euclidean distance threshold on the 0-255 RGB scale
    min_samples: int
    max_colors_per_cluster: int


def clustering_params(n_colors: int, quality: float) -> ClusteringParams:
    """quality (0-100] -> palette clustering parameters.

    Reproduces encoder/compression/clustering.py:108-135:
      eps = 128 - 1.28*q   (0 -> 1)
      max_colors_per_cluster = ceil((n - n*q/100) / q)   (0 -> 1)
      min_samples = 1  (=> DBSCAN degenerates to single-linkage connected components)
    """
    eps = 128.0 - 1.28 * float(quality)
    if eps == 0:
        eps = 1.0
    if quality <= 0:
        raise ValueError(f"quality must be > 0, got {quality}")
    max_colors = math.ceil((-(quality / 100.0) * n_colors + n_colors) / quality)
    if max_colors == 0:
        max_colors = 1
    return ClusteringParams(eps=eps, min_samples=1, max_colors_per_cluster=max_colors)


def tier2_quality(q1: float) -> float:
    """Tier-2 (region-group) quality law: q2 = min(2*q1, 100).

    encoder/compression/test.py:116-120 / rhccq.ipynb cell 12.
    """
    return min(2.0 * q1, 100.0)


def tier3_quality(q2_roi: float, q2_nonroi: float) -> float:
    """Tier-3 (whole image) quality law: q3 = min(q2_roi + q2_nonroi, 100).

    encoder/compression/test.py:139-141 / rhccq.ipynb cell 14.
    """
    return min(q2_roi + q2_nonroi, 100.0)


def min_region_size(image_size: int) -> int:
    """Adaptive minimum connected-region size.

    ceil(size / 10^(ceil(log10 size) - 3)); `size` counts h*w*3 elements
    (the reference passes `image_rgb.size`).  encoder/ROI/roi.py:29,47-49.
    """
    return math.ceil(image_size / math.pow(10, math.ceil(math.log10(image_size)) - 3))


def segment_window(region_size: int) -> int:
    """Max SLIC segment count window for a region of `size` elements (h*w*3).

    window = ceil(ceil(log10 s) * ln s).  encoder/compression/subregions.py:133.
    """
    return math.ceil(math.ceil(math.log10(region_size)) * math.log(region_size))


def logistic_segments(score: float, window: int) -> int:
    """Split score (0-1) -> SLIC segment count via a logistic gate.

    normalize_result at encoder/subregions/split_score.py:144-145, consumed
    with ceil + floor-to-1 at encoder/compression/subregions.py:134-138.
    """
    n = math.ceil(window / (1.0 + math.exp(-12.0 * (score - 0.5))))
    return max(1, n)


def slic_scale_factor(max_dim: int) -> float:
    """Working-resolution downscale factor for SLIC (cap at 500 px max dim).

    round(500 / max_dim, 1) clamped to <= 1.  encoder/subregions/slic.py:42-44.
    """
    s = round(500.0 / float(max_dim), 1)
    return min(s, 1.0)


# Palette size at which clustering switches from DBSCAN to mini-batch k-means
# (encoder/compression/clustering.py:207).
KMEANS_SWITCH_COLORS = 10_000


def kmeans_n_clusters(n_colors: int, quality: float) -> int:
    """Cluster count for the large-palette k-means path.

    ceil(n * (q/100) / 10).  encoder/compression/clustering.py:210.
    """
    return max(1, math.ceil(n_colors * (quality / 100.0) / 10.0))


@dataclasses.dataclass(frozen=True)
class RoiConfig:
    """ROI mask pipeline constants (encoder/ROI/roi.py:527-607 call chain)."""

    density_kernel: int = 3            # roi.py:23
    thin_density_threshold: float = 0.10   # roi.py:550
    thin_thinness_threshold: float = 0.3   # roi.py:550 (thin_regions2.py default)
    thin_window: int = 25              # roi.py:550
    thin_min_region_size: int = 10     # identify_thin_regions_ultrafast default
    noise_min_size: int = 75           # roi.py:552
    noise_density_threshold: float = 0.2   # remove_small_noise_regions default
    noise_window: int = 15             # remove_small_noise_regions default
    close_distance: int = 5            # roi.py:559 (ellipse kernel 11x11)
    bridge1_max_gap: int = 100         # roi.py:564
    bridge1_density: float = 0.2       # roi.py:564
    bridge_local_window: int = 15      # roi.py:564
    bridge_regional_window: int = 25   # roi.py:564
    border_sensitivity: float = 0.5    # roi.py:748 (detect_meaningful_borders call)
    border_protect_kernel: int = 15    # roi.py:751
    bridge2_max_gap: int = 25          # roi.py:761
    fill_min_hole: int = 10            # roi.py:768
    fill_max_hole: int = 10_000        # roi.py:768
    clean_min_size: int = 5            # roi.py:775
    buffer_size: int = 3               # extract_roi_nonroi default, roi.py:685


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Top-level codec configuration (quality preset + pipeline switches)."""

    roi_quality: float = 20.0          # encoder/compression/test.py:100
    nonroi_quality: float = 10.0       # encoder/compression/test.py:101
    roi: RoiConfig = dataclasses.field(default_factory=RoiConfig)
    slic_compactness: float = 10.0     # encoder/subregions/slic.py:41
    slic_sigma: float = 1.0            # skimage slic sigma at slic.py:93
    segment_pad: int = 2               # encoder/compression/subregions.py:350
    seed: int = 42                     # clustering.py:214,751 (random_state=42)
    # When True, treat the whole image as a single region (the degenerate path
    # the reference falls into when region extraction fails, test.py:124-128).
    single_region: bool = False
    # Batched tier-1 (bucketed vmapped clustering over all segments at once —
    # the TPU path).  False falls back to the per-segment reference-shaped
    # loop, kept for cross-checking.
    batched: bool = True
    # Pixel-popularity-weighted cluster colors.  The reference averages the
    # *palette entries* of a cluster unweighted (clustering.py:305,347); with
    # weighting, the cluster color minimizes actual pixel MSE — strictly
    # better PSNR at the same palette size/rate.  Set False for
    # reference-law parity.
    weighted_palette: bool = True
    # Region fusion: bidirectional small-region reassignment followed by an
    # adjacency merge of same-kind regions (process_regions_with_reassignment
    # + fuse_adjacent_regions_optimized, encoder/ROI/roi.py:109-249).  The
    # reference ships this as an alternative to plain extract_regions and
    # does not wire it into its main encode driver — off by default here too.
    region_fusion: bool = False
    # Black-hole filling before tier-3 clustering: black connected regions of
    # size <= this get their neighbors' most common color
    # (fill_black_holes_vectorized, encoder/compression/image.py:133-240).
    # 0 disables — matching the reference, whose call is commented out at
    # image.py:259 (it used max_hole_size=50 when enabled).
    fill_black_holes: int = 0
    # Fast edge-detection mode: single-shot threshold estimation (blend of
    # intensity-percentile and gradient-percentile laws) instead of the
    # 20-candidate adaptive Canny sweep — the reference's get_edge_map_fast /
    # compute_fast_canny_thresholds variant (encoder/ROI/edges.py:210-299).
    fast_edges: bool = False
    # Container entropy stage.  0 = legacy byte-compat zlib level 9 (the
    # reference writer's exact bytes, compression.py:151-202); 1-12 = that
    # level via libdeflate — still a standard zlib stream the reference
    # decoder reads, ~4x faster at 7 and ~5% smaller files at 10+.  Measured
    # on Kodak index matrices: ld-10 beats zlib-9 on size (-5.4%) at equal
    # host cost; ld-7 is 5x faster at +0.9% size.
    container_level: int = 10
    # Oversized-cluster splitting method.  "hybrid" (default) sends only
    # clusters above 64 colors to device k-means and resolves the tail —
    # thousands of tiny problems whose serial device waves dominated the
    # split stage — with vectorized host PCA median cuts run to limit/margin
    # within the level.  Measured on the FULL Kodak-24 at the standard
    # preset: 34.279 dB @ 2.954 bpp vs "kmeans" at 34.267 dB @ 2.923 bpp
    # (R-D equal) at 2.2x the end-to-end encode speed.  "kmeans" mirrors the
    # reference's recursive KMeans split for every cluster
    # (clustering.py:720-775).  "mediancut" is the all-host variant
    # (recursive binary PCA cuts per cluster — the spiritual upgrade of the
    # reference's luminance-sort fallback, clustering.py:778-801) with ZERO
    # device round trips; it stops at ~the minimal cluster count while the
    # k-means recursion overshoots, so it lands at a lower-rate R-D point
    # for the same quality knob (measured on 128px Lenna: 29.1 dB @ 3.75 bpp
    # / 32 colors vs 33.7 dB @ 5.34 bpp / 100).  All modes satisfy the
    # max_colors_per_cluster law.  Env override: RHCCQ_SPLIT_METHOD.
    split_method: str = "hybrid"
    # Over-provisioning factor for the split cluster count:
    # k = min(max(2, ceil(n*margin / max_colors)), n).  max_colors_per_cluster
    # is a MAX constraint, so margin > 1 never violates the law — it feeds
    # the unevenness of k-means children forward instead of re-splitting them
    # level by level.  Measured (full-res Kodak x6, CPU): margin 2-3 sits
    # +0.7-1.0 dB ABOVE the margin-1 R-D curve at matched rate AND cuts the
    # split recursion to ~1-2 levels (fewer serial device waves, faster).
    # Margin ladder with the hybrid split, refinement OFF (6 full-res
    # Kodak): 1.5 = 33.32 dB @ 3.254 bpp, 2.0 = 34.56 @ 3.526, 2.5 = 34.91
    # @ 3.714 — there the 1.5->2.0 step earns 4.6 dB/bpp and 2.0 wins.
    # WITH the default palette refinement chain the calculus flips: the
    # refined palette recovers most of what the extra split colors bought,
    # so margin 1.5 + refine-2 measures 35.26 dB @ 3.105 bpp on full
    # Kodak-24 vs 36.16 @ 3.501 for margin 2.0 + refine-2 — a 2.27 dB/bpp
    # marginal slope, BELOW the ~2.6 dB/bpp quality-ladder slope (and
    # 1.5 + refine-2 dominates the old margin-2.0 no-refine default on
    # PSNR, SSIM and rate simultaneously, RD_REFINE.json).  Default 1.5;
    # env override: RHCCQ_SPLIT_MARGIN.
    split_margin: float = 1.5
    # Weight the oversized-split k-means by per-color PIXEL counts (weighted
    # ++ sampling and Lloyd updates) so split PARTITIONS minimize pixel-level
    # MSE instead of palette-entry MSE.  The reference splits palette entries
    # unweighted (clustering.py:720-775).  Measured (256px Kodak crops x4,
    # CPU): ~neutral — -0.03 dB at -0.27% bpp — because the final cluster
    # COLORS are already pixel-weighted means (weighted_palette); kept as an
    # opt-in experiment knob.  Env override: RHCCQ_WEIGHTED_SPLIT=0/1.
    weighted_split: bool = False
    # Global palette refinement: Lloyd iterations of the FINAL palette
    # against the tier-1 (color, pixel-mass) table (models/refine.py) —
    # exactly the pixel-level MSE objective by the bias-variance split, at
    # cluster-table cost and zero device launches.  The reference has no
    # counterpart (its tiers emit the merge result directly,
    # encoder/compression/image.py:243-350); reference-parity configs pin 0.
    # Skipped when fill_black_holes > 0 (hole filling paints colors at
    # pixels whose tier-1 color is background-black, which refinement would
    # repaint).  Default 2: the 2nd iteration adds +0.09 dB at +0.006 bpp
    # over 1 and further iterations measure ~0 (RD_REFINE.json); the whole
    # chain is host table-Lloyd — microseconds against the encode.  Env
    # override: RHCCQ_PALETTE_REFINE.
    palette_refine_iters: int = 2
    # Zero-rate palette refit: ONE exact weighted-mean update of each final
    # palette entry against the ORIGINAL pixels at fixed indices
    # (models/refine.py:refit_pixels).  The index stream is untouched, so
    # the rate is identical up to DEFLATE noise on the palette bytes, and
    # the MSE strictly decreases: tier-1 cluster colors are rounded /
    # black-repaired means, so each final entry carries a residual bias
    # that one centroid step at the pixel level removes.  Measured (8
    # Kodak, split_margin=1.5): +0.27 dB at identical bpp on the base
    # pipeline, +0.10 dB on top of palette_refine_iters=2 (RD_REFINE.json).
    # The reference has no counterpart; reference-parity configs pin False.
    # Skipped when fill_black_holes > 0 (filled pixels diverge from the
    # original).  Env override: RHCCQ_PALETTE_REFIT=0/1.
    palette_refit: bool = True

    @classmethod
    def low_latency(cls, **overrides) -> "CodecConfig":
        """Interactive preset: minimize serial device round trips per image.

        fast_edges skips the 20-candidate Canny sweep (the reference's own
        fast mode, edges.py:210-299); split_margin=3.0 collapses the split
        recursion to ~1-2 levels of serial device waves while sitting ABOVE
        the default R-D curve (RD_SPLIT_METHODS.json; mediancut would remove
        the remaining waves entirely but costs several dB at this rate);
        container_level=7 is ~5x faster entropy coding at +5% file size.
        Quality-critical work (eps-CC clustering, SLIC, split score) is
        untouched.
        """
        base = dict(
            fast_edges=True, split_margin=3.0, container_level=7
        )
        base.update(overrides)
        return cls(**base)

    @property
    def roi_tier2_quality(self) -> float:
        return tier2_quality(self.roi_quality)

    @property
    def nonroi_tier2_quality(self) -> float:
        return tier2_quality(self.nonroi_quality)

    @property
    def image_quality(self) -> float:
        return tier3_quality(self.roi_tier2_quality, self.nonroi_tier2_quality)
