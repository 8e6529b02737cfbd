"""Device kernels (JAX/XLA/Pallas) — the codec's native-op surface.

Each module replaces one family of the reference's external native kernels
(SURVEY.md §2.7); import them directly:

    from roibasedimagecompression_tpu.ops import canny, cc, clahe, cluster, \
        colors, contours, conv, distance, hist, lbp, metrics, morphology, \
        slic, thinning, unique, bilateral
"""
