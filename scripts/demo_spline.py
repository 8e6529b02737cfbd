"""Spline boundary-codec demo driver.

Equivalent of the reference's interpolation demo (encoder/interpolation/
test.py:1-436) which ran the spline codec on a hard-coded 2,379-point
boundary; here the boundary comes from a real image: Otsu-threshold a Kodak
image, take the largest connected region, and trace its contour with the
marching-squares op.  Runs compress -> minimal storage -> reconstruct ->
save/load and writes the full visualization set.

Usage: python scripts/demo_spline.py [--out /tmp/spline_demo] [--image PATH]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_demo_boundary(image_path: str) -> np.ndarray:
    """Largest bright region's longest contour as an (n, 2) float boundary."""
    from roibasedimagecompression_tpu.io import image_io
    from roibasedimagecompression_tpu.ops import contours as CT
    from roibasedimagecompression_tpu import native

    rgb = image_io.imread_rgb(image_path)
    gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])

    # Heavy box blur before thresholding: the spline codec expects a smooth
    # closed boundary (the reference demo used a hand-traced one); a raw
    # pixel-stair contour makes any cubic fit oscillate.
    def box1d(a, k, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (k // 2 + 1, k // 2)
        c = np.cumsum(np.pad(a, pad, mode="edge"), axis=axis)
        return (np.take(c, range(k, k + a.shape[axis]), axis) -
                np.take(c, range(a.shape[axis]), axis)) / k

    for _ in range(3):
        gray = box1d(box1d(gray, 15, 0), 15, 1)
    mask = gray > np.mean(gray)
    lab = native.cc_label(mask, 8)
    if lab is not None:
        labels, n, stats = lab
        biggest = int(np.argmax(stats[:, 0])) + 1
        mask = labels == biggest
    cs = CT.find_contours(mask)
    boundary = max(cs, key=len)
    return np.asarray(boundary, float)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spline_demo")
    ap.add_argument("--image", default="/root/reference/images/png/3.png")
    ap.add_argument("--sublists", type=int, default=6)
    ap.add_argument("--ratio", type=float, default=0.2)
    ap.add_argument(
        "--max-points", type=int, default=1500,
        help="uniform boundary subsample before compression (a raw "
        "marching-squares contour is pixel-jagged; the reference demo "
        "used a smooth hand-traced boundary)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from roibasedimagecompression_tpu.models import spline as SP
    from roibasedimagecompression_tpu.models import spline_viz as SV

    boundary = extract_demo_boundary(args.image)
    print(f"boundary: {len(boundary)} points from {args.image}")
    if len(boundary) > args.max_points:
        take = np.linspace(0, len(boundary) - 1, args.max_points).astype(int)
        boundary = boundary[take]
        print(f"subsampled to {len(boundary)} points")

    result = SP.compress_shape(
        boundary, num_sublists=args.sublists, compression_ratio=args.ratio
    )
    print(SV.compression_analysis(result))
    SV.plot_divided_compression(boundary, result, f"{args.out}/divided.png")

    key_points = SP.minimal_storage(result)
    recon = SP.reconstruct_from_minimal(key_points, num_points=len(boundary))
    SV.plot_minimal_storage(boundary, key_points, recon, f"{args.out}/minimal.png")
    SV.plot_reconstruction_overlay(boundary, key_points, recon, f"{args.out}/overlay.png")
    m = SV.plot_quality_metrics(boundary, recon, f"{args.out}/quality.png")
    print("quality:", {k: round(v, 5) if isinstance(v, float) else v for k, v in m.items()})

    SP.save_key_points(key_points, f"{args.out}/key_points.npy")
    SP.save_key_points(key_points, f"{args.out}/key_points.csv")
    loaded = SP.load_key_points(f"{args.out}/key_points.npy")
    assert np.allclose(loaded, key_points)
    print(f"artifacts in {args.out}: divided.png minimal.png overlay.png "
          f"quality.png key_points.{{npy,csv}}")


if __name__ == "__main__":
    main()
