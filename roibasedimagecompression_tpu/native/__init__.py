"""ctypes bindings for the native host runtime (rhccq_native.cpp).

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a NumPy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "rhccq_native.cpp")


def _lib_path() -> str:
    # The library name carries a source-content hash: dlopen caches by path
    # within a process, so rebuilding to a FIXED path leaves any live process
    # (e.g. the warm TPU experiment worker) bound to the stale mapping even
    # after a module reload.  A content-addressed name makes a reload pick up
    # the fresh build.
    import hashlib

    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"librhccq_native-{h}.so")


_LIB_PATH = _lib_path()
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        # A silent failure here would flip the codec onto the (slower, not
        # byte-identical) device/NumPy fallbacks with no signal — warn once
        # with the compiler stderr so environment regressions are diagnosable.
        import warnings

        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = ": " + e.stderr.decode(errors="replace")[:500]
        warnings.warn(
            f"rhccq native runtime build failed ({type(e).__name__}{detail}); "
            "falling back to device/NumPy paths (slower, and encode bytes may "
            "differ from the native backend)",
            RuntimeWarning,
        )
        return False


def get_lib():
    """The loaded shared library, or None when unavailable.

    RHCCQ_NATIVE=0 disables it (every entry point has a NumPy/device
    fallback) — used to isolate host-runtime issues.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        if os.environ.get("RHCCQ_NATIVE") == "0":
            _tried = True
            return None
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rle_encode_u16.restype = ctypes.c_int64
        lib.rle_encode_u16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.rle_decode_u16.restype = ctypes.c_int64
        lib.rle_decode_u16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.cc_label.restype = ctypes.c_int32
        lib.cc_label.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.cc_label_means.restype = None
        lib.cc_label_means.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.slic_enforce.restype = ctypes.c_int32
        lib.slic_enforce.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.roi_pipeline.restype = None
        lib.roi_pipeline.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.roi_pipeline_pre.restype = None
        lib.roi_pipeline_pre.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.canny_analysis.restype = None
        lib.canny_analysis.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.gradient_nms_rgb.restype = None
        lib.gradient_nms_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.sort_unique_inverse.restype = ctypes.c_int64
        lib.sort_unique_inverse.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.argsort_i64.restype = None
        lib.argsort_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pack_pairs.restype = ctypes.c_int64
        lib.pack_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.component_stats.restype = None
        lib.component_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.cluster_means_u8.restype = None
        lib.cluster_means_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.black_repair_pairs.restype = ctypes.c_int64
        lib.black_repair_pairs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pack_sel.restype = ctypes.c_int64
        lib.pack_sel.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.paint_masked_colors.restype = None
        lib.paint_masked_colors.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.paint_masked_indices.restype = None
        lib.paint_masked_indices.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.epscc_grid_labels.restype = None
        lib.epscc_grid_labels.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.score_candidates.restype = ctypes.c_int32
        lib.score_candidates.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.unpack_pair_table_u32.restype = None
        lib.unpack_pair_table_u32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.unpack_pair_table_i32.restype = None
        lib.unpack_pair_table_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.split_pair_uniq.restype = None
        lib.split_pair_uniq.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.runs_of_sorted_i64.restype = ctypes.c_int64
        lib.runs_of_sorted_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.flat_run_positions.restype = None
        lib.flat_run_positions.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def rle_encode(indices: np.ndarray) -> np.ndarray:
    """(n,) uint16 -> (pairs, 2) uint16 [(value, run)] with runs <= 65535."""
    flat = np.ascontiguousarray(indices, dtype=np.uint16).reshape(-1)
    lib = get_lib()
    if lib is not None:
        out = np.empty((flat.size or 1, 2), np.uint16)
        n_pairs = lib.rle_encode_u16(
            flat.ctypes.data, flat.size, out.ctypes.data
        )
        return out[:n_pairs].copy()
    # NumPy fallback: split runs at value changes and at the 65535 cap.
    if flat.size == 0:
        return np.empty((0, 2), np.uint16)
    change = np.flatnonzero(np.diff(flat)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [flat.size]])
    values, runs = [], []
    for s, e in zip(starts, ends):
        run = e - s
        while run > 65535:
            values.append(flat[s])
            runs.append(65535)
            run -= 65535
        values.append(flat[s])
        runs.append(run)
    return np.stack([np.asarray(values, np.uint16), np.asarray(runs, np.uint16)], 1)


def rle_decode(pairs: np.ndarray, total: int) -> np.ndarray:
    """(pairs, 2) uint16 -> (total,) uint16."""
    pairs = np.ascontiguousarray(pairs, dtype=np.uint16).reshape(-1, 2)
    lib = get_lib()
    if lib is not None:
        out = np.empty(total, np.uint16)
        n = lib.rle_decode_u16(
            pairs.ctypes.data, pairs.shape[0], out.ctypes.data, total
        )
        if n < 0:
            raise ValueError("RLE stream longer than declared size")
        return out[:n].copy()
    return np.repeat(pairs[:, 0], pairs[:, 1])[:total]


def canny_analysis(image_rgb: np.ndarray):
    """Native adaptive-Canny analysis for threshold selection.

    Returns (gray u8 (h, w), mag int32 (h, w), nms bool (h, w),
    cands f32 (20, 2)) or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(image_rgb, dtype=np.uint8)
    h, w = img.shape[:2]
    if h * w >= 2**31:
        return None
    gray = np.empty((h, w), np.uint8)
    mag = np.empty((h, w), np.int32)
    nms = np.empty((h, w), np.uint8)
    cands = np.empty((20, 2), np.float32)
    lib.canny_analysis(
        img.ctypes.data, h, w, gray.ctypes.data, mag.ctypes.data,
        nms.ctypes.data, cands.ctypes.data,
    )
    return gray, mag, nms.astype(bool), cands


def score_candidates(gray: np.ndarray, mag: np.ndarray, nms: np.ndarray,
                     cands: np.ndarray):
    """Best (low, high) candidate index via the one-call native scorer.

    Returns int index or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    g = np.ascontiguousarray(gray, dtype=np.uint8)
    m = np.ascontiguousarray(mag, dtype=np.int32)
    nm = np.ascontiguousarray(nms != 0, dtype=np.uint8)
    c = np.ascontiguousarray(cands, dtype=np.float32)
    h, w = g.shape
    if h * w >= 2**31:
        return None
    return int(
        lib.score_candidates(
            g.ctypes.data, m.ctypes.data, nm.ctypes.data, h, w,
            c.ctypes.data, c.shape[0],
        )
    )


def gradient_nms_rgb(image_rgb: np.ndarray):
    """Color gradient/NMS (cv2.Canny semantics) -> (mag int32, nms bool)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(image_rgb, dtype=np.uint8)
    h, w = img.shape[:2]
    if h * w >= 2**31:
        return None
    mag = np.empty((h, w), np.int32)
    nms = np.empty((h, w), np.uint8)
    lib.gradient_nms_rgb(img.ctypes.data, h, w, mag.ctypes.data, nms.ctypes.data)
    return mag, nms.astype(bool)


def roi_pipeline(image_rgb: np.ndarray, low: float, high: float, rc,
                 pre=None):
    """Native ROI mask pipeline (roi_masks_device semantics, host C++).

    image_rgb: (h, w, 3) uint8; rc: config.RoiConfig; pre: optional
    (mag int32, nms bool) gradient/NMS already computed by canny_analysis
    during threshold selection — skips the pipeline's own gradient pass
    (the image's heaviest single native stage).
    Returns (roi_mask, nonroi_mask) bool arrays, or None when the native
    library is unavailable (callers fall back to the device graph).
    """
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(image_rgb, dtype=np.uint8)
    h, w = img.shape[:2]
    if h * w >= 2**31:
        return None
    ip = np.asarray(
        [
            rc.density_kernel, rc.thin_window, rc.thin_min_region_size,
            rc.noise_min_size, rc.noise_window, rc.close_distance,
            rc.bridge1_max_gap, rc.bridge_local_window,
            rc.bridge_regional_window, rc.border_protect_kernel,
            rc.bridge2_max_gap, rc.fill_min_hole, rc.fill_max_hole,
            rc.clean_min_size, rc.buffer_size,
        ],
        np.int32,
    )
    fp = np.asarray(
        [
            low, high, rc.thin_density_threshold, rc.thin_thinness_threshold,
            rc.noise_density_threshold, rc.bridge1_density,
            rc.border_sensitivity,
        ],
        np.float32,
    )
    roi = np.empty((h, w), np.uint8)
    nonroi = np.empty((h, w), np.uint8)
    if pre is not None:
        mag = np.ascontiguousarray(pre[0], np.int32)
        nms = np.ascontiguousarray(pre[1], np.uint8)
        lib.roi_pipeline_pre(
            img.ctypes.data, h, w, ip.ctypes.data, fp.ctypes.data,
            mag.ctypes.data, nms.ctypes.data,
            roi.ctypes.data, nonroi.ctypes.data,
        )
    else:
        lib.roi_pipeline(
            img.ctypes.data, h, w, ip.ctypes.data, fp.ctypes.data,
            roi.ctypes.data, nonroi.ctypes.data,
        )
    return roi.astype(bool), nonroi.astype(bool)


def slic_enforce(assign: np.ndarray, mask: np.ndarray, min_size: int):
    """SLIC connectivity enforcement (fragment CC + BFS adoption).

    assign: (h, w) int32 segment ids; mask: (h, w) bool.
    Returns (h, w) int32 adopted fragment ids (-1 outside mask), or None when
    the native library is unavailable (callers fall back to the device path).
    """
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(assign, dtype=np.int32)
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8)
    if a.size >= 2**31:
        return None
    h, w = a.shape
    out = np.empty((h, w), np.int32)
    lib.slic_enforce(
        a.ctypes.data, m.ctypes.data, h, w, int(min_size), out.ctypes.data
    )
    return out


def pack_pairs(image_rgb: np.ndarray, seg_map: np.ndarray):
    """Tier-1 (segment, color) pair table in one native pass.

    image_rgb: (..., 3) uint8; seg_map: same leading shape, int32.
    Returns (uniq_keys int64 (m,), inverse int64 (n_masked,), counts int64
    (m,)) where inverse indexes pairs per seg>0 pixel in row-major order —
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(image_rgb, dtype=np.uint8).reshape(-1, 3)
    seg = np.ascontiguousarray(seg_map, dtype=np.int32).reshape(-1)
    n = seg.size
    # The native pass writes <= n_masked entries into each output, so size
    # the buffers to the masked-pixel count (full-n int64 triples were a
    # ~0.5 GB transient on the 22 MP path).
    n_masked = int(np.count_nonzero(seg > 0))
    if n_masked == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy()
    uniq = np.empty(n_masked, np.int64)
    inverse = np.empty(n_masked, np.int64)
    counts = np.empty(n_masked, np.int64)
    m = lib.pack_pairs(
        rgb.ctypes.data, seg.ctypes.data, n,
        uniq.ctypes.data, inverse.ctypes.data, counts.ctypes.data,
    )
    return uniq[:m].copy(), inverse, counts[:m].copy()


def black_repair_pairs(uniq: np.ndarray, counts: np.ndarray,
                       inverse: np.ndarray | None,
                       return_remap: bool = False):
    """Per-segment black repair on a sorted unique pair table, in place.

    uniq/counts: (m,) int64 sorted seg<<24|rgb keys + pixel counts;
    inverse: (n_masked,) int64 pair ids, or None to repair the table only
    (the device-pair path keeps per-pixel state on device and applies the
    remap there).  Black pairs in segments with non-black colors remap to
    the segment's darkest non-black pair (counts fold into the target); the
    table compacts in place and inverse (when given) is rewritten.  Returns
    the compacted pair count — (count, remap) with return_remap — or None
    when the native library is unavailable (callers run the NumPy repair
    instead).
    """
    lib = get_lib()
    if lib is None:
        return None
    assert uniq.dtype == np.int64 and uniq.flags.c_contiguous
    assert counts.dtype == np.int64 and counts.flags.c_contiguous
    if inverse is None:
        inv_ptr, inv_size = None, 0
    else:
        assert inverse.dtype == np.int64 and inverse.flags.c_contiguous
        inv_ptr, inv_size = inverse.ctypes.data, inverse.size
    remap = np.empty(len(uniq), np.int64)
    m = int(
        lib.black_repair_pairs(
            uniq.ctypes.data, counts.ctypes.data, len(uniq),
            inv_ptr, inv_size, remap.ctypes.data,
        )
    )
    if return_remap:
        return m, remap
    return m


def unpack_pair_table(table: np.ndarray):
    """One-pass unpack of a device pair-table download into (uniq int64,
    counts int64) — the pack_pairs key layout.  table is either the packed
    (n, 2) uint32/int32 form (a = seg<<16 | count_lo16, b = count_hi8<<24 |
    col24) or the wide (n, 3) int32 [seg, col, count] form.  Returns None
    when the native library is unavailable (callers keep the NumPy chain).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(table)
    uniq = np.empty(n, np.int64)
    counts = np.empty(n, np.int64)
    t = np.ascontiguousarray(table)
    if t.shape[1] == 2:
        lib.unpack_pair_table_u32(
            t.ctypes.data, n, uniq.ctypes.data, counts.ctypes.data
        )
    else:
        lib.unpack_pair_table_i32(
            t.ctypes.data, n, uniq.ctypes.data, counts.ctypes.data
        )
    return uniq, counts


def split_pair_uniq(uniq: np.ndarray):
    """(seg int32, col int32, colors float32 (m, 3)) from sorted pair keys in
    one native pass; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    u = np.ascontiguousarray(uniq, dtype=np.int64)
    m = len(u)
    seg = np.empty(m, np.int32)
    col = np.empty(m, np.int32)
    colors = np.empty((m, 3), np.float32)
    lib.split_pair_uniq(
        u.ctypes.data, m, seg.ctypes.data, col.ctypes.data, colors.ctypes.data
    )
    return seg, col, colors


def component_stats(labels: np.ndarray, num_labels: int):
    """Per-label (areas int64, bboxes int32 (minr,minc,maxr+1,maxc+1)) in one
    native pass; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lb = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = lb.shape
    areas = np.empty(num_labels, np.int64)
    bboxes = np.empty((num_labels, 4), np.int32)
    lib.component_stats(
        lb.ctypes.data, h, w, int(num_labels),
        areas.ctypes.data, bboxes.ctypes.data,
    )
    return areas, bboxes


def cluster_means_u8(cluster_of_pair: np.ndarray, colors_packed: np.ndarray,
                     weights, n_clusters: int):
    """Weighted per-cluster mean colors truncated to uint8 — bit-identical to
    the NumPy bincount/divide/astype chain (same accumulation order).
    Returns (n_clusters, 3) uint8, or None when the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    cl = np.ascontiguousarray(cluster_of_pair, dtype=np.int64)
    co = np.ascontiguousarray(colors_packed, dtype=np.int32)
    w = None
    if weights is not None:
        w = np.ascontiguousarray(weights, dtype=np.float64)
    out = np.empty((n_clusters, 3), np.uint8)
    lib.cluster_means_u8(
        cl.ctypes.data, co.ctypes.data,
        w.ctypes.data if w is not None else None,
        cl.size, int(n_clusters), out.ctypes.data,
    )
    return out


def paint_masked_colors(table: np.ndarray, idx1, inverse: np.ndarray,
                        mask: np.ndarray, out: np.ndarray) -> bool:
    """out[mask] = table[idx1[inverse]] (or table[inverse] when idx1 is None),
    in row-major mask order, writing in place.  Returns False when the native
    library is unavailable (callers fall back to NumPy fancy indexing).
    """
    lib = get_lib()
    if lib is None:
        return False
    t = np.ascontiguousarray(table, dtype=np.uint8)
    inv = np.ascontiguousarray(inverse, dtype=np.int64)
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8).reshape(-1)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    assert out.size == m.size * 3
    i1 = None
    if idx1 is not None:
        i1 = np.ascontiguousarray(idx1, dtype=np.int64)
    lib.paint_masked_colors(
        t.ctypes.data, i1.ctypes.data if i1 is not None else None,
        inv.ctypes.data, m.ctypes.data, m.size, out.ctypes.data,
    )
    return True


def paint_masked_indices(idx_of_pair: np.ndarray, inverse: np.ndarray,
                         mask: np.ndarray, out: np.ndarray) -> bool:
    """out[mask] = idx_of_pair[inverse] in row-major mask order, writing in
    place into a 1/2/4-byte unsigned index canvas (the container's minimal
    dtype).  Returns False when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return False
    idx = np.ascontiguousarray(idx_of_pair, dtype=np.int32)
    inv = np.ascontiguousarray(inverse, dtype=np.int64)
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8).reshape(-1)
    assert out.flags.c_contiguous and out.size == m.size
    assert out.dtype.itemsize in (1, 2, 4)
    lib.paint_masked_indices(
        idx.ctypes.data, inv.ctypes.data, m.ctypes.data, m.size,
        out.dtype.itemsize, out.ctypes.data,
    )
    return True


def pack_sel_keys(colors: np.ndarray, sel: np.ndarray, tag: int,
                  out: np.ndarray, offset: int):
    """Write tag<<24|rgb keys for sel pixels into out[offset:], row-major.

    Returns the number written, or None when the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(colors, dtype=np.uint8).reshape(-1, 3)
    s = np.ascontiguousarray(sel, dtype=np.uint8).reshape(-1)
    assert out.dtype == np.int64 and out.flags.c_contiguous
    return int(
        lib.pack_sel(
            c.ctypes.data, s.ctypes.data, s.size, int(tag),
            out.ctypes.data + offset * 8,
        )
    )


def epscc_labels_runs(
    colors_packed: np.ndarray,
    starts: np.ndarray,
    sizes: np.ndarray,
    eps: np.ndarray,
) -> np.ndarray | None:
    """Exact eps-CC labels for many palette runs via grid union-find.

    Each run r is colors_packed[starts[r] : starts[r]+sizes[r]] (0xRRGGBB
    int32 rows of the sorted pair table); eps[r] is the DBSCAN radius.
    Returns run-major concatenated int32 labels (run-local minimum member
    index per component — identical to ops/cluster.eps_components), or None
    without the native library.  Reference law: DBSCAN(eps, min_samples=1)
    == single-linkage eps-graph components
    (encoder/compression/clustering.py:233-235).
    """
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int64)
    # Square in float32 to mirror the device predicate (d2_f32 <= eps2_f32).
    eps2 = np.ascontiguousarray(eps, np.float32) ** 2
    colors_packed = np.ascontiguousarray(colors_packed, np.int32)
    labels = np.empty(int(sizes.sum()), np.int32)
    lib.epscc_grid_labels(
        colors_packed.ctypes.data, starts.ctypes.data, sizes.ctypes.data,
        eps2.ctypes.data, len(starts), labels.ctypes.data,
    )
    return labels


def argsort_i64(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of int64 keys via radix sort; np.argsort fallback."""
    flat = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
    lib = get_lib()
    if lib is None or flat.size == 0:
        return np.argsort(flat, kind="stable")
    order = np.empty(flat.size, np.int64)
    lib.argsort_i64(flat.ctypes.data, flat.size, order.ctypes.data)
    return order


def unique_inverse_i64(keys: np.ndarray, return_counts: bool = False):
    """np.unique(keys, return_inverse=True[, return_counts]) for int64 keys
    via native radix sort; falls back to np.unique without the library."""
    flat = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
    lib = get_lib()
    if lib is None or flat.size == 0:
        out = np.unique(flat, return_inverse=True, return_counts=return_counts)
        return out if return_counts else (out[0], out[1])
    uniq = np.empty(flat.size, np.int64)
    inverse = np.empty(flat.size, np.int64)
    counts = np.empty(flat.size, np.int64) if return_counts else None
    m = lib.sort_unique_inverse(
        flat.ctypes.data, flat.size, uniq.ctypes.data, inverse.ctypes.data,
        counts.ctypes.data if return_counts else None,
    )
    if return_counts:
        return uniq[:m].copy(), inverse, counts[:m].copy()
    return uniq[:m].copy(), inverse


def runs_of_sorted_i64(sorted_arr: np.ndarray):
    """(values, starts, sizes) of equal runs in an already-sorted int64 array
    — one native pass instead of the diff/flatnonzero/diff/concat chain."""
    flat = np.ascontiguousarray(sorted_arr, dtype=np.int64).reshape(-1)
    if flat.size == 0:
        return flat, np.zeros(0, np.int64), np.zeros(0, np.int64)
    lib = get_lib()
    if lib is None:
        starts = np.concatenate([[0], np.flatnonzero(np.diff(flat)) + 1])
        sizes = np.diff(np.concatenate([starts, [flat.size]]))
        return flat[starts], starts, sizes
    starts = np.empty(flat.size, np.int64)
    sizes = np.empty(flat.size, np.int64)
    m = lib.runs_of_sorted_i64(
        flat.ctypes.data, flat.size, starts.ctypes.data, sizes.ctypes.data,
    )
    starts = starts[:m].copy()
    return flat[starts], starts, sizes[:m].copy()


def flat_run_positions(starts: np.ndarray, sizes: np.ndarray):
    """(pos, row, within) enumerating every element of m runs — one native
    pass instead of three np.repeat passes plus an arange."""
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    total = int(sizes.sum())
    lib = get_lib()
    if lib is None or total == 0:
        off = np.zeros(len(sizes), np.int64)
        np.cumsum(sizes[:-1], out=off[1:])
        row = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        within = np.arange(total, dtype=np.int64) - np.repeat(off, sizes)
        pos = np.repeat(starts, sizes) + within
        return pos, row, within
    pos = np.empty(total, np.int64)
    row = np.empty(total, np.int64)
    within = np.empty(total, np.int64)
    lib.flat_run_positions(
        starts.ctypes.data, sizes.ctypes.data, len(sizes),
        pos.ctypes.data, row.ctypes.data, within.ctypes.data,
    )
    return pos, row, within


# ---------------------------------------------------------------------------
# libdeflate-backed zlib streams (system library, ctypes-bound).
#
# libdeflate emits standard RFC 1950 zlib streams — byte-different from
# zlib's own output but decodable by any zlib inflater (including the
# reference decoder, uncompression.py:58-127) — at ~4x zlib-9 compression
# speed, and at levels 10-12 a slightly BETTER ratio than zlib-9.  Python's
# zlib module is the universal fallback.
# ---------------------------------------------------------------------------

_ld_lock = threading.Lock()
_ld = None
_ld_tried = False


def _libdeflate():
    global _ld, _ld_tried
    with _ld_lock:
        if _ld is not None or _ld_tried:
            return _ld
        _ld_tried = True
        for name in ("libdeflate.so.0", "libdeflate.so", "libdeflate.so.1"):
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError:
                lib = None
        if lib is None:
            return None
        lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
        lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
        lib.libdeflate_free_compressor.argtypes = [ctypes.c_void_p]
        lib.libdeflate_zlib_compress_bound.restype = ctypes.c_size_t
        lib.libdeflate_zlib_compress_bound.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.libdeflate_zlib_compress.restype = ctypes.c_size_t
        lib.libdeflate_zlib_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
        lib.libdeflate_free_decompressor.argtypes = [ctypes.c_void_p]
        lib.libdeflate_zlib_decompress.restype = ctypes.c_int
        lib.libdeflate_zlib_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ]
        _ld = lib
        return _ld


def zlib_compress_fast(data, level: int = 12) -> bytes:
    """zlib-format compression via libdeflate (levels 1-12); zlib fallback.

    Output is a standard zlib stream: any inflater decodes it.  Not
    byte-identical to zlib.compress — use io.container's legacy entropy mode
    when byte-level writer parity with the reference matters.
    """
    import zlib as _z

    lib = _libdeflate()
    buf = bytes(data) if not isinstance(data, (bytes, bytearray, memoryview)) else data
    if lib is None:
        return _z.compress(bytes(buf), min(int(level), 9))
    n = len(buf)
    comp = lib.libdeflate_alloc_compressor(int(level))
    if not comp:
        return _z.compress(bytes(buf), min(int(level), 9))
    try:
        bound = lib.libdeflate_zlib_compress_bound(comp, n)
        out = ctypes.create_string_buffer(bound)
        src = (ctypes.c_char * n).from_buffer_copy(buf) if n else None
        m = lib.libdeflate_zlib_compress(
            comp, src, n, out, bound
        )
        if m == 0:
            return _z.compress(bytes(buf), min(int(level), 9))
        return out.raw[:m]
    finally:
        lib.libdeflate_free_compressor(comp)


def zlib_decompress_fast(data: bytes, out_size: int | None = None) -> bytes:
    """zlib-format decompression via libdeflate; zlib fallback.

    out_size is the exact decompressed size when known (container fields
    carry it implicitly); when None, the buffer grows geometrically from an
    initial guess until libdeflate stops reporting INSUFFICIENT_SPACE (3).
    """
    import zlib as _z

    lib = _libdeflate()
    if lib is None:
        return _z.decompress(data)
    n = len(data)
    dec = lib.libdeflate_alloc_decompressor()
    if not dec:
        return _z.decompress(data)
    try:
        src = (ctypes.c_char * n).from_buffer_copy(data) if n else None
        cap = int(out_size) if out_size else max(4 * n, 1 << 16)
        actual = ctypes.c_size_t(0)
        for _ in range(8):
            out = ctypes.create_string_buffer(cap)
            rc = lib.libdeflate_zlib_decompress(
                dec, src, n, out, cap, ctypes.byref(actual)
            )
            if rc == 0:
                if out_size is not None and actual.value != out_size:
                    raise ValueError(
                        f"zlib stream decoded to {actual.value} bytes, "
                        f"expected {out_size}"
                    )
                return out.raw[: actual.value]
            if rc == 3 and out_size is None:  # INSUFFICIENT_SPACE: grow
                cap *= 4
                continue
            raise ValueError(f"bad zlib stream (libdeflate rc={rc})")
        return _z.decompress(data)
    finally:
        lib.libdeflate_free_decompressor(dec)


def cc_label(mask: np.ndarray, connectivity: int = 8):
    """Union-find CCL: (labels int32 0=bg/1..n, num_fg_labels, stats or None).

    stats: (n, 5) int64 [area, minr, minc, maxr_excl, maxc_excl].
    """
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8)
    if m.size >= 2**31:
        # The union-find parents are int32 flat pixel indices; larger images
        # must use the device path.
        return None
    lib = get_lib()
    if lib is None:
        return None
    h, w = m.shape
    labels = np.empty((h, w), np.int32)
    stats = np.empty((max(h * w // 2 + 1, 1), 5), np.int64)
    n = lib.cc_label(
        m.ctypes.data, h, w, connectivity, labels.ctypes.data, stats.ctypes.data
    )
    return labels, int(n), stats[:n].copy()
