"""Device-resident (segment, color) pair table.

The reference builds per-segment palettes with a per-pixel Python dict loop
(`get_all_unique_colors`, encoder/compression/clustering.py:4-103).  The
host C++ radix pack (native.pack_pairs) replaced that loop, but it still
burns the single host core in proportion to pixels AND forces the final
index paint through host memory.  Here the whole batch's pair table is
built ON DEVICE:

  1. per-pixel 2-key (segment, packed-color) lexicographic sort
     (jax.lax.sort with an iota payload — no int64 keys needed),
  2. unique flags + cumsum pair ids over the sorted keys,
  3. scatter-compaction of the unique table + per-pair pixel counts.

The host downloads ONLY the compacted table (tens of thousands of rows);
the per-pixel pair ids and the sort permutation stay device-resident so the
final palette-index paint is one device gather + scatter and the download
is the narrow per-pixel index map itself (models/codec.tiers23_palette_
indices).  Measured on the tunneled v5e: 4.2M-pixel sort 35 ms, compaction
50 ms — versus 0.3-0.6 s of host radix pack per 8-image batch.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from roibasedimagecompression_tpu.utils import flops as FLOPS

_SENTINEL = jnp.iinfo(jnp.int32).max


def _pow2(n: int, minimum: int = 1024) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _crop_batch(img_pad: jax.Array, *, h: int, w: int) -> jax.Array:
    return img_pad[:, :h, :w, :]


@jax.jit
def _pair_sort(seg_flat: jax.Array, rgb_flat: jax.Array):
    """Sort (segment, packed color) per pixel; segment 0 sorts last.

    Returns (seg_sorted, col_sorted, perm, new_flags, pair_id_sorted,
    n_pairs, n_valid).  pair_id_sorted is the pair row of each sorted pixel
    (garbage past n_valid, masked by seg_sorted == sentinel).
    """
    n = seg_flat.shape[0]
    col = (
        rgb_flat[:, 0].astype(jnp.int32) * 65536
        + rgb_flat[:, 1].astype(jnp.int32) * 256
        + rgb_flat[:, 2].astype(jnp.int32)
    )
    seg = jnp.where(seg_flat > 0, seg_flat.astype(jnp.int32), _SENTINEL)
    iota = jnp.arange(n, dtype=jnp.int32)
    seg_s, col_s, perm = jax.lax.sort((seg, col, iota), num_keys=2)
    valid = seg_s != _SENTINEL
    new = valid & (
        (seg_s != jnp.roll(seg_s, 1)) | (col_s != jnp.roll(col_s, 1))
    )
    new = new.at[0].set(valid[0])
    pair_id = jnp.cumsum(new.astype(jnp.int32)) - 1
    return (
        seg_s, col_s, perm, new, pair_id,
        jnp.max(pair_id) + 1,
        jnp.sum(valid.astype(jnp.int32)),
    )


def _post_repair_colors(out_seg, out_col, n_pairs, cap):
    """Post-black-repair colors table, on device, from the compacted pairs.

    native.black_repair_pairs drops row i exactly when it is a black pair
    (col == 0, always its segment's FIRST row — the sort key is ascending)
    in a segment with at least one non-black color, then compacts the kept
    rows order-preservingly.  The same predicate + a stable cumsum
    compaction reproduces the host colors table bit-for-bit — so the split
    stage's colors operand never crosses the tunnel (the padded f32 upload
    was ~25 MB/batch; see models/quantize_batched._colors_device).
    """
    rows = jnp.arange(cap, dtype=jnp.int32)
    valid_row = rows < n_pairs
    seg_next = jnp.roll(out_seg, -1)
    drop = (
        valid_row
        & (out_col == 0)
        & (rows + 1 < n_pairs)
        & (seg_next == out_seg)
    )
    keep = valid_row & ~drop
    newpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    cidx = jnp.where(keep, newpos, cap)
    rgb = jnp.stack(
        [(out_col >> 16) & 0xFF, (out_col >> 8) & 0xFF, out_col & 0xFF],
        axis=1,
    ).astype(jnp.uint8)
    return jnp.zeros((cap, 3), jnp.uint8).at[cidx].set(rgb, mode="drop")


@functools.partial(jax.jit, static_argnames=("cap",))
def _pair_compact(seg_s, col_s, new, pair_id, n_valid, n_pairs, *, cap):
    """Compact the flagged unique rows into (cap,) tables + pixel counts.

    Scatter with mode='drop': non-flagged rows target index `cap` (out of
    bounds) and vanish.  counts[j] = start[j+1] - start[j] over the sorted
    run starts, with the tail closed by n_valid.  Also returns the
    POST-repair colors table (kept on device for the split stage).
    """
    idx = jnp.where(new, pair_id, cap)
    out_seg = jnp.zeros(cap, jnp.int32).at[idx].set(seg_s, mode="drop")
    out_col = jnp.zeros(cap, jnp.int32).at[idx].set(col_s, mode="drop")
    pos = jnp.arange(seg_s.shape[0], dtype=jnp.int32)
    # starts has cap+1 entries, so the drop target must be cap+1: index cap
    # IS valid here and a `cap` drop target corrupted the final count
    # exactly when n_pairs == cap (every non-flagged row scattered into the
    # closing boundary).
    idx_starts = jnp.where(new, pair_id, cap + 1)
    starts = jnp.full(cap + 1, n_valid, jnp.int32).at[idx_starts].set(
        pos, mode="drop"
    )
    counts = jnp.diff(starts)
    # One stacked table -> one tunnel transfer (three separate downloads
    # paid the ~24 ms round trip each).
    return (
        jnp.stack([out_seg, out_col, counts], axis=1),
        _post_repair_colors(out_seg, out_col, n_pairs, cap),
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def _pair_compact_packed(seg_s, col_s, new, pair_id, n_valid, n_pairs, *,
                         cap):
    """_pair_compact with the row packed into TWO int32 words (8 B/row vs
    12): a = seg << 16 | count_lo16, b = count_hi8 << 24 | col24.  Valid
    only when seg < 2^16 and every count < 2^24 (caller gates on the pixel
    total); the host unpacks via uint32 views, so the int32 sign bit is
    just a carried bit."""
    idx = jnp.where(new, pair_id, cap)
    out_seg = jnp.zeros(cap, jnp.int32).at[idx].set(seg_s, mode="drop")
    out_col = jnp.zeros(cap, jnp.int32).at[idx].set(col_s, mode="drop")
    pos = jnp.arange(seg_s.shape[0], dtype=jnp.int32)
    idx_starts = jnp.where(new, pair_id, cap + 1)
    starts = jnp.full(cap + 1, n_valid, jnp.int32).at[idx_starts].set(
        pos, mode="drop"
    )
    counts = jnp.diff(starts)
    a = (out_seg << 16) | (counts & 0xFFFF)
    b = ((counts >> 16) << 24) | out_col
    return (
        jnp.stack([a, b], axis=1),
        _post_repair_colors(out_seg, out_col, n_pairs, cap),
    )


@functools.partial(jax.jit, static_argnames=("u8",))
def _paint_indices(perm, pair_id_sorted, seg_s, idx_of_pair, *, u8: bool):
    """Final palette-index paint: one gather + one scatter, all on device."""
    dt = jnp.uint8 if u8 else jnp.uint16
    safe = jnp.where(seg_s != _SENTINEL, pair_id_sorted, 0)
    vals = jnp.where(
        seg_s != _SENTINEL, idx_of_pair[safe], 0
    ).astype(dt)
    out = jnp.zeros(perm.shape[0], dt)
    return out.at[perm].set(vals, unique_indices=True)


@functools.partial(jax.jit, static_argnames=("k_pad", "hw", "b"))
def _refit_sums(perm, pair_id_sorted, seg_s, col_s, idx_of_pair,
                *, k_pad: int, hw: int, b: int):
    """Per-(image, palette-index) pixel counts + exact RGB sums on device.

    The zero-rate palette refit (models/refine.refit_pixels) is a bincount
    of the ORIGINAL pixels at fixed final indices; every input lives on
    device already (sorted colors + the paint's index table), so the host
    bincount chain drops out of the steady state.  int32 accumulation is
    exact (per-bin channel sums <= 255 * hw < 2^31, enforced by the caller),
    hence bit-identical to the host f64-bincount path.  Masked pixels are
    enough: background pixels only map to palette index 0 when the palette's
    first entry is black, which refit freezes (refine.py black law).
    """
    valid = seg_s != _SENTINEL
    safe = jnp.where(valid, pair_id_sorted, 0)
    idx = jnp.where(valid, idx_of_pair[safe].astype(jnp.int32), 0)
    img = perm // hw
    bins = jnp.where(valid, img * k_pad + idx, b * k_pad)
    data = jnp.stack(
        [
            jnp.ones_like(col_s),
            (col_s >> 16) & 0xFF,
            (col_s >> 8) & 0xFF,
            col_s & 0xFF,
        ],
        axis=1,
    )
    out = jnp.zeros((b * k_pad + 1, 4), jnp.int32)
    return out.at[bins].add(data)[:-1]


class DevicePairTable:
    """Pair table built on device; per-pixel state stays device-resident.

    Matches native.pack_pairs output exactly: `uniq` is the sorted
    (seg << 24 | packed_color) int64 table, `counts` the per-pair pixel
    multiplicities.  `paint(idx_of_pair)` replaces the host
    paint_masked_indices pass: it maps every pixel to its pair's final
    palette index on device and downloads only the (b*h*w,) index map.
    """

    def __init__(self, tall_seg: np.ndarray, images_dev=None,
                 tall_img: np.ndarray | None = None,
                 hw: tuple | None = None):
        h2, w = tall_seg.shape
        self.n_pix = h2 * w
        if images_dev is not None:
            # Typically the segment stage's DeviceBatch.img: (b, h+P, w+P, 3)
            # zero-padded — slice back to the true window, zero extra upload.
            if hw is not None and images_dev.shape[1:3] != hw:
                images_dev = _crop_batch(images_dev, h=hw[0], w=hw[1])
            rgb_flat = images_dev.reshape(-1, 3)
        else:
            rgb_flat = jnp.asarray(tall_img.reshape(-1, 3))
        seg_np = tall_seg.reshape(-1).astype(
            np.uint16 if tall_seg.max() < 65536 else np.int32
        )
        # Pad the pixel count to a pow2 bucket: the sort graph compiles once
        # per bucket instead of once per batch size (padding rows carry
        # segment 0 = sentinel, so they sort last and never become pairs).
        n_pad = _pow2(len(seg_np), minimum=1 << 18) - len(seg_np)
        if n_pad:
            seg_np = np.pad(seg_np, (0, n_pad))
            rgb_flat = jnp.pad(rgb_flat, ((0, n_pad), (0, 0)))
        seg_flat = jnp.asarray(seg_np)
        FLOPS.track(_pair_sort, (seg_flat, rgb_flat), {})
        (
            self._seg_s, self._col_s, self._perm, new, self._pair_id,
            n_pairs, n_valid,
        ) = _pair_sort(seg_flat, rgb_flat)
        self.n_pairs = int(n_pairs)
        self.colors_dev = None  # post-repair (cap, 3) u8, device-resident
        if self.n_pairs <= 0:
            self.uniq = np.zeros(0, np.int64)
            self.counts = np.zeros(0, np.int64)
            return
        cap = _pow2(self.n_pairs, minimum=4096)
        seg_max = int(tall_seg.max())
        if self.n_pix < (1 << 24) and seg_max < (1 << 16):
            # Packed 8 B/row download (the 12 B/row table was ~9 MB/batch
            # through the ~30 MB/s tunnel).
            FLOPS.track(
                _pair_compact_packed,
                (self._seg_s, self._col_s, new, self._pair_id, jnp.int32(0),
                 jnp.int32(0)),
                {"cap": cap},
            )
            table, self.colors_dev = _pair_compact_packed(
                self._seg_s, self._col_s, new, self._pair_id, n_valid,
                jnp.int32(self.n_pairs), cap=cap,
            )
            packed = np.asarray(table[: self.n_pairs])
            from roibasedimagecompression_tpu import native

            out = native.unpack_pair_table(packed)
            if out is not None:
                self.uniq, self.counts = out
                return
            packed = packed.view(np.uint32)
            seg = (packed[:, 0] >> 16).astype(np.int64)
            col = (packed[:, 1] & 0xFFFFFF).astype(np.int64)
            self.counts = (
                (packed[:, 0] & 0xFFFF) | ((packed[:, 1] >> 24) << 16)
            ).astype(np.int64)
            self.uniq = (seg << 24) | col
            return
        FLOPS.track(
            _pair_compact,
            (self._seg_s, self._col_s, new, self._pair_id, jnp.int32(0),
             jnp.int32(0)),
            {"cap": cap},
        )
        table, self.colors_dev = _pair_compact(
            self._seg_s, self._col_s, new, self._pair_id, n_valid,
            jnp.int32(self.n_pairs), cap=cap,
        )
        table = np.asarray(table[: self.n_pairs])
        self.counts = table[:, 2].astype(np.int64)
        self.uniq = (table[:, 0].astype(np.int64) << 24) | table[:, 1]

    def paint(self, idx_of_pair: np.ndarray, repair_remap=None,
              refit_bins: tuple | None = None):
        """(n_pix,) final palette indices (uint8 when every index fits).

        idx_of_pair indexes the POST-repair pair table; repair_remap (from
        the black repair) lifts it back to this table's pre-repair rows.

        refit_bins: optional (b, hw, k_pad) — also accumulate the device
        refit table (_refit_sums) and return (indices, (b*k_pad, 4) int32
        [count, sum_r, sum_g, sum_b]); the sums dispatch before the index
        download so the tiny table rides the same device wait.
        """
        if repair_remap is not None:
            idx_of_pair = idx_of_pair[repair_remap]
        mx = int(idx_of_pair.max()) if idx_of_pair.size else 0
        u8 = mx < 256
        pad = _pow2(max(len(idx_of_pair), 1), minimum=4096)
        # Narrowest upload dtype that fits (the pow2-padded int32 table was
        # a 4 MB upload for the 8-image batch; u8 covers the default preset).
        buf = np.zeros(pad, np.uint8 if u8 else (
            np.uint16 if mx < 65536 else np.int32
        ))
        buf[: len(idx_of_pair)] = idx_of_pair
        buf_dev = jnp.asarray(buf)
        FLOPS.track(
            _paint_indices,
            (self._perm, self._pair_id, self._seg_s, buf_dev),
            {"u8": u8},
        )
        out = _paint_indices(
            self._perm, self._pair_id, self._seg_s, buf_dev, u8=u8
        )
        sums = None
        if refit_bins is not None:
            b, hw, k_pad = refit_bins
            FLOPS.track(
                _refit_sums,
                (self._perm, self._pair_id, self._seg_s, self._col_s, buf_dev),
                {"k_pad": k_pad, "hw": hw, "b": b},
            )
            sums = _refit_sums(
                self._perm, self._pair_id, self._seg_s, self._col_s, buf_dev,
                k_pad=k_pad, hw=hw, b=b,
            )
        # Slice off the pow2 sort padding on device; only real pixels
        # cross the tunnel.
        host = np.asarray(out[: self.n_pix])
        if refit_bins is None:
            return host
        return host, np.asarray(sums)
