// Host-side native runtime for the rhccq codec.
//
// The TPU owns the compute path (JAX/XLA/Pallas); these are the host-side hot
// loops around it, mirroring where the reference leaned on native code inside
// its dependencies (SURVEY.md §2.7):
//   - RLE (value,run) u16 codec for the container's alternative entropy mode
//     (encoder/compression/compression.py:25-66 runs this per-element in
//     Python; decoder/uncompression/uncompression.py:27-53 decodes it)
//   - union-find connected-components labeling with stats, the low-latency
//     host alternative to the device label-propagation kernel for
//     single-image encodes (cv2.connectedComponentsWithStats call sites)
//
// Built as a plain shared library; Python binds via ctypes (no pybind11).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE u16 codec: pairs of (value, run) with run capped at 65535.
// ---------------------------------------------------------------------------

// Returns number of u16 PAIRS written (out must hold 2*n u16 worst case).
int64_t rle_encode_u16(const uint16_t* in, int64_t n, uint16_t* out) {
  if (n <= 0) return 0;
  int64_t pairs = 0;
  uint16_t value = in[0];
  uint32_t run = 1;
  for (int64_t i = 1; i < n; ++i) {
    if (in[i] == value && run < 65535u) {
      ++run;
    } else {
      out[2 * pairs] = value;
      out[2 * pairs + 1] = static_cast<uint16_t>(run);
      ++pairs;
      value = in[i];
      run = 1;
    }
  }
  out[2 * pairs] = value;
  out[2 * pairs + 1] = static_cast<uint16_t>(run);
  return pairs + 1;
}

// Returns number of values written, or -1 if it would exceed capacity.
int64_t rle_decode_u16(const uint16_t* pairs, int64_t n_pairs, uint16_t* out,
                       int64_t capacity) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n_pairs; ++i) {
    const uint16_t value = pairs[2 * i];
    const uint32_t run = pairs[2 * i + 1];
    if (pos + static_cast<int64_t>(run) > capacity) return -1;
    for (uint32_t j = 0; j < run; ++j) out[pos++] = value;
  }
  return pos;
}

// ---------------------------------------------------------------------------
// Union-find connected components (4- or 8-connectivity) with stats.
// ---------------------------------------------------------------------------

namespace {
inline int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
  int32_t root = x;
  while (parent[root] != root) root = parent[root];
  while (parent[x] != root) {
    int32_t next = parent[x];
    parent[x] = root;
    x = next;
  }
  return root;
}

inline void uf_union(std::vector<int32_t>& parent, int32_t a, int32_t b) {
  const int32_t ra = uf_find(parent, a);
  const int32_t rb = uf_find(parent, b);
  if (ra != rb) parent[ra < rb ? rb : ra] = ra < rb ? ra : rb;
}
}  // namespace

// labels: out int32 (h*w), 0 = background, 1..num compact.
// stats_out (optional, may be null): int64 per label (1-indexed), layout
// [area, minr, minc, maxr_excl, maxc_excl] * num_labels.
// Returns number of foreground labels.
int32_t cc_label(const uint8_t* mask, int32_t h, int32_t w, int32_t conn,
                 int32_t* labels, int64_t* stats_out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);

  // First pass: union with already-visited neighbors (left, up, and for
  // 8-connectivity the two upper diagonals).
  for (int32_t r = 0; r < h; ++r) {
    const int64_t row = static_cast<int64_t>(r) * w;
    for (int32_t c = 0; c < w; ++c) {
      const int64_t i = row + c;
      if (!mask[i]) continue;
      if (c > 0 && mask[i - 1]) uf_union(parent, i, i - 1);
      if (r > 0) {
        if (mask[i - w]) uf_union(parent, i, i - w);
        if (conn == 8) {
          if (c > 0 && mask[i - w - 1]) uf_union(parent, i, i - w - 1);
          if (c + 1 < w && mask[i - w + 1]) uf_union(parent, i, i - w + 1);
        }
      }
    }
  }

  // Second pass: compact label ids in root-first-seen (scan) order.
  std::vector<int32_t> compact(n, 0);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!mask[i]) {
      labels[i] = 0;
      continue;
    }
    const int32_t root = uf_find(parent, static_cast<int32_t>(i));
    if (compact[root] == 0) compact[root] = ++next;
    labels[i] = compact[root];
  }

  if (stats_out) {
    for (int32_t l = 0; l < next; ++l) {
      int64_t* s = stats_out + 5 * l;
      s[0] = 0;
      s[1] = h;
      s[2] = w;
      s[3] = 0;
      s[4] = 0;
    }
    for (int32_t r = 0; r < h; ++r) {
      for (int32_t c = 0; c < w; ++c) {
        const int32_t l = labels[static_cast<int64_t>(r) * w + c];
        if (!l) continue;
        int64_t* s = stats_out + 5 * (l - 1);
        s[0] += 1;
        if (r < s[1]) s[1] = r;
        if (c < s[2]) s[2] = c;
        if (r + 1 > s[3]) s[3] = r + 1;
        if (c + 1 > s[4]) s[4] = c + 1;
      }
    }
  }
  return next;
}

// Mean of a float64 value map per label (for density/distance statistics).
void cc_label_means(const int32_t* labels, const double* values, int64_t n,
                    int32_t num_labels, double* means_out) {
  std::vector<double> sums(num_labels + 1, 0.0);
  std::vector<int64_t> counts(num_labels + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t l = labels[i];
    sums[l] += values[i];
    counts[l] += 1;
  }
  for (int32_t l = 0; l <= num_labels; ++l) {
    means_out[l] = counts[l] ? sums[l] / counts[l] : 0.0;
  }
}

}  // extern "C"
