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

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <utility>
#include <vector>

// Stage timing for roi_pipeline, enabled by RHCCQ_NATIVE_TRACE=1 (perf work
// only; no effect on results).
namespace {
struct StageClock {
  bool on;
  std::chrono::steady_clock::time_point t;
  StageClock() {
    const char* e = std::getenv("RHCCQ_NATIVE_TRACE");
    on = e && e[0] && e[0] != '0';
    t = std::chrono::steady_clock::now();
  }
  void lap(const char* name) {
    if (!on) return;
    auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "[native] %-14s %6.2f ms\n", name,
                 std::chrono::duration<double, std::milli>(now - t).count());
    t = now;
  }
};
}  // namespace

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
// Run-based CCL core: rows decompose into maximal runs of foreground; a
// union-find over RUNS (typically ~n/20 of pixel count) replaces the pixel
// union-find, and every per-pixel pass becomes a per-run fill.  Labels are
// compacted in component-first-seen scan order — identical numbering to a
// pixel-scan union-find (a component's first scanned pixel starts its first
// run).  Fills `runs_*` with per-run geometry and returns the component
// count; labels/stats are written by the callers from the run table.
namespace ccl {

struct Runs {
  std::vector<int32_t> start, end, row, label;  // per run; label is 1-based
};

inline int32_t rfind(std::vector<int32_t>& p, int32_t x) {
  while (p[x] != x) {
    p[x] = p[p[x]];
    x = p[x];
  }
  return x;
}

inline void runion(std::vector<int32_t>& p, int32_t a, int32_t b) {
  a = rfind(p, a);
  b = rfind(p, b);
  if (a != b) p[a < b ? b : a] = a < b ? a : b;
}

inline int32_t label_runs(const uint8_t* mask, int32_t h, int32_t w,
                          int32_t conn, Runs& runs) {
  runs.start.clear();
  runs.end.clear();
  runs.row.clear();
  std::vector<int32_t> parent;
  parent.reserve(1024);
  int32_t prev_begin = 0, prev_end = 0;  // prev row's run index range
  for (int32_t r = 0; r < h; ++r) {
    const uint8_t* m = mask + static_cast<int64_t>(r) * w;
    const int32_t row_begin = static_cast<int32_t>(runs.start.size());
    int32_t p = prev_begin;  // overlap cursor into prev row's runs
    int32_t c = 0;
    while (c < w) {
      while (c < w && !m[c]) ++c;
      if (c >= w) break;
      const int32_t a = c;
      while (c < w && m[c]) ++c;
      const int32_t b = c;  // run [a, b)
      const int32_t id = static_cast<int32_t>(runs.start.size());
      runs.start.push_back(a);
      runs.end.push_back(b);
      runs.row.push_back(r);
      parent.push_back(id);
      // Union with overlapping prev-row runs ([lo, hi) in 8-conn widens by 1).
      const int32_t lo = conn == 8 ? a - 1 : a;
      const int32_t hi = conn == 8 ? b + 1 : b;
      while (p < prev_end && runs.end[p] <= lo) ++p;
      for (int32_t q = p; q < prev_end && runs.start[q] < hi; ++q)
        runion(parent, id, q);
    }
    prev_begin = row_begin;
    prev_end = static_cast<int32_t>(runs.start.size());
  }
  const int32_t n_runs = static_cast<int32_t>(runs.start.size());
  runs.label.assign(n_runs, 0);
  int32_t next = 0;
  for (int32_t i = 0; i < n_runs; ++i) {
    const int32_t root = rfind(parent, i);
    if (runs.label[root] == 0) runs.label[root] = ++next;
    runs.label[i] = runs.label[root];
  }
  return next;
}

}  // namespace ccl

int32_t cc_label(const uint8_t* mask, int32_t h, int32_t w, int32_t conn,
                 int32_t* labels, int64_t* stats_out) {
  ccl::Runs runs;
  const int32_t next = ccl::label_runs(mask, h, w, conn, runs);
  std::memset(labels, 0, sizeof(int32_t) * static_cast<int64_t>(h) * w);
  const int32_t n_runs = static_cast<int32_t>(runs.start.size());
  for (int32_t i = 0; i < n_runs; ++i) {
    int32_t* row = labels + static_cast<int64_t>(runs.row[i]) * w;
    const int32_t l = runs.label[i];
    for (int32_t c = runs.start[i]; c < runs.end[i]; ++c) row[c] = l;
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
    for (int32_t i = 0; i < n_runs; ++i) {
      int64_t* s = stats_out + 5 * (runs.label[i] - 1);
      const int64_t len = runs.end[i] - runs.start[i];
      s[0] += len;
      if (runs.row[i] < s[1]) s[1] = runs.row[i];
      if (runs.start[i] < s[2]) s[2] = runs.start[i];
      if (runs.row[i] + 1 > s[3]) s[3] = runs.row[i] + 1;
      if (runs.end[i] > s[4]) s[4] = runs.end[i];
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// SLIC connectivity enforcement: fragment labeling + small-fragment adoption.
//
// Mirrors ops/slic._enforce_connectivity_bucket semantics (the TPU fragment
// propagation + jump-flood adoption, itself a redesign of skimage's
// _enforce_label_connectivity_cython): fragments are 4-connected runs of
// equal `assign` values inside `mask`; fragments smaller than min_size are
// absorbed into the nearest kept fragment by multi-source BFS (8-conn,
// geodesic within the array).  When no fragment reaches min_size the largest
// one is kept.  This is the low-latency host path — the device variant costs
// O(fragment diameter) sequential stencil sweeps per bucket.
// ---------------------------------------------------------------------------

// assign: (h*w) int32 segment ids; mask: (h*w) u8. out: per-pixel fragment
// ids (0-based) after adoption, -1 outside mask.  Returns fragment count.
int32_t slic_enforce(const int32_t* assign, const uint8_t* mask, int32_t h,
                     int32_t w, int32_t min_size, int32_t* out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  for (int32_t r = 0; r < h; ++r) {
    const int64_t row = static_cast<int64_t>(r) * w;
    for (int32_t c = 0; c < w; ++c) {
      const int64_t i = row + c;
      if (!mask[i]) continue;
      if (c > 0 && mask[i - 1] && assign[i - 1] == assign[i])
        uf_union(parent, i, i - 1);
      if (r > 0 && mask[i - w] && assign[i - w] == assign[i])
        uf_union(parent, i, i - w);
    }
  }
  std::vector<int32_t> compact(n, -1);
  std::vector<int64_t> sizes;
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!mask[i]) {
      out[i] = -1;
      continue;
    }
    const int32_t root = uf_find(parent, static_cast<int32_t>(i));
    if (compact[root] < 0) {
      compact[root] = next++;
      sizes.push_back(0);
    }
    out[i] = compact[root];
    sizes[out[i]] += 1;
  }
  if (next == 0) return 0;

  std::vector<uint8_t> keep(next, 0);
  bool any = false;
  int32_t largest = 0;
  for (int32_t f = 0; f < next; ++f) {
    if (sizes[f] >= min_size) {
      keep[f] = 1;
      any = true;
    }
    if (sizes[f] > sizes[largest]) largest = f;
  }
  if (!any) keep[largest] = 1;

  // Multi-source BFS from kept pixels; unkept pixels adopt the first label
  // that reaches them (deterministic: row-major seed order, FIFO queue).
  std::vector<int64_t> queue;
  queue.reserve(static_cast<size_t>(n));
  std::vector<uint8_t> visited(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const bool settled = (out[i] < 0) || keep[out[i]];
    visited[i] = settled ? 1 : 0;
    if (out[i] >= 0 && keep[out[i]]) queue.push_back(i);
  }
  static const int32_t drs[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
  static const int32_t dcs[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
  size_t head = 0;
  while (head < queue.size()) {
    const int64_t i = queue[head++];
    const int32_t r = static_cast<int32_t>(i / w);
    const int32_t c = static_cast<int32_t>(i % w);
    for (int k = 0; k < 8; ++k) {
      const int32_t nr = r + drs[k];
      const int32_t nc = c + dcs[k];
      if (nr < 0 || nr >= h || nc < 0 || nc >= w) continue;
      const int64_t j = static_cast<int64_t>(nr) * w + nc;
      if (visited[j]) continue;
      visited[j] = 1;
      out[j] = out[i];
      queue.push_back(j);
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// Native ROI mask pipeline.
//
// The full post-threshold-selection chain of models/roi_fused.roi_masks_device
// (itself encoder/ROI/roi.py:527-607 semantics): color gradient/NMS ->
// hysteresis -> density filter -> thin-structure removal -> noise removal ->
// closing -> gap bridging -> border-protected unification -> hole filling ->
// small-region cleanup -> buffer-zone split.  The chain is binary image work
// dominated by connected-components passes, which cost O(component diameter)
// sequential stencil sweeps on the device (~0.4-0.5 s per CC stage per image,
// measured) but single-digit milliseconds as host union-find.  Heavy f32
// compute (the threshold sweep analysis) stays on the TPU.
//
// Parity: integer-valued quantities (Sobel taps, NMS comparisons, component
// areas/bboxes) match the device graph exactly; box-filter densities and
// component means accumulate in different order than the XLA conv/segment_sum
// and can differ in the last float ulp (borderline threshold flips are
// possible on adversarial inputs, not observed on the Kodak corpus).
// ---------------------------------------------------------------------------

namespace roi {

constexpr float kTan22 = 0.41421356237309503f;  // tan(pi/8)
constexpr float kTan67 = 2.414213562373095f;    // tan(3*pi/8)

inline int reflect101(int i, int n) {
  // OpenCV BORDER_REFLECT_101: -1 -> 1, n -> n-2.
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * (n - 1) - i;
  }
  return i;
}

inline int clampi(int i, int lo, int hi) {
  return i < lo ? lo : (i > hi ? hi : i);
}

// k x k window count of non-zero pixels, REFLECT_101 borders (the normalized
// box filter's numerator; density = count / k^2).  Two accumulator widths,
// kept textually in sync (extern "C" forbids templates): int32 is exact
// whenever the PADDED area fits in it (~2x less memory traffic on this
// bandwidth-bound pass); int64 covers foreground-dense images just under
// the callers' 2^31 h*w guard whose reflect padding overflows int32.
static void box_count_i32(const uint8_t* m, int h, int w, int k,
                          int32_t* out) {
  const int p = k / 2;
  const int ph = h + 2 * p, pw = w + 2 * p;
  std::vector<int32_t> integral(static_cast<size_t>(ph + 1) * (pw + 1), 0);
  for (int r = 0; r < ph; ++r) {
    const int sr = reflect101(r - p, h);
    int32_t row_sum = 0;
    const int32_t* up = &integral[static_cast<size_t>(r) * (pw + 1)];
    int32_t* cur = &integral[static_cast<size_t>(r + 1) * (pw + 1)];
    cur[0] = 0;
    for (int c = 0; c < pw; ++c) {
      const int sc = reflect101(c - p, w);
      row_sum += m[static_cast<int64_t>(sr) * w + sc] ? 1 : 0;
      cur[c + 1] = up[c + 1] + row_sum;
    }
  }
  for (int r = 0; r < h; ++r) {
    for (int c = 0; c < w; ++c) {
      const int r0 = r, r1 = r + k, c0 = c, c1 = c + k;  // padded coords
      out[static_cast<int64_t>(r) * w + c] =
          integral[static_cast<size_t>(r1) * (pw + 1) + c1] -
          integral[static_cast<size_t>(r0) * (pw + 1) + c1] -
          integral[static_cast<size_t>(r1) * (pw + 1) + c0] +
          integral[static_cast<size_t>(r0) * (pw + 1) + c0];
    }
  }
}

static void box_count_i64(const uint8_t* m, int h, int w, int k,
                          int32_t* out) {
  const int p = k / 2;
  const int ph = h + 2 * p, pw = w + 2 * p;
  std::vector<int64_t> integral(static_cast<size_t>(ph + 1) * (pw + 1), 0);
  for (int r = 0; r < ph; ++r) {
    const int sr = reflect101(r - p, h);
    int64_t row_sum = 0;
    const int64_t* up = &integral[static_cast<size_t>(r) * (pw + 1)];
    int64_t* cur = &integral[static_cast<size_t>(r + 1) * (pw + 1)];
    cur[0] = 0;
    for (int c = 0; c < pw; ++c) {
      const int sc = reflect101(c - p, w);
      row_sum += m[static_cast<int64_t>(sr) * w + sc] ? 1 : 0;
      cur[c + 1] = up[c + 1] + row_sum;
    }
  }
  for (int r = 0; r < h; ++r) {
    for (int c = 0; c < w; ++c) {
      const int r0 = r, r1 = r + k, c0 = c, c1 = c + k;  // padded coords
      out[static_cast<int64_t>(r) * w + c] = static_cast<int32_t>(
          integral[static_cast<size_t>(r1) * (pw + 1) + c1] -
          integral[static_cast<size_t>(r0) * (pw + 1) + c1] -
          integral[static_cast<size_t>(r1) * (pw + 1) + c0] +
          integral[static_cast<size_t>(r0) * (pw + 1) + c0]);
    }
  }
}

// Separable sliding-window box count: per-row horizontal window sums into a
// reflect101-padded buffer, then an incremental vertical window over those
// rows.  Two vectorizable linear passes — ~3x the integral-image form, which
// paid a reflect101 index computation per padded element plus 4 scattered
// loads per output.  Counts are exact integers either way.
static void box_count_sliding(const uint8_t* m, int h, int w, int k,
                              int32_t* out) {
  const int p = k / 2;
  // hs[r][c] = sum of row reflect101(r-p..) window [c-p, c+p] — horizontal
  // pass on each SOURCE row once, then rows are reused via reflect101 row
  // indices in the vertical pass.
  std::vector<int32_t> hs(static_cast<size_t>(h) * w);
  std::vector<uint8_t> pr(w + 2 * p);
  for (int r = 0; r < h; ++r) {
    const uint8_t* src = m + static_cast<int64_t>(r) * w;
    for (int c = 0; c < p; ++c) pr[c] = src[reflect101(c - p, w)];
    for (int c = 0; c < w; ++c) pr[p + c] = src[c] ? 1 : 0;
    for (int c = 0; c < p; ++c) pr[p + w + c] = src[reflect101(w + c, w)];
    int32_t s = 0;
    for (int c = 0; c < k - 1; ++c) s += pr[c];
    int32_t* o = hs.data() + static_cast<int64_t>(r) * w;
    for (int c = 0; c < w; ++c) {
      s += pr[c + k - 1];
      o[c] = s;
      s -= pr[c];
    }
  }
  // Vertical incremental window (source rows [r-p, r-p+k-1], reflected).
  std::vector<int32_t> acc(w, 0);
  for (int dr = -p; dr <= -p + k - 2; ++dr) {
    const int32_t* row = hs.data() + static_cast<int64_t>(reflect101(dr, h)) * w;
    for (int c = 0; c < w; ++c) acc[c] += row[c];
  }
  for (int r = 0; r < h; ++r) {
    const int32_t* add =
        hs.data() + static_cast<int64_t>(reflect101(r - p + k - 1, h)) * w;
    int32_t* o = out + static_cast<int64_t>(r) * w;
    for (int c = 0; c < w; ++c) {
      acc[c] += add[c];
      o[c] = acc[c];
    }
    const int32_t* sub = hs.data() + static_cast<int64_t>(reflect101(r - p, h)) * w;
    for (int c = 0; c < w; ++c) acc[c] -= sub[c];
  }
}

void box_count(const uint8_t* m, int h, int w, int k, int32_t* out) {
  const int p = k / 2;
  if (p < h && p < w && k <= 1000) {  // window count fits int32 trivially
    box_count_sliding(m, h, w, k, out);
    return;
  }
  const int64_t padded = static_cast<int64_t>(h + 2 * p) * (w + 2 * p);
  if (padded < (int64_t{1} << 31))
    box_count_i32(m, h, w, k, out);
  else
    box_count_i64(m, h, w, k, out);
}

// Exact squared Euclidean distance (foreground pixel -> nearest background),
// Felzenszwalb-Huttenlocher two-pass.  Matches the device's exact jump-flood
// EDT (both are exact L2).
void edt_sq(const uint8_t* fg, int h, int w, float* out) {
  const float INF = 1e20f;
  // Column pass: 1D city-block distance to nearest background in the column.
  for (int c = 0; c < w; ++c) {
    float d = INF;
    for (int r = 0; r < h; ++r) {
      if (!fg[static_cast<int64_t>(r) * w + c]) d = 0.0f;
      else if (d < INF) d += 1.0f;
      out[static_cast<int64_t>(r) * w + c] = d;
    }
    d = INF;
    for (int r = h - 1; r >= 0; --r) {
      float& v = out[static_cast<int64_t>(r) * w + c];
      if (!fg[static_cast<int64_t>(r) * w + c]) d = 0.0f;
      else if (d < INF) d += 1.0f;
      if (d < v) v = d;
      v = (v >= INF) ? INF : v * v;
    }
  }
  // Row pass: lower envelope of parabolas over the squared column distances.
  std::vector<float> f(w);
  std::vector<int> v(w);
  std::vector<float> z(w + 1);
  for (int r = 0; r < h; ++r) {
    float* row = out + static_cast<int64_t>(r) * w;
    std::memcpy(f.data(), row, w * sizeof(float));
    int k = 0;
    v[0] = 0;
    z[0] = -INF;
    z[1] = INF;
    for (int q = 1; q < w; ++q) {
      float s;
      while (true) {
        const int p = v[k];
        s = ((f[q] + q * (float)q) - (f[p] + p * (float)p)) / (2.0f * (q - p));
        if (s <= z[k]) { --k; } else break;
      }
      ++k;
      v[k] = q;
      z[k] = s;
      z[k + 1] = INF;
    }
    k = 0;
    for (int q = 0; q < w; ++q) {
      while (z[k + 1] < q) ++k;
      const int p = v[k];
      const float dq = q - (float)p;
      row[q] = dq * dq + f[p];
    }
  }
}

// Structuring elements as per-row horizontal spans: row dy covers columns
// [-hx, +hx].  Both rect and cv2-ellipse kernels are row-contiguous and
// symmetric, so dilation/erosion decompose into one row-distance pass plus
// one O(n) compare per SE row — O(k*n) instead of O(k^2*n) brute force.
struct RowSpan {
  int dy;
  int hx;
};

std::vector<RowSpan> rect_spans(int k) {
  std::vector<RowSpan> s;
  const int c = k / 2;
  for (int i = 0; i < k; ++i) s.push_back({i - c, c});
  return s;
}

// cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) bit-compatible
// (ops/morphology.ellipse_kernel).
std::vector<RowSpan> ellipse_spans(int k) {
  const int r = k / 2, c = k / 2;
  const double inv_r2 = r ? 1.0 / (static_cast<double>(r) * r) : 0.0;
  std::vector<RowSpan> s;
  for (int i = 0; i < k; ++i) {
    const int dy = i - r;
    if (std::abs(dy) > r) continue;
    int dx;
    if (r)
      dx = static_cast<int>(std::lround(
          c * std::sqrt(std::max(static_cast<double>(r) * r - dy * dy, 0.0) * inv_r2)));
    else
      dx = c;
    s.push_back({dy, dx});
  }
  return s;
}

// Per-row distance to the nearest pixel with value `target` (1e9 if none).
void row_dist_to(const uint8_t* in, int h, int w, uint8_t target, int32_t* out) {
  const int32_t BIG = 1 << 29;
  for (int r = 0; r < h; ++r) {
    const uint8_t* row = in + static_cast<int64_t>(r) * w;
    int32_t* o = out + static_cast<int64_t>(r) * w;
    int32_t d = BIG;
    for (int c = 0; c < w; ++c) {
      d = ((row[c] != 0) == (target != 0)) ? 0 : (d < BIG ? d + 1 : BIG);
      o[c] = d;
    }
    d = BIG;
    for (int c = w - 1; c >= 0; --c) {
      d = ((row[c] != 0) == (target != 0)) ? 0 : (d < BIG ? d + 1 : BIG);
      if (d < o[c]) o[c] = d;
    }
  }
}

// True when spans describe an odd (2r+1)^2 rect: dy in [-r, r], hx == r —
// the separable two-pass path applies (row window then column window).
inline bool rect_odd_radius(const std::vector<RowSpan>& spans, int* r_out) {
  const int k = static_cast<int>(spans.size());
  if (k < 1 || k % 2 == 0) return false;
  const int r = k / 2;
  for (int i = 0; i < k; ++i)
    if (spans[i].dy != i - r || spans[i].hx != r) return false;
  *r_out = r;
  return true;
}

// Separable window-OR (dilate, target=1) / window-AND (erode, target=0) for
// odd rects: horizontal pass via row distances, vertical pass via running
// per-column distances — O(n) instead of O(k*n).  `hit` is the output value
// where a target pixel falls inside the window.
void rect_sep_pass(const uint8_t* in, int h, int w, int r, uint8_t target,
                   uint8_t hit, uint8_t miss, uint8_t* out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  const int32_t BIG = 1 << 29;
  std::vector<int32_t> dist(n);
  row_dist_to(in, h, w, target, dist.data());
  std::vector<uint8_t> hmask(n);
  for (int64_t i = 0; i < n; ++i) hmask[i] = dist[i] <= r;
  // Vertical window over hmask with running per-column distances.
  std::vector<int32_t> d(w, BIG);
  std::vector<int32_t> vd(n);
  for (int row = 0; row < h; ++row) {
    const uint8_t* hm = hmask.data() + static_cast<int64_t>(row) * w;
    int32_t* o = vd.data() + static_cast<int64_t>(row) * w;
    for (int c = 0; c < w; ++c) {
      d[c] = hm[c] ? 0 : (d[c] < BIG ? d[c] + 1 : BIG);
      o[c] = d[c];
    }
  }
  std::fill(d.begin(), d.end(), BIG);
  for (int row = h - 1; row >= 0; --row) {
    const uint8_t* hm = hmask.data() + static_cast<int64_t>(row) * w;
    int32_t* o = vd.data() + static_cast<int64_t>(row) * w;
    for (int c = 0; c < w; ++c) {
      d[c] = hm[c] ? 0 : (d[c] < BIG ? d[c] + 1 : BIG);
      if (d[c] < o[c]) o[c] = d[c];
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = vd[i] <= r ? hit : miss;
}

// Binary dilation: outside-image pixels never contribute (cv2 default).
void dilate_se(const uint8_t* in, int h, int w,
               const std::vector<RowSpan>& spans, uint8_t* out) {
  int rr;
  if (rect_odd_radius(spans, &rr)) {
    rect_sep_pass(in, h, w, rr, 1, 1, 0, out);
    return;
  }
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> dist(n);
  row_dist_to(in, h, w, 1, dist.data());
  std::memset(out, 0, n);
  for (const auto& s : spans) {
    const int r0 = std::max(0, -s.dy), r1 = std::min(h, h - s.dy);
    const int32_t hx = s.hx;
    for (int r = r0; r < r1; ++r) {
      const int32_t* src = dist.data() + static_cast<int64_t>(r + s.dy) * w;
      uint8_t* o = out + static_cast<int64_t>(r) * w;
      for (int c = 0; c < w; ++c)  // branchless |= vectorizes
        o[c] = static_cast<uint8_t>(o[c] | (src[c] <= hx));
    }
  }
}

// Binary erosion: outside-image pixels count as foreground (cv2 default).
void erode_se(const uint8_t* in, int h, int w,
              const std::vector<RowSpan>& spans, uint8_t* out) {
  int rr;
  if (rect_odd_radius(spans, &rr)) {
    rect_sep_pass(in, h, w, rr, 0, 0, 1, out);
    return;
  }
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> dist(n);
  row_dist_to(in, h, w, 0, dist.data());
  std::memset(out, 1, n);
  for (const auto& s : spans) {
    const int r0 = std::max(0, -s.dy), r1 = std::min(h, h - s.dy);
    const int32_t hx = s.hx;
    for (int r = r0; r < r1; ++r) {
      const int32_t* src = dist.data() + static_cast<int64_t>(r + s.dy) * w;
      uint8_t* o = out + static_cast<int64_t>(r) * w;
      for (int c = 0; c < w; ++c)  // branchless &= vectorizes
        o[c] = static_cast<uint8_t>(o[c] & (src[c] > hx));
    }
  }
}

void close_se(std::vector<uint8_t>& m, int h, int w,
              const std::vector<RowSpan>& spans) {
  std::vector<uint8_t> tmp(m.size());
  dilate_se(m.data(), h, w, spans, tmp.data());
  erode_se(tmp.data(), h, w, spans, m.data());
}

// scipy.ndimage.binary_dilation default cross structure, `iters` iterations.
// k iterated cross dilations == L1 (cityblock) distance <= k, so one two-pass
// chamfer replaces 2*iters full-image passes (exact, not an approximation).
void dilate_cross(std::vector<uint8_t>& m, int h, int w, int iters) {
  if (iters <= 0) return;
  const int64_t n = static_cast<int64_t>(h) * w;
  const int32_t BIG = 1 << 29;
  std::vector<int32_t> d(n);
  for (int64_t i = 0; i < n; ++i) d[i] = m[i] ? 0 : BIG;
  for (int r = 0; r < h; ++r) {
    int32_t* row = d.data() + static_cast<int64_t>(r) * w;
    const int32_t* up = r > 0 ? row - w : nullptr;
    int32_t left = BIG;
    for (int c = 0; c < w; ++c) {
      int32_t v = row[c];
      if (left + 1 < v) v = left + 1;
      if (up && up[c] + 1 < v) v = up[c] + 1;
      row[c] = left = v;
    }
  }
  for (int r = h - 1; r >= 0; --r) {
    int32_t* row = d.data() + static_cast<int64_t>(r) * w;
    const int32_t* dn = r + 1 < h ? row + w : nullptr;
    int32_t right = BIG;
    for (int c = w - 1; c >= 0; --c) {
      int32_t v = row[c];
      if (right + 1 < v) v = right + 1;
      if (dn && dn[c] + 1 < v) v = dn[c] + 1;
      row[c] = right = v;
    }
  }
  for (int64_t i = 0; i < n; ++i) m[i] = d[i] <= iters;
}

// cv2.Canny-semantics gradient + NMS: per-pixel max-|grad| channel,
// L1 magnitude, 4-sector NMS (ops/canny.gradient_and_nms).
void gradient_nms(const uint8_t* img, int h, int w, int channels, int32_t* mag,
                  uint8_t* nms) {
  const int64_t n = static_cast<int64_t>(h) * w;
  // int16 planes: |g| <= 4*255 and L1 mag <= 2040 fit comfortably, and the
  // three full-image intermediates are pure memory bandwidth on this host.
  std::vector<int16_t> bgx(n), bgy(n);
  std::vector<int16_t> bmag(n, -1);
  // Planar + separable Sobel: deinterleave each channel, then per row
  // gx = colsum[c+1]-colsum[c-1], gy = rowdiff[c-1]+2*rowdiff[c]+rowdiff[c+1]
  // with colsum = [1,2,1]^T and rowdiff = lower-upper (replicated borders) —
  // contiguous loads the compiler vectorizes, vs 8 stride-3 loads per pixel.
  // One interleaved pass fills all planes (vs `channels` strided passes
  // over the full image).
  std::vector<uint8_t> planes(n * channels);
  if (channels == 3) {
    uint8_t* p0 = planes.data();
    uint8_t* p1 = planes.data() + n;
    uint8_t* p2 = planes.data() + 2 * n;
    for (int64_t i = 0; i < n; ++i) {
      p0[i] = img[3 * i];
      p1[i] = img[3 * i + 1];
      p2[i] = img[3 * i + 2];
    }
  } else {
    for (int ch = 0; ch < channels; ++ch)
      for (int64_t i = 0; i < n; ++i)
        planes[static_cast<int64_t>(ch) * n + i] = img[i * channels + ch];
  }
  std::vector<int32_t> colsum(w), rowdiff(w);
  for (int ch = 0; ch < channels; ++ch) {
    const uint8_t* plane_p = planes.data() + static_cast<int64_t>(ch) * n;
    for (int r = 0; r < h; ++r) {
      const uint8_t* pm =
          plane_p + static_cast<int64_t>(clampi(r - 1, 0, h - 1)) * w;
      const uint8_t* pc = plane_p + static_cast<int64_t>(r) * w;
      const uint8_t* pp =
          plane_p + static_cast<int64_t>(clampi(r + 1, 0, h - 1)) * w;
      for (int c = 0; c < w; ++c) {
        colsum[c] = pm[c] + 2 * pc[c] + pp[c];
        rowdiff[c] = static_cast<int32_t>(pp[c]) - pm[c];
      }
      const int64_t row = static_cast<int64_t>(r) * w;
      for (int c = 0; c < w; ++c) {
        const int cm = c > 0 ? c - 1 : 0, cp = c + 1 < w ? c + 1 : w - 1;
        const int32_t gx = colsum[cp] - colsum[cm];
        const int32_t gy = rowdiff[cm] + 2 * rowdiff[c] + rowdiff[cp];
        const int32_t m = std::abs(gx) + std::abs(gy);
        const int64_t i = row + c;
        if (m > bmag[i]) {  // strict: ties keep the lower channel (argmax)
          bmag[i] = static_cast<int16_t>(m);
          bgx[i] = static_cast<int16_t>(gx);
          bgy[i] = static_cast<int16_t>(gy);
        }
      }
    }
  }
  for (int64_t i = 0; i < n; ++i) mag[i] = bmag[i];
  auto mag_at = [&](int r, int c) -> int32_t {
    if (r < 0 || r >= h || c < 0 || c >= w) return 0;  // pad fill 0
    return bmag[static_cast<int64_t>(r) * w + c];
  };
  for (int r = 0; r < h; ++r) {
    const bool row_border = (r == 0) || (r == h - 1);
    for (int c = 0; c < w; ++c) {
      const int64_t i = static_cast<int64_t>(r) * w + c;
      const float ax = std::abs(static_cast<float>(bgx[i]));
      const float ay = std::abs(static_cast<float>(bgy[i]));
      const bool horizontal = ay < kTan22 * ax;
      const bool vertical = ay > kTan67 * ax;
      const bool diag = !horizontal && !vertical;
      const bool same_sign =
          static_cast<int64_t>(bgx[i]) * bgy[i] >= 0;
      const int32_t m = bmag[i];
      auto keep = [&](int32_t a, int32_t b2) { return m > a && m >= b2; };
      bool pass;
      if (!row_border && c > 0 && c < w - 1) {
        // Interior: direct offsets, no bounds checks (identical values —
        // mag_at only differs by returning 0 outside the image).
        const int16_t* mrow = bmag.data() + i;
        if (horizontal)
          pass = keep(mrow[-1], mrow[1]);
        else if (vertical)
          pass = keep(mrow[-w], mrow[w]);
        else if (diag && same_sign)
          pass = keep(mrow[-w - 1], mrow[w + 1]);
        else
          pass = keep(mrow[-w + 1], mrow[w - 1]);
      } else if (horizontal) {
        pass = keep(mag_at(r, c - 1), mag_at(r, c + 1));
      } else if (vertical) {
        pass = keep(mag_at(r - 1, c), mag_at(r + 1, c));
      } else if (diag && same_sign) {
        pass = keep(mag_at(r - 1, c - 1), mag_at(r + 1, c + 1));
      } else {
        pass = keep(mag_at(r - 1, c + 1), mag_at(r + 1, c - 1));
      }
      nms[i] = pass ? 1 : 0;
    }
  }
}

// Hysteresis: weak-graph components (8-conn) containing a strong pixel.
void hysteresis(const int32_t* mag, const uint8_t* nms, int h, int w,
                float low, float high, uint8_t* edges) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<uint8_t> weak(n);
  for (int64_t i = 0; i < n; ++i)
    weak[i] = (nms[i] && static_cast<float>(mag[i]) > low) ? 1 : 0;
  std::vector<int32_t> labels(n);
  const int32_t num = cc_label(weak.data(), h, w, 8, labels.data(), nullptr);
  std::vector<uint8_t> kept(num + 1, 0);
  for (int64_t i = 0; i < n; ++i)
    if (weak[i] && static_cast<float>(mag[i]) > high) kept[labels[i]] = 1;
  kept[0] = 0;
  for (int64_t i = 0; i < n; ++i) edges[i] = weak[i] && kept[labels[i]];
}

struct CompAgg {
  std::vector<int64_t> area;
  std::vector<int> minr, maxr, minc, maxc;
  std::vector<double> sum_a, sum_b;
};

// CC labels + per-component area/bbox/two value sums, run-based: labels fill
// and every aggregate walk per-run instead of per-pixel.
int32_t components_with_sums(const uint8_t* m, int h, int w, int conn,
                             const float* va, const float* vb,
                             std::vector<int32_t>& labels, CompAgg& agg) {
  labels.assign(static_cast<size_t>(h) * w, 0);
  ccl::Runs runs;
  const int32_t num = ccl::label_runs(m, h, w, conn, runs);
  agg.area.assign(num + 1, 0);
  agg.minr.assign(num + 1, h);
  agg.maxr.assign(num + 1, -1);
  agg.minc.assign(num + 1, w);
  agg.maxc.assign(num + 1, -1);
  agg.sum_a.assign(num + 1, 0.0);
  agg.sum_b.assign(num + 1, 0.0);
  const int32_t n_runs = static_cast<int32_t>(runs.start.size());
  for (int32_t i = 0; i < n_runs; ++i) {
    const int32_t l = runs.label[i];
    const int32_t r = runs.row[i], a = runs.start[i], b = runs.end[i];
    int32_t* lrow = labels.data() + static_cast<int64_t>(r) * w;
    for (int32_t c = a; c < b; ++c) lrow[c] = l;
    agg.area[l] += b - a;
    if (r < agg.minr[l]) agg.minr[l] = r;
    if (r > agg.maxr[l]) agg.maxr[l] = r;
    if (a < agg.minc[l]) agg.minc[l] = a;
    if (b - 1 > agg.maxc[l]) agg.maxc[l] = b - 1;
    const int64_t base = static_cast<int64_t>(r) * w;
    if (va) {
      double s = 0.0;
      for (int32_t c = a; c < b; ++c) s += va[base + c];
      agg.sum_a[l] += s;
    }
    if (vb) {
      double s = 0.0;
      for (int32_t c = a; c < b; ++c) s += vb[base + c];
      agg.sum_b[l] += s;
    }
  }
  return num;
}

}  // namespace roi

// int params: [density_kernel, thin_window, thin_min_region_size,
//   noise_min_size, noise_window, close_distance, bridge1_max_gap,
//   bridge_local_window, bridge_regional_window, border_protect_kernel,
//   bridge2_max_gap, fill_min_hole, fill_max_hole, clean_min_size,
//   buffer_size]
// float params: [low, high, thin_density_threshold, thin_thinness_threshold,
//   noise_density_threshold, bridge1_density, border_sensitivity]
// mag_pre/nms_pre: optional precomputed gradient/NMS (canny_analysis
// already ran them for threshold selection; null -> compute here).
void roi_pipeline_pre(const uint8_t* rgb, int32_t h, int32_t w,
                      const int32_t* ip, const float* fp,
                      const int32_t* mag_pre, const uint8_t* nms_pre,
                      uint8_t* roi_out, uint8_t* nonroi_out) {
  using namespace roi;
  StageClock _sc;
  const int64_t n = static_cast<int64_t>(h) * w;
  const int density_kernel = ip[0], thin_window = ip[1], thin_min = ip[2];
  const int noise_min = ip[3], noise_window = ip[4], close_distance = ip[5];
  const int bridge1_gap = ip[6], bridge_local = ip[7], bridge_regional = ip[8];
  const int protect_kernel = ip[9], bridge2_gap = ip[10];
  const int fill_min = ip[11], fill_max = ip[12], clean_min = ip[13];
  const int buffer_size = ip[14];
  const float low = fp[0], high = fp[1];
  const float thin_dens_thr = fp[2], thin_thin_thr = fp[3];
  const float noise_dens_thr = fp[4], bridge_dens_thr = fp[5];
  const float border_sens = fp[6];

  // 1-2. Gradient/NMS + hysteresis -> edges.
  std::vector<int32_t> mag;
  std::vector<uint8_t> nms;
  if (!mag_pre || !nms_pre) {
    mag.resize(n);
    nms.resize(n);
    gradient_nms(rgb, h, w, 3, mag.data(), nms.data());
    mag_pre = mag.data();
    nms_pre = nms.data();
  }
  std::vector<uint8_t> edges(n);
  hysteresis(mag_pre, nms_pre, h, w, low, high, edges.data());
  _sc.lap("grad+hyst");

  // 3. Density filter: thr = mean(density at edge pixels) / 100.
  std::vector<int32_t> cnt(n);
  box_count(edges.data(), h, w, density_kernel, cnt.data());
  const float inv_dk = 1.0f / (density_kernel * density_kernel);
  double dens_sum = 0.0;
  int64_t dens_n = 0;
  for (int64_t i = 0; i < n; ++i)
    if (edges[i]) { dens_sum += cnt[i] * inv_dk; ++dens_n; }
  const float thr =
      static_cast<float>(dens_sum / (dens_n > 0 ? dens_n : 1)) / 100.0f;
  std::vector<uint8_t> binary(n);
  for (int64_t i = 0; i < n; ++i)
    binary[i] = edges[i] && (cnt[i] * inv_dk > thr);
  _sc.lap("density");

  // 4. Thin-structure removal: thinness = 1 - 2*mean(EDT)/max(bbox dim).
  {
    box_count(binary.data(), h, w, thin_window, cnt.data());
    const float inv_tw = 1.0f / (thin_window * thin_window);
    std::vector<float> dist(n);
    edt_sq(binary.data(), h, w, dist.data());
    std::vector<float> densf(n);
    for (int64_t i = 0; i < n; ++i) {
      dist[i] = binary[i] ? std::sqrt(dist[i]) : 0.0f;
      densf[i] = cnt[i] * inv_tw;
    }
    std::vector<int32_t> labels;
    CompAgg agg;
    const int32_t num = components_with_sums(
        binary.data(), h, w, 8, dist.data(), densf.data(), labels, agg);
    std::vector<uint8_t> drop(num + 1, 0);
    for (int32_t l = 1; l <= num; ++l) {
      if (!agg.area[l]) continue;
      const float max_dim = static_cast<float>(std::max(
          agg.maxr[l] - agg.minr[l] + 1, agg.maxc[l] - agg.minc[l] + 1));
      const float avg = static_cast<float>(agg.sum_a[l] / agg.area[l]);
      const float mean_dens = static_cast<float>(agg.sum_b[l] / agg.area[l]);
      const float thinness = 1.0f - (max_dim > 0 ? avg * 2.0f / max_dim : 0.0f);
      drop[l] = (thinness > thin_thin_thr) && (agg.area[l] >= thin_min) &&
                (mean_dens < thin_dens_thr);
    }
    for (int64_t i = 0; i < n; ++i)
      if (binary[i] && drop[labels[i]]) binary[i] = 0;
  }
  _sc.lap("thin");

  // 5. Small-noise removal: white pass then black pass, density shared from
  // the pre-pass mask (models/roi_fused._remove_small_noise).
  {
    box_count(binary.data(), h, w, noise_window, cnt.data());
    const float inv_nw = 1.0f / (noise_window * noise_window);
    std::vector<float> densf(n);
    for (int64_t i = 0; i < n; ++i) densf[i] = cnt[i] * inv_nw;

    auto one_pass = [&](std::vector<uint8_t>& m) {
      std::vector<int32_t> labels;
      CompAgg agg;
      const int32_t num = components_with_sums(m.data(), h, w, 8, densf.data(),
                                               nullptr, labels, agg);
      std::vector<uint8_t> drop(num + 1, 0);
      for (int32_t l = 1; l <= num; ++l) {
        if (!agg.area[l]) continue;
        const float mean_dens = static_cast<float>(agg.sum_a[l] / agg.area[l]);
        drop[l] = (agg.area[l] < noise_min) && (mean_dens < noise_dens_thr);
      }
      for (int64_t i = 0; i < n; ++i)
        if (m[i] && drop[labels[i]]) m[i] = 0;
    };
    one_pass(binary);
    std::vector<uint8_t> inv(n);
    for (int64_t i = 0; i < n; ++i) inv[i] = binary[i] ? 0 : 1;
    one_pass(inv);
    for (int64_t i = 0; i < n; ++i) binary[i] = inv[i] ? 0 : 1;
  }
  _sc.lap("noise");

  // 6. Morphological close, ellipse kernel (2*close_distance+1).
  close_se(binary, h, w, ellipse_spans(close_distance * 2 + 1));
  _sc.lap("close11");

  // 7 & 9. Gap bridging (shared helper).  A pixel bridges when any opposite
  // direction pair both hit a set pixel within reach_len.  Interior pixels
  // (no reflect101 in any walk) get the answer from 8 directional
  // nearest-set-distance scans, O(n) total instead of O(8*reach*n); the
  // border band (within reach_len of an edge, where walks reflect) is
  // re-evaluated with the exact original walk.
  auto bridge = [&](int max_gap) {
    box_count(binary.data(), h, w, bridge_regional, cnt.data());
    const float inv_bw = 1.0f / (bridge_regional * bridge_regional);
    const int reach_len = std::min(max_gap, bridge_local);
    static const int dxs[8] = {-1, 1, 0, 0, -1, 1, -1, 1};
    static const int dys[8] = {0, 0, -1, 1, -1, 1, 1, -1};
    auto exact_at = [&](int r, int c) -> uint8_t {
      auto reach = [&](int k) {
        for (int d = 1; d <= reach_len; ++d) {
          const int rr = reflect101(r + dys[k] * d, h);
          const int cc = reflect101(c + dxs[k] * d, w);
          if (binary[static_cast<int64_t>(rr) * w + cc]) return true;
        }
        return false;
      };
      for (int p = 0; p < 4; ++p)
        if (reach(2 * p) && reach(2 * p + 1)) return 1;
      return 0;
    };
    std::vector<uint8_t> out(binary);
    const int32_t R = reach_len;
    const int32_t BIG = 1 << 29;
    if (2 * R + 2 >= h || 2 * R + 2 >= w) {
      for (int r = 0; r < h; ++r)
        for (int c = 0; c < w; ++c) {
          const int64_t i = static_cast<int64_t>(r) * w + c;
          if (!binary[i] && cnt[i] * inv_bw > bridge_dens_thr &&
              exact_at(r, c))
            out[i] = 1;
        }
      binary.swap(out);
      return;
    }
    std::vector<uint8_t> ok(n, 0), up_map(n), ul_map(n), ur_map(n);
    // Horizontal pair, fused per row (left scan + right scan).
    {
      std::vector<uint8_t> lok(w);
      for (int r = 0; r < h; ++r) {
        const uint8_t* b = binary.data() + static_cast<int64_t>(r) * w;
        uint8_t* o = ok.data() + static_cast<int64_t>(r) * w;
        int32_t d = BIG;  // nearest-set distance incl. self at c-1
        for (int c = 0; c < w; ++c) {
          lok[c] = d < R;  // d+1 <= R
          d = b[c] ? 0 : (d < BIG ? d + 1 : BIG);
        }
        d = BIG;
        for (int c = w - 1; c >= 0; --c) {
          o[c] = static_cast<uint8_t>(lok[c] & (d < R));
          d = b[c] ? 0 : (d < BIG ? d + 1 : BIG);
        }
      }
    }
    // Vertical pair + up-left/up-right maps (ascending rows), then
    // down/down-right/down-left combine (descending rows).
    {
      std::vector<int32_t> du(w, BIG), dul(w, BIG), dur(w, BIG);
      for (int r = 0; r < h; ++r) {
        const uint8_t* b = binary.data() + static_cast<int64_t>(r) * w;
        uint8_t* um = up_map.data() + static_cast<int64_t>(r) * w;
        uint8_t* ulm = ul_map.data() + static_cast<int64_t>(r) * w;
        uint8_t* urm = ur_map.data() + static_cast<int64_t>(r) * w;
        for (int c = 0; c < w; ++c) {
          um[c] = du[c] < R;
          du[c] = b[c] ? 0 : (du[c] < BIG ? du[c] + 1 : BIG);
        }
        // UL uses prev-row dul[c-1]: descending c keeps old values readable.
        for (int c = w - 1; c >= 0; --c) {
          const int32_t x = c > 0 ? dul[c - 1] : BIG;
          ulm[c] = x < R;
          dul[c] = b[c] ? 0 : (x < BIG ? x + 1 : BIG);
        }
        // UR uses prev-row dur[c+1]: ascending c keeps old values readable.
        for (int c = 0; c < w; ++c) {
          const int32_t x = c + 1 < w ? dur[c + 1] : BIG;
          urm[c] = x < R;
          dur[c] = b[c] ? 0 : (x < BIG ? x + 1 : BIG);
        }
      }
      std::vector<int32_t> dd(w, BIG), ddr(w, BIG), ddl(w, BIG);
      for (int r = h - 1; r >= 0; --r) {
        const uint8_t* b = binary.data() + static_cast<int64_t>(r) * w;
        const uint8_t* um = up_map.data() + static_cast<int64_t>(r) * w;
        const uint8_t* ulm = ul_map.data() + static_cast<int64_t>(r) * w;
        const uint8_t* urm = ur_map.data() + static_cast<int64_t>(r) * w;
        uint8_t* o = ok.data() + static_cast<int64_t>(r) * w;
        for (int c = 0; c < w; ++c) {
          o[c] = static_cast<uint8_t>(o[c] | (um[c] & (dd[c] < R)));
          dd[c] = b[c] ? 0 : (dd[c] < BIG ? dd[c] + 1 : BIG);
        }
        // DR uses next-row ddr[c+1] (pairs with UL).
        for (int c = 0; c < w; ++c) {
          const int32_t x = c + 1 < w ? ddr[c + 1] : BIG;
          o[c] = static_cast<uint8_t>(o[c] | (ulm[c] & (x < R)));
          ddr[c] = b[c] ? 0 : (x < BIG ? x + 1 : BIG);
        }
        // DL uses next-row ddl[c-1] (pairs with UR).
        for (int c = w - 1; c >= 0; --c) {
          const int32_t x = c > 0 ? ddl[c - 1] : BIG;
          o[c] = static_cast<uint8_t>(o[c] | (urm[c] & (x < R)));
          ddl[c] = b[c] ? 0 : (x < BIG ? x + 1 : BIG);
        }
      }
    }
    for (int r = 0; r < h; ++r) {
      const bool rband = r < R || r >= h - R;
      for (int c = 0; c < w; ++c) {
        const int64_t i = static_cast<int64_t>(r) * w + c;
        if (binary[i]) continue;
        if (!(cnt[i] * inv_bw > bridge_dens_thr)) continue;
        if (rband || c < R || c >= w - R) {
          if (exact_at(r, c)) out[i] = 1;
        } else if (ok[i]) {
          out[i] = 1;
        }
      }
    }
    binary.swap(out);
  };
  bridge(bridge1_gap);
  _sc.lap("bridge1");

  // 8. Border-protected unification.
  {
    // Sobel on the binary mask (reflect-101), separable, compared in squared
    // magnitude: m/gmax > s  <=>  m^2 > s^2 * gmax^2 (all non-negative), so
    // no per-pixel sqrt (may differ from the sqrt form only on exact float
    // ties, which the downstream heuristics tolerate).
    std::vector<int32_t> m2(n);
    int32_t m2max = 0;
    {
      std::vector<int32_t> colsum(w), rowdiff(w);
      for (int r = 0; r < h; ++r) {
        const uint8_t* pm =
            binary.data() + static_cast<int64_t>(reflect101(r - 1, h)) * w;
        const uint8_t* pc = binary.data() + static_cast<int64_t>(r) * w;
        const uint8_t* pp =
            binary.data() + static_cast<int64_t>(reflect101(r + 1, h)) * w;
        for (int c = 0; c < w; ++c) {
          colsum[c] = (pm[c] ? 1 : 0) + 2 * (pc[c] ? 1 : 0) + (pp[c] ? 1 : 0);
          rowdiff[c] = (pp[c] ? 1 : 0) - (pm[c] ? 1 : 0);
        }
        int32_t* o = m2.data() + static_cast<int64_t>(r) * w;
        for (int c = 0; c < w; ++c) {
          const int cm = reflect101(c - 1, w), cp = reflect101(c + 1, w);
          const int32_t gx = colsum[cp] - colsum[cm];
          const int32_t gy = rowdiff[cm] + 2 * rowdiff[c] + rowdiff[cp];
          const int32_t m = gx * gx + gy * gy;
          o[c] = m;
          if (m > m2max) m2max = m;
        }
      }
    }
    std::vector<uint8_t> strong(n);
    const float s2 = border_sens * 0.5f;
    const float thr2 = s2 * s2 * std::max(static_cast<float>(m2max), 1e-24f);
    for (int64_t i = 0; i < n; ++i)
      strong[i] = static_cast<float>(m2[i]) > thr2 ? 1 : 0;
    std::vector<uint8_t> border(strong);
    const auto ones3 = rect_spans(3);
    close_se(border, h, w, ones3);
    std::vector<uint8_t> tmp(n);
    for (int it = 0; it < 2; ++it) {
      dilate_se(border.data(), h, w, ones3, tmp.data());
      border.swap(tmp);
    }
    std::vector<uint8_t> closed_white(binary);
    close_se(closed_white, h, w, rect_spans(protect_kernel));
    for (int64_t i = 0; i < n; ++i)
      if (!binary[i] && closed_white[i] && !border[i]) binary[i] = 1;
  }
  _sc.lap("border");

  bridge(bridge2_gap);
  _sc.lap("bridge2");

  // 10. Fill closed holes: 4-conn components of the inverse within size range.
  {
    std::vector<uint8_t> inv(n);
    for (int64_t i = 0; i < n; ++i) inv[i] = binary[i] ? 0 : 1;
    std::vector<int32_t> labels;
    CompAgg agg;
    const int32_t num =
        components_with_sums(inv.data(), h, w, 4, nullptr, nullptr, labels, agg);
    std::vector<uint8_t> fill(num + 1, 0);
    for (int32_t l = 1; l <= num; ++l)
      fill[l] = agg.area[l] >= fill_min && agg.area[l] <= fill_max;
    for (int64_t i = 0; i < n; ++i)
      if (inv[i] && fill[labels[i]]) binary[i] = 1;
  }
  _sc.lap("fill");

  // 11. Small-region cleanup: close (3x3 rect) then drop tiny components.
  {
    close_se(binary, h, w, rect_spans(3));
    std::vector<int32_t> labels;
    CompAgg agg;
    const int32_t num =
        components_with_sums(binary.data(), h, w, 8, nullptr, nullptr, labels, agg);
    std::vector<uint8_t> keep(num + 1, 0);
    for (int32_t l = 1; l <= num; ++l) keep[l] = agg.area[l] >= clean_min;
    for (int64_t i = 0; i < n; ++i) binary[i] = binary[i] && keep[labels[i]];
  }
  _sc.lap("clean");

  // 12. Buffer-zone split (extract_roi_nonroi).
  std::vector<uint8_t> roi_exp(binary), nonroi_exp(n);
  for (int64_t i = 0; i < n; ++i) nonroi_exp[i] = binary[i] ? 0 : 1;
  dilate_cross(roi_exp, h, w, buffer_size);
  dilate_cross(nonroi_exp, h, w, buffer_size);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t buffer = roi_exp[i] && nonroi_exp[i];
    roi_out[i] = binary[i] || buffer;
    nonroi_out[i] = (!binary[i]) || buffer;
  }
  _sc.lap("buffer");
}

// ---------------------------------------------------------------------------
// Native adaptive-Canny analysis: grayscale conversion, the 20-candidate
// (low, high) table (ops/canny.adaptive_thresholds semantics), and the gray
// gradient/NMS that candidate scoring consumes.  With this the whole
// threshold-selection path runs on host — no device dispatch, no tunnel
// transfer of the (B, h, w) analysis tensors.
// ---------------------------------------------------------------------------

namespace roi {

inline float clipf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void clip_pair(float& low, float& high) {
  low = clipf(low, 10.0f, 200.0f);
  high = clipf(high, low + 10.0f, 255.0f);
}

}  // namespace roi

// gray_out: (h*w) u8; mag_out: (h*w) int32; nms_out: (h*w) u8;
// cands_out: 40 floats = 20 (low, high) pairs in method-major order
// [otsu, percentile, gradient, hybrid] x sens [0.5, 0.7, 1.0, 1.3, 1.5].
void canny_analysis(const uint8_t* rgb, int32_t h, int32_t w,
                    uint8_t* gray_out, int32_t* mag_out, uint8_t* nms_out,
                    float* cands_out) {
  using namespace roi;
  StageClock _sc;
  const int64_t n = static_cast<int64_t>(h) * w;

  // Grayscale: cv2 weights, round-half-even (matches jnp.round).
  for (int64_t i = 0; i < n; ++i) {
    const float y = 0.299f * rgb[3 * i] + 0.587f * rgb[3 * i + 1] +
                    0.114f * rgb[3 * i + 2];
    gray_out[i] = static_cast<uint8_t>(clipf(std::nearbyintf(y), 0.0f, 255.0f));
  }

  // Otsu threshold (first maximum of the between-class variance).
  float otsu = 0.0f;
  {
    int64_t hist[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++hist[gray_out[i]];
    double w0 = 0.0, sum0 = 0.0, mu_total = 0.0;
    for (int b = 0; b < 256; ++b) mu_total += static_cast<double>(hist[b]) * b;
    double best = -1.0;
    int best_t = 0;
    for (int t = 0; t < 256; ++t) {
      w0 += hist[t];
      sum0 += static_cast<double>(hist[t]) * t;
      const double w1 = static_cast<double>(n) - w0;
      if (w0 <= 0.0 || w1 <= 0.0) continue;
      const double mu0 = sum0 / w0;
      const double mu1 = (mu_total - sum0) / w1;
      const double between = w0 * w1 * (mu0 - mu1) * (mu0 - mu1);
      if (between > best) {
        best = between;
        best_t = t;
      }
    }
    otsu = static_cast<float>(best_t);
  }

  // Sobel gradient magnitude statistics on gray (reflect-101 == clamp is NOT
  // equivalent; use reflect-101 like ops/conv.sobel_cv2).  Separable form:
  // colsum = [1,2,1]^T column pass, rowdiff = lower - upper; identical
  // integers and accumulation order to the direct 3x3 stencil (exact int
  // arithmetic, row-major accumulation), but contiguous loads the compiler
  // vectorizes instead of 8 reflect-indexed lookups per pixel.
  std::vector<int32_t> g2(n);  // gx^2 + gy^2 (exact int)
  double mean_acc = 0.0, sq_acc = 0.0;
  {
    std::vector<int32_t> colsum(w), rowdiff(w);
    for (int r = 0; r < h; ++r) {
      const uint8_t* pm =
          gray_out + static_cast<int64_t>(reflect101(r - 1, h)) * w;
      const uint8_t* pc = gray_out + static_cast<int64_t>(r) * w;
      const uint8_t* pp =
          gray_out + static_cast<int64_t>(reflect101(r + 1, h)) * w;
      for (int c = 0; c < w; ++c) {
        colsum[c] = pm[c] + 2 * pc[c] + pp[c];
        rowdiff[c] = static_cast<int32_t>(pp[c]) - pm[c];
      }
      int32_t* gr = g2.data() + static_cast<int64_t>(r) * w;
      for (int c = 0; c < w; ++c) {
        const int cm = reflect101(c - 1, w), cp = reflect101(c + 1, w);
        const int32_t gx = colsum[cp] - colsum[cm];
        const int32_t gy = rowdiff[cm] + 2 * rowdiff[c] + rowdiff[cp];
        const int32_t v = gx * gx + gy * gy;
        gr[c] = v;
        // gm*gm (not v): sqrt-then-square rounding must match the original
        // accumulation bit-for-bit, as must the global pixel-order sums.
        const double gm = std::sqrt(static_cast<double>(v));
        mean_acc += gm;
        sq_acc += gm * gm;
      }
    }
  }
  const float mean_g = static_cast<float>(mean_acc / n);
  const double var =
      sq_acc / n - (mean_acc / n) * (mean_acc / n);
  const float std_g = static_cast<float>(std::sqrt(var > 0.0 ? var : 0.0));

  // p70/p90 of the non-zero gradient magnitudes: rank selection on the exact
  // integer squares, sqrt, then the same linear interpolation as
  // ops/hist.masked_percentile.
  std::vector<int32_t> nzv;
  nzv.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (g2[i] > 0) nzv.push_back(g2[i]);
  const int64_t nz = static_cast<int64_t>(nzv.size());
  float p70 = 0.0f, p90 = 0.0f;
  if (nz > 0) {
    auto pct = [&](float q) -> float {
      const float pos = (nz - 1) * (q / 100.0f);
      int64_t lo = static_cast<int64_t>(std::floor(pos));
      if (lo < 0) lo = 0;
      if (lo > nz - 1) lo = nz - 1;
      int64_t hi = lo + 1 < nz ? lo + 1 : nz - 1;
      const float frac = pos - static_cast<float>(lo);
      std::nth_element(nzv.begin(), nzv.begin() + lo, nzv.end());
      const float vlo = std::sqrt(static_cast<float>(nzv[lo]));
      std::nth_element(nzv.begin(), nzv.begin() + hi, nzv.end());
      const float vhi = std::sqrt(static_cast<float>(nzv[hi]));
      return vlo * (1.0f - frac) + vhi * frac;
    };
    p70 = pct(70.0f);
    p90 = pct(90.0f);
  }

  // Candidate table.
  static const float sens[5] = {0.5f, 0.7f, 1.0f, 1.3f, 1.5f};
  int k = 0;
  for (int i = 0; i < 5; ++i) {  // otsu
    const float s = sens[i];
    float lo = std::max(10.0f, std::floor(otsu * 0.5f * s));
    float hi = std::min(255.0f, std::floor(otsu * 1.5f * s));
    clip_pair(lo, hi);
    cands_out[k++] = lo;
    cands_out[k++] = hi;
  }
  for (int i = 0; i < 5; ++i) {  // percentile
    const float s = sens[i];
    float lo = nz > 0 ? p70 * s : 50.0f * s;
    float hi = nz > 0 ? p90 * s : 150.0f * s;
    lo = std::max(10.0f, std::floor(lo));
    hi = std::min(255.0f, std::floor(hi));
    clip_pair(lo, hi);
    cands_out[k++] = lo;
    cands_out[k++] = hi;
  }
  for (int i = 0; i < 5; ++i) {  // gradient
    const float s = sens[i];
    float lo = std::max(10.0f, std::floor((mean_g - 0.5f * std_g) * s));
    float hi = std::min(255.0f, std::floor((mean_g + 0.5f * std_g) * s));
    clip_pair(lo, hi);
    cands_out[k++] = lo;
    cands_out[k++] = hi;
  }
  for (int i = 0; i < 5; ++i) {  // hybrid
    const float s = sens[i];
    float lo = std::max(10.0f, std::floor((otsu * 0.5f + mean_g * 0.5f) * s));
    float hi = std::min(255.0f, std::floor((otsu * 1.5f + mean_g * 1.0f) * s));
    clip_pair(lo, hi);
    cands_out[k++] = lo;
    cands_out[k++] = hi;
  }

  // Gray gradient/NMS for candidate scoring (cv2.Canny semantics: replicate
  // border, L1 magnitude).
  roi::gradient_nms(gray_out, h, w, 1, mag_out, nms_out);
}

// Color gradient/NMS (the final-Canny analysis get_edge_map consumes).
void gradient_nms_rgb(const uint8_t* rgb, int32_t h, int32_t w, int32_t* mag,
                      uint8_t* nms) {
  roi::gradient_nms(rgb, h, w, 3, mag, nms);
}

// Score all (low, high) candidates in one call (evaluate_edge_quality,
// encoder/ROI/edges.py:73-85): per candidate, hysteresis components of the
// weak graph that contain a strong pixel; score = mean kept-component size
// x population std of gray at kept-edge pixels.  First best wins (strict >).
// Returns the best candidate index, or 0 when nothing scores.
int32_t score_candidates(const uint8_t* gray, const int32_t* mag,
                         const uint8_t* nms, int32_t h, int32_t w,
                         const float* cands, int32_t n_cands) {
  // Incremental (Kruskal-style) evaluation: activate NMS pixels in DESCENDING
  // magnitude order; the weak graph at threshold `low` is exactly the active
  // set after all pixels with mag > low joined.  Candidates group by their
  // low value (processed descending), each snapshot scores its highs against
  // the live component roots.  One amortized union-find pass covers all 20
  // candidates; gray sums are integer-valued doubles (< 2^53), so the scores
  // match the per-candidate reference evaluation bit-for-bit.
  const int64_t n = static_cast<int64_t>(h) * w;
  const int32_t MAXMAG = 8 * 255 + 1;  // L1 sobel magnitude bound
  // Counting sort of NMS pixels by magnitude, descending.
  std::vector<int32_t> counts(MAXMAG + 1, 0);
  int64_t n_nms = 0;
  for (int64_t i = 0; i < n; ++i)
    if (nms[i]) {
      ++counts[mag[i]];
      ++n_nms;
    }
  std::vector<int64_t> start(MAXMAG + 2, 0);
  // order[] holds pixel ids sorted by descending mag.
  int64_t acc = 0;
  for (int32_t v = MAXMAG; v >= 0; --v) {
    start[v] = acc;
    acc += counts[v];
  }
  std::vector<int32_t> order(n_nms);
  {
    std::vector<int64_t> pos(MAXMAG + 1);
    for (int32_t v = 0; v <= MAXMAG; ++v) pos[v] = start[v];
    for (int64_t i = 0; i < n; ++i)
      if (nms[i]) order[pos[mag[i]]++] = static_cast<int32_t>(i);
  }

  std::vector<int32_t> parent(n, -1);  // -1 = inactive
  std::vector<int64_t> csize(n, 0);
  std::vector<double> cs(n, 0.0), cs2(n, 0.0);
  std::vector<int32_t> cmax(n, 0);
  std::vector<int32_t> roots;
  roots.reserve(1 << 16);

  auto rfind = [&](int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      const int32_t nx = parent[x];
      parent[x] = root;
      x = nx;
    }
    return root;
  };

  // Candidate lows, distinct, descending.
  std::vector<int32_t> cand_order(n_cands);
  for (int32_t k = 0; k < n_cands; ++k) cand_order[k] = k;
  std::sort(cand_order.begin(), cand_order.end(), [&](int32_t a, int32_t b) {
    return cands[2 * a] > cands[2 * b];
  });

  std::vector<double> scores(n_cands, -1.0);
  std::vector<uint8_t> valid(n_cands, 0);

  // Identical (low, high) pairs (the sensitivity table frequently clips
  // several methods onto the same pair) score identically: compute each
  // unique pair once and copy to duplicates — the strict-> argmax keeps the
  // first index either way, so the selected candidate is unchanged.
  std::vector<int32_t> dup_of(n_cands, -1);
  for (int32_t a = 0; a < n_cands; ++a)
    for (int32_t b = 0; b < a; ++b)
      if (cands[2 * a] == cands[2 * b] &&
          cands[2 * a + 1] == cands[2 * b + 1]) {
        dup_of[a] = b;
        break;
      }

  int64_t next_pix = 0;
  int32_t ci = 0;
  while (ci < n_cands) {
    const float low = cands[2 * cand_order[ci]];
    // Activate all pixels with mag > low.
    while (next_pix < n_nms &&
           static_cast<float>(mag[order[next_pix]]) > low) {
      const int32_t p = order[next_pix++];
      parent[p] = p;
      csize[p] = 1;
      const double g = gray[p];
      cs[p] = g;
      cs2[p] = g * g;
      cmax[p] = mag[p];
      roots.push_back(p);
      const int32_t r = p / w, c = p % w;
      for (int dr = -1; dr <= 1; ++dr) {
        for (int dc = -1; dc <= 1; ++dc) {
          if (!dr && !dc) continue;
          const int32_t rr = r + dr, cc = c + dc;
          if (rr < 0 || rr >= h || cc < 0 || cc >= w) continue;
          const int32_t q = rr * w + cc;
          if (parent[q] < 0) continue;
          const int32_t ra = rfind(p), rb = rfind(q);
          if (ra == rb) continue;
          const int32_t keep = ra < rb ? ra : rb, dead = ra < rb ? rb : ra;
          parent[dead] = keep;
          csize[keep] += csize[dead];
          cs[keep] += cs[dead];
          cs2[keep] += cs2[dead];
          if (cmax[dead] > cmax[keep]) cmax[keep] = cmax[dead];
        }
      }
    }
    // Compact the alive-roots list once per snapshot.
    size_t out = 0;
    for (size_t i = 0; i < roots.size(); ++i)
      if (parent[roots[i]] == roots[i]) roots[out++] = roots[i];
    roots.resize(out);
    // Score every candidate sharing this low.
    while (ci < n_cands && cands[2 * cand_order[ci]] == low) {
      const int32_t k = cand_order[ci++];
      if (dup_of[k] >= 0) continue;  // scored via its first occurrence
      const float high = cands[2 * k + 1];
      int64_t n_comp = 0, n_edge = 0;
      double s = 0.0, s2 = 0.0;
      for (const int32_t rt : roots) {
        if (static_cast<float>(cmax[rt]) > high) {
          ++n_comp;
          n_edge += csize[rt];
          s += cs[rt];
          s2 += cs2[rt];
        }
      }
      if (n_comp == 0) continue;
      const double mu = s / n_edge;
      const double var = s2 / n_edge - mu * mu;
      const double contrast = std::sqrt(var > 0.0 ? var : 0.0);
      scores[k] = (static_cast<double>(n_edge) / n_comp) * contrast;
      valid[k] = 1;
    }
  }
  for (int32_t k = 0; k < n_cands; ++k)
    if (dup_of[k] >= 0) {
      scores[k] = scores[dup_of[k]];
      valid[k] = valid[dup_of[k]];
    }
  int32_t best = 0;
  double best_score = -1.0;
  bool any = false;
  for (int32_t k = 0; k < n_cands; ++k) {
    if (valid[k] && scores[k] > best_score) {
      best_score = scores[k];
      best = k;
      any = true;
    }
  }
  return any ? best : 0;
}

// ---------------------------------------------------------------------------
// Sort-unique with inverse for int64 keys (np.unique(return_inverse=True)
// replacement).  The tier-1 pair table packs (segment, color) into int64 keys
// over ~half a megapixel per image; np.unique's argsort was a measured hot
// spot of the batched encode.  Radix sort (8 byte passes, LSB-first) over a
// (key, original-index) pair array.
// ---------------------------------------------------------------------------

// keys: (n) int64 (any values; interpreted as uint64 after sign-bias, so
// negative keys sort before positive ones like np.unique).
// uniq_out: capacity n; inverse_out: (n) int64.  Returns unique count.
namespace rsort {

struct KV {
  uint64_t k;
  int64_t i;
};

// Reusable scratch: grown once, then no page-faulting reallocation per call
// (fresh 100 MB allocations caused multi-second first-touch storms on the
// single-core VM).
inline std::vector<KV>& buf_a() {
  static thread_local std::vector<KV> v;
  return v;
}
inline std::vector<KV>& buf_b() {
  static thread_local std::vector<KV> v;
  return v;
}

// Sorts (key, payload-index) pairs that the caller wrote into buf_a()[0..n).
// Returns a pointer to the sorted run (buf_a or buf_b storage).
inline KV* radix_sort(int64_t n) {
  auto& a = buf_a();
  auto& b = buf_b();
  if (static_cast<int64_t>(b.size()) < n) b.resize(n);
  static thread_local int64_t counts[8][256];
  std::memset(counts, 0, sizeof(counts));
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t k = a[i].k;
    ++counts[0][k & 0xFF];
    ++counts[1][(k >> 8) & 0xFF];
    ++counts[2][(k >> 16) & 0xFF];
    ++counts[3][(k >> 24) & 0xFF];
    ++counts[4][(k >> 32) & 0xFF];
    ++counts[5][(k >> 40) & 0xFF];
    ++counts[6][(k >> 48) & 0xFF];
    ++counts[7][(k >> 56) & 0xFF];
  }
  KV* src = a.data();
  KV* dst = b.data();
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    bool trivial = false;
    for (int v = 0; v < 256; ++v)
      if (counts[pass][v] == n) { trivial = true; break; }
    if (trivial) continue;
    int64_t pos[256];
    int64_t acc = 0;
    for (int v = 0; v < 256; ++v) {
      pos[v] = acc;
      acc += counts[pass][v];
    }
    for (int64_t i = 0; i < n; ++i) dst[pos[(src[i].k >> shift) & 0xFF]++] = src[i];
    std::swap(src, dst);
  }
  return src;
}

}  // namespace rsort

// counts_out may be null; when given it receives the multiplicity of each
// unique key (saves a full-size bincount pass for the weighted-palette law).
int64_t sort_unique_inverse(const int64_t* keys, int64_t n, int64_t* uniq_out,
                            int64_t* inverse_out, int64_t* counts_out) {
  if (n <= 0) return 0;
  const uint64_t bias = 0x8000000000000000ull;  // order-preserving for int64
  auto& a = rsort::buf_a();
  if (static_cast<int64_t>(a.size()) < n) a.resize(n);
  for (int64_t i = 0; i < n; ++i)
    a[i] = {static_cast<uint64_t>(keys[i]) ^ bias, i};
  const rsort::KV* src = rsort::radix_sort(n);
  int64_t m = 0;
  uint64_t prev = src[0].k + 1;  // guaranteed different from src[0].k
  for (int64_t i = 0; i < n; ++i) {
    if (src[i].k != prev) {
      prev = src[i].k;
      uniq_out[m] = static_cast<int64_t>(src[i].k ^ bias);
      if (counts_out) counts_out[m] = 0;
      ++m;
    }
    if (counts_out) counts_out[m - 1] += 1;
    inverse_out[src[i].i] = m - 1;
  }
  return m;
}

// Stable argsort of int64 keys via the shared radix machinery (LSD radix is
// stable, so equal keys keep input order — matches np.argsort(kind='stable')).
void argsort_i64(const int64_t* keys, int64_t n, int64_t* order_out) {
  if (n <= 0) return;
  const uint64_t bias = 0x8000000000000000ull;
  auto& a = rsort::buf_a();
  if (static_cast<int64_t>(a.size()) < n) a.resize(n);
  for (int64_t i = 0; i < n; ++i)
    a[i] = {static_cast<uint64_t>(keys[i]) ^ bias, i};
  const rsort::KV* src = rsort::radix_sort(n);
  for (int64_t i = 0; i < n; ++i) order_out[i] = src[i].i;
}

// Pair-table construction for tier-1: one pass over the tall (n, 3) image +
// (n,) segment map builds, sorts and dedups the (segment, color) pair table.
// Replaces ~6 full-size NumPy temporaries (pack, key, mask-compact, unique)
// with one native call into reusable scratch.
//
// uniq_out: (capacity n) packed keys seg<<24|r<<16|g<<8|b, sorted unique.
// inverse_out: one entry per seg>0 pixel in row-major scan order.
// counts_out: pixels per unique pair (the weighted-palette pixel counts).
// Returns the unique-pair count.
int64_t pack_pairs(const uint8_t* rgb, const int32_t* seg, int64_t n,
                   int64_t* uniq_out, int64_t* inverse_out,
                   int64_t* counts_out) {
  auto& a = rsort::buf_a();
  if (static_cast<int64_t>(a.size()) < n) a.resize(n);
  int64_t m = 0;  // masked pixel count
  for (int64_t i = 0; i < n; ++i) {
    if (seg[i] <= 0) continue;
    const uint64_t key = (static_cast<uint64_t>(seg[i]) << 24) |
                         (static_cast<uint64_t>(rgb[3 * i]) << 16) |
                         (static_cast<uint64_t>(rgb[3 * i + 1]) << 8) |
                         rgb[3 * i + 2];
    a[m] = {key, m};
    ++m;
  }
  if (m == 0) return 0;
  // Keys are non-negative, so no sign bias is needed.
  const rsort::KV* src = rsort::radix_sort(m);
  int64_t u = 0;
  uint64_t prev = src[0].k + 1;
  for (int64_t i = 0; i < m; ++i) {
    if (src[i].k != prev) {
      prev = src[i].k;
      uniq_out[u] = static_cast<int64_t>(src[i].k);
      counts_out[u] = 0;
      ++u;
    }
    counts_out[u - 1] += 1;
    inverse_out[src[i].i] = u - 1;
  }
  return u;
}

// Per-segment black repair on the sorted unique pair table (tier-1).
// Keys are seg<<24|rgb sorted ascending, so a segment's black pair
// (rgb == 0) is always the FIRST entry of its run.  Each black pair in a
// segment that also has non-black colors is remapped onto the run's darkest
// (min r^2+g^2+b^2, lowest index on ties) non-black pair — the reference's
// "nearest to [0,0,0]" repair rule (encoder/compression/subregions.py:
// 392-421) expressed on the pair table.  The table is compacted in place
// (order preserved), pixel counts fold into the repair target, and
// `inverse` is rewritten through the compaction.  `remap` is caller scratch
// of n_pairs entries; on return it holds old-pair -> new-pair ids.
// Returns the compacted pair count.
int64_t black_repair_pairs(int64_t* uniq, int64_t* counts, int64_t n_pairs,
                           int64_t* inverse, int64_t n_masked,
                           int64_t* remap) {
  if (n_pairs <= 0) return n_pairs;
  int64_t i = 0;
  while (i < n_pairs) {
    const int64_t seg = uniq[i] >> 24;
    int64_t j = i;
    while (j < n_pairs && (uniq[j] >> 24) == seg) ++j;
    const bool has_black = (uniq[i] & 0xFFFFFF) == 0;
    if (has_black && j - i > 1) {
      int64_t best = i + 1;
      int64_t best_n2 = INT64_MAX;
      for (int64_t p = i + 1; p < j; ++p) {
        const int64_t c = uniq[p] & 0xFFFFFF;
        const int64_t r = (c >> 16) & 0xFF;
        const int64_t g = (c >> 8) & 0xFF;
        const int64_t b = c & 0xFF;
        const int64_t n2 = r * r + g * g + b * b;
        if (n2 < best_n2) {
          best_n2 = n2;
          best = p;
        }
      }
      remap[i] = best;
      counts[best] += counts[i];
      for (int64_t p = i + 1; p < j; ++p) remap[p] = p;
    } else {
      for (int64_t p = i; p < j; ++p) remap[p] = p;
    }
    i = j;
  }
  // Compact kept pairs (remap[p] == p) in place; dropped black pairs sit at
  // run starts so the write index never passes the read index.
  std::vector<int64_t> newid(n_pairs);
  int64_t m = 0;
  for (int64_t p = 0; p < n_pairs; ++p) {
    if (remap[p] == p) {
      newid[p] = m;
      uniq[m] = uniq[p];
      counts[m] = counts[p];
      ++m;
    }
  }
  for (int64_t p = 0; p < n_pairs; ++p) remap[p] = newid[remap[p]];
  for (int64_t q = 0; q < n_masked; ++q) inverse[q] = remap[inverse[q]];
  return m;
}

// Masked color writeback: for the j-th masked pixel (row-major scan order),
// out[i] = table[idx1 ? idx1[inverse[j]] : inverse[j]].  Replaces the
// NumPy gather + boolean-scatter chain that dominated the tier writebacks
// at large image sizes.  Unmasked pixels are left untouched.
void paint_masked_colors(const uint8_t* table, const int64_t* idx1,
                         const int64_t* inverse, const uint8_t* mask,
                         int64_t n_pixels, uint8_t* out) {
  int64_t j = 0;
  for (int64_t i = 0; i < n_pixels; ++i) {
    if (!mask[i]) continue;
    int64_t p = inverse[j++];
    if (idx1) p = idx1[p];
    const uint8_t* c = table + 3 * p;
    uint8_t* o = out + 3 * i;
    o[0] = c[0];
    o[1] = c[1];
    o[2] = c[2];
  }
}

// Palette-index writeback: for the j-th masked pixel (row-major scan
// order), out[i] = idx_of_pair[inverse[j]] narrowed to item_size bytes
// (1/2/4 — the container's minimal index dtype).  Unmasked pixels are left
// untouched (callers pre-zero: background black is index 0 by palette
// construction).  This is the ONE per-pixel pass of the composed tier
// pipeline.
void paint_masked_indices(const int32_t* idx_of_pair, const int64_t* inverse,
                          const uint8_t* mask, int64_t n_pixels,
                          int32_t item_size, void* out) {
  int64_t j = 0;
  if (item_size == 1) {
    uint8_t* o = static_cast<uint8_t*>(out);
    for (int64_t i = 0; i < n_pixels; ++i)
      if (mask[i]) o[i] = static_cast<uint8_t>(idx_of_pair[inverse[j++]]);
  } else if (item_size == 2) {
    uint16_t* o = static_cast<uint16_t*>(out);
    for (int64_t i = 0; i < n_pixels; ++i)
      if (mask[i]) o[i] = static_cast<uint16_t>(idx_of_pair[inverse[j++]]);
  } else {
    uint32_t* o = static_cast<uint32_t*>(out);
    for (int64_t i = 0; i < n_pixels; ++i)
      if (mask[i]) o[i] = static_cast<uint32_t>(idx_of_pair[inverse[j++]]);
  }
}

// Tier-2/3 pooled packing: write tag<<24|rgb keys for selected pixels into
// out (row-major sel order).  Returns the number of keys written.
int64_t pack_sel(const uint8_t* colors, const uint8_t* sel, int64_t n,
                 int64_t tag, int64_t* out) {
  const uint64_t t = static_cast<uint64_t>(tag) << 24;
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!sel[i]) continue;
    const uint64_t key = t | (static_cast<uint64_t>(colors[3 * i]) << 16) |
                         (static_cast<uint64_t>(colors[3 * i + 1]) << 8) |
                         colors[3 * i + 2];
    out[m++] = static_cast<int64_t>(key);
  }
  return m;
}

// Weighted per-cluster mean colors, truncated to uint8 (the tier means,
// reference clustering.py:305,347).  colors_packed is r<<16|g<<8|b per pair;
// weights may be null (unweighted).  Accumulation order matches
// np.bincount's sequential pass so results are bit-identical to the NumPy
// float64 path.
void cluster_means_u8(const int64_t* cluster, const int32_t* colors_packed,
                      const double* weights, int64_t n_pairs,
                      int64_t n_clusters, uint8_t* out) {
  std::vector<double> acc(static_cast<size_t>(n_clusters) * 4, 0.0);
  for (int64_t i = 0; i < n_pairs; ++i) {
    const double w = weights ? weights[i] : 1.0;
    const int32_t c = colors_packed[i];
    double* a = &acc[static_cast<size_t>(cluster[i]) * 4];
    a[0] += w * ((c >> 16) & 0xFF);
    a[1] += w * ((c >> 8) & 0xFF);
    a[2] += w * (c & 0xFF);
    a[3] += w;
  }
  for (int64_t k = 0; k < n_clusters; ++k) {
    const double* a = &acc[static_cast<size_t>(k) * 4];
    const double d = a[3] > 0.0 ? a[3] : 1.0;
    out[3 * k] = static_cast<uint8_t>(a[0] / d);
    out[3 * k + 1] = static_cast<uint8_t>(a[1] / d);
    out[3 * k + 2] = static_cast<uint8_t>(a[2] / d);
  }
}

// Per-label areas + bounding boxes in one pass (replaces four NumPy
// ufunc.at extrema sweeps in ops/cc.component_stats).  bboxes_out rows are
// (minr, minc, maxr+1, maxc+1) int32, zeroed for empty labels.
void component_stats(const int32_t* labels, int64_t h, int64_t w,
                     int32_t num_labels, int64_t* areas_out,
                     int32_t* bboxes_out) {
  for (int32_t l = 0; l < num_labels; ++l) {
    areas_out[l] = 0;
    int32_t* b = bboxes_out + 4 * l;
    b[0] = static_cast<int32_t>(h);
    b[1] = static_cast<int32_t>(w);
    b[2] = 0;
    b[3] = 0;
  }
  for (int64_t r = 0; r < h; ++r) {
    const int32_t* row = labels + r * w;
    for (int64_t c = 0; c < w; ++c) {
      const int32_t l = row[c];
      areas_out[l] += 1;
      int32_t* b = bboxes_out + 4 * l;
      if (r < b[0]) b[0] = static_cast<int32_t>(r);
      if (c < b[1]) b[1] = static_cast<int32_t>(c);
      if (r >= b[2]) b[2] = static_cast<int32_t>(r + 1);
      if (c >= b[3]) b[3] = static_cast<int32_t>(c + 1);
    }
  }
  for (int32_t l = 0; l < num_labels; ++l) {
    if (areas_out[l] == 0) {
      int32_t* b = bboxes_out + 4 * l;
      b[0] = b[1] = b[2] = b[3] = 0;
    }
  }
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

void roi_pipeline(const uint8_t* rgb, int32_t h, int32_t w, const int32_t* ip,
                  const float* fp, uint8_t* roi_out, uint8_t* nonroi_out) {
  roi_pipeline_pre(rgb, h, w, ip, fp, nullptr, nullptr, roi_out, nonroi_out);
}

// ---------------------------------------------------------------------------
// One-pass unpack of the device pair-table download (ops/pairs.py).  The
// NumPy equivalent was ~6 full passes over the table (uint32 views, shifts,
// masks, astype, or) on the single host core.
// ---------------------------------------------------------------------------

// packed (n, 2) uint32 rows: a = seg<<16 | count_lo16, b = count_hi8<<24 |
// col24 (ops/pairs._pair_compact_packed).  Emits uniq = seg<<24 | col (the
// pack_pairs key layout) and the pixel counts.
void unpack_pair_table_u32(const uint32_t* packed, int64_t n, int64_t* uniq,
                           int64_t* counts) {
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t a = packed[2 * i];
    const uint32_t b = packed[2 * i + 1];
    const int64_t seg = a >> 16;
    const int64_t col = b & 0xFFFFFF;
    uniq[i] = (seg << 24) | col;
    counts[i] = static_cast<int64_t>(a & 0xFFFF) |
                (static_cast<int64_t>(b >> 24) << 16);
  }
}

// rows (n, 3) int32: [seg, col24, count] (ops/pairs._pair_compact).
void unpack_pair_table_i32(const int32_t* rows, int64_t n, int64_t* uniq,
                           int64_t* counts) {
  for (int64_t i = 0; i < n; ++i) {
    uniq[i] = (static_cast<int64_t>(rows[3 * i]) << 24) |
              static_cast<int64_t>(rows[3 * i + 1]);
    counts[i] = rows[3 * i + 2];
  }
}

// Post-repair split of the sorted uniq keys into the tier-1 working arrays:
// seg/col int32 plus the float32 RGB colors table (models/quantize_batched.
// tier1_table ran three full-table NumPy passes for this).
void split_pair_uniq(const int64_t* uniq, int64_t m, int32_t* seg,
                     int32_t* col, float* colors) {
  for (int64_t i = 0; i < m; ++i) {
    const int64_t u = uniq[i];
    const int32_t c = static_cast<int32_t>(u & 0xFFFFFF);
    seg[i] = static_cast<int32_t>(u >> 24);
    col[i] = c;
    colors[3 * i] = static_cast<float>((c >> 16) & 0xFF);
    colors[3 * i + 1] = static_cast<float>((c >> 8) & 0xFF);
    colors[3 * i + 2] = static_cast<float>(c & 0xFF);
  }
}

// Equal-run starts/sizes of an already-sorted int64 array in one pass —
// replaces the NumPy diff/flatnonzero/diff/concat chain in
// models/quantize_batched._runs_of_sorted (the split recursion calls it
// every level over the full pair table; np.diff alone profiled at
// ~0.1 s/batch).  starts/sizes must have capacity n; returns the run count.
int64_t runs_of_sorted_i64(const int64_t* a, int64_t n, int64_t* starts,
                           int64_t* sizes) {
  if (n <= 0) return 0;
  int64_t r = 0;
  int64_t start = 0;
  int64_t prev = a[0];
  for (int64_t i = 1; i < n; ++i) {
    if (a[i] != prev) {
      starts[r] = start;
      sizes[r] = i - start;
      ++r;
      start = i;
      prev = a[i];
    }
  }
  starts[r] = start;
  sizes[r] = n - start;
  return r + 1;
}

// Flat enumeration of every point of m runs: pos = starts[row] + within.
// One pass over the output replaces three np.repeat passes + an arange
// (models/quantize_batched._flat_run_positions).  Output capacity is
// sum(sizes) (the caller sizes it).
void flat_run_positions(const int64_t* starts, const int64_t* sizes,
                        int64_t m, int64_t* pos, int64_t* row,
                        int64_t* within) {
  int64_t k = 0;
  for (int64_t r = 0; r < m; ++r) {
    const int64_t s = starts[r];
    const int64_t sz = sizes[r];
    for (int64_t j = 0; j < sz; ++j, ++k) {
      pos[k] = s + j;
      row[k] = r;
      within[k] = j;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Exact eps-connectivity components (DBSCAN min_samples=1 — reference
// encoder/compression/clustering.py:233-235) over runs of a sorted pair
// table, via grid-hashed union-find.
//
// Labels match ops/cluster.eps_components exactly: each point gets the
// minimum point index (run-local) of its eps-component.  The predicate is
// the device kernel's: (float)d2 <= eps2 with d2 the integer squared
// distance (<= 3*255^2 < 2^24, exactly representable in float32, so the
// comparison is bit-identical to the MXU HIGHEST-precision path).
//
// Grid: cell edge = max(1, floor(eps/sqrt(3))), so two points in one cell
// are always within eps (cell diagonal <= eps) and union for free; cell
// pairs whose minimum box distance exceeds eps are pruned; the remaining
// cell pairs scan cross pairs but stop at the FIRST connecting edge (each
// cell is one UF component after the within-cell union, so one edge
// suffices).  Palette runs are <10k points (>=10k switches to k-means,
// clustering.py:207), so per-run sort + binary-searched neighbor lookups
// are microseconds; the device kernel's O(n^2 * sweeps) distance waves
// (and their dispatch latency) are gone.
// ---------------------------------------------------------------------------

namespace {
struct EpsUF {
  std::vector<int32_t> parent;
  int32_t components = 0;
  void reset(int32_t n) {
    parent.resize(n);
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
    components = n;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  // Union with root = MIN member index (the device kernel's label choice).
  void unite(int32_t a, int32_t b) {
    int32_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (ra < rb) parent[rb] = ra; else parent[ra] = rb;
    --components;
  }
};
}  // namespace

extern "C" {

// labels_out is written run-major (concatenated runs, length sum(sizes)).
void epscc_grid_labels(const int32_t* colors_packed, const int64_t* starts,
                       const int64_t* sizes, const float* eps2_arr,
                       int64_t n_runs, int32_t* labels_out) {
  EpsUF uf;
  std::vector<int64_t> ckey_idx;            // (cellkey << 32 | local idx)
  std::vector<int64_t> cell_start;          // offsets into ckey_idx per cell
  std::vector<int64_t> cell_key;            // sorted distinct cell keys
  int64_t out_off = 0;
  for (int64_t r = 0; r < n_runs; ++r) {
    const int64_t n = sizes[r];
    if (n <= 0) continue;
    const int32_t* pts = colors_packed + starts[r];
    int32_t* out = labels_out + out_off;
    out_off += n;
    if (n == 1) { out[0] = 0; continue; }
    const float eps2 = eps2_arr[r];
    const double eps = std::sqrt(static_cast<double>(eps2));
    const int32_t cell =
        std::max<int32_t>(1, static_cast<int32_t>(eps / 1.7320508075688772));
    const int32_t R = static_cast<int32_t>(std::ceil(eps / cell));
    const int64_t g = (256 + cell - 1) / cell;  // cells per axis

    uf.reset(static_cast<int32_t>(n));
    // Sort local indices by cell key (key fits: g^3 <= 256^3 = 2^24; n < 2^20).
    ckey_idx.clear();
    ckey_idx.resize(n);
    const int64_t n_cells_total = g * g * g;
    if (n_cells_total <= 32768) {
      // Counting sort over the dense cell space: the default-quality radii
      // (eps = 128 - 1.28q -> cell 59-66, g = 4-5, <= 125 cells) make the
      // comparison sort the run's dominant cost; this is O(n + g^3) with
      // identical (key, index) ordering (indices placed in ascending order
      // per cell == std::sort of key<<32|i).
      std::vector<int32_t> keys(n);
      std::vector<int64_t> hist(n_cells_total + 1, 0);
      for (int64_t i = 0; i < n; ++i) {
        const int32_t c = pts[i];
        const int32_t cx = ((c >> 16) & 0xFF) / cell;
        const int32_t cy = ((c >> 8) & 0xFF) / cell;
        const int32_t cz = (c & 0xFF) / cell;
        keys[i] = static_cast<int32_t>((cx * g + cy) * g + cz);
        ++hist[keys[i] + 1];
      }
      for (int64_t k = 0; k < n_cells_total; ++k) hist[k + 1] += hist[k];
      for (int64_t i = 0; i < n; ++i) {
        ckey_idx[hist[keys[i]]++] =
            (static_cast<int64_t>(keys[i]) << 32) | i;
      }
    } else {
      for (int64_t i = 0; i < n; ++i) {
        const int32_t c = pts[i];
        const int64_t cx = ((c >> 16) & 0xFF) / cell;
        const int64_t cy = ((c >> 8) & 0xFF) / cell;
        const int64_t cz = (c & 0xFF) / cell;
        ckey_idx[i] = (((cx * g + cy) * g + cz) << 32) | i;
      }
      std::sort(ckey_idx.begin(), ckey_idx.end());
    }
    cell_start.clear();
    cell_key.clear();
    int64_t prev = -1;
    for (int64_t j = 0; j < n; ++j) {
      const int64_t ck = ckey_idx[j] >> 32;
      if (ck != prev) {
        cell_start.push_back(j);
        cell_key.push_back(ck);
        prev = ck;
      }
    }
    cell_start.push_back(n);
    const int64_t n_cells = static_cast<int64_t>(cell_key.size());

    // Within-cell union (cell diagonal <= eps by construction of `cell`;
    // for cell == 1 members are identical coordinates, also fine) + the
    // cell's point bounding box (prunes the cross-cell scans below).
    std::vector<int32_t> blo(n_cells * 3), bhi(n_cells * 3);
    for (int64_t ci = 0; ci < n_cells; ++ci) {
      const int32_t first =
          static_cast<int32_t>(ckey_idx[cell_start[ci]] & 0xFFFFFFFFLL);
      int32_t lo0 = 255, lo1 = 255, lo2 = 255, hi0 = 0, hi1 = 0, hi2 = 0;
      for (int64_t j = cell_start[ci]; j < cell_start[ci + 1]; ++j) {
        const int32_t idx = static_cast<int32_t>(ckey_idx[j] & 0xFFFFFFFFLL);
        if (j > cell_start[ci]) uf.unite(first, idx);
        const int32_t c = pts[idx];
        const int32_t r0 = (c >> 16) & 0xFF, g1 = (c >> 8) & 0xFF,
                      b0 = c & 0xFF;
        if (r0 < lo0) lo0 = r0;
        if (r0 > hi0) hi0 = r0;
        if (g1 < lo1) lo1 = g1;
        if (g1 > hi1) hi1 = g1;
        if (b0 < lo2) lo2 = b0;
        if (b0 > hi2) hi2 = b0;
      }
      blo[ci * 3] = lo0; blo[ci * 3 + 1] = lo1; blo[ci * 3 + 2] = lo2;
      bhi[ci * 3] = hi0; bhi[ci * 3 + 1] = hi1; bhi[ci * 3 + 2] = hi2;
    }

    // Cross-cell edges: for each occupied cell, probe occupied neighbor
    // cells with a LARGER key (each unordered pair checked once).  When the
    // run has collapsed to ONE component every remaining probe/scan is a
    // no-op (labels are the run minimum regardless) — exact early exit that
    // skips the expensive non-connecting ambiguous scans; at the default
    // ROI radius (eps = 102.4) most runs are a single eps-component.
    for (int64_t ci = 0; ci < n_cells && uf.components > 1; ++ci) {
      const int64_t ck = cell_key[ci];
      const int64_t cz = ck % g, cy = (ck / g) % g, cx = ck / (g * g);
      for (int32_t dx = 0; dx <= R; ++dx) {
        if (cx + dx >= g) break;
        const int64_t lbx = dx > 0 ? (int64_t)(dx - 1) * cell + 1 : 0;
        if ((double)lbx * lbx > eps2) break;
        const int32_t dy_lo = dx == 0 ? 0 : -R;
        for (int32_t dy = dy_lo; dy <= R; ++dy) {
          const int64_t ny = cy + dy;
          if (ny < 0 || ny >= g) continue;
          const int64_t lby = std::abs(dy) > 0
              ? (int64_t)(std::abs(dy) - 1) * cell + 1 : 0;
          if ((double)(lbx * lbx + lby * lby) > eps2) continue;
          const int32_t dz_lo = (dx == 0 && dy == 0) ? 1 : -R;
          for (int32_t dz = dz_lo; dz <= R; ++dz) {
            const int64_t nz = cz + dz;
            if (nz < 0 || nz >= g) continue;
            const int64_t lbz = std::abs(dz) > 0
                ? (int64_t)(std::abs(dz) - 1) * cell + 1 : 0;
            if ((double)(lbx * lbx + lby * lby + lbz * lbz) > eps2) continue;
            const int64_t nk = ((cx + dx) * g + ny) * g + nz;
            // Binary search the occupied-cell list (sorted by key).
            const auto it =
                std::lower_bound(cell_key.begin() + ci + 1, cell_key.end(), nk);
            if (it == cell_key.end() || *it != nk) continue;
            const int64_t cj = it - cell_key.begin();
            const int32_t pi =
                static_cast<int32_t>(ckey_idx[cell_start[ci]] & 0xFFFFFFFFLL);
            const int32_t pj =
                static_cast<int32_t>(ckey_idx[cell_start[cj]] & 0xFFFFFFFFLL);
            if (uf.find(pi) == uf.find(pj)) continue;
            // Point-bbox pruning: min-possible pair distance > eps -> no
            // edge exists (skip the scan); max-possible <= eps -> every
            // pair connects (union without scanning).  Both bounds use the
            // same f32 predicate as the scan.
            {
              int64_t dmin2 = 0, dmax2 = 0;
              for (int a2 = 0; a2 < 3; ++a2) {
                const int32_t l1 = blo[ci * 3 + a2], h1 = bhi[ci * 3 + a2];
                const int32_t l2 = blo[cj * 3 + a2], h2 = bhi[cj * 3 + a2];
                const int32_t sep = l2 > h1 ? l2 - h1 : (l1 > h2 ? l1 - h2 : 0);
                dmin2 += static_cast<int64_t>(sep) * sep;
                const int32_t span = std::max(h2 - l1, h1 - l2);
                dmax2 += static_cast<int64_t>(span) * span;
              }
              if (static_cast<float>(dmin2) > eps2) continue;
              if (static_cast<float>(dmax2) <= eps2) {
                uf.unite(pi, pj);
                continue;
              }
            }
            // One connecting edge merges the two single-component cells.
            bool done = false;
            for (int64_t a = cell_start[ci]; a < cell_start[ci + 1] && !done;
                 ++a) {
              const int32_t ia = static_cast<int32_t>(ckey_idx[a] & 0xFFFFFFFFLL);
              const int32_t ca = pts[ia];
              const int64_t ar = (ca >> 16) & 0xFF, ag = (ca >> 8) & 0xFF,
                            ab = ca & 0xFF;
              // Point-to-bbox prune: a cannot reach ANY point of cj unless
              // it is within eps of cj's point bbox.
              {
                int64_t pd2 = 0;
                const int32_t av[3] = {static_cast<int32_t>(ar),
                                       static_cast<int32_t>(ag),
                                       static_cast<int32_t>(ab)};
                for (int a2 = 0; a2 < 3; ++a2) {
                  const int32_t l2 = blo[cj * 3 + a2], h2 = bhi[cj * 3 + a2];
                  const int32_t sep =
                      av[a2] < l2 ? l2 - av[a2] : (av[a2] > h2 ? av[a2] - h2 : 0);
                  pd2 += static_cast<int64_t>(sep) * sep;
                }
                if (static_cast<float>(pd2) > eps2) continue;
              }
              for (int64_t b2 = cell_start[cj]; b2 < cell_start[cj + 1];
                   ++b2) {
                const int32_t ib = static_cast<int32_t>(ckey_idx[b2] & 0xFFFFFFFFLL);
                const int32_t cb = pts[ib];
                const int64_t dr = ar - ((cb >> 16) & 0xFF);
                const int64_t dg = ag - ((cb >> 8) & 0xFF);
                const int64_t db = ab - (cb & 0xFF);
                const int64_t d2 = dr * dr + dg * dg + db * db;
                if (static_cast<float>(d2) <= eps2) {
                  uf.unite(ia, ib);
                  done = true;
                  break;
                }
              }
            }
          }
        }
      }
    }
    for (int64_t i = 0; i < n; ++i) {
      out[i] = uf.find(static_cast<int32_t>(i));
    }
  }
}

}  // extern "C"
