// inklayer-tpu native host ops.
//
// Exact CPU implementations of the classical algorithms that the TPU path
// approximates with bounded-iteration relaxations (ops/distance.py,
// ops/components.py):
//   * exact euclidean distance transform (Felzenszwalb-Huttenlocher)
//   * priority-flood watershed with compactness (skimage-equivalent; skimage
//     is absent from this environment)
//   * connected components (BFS, 4/8-connectivity)
//
// Used as (a) the host oracle in the test suite for the device ops and
// (b) a fast exact CPU fallback for host-only deployments.  Exposed via a
// plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

#include <zlib.h>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();
// large finite sentinel for "no seed": using true infinity breaks the
// lower-envelope intersection arithmetic (inf - inf).  Distances derived
// from sentinel parabolas only survive when the image has no seed at all.
constexpr double kBig = 1e12;

// 1-D squared distance transform (lower envelope of parabolas),
// Felzenszwalb-Huttenlocher.  Double precision internally: f values reach
// kBig and intersections must stay ordered.
void dt1d(const double* f, double* d, int n, std::vector<int>& v,
          std::vector<double>& z) {
  v.assign(n, 0);
  z.assign(n + 1, 0.0);
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    double s;
    while (true) {
      s = ((f[q] + (double)q * q) - (f[v[k]] + (double)v[k] * v[k])) /
          (2.0 * q - 2.0 * v[k]);
      if (k > 0 && s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    double dq = q - (double)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

}  // namespace

extern "C" {

// Exact EDT: dist[i] = euclidean distance to the nearest seed pixel.
// seeds: h*w uint8 (nonzero = seed). out: h*w float32.
void exact_edt(const uint8_t* seeds, float* out, int h, int w) {
  std::vector<double> g(static_cast<size_t>(h) * w);
  // column pass
  std::vector<double> f(std::max(h, w));
  std::vector<double> d(std::max(h, w));
  std::vector<int> v;
  std::vector<double> z;
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) f[y] = seeds[y * w + x] ? 0.0 : kBig;
    dt1d(f.data(), d.data(), h, v, z);
    for (int y = 0; y < h; ++y) g[y * static_cast<size_t>(w) + x] = d[y];
  }
  // row pass
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) f[x] = g[y * static_cast<size_t>(w) + x];
    dt1d(f.data(), d.data(), w, v, z);
    for (int x = 0; x < w; ++x)
      out[y * static_cast<size_t>(w) + x] = (float)std::sqrt(d[x]);
  }
}

// Priority-flood watershed.  labels: h*w int32, >0 = markers (modified in
// place), 0 = unlabeled; elevation: h*w float32; region: h*w uint8 (flood
// only where nonzero); compactness >= 0 adds c * dist(seed)^2 to priority.
void watershed(int32_t* labels, const float* elevation, const uint8_t* region,
               int h, int w, double compactness) {
  struct Node {
    float priority;
    uint64_t order;
    int idx;
    int seed;
    bool operator>(const Node& o) const {
      if (priority != o.priority) return priority > o.priority;
      return order > o.order;
    }
  };
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> pq;
  std::vector<uint8_t> done(static_cast<size_t>(h) * w, 0);
  uint64_t counter = 0;
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    if (!region[i]) {
      // skimage zeroes markers outside the mask (_watershed.py
      // _validate_inputs: `markers *= mask`): output labels never extend
      // beyond the flood region.  Confirmed against the reference's
      // committed masks_final (99.7% ink-restricted) — keeping out-of-region
      // seed labels silently inflated masks with blob interiors.
      labels[i] = 0;
      continue;
    }
    if (labels[i] > 0) {
      pq.push({elevation[i], counter++, (int)i, (int)i});
      done[i] = 1;
    }
  }
  const int dy[8] = {-1, 1, 0, 0, -1, -1, 1, 1};
  const int dx[8] = {0, 0, -1, 1, -1, 1, -1, 1};
  while (!pq.empty()) {
    Node nd = pq.top();
    pq.pop();
    int cy = nd.idx / w, cx = nd.idx % w;
    for (int k = 0; k < 8; ++k) {
      int yy = cy + dy[k], xx = cx + dx[k];
      if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
      size_t j = static_cast<size_t>(yy) * w + xx;
      if (done[j] || !region[j] || labels[j] > 0) continue;
      labels[j] = labels[nd.idx];
      done[j] = 1;
      float pr = elevation[j];
      if (compactness > 0) {
        int sy = nd.seed / w, sx = nd.seed % w;
        float ddy = (float)(yy - sy), ddx = (float)(xx - sx);
        pr += (float)compactness * (ddy * ddy + ddx * ddx);
      }
      pq.push({pr, counter++, (int)j, nd.seed});
    }
  }
}

// Connected components, BFS.  mask: h*w uint8; labels out: h*w int32 with
// background = 0, components 1..n.  Returns component count.
int connected_components(const uint8_t* mask, int32_t* labels, int h, int w,
                         int connectivity) {
  const size_t n = static_cast<size_t>(h) * w;
  std::memset(labels, 0, n * sizeof(int32_t));
  const int dy8[8] = {-1, 1, 0, 0, -1, -1, 1, 1};
  const int dx8[8] = {0, 0, -1, 1, -1, 1, -1, 1};
  int nn = connectivity == 4 ? 4 : 8;
  int next = 0;
  std::vector<int> stack;
  for (size_t i = 0; i < n; ++i) {
    if (!mask[i] || labels[i]) continue;
    ++next;
    stack.clear();
    stack.push_back((int)i);
    labels[i] = next;
    while (!stack.empty()) {
      int cur = stack.back();
      stack.pop_back();
      int cy = cur / w, cx = cur % w;
      for (int k = 0; k < nn; ++k) {
        int yy = cy + dy8[k], xx = cx + dx8[k];
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        size_t j = static_cast<size_t>(yy) * w + xx;
        if (mask[j] && !labels[j]) {
          labels[j] = next;
          stack.push_back((int)j);
        }
      }
    }
  }
  return next;
}

// Fast PNG encoder: filter type 0 (None) on every scanline + zlib.
//
// PIL's PNG path spends most of its CPU on per-row adaptive filter search;
// for the pipeline's outputs (binary masks, mostly-white sketches,
// replicated-gray depth maps) filter None + deflate level 1 compresses
// nearly as well at a fraction of the cost — and decodes to bit-identical
// pixels (the output contract is pixel values, not byte stream).
//
// data: h*w*channels uint8, row-major.  channels 1 (gray) or 3 (RGB).
// bilevel != 0 (channels must be 1): input bytes are 0/nonzero; packed to
// 1-bit grayscale (decoders expand to 0/255).
// Returns bytes written to out, or -1 (bad args) / -2 (out_cap too small)
// / -3 (zlib error).
long long png_encode(const uint8_t* data, int h, int w, int channels,
                     int bilevel, int zlevel, uint8_t* out,
                     long long out_cap) {
  if (h <= 0 || w <= 0 || (channels != 1 && channels != 3) ||
      (bilevel && channels != 1))
    return -1;
  const size_t rowbytes =
      bilevel ? (static_cast<size_t>(w) + 7) / 8 : static_cast<size_t>(w) * channels;
  const size_t raw_size = static_cast<size_t>(h) * (rowbytes + 1);
  std::vector<uint8_t> raw(raw_size);
  const uint8_t* src = data;
  uint8_t* dst = raw.data();
  for (int y = 0; y < h; ++y) {
    *dst++ = 0;  // filter: None
    if (bilevel) {
      std::memset(dst, 0, rowbytes);
      for (int x = 0; x < w; ++x)
        if (src[x]) dst[x >> 3] |= static_cast<uint8_t>(0x80u >> (x & 7));
      src += w;
      dst += rowbytes;
    } else {
      std::memcpy(dst, src, rowbytes);
      src += rowbytes;
      dst += rowbytes;
    }
  }
  uLongf comp_cap = compressBound(static_cast<uLong>(raw_size));
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(),
                static_cast<uLong>(raw_size), zlevel) != Z_OK)
    return -3;

  const size_t total = 8 + (12 + 13) + (12 + comp_cap) + 12;
  if (static_cast<long long>(total) > out_cap) return -2;
  uint8_t* p = out;
  auto put32 = [&p](uint32_t v) {
    *p++ = static_cast<uint8_t>(v >> 24);
    *p++ = static_cast<uint8_t>(v >> 16);
    *p++ = static_cast<uint8_t>(v >> 8);
    *p++ = static_cast<uint8_t>(v);
  };
  auto chunk = [&](const char* type, const uint8_t* payload, size_t len) {
    put32(static_cast<uint32_t>(len));
    uint8_t* crc_start = p;
    std::memcpy(p, type, 4);
    p += 4;
    if (len) std::memcpy(p, payload, len);
    p += len;
    uLong crc = crc32(0L, crc_start, static_cast<uInt>(4 + len));
    put32(static_cast<uint32_t>(crc));
  };
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  std::memcpy(p, sig, 8);
  p += 8;
  uint8_t ihdr[13];
  uint8_t* q = ihdr;
  auto put32b = [&q](uint32_t v) {
    *q++ = static_cast<uint8_t>(v >> 24);
    *q++ = static_cast<uint8_t>(v >> 16);
    *q++ = static_cast<uint8_t>(v >> 8);
    *q++ = static_cast<uint8_t>(v);
  };
  put32b(static_cast<uint32_t>(w));
  put32b(static_cast<uint32_t>(h));
  *q++ = bilevel ? 1 : 8;                  // bit depth
  *q++ = channels == 3 ? 2 : 0;            // color type: RGB / grayscale
  *q++ = 0;                                // compression
  *q++ = 0;                                // filter method
  *q++ = 0;                                // interlace
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", comp.data(), comp_cap);
  chunk("IEND", nullptr, 0);
  return static_cast<long long>(p - out);
}

// Padded integral image of (gray > 0): out is (h+1, w+1) int32 row-major,
// out[y][x] = count of nonzero pixels in gray[:y, :x].  Single pass
// (running row sum + previous integral row) — replaces the numpy
// int64 double-cumsum on the sweep's host-CPU-bound NMS prefilter.
void integral_nonzero(const uint8_t* gray, int32_t* out, int h, int w) {
  const int W = w + 1;
  std::memset(out, 0, sizeof(int32_t) * W);  // top pad row
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = gray + static_cast<size_t>(y) * w;
    const int32_t* prev = out + static_cast<size_t>(y) * W;
    int32_t* cur = out + static_cast<size_t>(y + 1) * W;
    cur[0] = 0;  // left pad col
    int32_t run = 0;
    for (int x = 0; x < w; ++x) {
      run += row[x] != 0;
      cur[x + 1] = run + prev[x + 1];
    }
  }
}

}  // extern "C"
