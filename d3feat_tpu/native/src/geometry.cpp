// Native host geometry kernels for d3feat_tpu.
//
// TPU-native replacement for the reference's CPU C++ ops
// (tf_custom_ops/tf_neighbors/neighbors/neighbors.cpp,
//  tf_custom_ops/tf_subsampling/grid_subsampling/grid_subsampling.cpp,
//  cpp_wrappers/cpp_subsampling/): same contracts, different design —
// a single flat-hash voxel grid serves both subsampling and fixed-degree
// radius search (no KD-tree; the search radius equals the cell size, so a
// 27-cell probe is exact), and the API is a plain C ABI consumed via
// ctypes (no TF/pybind dependency).
//
// Contracts (see d3feat_tpu/ops/{subsample,neighbors}.py):
//  * grid_subsample: one barycenter per occupied voxel, grid anchored at
//    the cloud's bbox min corner, voxels emitted in first-occurrence order;
//  * radius_knn: per query, indices of supports within `radius` sorted by
//    ascending distance (ties by index), truncated/padded to k with the
//    shadow index n_supports.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Cell {
  int64_t key;
  int32_t head;  // index of first point in this cell (chained via `next`)
};

// Open-addressing hash map from voxel key -> chain head. Sized to the next
// power of two >= 2n for low collision rates.
class VoxelHash {
 public:
  explicit VoxelHash(size_t n_points) {
    size_t want = n_points * 2 + 16;
    size_ = 16;
    while (size_ < want) size_ <<= 1;
    mask_ = size_ - 1;
    slots_.assign(size_, Cell{kEmpty, -1});
  }

  // Returns slot index for key, inserting if absent.
  size_t find_or_insert(int64_t key) {
    size_t h = hash(key);
    while (true) {
      Cell& c = slots_[h];
      if (c.key == key) return h;
      if (c.key == kEmpty) {
        c.key = key;
        return h;
      }
      h = (h + 1) & mask_;
    }
  }

  // Returns slot index or SIZE_MAX if absent.
  size_t find(int64_t key) const {
    size_t h = hash(key);
    while (true) {
      const Cell& c = slots_[h];
      if (c.key == key) return h;
      if (c.key == kEmpty) return SIZE_MAX;
      h = (h + 1) & mask_;
    }
  }

  int32_t& head(size_t slot) { return slots_[slot].head; }
  int32_t head(size_t slot) const { return slots_[slot].head; }

  static constexpr int64_t kEmpty = INT64_MIN;

 private:
  size_t hash(int64_t key) const {
    uint64_t x = static_cast<uint64_t>(key);
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    return static_cast<size_t>(x) & mask_;
  }
  std::vector<Cell> slots_;
  size_t size_, mask_;
};

inline int64_t voxel_key(int32_t ix, int32_t iy, int32_t iz) {
  // 21 bits per axis, offset to keep non-negative: supports ~2M cells/axis.
  return (static_cast<int64_t>(ix + (1 << 20))) |
         (static_cast<int64_t>(iy + (1 << 20)) << 21) |
         (static_cast<int64_t>(iz + (1 << 20)) << 42);
}

}  // namespace

extern "C" {

// Voxel-grid barycenter subsampling of one cloud.
// out_points must hold >= n floats*3. Returns number of output points.
int d3f_grid_subsample(const float* points, int n, float dl,
                       float* out_points) {
  if (n <= 0) return 0;
  float ox = points[0], oy = points[1], oz = points[2];
  for (int i = 1; i < n; ++i) {
    ox = std::min(ox, points[3 * i]);
    oy = std::min(oy, points[3 * i + 1]);
    oz = std::min(oz, points[3 * i + 2]);
  }
  VoxelHash hash(static_cast<size_t>(n));
  // per-voxel accumulators, appended in first-occurrence order
  std::vector<double> sx, sy, sz;
  std::vector<int32_t> cnt;
  sx.reserve(n); sy.reserve(n); sz.reserve(n); cnt.reserve(n);
  const double inv = 1.0 / dl;
  for (int i = 0; i < n; ++i) {
    float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
    int32_t ix = static_cast<int32_t>(std::floor((x - ox) * inv));
    int32_t iy = static_cast<int32_t>(std::floor((y - oy) * inv));
    int32_t iz = static_cast<int32_t>(std::floor((z - oz) * inv));
    size_t slot = hash.find_or_insert(voxel_key(ix, iy, iz));
    int32_t& h = hash.head(slot);
    if (h < 0) {
      h = static_cast<int32_t>(sx.size());
      sx.push_back(0.0); sy.push_back(0.0); sz.push_back(0.0);
      cnt.push_back(0);
    }
    sx[h] += x; sy[h] += y; sz[h] += z;
    cnt[h] += 1;
  }
  int m = static_cast<int>(sx.size());
  for (int v = 0; v < m; ++v) {
    out_points[3 * v] = static_cast<float>(sx[v] / cnt[v]);
    out_points[3 * v + 1] = static_cast<float>(sy[v] / cnt[v]);
    out_points[3 * v + 2] = static_cast<float>(sz[v] / cnt[v]);
  }
  return m;
}

namespace {

// Hash-grid fallback for scenes whose bbox/radius grid exceeds the dense
// cell budget (e.g. outdoor KITTI at small radii): same CSR counting-sort
// candidate scan, but cell ids resolved through the flat hash (27 probes
// per query instead of 9 dense z-runs).
void radius_knn_rel_hash(const float* queries, int n_q,
                         const float* supports, int n_s, float radius,
                         int k, int* out_inds, int16_t* out_rel,
                         float ox, float oy, float oz) {
  const double inv = 1.0 / radius;
  VoxelHash hash(static_cast<size_t>(n_s));
  std::vector<int32_t> cell_of(n_s);
  std::vector<int32_t> counts;
  counts.reserve(n_s / 2 + 8);
  for (int i = 0; i < n_s; ++i) {
    int32_t ix = static_cast<int32_t>(std::floor((supports[3 * i] - ox) * inv));
    int32_t iy = static_cast<int32_t>(std::floor((supports[3 * i + 1] - oy) * inv));
    int32_t iz = static_cast<int32_t>(std::floor((supports[3 * i + 2] - oz) * inv));
    size_t slot = hash.find_or_insert(voxel_key(ix, iy, iz));
    int32_t& h = hash.head(slot);
    if (h < 0) {
      h = static_cast<int32_t>(counts.size());
      counts.push_back(0);
    }
    cell_of[i] = h;
    counts[h] += 1;
  }
  const int n_cells = static_cast<int>(counts.size());
  std::vector<int32_t> starts(n_cells + 1, 0);
  for (int c = 0; c < n_cells; ++c) starts[c + 1] = starts[c] + counts[c];
  std::vector<int32_t> order(n_s);
  std::vector<float> sxv(n_s), syv(n_s), szv(n_s);
  {
    std::vector<int32_t> fill(starts.begin(), starts.end() - 1);
    for (int i = 0; i < n_s; ++i) {
      int32_t pos = fill[cell_of[i]]++;
      order[pos] = i;
      sxv[pos] = supports[3 * i];
      syv[pos] = supports[3 * i + 1];
      szv[pos] = supports[3 * i + 2];
    }
  }

  const float r2 = radius * radius;
  const float scale = 32767.0f / radius;
  std::vector<uint64_t> cand;
  cand.reserve(256);
  for (int q = 0; q < n_q; ++q) {
    const float qx = queries[3 * q], qy = queries[3 * q + 1],
                qz = queries[3 * q + 2];
    int32_t cx = static_cast<int32_t>(std::floor((qx - ox) * inv));
    int32_t cy = static_cast<int32_t>(std::floor((qy - oy) * inv));
    int32_t cz = static_cast<int32_t>(std::floor((qz - oz) * inv));
    cand.clear();
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          size_t slot = hash.find(voxel_key(cx + dx, cy + dy, cz + dz));
          if (slot == SIZE_MAX) continue;
          int32_t c = hash.head(slot);
          const int32_t b = starts[c], e = starts[c + 1];
          for (int32_t p = b; p < e; ++p) {
            float ddx = sxv[p] - qx;
            float ddy = syv[p] - qy;
            float ddz = szv[p] - qz;
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) {
              uint32_t bits;
              std::memcpy(&bits, &d2, 4);
              cand.push_back((static_cast<uint64_t>(bits) << 32) |
                             static_cast<uint32_t>(order[p]));
            }
          }
        }
    int m = static_cast<int>(cand.size());
    int take = std::min(m, k);
    if (k == 1) {
      uint64_t best = UINT64_MAX;
      for (int j = 0; j < m; ++j) best = std::min(best, cand[j]);
      if (m > 0) cand[0] = best;
    } else if (take * 3 < m) {
      std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
    } else {
      std::sort(cand.begin(), cand.end());
    }
    int* row = out_inds + static_cast<int64_t>(q) * k;
    for (int j = 0; j < take; ++j)
      row[j] = static_cast<int32_t>(cand[j] & 0xffffffffu);
    for (int j = take; j < k; ++j) row[j] = n_s;
    if (out_rel) {
      int16_t* rrow = out_rel + static_cast<int64_t>(q) * k * 3;
      auto q16 = [](float v) {
        float r = v >= 0.0f ? v + 0.5f : v - 0.5f;
        return static_cast<int16_t>(static_cast<int32_t>(r));
      };
      for (int j = 0; j < take; ++j) {
        const float* s = supports + 3ll * static_cast<int32_t>(
            cand[j] & 0xffffffffu);
        rrow[3 * j] = q16((s[0] - qx) * scale);
        rrow[3 * j + 1] = q16((s[1] - qy) * scale);
        rrow[3 * j + 2] = q16((s[2] - qz) * scale);
      }
      for (int j = take; j < k; ++j) {
        rrow[3 * j] = INT16_MAX;
        rrow[3 * j + 1] = INT16_MAX;
        rrow[3 * j + 2] = INT16_MAX;
      }
    }
  }
}

}  // namespace

// Fixed-degree radius search: for each query, the k nearest supports
// within `radius`, ascending by (distance, index); pad with n_s.
// out_inds: [n_q * k] int32.
// out_rel (optional, may be null): [n_q * k * 3] int16 — the relative
// vectors (support - query) quantized by radius/32767. Shipping these to
// the device removes the coordinate gather from the KPConv influence-
// weight computation (the search already touched every neighbor).
// Shadow slots get rel = (32767, 32767, 32767); consumers mask by index.
void d3f_radius_knn_rel(const float* queries, int n_q, const float* supports,
                        int n_s, float radius, int k, int* out_inds,
                        int16_t* out_rel) {
  if (n_q <= 0) return;
  if (n_s <= 0 || k <= 0) {
    for (int i = 0; i < n_q * k; ++i) out_inds[i] = n_s;
    if (out_rel)
      for (int64_t i = 0; i < static_cast<int64_t>(n_q) * k * 3; ++i)
        out_rel[i] = INT16_MAX;
    return;
  }
  // Bucket supports on a `radius`-sized grid anchored at the support bbox.
  //
  // Design (v2, measured on the 1-core training host): a DENSE z-minor
  // cell grid + CSR counting sort. The v1 flat-hash probe spent ~2 us per
  // query in 27 hash lookups alone; with a dense grid the 27-cell probe
  // collapses into 9 direct (x, y) lookups over CONTIGUOUS z-runs (cells
  // (z-1..z+1) are adjacent in the z-minor layout, and the CSR slices of
  // adjacent cells are themselves contiguous). Coordinates are re-laid-out
  // as SoA so the candidate loop streams sequential memory.
  // Falls back to the hash probe when the bbox grid would exceed the cell
  // budget (unbounded scenes).
  float ox = supports[0], oy = supports[1], oz = supports[2];
  float mx = ox, my = oy, mz = oz;
  for (int i = 1; i < n_s; ++i) {
    ox = std::min(ox, supports[3 * i]);
    oy = std::min(oy, supports[3 * i + 1]);
    oz = std::min(oz, supports[3 * i + 2]);
    mx = std::max(mx, supports[3 * i]);
    my = std::max(my, supports[3 * i + 1]);
    mz = std::max(mz, supports[3 * i + 2]);
  }
  const double inv = 1.0 / radius;
  const int64_t nx = static_cast<int64_t>(std::floor((mx - ox) * inv)) + 1;
  const int64_t ny = static_cast<int64_t>(std::floor((my - oy) * inv)) + 1;
  const int64_t nz = static_cast<int64_t>(std::floor((mz - oz) * inv)) + 1;
  const int64_t n_cells = nx * ny * nz;
  constexpr int64_t kMaxDenseCells = 1 << 25;  // 32M cells = 128 MB starts
  if (n_cells > kMaxDenseCells || n_cells <= 0) {
    radius_knn_rel_hash(queries, n_q, supports, n_s, radius, k,
                        out_inds, out_rel, ox, oy, oz);
    return;
  }

  std::vector<int32_t> cell_of(n_s);
  std::vector<int32_t> starts(n_cells + 1, 0);
  for (int i = 0; i < n_s; ++i) {
    int64_t ix = static_cast<int64_t>(std::floor((supports[3 * i] - ox) * inv));
    int64_t iy = static_cast<int64_t>(std::floor((supports[3 * i + 1] - oy) * inv));
    int64_t iz = static_cast<int64_t>(std::floor((supports[3 * i + 2] - oz) * inv));
    int32_t c = static_cast<int32_t>((ix * ny + iy) * nz + iz);
    cell_of[i] = c;
    starts[c + 1] += 1;
  }
  for (int64_t c = 0; c < n_cells; ++c) starts[c + 1] += starts[c];
  // scatter: original index + SoA coords per slice slot (ascending index
  // within each cell, preserving the (distance, index) tie order)
  std::vector<int32_t> order(n_s);
  std::vector<float> sxv(n_s), syv(n_s), szv(n_s);
  {
    std::vector<int32_t> fill(starts.begin(), starts.end() - 1);
    for (int i = 0; i < n_s; ++i) {
      int32_t pos = fill[cell_of[i]]++;
      order[pos] = i;
      sxv[pos] = supports[3 * i];
      syv[pos] = supports[3 * i + 1];
      szv[pos] = supports[3 * i + 2];
    }
  }

  const float r2 = radius * radius;
  auto worker = [&](int q_begin, int q_end) {
    // Candidates packed as (d2 bits << 32) | original index: non-negative
    // IEEE floats order like their bit patterns, so one POD sort yields
    // the (distance, index) order the reference contract requires —
    // no comparator indirection, ties break by index for free.
    std::vector<uint64_t> cand;
    cand.reserve(256);
    std::vector<float> d2buf_v(1024);
    for (int q = q_begin; q < q_end; ++q) {
      const float qx = queries[3 * q], qy = queries[3 * q + 1],
                  qz = queries[3 * q + 2];
      int64_t cx = static_cast<int64_t>(std::floor((qx - ox) * inv));
      int64_t cy = static_cast<int64_t>(std::floor((qy - oy) * inv));
      int64_t cz = static_cast<int64_t>(std::floor((qz - oz) * inv));
      cand.clear();
      if (cx >= -1 && cx <= nx && cy >= -1 && cy <= ny && cz >= -1 &&
          cz <= nz) {
        const int64_t x0 = std::max<int64_t>(cx - 1, 0);
        const int64_t x1 = std::min<int64_t>(cx + 1, nx - 1);
        const int64_t y0 = std::max<int64_t>(cy - 1, 0);
        const int64_t y1 = std::min<int64_t>(cy + 1, ny - 1);
        const int64_t z0 = std::max<int64_t>(cz - 1, 0);
        const int64_t z1 = std::min<int64_t>(cz + 1, nz - 1);
        for (int64_t x = x0; x <= x1; ++x)
          for (int64_t y = y0; y <= y1; ++y) {
            // z-run: cells z0..z1 are contiguous -> one CSR slice
            const int64_t base = (x * ny + y) * nz;
            const int32_t b = starts[base + z0];
            const int32_t e = starts[base + z1 + 1];
            if (e - b > static_cast<int32_t>(d2buf_v.size()))
              d2buf_v.resize(e - b);
            float* d2buf = d2buf_v.data();
            // two passes: a branch-free distance loop the compiler can
            // vectorize, then a scalar filter over the small buffer
            for (int32_t p = b; p < e; ++p) {
              float ddx = sxv[p] - qx;
              float ddy = syv[p] - qy;
              float ddz = szv[p] - qz;
              d2buf[p - b] = ddx * ddx + ddy * ddy + ddz * ddz;
            }
            for (int32_t p = b; p < e; ++p) {
              float d2 = d2buf[p - b];
              if (d2 <= r2) {
                uint32_t bits;
                std::memcpy(&bits, &d2, 4);
                cand.push_back((static_cast<uint64_t>(bits) << 32) |
                               static_cast<uint32_t>(order[p]));
              }
            }
          }
      }
      int m = static_cast<int>(cand.size());
      int take = std::min(m, k);
      int* row = out_inds + static_cast<int64_t>(q) * k;
      if (k == 1) {
        // nearest-only (upsample lists): min scan, no sort
        uint64_t best = UINT64_MAX;
        for (int j = 0; j < m; ++j) best = std::min(best, cand[j]);
        if (m > 0) cand[0] = best;
      } else if (take * 3 < m) {
        std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
      } else {
        std::sort(cand.begin(), cand.end());
      }
      for (int j = 0; j < take; ++j)
        row[j] = static_cast<int32_t>(cand[j] & 0xffffffffu);
      for (int j = take; j < k; ++j) row[j] = n_s;
      if (out_rel) {
        int16_t* rrow = out_rel + static_cast<int64_t>(q) * k * 3;
        const float scale = 32767.0f / radius;
        auto q16 = [](float v) {
          // candidates satisfy |v| <= 32767 by construction (d <= radius);
          // round-half-away like lround, without the libm call
          float r = v >= 0.0f ? v + 0.5f : v - 0.5f;
          return static_cast<int16_t>(static_cast<int32_t>(r));
        };
        for (int j = 0; j < take; ++j) {
          const float* s = supports + 3ll * static_cast<int32_t>(
              cand[j] & 0xffffffffu);
          rrow[3 * j] = q16((s[0] - qx) * scale);
          rrow[3 * j + 1] = q16((s[1] - qy) * scale);
          rrow[3 * j + 2] = q16((s[2] - qz) * scale);
        }
        for (int j = take; j < k; ++j) {
          rrow[3 * j] = INT16_MAX;
          rrow[3 * j + 1] = INT16_MAX;
          rrow[3 * j + 2] = INT16_MAX;
        }
      }
    }
  };

  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 1 || n_q < 4096) {
    worker(0, n_q);
  } else {
    n_threads = std::min<unsigned>(n_threads, 16);
    std::vector<std::thread> pool;
    int chunk = (n_q + n_threads - 1) / n_threads;
    for (unsigned t = 0; t < n_threads; ++t) {
      int b = t * chunk, e = std::min(n_q, b + chunk);
      if (b >= e) break;
      pool.emplace_back(worker, b, e);
    }
    for (auto& th : pool) th.join();
  }
}

void d3f_radius_knn(const float* queries, int n_q, const float* supports,
                    int n_s, float radius, int k, int* out_inds) {
  d3f_radius_knn_rel(queries, n_q, supports, n_s, radius, k, out_inds,
                     nullptr);
}

}  // extern "C"
