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
  // bucket supports on a `radius`-sized grid anchored at the support bbox
  float ox = supports[0], oy = supports[1], oz = supports[2];
  for (int i = 1; i < n_s; ++i) {
    ox = std::min(ox, supports[3 * i]);
    oy = std::min(oy, supports[3 * i + 1]);
    oz = std::min(oz, supports[3 * i + 2]);
  }
  const double inv = 1.0 / radius;
  VoxelHash hash(static_cast<size_t>(n_s));
  std::vector<int32_t> next(n_s, -1);
  for (int i = 0; i < n_s; ++i) {
    int32_t ix = static_cast<int32_t>(std::floor((supports[3 * i] - ox) * inv));
    int32_t iy = static_cast<int32_t>(std::floor((supports[3 * i + 1] - oy) * inv));
    int32_t iz = static_cast<int32_t>(std::floor((supports[3 * i + 2] - oz) * inv));
    size_t slot = hash.find_or_insert(voxel_key(ix, iy, iz));
    int32_t& h = hash.head(slot);
    next[i] = h;  // push-front: chain holds descending indices
    h = i;
  }

  const float r2 = radius * radius;
  auto worker = [&](int q_begin, int q_end) {
    std::vector<std::pair<float, int32_t>> cand;
    for (int q = q_begin; q < q_end; ++q) {
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
            for (int32_t i = hash.head(slot); i >= 0; i = next[i]) {
              float ddx = supports[3 * i] - qx;
              float ddy = supports[3 * i + 1] - qy;
              float ddz = supports[3 * i + 2] - qz;
              float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
              if (d2 <= r2) cand.emplace_back(d2, i);
            }
          }
      int m = static_cast<int>(cand.size());
      int take = std::min(m, k);
      std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
      int* row = out_inds + static_cast<int64_t>(q) * k;
      for (int j = 0; j < take; ++j) row[j] = cand[j].second;
      for (int j = take; j < k; ++j) row[j] = n_s;
      if (out_rel) {
        int16_t* rrow = out_rel + static_cast<int64_t>(q) * k * 3;
        const float scale = 32767.0f / radius;
        auto q16 = [](float v) {
          long r = std::lround(v);
          return static_cast<int16_t>(std::max(-32767L, std::min(32767L, r)));
        };
        for (int j = 0; j < take; ++j) {
          int32_t i = cand[j].second;
          rrow[3 * j] = q16((supports[3 * i] - qx) * scale);
          rrow[3 * j + 1] = q16((supports[3 * i + 1] - qy) * scale);
          rrow[3 * j + 2] = q16((supports[3 * i + 2] - qz) * scale);
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
