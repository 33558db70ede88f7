// Native BVH builder — the framework's C++ tier.
//
// The reference has no native code at all (C# only, SURVEY.md §2 preamble)
// and its C# BVH builder was abandoned half-written
// (Data/Collision/BVH.cs:79 throws NotImplementedException). This is the
// production builder: top-down binned SAH with midpoint fallback, emitting
// the same flat threaded layout ops/bvh.py defines (DFS node order, leaf
// ranges over a reordered primitive array, miss_next skip pointers).
// The Python builder in ops/bvh.py is the reference implementation; tests
// assert both produce traversal-identical results.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kMaxSahBins = 128;
constexpr float kInf = std::numeric_limits<float>::infinity();

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float get(const Vec3& v, int ax) {
  return ax == 0 ? v.x : (ax == 1 ? v.y : v.z);
}
inline float half_area(const Vec3& lo, const Vec3& hi) {
  const float dx = std::max(hi.x - lo.x, 0.f);
  const float dy = std::max(hi.y - lo.y, 0.f);
  const float dz = std::max(hi.z - lo.z, 0.f);
  return dx * dy + dy * dz + dz * dx;
}

struct Builder {
  const float* tris;  // [m][9]
  int leaf_size;
  bool use_sah;
  int sah_bins = 16;

  std::vector<Vec3> lo, hi, cent;
  std::vector<int32_t> order;

  float* node_min;
  float* node_max;
  int32_t* first;
  int32_t* count;
  int32_t* miss_next;
  int32_t n_nodes = 0;

  int emit(const Vec3& nlo, const Vec3& nhi) {
    const int id = n_nodes++;
    node_min[3 * id + 0] = nlo.x;
    node_min[3 * id + 1] = nlo.y;
    node_min[3 * id + 2] = nlo.z;
    node_max[3 * id + 0] = nhi.x;
    node_max[3 * id + 1] = nhi.y;
    node_max[3 * id + 2] = nhi.z;
    first[id] = -1;
    count[id] = 0;
    miss_next[id] = -1;
    return id;
  }

  // Build [start,end) of `order`; `miss` is this subtree's escape pointer.
  int build(int start, int end, int32_t miss) {
    Vec3 nlo = {kInf, kInf, kInf}, nhi = {-kInf, -kInf, -kInf};
    Vec3 clo = {kInf, kInf, kInf}, chi = {-kInf, -kInf, -kInf};
    for (int i = start; i < end; ++i) {
      const int t = order[i];
      nlo = vmin(nlo, lo[t]);
      nhi = vmax(nhi, hi[t]);
      clo = vmin(clo, cent[t]);
      chi = vmax(chi, cent[t]);
    }
    const int node = emit(nlo, nhi);
    miss_next[node] = miss;
    const int n = end - start;
    if (n <= leaf_size) {
      first[node] = start;
      count[node] = n;
      return node;
    }

    // split axis: widest centroid extent
    int axis = 0;
    {
      const float ex = chi.x - clo.x, ey = chi.y - clo.y, ez = chi.z - clo.z;
      if (ey > ex) axis = 1;
      if (ez > get(chi, axis) - get(clo, axis)) axis = 2;
    }
    const float cmin = get(clo, axis), cmax = get(chi, axis);

    int mid = -1;
    if (cmax - cmin < 1e-12f) {
      mid = start + n / 2;  // all centroids coincide: median split
    } else if (use_sah) {
      // binned SAH (bin count configurable; 16 is the shipped default,
      // larger counts sweep finer candidate splits at build-time cost)
      const int kSahBins = sah_bins;
      int bcount[kMaxSahBins] = {0};
      Vec3 blo[kMaxSahBins], bhi[kMaxSahBins];
      for (int b = 0; b < kSahBins; ++b) {
        blo[b] = {kInf, kInf, kInf};
        bhi[b] = {-kInf, -kInf, -kInf};
      }
      const float scale = kSahBins / (cmax - cmin);
      for (int i = start; i < end; ++i) {
        const int t = order[i];
        int b = static_cast<int>((get(cent[t], axis) - cmin) * scale);
        b = std::min(std::max(b, 0), kSahBins - 1);
        bcount[b]++;
        blo[b] = vmin(blo[b], lo[t]);
        bhi[b] = vmax(bhi[b], hi[t]);
      }
      // sweep: best split between bins
      float larea[kMaxSahBins], rarea[kMaxSahBins];
      int lcnt[kMaxSahBins], rcnt[kMaxSahBins];
      {
        Vec3 alo = {kInf, kInf, kInf}, ahi = {-kInf, -kInf, -kInf};
        int acc = 0;
        for (int b = 0; b < kSahBins - 1; ++b) {
          acc += bcount[b];
          alo = vmin(alo, blo[b]);
          ahi = vmax(ahi, bhi[b]);
          lcnt[b] = acc;
          larea[b] = acc ? half_area(alo, ahi) : 0.f;
        }
        alo = {kInf, kInf, kInf};
        ahi = {-kInf, -kInf, -kInf};
        acc = 0;
        for (int b = kSahBins - 1; b >= 1; --b) {
          acc += bcount[b];
          alo = vmin(alo, blo[b]);
          ahi = vmax(ahi, bhi[b]);
          rcnt[b - 1] = acc;
          rarea[b - 1] = acc ? half_area(alo, ahi) : 0.f;
        }
      }
      float best_cost = kInf;
      int best_b = -1;
      for (int b = 0; b < kSahBins - 1; ++b) {
        if (lcnt[b] == 0 || rcnt[b] == 0) continue;
        const float cost = larea[b] * lcnt[b] + rarea[b] * rcnt[b];
        if (cost < best_cost) {
          best_cost = cost;
          best_b = b;
        }
      }
      if (best_b >= 0) {
        const float split_bin = best_b;
        auto pred = [&](int32_t t) {
          int b = static_cast<int>((get(cent[t], axis) - cmin) * scale);
          b = std::min(std::max(b, 0), kSahBins - 1);
          return b <= split_bin;
        };
        int32_t* base = order.data();
        int32_t* p = std::partition(base + start, base + end, pred);
        mid = static_cast<int>(p - base);
        if (mid == start || mid == end) mid = -1;  // degenerate: fall back
      }
    }
    if (mid < 0) {
      // midpoint fallback (the reference's intended strategy, BVH.cs:60)
      const float split = 0.5f * (cmin + cmax);
      auto pred = [&](int32_t t) { return get(cent[t], axis) < split; };
      int32_t* base = order.data();
      int32_t* p = std::partition(base + start, base + end, pred);
      mid = static_cast<int>(p - base);
      if (mid == start || mid == end) mid = start + n / 2;
    }

    // Left child is node+1 in DFS order; its miss pointer is the right
    // child, whose id we only know after the left subtree is built. Build
    // left with a placeholder, then patch the left subtree's escape chain.
    const int left = build(start, mid, -2 /*placeholder*/);
    const int right = build(mid, end, miss);
    // patch: every -2 escape inside the left subtree means "right sibling"
    for (int i = left; i < right; ++i) {
      if (miss_next[i] == -2) miss_next[i] = right;
    }
    (void)left;
    return node;
  }
};

}  // namespace

extern "C" {

int urt_build_bvh_ex(const float* tris, int m, int leaf_size, int use_sah,
                     int sah_bins, float* node_min, float* node_max,
                     int32_t* first, int32_t* count, int32_t* miss_next,
                     int32_t* prim_order);

// Returns the number of nodes written, or -1 on error.
// tris: m*9 floats. Output arrays must hold 2m-1 nodes (m >= 1).
// prim_order: m int32 (leaf-order -> original row).
int urt_build_bvh(const float* tris, int m, int leaf_size, int use_sah,
                  float* node_min, float* node_max, int32_t* first,
                  int32_t* count, int32_t* miss_next, int32_t* prim_order) {
  return urt_build_bvh_ex(tris, m, leaf_size, use_sah, 16, node_min,
                          node_max, first, count, miss_next, prim_order);
}

// Extended entry: explicit SAH bin count (clamped to [2, 128]).
int urt_build_bvh_ex(const float* tris, int m, int leaf_size, int use_sah,
                     int sah_bins, float* node_min, float* node_max,
                     int32_t* first, int32_t* count, int32_t* miss_next,
                     int32_t* prim_order) {
  if (m <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.tris = tris;
  b.leaf_size = leaf_size;
  b.use_sah = use_sah != 0;
  b.sah_bins = std::min(std::max(sah_bins, 2), kMaxSahBins);
  b.node_min = node_min;
  b.node_max = node_max;
  b.first = first;
  b.count = count;
  b.miss_next = miss_next;

  b.lo.resize(m);
  b.hi.resize(m);
  b.cent.resize(m);
  b.order.resize(m);
  for (int i = 0; i < m; ++i) {
    const float* t = tris + 9 * i;
    Vec3 v0 = {t[0], t[1], t[2]};
    Vec3 v1 = {t[3], t[4], t[5]};
    Vec3 v2 = {t[6], t[7], t[8]};
    b.lo[i] = vmin(v0, vmin(v1, v2));
    b.hi[i] = vmax(v0, vmax(v1, v2));
    b.cent[i] = {(v0.x + v1.x + v2.x) / 3.f, (v0.y + v1.y + v2.y) / 3.f,
                 (v0.z + v1.z + v2.z) / 3.f};
    b.order[i] = i;
  }

  b.build(0, m, -1);
  std::memcpy(prim_order, b.order.data(), sizeof(int32_t) * m);
  return b.n_nodes;
}

}  // extern "C"
