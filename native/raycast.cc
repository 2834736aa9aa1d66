// BVH triangle-mesh ray caster (native runtime component).
//
// Serves the albedo-scaling stage's visibility queries, standing in for the
// reference's trimesh/embree dependency (rnb_neus2/albedo_scaling.py:288-330)
// and covering the capability of the reference's CUDA TriangleBvh
// (src/triangle_bvh.cu). CPU-side by design: these queries sit in the
// between-phase orchestration, not the TPU training hot path.
//
// Build: g++ -O3 -fopenmp -shared -fPIC -o libraycast.so raycast.cc
// C ABI: rc_build / rc_closest_hits / rc_free (ctypes-friendly).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 sub(Vec3 a, Vec3 b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float dot(Vec3 a, Vec3 b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

struct AABB {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(Vec3 p) {
    lo.x = std::min(lo.x, p.x);
    lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x);
    hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
};

struct Node {
  AABB box;
  int32_t a = -1;  // internal: left child; leaf: first triangle slot
  int32_t b = -1;  // internal: right child; leaf: -(triangle count)
};

struct BuildTri {
  AABB box;
  Vec3 centroid;
  int32_t id;
};

struct BVH {
  std::vector<Vec3> p0, e1, e2;  // triangles in BVH order
  std::vector<int32_t> tri_ids;  // BVH order → original triangle id
  std::vector<Node> nodes;
};

static inline bool slab_hit(const AABB& b, Vec3 o, Vec3 inv_d, float tmax) {
  float t1 = (b.lo.x - o.x) * inv_d.x, t2 = (b.hi.x - o.x) * inv_d.x;
  float lo = std::min(t1, t2), hi = std::max(t1, t2);
  t1 = (b.lo.y - o.y) * inv_d.y;
  t2 = (b.hi.y - o.y) * inv_d.y;
  lo = std::max(lo, std::min(t1, t2));
  hi = std::min(hi, std::max(t1, t2));
  t1 = (b.lo.z - o.z) * inv_d.z;
  t2 = (b.hi.z - o.z) * inv_d.z;
  lo = std::max(lo, std::min(t1, t2));
  hi = std::min(hi, std::max(t1, t2));
  return hi >= std::max(lo, 0.0f) && lo <= tmax;
}

// Möller–Trumbore
static inline bool tri_hit(Vec3 o, Vec3 d, Vec3 p0, Vec3 e1, Vec3 e2,
                           float* t_out) {
  Vec3 pv = cross(d, e2);
  float det = dot(e1, pv);
  if (std::fabs(det) < 1e-12f) return false;
  float inv = 1.0f / det;
  Vec3 tv = sub(o, p0);
  float u = dot(tv, pv) * inv;
  if (u < -1e-7f || u > 1.0f + 1e-7f) return false;
  Vec3 qv = cross(tv, e1);
  float v = dot(d, qv) * inv;
  if (v < -1e-7f || u + v > 1.0f + 1e-7f) return false;
  float t = dot(e2, qv) * inv;
  if (t <= 1e-7f) return false;
  *t_out = t;
  return true;
}

static int32_t build(BVH& bvh, std::vector<BuildTri>& tris, int lo, int hi) {
  int32_t idx = (int32_t)bvh.nodes.size();
  bvh.nodes.emplace_back();
  AABB box;
  for (int i = lo; i < hi; ++i) {
    box.grow(tris[i].box.lo);
    box.grow(tris[i].box.hi);
  }
  bvh.nodes[idx].box = box;
  int n = hi - lo;
  if (n <= 4) {
    bvh.nodes[idx].a = lo;
    bvh.nodes[idx].b = -n;
    return idx;
  }
  AABB cb;
  for (int i = lo; i < hi; ++i) cb.grow(tris[i].centroid);
  float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
  int axis = ext[0] > ext[1] ? (ext[0] > ext[2] ? 0 : 2)
                             : (ext[1] > ext[2] ? 1 : 2);
  int mid = lo + n / 2;
  std::nth_element(tris.begin() + lo, tris.begin() + mid, tris.begin() + hi,
                   [axis](const BuildTri& x, const BuildTri& y) {
                     return (&x.centroid.x)[axis] < (&y.centroid.x)[axis];
                   });
  int32_t l = build(bvh, tris, lo, mid);
  int32_t r = build(bvh, tris, mid, hi);
  bvh.nodes[idx].a = l;
  bvh.nodes[idx].b = r;
  return idx;
}

static void closest_hit(const BVH& bvh, Vec3 o, Vec3 d, float* t_best,
                        int32_t* tri_best) {
  Vec3 inv{1.0f / d.x, 1.0f / d.y, 1.0f / d.z};
  int32_t stack[64];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = bvh.nodes[stack[--sp]];
    if (!slab_hit(n.box, o, inv, *t_best)) continue;
    if (n.b <= 0) {
      int first = n.a, cnt = -n.b;
      for (int i = 0; i < cnt; ++i) {
        float t;
        if (tri_hit(o, d, bvh.p0[first + i], bvh.e1[first + i],
                    bvh.e2[first + i], &t) &&
            t < *t_best) {
          *t_best = t;
          *tri_best = bvh.tri_ids[first + i];
        }
      }
    } else if (sp < 62) {
      stack[sp++] = n.a;
      stack[sp++] = n.b;
    }
  }
}

}  // namespace

extern "C" {

void* rc_build(const float* verts, int64_t n_verts, const int32_t* tris,
               int64_t n_tris) {
  (void)n_verts;
  auto* bvh = new BVH();
  std::vector<BuildTri> bt(n_tris);
  std::vector<Vec3> p0(n_tris), e1(n_tris), e2(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    Vec3 a{verts[3 * tris[3 * i] + 0], verts[3 * tris[3 * i] + 1],
           verts[3 * tris[3 * i] + 2]};
    Vec3 b{verts[3 * tris[3 * i + 1] + 0], verts[3 * tris[3 * i + 1] + 1],
           verts[3 * tris[3 * i + 1] + 2]};
    Vec3 c{verts[3 * tris[3 * i + 2] + 0], verts[3 * tris[3 * i + 2] + 1],
           verts[3 * tris[3 * i + 2] + 2]};
    p0[i] = a;
    e1[i] = sub(b, a);
    e2[i] = sub(c, a);
    bt[i].box.grow(a);
    bt[i].box.grow(b);
    bt[i].box.grow(c);
    bt[i].centroid = {(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                      (a.z + b.z + c.z) / 3};
    bt[i].id = (int32_t)i;
  }
  if (n_tris > 0) build(*bvh, bt, 0, (int)n_tris);
  bvh->p0.resize(n_tris);
  bvh->e1.resize(n_tris);
  bvh->e2.resize(n_tris);
  bvh->tri_ids.resize(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    bvh->p0[i] = p0[bt[i].id];
    bvh->e1[i] = e1[bt[i].id];
    bvh->e2[i] = e2[bt[i].id];
    bvh->tri_ids[i] = bt[i].id;
  }
  return bvh;
}

// Closest hit per ray; out_t = FLT_MAX and out_tri = -1 on miss.
void rc_closest_hits(void* handle, const float* origins, const float* dirs,
                     int64_t n_rays, float* out_t, int32_t* out_tri) {
  auto* bvh = static_cast<BVH*>(handle);
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n_rays; ++i) {
    float t = FLT_MAX;
    int32_t tri = -1;
    if (!bvh->nodes.empty()) {
      Vec3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
      Vec3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
      closest_hit(*bvh, o, d, &t, &tri);
    }
    out_t[i] = t;
    out_tri[i] = tri;
  }
}

void rc_free(void* handle) { delete static_cast<BVH*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// point-to-mesh distance + ray parity (the reference's TriangleBvh
// signed-distance queries, src/triangle_bvh.cu raystab mode)
// ---------------------------------------------------------------------------

namespace {

static inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// squared distance from point p to triangle (a, a+e1, a+e2)
static inline float point_tri_d2(Vec3 p, Vec3 a, Vec3 e1, Vec3 e2) {
  Vec3 d = sub(p, a);
  float a11 = dot(e1, e1), a12 = dot(e1, e2), a22 = dot(e2, e2);
  float b1 = dot(e1, d), b2 = dot(e2, d);
  float det = a11 * a22 - a12 * a12;
  float u = (a22 * b1 - a12 * b2), v = (a11 * b2 - a12 * b1);
  if (det > 0 && u >= 0 && v >= 0 && u + v <= det) {
    u /= det;
    v /= det;
  } else {
    // clamp to edges: test the three edges, keep the best
    auto seg = [&](Vec3 s0, Vec3 dir, float len2) {
      float t = len2 > 0 ? clampf(dot(sub(p, s0), dir) / len2, 0.f, 1.f) : 0.f;
      Vec3 q{s0.x + t * dir.x, s0.y + t * dir.y, s0.z + t * dir.z};
      Vec3 pq = sub(p, q);
      return dot(pq, pq);
    };
    Vec3 b{a.x + e1.x, a.y + e1.y, a.z + e1.z};
    Vec3 e3 = sub(e2, e1);
    float d2 = seg(a, e1, a11);
    float d2b = seg(a, e2, a22);
    float d2c = seg(b, e3, dot(e3, e3));
    return std::min(d2, std::min(d2b, d2c));
  }
  Vec3 q{a.x + u * e1.x + v * e2.x, a.y + u * e1.y + v * e2.y,
         a.z + u * e1.z + v * e2.z};
  Vec3 pq = sub(p, q);
  return dot(pq, pq);
}

static inline float point_aabb_d2(const AABB& b, Vec3 p) {
  float dx = std::max({b.lo.x - p.x, 0.0f, p.x - b.hi.x});
  float dy = std::max({b.lo.y - p.y, 0.0f, p.y - b.hi.y});
  float dz = std::max({b.lo.z - p.z, 0.0f, p.z - b.hi.z});
  return dx * dx + dy * dy + dz * dz;
}

static void closest_point(const BVH& bvh, Vec3 p, float* d2_best,
                          int32_t* tri_best) {
  int32_t stack[64];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = bvh.nodes[stack[--sp]];
    if (point_aabb_d2(n.box, p) >= *d2_best) continue;
    if (n.b <= 0) {
      int first = n.a, cnt = -n.b;
      for (int i = 0; i < cnt; ++i) {
        float d2 = point_tri_d2(p, bvh.p0[first + i], bvh.e1[first + i],
                                bvh.e2[first + i]);
        if (d2 < *d2_best) {
          *d2_best = d2;
          *tri_best = bvh.tri_ids[first + i];
        }
      }
    } else if (sp < 62) {
      stack[sp++] = n.a;
      stack[sp++] = n.b;
    }
  }
}

static int count_hits(const BVH& bvh, Vec3 o, Vec3 d) {
  Vec3 inv{1.0f / d.x, 1.0f / d.y, 1.0f / d.z};
  int32_t stack[64];
  int sp = 0, count = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = bvh.nodes[stack[--sp]];
    if (!slab_hit(n.box, o, inv, FLT_MAX)) continue;
    if (n.b <= 0) {
      int first = n.a, cnt = -n.b;
      for (int i = 0; i < cnt; ++i) {
        float t;
        if (tri_hit(o, d, bvh.p0[first + i], bvh.e1[first + i],
                    bvh.e2[first + i], &t))
          ++count;
      }
    } else if (sp < 62) {
      stack[sp++] = n.a;
      stack[sp++] = n.b;
    }
  }
  return count;
}

}  // namespace

extern "C" {

// Unsigned distance + nearest triangle per point.
void rc_closest_points(void* handle, const float* pts, int64_t n,
                       float* out_dist, int32_t* out_tri) {
  auto* bvh = static_cast<BVH*>(handle);
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    float d2 = FLT_MAX;
    int32_t tri = -1;
    if (!bvh->nodes.empty()) {
      Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
      closest_point(*bvh, p, &d2, &tri);
    }
    out_dist[i] = std::sqrt(d2);
    out_tri[i] = tri;
  }
}

// Parity sign via ray-stab intersection counting (odd = inside). Uses a
// fixed slightly-irrational direction to dodge shared-edge double counts.
void rc_inside(void* handle, const float* pts, int64_t n,
               int32_t* out_inside) {
  auto* bvh = static_cast<BVH*>(handle);
  Vec3 dir{0.57735f, 0.70711f, 0.40825f};
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    int c = 0;
    if (!bvh->nodes.empty()) {
      Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
      c = count_hits(*bvh, p, dir);
    }
    out_inside[i] = c & 1;
  }
}

}  // extern "C"
