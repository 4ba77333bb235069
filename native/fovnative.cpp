// fovnative: native host runtime for fovtrace.
//
// TPU-native counterpart of the reference's C++ host layer: the OptiX
// Trbvh acceleration build (REF/PathTracer.cpp:641,648) and the sutil
// OBJ mesh loader (REF/sutil_sdk/include/Mesh.h:64-85, OptiXMesh.h:51-76).
// The device side is JAX/Pallas; this library owns the host-side scene
// prep, where Python is too slow for production asset sizes:
//
//   * binned-SAH BVH2 builder emitting the same flat SoA layout as
//     fovtrace/scene/bvh.py (nodes_min/max, left/right, leaf flags,
//     leaf-aligned triangle order) — bit-compatible semantics so the
//     Python builder doubles as the test oracle
//   * OBJ parser producing flat vertex/normal/uv/index buffers
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// image). Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct BuildResult {
  std::vector<float> nodes_min;   // [Nn*3]
  std::vector<float> nodes_max;   // [Nn*3]
  std::vector<int32_t> nodes_left;
  std::vector<int32_t> nodes_right;
  std::vector<int32_t> nodes_leaf;
  std::vector<int64_t> order;     // leaf-aligned triangle order, -1 = pad
  int32_t max_depth = 0;
};

struct Builder {
  const float* v0;
  const float* e1;
  const float* e2;
  int max_leaf;
  int leaf_align;
  int num_bins;

  std::vector<int64_t> idx_all;       // valid triangle ids
  std::vector<V3> tri_min, tri_max, centroid;
  BuildResult out;

  static double surface(const V3& mn, const V3& mx) {
    double dx = std::max(0.0f, mx.x - mn.x);
    double dy = std::max(0.0f, mx.y - mn.y);
    double dz = std::max(0.0f, mx.z - mn.z);
    return 2.0 * (dx * dy + dy * dz + dz * dx);
  }

  int new_node() {
    out.nodes_min.insert(out.nodes_min.end(), {0, 0, 0});
    out.nodes_max.insert(out.nodes_max.end(), {0, 0, 0});
    out.nodes_left.push_back(0);
    out.nodes_right.push_back(0);
    out.nodes_leaf.push_back(0);
    return (int)out.nodes_leaf.size() - 1;
  }

  int make_leaf(int node, const std::vector<int32_t>& ids) {
    int start = (int)out.order.size();
    for (int32_t li : ids) out.order.push_back(idx_all[li]);
    int pad = (int)((-(int64_t)ids.size()) % leaf_align);
    if (pad < 0) pad += leaf_align;
    for (int p = 0; p < pad; ++p) out.order.push_back(-1);
    out.nodes_left[node] = start;
    out.nodes_right[node] = (int32_t)(ids.size() + pad);
    out.nodes_leaf[node] = 1;
    return node;
  }

  // iterative build with an explicit stack (no recursion limits)
  void build_all(int64_t t) {
    struct Task {
      std::vector<int32_t> ids;
      int depth;
      int parent;     // node index whose child slot to fill; -1 = root
      bool is_left;
    };
    std::vector<Task> stack;
    std::vector<int32_t> root_ids((size_t)t);
    for (int64_t i = 0; i < t; ++i) root_ids[(size_t)i] = (int32_t)i;
    stack.push_back({std::move(root_ids), 0, -1, false});

    while (!stack.empty()) {
      Task task = std::move(stack.back());
      stack.pop_back();
      int node = new_node();
      if (task.parent >= 0) {
        if (task.is_left)
          out.nodes_left[task.parent] = node;
        else
          out.nodes_right[task.parent] = node;
      }
      out.max_depth = std::max(out.max_depth, (int32_t)task.depth);

      V3 bmin = {FLT_MAX, FLT_MAX, FLT_MAX};
      V3 bmax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      V3 cmin = bmin, cmax = bmax;
      for (int32_t li : task.ids) {
        bmin = vmin(bmin, tri_min[li]);
        bmax = vmax(bmax, tri_max[li]);
        cmin = vmin(cmin, centroid[li]);
        cmax = vmax(cmax, centroid[li]);
      }
      std::memcpy(&out.nodes_min[(size_t)node * 3], &bmin, 12);
      std::memcpy(&out.nodes_max[(size_t)node * 3], &bmax, 12);

      if ((int)task.ids.size() <= max_leaf) {
        make_leaf(node, task.ids);
        continue;
      }

      V3 ext = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
      int axis = 0;
      float best_ext = ext.x;
      if (ext.y > best_ext) { axis = 1; best_ext = ext.y; }
      if (ext.z > best_ext) { axis = 2; best_ext = ext.z; }
      if (best_ext < 1e-12f) {
        make_leaf(node, task.ids);
        continue;
      }

      auto cget = [&](int32_t li) {
        const V3& c = centroid[li];
        return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
      };
      float c0 = axis == 0 ? cmin.x : (axis == 1 ? cmin.y : cmin.z);

      // binned SAH
      std::vector<int> bin_of(task.ids.size());
      std::vector<int> bin_count(num_bins, 0);
      std::vector<V3> bin_min(num_bins, {FLT_MAX, FLT_MAX, FLT_MAX});
      std::vector<V3> bin_max(num_bins, {-FLT_MAX, -FLT_MAX, -FLT_MAX});
      for (size_t k = 0; k < task.ids.size(); ++k) {
        int32_t li = task.ids[k];
        int b = (int)((cget(li) - c0) / best_ext * num_bins);
        b = std::max(0, std::min(num_bins - 1, b));
        bin_of[k] = b;
        bin_count[b]++;
        bin_min[b] = vmin(bin_min[b], tri_min[li]);
        bin_max[b] = vmax(bin_max[b], tri_max[li]);
      }

      double best_cost = DBL_MAX;
      int best_split = -1;
      for (int split = 1; split < num_bins; ++split) {
        int64_t nl = 0, nr = 0;
        V3 lmin = {FLT_MAX, FLT_MAX, FLT_MAX},
           lmax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        V3 rmin = lmin, rmax = lmax;
        for (int b = 0; b < split; ++b) {
          if (!bin_count[b]) continue;
          nl += bin_count[b];
          lmin = vmin(lmin, bin_min[b]);
          lmax = vmax(lmax, bin_max[b]);
        }
        for (int b = split; b < num_bins; ++b) {
          if (!bin_count[b]) continue;
          nr += bin_count[b];
          rmin = vmin(rmin, bin_min[b]);
          rmax = vmax(rmax, bin_max[b]);
        }
        if (!nl || !nr) continue;
        double cost = surface(lmin, lmax) * (double)nl +
                      surface(rmin, rmax) * (double)nr;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = split;
        }
      }

      std::vector<int32_t> lids, rids;
      if (best_split < 0) {
        // all centroids in one bin: median split
        std::vector<int32_t> sorted = task.ids;
        std::sort(sorted.begin(), sorted.end(),
                  [&](int32_t a, int32_t b) { return cget(a) < cget(b); });
        size_t half = sorted.size() / 2;
        lids.assign(sorted.begin(), sorted.begin() + half);
        rids.assign(sorted.begin() + half, sorted.end());
      } else {
        for (size_t k = 0; k < task.ids.size(); ++k) {
          if (bin_of[k] < best_split)
            lids.push_back(task.ids[k]);
          else
            rids.push_back(task.ids[k]);
        }
      }
      // push right first so left is processed first (matches the
      // recursive python builder's node numbering: left subtree before
      // right subtree)
      stack.push_back({std::move(rids), task.depth + 1, node, false});
      stack.push_back({std::move(lids), task.depth + 1, node, true});
    }
  }
};

}  // namespace

extern "C" {

// ------------------------------------------------------------------ BVH
// Returns an opaque handle (heap pointer), or nullptr on failure.
void* fov_bvh_build(const float* v0, const float* e1, const float* e2,
                    const uint8_t* valid, int64_t num_tris, int max_leaf,
                    int leaf_align, int num_bins) {
  auto* b = new (std::nothrow) Builder();
  if (!b) return nullptr;
  b->v0 = v0;
  b->e1 = e1;
  b->e2 = e2;
  b->max_leaf = max_leaf;
  b->leaf_align = leaf_align;
  b->num_bins = num_bins;

  for (int64_t i = 0; i < num_tris; ++i)
    if (valid[i]) b->idx_all.push_back(i);
  int64_t t = (int64_t)b->idx_all.size();
  if (t == 0) {
    delete b;
    return nullptr;
  }

  b->tri_min.resize((size_t)t);
  b->tri_max.resize((size_t)t);
  b->centroid.resize((size_t)t);
  for (int64_t k = 0; k < t; ++k) {
    int64_t i = b->idx_all[(size_t)k];
    V3 p0 = {v0[i * 3], v0[i * 3 + 1], v0[i * 3 + 2]};
    V3 p1 = {p0.x + e1[i * 3], p0.y + e1[i * 3 + 1], p0.z + e1[i * 3 + 2]};
    V3 p2 = {p0.x + e2[i * 3], p0.y + e2[i * 3 + 1], p0.z + e2[i * 3 + 2]};
    V3 mn = vmin(vmin(p0, p1), p2);
    V3 mx = vmax(vmax(p0, p1), p2);
    b->tri_min[(size_t)k] = mn;
    b->tri_max[(size_t)k] = mx;
    b->centroid[(size_t)k] = {(mn.x + mx.x) * 0.5f, (mn.y + mx.y) * 0.5f,
                              (mn.z + mx.z) * 0.5f};
  }
  b->build_all(t);
  return b;
}

int64_t fov_bvh_num_nodes(void* h) {
  return (int64_t)((Builder*)h)->out.nodes_leaf.size();
}
int64_t fov_bvh_order_len(void* h) {
  return (int64_t)((Builder*)h)->out.order.size();
}
int32_t fov_bvh_max_depth(void* h) {
  return ((Builder*)h)->out.max_depth;
}

void fov_bvh_copy(void* h, float* nodes_min, float* nodes_max,
                  int32_t* nodes_left, int32_t* nodes_right,
                  int32_t* nodes_leaf, int64_t* order) {
  auto& o = ((Builder*)h)->out;
  std::memcpy(nodes_min, o.nodes_min.data(), o.nodes_min.size() * 4);
  std::memcpy(nodes_max, o.nodes_max.data(), o.nodes_max.size() * 4);
  std::memcpy(nodes_left, o.nodes_left.data(), o.nodes_left.size() * 4);
  std::memcpy(nodes_right, o.nodes_right.data(), o.nodes_right.size() * 4);
  std::memcpy(nodes_leaf, o.nodes_leaf.data(), o.nodes_leaf.size() * 4);
  std::memcpy(order, o.order.data(), o.order.size() * 8);
}

void fov_bvh_free(void* h) { delete (Builder*)h; }

// ------------------------------------------------------------------ OBJ
// Minimal OBJ parser: v / vn / vt / f (triangulated as a fan). Returns a
// handle; getters expose flat buffers (positions [V,3], normals [V,3] or
// empty, uvs [V,2] or empty, indices [F,3]), one vertex per unique
// (v, vt, vn) triple (matching the python loader fovtrace/scene/obj.py).
struct ObjData {
  std::vector<float> pos;      // unique-triple expanded
  std::vector<float> norm;
  std::vector<float> uv;
  std::vector<int64_t> tris;
  bool has_norm = false;
  bool has_uv = false;
};

void* fov_obj_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::vector<float> vs, vns, vts;
  auto* d = new ObjData();

  // map (v, vt, vn) -> emitted index
  struct Key {
    int64_t v, t, n;
    bool operator==(const Key& o) const {
      return v == o.v && t == o.t && n == o.n;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return (size_t)(k.v * 1000003 ^ k.t * 10007 ^ k.n * 101);
    }
  };
  // simple open-addressing map to avoid <unordered_map> overhead
  std::vector<std::pair<Key, int64_t>> map_slots;
  size_t map_cap = 1 << 16;
  map_slots.assign(map_cap, {{-2, -2, -2}, -1});
  size_t map_size = 0;

  auto map_get_or_add = [&](const Key& k, bool* added) -> int64_t {
    if (map_size * 2 >= map_cap) {  // grow
      auto old = std::move(map_slots);
      map_cap *= 2;
      map_slots.assign(map_cap, {{-2, -2, -2}, -1});
      map_size = 0;
      for (auto& kv : old)
        if (kv.second >= 0) {
          size_t h = KeyHash()(kv.first) & (map_cap - 1);
          while (map_slots[h].second >= 0) h = (h + 1) & (map_cap - 1);
          map_slots[h] = kv;
          map_size++;
        }
    }
    size_t h = KeyHash()(k) & (map_cap - 1);
    while (map_slots[h].second >= 0) {
      if (map_slots[h].first == k) {
        *added = false;
        return map_slots[h].second;
      }
      h = (h + 1) & (map_cap - 1);
    }
    int64_t id = (int64_t)(d->pos.size() / 3);
    map_slots[h] = {k, id};
    map_size++;
    *added = true;
    return id;
  };

  auto resolve = [](int64_t i, int64_t n) -> int64_t {
    return i > 0 ? i - 1 : (i < 0 ? n + i : -1);
  };

  char line[4096];
  std::vector<int64_t> face;  // emitted ids of the current face
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      float x, y, z;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        vs.push_back(x);
        vs.push_back(y);
        vs.push_back(z);
      }
    } else if (line[0] == 'v' && line[1] == 'n') {
      float x, y, z;
      if (std::sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
        vns.push_back(x);
        vns.push_back(y);
        vns.push_back(z);
      }
    } else if (line[0] == 'v' && line[1] == 't') {
      float u, v;
      if (std::sscanf(line + 3, "%f %f", &u, &v) == 2) {
        vts.push_back(u);
        vts.push_back(v);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      face.clear();
      char* p = line + 2;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\n' || *p == '\r' || !*p) break;
        int64_t vi = 0, ti = 0, ni = 0;
        vi = std::strtoll(p, &p, 10);
        if (*p == '/') {
          ++p;
          if (*p != '/') ti = std::strtoll(p, &p, 10);
          if (*p == '/') {
            ++p;
            ni = std::strtoll(p, &p, 10);
          }
        }
        Key k = {resolve(vi, (int64_t)vs.size() / 3),
                 ti ? resolve(ti, (int64_t)vts.size() / 2) : -1,
                 ni ? resolve(ni, (int64_t)vns.size() / 3) : -1};
        if (k.v < 0) break;
        bool added = false;
        int64_t id = map_get_or_add(k, &added);
        if (added) {
          d->pos.push_back(vs[(size_t)k.v * 3]);
          d->pos.push_back(vs[(size_t)k.v * 3 + 1]);
          d->pos.push_back(vs[(size_t)k.v * 3 + 2]);
          if (k.n >= 0) {
            d->has_norm = true;
            d->norm.push_back(vns[(size_t)k.n * 3]);
            d->norm.push_back(vns[(size_t)k.n * 3 + 1]);
            d->norm.push_back(vns[(size_t)k.n * 3 + 2]);
          } else {
            d->norm.push_back(0);
            d->norm.push_back(0);
            d->norm.push_back(0);
          }
          if (k.t >= 0) {
            d->has_uv = true;
            d->uv.push_back(vts[(size_t)k.t * 2]);
            d->uv.push_back(vts[(size_t)k.t * 2 + 1]);
          } else {
            d->uv.push_back(0);
            d->uv.push_back(0);
          }
        }
        face.push_back(id);
      }
      for (size_t i = 2; i < face.size(); ++i) {  // fan triangulation
        d->tris.push_back(face[0]);
        d->tris.push_back(face[i - 1]);
        d->tris.push_back(face[i]);
      }
    }
  }
  std::fclose(f);
  if (d->tris.empty()) {
    delete d;
    return nullptr;
  }
  return d;
}

int64_t fov_obj_num_vertices(void* h) {
  return (int64_t)(((ObjData*)h)->pos.size() / 3);
}
int64_t fov_obj_num_tris(void* h) {
  return (int64_t)(((ObjData*)h)->tris.size() / 3);
}
int32_t fov_obj_has_normals(void* h) { return ((ObjData*)h)->has_norm; }
int32_t fov_obj_has_uvs(void* h) { return ((ObjData*)h)->has_uv; }

void fov_obj_copy(void* h, float* pos, float* norm, float* uv,
                  int64_t* tris) {
  auto* d = (ObjData*)h;
  std::memcpy(pos, d->pos.data(), d->pos.size() * 4);
  std::memcpy(norm, d->norm.data(), d->norm.size() * 4);
  std::memcpy(uv, d->uv.data(), d->uv.size() * 4);
  std::memcpy(tris, d->tris.data(), d->tris.size() * 8);
}

void fov_obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"
