// Host-side BVH builder (C++), producing the same DFS/skip-link flat layout
// as the Python reference implementation in dreammat_tpu/ops/bvh.py.
//
// This replaces the reference's CUDA BVH *build* (the ashawkey/_raytracing
// extension builds its BVH in C++ too); traversal stays on-device in JAX.
// Exposed via a C ABI for ctypes; no pybind11 in the image.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int LEAF_SIZE = 4;

struct BuildContext {
  const float* tri_min;       // [F,3]
  const float* tri_max;       // [F,3]
  const float* centroids;     // [F,3]
  std::vector<float> node_min;
  std::vector<float> node_max;
  std::vector<int32_t> node_first;
  std::vector<int32_t> node_count;
  std::vector<int32_t> subtree_end;
  std::vector<int64_t> out_tris;
};

// iterative post-order style build using an explicit work stack; emits nodes
// in DFS order and records subtree extents for the skip links.
void build(BuildContext& ctx, std::vector<int64_t>& tris) {
  struct Task {
    std::vector<int64_t> idx;
    int node_slot;  // already-emitted node to finalize, or -1 to emit
  };

  // recursion via explicit stack; each frame emits its node then pushes
  // children; subtree_end fixed afterwards in a second pass
  struct Frame {
    std::vector<int64_t> idx;
  };
  // Because subtree_end[i] = index after the subtree and DFS order means the
  // subtree occupies a contiguous node range, we can compute it as the node
  // count after the frame's whole subtree is emitted. Use real recursion via
  // an explicit stack with a "post" marker.
  struct Rec {
    std::vector<int64_t> idx;
    int my_node = -1;
    bool post = false;
  };

  std::vector<Rec> stack;
  stack.push_back({std::move(tris), -1, false});
  while (!stack.empty()) {
    Rec frame = std::move(stack.back());
    stack.pop_back();
    if (frame.post) {
      ctx.subtree_end[frame.my_node] = (int32_t)ctx.node_count.size();
      continue;
    }
    const auto& idx = frame.idx;
    int my = (int)ctx.node_count.size();
    float bmin[3] = {1e30f, 1e30f, 1e30f};
    float bmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t t : idx) {
      for (int d = 0; d < 3; ++d) {
        bmin[d] = std::min(bmin[d], ctx.tri_min[t * 3 + d]);
        bmax[d] = std::max(bmax[d], ctx.tri_max[t * 3 + d]);
      }
    }
    ctx.node_min.insert(ctx.node_min.end(), bmin, bmin + 3);
    ctx.node_max.insert(ctx.node_max.end(), bmax, bmax + 3);

    if ((int)idx.size() <= LEAF_SIZE) {
      ctx.node_first.push_back((int32_t)ctx.out_tris.size());
      ctx.node_count.push_back((int32_t)idx.size());
      ctx.subtree_end.push_back(my + 1);
      for (int64_t t : idx) ctx.out_tris.push_back(t);
      continue;
    }
    ctx.node_first.push_back(0);
    ctx.node_count.push_back(0);
    ctx.subtree_end.push_back(0);  // fixed by the post marker

    // split axis = largest centroid extent; median split
    float cmin[3] = {1e30f, 1e30f, 1e30f};
    float cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t t : idx) {
      for (int d = 0; d < 3; ++d) {
        float c = ctx.centroids[t * 3 + d];
        cmin[d] = std::min(cmin[d], c);
        cmax[d] = std::max(cmax[d], c);
      }
    }
    int axis = 0;
    float best = -1.0f;
    for (int d = 0; d < 3; ++d) {
      if (cmax[d] - cmin[d] > best) {
        best = cmax[d] - cmin[d];
        axis = d;
      }
    }
    std::vector<int64_t> sorted = idx;
    size_t half = sorted.size() / 2;
    std::nth_element(
        sorted.begin(), sorted.begin() + half, sorted.end(),
        [&](int64_t a, int64_t b) {
          return ctx.centroids[a * 3 + axis] < ctx.centroids[b * 3 + axis];
        });
    std::vector<int64_t> left(sorted.begin(), sorted.begin() + half);
    std::vector<int64_t> right(sorted.begin() + half, sorted.end());

    // push post-marker first so it runs after both children complete
    Rec post;
    post.my_node = my;
    post.post = true;
    stack.push_back(std::move(post));
    Rec r;
    r.idx = std::move(right);
    stack.push_back(std::move(r));
    Rec l;
    l.idx = std::move(left);
    stack.push_back(std::move(l));
  }
}

}  // namespace

extern "C" {

// Returns the number of nodes; fills caller-inspectable sizes first via
// bvh_build, then bvh_read copies the arrays out.
struct BVHResult {
  std::vector<float> node_min, node_max;
  std::vector<int32_t> node_miss, node_first, node_count;
  std::vector<int64_t> out_tris;
};

void* bvh_build(const float* vertices, int64_t n_vertices,
                const int64_t* faces, int64_t n_faces,
                int64_t* n_nodes_out, int64_t* n_tris_out) {
  std::vector<float> tri_min(n_faces * 3), tri_max(n_faces * 3), cent(n_faces * 3);
  for (int64_t f = 0; f < n_faces; ++f) {
    for (int d = 0; d < 3; ++d) {
      float v0 = vertices[faces[f * 3 + 0] * 3 + d];
      float v1 = vertices[faces[f * 3 + 1] * 3 + d];
      float v2 = vertices[faces[f * 3 + 2] * 3 + d];
      float mn = std::min(v0, std::min(v1, v2));
      float mx = std::max(v0, std::max(v1, v2));
      tri_min[f * 3 + d] = mn;
      tri_max[f * 3 + d] = mx;
      cent[f * 3 + d] = 0.5f * (mn + mx);
    }
  }
  BuildContext ctx;
  ctx.tri_min = tri_min.data();
  ctx.tri_max = tri_max.data();
  ctx.centroids = cent.data();
  std::vector<int64_t> all(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) all[i] = i;
  build(ctx, all);

  auto* res = new BVHResult();
  res->node_min = std::move(ctx.node_min);
  res->node_max = std::move(ctx.node_max);
  res->node_first = std::move(ctx.node_first);
  res->node_count = std::move(ctx.node_count);
  res->out_tris = std::move(ctx.out_tris);
  int64_t n_nodes = (int64_t)res->node_count.size();
  res->node_miss.resize(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) {
    int32_t end = ctx.subtree_end[i];
    res->node_miss[i] = (end >= n_nodes) ? -1 : end;
  }
  *n_nodes_out = n_nodes;
  *n_tris_out = (int64_t)res->out_tris.size();
  return res;
}

void bvh_read(void* handle, float* node_min, float* node_max,
              int32_t* node_miss, int32_t* node_first, int32_t* node_count,
              int64_t* out_tris) {
  auto* res = reinterpret_cast<BVHResult*>(handle);
  std::memcpy(node_min, res->node_min.data(), res->node_min.size() * sizeof(float));
  std::memcpy(node_max, res->node_max.data(), res->node_max.size() * sizeof(float));
  std::memcpy(node_miss, res->node_miss.data(), res->node_miss.size() * sizeof(int32_t));
  std::memcpy(node_first, res->node_first.data(), res->node_first.size() * sizeof(int32_t));
  std::memcpy(node_count, res->node_count.data(), res->node_count.size() * sizeof(int32_t));
  std::memcpy(out_tris, res->out_tris.data(), res->out_tris.size() * sizeof(int64_t));
  delete res;
}
}
