// Native scene-prep runtime: BVH build + DFS linearization + OBJ parsing.
//
// TPU-native counterpart of the reference's C++ host-side scene prep:
//   - median-split BVH  (reference: split/buildBVH, src/main.cpp:1111-1193)
//   - serialization layout: post-order children, ROOT LAST, leaf marker
//     left == -1, leaves emit contiguous index ranges
//     (reference: serializeBVH, src/main.cpp:955-979)
//   - skip-pointer DFS linearization for the vectorized TPU traversal
//     (no reference analogue; replaces the per-thread stack of
//     gpu_shader.comp:384-427)
//   - OBJ triangle loading (reference: Assimp import, src/model.hpp:49-84;
//     only triangulated positions are consumed, src/mesh.hpp:163-189)
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (raytracer_tpu/native.py). Build: make -C native (g++ -O2 -shared).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <limits>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Node {
  float bmin[3];
  float bmax[3];
  int left = -1;
  int right = -1;
  std::vector<int> idx;  // subtree shape list (kept on every node, like the
                         // reference's Node::shapesIndices)
};

struct Bvh {
  std::vector<Node> nodes;  // root last
  std::vector<int> indices; // leaf-emitted flat list
  std::vector<int> start;   // per node: emission offset (serializeBVH)
};

inline void grow(float bmin[3], float bmax[3], const float* mins,
                 const float* maxs, const std::vector<int>& idx) {
  for (int k = 0; k < 3; ++k) {
    bmin[k] = std::numeric_limits<float>::infinity();
    bmax[k] = -std::numeric_limits<float>::infinity();
  }
  for (int i : idx) {
    for (int k = 0; k < 3; ++k) {
      bmin[k] = std::min(bmin[k], mins[i * 3 + k]);
      bmax[k] = std::max(bmax[k], maxs[i * 3 + k]);
    }
  }
}

// Recursive split, identical decision procedure AND emission order to
// main.cpp:1111-1173: axis = largest extent (x wins ties vs max(y,z); y
// wins vs z), split at box center, partition by shape center, leaf when
// depth exhausted or a child would be empty. Children are appended by the
// PARENT after both recursions return (left-subtree, right-subtree, left,
// right) — the reference's exact order; the root is pushed last by build.
void split(Bvh& out, Node& node, int depth, const float* mins,
           const float* maxs, const float* centers) {
  if (depth <= 0) return;
  float size[3] = {node.bmax[0] - node.bmin[0], node.bmax[1] - node.bmin[1],
                   node.bmax[2] - node.bmin[2]};
  int axis = size[0] > std::max(size[1], size[2]) ? 0
             : (size[1] > size[2] ? 1 : 2);
  float split_pos = (node.bmin[axis] + node.bmax[axis]) * 0.5f;

  Node left, right;
  for (int i : node.idx) {
    if (centers[i * 3 + axis] < split_pos)
      left.idx.push_back(i);
    else
      right.idx.push_back(i);
  }
  if (left.idx.empty() || right.idx.empty()) return;
  grow(left.bmin, left.bmax, mins, maxs, left.idx);
  grow(right.bmin, right.bmax, mins, maxs, right.idx);
  split(out, left, depth - 1, mins, maxs, centers);
  split(out, right, depth - 1, mins, maxs, centers);
  out.nodes.push_back(std::move(left));
  node.left = static_cast<int>(out.nodes.size()) - 1;
  out.nodes.push_back(std::move(right));
  node.right = static_cast<int>(out.nodes.size()) - 1;
}

}  // namespace

extern "C" {

void* rt_bvh_build(const float* mins, const float* maxs, const float* centers,
                   int n, int max_depth) {
  auto* bvh = new Bvh();
  Node root;
  root.idx.resize(n);
  for (int i = 0; i < n; ++i) root.idx[i] = i;
  grow(root.bmin, root.bmax, mins, maxs, root.idx);
  split(*bvh, root, max_depth, mins, maxs, centers);
  bvh->nodes.push_back(std::move(root));  // root last (main.cpp:1190)

  // serializeBVH (main.cpp:955-979): start = running emission offset,
  // only leaves emit.
  bvh->start.resize(bvh->nodes.size());
  for (size_t i = 0; i < bvh->nodes.size(); ++i) {
    bvh->start[i] = static_cast<int>(bvh->indices.size());
    if (bvh->nodes[i].left == -1)
      bvh->indices.insert(bvh->indices.end(), bvh->nodes[i].idx.begin(),
                          bvh->nodes[i].idx.end());
  }
  return bvh;
}

int rt_bvh_num_nodes(void* h) {
  return static_cast<int>(static_cast<Bvh*>(h)->nodes.size());
}

int rt_bvh_num_indices(void* h) {
  return static_cast<int>(static_cast<Bvh*>(h)->indices.size());
}

// total size of the per-node subtree-list CSR payload
int64_t rt_bvh_subtree_total(void* h) {
  auto* b = static_cast<Bvh*>(h);
  int64_t total = 0;
  for (auto& n : b->nodes) total += static_cast<int64_t>(n.idx.size());
  return total;
}

void rt_bvh_get(void* h, float* bounds_min, float* bounds_max, int* left,
                int* right, int* start, int* count, int* indices,
                int64_t* sub_ptr, int* sub_idx) {
  auto* b = static_cast<Bvh*>(h);
  int64_t sp = 0;
  for (size_t i = 0; i < b->nodes.size(); ++i) {
    const Node& n = b->nodes[i];
    std::memcpy(bounds_min + i * 3, n.bmin, 3 * sizeof(float));
    std::memcpy(bounds_max + i * 3, n.bmax, 3 * sizeof(float));
    left[i] = n.left;
    right[i] = n.right;
    start[i] = b->start[i];
    count[i] = static_cast<int>(n.idx.size());
    if (sub_ptr) {
      sub_ptr[i] = sp;
      if (sub_idx)
        std::memcpy(sub_idx + sp, n.idx.data(), n.idx.size() * sizeof(int));
      sp += static_cast<int64_t>(n.idx.size());
    }
  }
  if (sub_ptr) sub_ptr[b->nodes.size()] = sp;
  std::memcpy(indices, b->indices.data(), b->indices.size() * sizeof(int));
}

// DFS linearization with skip pointers (accel/linearize.py contract):
// nodes re-emitted depth-first from the root (last array slot), perm holds
// shape ids in DFS-leaf order, skip[i] = DFS index just past i's subtree.
void rt_bvh_linearize(void* h, float* bounds6, int* leaf_start,
                      int* leaf_count, int* skip, int* perm) {
  auto* b = static_cast<Bvh*>(h);
  const int m = static_cast<int>(b->nodes.size());
  int next = 0;
  int emitted = 0;
  // iterative DFS: stack of (node, phase). phase 0 = enter, 1 = fix skip.
  std::vector<std::pair<int, int>> stack;
  std::vector<int> my_slot(m, -1);
  stack.push_back({m - 1, 0});
  while (!stack.empty()) {
    auto [node, phase] = stack.back();
    stack.pop_back();
    const Node& n = b->nodes[node];
    if (phase == 0) {
      int me = next++;
      my_slot[node] = me;
      for (int k = 0; k < 3; ++k) {
        bounds6[me * 6 + k] = n.bmin[k];
        bounds6[me * 6 + 3 + k] = n.bmax[k];
      }
      stack.push_back({node, 1});  // fix skip after subtree emitted
      if (n.left == -1) {
        leaf_start[me] = emitted;
        leaf_count[me] = static_cast<int>(n.idx.size());
        for (int i : n.idx) perm[emitted++] = i;
      } else {
        leaf_start[me] = 0;
        leaf_count[me] = 0;
        stack.push_back({n.right, 0});  // right under left (left emitted first)
        stack.push_back({n.left, 0});
      }
    } else {
      skip[my_slot[node]] = next;
    }
  }
}

void rt_bvh_free(void* h) { delete static_cast<Bvh*>(h); }

// ---------------------------------------------------------------------------
// OBJ parsing: v + f with fan triangulation, negative indices, v/vt/vn forms.
// Matches raytracer_tpu/io/obj.py (all objects concatenated).

struct ObjData {
  std::vector<float> tris;  // T * 9 floats
};

void* rt_obj_load(const char* path) {
  std::ifstream f(path);
  if (!f.is_open()) return nullptr;
  auto* out = new ObjData();
  std::vector<float> verts;
  std::string line;
  std::vector<int> face;
  while (std::getline(f, line)) {
    if (line.size() < 2) continue;
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x, y, z;
      if (sscanf(line.c_str() + 2, "%f %f %f", &x, &y, &z) == 3) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      face.clear();
      std::istringstream ss(line.substr(2));
      std::string tok;
      while (ss >> tok) {
        int v = atoi(tok.c_str());  // stops at '/'
        int nverts = static_cast<int>(verts.size() / 3);
        face.push_back(v > 0 ? v - 1 : nverts + v);
      }
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        const int ids[3] = {face[0], face[k], face[k + 1]};
        for (int id : ids)
          for (int c = 0; c < 3; ++c) out->tris.push_back(verts[id * 3 + c]);
      }
    }
  }
  return out;
}

int rt_obj_num_tris(void* h) {
  return h ? static_cast<int>(static_cast<ObjData*>(h)->tris.size() / 9) : -1;
}

void rt_obj_get(void* h, float* tris) {
  auto* o = static_cast<ObjData*>(h);
  std::memcpy(tris, o->tris.data(), o->tris.size() * sizeof(float));
}

void rt_obj_free(void* h) { delete static_cast<ObjData*>(h); }

}  // extern "C"
