// Native LBVH -> 8-wide BVH builder.
//
// C++ replacement for the host-side build in accel/lbvh.py (the TPU-native
// equivalent of optixAccelBuild, src/cuda/cuda_mesh.h:33-155): Morton sort,
// Karras-style radix-split binary topology, bottom-up AABBs, and collapse to
// the 8-wide VMEM-friendly node layout. The Python builder walks these loops
// per node and becomes the scene-load bottleneck beyond ~100k triangles;
// this one is O(n log n) in tight loops.
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kEncEmpty = -1;
constexpr int kLeafBits = 5;
constexpr int kMaxLeaf = (1 << kLeafBits) - 1;

inline uint32_t expand_bits10(uint32_t v) {
  // spread the low 10 bits with 2 zero bits between each (morton.py)
  v &= 0x3FF;
  v = (v | (v << 16)) & 0x030000FF;
  v = (v | (v << 8)) & 0x0300F00F;
  v = (v | (v << 4)) & 0x030C30C3;
  v = (v | (v << 2)) & 0x09249249;
  return v;
}

inline uint32_t morton3d(float x, float y, float z) {
  // 30-bit code on a 1024^3 grid, (x << 2) | (y << 1) | z like morton.py
  auto q = [](float f) {
    f *= 1024.0f;
    f = f < 0.f ? 0.f : (f > 1023.f ? 1023.f : f);
    return (uint32_t)f;
  };
  return (expand_bits10(q(x)) << 2) | (expand_bits10(q(y)) << 1) |
         expand_bits10(q(z));
}

struct Range {
  int start, end;  // [start, end)
  int left = -1, right = -1;
};

}  // namespace

extern "C" {

// Build over n triangle AABBs (lo/hi: [n,3] row-major).
// Outputs:
//   perm_out   [n]              Morton ordering of the faces
//   child_lo   [cap_nodes,8,3]  per-slot child AABB minima
//   child_hi   [cap_nodes,8,3]
//   child      [cap_nodes,8]    slot encodings (>=0 node, -1 empty,
//                               <=-2 leaf -(2+(start<<5)+count))
// Returns the wide-node count, or -1 if cap_nodes was too small, -2 on bad
// arguments.
int rt_build_bvh8(const float* lo, const float* hi, int n, int max_leaf,
                  int* perm_out, float* child_lo, float* child_hi, int* child,
                  int cap_nodes) {
  if (n <= 0 || max_leaf < 1 || max_leaf > kMaxLeaf) return -2;

  // centroid bounds
  float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
  std::vector<float> cx(n), cy(n), cz(n);
  for (int i = 0; i < n; ++i) {
    float c[3];
    for (int a = 0; a < 3; ++a) {
      c[a] = 0.5f * (lo[i * 3 + a] + hi[i * 3 + a]);
      cmin[a] = std::min(cmin[a], c[a]);
      cmax[a] = std::max(cmax[a], c[a]);
    }
    cx[i] = c[0];
    cy[i] = c[1];
    cz[i] = c[2];
  }
  float ext[3];
  for (int a = 0; a < 3; ++a)
    ext[a] = std::max(cmax[a] - cmin[a], 1e-12f);

  // morton keys + stable sort (matches np.argsort(kind="stable"))
  std::vector<std::pair<uint32_t, int>> keys(n);
  for (int i = 0; i < n; ++i) {
    uint32_t m = morton3d((cx[i] - cmin[0]) / ext[0], (cy[i] - cmin[1]) / ext[1],
                          (cz[i] - cmin[2]) / ext[2]);
    keys[i] = {m, i};
  }
  std::stable_sort(keys.begin(), keys.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  for (int i = 0; i < n; ++i) perm_out[i] = keys[i].second;

  // distinct 64-bit split keys: (code << 32) | rank (Karras trick, same as
  // the python builder)
  std::vector<uint64_t> k(n);
  for (int i = 0; i < n; ++i)
    k[i] = ((uint64_t)keys[i].first << 32) | (uint64_t)i;

  std::vector<float> lo_s(n * 3), hi_s(n * 3);
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      lo_s[i * 3 + a] = lo[perm_out[i] * 3 + a];
      hi_s[i * 3 + a] = hi[perm_out[i] * 3 + a];
    }

  // binary topology via radix splits
  std::vector<Range> nodes;
  nodes.reserve(2 * n / max_leaf + 8);
  nodes.push_back({0, n});
  std::vector<int> stack = {0};
  while (!stack.empty()) {
    int ni = stack.back();
    stack.pop_back();
    int s = nodes[ni].start, e = nodes[ni].end;
    if (e - s <= max_leaf) continue;
    uint64_t first = k[s], last = k[e - 1];
    int m;
    uint64_t diff = first ^ last;
    if (diff == 0) {
      m = (s + e) / 2;
    } else {
      int top = 63 - __builtin_clzll(diff);
      uint64_t mask = ~((1ULL << top) - 1);
      uint64_t prefix = first & mask;
      int loi = s + 1, hii = e;
      while (loi < hii) {
        int mid = (loi + hii) / 2;
        if ((k[mid] & mask) == prefix)
          loi = mid + 1;
        else
          hii = mid;
      }
      m = (loi == e) ? (s + e) / 2 : loi;
    }
    int l = (int)nodes.size();
    nodes.push_back({s, m});
    int r = (int)nodes.size();
    nodes.push_back({m, e});
    nodes[ni].left = l;
    nodes[ni].right = r;
    stack.push_back(l);
    stack.push_back(r);
  }

  const int nb = (int)nodes.size();
  std::vector<float> nlo(nb * 3), nhi(nb * 3);
  for (int i = nb - 1; i >= 0; --i) {
    if (nodes[i].left < 0) {
      float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
      for (int t = nodes[i].start; t < nodes[i].end; ++t)
        for (int a = 0; a < 3; ++a) {
          mn[a] = std::min(mn[a], lo_s[t * 3 + a]);
          mx[a] = std::max(mx[a], hi_s[t * 3 + a]);
        }
      for (int a = 0; a < 3; ++a) {
        nlo[i * 3 + a] = mn[a];
        nhi[i * 3 + a] = mx[a];
      }
    } else {
      int l = nodes[i].left, r = nodes[i].right;
      for (int a = 0; a < 3; ++a) {
        nlo[i * 3 + a] = std::min(nlo[l * 3 + a], nlo[r * 3 + a]);
        nhi[i * 3 + a] = std::max(nhi[l * 3 + a], nhi[r * 3 + a]);
      }
    }
  }

  auto area = [&](int i) {
    float d[3];
    for (int a = 0; a < 3; ++a)
      d[a] = std::max(nhi[i * 3 + a] - nlo[i * 3 + a], 0.f);
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0];
  };

  // collapse binary -> wide-8 (expand largest-area internal child)
  struct Wide {
    int kids[8];
    int nkids;
  };
  std::vector<Wide> wide;
  std::vector<int> wide_of(nb, -1);

  auto build_wide = [&](int b) {
    Wide w;
    w.nkids = 2;
    w.kids[0] = nodes[b].left;
    w.kids[1] = nodes[b].right;
    while (w.nkids < 8) {
      int best_j = -1;
      float best_a = -1.f;
      for (int j = 0; j < w.nkids; ++j) {
        int kd = w.kids[j];
        if (nodes[kd].left >= 0) {
          float a = area(kd);
          if (a > best_a) {
            best_a = a;
            best_j = j;
          }
        }
      }
      if (best_j < 0) break;
      int kd = w.kids[best_j];
      w.kids[best_j] = w.kids[--w.nkids];  // swap-remove
      w.kids[w.nkids++] = nodes[kd].left;
      w.kids[w.nkids++] = nodes[kd].right;
    }
    wide.push_back(w);
    return (int)wide.size() - 1;
  };

  if (nodes[0].left < 0) {
    Wide w;
    w.nkids = 1;
    w.kids[0] = 0;
    wide.push_back(w);
  } else {
    std::vector<int> order = {build_wide(0)};
    for (size_t qi = 0; qi < order.size(); ++qi) {
      Wide w = wide[order[qi]];  // copy: wide may reallocate
      for (int j = 0; j < w.nkids; ++j) {
        int kd = w.kids[j];
        if (nodes[kd].left >= 0) {
          wide_of[kd] = build_wide(kd);
          order.push_back(wide_of[kd]);
        }
      }
    }
  }

  const int nw = (int)wide.size();
  if (nw > cap_nodes) return -1;
  std::memset(child_lo, 0, (size_t)nw * 24 * sizeof(float));
  std::memset(child_hi, 0, (size_t)nw * 24 * sizeof(float));
  for (int w = 0; w < nw; ++w)
    for (int j = 0; j < 8; ++j) child[w * 8 + j] = kEncEmpty;

  for (int w = 0; w < nw; ++w) {
    for (int j = 0; j < wide[w].nkids; ++j) {
      int kd = wide[w].kids[j];
      for (int a = 0; a < 3; ++a) {
        child_lo[(w * 8 + j) * 3 + a] = nlo[kd * 3 + a];
        child_hi[(w * 8 + j) * 3 + a] = nhi[kd * 3 + a];
      }
      if (nodes[kd].left >= 0) {
        child[w * 8 + j] = wide_of[kd];
      } else {
        int s = nodes[kd].start, c = nodes[kd].end - nodes[kd].start;
        child[w * 8 + j] = -(2 + (s << kLeafBits) + c);
      }
    }
  }
  return nw;
}

}  // extern "C"
