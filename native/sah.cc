// Binned-SAH split ordering — native twin of
// rendertoy3c_tpu/accel/lbvh.py::sah_split_perm (the reference's
// equivalent host step is optixAccelBuild's BVH build, cuda_mesh.h:83-153).
//
// Semantics match the Python implementation EXACTLY (the test suite
// asserts identical permutations): f32 centroid binning with the same
// `(c - cmin) * (nb / ext)` arithmetic, f64 bin costs of f32 half-areas,
// first-minimum argmin ties, stable f32 sorts, and banker's rounding for
// the leaf-multiple snap. Python stays as the fallback when the .so is
// unavailable.

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBins = 32;  // _SAH_BINS
constexpr float kBig = 1e30f;

struct Box3 {
  float lo[3], hi[3];
};

inline double half_area(const float lo[3], const float hi[3]) {
  float d0 = std::max(hi[0] - lo[0], 0.0f);
  float d1 = std::max(hi[1] - lo[1], 0.0f);
  float d2 = std::max(hi[2] - lo[2], 0.0f);
  // match numpy: products/sums of f32 in f32, then promoted per-use
  float a = d0 * d1 + d1 * d2 + d2 * d0;
  return static_cast<double>(a);
}

// Python's int(round(x)): banker's rounding (round-half-to-even).
inline long round_half_even(double x) {
  return static_cast<long>(std::nearbyint(x));  // FE_TONEAREST default
}

struct Node {
  int64_t begin, end;  // range into idx[]
};

}  // namespace

extern "C" int64_t rt_sah_split_perm(
    const float* lo,   // [n, 3]
    const float* hi,   // [n, 3]
    int64_t n,
    int32_t leaf,
    int32_t variable,  // 0 = snapped splits, 1 = variable + -1 padding
    int32_t* out,      // [out_cap] permutation (-1 = padding slot)
    int64_t out_cap) {
  if (n <= 0 || leaf <= 0) return -1;
  std::vector<float> cent(static_cast<size_t>(n) * 3);
  for (int64_t i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c)
      cent[i * 3 + c] = (lo[i * 3 + c] + hi[i * 3 + c]) * 0.5f;

  std::vector<int32_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = static_cast<int32_t>(i);
  std::vector<int32_t> scratch;

  int64_t out_len = 0;
  std::vector<Node> stack;
  stack.push_back({0, n});
  while (!stack.empty()) {
    Node nd = stack.back();
    stack.pop_back();
    int64_t cnt = nd.end - nd.begin;
    if (cnt <= leaf) {
      // emit (idx order within the cluster preserved), pad if variable
      int64_t pad = variable ? (leaf - cnt) : 0;
      if (out_len + cnt + pad > out_cap) return -1;
      std::memcpy(out + out_len, idx.data() + nd.begin,
                  sizeof(int32_t) * cnt);
      out_len += cnt;
      for (int64_t p = 0; p < pad; ++p) out[out_len++] = -1;
      continue;
    }
    // centroid bounds of the node
    float cmin[3], cmax[3];
    for (int c = 0; c < 3; ++c) {
      cmin[c] = kBig;
      cmax[c] = -kBig;
    }
    for (int64_t i = nd.begin; i < nd.end; ++i) {
      const float* cc = &cent[static_cast<size_t>(idx[i]) * 3];
      for (int c = 0; c < 3; ++c) {
        cmin[c] = std::min(cmin[c], cc[c]);
        cmax[c] = std::max(cmax[c], cc[c]);
      }
    }
    float ext[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1], cmax[2] - cmin[2]};

    bool have_best = false;
    double best_cost = 0.0;
    int best_ax = 0;
    int64_t best_half = 0;
    for (int ax = 0; ax < 3; ++ax) {
      if (!(ext[ax] > 0.0f)) continue;
      float scale = static_cast<float>(kBins) / ext[ax];
      Box3 bins[kBins];
      int64_t bcnt[kBins];
      for (int b = 0; b < kBins; ++b) {
        bins[b].lo[0] = bins[b].lo[1] = bins[b].lo[2] = kBig;
        bins[b].hi[0] = bins[b].hi[1] = bins[b].hi[2] = -kBig;
        bcnt[b] = 0;
      }
      for (int64_t i = nd.begin; i < nd.end; ++i) {
        int32_t id = idx[i];
        float cv = (cent[static_cast<size_t>(id) * 3 + ax] - cmin[ax])
                   * scale;
        int b = static_cast<int>(cv);  // trunc, matches astype(int32)
        b = std::min(b, kBins - 1);
        if (b < 0) b = 0;  // f32 round-off guard (numpy would wrap)
        bcnt[b]++;
        for (int c = 0; c < 3; ++c) {
          bins[b].lo[c] = std::min(bins[b].lo[c], lo[id * 3 + c]);
          bins[b].hi[c] = std::max(bins[b].hi[c], hi[id * 3 + c]);
        }
      }
      // prefix/suffix boxes + first-minimum cost scan
      Box3 pre[kBins], suf[kBins];
      pre[0] = bins[0];
      for (int b = 1; b < kBins; ++b) {
        pre[b] = pre[b - 1];
        for (int c = 0; c < 3; ++c) {
          pre[b].lo[c] = std::min(pre[b].lo[c], bins[b].lo[c]);
          pre[b].hi[c] = std::max(pre[b].hi[c], bins[b].hi[c]);
        }
      }
      suf[kBins - 1] = bins[kBins - 1];
      for (int b = kBins - 2; b >= 0; --b) {
        suf[b] = suf[b + 1];
        for (int c = 0; c < 3; ++c) {
          suf[b].lo[c] = std::min(suf[b].lo[c], bins[b].lo[c]);
          suf[b].hi[c] = std::max(suf[b].hi[c], bins[b].hi[c]);
        }
      }
      double axis_best = std::numeric_limits<double>::infinity();
      int64_t axis_nl = -1;
      int64_t nl = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        nl += bcnt[b];
        if (nl <= 0 || nl >= cnt) continue;
        double cost = half_area(pre[b].lo, pre[b].hi) * nl
                      + half_area(suf[b + 1].lo, suf[b + 1].hi) * (cnt - nl);
        if (cost < axis_best) {  // strict <: first minimum wins
          axis_best = cost;
          axis_nl = nl;
        }
      }
      if (axis_nl < 0) continue;
      int64_t half;
      if (variable) {
        half = axis_nl;
      } else {
        half = round_half_even(static_cast<double>(axis_nl)
                               / static_cast<double>(leaf))
               * leaf;
        half = std::min(std::max(half, static_cast<int64_t>(leaf)),
                        ((cnt - 1) / leaf) * leaf);
      }
      if (half > 0 && half < cnt
          && (!have_best || axis_best < best_cost)) {
        have_best = true;
        best_cost = axis_best;
        best_ax = ax;
        best_half = half;
      }
    }
    int64_t half;
    int ax;
    if (!have_best) {
      // degenerate: balanced longest-axis median fallback
      ax = 0;
      for (int c = 1; c < 3; ++c)
        if (ext[c] > ext[ax]) ax = c;
      if (variable) {
        half = cnt / 2;
      } else {
        half = std::min(((cnt + 2 * leaf - 1) / (2 * leaf)) * leaf, cnt - 1);
      }
    } else {
      ax = best_ax;
      half = best_half;
    }
    // stable sort the node's ids by centroid on the chosen axis
    scratch.assign(idx.begin() + nd.begin, idx.begin() + nd.end);
    const float* ca = cent.data() + ax;
    std::stable_sort(scratch.begin(), scratch.end(),
                     [ca](int32_t a, int32_t b) {
                       return ca[static_cast<size_t>(a) * 3]
                              < ca[static_cast<size_t>(b) * 3];
                     });
    std::copy(scratch.begin(), scratch.end(), idx.begin() + nd.begin);
    // push right then left: left pops first == Python's stack order
    // (python appends right, then left, and pops the BACK)
    stack.push_back({nd.begin + half, nd.end});
    stack.push_back({nd.begin, nd.begin + half});
  }
  return out_len;
}
