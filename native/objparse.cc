// Native Wavefront OBJ geometry parser.
//
// C++ replacement for the line-parsing hot path of io/obj.py (the
// reference's loadOBJ uses tinyobjloader, src/mesh.cpp:37-210). The Python
// parser is fine for toy scenes but becomes the scene-load bottleneck on
// multi-MB production meshes; this one streams the file once with no
// per-line Python objects.
//
// Scope: geometry + face topology + per-face material binding. Python keeps
// ownership of the .mtl parsing, per-material mesh splitting, vertex
// dedup/keyframe assembly and texture IO (io/obj.py) — those are
// material-count-sized, not face-count-sized.
//
// Two-pass C ABI for ctypes: rt_obj_parse returns a handle + counts,
// rt_obj_fetch copies into caller-allocated numpy arrays, rt_obj_free frees.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> v;    // [nv*3]
  std::vector<float> vn;   // [nn*3]
  std::vector<float> vt;   // [nt*2]
  // per triangle corner: vertex/texcoord/normal indices (0-based, -1 none)
  std::vector<int32_t> face_idx;  // [nf*9]: v0 t0 n0 v1 t1 n1 v2 t2 n2
  std::vector<int32_t> face_mat;  // [nf] material id per triangle
  std::vector<int32_t> face_shape;  // [nf] shape (o/g) ordinal per triangle
  std::string mat_names;            // material names joined with '\n'
  std::vector<std::string> mats;
  std::unordered_map<std::string, int> mat_ids;
  std::string mtllibs;  // mtllib file names joined with '\n'
};

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

// parse one face corner "v", "v/t", "v//n", "v/t/n"; 1-based or negative
inline const char* parse_corner(const char* p, int nv, int nt, int nn,
                                int32_t out[3]) {
  out[0] = out[1] = out[2] = -1;
  char* end;
  long vi = strtol(p, &end, 10);
  if (end == p) return nullptr;
  out[0] = vi > 0 ? (int)(vi - 1) : (int)(nv + vi);
  p = end;
  if (*p == '/') {
    ++p;
    if (*p != '/') {
      long ti = strtol(p, &end, 10);
      if (end != p) {
        out[1] = ti > 0 ? (int)(ti - 1) : (int)(nt + ti);
        p = end;
      }
    }
    if (*p == '/') {
      ++p;
      long ni = strtol(p, &end, 10);
      if (end != p) {
        out[2] = ni > 0 ? (int)(ni - 1) : (int)(nn + ni);
        p = end;
      }
    }
  }
  return p;
}

}  // namespace

extern "C" {

void* rt_obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* d = new ObjData();
  int cur_mat = -1;
  int cur_shape = 0;
  bool any_shape_line = false;

  char line[8192];
  std::vector<int32_t> corners;  // polygon scratch
  while (fgets(line, sizeof line, f)) {
    const char* p = skip_ws(line);
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      sscanf(p + 2, "%f %f %f", &x, &y, &z);
      d->v.push_back(x);
      d->v.push_back(y);
      d->v.push_back(z);
    } else if (p[0] == 'v' && p[1] == 'n') {
      float x = 0, y = 0, z = 0;
      sscanf(p + 2, "%f %f %f", &x, &y, &z);
      d->vn.push_back(x);
      d->vn.push_back(y);
      d->vn.push_back(z);
    } else if (p[0] == 'v' && p[1] == 't') {
      float u = 0, w = 0;
      sscanf(p + 2, "%f %f", &u, &w);
      d->vt.push_back(u);
      d->vt.push_back(w);
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      corners.clear();
      const char* q = p + 1;
      int nv = (int)(d->v.size() / 3), nt = (int)(d->vt.size() / 2),
          nn = (int)(d->vn.size() / 3);
      while (true) {
        q = skip_ws(q);
        if (*q == 0 || *q == '\n' || *q == '\r' || *q == '#') break;
        int32_t c[3];
        const char* nq = parse_corner(q, nv, nt, nn, c);
        if (!nq) break;
        corners.push_back(c[0]);
        corners.push_back(c[1]);
        corners.push_back(c[2]);
        q = nq;
      }
      int ncorn = (int)(corners.size() / 3);
      for (int t = 2; t < ncorn; ++t) {  // fan triangulation
        for (int j : {0, t - 1, t}) {
          d->face_idx.push_back(corners[j * 3 + 0]);
          d->face_idx.push_back(corners[j * 3 + 1]);
          d->face_idx.push_back(corners[j * 3 + 2]);
        }
        d->face_mat.push_back(cur_mat);
        d->face_shape.push_back(cur_shape);
      }
    } else if (!strncmp(p, "usemtl", 6)) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() &&
             (name.back() == '\n' || name.back() == '\r' || name.back() == ' '))
        name.pop_back();
      auto it = d->mat_ids.find(name);
      if (it == d->mat_ids.end()) {
        cur_mat = (int)d->mats.size();
        d->mat_ids[name] = cur_mat;
        d->mats.push_back(name);
      } else {
        cur_mat = it->second;
      }
    } else if (!strncmp(p, "mtllib", 6)) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() &&
             (name.back() == '\n' || name.back() == '\r' || name.back() == ' '))
        name.pop_back();
      if (!d->mtllibs.empty()) d->mtllibs += '\n';
      d->mtllibs += name;
    } else if ((p[0] == 'o' || p[0] == 'g') &&
               (p[1] == ' ' || p[1] == '\t')) {
      if (any_shape_line) ++cur_shape;
      any_shape_line = true;
    }
  }
  fclose(f);
  for (size_t i = 0; i < d->mats.size(); ++i) {
    if (i) d->mat_names += '\n';
    d->mat_names += d->mats[i];
  }
  return d;
}

void rt_obj_counts(void* handle, int64_t* counts /* [6] */) {
  auto* d = (ObjData*)handle;
  counts[0] = (int64_t)(d->v.size() / 3);
  counts[1] = (int64_t)(d->vn.size() / 3);
  counts[2] = (int64_t)(d->vt.size() / 2);
  counts[3] = (int64_t)d->face_mat.size();
  counts[4] = (int64_t)d->mat_names.size();
  counts[5] = (int64_t)d->mtllibs.size();
}

void rt_obj_fetch(void* handle, float* v, float* vn, float* vt,
                  int32_t* face_idx, int32_t* face_mat, int32_t* face_shape,
                  char* mat_names, char* mtllibs) {
  auto* d = (ObjData*)handle;
  if (!d->v.empty()) memcpy(v, d->v.data(), d->v.size() * 4);
  if (!d->vn.empty()) memcpy(vn, d->vn.data(), d->vn.size() * 4);
  if (!d->vt.empty()) memcpy(vt, d->vt.data(), d->vt.size() * 4);
  if (!d->face_idx.empty())
    memcpy(face_idx, d->face_idx.data(), d->face_idx.size() * 4);
  if (!d->face_mat.empty())
    memcpy(face_mat, d->face_mat.data(), d->face_mat.size() * 4);
  if (!d->face_shape.empty())
    memcpy(face_shape, d->face_shape.data(), d->face_shape.size() * 4);
  if (!d->mat_names.empty())
    memcpy(mat_names, d->mat_names.data(), d->mat_names.size());
  if (!d->mtllibs.empty())
    memcpy(mtllibs, d->mtllibs.data(), d->mtllibs.size());
}

void rt_obj_free(void* handle) { delete (ObjData*)handle; }

}  // extern "C"
