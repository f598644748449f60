// Native mesh backend for SuRS-TPU: marching tetrahedra, OBJ I/O.
//
// The reference pipeline leans on third-party compiled code for these
// steps (skimage marching cubes, trimesh OBJ handling — SURVEY.md §2);
// this library is the first-party TPU-framework equivalent. Exposed as a
// plain C ABI consumed via ctypes (surs_tpu/recon/native.py).
//
// The marching-tetrahedra algorithm matches surs_tpu/recon/tetra.py:
// each cell splits into 6 tetrahedra around the main diagonal; per-tet
// sign cases emit 0-2 triangles; vertices are interpolated on (global)
// edges and deduplicated via an open-addressing hash on the edge key.
//
// Build: make -C csrc   (produces libsurs_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};

const int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

const int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

// case -> up to 2 triangles of tet-edge ids, -1 terminated rows.
const int kCaseTris[16][2][3] = {
    {{-1, -1, -1}, {-1, -1, -1}},  // 0
    {{0, 1, 2}, {-1, -1, -1}},     // 1
    {{0, 4, 3}, {-1, -1, -1}},     // 2
    {{1, 2, 4}, {1, 4, 3}},        // 3
    {{1, 3, 5}, {-1, -1, -1}},     // 4
    {{0, 3, 5}, {0, 5, 2}},        // 5
    {{0, 1, 5}, {0, 5, 4}},        // 6
    {{2, 4, 5}, {-1, -1, -1}},     // 7
    {{2, 5, 4}, {-1, -1, -1}},     // 8
    {{0, 5, 4}, {0, 1, 5}},        // 9
    {{0, 5, 3}, {0, 2, 5}},        // 10
    {{1, 5, 3}, {-1, -1, -1}},     // 11
    {{1, 4, 2}, {1, 3, 4}},        // 12
    {{0, 3, 4}, {-1, -1, -1}},     // 13
    {{0, 2, 1}, {-1, -1, -1}},     // 14
    {{-1, -1, -1}, {-1, -1, -1}},  // 15
};

struct EdgeMap {
  // open-addressing hash: key = lo * N + hi (fits in 64 bits for grids
  // up to ~2^21 voxels per axis cubed — far beyond practical use).
  // Grows at 70% load: a fixed-capacity table would degrade to O(n)
  // probes near full and spin FOREVER once full (every slot occupied,
  // key absent) — hit in practice by noise-like volumes whose unique
  // edge-crossing count exceeds the initial guess.
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;
  uint64_t mask;
  size_t used;

  explicit EdgeMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, UINT64_MAX);
    vals.assign(cap, -1);
    mask = cap - 1;
    used = 0;
  }

  void grow() {
    std::vector<uint64_t> old_keys(keys.size() * 2, UINT64_MAX);
    std::vector<int64_t> old_vals(vals.size() * 2, -1);
    old_keys.swap(keys);
    old_vals.swap(vals);
    mask = keys.size() - 1;
    for (size_t j = 0; j < old_keys.size(); ++j) {
      if (old_keys[j] == UINT64_MAX) continue;
      uint64_t h = old_keys[j] * 0x9E3779B97F4A7C15ull;
      size_t i = h & mask;
      while (keys[i] != UINT64_MAX) i = (i + 1) & mask;
      keys[i] = old_keys[j];
      vals[i] = old_vals[j];
    }
  }

  int64_t* slot(uint64_t key) {
    if (used * 10 >= keys.size() * 7) grow();
    uint64_t h = key * 0x9E3779B97F4A7C15ull;
    size_t i = h & mask;
    while (keys[i] != UINT64_MAX && keys[i] != key) i = (i + 1) & mask;
    if (keys[i] == UINT64_MAX) ++used;
    keys[i] = key;
    return &vals[i];
  }
};

struct MeshOut {
  std::vector<float> verts;
  std::vector<int64_t> faces;
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller passes the volume [X*Y*Z] (C order) and
// receives malloc'd vertex/face buffers it must free with surs_free().
int surs_marching_tetrahedra(const float* vol, int64_t X, int64_t Y,
                             int64_t Z, float level, float** out_verts,
                             int64_t* out_nverts, int64_t** out_faces,
                             int64_t* out_nfaces) {
  const int64_t YZ = Y * Z;
  MeshOut mesh;
  mesh.verts.reserve(1 << 20);
  mesh.faces.reserve(1 << 20);
  EdgeMap emap(1 << 20);

  auto interp_vertex = [&](int64_t ga, int64_t gb) -> int64_t {
    uint64_t lo = (uint64_t)(ga < gb ? ga : gb);
    uint64_t hi = (uint64_t)(ga < gb ? gb : ga);
    uint64_t key = lo * (uint64_t)(X * YZ) + hi;
    int64_t* v = emap.slot(key);
    if (*v >= 0) return *v;
    double va = vol[ga], vb = vol[gb];
    double denom = vb - va;
    if (std::fabs(denom) < 1e-12) denom = 1e-12;
    double t = (level - va) / denom;
    t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
    double ax = (double)(ga / YZ), ay = (double)((ga / Z) % Y),
           az = (double)(ga % Z);
    double bx = (double)(gb / YZ), by = (double)((gb / Z) % Y),
           bz = (double)(gb % Z);
    int64_t id = (int64_t)(mesh.verts.size() / 3);
    mesh.verts.push_back((float)(ax + t * (bx - ax)));
    mesh.verts.push_back((float)(ay + t * (by - ay)));
    mesh.verts.push_back((float)(az + t * (bz - az)));
    *v = id;
    return id;
  };

  for (int64_t x = 0; x + 1 < X; ++x) {
    for (int64_t y = 0; y + 1 < Y; ++y) {
      const float* base = vol + x * YZ + y * Z;
      for (int64_t z = 0; z + 1 < Z; ++z) {
        float v0 = base[z];
        float vmin = v0, vmax = v0;
        float cv[8];
        cv[0] = v0;
        for (int c = 1; c < 8; ++c) {
          cv[c] = vol[(x + kCorner[c][0]) * YZ + (y + kCorner[c][1]) * Z +
                      (z + kCorner[c][2])];
          vmin = cv[c] < vmin ? cv[c] : vmin;
          vmax = cv[c] > vmax ? cv[c] : vmax;
        }
        if (!(vmin <= level && vmax > level)) continue;

        int64_t gids[8];
        bool inside[8];
        for (int c = 0; c < 8; ++c) {
          gids[c] = (x + kCorner[c][0]) * YZ + (y + kCorner[c][1]) * Z +
                    (z + kCorner[c][2]);
          inside[c] = cv[c] > level;
        }
        for (int t = 0; t < 6; ++t) {
          int cs = 0;
          for (int c = 0; c < 4; ++c)
            if (inside[kTets[t][c]]) cs |= 1 << c;
          for (int s = 0; s < 2; ++s) {
            const int* tri = kCaseTris[cs][s];
            if (tri[0] < 0) continue;
            int64_t ids[3];
            for (int c = 0; c < 3; ++c) {
              int ea = kTetEdges[tri[c]][0], eb = kTetEdges[tri[c]][1];
              ids[c] = interp_vertex(gids[kTets[t][ea]], gids[kTets[t][eb]]);
            }
            if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2])
              continue;
            mesh.faces.push_back(ids[0]);
            mesh.faces.push_back(ids[1]);
            mesh.faces.push_back(ids[2]);
          }
        }
      }
    }
  }

  *out_nverts = (int64_t)(mesh.verts.size() / 3);
  *out_nfaces = (int64_t)(mesh.faces.size() / 3);
  *out_verts = (float*)std::malloc(mesh.verts.size() * sizeof(float));
  *out_faces = (int64_t*)std::malloc(mesh.faces.size() * sizeof(int64_t));
  if ((!*out_verts && !mesh.verts.empty()) ||
      (!*out_faces && !mesh.faces.empty()))
    return 1;
  std::memcpy(*out_verts, mesh.verts.data(),
              mesh.verts.size() * sizeof(float));
  std::memcpy(*out_faces, mesh.faces.data(),
              mesh.faces.size() * sizeof(int64_t));
  return 0;
}

void surs_free(void* p) { std::free(p); }

namespace {

// fast '%.4f' formatter (round-half-away like printf for our value range)
inline char* fmt_fixed4(char* p, double v) {
  if (v < 0) {
    *p++ = '-';
    v = -v;
  }
  long long scaled = (long long)(v * 10000.0 + 0.5);
  long long ip = scaled / 10000;
  int fp = (int)(scaled % 10000);
  char tmp[24];
  int n = 0;
  do {
    tmp[n++] = (char)('0' + ip % 10);
    ip /= 10;
  } while (ip);
  while (n) *p++ = tmp[--n];
  *p++ = '.';
  *p++ = (char)('0' + fp / 1000);
  *p++ = (char)('0' + (fp / 100) % 10);
  *p++ = (char)('0' + (fp / 10) % 10);
  *p++ = (char)('0' + fp % 10);
  return p;
}

inline char* fmt_int(char* p, long long v) {
  char tmp[24];
  int n = 0;
  do {
    tmp[n++] = (char)('0' + v % 10);
    v /= 10;
  } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

}  // namespace

// ASCII OBJ writer byte-compatible with the reference's save_obj_mesh
// (lib/mesh_util.py:53-61): '%.4f' vertices, 'f v0 v2 v1' winding swap.
int surs_write_obj(const char* path, const double* verts, int64_t nverts,
                   const int64_t* faces, int64_t nfaces) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  const size_t CAP = 1 << 22;
  std::vector<char> buf(CAP + 256);
  char* p = buf.data();
  auto flush_if = [&](size_t need) {
    if ((size_t)(p - buf.data()) + need > CAP) {
      std::fwrite(buf.data(), 1, p - buf.data(), f);
      p = buf.data();
    }
  };
  for (int64_t i = 0; i < nverts; ++i) {
    flush_if(96);
    *p++ = 'v';
    *p++ = ' ';
    p = fmt_fixed4(p, verts[3 * i]);
    *p++ = ' ';
    p = fmt_fixed4(p, verts[3 * i + 1]);
    *p++ = ' ';
    p = fmt_fixed4(p, verts[3 * i + 2]);
    *p++ = '\n';
  }
  for (int64_t i = 0; i < nfaces; ++i) {
    flush_if(80);
    *p++ = 'f';
    *p++ = ' ';
    p = fmt_int(p, (long long)(faces[3 * i] + 1));
    *p++ = ' ';
    p = fmt_int(p, (long long)(faces[3 * i + 2] + 1));
    *p++ = ' ';
    p = fmt_int(p, (long long)(faces[3 * i + 1] + 1));
    *p++ = '\n';
  }
  std::fwrite(buf.data(), 1, p - buf.data(), f);
  std::fclose(f);
  return 0;
}

// Minimal OBJ reader (v/f lines, fan triangulation, 1-based or negative
// indices). Two-call protocol: pass null buffers to get counts.
int surs_read_obj(const char* path, float* verts, int64_t* nverts,
                  int64_t* faces, int64_t* nfaces) {
  FILE* f = std::fopen(path, "r");
  if (!f) return 1;
  std::vector<float> vs;
  std::vector<int64_t> fs;
  char line[4096];
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      double a, b, c;
      if (std::sscanf(line + 2, "%lf %lf %lf", &a, &b, &c) == 3) {
        vs.push_back((float)a);
        vs.push_back((float)b);
        vs.push_back((float)c);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      int64_t idx[64];
      int n = 0;
      char* p = line + 2;
      while (*p && n < 64) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\n' || *p == '\r' || !*p) break;
        long long v = std::strtoll(p, &p, 10);
        if (v == 0) break;
        int64_t nv = (int64_t)(vs.size() / 3);
        idx[n++] = v > 0 ? v - 1 : nv + v;
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /vt/vn
      }
      for (int k = 1; k + 1 < n; ++k) {
        fs.push_back(idx[0]);
        fs.push_back(idx[k]);
        fs.push_back(idx[k + 1]);
      }
    }
  }
  std::fclose(f);
  if (verts == nullptr || faces == nullptr) {
    *nverts = (int64_t)(vs.size() / 3);
    *nfaces = (int64_t)(fs.size() / 3);
    return 0;
  }
  if (*nverts < (int64_t)(vs.size() / 3) ||
      *nfaces < (int64_t)(fs.size() / 3))
    return 2;
  std::memcpy(verts, vs.data(), vs.size() * sizeof(float));
  std::memcpy(faces, fs.data(), fs.size() * sizeof(int64_t));
  *nverts = (int64_t)(vs.size() / 3);
  *nfaces = (int64_t)(fs.size() / 3);
  return 0;
}

}  // extern "C"
