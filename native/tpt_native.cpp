// tpt native runtime pieces: fast OBJ parsing + vertex dedup (the host
// "data loader" tier — the reference uses tinyobjloader in C++,
// /root/reference/src/scene.cpp:330-539; this is a from-scratch parser with
// the same capabilities: v/vn/vt, polygon fan triangulation, negative
// indices, usemtl/mtllib, exact-bits vertex dedup on (pos,uv,nrm) tuples).
//
// C ABI consumed from Python via ctypes (tpt/scene/native.py). Two-phase
// protocol: parse -> query sizes -> copy out -> free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct V3 { float x, y, z; };
struct V2 { float u, v; };

struct Key {
  int32_t p, t, n;
  bool operator==(const Key& o) const { return p == o.p && t == o.t && n == o.n; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = static_cast<size_t>(k.p) * 73856093u;
    h ^= static_cast<size_t>(k.t + 1) * 19349663u;
    h ^= static_cast<size_t>(k.n + 1) * 83492791u;
    return h;
  }
};

struct ObjMesh {
  std::vector<V3> positions;   // deduped vertex attributes
  std::vector<V3> normals;
  std::vector<V2> uvs;
  std::vector<int32_t> indices;     // 3 per triangle
  std::vector<int32_t> mat_ids;     // per triangle, index into mat_names
  std::vector<std::string> mat_names;
  std::vector<std::string> mtl_files;
  std::string error;
};

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

inline int32_t resolve(long idx, size_t count) {
  return idx > 0 ? static_cast<int32_t>(idx - 1)
                 : static_cast<int32_t>(static_cast<long>(count) + idx);
}

}  // namespace

extern "C" {

void* tpt_parse_obj(const char* path) {
  FILE* f = fopen(path, "rb");
  auto* mesh = new ObjMesh();
  if (!f) {
    mesh->error = "cannot open file";
    return mesh;
  }

  std::vector<V3> raw_pos, raw_nrm;
  std::vector<V2> raw_uv;
  std::unordered_map<Key, int32_t, KeyHash> dedup;
  std::unordered_map<std::string, int32_t> mat_lookup;
  int32_t current_mat = -1;

  char line[4096];
  std::vector<int32_t> face_corners;  // deduped vertex ids of current face

  while (fgets(line, sizeof(line), f)) {
    const char* p = skip_ws(line);
    if (p[0] == 'v' && p[1] == ' ') {
      V3 v{};
      sscanf(p + 2, "%f %f %f", &v.x, &v.y, &v.z);
      raw_pos.push_back(v);
    } else if (p[0] == 'v' && p[1] == 'n' && p[2] == ' ') {
      V3 v{};
      sscanf(p + 3, "%f %f %f", &v.x, &v.y, &v.z);
      raw_nrm.push_back(v);
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      V2 v{};
      sscanf(p + 3, "%f %f", &v.u, &v.v);
      raw_uv.push_back(v);
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      face_corners.clear();
      const char* q = p + 1;
      while (true) {
        q = skip_ws(q);
        if (*q == '\0' || *q == '\n' || *q == '\r') break;
        long pi = strtol(q, const_cast<char**>(&q), 10);
        long ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        if (*q == '/') {
          ++q;
          if (*q != '/') {
            ti = strtol(q, const_cast<char**>(&q), 10);
            has_t = true;
          }
          if (*q == '/') {
            ++q;
            ni = strtol(q, const_cast<char**>(&q), 10);
            has_n = true;
          }
        }
        Key key{resolve(pi, raw_pos.size()),
                has_t ? resolve(ti, raw_uv.size()) : -1,
                has_n ? resolve(ni, raw_nrm.size()) : -1};
        auto it = dedup.find(key);
        int32_t vid;
        if (it != dedup.end()) {
          vid = it->second;
        } else {
          vid = static_cast<int32_t>(mesh->positions.size());
          dedup.emplace(key, vid);
          if (key.p < 0 || key.p >= static_cast<int32_t>(raw_pos.size())) {
            mesh->error = "position index out of range";
            fclose(f);
            return mesh;
          }
          mesh->positions.push_back(raw_pos[key.p]);
          mesh->normals.push_back(
              key.n >= 0 && key.n < static_cast<int32_t>(raw_nrm.size())
                  ? raw_nrm[key.n] : V3{0, 0, 0});
          mesh->uvs.push_back(
              key.t >= 0 && key.t < static_cast<int32_t>(raw_uv.size())
                  ? raw_uv[key.t] : V2{0, 0});
        }
        face_corners.push_back(vid);
      }
      for (size_t k = 1; k + 1 < face_corners.size(); ++k) {
        mesh->indices.push_back(face_corners[0]);
        mesh->indices.push_back(face_corners[k]);
        mesh->indices.push_back(face_corners[k + 1]);
        mesh->mat_ids.push_back(current_mat);
      }
    } else if (strncmp(p, "usemtl", 6) == 0) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r' ||
                               name.back() == ' '))
        name.pop_back();
      auto it = mat_lookup.find(name);
      if (it != mat_lookup.end()) {
        current_mat = it->second;
      } else {
        current_mat = static_cast<int32_t>(mesh->mat_names.size());
        mat_lookup.emplace(name, current_mat);
        mesh->mat_names.push_back(name);
      }
    } else if (strncmp(p, "mtllib", 6) == 0) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r' ||
                               name.back() == ' '))
        name.pop_back();
      mesh->mtl_files.push_back(name);
    }
  }
  fclose(f);
  return mesh;
}

const char* tpt_mesh_error(void* h) {
  auto* m = static_cast<ObjMesh*>(h);
  return m->error.empty() ? nullptr : m->error.c_str();
}

void tpt_mesh_counts(void* h, int64_t* n_vertices, int64_t* n_triangles,
                     int32_t* n_materials, int32_t* n_mtl_files) {
  auto* m = static_cast<ObjMesh*>(h);
  *n_vertices = static_cast<int64_t>(m->positions.size());
  *n_triangles = static_cast<int64_t>(m->indices.size() / 3);
  *n_materials = static_cast<int32_t>(m->mat_names.size());
  *n_mtl_files = static_cast<int32_t>(m->mtl_files.size());
}

void tpt_mesh_copy(void* h, float* pos, float* nrm, float* uv,
                   int32_t* indices, int32_t* mat_ids) {
  auto* m = static_cast<ObjMesh*>(h);
  memcpy(pos, m->positions.data(), m->positions.size() * sizeof(V3));
  memcpy(nrm, m->normals.data(), m->normals.size() * sizeof(V3));
  memcpy(uv, m->uvs.data(), m->uvs.size() * sizeof(V2));
  memcpy(indices, m->indices.data(), m->indices.size() * sizeof(int32_t));
  memcpy(mat_ids, m->mat_ids.data(), m->mat_ids.size() * sizeof(int32_t));
}

int32_t tpt_mesh_material_name(void* h, int32_t i, char* buf, int32_t buflen) {
  auto* m = static_cast<ObjMesh*>(h);
  if (i < 0 || i >= static_cast<int32_t>(m->mat_names.size())) return -1;
  snprintf(buf, buflen, "%s", m->mat_names[i].c_str());
  return static_cast<int32_t>(m->mat_names[i].size());
}

int32_t tpt_mesh_mtl_file(void* h, int32_t i, char* buf, int32_t buflen) {
  auto* m = static_cast<ObjMesh*>(h);
  if (i < 0 || i >= static_cast<int32_t>(m->mtl_files.size())) return -1;
  snprintf(buf, buflen, "%s", m->mtl_files[i].c_str());
  return static_cast<int32_t>(m->mtl_files[i].size());
}

void tpt_free_mesh(void* h) { delete static_cast<ObjMesh*>(h); }

// ---------------------------------------------------------------------------
// Radiance .hdr RLE decode (hot loop of envmap loading; the numpy fallback
// decodes scanline-by-scanline in Python)
// ---------------------------------------------------------------------------

int32_t tpt_decode_hdr_rle(const uint8_t* data, int64_t size, int32_t width,
                           int32_t height, uint8_t* rgbe_out) {
  int64_t off = 0;
  for (int32_t y = 0; y < height; ++y) {
    uint8_t* row = rgbe_out + static_cast<int64_t>(y) * width * 4;
    if (off + 4 <= size && data[off] == 2 && data[off + 1] == 2 &&
        ((data[off + 2] << 8) | data[off + 3]) == width) {
      off += 4;
      for (int c = 0; c < 4; ++c) {
        int32_t x = 0;
        while (x < width) {
          if (off >= size) return -1;
          int count = data[off++];
          if (count > 128) {
            count -= 128;
            if (off >= size || x + count > width) return -2;
            uint8_t val = data[off++];
            for (int k = 0; k < count; ++k) row[(x + k) * 4 + c] = val;
          } else {
            if (off + count > size || x + count > width) return -3;
            for (int k = 0; k < count; ++k) row[(x + k) * 4 + c] = data[off++];
          }
          x += count;
        }
      }
    } else {
      if (off + static_cast<int64_t>(width) * 4 > size) return -4;
      memcpy(row, data + off, static_cast<size_t>(width) * 4);
      off += static_cast<int64_t>(width) * 4;
    }
  }
  return 0;
}

}  // extern "C"
