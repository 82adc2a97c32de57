// Native host runtime for pathtracer_tpu.
//
// The reference's host side is C++ (vendored OBJ_Loader.hpp for mesh
// ingestion, stb_image_write for PNG output; see SURVEY §2.2). This library
// provides the same two host hot paths natively — a fast OBJ parser and a
// PNG encoder — exposed through a C ABI consumed via ctypes
// (pathtracer_tpu/native/bindings.py). Device compute stays in JAX/XLA.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 ptnative.cpp -o libptnative.so -lz

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct ObjData {
  std::vector<float> verts;    // xyz triples
  std::vector<int32_t> faces;  // triangle index triples (0-based)
};

// Minimal, allocation-light OBJ parse: v and f records, v/vt/vn forms,
// negative indices, polygon fan triangulation (matching
// outsource/OBJ_Loader.hpp behavior for convex polygons).
bool parse_obj(const char* path, ObjData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char line[4096];
  std::vector<long> face_idx;
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      double x = 0, y = 0, z = 0;
      if (std::sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        out->verts.push_back((float)x);
        out->verts.push_back((float)y);
        out->verts.push_back((float)z);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      face_idx.clear();
      const char* p = line + 2;
      long nverts = (long)out->verts.size() / 3;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        char* end = nullptr;
        long idx = std::strtol(p, &end, 10);
        if (end == p) break;
        p = end;
        // skip /vt/vn part of the token
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
        face_idx.push_back(idx > 0 ? idx - 1 : nverts + idx);
      }
      for (size_t k = 1; k + 1 < face_idx.size(); ++k) {
        out->faces.push_back((int32_t)face_idx[0]);
        out->faces.push_back((int32_t)face_idx[k]);
        out->faces.push_back((int32_t)face_idx[k + 1]);
      }
    }
  }
  std::fclose(f);
  return true;
}

void put_be32(std::vector<uint8_t>& buf, uint32_t v) {
  buf.push_back((uint8_t)(v >> 24));
  buf.push_back((uint8_t)(v >> 16));
  buf.push_back((uint8_t)(v >> 8));
  buf.push_back((uint8_t)v);
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put_be32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uLong crc = crc32(0L, out.data() + start, (uInt)(len + 4));
  put_be32(out, (uint32_t)crc);
}

}  // namespace

extern "C" {

// First pass: count vertices and (triangulated) faces.
int pt_obj_counts(const char* path, long* n_verts, long* n_faces) {
  ObjData data;
  if (!parse_obj(path, &data)) return 1;
  *n_verts = (long)(data.verts.size() / 3);
  *n_faces = (long)(data.faces.size() / 3);
  return 0;
}

// Second pass: fill caller-allocated arrays.
int pt_obj_load(const char* path, float* verts, long n_verts, int32_t* faces,
                long n_faces) {
  ObjData data;
  if (!parse_obj(path, &data)) return 1;
  if ((long)(data.verts.size() / 3) != n_verts ||
      (long)(data.faces.size() / 3) != n_faces)
    return 2;
  std::memcpy(verts, data.verts.data(), data.verts.size() * sizeof(float));
  std::memcpy(faces, data.faces.data(), data.faces.size() * sizeof(int32_t));
  return 0;
}

// RGBA8 (h rows of w pixels, top row first) -> PNG file.
int pt_write_png(const char* path, const uint8_t* rgba, int w, int h) {
  // raw scanlines with filter byte 0
  std::vector<uint8_t> raw((size_t)h * (1 + (size_t)w * 4));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + (size_t)y * (1 + (size_t)w * 4);
    row[0] = 0;
    std::memcpy(row + 1, rgba + (size_t)y * w * 4, (size_t)w * 4);
  }
  uLongf comp_cap = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), (uLong)raw.size(), 6) !=
      Z_OK)
    return 1;
  comp.resize(comp_cap);

  std::vector<uint8_t> out;
  const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (uint8_t)(w >> 24); ihdr[1] = (uint8_t)(w >> 16);
  ihdr[2] = (uint8_t)(w >> 8);  ihdr[3] = (uint8_t)w;
  ihdr[4] = (uint8_t)(h >> 24); ihdr[5] = (uint8_t)(h >> 16);
  ihdr[6] = (uint8_t)(h >> 8);  ihdr[7] = (uint8_t)h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, sizeof ihdr);
  put_chunk(out, "IDAT", comp.data(), comp.size());
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  size_t written = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return written == out.size() ? 0 : 1;
}

}  // extern "C"
