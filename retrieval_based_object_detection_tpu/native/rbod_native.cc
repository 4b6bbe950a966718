// Native host-side runtime for the vector gallery.
//
// The reference delegated its native needs to the external Qdrant server
// (a Rust binary consumed via Docker, 02_qdrant_environment_setting.txt:1-8).
// Here the two host-side hot paths are implemented in C++ and exposed via
// ctypes:
//
//   1. filter_mask  — one-pass conjunctive filter evaluation over columnar
//      payloads (int32 dictionary codes + bool flags). NumPy evaluates K
//      predicates as K vector passes with K temporaries; this fuses them
//      into a single cache-friendly sweep.
//   2. snapshot write/read — flat binary gallery snapshots (header +
//      float32 vector blob) replacing zlib-compressed npz, which is far
//      too slow for multi-GB galleries.
//
// Build: g++ -O3 -march=native -shared -fPIC rbod_native.cc -o librbod_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Conjunction of equality predicates over n rows.
//   int_cols:  n_int pointers to int32 columns; int_vals: expected codes.
//   bool_cols: n_bool pointers to uint8 columns; bool_vals: expected 0/1.
// out: uint8 mask of length n (1 = row matches all predicates).
void filter_mask(
    const int32_t** int_cols, const int32_t* int_vals, int n_int,
    const uint8_t** bool_cols, const uint8_t* bool_vals, int n_bool,
    int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t ok = 1;
    for (int c = 0; c < n_int; ++c) {
      ok &= (uint8_t)(int_cols[c][i] == int_vals[c]);
    }
    for (int c = 0; c < n_bool; ++c) {
      ok &= (uint8_t)(bool_cols[c][i] == bool_vals[c]);
    }
    out[i] = ok;
  }
}

// Count matching rows without materialising a mask.
int64_t filter_count(
    const int32_t** int_cols, const int32_t* int_vals, int n_int,
    const uint8_t** bool_cols, const uint8_t* bool_vals, int n_bool,
    int64_t n) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t ok = 1;
    for (int c = 0; c < n_int; ++c) {
      ok &= (uint8_t)(int_cols[c][i] == int_vals[c]);
    }
    for (int c = 0; c < n_bool; ++c) {
      ok &= (uint8_t)(bool_cols[c][i] == bool_vals[c]);
    }
    total += ok;
  }
  return total;
}

// ---- snapshot format ------------------------------------------------
// [magic "RBOD" (4)] [version u32] [rows u64] [dim u64] [payload_bytes u64]
// [payload blob] [float32 vectors rows*dim]

static const uint32_t kMagic = 0x444F4252;  // "RBOD" little-endian
static const uint32_t kVersion = 1;

// Returns 0 on success.
int snapshot_write(const char* path, const float* vectors, int64_t rows,
                   int64_t dim, const uint8_t* payload_blob,
                   int64_t payload_bytes) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  uint64_t r = (uint64_t)rows, d = (uint64_t)dim, pb = (uint64_t)payload_bytes;
  int ok = 1;
  ok &= fwrite(&kMagic, 4, 1, f) == 1;
  ok &= fwrite(&kVersion, 4, 1, f) == 1;
  ok &= fwrite(&r, 8, 1, f) == 1;
  ok &= fwrite(&d, 8, 1, f) == 1;
  ok &= fwrite(&pb, 8, 1, f) == 1;
  if (payload_bytes > 0) {
    ok &= fwrite(payload_blob, 1, (size_t)payload_bytes, f) ==
          (size_t)payload_bytes;
  }
  size_t nf = (size_t)rows * (size_t)dim;
  if (nf > 0) ok &= fwrite(vectors, sizeof(float), nf, f) == nf;
  ok &= fclose(f) == 0;
  return ok ? 0 : 2;
}

// Reads the header. Returns 0 on success.
int snapshot_header(const char* path, int64_t* rows, int64_t* dim,
                    int64_t* payload_bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint32_t magic = 0, version = 0;
  uint64_t r = 0, d = 0, pb = 0;
  int ok = 1;
  ok &= fread(&magic, 4, 1, f) == 1;
  ok &= fread(&version, 4, 1, f) == 1;
  ok &= fread(&r, 8, 1, f) == 1;
  ok &= fread(&d, 8, 1, f) == 1;
  ok &= fread(&pb, 8, 1, f) == 1;
  fclose(f);
  if (!ok || magic != kMagic || version != kVersion) return 2;
  *rows = (int64_t)r;
  *dim = (int64_t)d;
  *payload_bytes = (int64_t)pb;
  return 0;
}

// Reads blobs into caller-allocated buffers (sizes from snapshot_header).
int snapshot_read(const char* path, float* vectors, int64_t rows,
                  int64_t dim, uint8_t* payload_blob,
                  int64_t payload_bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  if (fseek(f, 4 + 4 + 8 + 8 + 8, SEEK_SET) != 0) {
    fclose(f);
    return 2;
  }
  int ok = 1;
  if (payload_bytes > 0) {
    ok &= fread(payload_blob, 1, (size_t)payload_bytes, f) ==
          (size_t)payload_bytes;
  }
  size_t nf = (size_t)rows * (size_t)dim;
  if (nf > 0) ok &= fread(vectors, sizeof(float), nf, f) == nf;
  fclose(f);
  return ok ? 0 : 3;
}

}  // extern "C"
