// Native host-side data engine for mvae-tpu.
//
// The reference (oskopek/mvae) delegates its host data path to
// torch.utils.data.DataLoader's C++ workers; this is the TPU-framework
// equivalent: IDX(.gz) corpus decode, epoch permutation, and fused
// gather+normalize batch assembly, exposed through a minimal C ABI consumed
// via ctypes (no pybind11 in this environment). The Python layer falls back
// to pure numpy when the library isn't built — semantics are identical and
// tested against each other.
//
// Build: make -C native    (produces libmvae_host.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// IDX decode (MNIST/Omniglot layout), transparent gzip via zlib's gzFile.
// Returns 0 on success. dims_out must hold up to 4 entries; the pixel
// payload is written as float32 in [0,1] into a malloc'd buffer returned
// through data_out (caller frees with mvae_free).
// ---------------------------------------------------------------------------
int mvae_idx_read_f32(const char* path, float** data_out, int64_t* dims_out,
                      int* ndim_out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return 1;

  unsigned char header[4];
  if (gzread(f, header, 4) != 4) { gzclose(f); return 2; }
  if (header[0] != 0 || header[1] != 0) { gzclose(f); return 3; }
  const int type = header[2];  // 0x08 = uint8 is all we support
  const int ndim = header[3];
  if (type != 0x08 || ndim < 1 || ndim > 4) { gzclose(f); return 4; }

  int64_t total = 1;
  for (int i = 0; i < ndim; ++i) {
    unsigned char dim_be[4];
    if (gzread(f, dim_be, 4) != 4) { gzclose(f); return 5; }
    int64_t d = (int64_t(dim_be[0]) << 24) | (int64_t(dim_be[1]) << 16) |
                (int64_t(dim_be[2]) << 8) | int64_t(dim_be[3]);
    dims_out[i] = d;
    total *= d;
  }
  *ndim_out = ndim;

  unsigned char* raw = static_cast<unsigned char*>(malloc(total));
  if (!raw) { gzclose(f); return 6; }
  int64_t got = 0;
  while (got < total) {
    int chunk = static_cast<int>(
        total - got > (1 << 28) ? (1 << 28) : total - got);
    int r = gzread(f, raw + got, chunk);
    if (r <= 0) { free(raw); gzclose(f); return 7; }
    got += r;
  }
  gzclose(f);

  float* out = static_cast<float*>(malloc(total * sizeof(float)));
  if (!out) { free(raw); return 6; }
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int64_t i = 0; i < total; ++i) out[i] = raw[i] * kInv255;
  free(raw);
  *data_out = out;
  return 0;
}

void mvae_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Deterministic epoch permutation (Fisher-Yates over a seeded mt19937_64).
// ---------------------------------------------------------------------------
void mvae_permutation(uint64_t seed, int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  std::mt19937_64 rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    std::uniform_int_distribution<int64_t> dist(0, i);
    int64_t j = dist(rng);
    int64_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

// ---------------------------------------------------------------------------
// Batch assembly: gather rows of a (n, row_elems) f32 corpus into dst
// following indices[count]. The fused copy keeps the host feed a single
// pass (the reference's DataLoader collate equivalent).
// ---------------------------------------------------------------------------
void mvae_gather_f32(const float* src, int64_t row_elems,
                     const int64_t* indices, int64_t count, float* dst) {
  const size_t row_bytes = static_cast<size_t>(row_elems) * sizeof(float);
  for (int64_t i = 0; i < count; ++i) {
    memcpy(dst + i * row_elems, src + indices[i] * row_elems, row_bytes);
  }
}

}  // extern "C"
