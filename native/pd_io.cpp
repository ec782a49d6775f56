// pd_io — native host-IO tier for the TPU pipeline.
//
// The reference delegates volume IO to nibabel + scipy.ndimage (C inside
// wheels); this library is the rebuild's bespoke equivalent: a NIfTI-1
// reader (plain or gzip via zlib) and a thread-parallel align-corners
// trilinear resampler, both exposed through a plain C ABI consumed with
// ctypes (no pybind11 in this image). All entry points are GIL-free from
// Python's perspective (ctypes releases the GIL), so the prefetch pool
// in pd_fusion.imaging.pipeline gets true parallel decode.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC pd_io.cpp -lz)
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <thread>
#include <algorithm>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// file reading (plain or gzip)
// ---------------------------------------------------------------------------

bool read_file_maybe_gz(const char* path, std::vector<uint8_t>& out) {
  // gzFile transparently reads both gzip and uncompressed files.
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  constexpr size_t kChunk = 1 << 20;
  std::vector<uint8_t> buf(kChunk);
  out.clear();
  int n;
  while ((n = gzread(f, buf.data(), kChunk)) > 0) {
    out.insert(out.end(), buf.begin(), buf.begin() + n);
  }
  bool ok = (n == 0);
  gzclose(f);
  return ok;
}

template <typename T>
void convert_to_f32(const uint8_t* src, int64_t count, bool swap, float* dst) {
  const T* p = reinterpret_cast<const T*>(src);
  for (int64_t i = 0; i < count; ++i) {
    T v = p[i];
    if (swap) {
      T t = v;
      uint8_t* b = reinterpret_cast<uint8_t*>(&t);
      std::reverse(b, b + sizeof(T));
      v = t;
    }
    float f = static_cast<float>(v);
    dst[i] = std::isfinite(f) ? f : 0.0f;
  }
}

inline int16_t rd_i16(const uint8_t* p, bool swap) {
  int16_t v;
  std::memcpy(&v, p, 2);
  if (swap) {
    uint8_t* b = reinterpret_cast<uint8_t*>(&v);
    std::swap(b[0], b[1]);
  }
  return v;
}

inline float rd_f32(const uint8_t* p, bool swap) {
  float v;
  std::memcpy(&v, p, 4);
  if (swap) {
    uint8_t* b = reinterpret_cast<uint8_t*>(&v);
    std::swap(b[0], b[3]);
    std::swap(b[1], b[2]);
  }
  return v;
}

inline int32_t rd_i32(const uint8_t* p, bool swap) {
  int32_t v;
  std::memcpy(&v, p, 4);
  if (swap) {
    uint8_t* b = reinterpret_cast<uint8_t*>(&v);
    std::swap(b[0], b[3]);
    std::swap(b[1], b[2]);
  }
  return v;
}

}  // namespace

extern "C" {

// Returns 0 on success. On success fills dims[0..2] and, if out != null,
// writes the float32 voxel data (Fortran/x-fastest order, scaled,
// NaN/Inf -> 0). Call once with out == null to get dims, then again with
// a buffer of product(dims) floats.
int pd_read_nifti(const char* path, int64_t* dims, float* out) {
  std::vector<uint8_t> raw;
  if (!read_file_maybe_gz(path, raw)) return 1;
  if (raw.size() < 352) return 2;
  const uint8_t* h = raw.data();

  bool swap = false;
  int32_t sizeof_hdr = rd_i32(h, false);
  if (sizeof_hdr != 348) {
    if (rd_i32(h, true) == 348) {
      swap = true;
    } else {
      return 3;  // not NIfTI-1
    }
  }
  if (!(std::memcmp(h + 344, "n+1", 3) == 0 || std::memcmp(h + 344, "ni1", 3) == 0)) {
    return 4;
  }

  int16_t ndim = rd_i16(h + 40, swap);
  if (ndim < 1 || ndim > 7) return 5;
  int64_t shape[7] = {1, 1, 1, 1, 1, 1, 1};
  int64_t count = 1;
  for (int i = 0; i < ndim; ++i) {
    shape[i] = rd_i16(h + 42 + 2 * i, swap);
    if (shape[i] <= 0) shape[i] = 1;
    count *= shape[i];
  }
  for (int i = 0; i < 3; ++i) dims[i] = (i < ndim) ? shape[i] : 1;
  if (ndim > 3) {
    // collapse trailing singleton dims; reject true 4-D+ volumes
    for (int i = 3; i < ndim; ++i) {
      if (shape[i] != 1) return 6;
    }
  }
  if (out == nullptr) return 0;

  int16_t datatype = rd_i16(h + 70, swap);
  float vox_offset = rd_f32(h + 108, swap);
  float scl_slope = rd_f32(h + 112, swap);
  float scl_inter = rd_f32(h + 116, swap);

  size_t offset = static_cast<size_t>(vox_offset);
  if (offset < 352) offset = 352;

  size_t elem = 0;
  switch (datatype) {
    case 2: elem = 1; break;    // uint8
    case 4: elem = 2; break;    // int16
    case 8: elem = 4; break;    // int32
    case 16: elem = 4; break;   // float32
    case 64: elem = 8; break;   // float64
    case 256: elem = 1; break;  // int8
    case 512: elem = 2; break;  // uint16
    case 768: elem = 4; break;  // uint32
    default: return 7;
  }
  if (raw.size() < offset + count * elem) return 8;
  const uint8_t* data = raw.data() + offset;

  switch (datatype) {
    case 2: convert_to_f32<uint8_t>(data, count, false, out); break;
    case 4: convert_to_f32<int16_t>(data, count, swap, out); break;
    case 8: convert_to_f32<int32_t>(data, count, swap, out); break;
    case 16: convert_to_f32<float>(data, count, swap, out); break;
    case 64: convert_to_f32<double>(data, count, swap, out); break;
    case 256: convert_to_f32<int8_t>(data, count, false, out); break;
    case 512: convert_to_f32<uint16_t>(data, count, swap, out); break;
    case 768: convert_to_f32<uint32_t>(data, count, swap, out); break;
  }

  bool has_slope = std::isfinite(scl_slope) && scl_slope != 0.0f && scl_slope != 1.0f;
  bool has_inter = std::isfinite(scl_inter) && scl_inter != 0.0f;
  if (has_slope) {
    float inter = has_inter ? scl_inter : 0.0f;
    for (int64_t i = 0; i < count; ++i) out[i] = out[i] * scl_slope + inter;
  } else if (has_inter && scl_slope == 1.0f) {
    for (int64_t i = 0; i < count; ++i) out[i] += scl_inter;
  }
  return 0;
}

// Align-corners trilinear resize (matches scipy.ndimage.zoom order=1 /
// pd_fusion.ops.image.resize3d). in/out are C-ORDER [d0, d1, d2] float32.
// Parallel over the leading output axis.
void pd_resize3d(const float* in, int64_t i0, int64_t i1, int64_t i2,
                 float* out, int64_t o0, int64_t o1, int64_t o2,
                 int n_threads) {
  auto axis_coords = [](int64_t in_len, int64_t out_len, std::vector<int64_t>& lo,
                        std::vector<float>& t) {
    lo.resize(out_len);
    t.resize(out_len);
    for (int64_t j = 0; j < out_len; ++j) {
      if (in_len == 1 || out_len == 1) {
        float pos = (out_len == 1) ? 0.0f
                                   : static_cast<float>(j) * (in_len - 1) / (out_len - 1);
        int64_t l = static_cast<int64_t>(pos);
        if (l > in_len - 2) l = std::max<int64_t>(in_len - 2, 0);
        lo[j] = l;
        t[j] = (in_len == 1) ? 0.0f : pos - l;
      } else {
        float pos = static_cast<float>(j) * (in_len - 1) / (out_len - 1);
        int64_t l = static_cast<int64_t>(pos);
        if (l > in_len - 2) l = in_len - 2;
        lo[j] = l;
        t[j] = pos - l;
      }
    }
  };

  std::vector<int64_t> l0, l1, l2;
  std::vector<float> t0, t1, t2;
  axis_coords(i0, o0, l0, t0);
  axis_coords(i1, o1, l1, t1);
  axis_coords(i2, o2, l2, t2);

  const int64_t in_s0 = i1 * i2, in_s1 = i2;
  const int64_t out_s0 = o1 * o2, out_s1 = o2;

  auto work = [&](int64_t z_begin, int64_t z_end) {
    for (int64_t a = z_begin; a < z_end; ++a) {
      const int64_t a0 = l0[a];
      const float ta = t0[a];
      const int64_t a1 = (i0 > 1) ? a0 + 1 : a0;
      for (int64_t b = 0; b < o1; ++b) {
        const int64_t b0 = l1[b];
        const float tb = t1[b];
        const int64_t b1 = (i1 > 1) ? b0 + 1 : b0;
        float* dst = out + a * out_s0 + b * out_s1;
        const float* p00 = in + a0 * in_s0 + b0 * in_s1;
        const float* p01 = in + a0 * in_s0 + b1 * in_s1;
        const float* p10 = in + a1 * in_s0 + b0 * in_s1;
        const float* p11 = in + a1 * in_s0 + b1 * in_s1;
        for (int64_t c = 0; c < o2; ++c) {
          const int64_t c0 = l2[c];
          const float tc = t2[c];
          const int64_t c1 = (i2 > 1) ? c0 + 1 : c0;
          const float v00 = p00[c0] * (1 - tc) + p00[c1] * tc;
          const float v01 = p01[c0] * (1 - tc) + p01[c1] * tc;
          const float v10 = p10[c0] * (1 - tc) + p10[c1] * tc;
          const float v11 = p11[c0] * (1 - tc) + p11[c1] * tc;
          const float v0 = v00 * (1 - tb) + v01 * tb;
          const float v1 = v10 * (1 - tb) + v11 * tb;
          dst[c] = v0 * (1 - ta) + v1 * ta;
        }
      }
    }
  };

  int nt = n_threads > 0 ? n_threads : 1;
  nt = std::min<int64_t>(nt, o0);
  if (nt <= 1) {
    work(0, o0);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (o0 + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min<int64_t>(begin + chunk, o0);
    if (begin >= end) break;
    threads.emplace_back(work, begin, end);
  }
  for (auto& th : threads) th.join();
}

// Convenience: read + resize in one call (the embed path's host stage).
// target dims given by (t0,t1,t2); out buffer must hold t0*t1*t2 floats.
// NOTE: NIfTI data is Fortran-ordered; the caller treats the array as
// C-order [i2, i1, i0] and resizes in that layout, which is equivalent.
int pd_read_resize_nifti(const char* path, int64_t t0, int64_t t1, int64_t t2,
                         float* out, int n_threads) {
  int64_t dims[3];
  if (int rc = pd_read_nifti(path, dims, nullptr)) return rc;
  std::vector<float> vol(static_cast<size_t>(dims[0]) * dims[1] * dims[2]);
  if (int rc = pd_read_nifti(path, dims, vol.data())) return rc;
  // Fortran [x,y,z] buffer == C-order [z,y,x]; resize with reversed dims.
  pd_resize3d(vol.data(), dims[2], dims[1], dims[0], out, t2, t1, t0, n_threads);
  return 0;
}

}  // extern "C"
