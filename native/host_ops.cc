// Native host-side data-pipeline kernels for md_rdm_tpu.
//
// The reference's host pipeline is PIL/scipy per-sample Python
// (dataloaders/*.py); the torch DataLoader hides its cost behind worker
// *processes*.  Here the hot standardization ops (bilinear resize, uint8
// normalization) are C++ called through ctypes - they release the GIL, so
// the threaded DataLoader (md_rdm_tpu/data/base.py) overlaps decode across
// samples without process pools.
//
// Conventions: HWC row-major buffers; resize uses the half-pixel
// (align_corners=False) sampling convention with edge clamping - the same
// convention as the on-device warp (md_rdm_tpu/data/augment.py), so host
// and device standardization agree.
//
// Build: make -C native   (produces libmdrdm_host.so)

#include <algorithm>
#include <cstdint>
#include <cstring>

namespace {

inline float src_coord(int dst, int dst_size, int src_size) {
  const float scale = static_cast<float>(src_size) / dst_size;
  return (dst + 0.5f) * scale - 0.5f;
}

struct Tap {
  int lo;
  int hi;
  float w_hi;
};

inline Tap make_tap(float coord, int size) {
  float c = std::max(0.0f, std::min(coord, static_cast<float>(size - 1)));
  int lo = static_cast<int>(c);
  int hi = std::min(lo + 1, size - 1);
  return Tap{lo, hi, c - lo};
}

}  // namespace

extern "C" {

// uint8 HWC -> float32 HWC resized and scaled by `scale` (e.g. 1/255).
void resize_bilinear_u8_to_f32(const uint8_t* src, int sh, int sw, int ch,
                               float* dst, int dh, int dw, float scale) {
  for (int y = 0; y < dh; ++y) {
    const Tap ty = make_tap(src_coord(y, dh, sh), sh);
    const uint8_t* row_lo = src + static_cast<int64_t>(ty.lo) * sw * ch;
    const uint8_t* row_hi = src + static_cast<int64_t>(ty.hi) * sw * ch;
    float* out_row = dst + static_cast<int64_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      const Tap tx = make_tap(src_coord(x, dw, sw), sw);
      const float w00 = (1 - ty.w_hi) * (1 - tx.w_hi);
      const float w01 = (1 - ty.w_hi) * tx.w_hi;
      const float w10 = ty.w_hi * (1 - tx.w_hi);
      const float w11 = ty.w_hi * tx.w_hi;
      const uint8_t* p00 = row_lo + tx.lo * ch;
      const uint8_t* p01 = row_lo + tx.hi * ch;
      const uint8_t* p10 = row_hi + tx.lo * ch;
      const uint8_t* p11 = row_hi + tx.hi * ch;
      for (int c = 0; c < ch; ++c) {
        out_row[x * ch + c] =
            scale * (w00 * p00[c] + w01 * p01[c] + w10 * p10[c] +
                     w11 * p11[c]);
      }
    }
  }
}

// float32 HW (single channel, e.g. depth) bilinear resize.
void resize_bilinear_f32(const float* src, int sh, int sw, float* dst,
                         int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    const Tap ty = make_tap(src_coord(y, dh, sh), sh);
    const float* row_lo = src + static_cast<int64_t>(ty.lo) * sw;
    const float* row_hi = src + static_cast<int64_t>(ty.hi) * sw;
    float* out_row = dst + static_cast<int64_t>(y) * dw;
    for (int x = 0; x < dw; ++x) {
      const Tap tx = make_tap(src_coord(x, dw, sw), sw);
      const float v_lo = row_lo[tx.lo] * (1 - tx.w_hi) +
                         row_lo[tx.hi] * tx.w_hi;
      const float v_hi = row_hi[tx.lo] * (1 - tx.w_hi) +
                         row_hi[tx.hi] * tx.w_hi;
      out_row[x] = v_lo * (1 - ty.w_hi) + v_hi * ty.w_hi;
    }
  }
}

// Center-crop + uint8->f32 normalize in one pass (no resize).
void center_crop_u8_to_f32(const uint8_t* src, int sh, int sw, int ch,
                           float* dst, int th, int tw, float scale) {
  const int i0 = (sh - th) / 2;
  const int j0 = (sw - tw) / 2;
  for (int y = 0; y < th; ++y) {
    const uint8_t* in_row =
        src + (static_cast<int64_t>(i0 + y) * sw + j0) * ch;
    float* out_row = dst + static_cast<int64_t>(y) * tw * ch;
    for (int k = 0; k < tw * ch; ++k) out_row[k] = scale * in_row[k];
  }
}

}  // extern "C"
