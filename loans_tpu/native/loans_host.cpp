// loans_host: native host-side runtime ops for loans_tpu.
//
// The reference delegates its host hot loops to C-backed libraries
// (PIL/OpenCV image ops, chainercv NMS) and a shared-memory thread
// iterator (schaaaafrichter/iterators/thread_iterator.py). This library
// is the TPU build's native runtime: the ops that sit on the host side
// of the input pipeline and post-processing, compiled -O3 and exposed
// through a plain C ABI for ctypes (no pybind11 in the image).
//
// All images are HWC uint8 or float32, boxes are (y1, x1, y2, x2).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy NMS over yxyx boxes, visiting in the given order (caller sorts
// by score). Returns number of kept indices written to `keep`.
int loans_nms(const float* boxes, const int* order, int n, float thresh,
              int* keep) {
  std::vector<float> area(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    area[i] = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
  }
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    const float* bi = boxes + 4 * i;
    bool ok = true;
    for (int kj = 0; kj < n_keep; ++kj) {
      int j = keep[kj];
      const float* bj = boxes + 4 * j;
      float yy1 = std::max(bi[0], bj[0]);
      float xx1 = std::max(bi[1], bj[1]);
      float yy2 = std::min(bi[2], bj[2]);
      float xx2 = std::min(bi[3], bj[3]);
      float ih = yy2 - yy1, iw = xx2 - xx1;
      if (ih <= 0.f || iw <= 0.f) continue;
      float inter = ih * iw;
      float uni = area[i] + area[j] - inter;
      if (uni > 0.f && inter / uni > thresh) {
        ok = false;
        break;
      }
    }
    if (ok) keep[n_keep++] = i;
  }
  return n_keep;
}

// ---------------------------------------------------------------------------
// Bilinear resize uint8 HWC -> uint8 HWC (align-corners=false, the
// cv2.INTER_LINEAR convention).
void loans_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                              uint8_t* dst, int dh, int dw) {
  const float sy = (float)sh / dh, sx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(y0 + 1, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(x0 + 1, sw - 1);
      const uint8_t* p00 = src + (y0c * sw + x0c) * c;
      const uint8_t* p01 = src + (y0c * sw + x1c) * c;
      const uint8_t* p10 = src + (y1c * sw + x0c) * c;
      const uint8_t* p11 = src + (y1c * sw + x1c) * c;
      uint8_t* out = dst + (y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[k] = (uint8_t)std::min(std::max(v + 0.5f, 0.f), 255.f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Alpha-composite an RGBA stamp onto an RGB canvas at (top, left),
// clipping to the canvas.
void loans_composite_rgba(uint8_t* canvas, int ch, int cw,
                          const uint8_t* stamp, int sh, int sw, int top,
                          int left) {
  for (int y = 0; y < sh; ++y) {
    int cy = top + y;
    if (cy < 0 || cy >= ch) continue;
    for (int x = 0; x < sw; ++x) {
      int cx = left + x;
      if (cx < 0 || cx >= cw) continue;
      const uint8_t* s = stamp + (y * sw + x) * 4;
      uint8_t* d = canvas + (cy * cw + cx) * 3;
      float a = s[3] / 255.f;
      for (int k = 0; k < 3; ++k)
        d[k] = (uint8_t)(s[k] * a + d[k] * (1.f - a) + 0.5f);
    }
  }
}

// ---------------------------------------------------------------------------
// uint8 HWC -> float32 HWC / 255 (batch packing hot path).
void loans_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  static float lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) lut[i] = i / 255.f;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

static inline float iou_yxyx(const float* a, const float* b) {
  float yy1 = std::max(a[0], b[0]), xx1 = std::max(a[1], b[1]);
  float yy2 = std::min(a[2], b[2]), xx2 = std::min(a[3], b[3]);
  float ih = yy2 - yy1, iw = xx2 - xx1;
  if (ih <= 0.f || iw <= 0.f) return 0.f;
  float inter = ih * iw;
  float aa = std::max(0.f, a[2] - a[0]) * std::max(0.f, a[3] - a[1]);
  float ab = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
  float uni = aa + ab - inter;
  return uni > 0.f ? inter / uni : 0.f;
}

// ---------------------------------------------------------------------------
// IoU-targeted crop search (paste_and_crop_sheep.py:45-81 semantics):
// rejection-sample a (ch x cw) crop whose IoU with `paste` lands in
// [target-tol, target+tol]. Returns 1 + writes (y, x) on success.
int loans_iou_crop_search(const float* paste, float target, float tol,
                          int img_h, int img_w, int crop_h, int crop_w,
                          int max_trials, uint64_t seed, int* out_yx) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> dy(0, std::max(img_h - crop_h, 0));
  std::uniform_int_distribution<int> dx(0, std::max(img_w - crop_w, 0));
  for (int t = 0; t < max_trials; ++t) {
    int y = dy(rng), x = dx(rng);
    float crop[4] = {(float)y, (float)x, (float)(y + crop_h),
                     (float)(x + crop_w)};
    float v = iou_yxyx(crop, paste);
    if (std::fabs(v - target) <= tol) {
      out_yx[0] = y;
      out_yx[1] = x;
      return 1;
    }
  }
  return 0;
}

}  // extern "C"
