// waldo_native — C++ data-path kernels for the host-side loader.
//
// TPU-native counterpart of the reference's native layer: where the reference
// vendors CUDA ops for its GPU hot path, our device hot path is Pallas/XLA
// and the host hot path is the data pipeline — per-frame layout one-hot
// expansion, flow normalization, and bilinear resizing at up to 512x1024x20
// channels. These run outside the GIL (ctypes releases it), so the loader's
// thread pool gets real parallelism.
//
// Build: scripts/build_native.sh  (g++ -O3 -shared -fPIC)
// Python binding: waldo_tpu/data/native.py (ctypes, numpy arrays).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// Bilinear resize, half-pixel centers, edge clamp (torch antialias=False).
inline void resize_bilinear_f32(const float* src, int sh, int sw, int c,
                                float* dst, int dh, int dw) {
  const float hs = static_cast<float>(sh) / dh;
  const float ws = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * hs - 0.5f;
    int y0 = std::clamp(static_cast<int>(std::floor(fy)), 0, sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float ty = std::clamp(fy - std::floor(fy), 0.0f, 1.0f);
    if (fy < 0) { ty = 0.0f; }
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * ws - 0.5f;
      int x0 = std::clamp(static_cast<int>(std::floor(fx)), 0, sw - 1);
      int x1 = std::min(x0 + 1, sw - 1);
      float tx = std::clamp(fx - std::floor(fx), 0.0f, 1.0f);
      if (fx < 0) { tx = 0.0f; }
      const float* p00 = src + (y0 * sw + x0) * c;
      const float* p01 = src + (y0 * sw + x1) * c;
      const float* p10 = src + (y1 * sw + x0) * c;
      const float* p11 = src + (y1 * sw + x1) * c;
      float* out = dst + (y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - tx) + p01[k] * tx;
        float bot = p10[k] * (1 - tx) + p11[k] * tx;
        out[k] = top * (1 - ty) + bot * ty;
      }
    }
  }
}

}  // namespace

extern "C" {

// Layout pipeline (reference data/base_dataset.py:173-183):
// remap class ids, one-hot to num_lyt channels, crop, bilinear resize,
// scale to 5*(2x-1). lyt: (H, W) int32; out: (out_h, out_w, num_lyt) f32.
void layout_onehot_resize(const int32_t* lyt, int h, int w, int num_lyt,
                          const int32_t* remap, int n_remap,
                          int top, int left, int ch, int cw,
                          int out_h, int out_w, int flip_x, int flip_y,
                          float* out) {
  // one-hot the cropped window at source resolution
  float* hot = new float[ch * cw * num_lyt]();
  for (int y = 0; y < ch; ++y) {
    for (int x = 0; x < cw; ++x) {
      int v = lyt[(top + y) * w + (left + x)];
      for (int r = 0; r < n_remap; ++r) {
        if (v == remap[2 * r]) { v = remap[2 * r + 1]; break; }
      }
      if (v >= 0 && v < num_lyt) hot[(y * cw + x) * num_lyt + v] = 1.0f;
    }
  }
  resize_bilinear_f32(hot, ch, cw, num_lyt, out, out_h, out_w);
  delete[] hot;
  // flips + 5*(2x-1)
  const int n = out_h * out_w * num_lyt;
  if (flip_x) {
    for (int y = 0; y < out_h; ++y)
      for (int x = 0; x < out_w / 2; ++x)
        for (int k = 0; k < num_lyt; ++k)
          std::swap(out[(y * out_w + x) * num_lyt + k],
                    out[(y * out_w + (out_w - 1 - x)) * num_lyt + k]);
  }
  if (flip_y) {
    for (int y = 0; y < out_h / 2; ++y)
      for (int x = 0; x < out_w; ++x)
        for (int k = 0; k < num_lyt; ++k)
          std::swap(out[(y * out_w + x) * num_lyt + k],
                    out[((out_h - 1 - y) * out_w + x) * num_lyt + k]);
  }
  for (int i = 0; i < n; ++i) out[i] = 5.0f * (out[i] * 2.0f - 1.0f);
}

// Flow pipeline (reference data/base_dataset.py:185-208): zoom, flip signs,
// normalize 2*px/size, crop in flow-file pixel space, bilinear resize.
// flow: (H, W, 2) f32; out: (out_h, out_w, 2) f32.
void flow_normalize_resize(const float* flow, int h, int w,
                           float zoom, int flip_x, int flip_y,
                           int top, int left, int ch, int cw,
                           int out_h, int out_w, float* out) {
  float* tmp = new float[ch * cw * 2];
  for (int y = 0; y < ch; ++y) {
    for (int x = 0; x < cw; ++x) {
      float fx = flow[((top + y) * w + (left + x)) * 2 + 0] * zoom;
      float fy = flow[((top + y) * w + (left + x)) * 2 + 1] * zoom;
      if (flip_x) fx = -fx;
      if (flip_y) fy = -fy;
      tmp[(y * cw + x) * 2 + 0] = 2.0f * fx / w;
      tmp[(y * cw + x) * 2 + 1] = 2.0f * fy / h;
    }
  }
  resize_bilinear_f32(tmp, ch, cw, 2, out, out_h, out_w);
  delete[] tmp;
  if (flip_x) {
    for (int y = 0; y < out_h; ++y)
      for (int x = 0; x < out_w / 2; ++x)
        for (int k = 0; k < 2; ++k)
          std::swap(out[(y * out_w + x) * 2 + k],
                    out[(y * out_w + (out_w - 1 - x)) * 2 + k]);
  }
  if (flip_y) {
    for (int y = 0; y < out_h / 2; ++y)
      for (int x = 0; x < out_w; ++x)
        for (int k = 0; k < 2; ++k)
          std::swap(out[(y * out_w + x) * 2 + k],
                    out[((out_h - 1 - y) * out_w + x) * 2 + k]);
  }
}

// RGB pipeline (reference base_dataset.py:167-171 + get_transform): uint8
// HWC in, crop, resize, flips, [0,255] -> [-1,1].
void rgb_transform(const uint8_t* img, int h, int w,
                   int top, int left, int ch, int cw,
                   int out_h, int out_w, int flip_x, int flip_y,
                   float* out) {
  float* tmp = new float[ch * cw * 3];
  for (int y = 0; y < ch; ++y)
    for (int x = 0; x < cw; ++x)
      for (int k = 0; k < 3; ++k)
        tmp[(y * cw + x) * 3 + k] =
            img[((top + y) * w + (left + x)) * 3 + k] / 255.0f;
  resize_bilinear_f32(tmp, ch, cw, 3, out, out_h, out_w);
  delete[] tmp;
  if (flip_x) {
    for (int y = 0; y < out_h; ++y)
      for (int x = 0; x < out_w / 2; ++x)
        for (int k = 0; k < 3; ++k)
          std::swap(out[(y * out_w + x) * 3 + k],
                    out[(y * out_w + (out_w - 1 - x)) * 3 + k]);
  }
  if (flip_y) {
    for (int y = 0; y < out_h / 2; ++y)
      for (int x = 0; x < out_w; ++x)
        for (int k = 0; k < 3; ++k)
          std::swap(out[(y * out_w + x) * 3 + k],
                    out[((out_h - 1 - y) * out_w + x) * 3 + k]);
  }
  const int n = out_h * out_w * 3;
  for (int i = 0; i < n; ++i) out[i] = out[i] * 2.0f - 1.0f;
}

}  // extern "C"
