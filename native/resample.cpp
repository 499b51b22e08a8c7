// Native host-side image resampler for the data-loading path.
//
// The reference's data loader is PIL-based Python (data/dataset.py,
// models/util.py PIL2Tensor); in folder inference the host-side decode +
// bicubic resample competes with device compute. This library provides a
// multithreaded separable bicubic (Keys a=-0.5, PIL-compatible antialiased
// downscale) resampler with fused [-1,1] normalization, exposed via ctypes
// (rsvldm_tpu/native/__init__.py) with a transparent PIL fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Keys cubic kernel, a = -0.5 (PIL/OpenCV "bicubic")
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Taps {
  std::vector<int> start;      // first source index per output coord
  std::vector<int> count;      // number of taps
  std::vector<double> weight;  // flattened [out, max_taps]
  int max_taps;
};

// PIL-style tap precomputation: antialiased when downscaling
// (filterscale = max(in/out, 1)).
Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  t.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(static_cast<size_t>(out_size) * t.max_taps, 0.0);
  for (int i = 0; i < out_size; ++i) {
    // weights evaluate at `center` (pixel-center aligned); the tap WINDOW
    // uses center+0.5 — PIL's convention (xmin = (int)(c - support + 0.5)
    // with c including the half-pixel shift)
    const double center = (i + 0.5) * scale - 0.5;
    int lo = static_cast<int>(std::floor(center + 1.0 - support));
    int hi = static_cast<int>(std::floor(center + 1.0 + support));
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    double total = 0.0;
    for (int j = lo; j < hi; ++j) {
      const double w = cubic((j - center) / filterscale);
      t.weight[static_cast<size_t>(i) * t.max_taps + (j - lo)] = w;
      total += w;
    }
    if (total != 0.0) {
      for (int j = 0; j < hi - lo; ++j)
        t.weight[static_cast<size_t>(i) * t.max_taps + j] /= total;
    }
    t.start[i] = lo;
    t.count[i] = hi - lo;
  }
  return t;
}

void parallel_rows(int rows, const std::function<void(int, int)>& fn) {
  const unsigned n = std::min<unsigned>(std::thread::hardware_concurrency(),
                                        16u);
  if (n <= 1 || rows < 64) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  const int chunk = (rows + n - 1) / n;
  for (unsigned k = 0; k < n; ++k) {
    const int r0 = static_cast<int>(k) * chunk;
    const int r1 = std::min(rows, r0 + chunk);
    if (r0 >= r1) break;
    ts.emplace_back(fn, r0, r1);
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// src: uint8 HWC; dst: float32 HWC at (dh, dw).
// normalize: 0 -> [0,255] floats, 1 -> [-1,1], 2 -> [0,1]
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int ch,
                       float* dst, int dh, int dw, int normalize) {
  const Taps tx = make_taps(sw, dw);
  const Taps ty = make_taps(sh, dh);

  // pass 1: horizontal  (sh x dw x ch)
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * ch);
  parallel_rows(sh, [&](int r0, int r1) {
    for (int y = r0; y < r1; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * sw * ch;
      float* trow = tmp.data() + static_cast<size_t>(y) * dw * ch;
      for (int x = 0; x < dw; ++x) {
        const int s0 = tx.start[x];
        const int cnt = tx.count[x];
        const double* w = tx.weight.data()
            + static_cast<size_t>(x) * tx.max_taps;
        for (int c = 0; c < ch; ++c) {
          double acc = 0.0;
          for (int j = 0; j < cnt; ++j)
            acc += w[j] * srow[(s0 + j) * ch + c];
          trow[x * ch + c] = static_cast<float>(acc);
        }
      }
    }
  });

  // pass 2: vertical  (dh x dw x ch) + normalization
  parallel_rows(dh, [&](int r0, int r1) {
    for (int y = r0; y < r1; ++y) {
      const int s0 = ty.start[y];
      const int cnt = ty.count[y];
      const double* w = ty.weight.data() + static_cast<size_t>(y) * ty.max_taps;
      float* drow = dst + static_cast<size_t>(y) * dw * ch;
      for (int x = 0; x < dw; ++x) {
        for (int c = 0; c < ch; ++c) {
          double acc = 0.0;
          for (int j = 0; j < cnt; ++j)
            acc += w[j] * tmp[(static_cast<size_t>(s0 + j) * dw + x) * ch + c];
          float v = static_cast<float>(acc);
          if (normalize == 1) {
            v = std::clamp(v, 0.0f, 255.0f) / 255.0f * 2.0f - 1.0f;
          } else if (normalize == 2) {
            v = std::clamp(v, 0.0f, 255.0f) / 255.0f;
          }
          drow[x * ch + c] = v;
        }
      }
    }
  });
}

// uint8 HWC -> float32 HWC in [-1, 1] (no resize; fused normalize path)
void normalize_u8(const uint8_t* src, int n, float* dst) {
  for (int i = 0; i < n; ++i)
    dst[i] = src[i] / 255.0f * 2.0f - 1.0f;
}

}  // extern "C"
