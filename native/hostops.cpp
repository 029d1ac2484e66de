// hostops: native host-side tensor ops for the video IO path.
//
// The reference delegates its host-side video work to decord's C++ decoder
// plus torch CPU kernels (reference util.py:217-242); here the bitstream
// decode stays in OpenCV's ffmpeg, and the per-frame preprocessing
// (uint8 -> float32 align-corners bilinear resize + [-1,1] normalize) and
// postprocessing (float32 -> uint8 with clamp) run in this multithreaded
// C++ library, exposed to Python via ctypes (native/hostops.py wrapper).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Process frames [begin, end) of an (N, H, W, C) uint8 tensor into an
// (N, OH, OW, C) float32 tensor with align_corners=true bilinear sampling
// and affine transform out = in * scale + shift.
void resize_normalize_range(const uint8_t* src, float* dst, int n_begin,
                            int n_end, int h, int w, int c, int oh, int ow,
                            float scale, float shift) {
  const float sy = oh > 1 ? static_cast<float>(h - 1) / (oh - 1) : 0.0f;
  const float sx = ow > 1 ? static_cast<float>(w - 1) / (ow - 1) : 0.0f;

  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int x = 0; x < ow; ++x) {
    const float fx = x * sx;
    x0[x] = static_cast<int>(fx);
    x1[x] = std::min(x0[x] + 1, w - 1);
    wx[x] = fx - x0[x];
  }

  const int64_t in_frame = static_cast<int64_t>(h) * w * c;
  const int64_t out_frame = static_cast<int64_t>(oh) * ow * c;

  for (int nidx = n_begin; nidx < n_end; ++nidx) {
    const uint8_t* f = src + nidx * in_frame;
    float* o = dst + nidx * out_frame;
    for (int y = 0; y < oh; ++y) {
      const float fy = y * sy;
      const int y0 = static_cast<int>(fy);
      const int y1 = std::min(y0 + 1, h - 1);
      const float dy = fy - y0;
      const uint8_t* r0 = f + static_cast<int64_t>(y0) * w * c;
      const uint8_t* r1 = f + static_cast<int64_t>(y1) * w * c;
      float* orow = o + static_cast<int64_t>(y) * ow * c;
      for (int x = 0; x < ow; ++x) {
        const uint8_t* p00 = r0 + static_cast<int64_t>(x0[x]) * c;
        const uint8_t* p01 = r0 + static_cast<int64_t>(x1[x]) * c;
        const uint8_t* p10 = r1 + static_cast<int64_t>(x0[x]) * c;
        const uint8_t* p11 = r1 + static_cast<int64_t>(x1[x]) * c;
        const float dx = wx[x];
        float* op = orow + static_cast<int64_t>(x) * c;
        for (int ch = 0; ch < c; ++ch) {
          const float top = p00[ch] + (p01[ch] - p00[ch]) * dx;
          const float bot = p10[ch] + (p11[ch] - p10[ch]) * dx;
          op[ch] = (top + (bot - top) * dy) * scale + shift;
        }
      }
    }
  }
}

void parallel_over_frames(int n, int threads,
                          const std::function<void(int, int)>& fn) {
  if (threads <= 1 || n <= 1) {
    fn(0, n);
    return;
  }
  threads = std::min(threads, n);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int b = t * chunk;
    const int e = std::min(b + chunk, n);
    if (b >= e) break;
    pool.emplace_back(fn, b, e);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// uint8 (N,H,W,C) -> float32 (N,OH,OW,C), align-corners bilinear,
// out = in * scale + shift.  threads <= 0 -> hardware concurrency.
void hostops_resize_normalize(const uint8_t* src, float* dst, int n, int h,
                              int w, int c, int oh, int ow, float scale,
                              float shift, int threads) {
  if (threads <= 0) threads = std::thread::hardware_concurrency();
  parallel_over_frames(n, threads, [&](int b, int e) {
    resize_normalize_range(src, dst, b, e, h, w, c, oh, ow, scale, shift);
  });
}

// float32 (N,...) in [0,1] -> uint8 with round + clamp (decode postprocess,
// reference t2v_video_sample.py:102).
void hostops_to_uint8(const float* src, uint8_t* dst, int64_t count,
                      int threads) {
  if (threads <= 0) threads = std::thread::hardware_concurrency();
  const int n_chunks = std::min<int64_t>(threads, std::max<int64_t>(count / (1 << 16), 1));
  parallel_over_frames(static_cast<int>(n_chunks), n_chunks, [&](int b, int e) {
    const int64_t chunk = (count + n_chunks - 1) / n_chunks;
    for (int i = b; i < e; ++i) {
      const int64_t lo = i * chunk;
      const int64_t hi = std::min<int64_t>(lo + chunk, count);
      for (int64_t j = lo; j < hi; ++j) {
        const float v = std::nearbyint(src[j] * 255.0f);
        dst[j] = static_cast<uint8_t>(std::clamp(v, 0.0f, 255.0f));
      }
    }
  });
}

}  // extern "C"
