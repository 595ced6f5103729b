// Native JPEG -> training-tensor pipeline for lmdb-backed datasets (LSUN).
//
// The LSUN reader's per-item work is: JPEG decode, center-crop to the short
// side, Lanczos-3 resize to `size` (reference `data/dataset.py:47-64`, which
// does it in Python/PIL on the single data thread). At 256^2 streaming that
// is ~5-10 ms per image single-threaded — slower than the fused TPU train
// step. This pipeline does the same transform in a C++ thread pool:
//
//   * libjpeg decompress straight to RGB (same library PIL wraps, so the
//     decode bytes match),
//   * integer center crop ((h-c)/2, (w-c)/2 like the NumPy reference),
//   * separable Lanczos-3 resampling with PIL's window/support semantics
//     (float accumulation; PIL's fixed-point path differs by <= ~2/255).
//
// C API consumed via ctypes (damc_tpu/data/native_jpeg.py).
// Build: g++ -O3 -shared -fPIC -pthread -std=c++17 -o libjpeg_pipeline.so \
//            jpeg_pipeline.cpp -ljpeg

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <exception>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// libjpeg decode with recoverable errors (the default handler exits()).
// ---------------------------------------------------------------------------

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode `buf` to tightly-packed RGB; returns false on corrupt data.
bool decode_rgb(const uint8_t* buf, size_t len, std::vector<uint8_t>& rgb,
                int& w, int& h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // converts YCbCr/grayscale sources
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  // A corrupt/adversarial header can declare up to 65500x65500 (~12.8 GB
  // RGB); treat implausibly large frames as corrupt instead of attempting
  // the allocation.
  constexpr int64_t kMaxPixels = 64LL * 1024 * 1024;  // 64 MP
  if (w <= 0 || h <= 0 || (int64_t)w * h > kMaxPixels) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// Separable Lanczos-3 resampling (PIL window semantics).
// ---------------------------------------------------------------------------

inline double lanczos3(double t) {
  t = std::fabs(t);
  if (t >= 3.0) return 0.0;
  if (t < 1e-12) return 1.0;
  const double pit = M_PI * t;
  return 3.0 * std::sin(pit) * std::sin(pit / 3.0) / (pit * pit);
}

struct ResampleAxis {
  // Per output pixel: first source index + normalized weights.
  std::vector<int> first;
  std::vector<int> count;
  std::vector<double> weights;  // flattened, `max_count` stride
  int max_count = 0;
};

ResampleAxis build_axis(int in_size, int out_size) {
  ResampleAxis ax;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 3.0 * filterscale;
  ax.max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
  ax.first.resize(out_size);
  ax.count.resize(out_size);
  ax.weights.assign(static_cast<size_t>(out_size) * ax.max_count, 0.0);
  for (int x = 0; x < out_size; ++x) {
    const double center = (x + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    double total = 0.0;
    for (int i = lo; i < hi; ++i) {
      total += lanczos3((i - center + 0.5) / filterscale);
    }
    ax.first[x] = lo;
    ax.count[x] = hi - lo;
    for (int i = lo; i < hi; ++i) {
      ax.weights[static_cast<size_t>(x) * ax.max_count + (i - lo)] =
          lanczos3((i - center + 0.5) / filterscale) / total;
    }
  }
  return ax;
}

inline uint8_t clamp_u8(double v) {
  return static_cast<uint8_t>(std::min(255.0, std::max(0.0, v + 0.5)));
}

// Crop (top,left,crop) from (w,h) RGB and Lanczos-resize to out*out RGB.
void crop_resize(const std::vector<uint8_t>& rgb, int w, int h, int out_size,
                 uint8_t* out) {
  const int crop = std::min(w, h);
  const int top = (h - crop) / 2, left = (w - crop) / 2;
  if (crop == out_size) {
    // Identity resize: Lanczos-3 at scale 1.0 with this center alignment
    // has lanczos3(i - x) weights, i.e. exactly delta(i == x) — the full
    // two-pass convolution would reproduce the input. Copy the crop.
    for (int y = 0; y < crop; ++y) {
      const uint8_t* src =
          rgb.data() + (static_cast<size_t>(y + top) * w + left) * 3;
      std::memcpy(out + static_cast<size_t>(y) * out_size * 3, src,
                  static_cast<size_t>(out_size) * 3);
    }
    return;
  }
  const ResampleAxis ax = build_axis(crop, out_size);

  // Horizontal pass: (crop rows) x (out_size cols), float.
  std::vector<float> tmp(static_cast<size_t>(crop) * out_size * 3);
  for (int y = 0; y < crop; ++y) {
    const uint8_t* src = rgb.data() + (static_cast<size_t>(y + top) * w + left) * 3;
    float* dst = tmp.data() + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      const double* wt = ax.weights.data() + static_cast<size_t>(x) * ax.max_count;
      double acc[3] = {0, 0, 0};
      const uint8_t* s = src + static_cast<size_t>(ax.first[x]) * 3;
      for (int k = 0; k < ax.count[x]; ++k, s += 3) {
        acc[0] += wt[k] * s[0];
        acc[1] += wt[k] * s[1];
        acc[2] += wt[k] * s[2];
      }
      dst[x * 3 + 0] = static_cast<float>(acc[0]);
      dst[x * 3 + 1] = static_cast<float>(acc[1]);
      dst[x * 3 + 2] = static_cast<float>(acc[2]);
    }
  }
  // Vertical pass.
  for (int y = 0; y < out_size; ++y) {
    const double* wt = ax.weights.data() + static_cast<size_t>(y) * ax.max_count;
    uint8_t* dst = out + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      double acc[3] = {0, 0, 0};
      const float* s = tmp.data() +
          (static_cast<size_t>(ax.first[y]) * out_size + x) * 3;
      for (int k = 0; k < ax.count[y]; ++k, s += static_cast<size_t>(out_size) * 3) {
        acc[0] += wt[k] * s[0];
        acc[1] += wt[k] * s[1];
        acc[2] += wt[k] * s[2];
      }
      dst[x * 3 + 0] = clamp_u8(acc[0]);
      dst[x * 3 + 1] = clamp_u8(acc[1]);
      dst[x * 3 + 2] = clamp_u8(acc[2]);
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEG buffers -> out (n, out_size, out_size, 3) uint8, with
// center-crop + Lanczos-3 resize, using up to n_threads workers.
// Returns the number of successfully decoded items (corrupt items leave
// zeros and are reported via `ok_flags` when non-null).
int damc_jpeg_decode_batch(const uint8_t* const* bufs, const size_t* lens,
                           int n, int out_size, uint8_t* out,
                           uint8_t* ok_flags, int n_threads) {
  if (n <= 0 || out_size <= 0) return 0;
  std::atomic<int> next{0};
  std::atomic<int> n_ok{0};
  const size_t item_elems = static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      uint8_t* dst = out + item_elems * i;
      bool ok = false;
      try {
        ok = decode_rgb(bufs[i], lens[i], rgb, w, h) && w > 0 && h > 0;
        if (ok) crop_resize(rgb, w, h, out_size, dst);
      } catch (const std::exception&) {
        // bad_alloc etc. must mark the item corrupt, not escape the worker
        // thread (an uncaught exception would std::terminate the process).
        ok = false;
      }
      if (ok) {
        n_ok.fetch_add(1);
      } else {
        std::memset(dst, 0, item_elems);
      }
      if (ok_flags) ok_flags[i] = ok ? 1 : 0;
    }
  };

  int threads = std::max(1, std::min(n_threads, n));
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return n_ok.load();
}

}  // extern "C"
