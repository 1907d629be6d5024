// vsrio: native data-loader core for vsrlab_tpu.
//
// The host-side input pipeline is the throughput hard-part of VSR training
// (SURVEY.md §7.3 #5): per-sample frame decode + degradation must keep TPU
// chips fed. This library does the hot host work in C++ with a thread pool,
// writing straight into caller-provided float32 buffers (no per-frame Python
// objects, no GIL ping-pong):
//
//   * vsrio_decode_clip      — image files -> (T, H, W, 3) float32 RGB [0,1],
//                              optional resize
//   * vsrio_bicubic_resize   — batch bicubic resize of a float32 clip
//   * vsrio_jpeg_degrade     — per-frame JPEG encode/decode round-trip
//
// Exposed through ctypes (vsrlab_tpu/data/native.py); built with
// `make -C vsrlab_tpu/native` against the system OpenCV.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

// Run fn(i) for i in [0, n) on up to `threads` workers.
void parallel_for(int n, int threads, const std::function<void(int)>& fn) {
  if (threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&] {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  int k = std::min(threads, n);
  std::vector<std::thread> pool;
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// BGR uint8 -> RGB float32 [0,1] into `dst` (h*w*3 floats).
void to_rgb_float(const cv::Mat& bgr, float* dst) {
  const int h = bgr.rows, w = bgr.cols;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = bgr.ptr<uint8_t>(y);
    float* out = dst + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      out[3 * x + 0] = row[3 * x + 2] * (1.0f / 255.0f);
      out[3 * x + 1] = row[3 * x + 1] * (1.0f / 255.0f);
      out[3 * x + 2] = row[3 * x + 0] * (1.0f / 255.0f);
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` image files into out (n, out_h, out_w, 3) float32 RGB.
// paths: array of NUL-terminated UTF-8 strings. If out_h/out_w are 0 the
// native size is used (all frames must then share it). Returns 0 on success,
// else the 1-based index of the first file that failed.
int vsrio_decode_clip(const char** paths, int n, float* out, int out_h,
                      int out_w, int threads) {
  std::atomic<int> failed{0};
  parallel_for(n, threads, [&](int i) {
    cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
    if (img.empty()) {
      int expected = 0;
      failed.compare_exchange_strong(expected, i + 1);
      return;
    }
    if (out_h > 0 && out_w > 0 && (img.rows != out_h || img.cols != out_w)) {
      cv::resize(img, img, cv::Size(out_w, out_h), 0, 0, cv::INTER_AREA);
    }
    const int h = out_h > 0 ? out_h : img.rows;
    const int w = out_w > 0 ? out_w : img.cols;
    to_rgb_float(img, out + static_cast<size_t>(i) * h * w * 3);
  });
  return failed.load();
}

// Bicubic-resize a float32 RGB clip (t, h, w, 3) -> (t, out_h, out_w, 3).
void vsrio_bicubic_resize(const float* in, int t, int h, int w, float* out,
                          int out_h, int out_w, int threads) {
  parallel_for(t, threads, [&](int i) {
    cv::Mat src(h, w, CV_32FC3,
                const_cast<float*>(in + static_cast<size_t>(i) * h * w * 3));
    cv::Mat dst(out_h, out_w, CV_32FC3,
                out + static_cast<size_t>(i) * out_h * out_w * 3);
    cv::Mat tmp;
    cv::resize(src, tmp, cv::Size(out_w, out_h), 0, 0, cv::INTER_CUBIC);
    // clamp to [0,1] like the python pipeline
    cv::min(cv::max(tmp, 0.0f), 1.0f, tmp);
    tmp.copyTo(dst);
  });
}

// JPEG round-trip degradation on a float32 RGB clip (t, h, w, 3), in place
// semantics via separate out buffer. quality in [1, 100].
void vsrio_jpeg_degrade(const float* in, int t, int h, int w, int quality,
                        float* out, int threads) {
  parallel_for(t, threads, [&](int i) {
    cv::Mat rgb(h, w, CV_32FC3,
                const_cast<float*>(in + static_cast<size_t>(i) * h * w * 3));
    cv::Mat u8, bgr;
    rgb.convertTo(u8, CV_8UC3, 255.0);
    cv::cvtColor(u8, bgr, cv::COLOR_RGB2BGR);
    std::vector<uint8_t> buf;
    cv::imencode(".jpg", bgr, buf, {cv::IMWRITE_JPEG_QUALITY, quality});
    cv::Mat dec = cv::imdecode(buf, cv::IMREAD_COLOR);
    to_rgb_float(dec, out + static_cast<size_t>(i) * h * w * 3);
  });
}

}  // extern "C"
