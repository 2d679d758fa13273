// Native host-pipeline kernels for the data loader.
//
// The reference's host-side hot loop #3 (SURVEY.md §3.1) is frame decode +
// normalize in DataLoader workers. Decode stays in OpenCV (already C++);
// this library takes over the batch-assembly inner loops that numpy runs
// single-threaded per sample:
//
//   - uint8 -> float32 affine normalize (x * scale + shift), threaded
//   - one-hot expansion for segmentation labels, threaded
//
// Built with plain g++ (no external deps) into libdcvgan_host.so and bound
// via ctypes (see native/__init__.py) with a pure-numpy fallback.

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// dst[i] = src[i] / divisor + shift — division (not reciprocal multiply)
// so results are bit-identical to numpy's `astype(float32) / d + s`.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n,
                         float divisor, float shift, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i] = static_cast<float>(src[i]) / divisor + shift;
      }
    });
  }
  for (auto& w : workers) w.join();
}

// dst[i * n_classes + labels[i]] = 1.0f; dst assumed zero-initialized.
void one_hot_f32(const uint8_t* labels, float* dst, int64_t n,
                 int n_classes, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        int c = labels[i];
        if (c < n_classes) dst[i * n_classes + c] = 1.0f;
      }
    });
  }
  for (auto& w : workers) w.join();
}

// scale float32 in place: dst[i] = src[i] * scale (optical-flow /image_size)
void scale_f32(const float* src, float* dst, int64_t n, float scale,
               int n_threads) {
  if (n_threads < 1) n_threads = 1;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) dst[i] = src[i] * scale;
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
