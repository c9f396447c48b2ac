// umfa_runtime.cpp — native runtime services for umfa_tpu.
//
// See include/umfa_ffi.h for the design rationale (TPU-native counterpart of
// the reference's Swift/C++ runtime layer: dispatch-stat atomics, global
// quantization mode, latency bookkeeping, CPU reference quantizers).

#include "umfa_ffi.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>

namespace {

std::atomic<uint64_t> g_stats[UMFA_ROUTE_COUNT];

std::atomic<int> g_quant_set{0};
std::atomic<int> g_quant_precision{UMFA_PRECISION_INT8};
std::atomic<int> g_quant_mode{UMFA_QUANT_ROW};

std::atomic<uint64_t> g_last_latency_ns{0};
std::atomic<uint64_t> g_latency_total_ns{0};
std::atomic<uint64_t> g_latency_count{0};

}  // namespace

extern "C" {

const char *umfa_version(void) { return "umfa_tpu-native 0.1.0"; }

void umfa_record_dispatch(umfa_route_t route) {
  g_stats[UMFA_ROUTE_TOTAL].fetch_add(1, std::memory_order_relaxed);
  if (route > UMFA_ROUTE_TOTAL && route < UMFA_ROUTE_COUNT) {
    g_stats[route].fetch_add(1, std::memory_order_relaxed);
  }
}

void umfa_get_dispatch_stats(uint64_t out[UMFA_ROUTE_COUNT]) {
  for (int i = 0; i < UMFA_ROUTE_COUNT; ++i) {
    out[i] = g_stats[i].load(std::memory_order_relaxed);
  }
}

void umfa_reset_dispatch_stats(void) {
  for (auto &s : g_stats) s.store(0, std::memory_order_relaxed);
}

void umfa_set_quantization_mode(umfa_precision_t precision,
                                umfa_quant_mode_t mode) {
  g_quant_precision.store(precision, std::memory_order_relaxed);
  g_quant_mode.store(mode, std::memory_order_relaxed);
  g_quant_set.store(1, std::memory_order_release);
}

int umfa_get_quantization_mode(umfa_precision_t *precision,
                               umfa_quant_mode_t *mode) {
  if (!g_quant_set.load(std::memory_order_acquire)) return 0;
  if (precision)
    *precision =
        static_cast<umfa_precision_t>(g_quant_precision.load(std::memory_order_relaxed));
  if (mode)
    *mode = static_cast<umfa_quant_mode_t>(g_quant_mode.load(std::memory_order_relaxed));
  return 1;
}

void umfa_clear_quantization_mode(void) {
  g_quant_set.store(0, std::memory_order_release);
}

void umfa_record_latency_ns(uint64_t ns) {
  g_last_latency_ns.store(ns, std::memory_order_relaxed);
  g_latency_total_ns.fetch_add(ns, std::memory_order_relaxed);
  g_latency_count.fetch_add(1, std::memory_order_relaxed);
}

uint64_t umfa_get_last_latency_ns(void) {
  return g_last_latency_ns.load(std::memory_order_relaxed);
}

double umfa_get_mean_latency_ns(void) {
  uint64_t n = g_latency_count.load(std::memory_order_relaxed);
  if (n == 0) return 0.0;
  return static_cast<double>(g_latency_total_ns.load(std::memory_order_relaxed)) /
         static_cast<double>(n);
}

// ---- CPU reference quantizers ----
// Plain loops; -O3 -march auto-vectorizes the inner col loops.

umfa_error_t umfa_quantize_int8_rowwise(const float *x, int64_t rows,
                                        int64_t cols, int8_t *out,
                                        float *scales) {
  if (!x || !out || !scales || rows <= 0 || cols <= 0)
    return UMFA_ERROR_INVALID_ARGS;
  for (int64_t r = 0; r < rows; ++r) {
    const float *row = x + r * cols;
    float absmax = 0.0f;
    for (int64_t c = 0; c < cols; ++c) absmax = std::max(absmax, std::fabs(row[c]));
    float scale = (absmax > 1e-12f ? absmax : 1e-12f) / 127.0f;
    scales[r] = scale;
    float inv = 1.0f / scale;
    int8_t *orow = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      float q = std::nearbyint(row[c] * inv);
      q = std::min(127.0f, std::max(-128.0f, q));
      orow[c] = static_cast<int8_t>(q);
    }
  }
  return UMFA_SUCCESS;
}

umfa_error_t umfa_quantize_int8_rowwise_asym(const float *x, int64_t rows,
                                             int64_t cols, int8_t *out,
                                             float *scales,
                                             int32_t *zero_points) {
  if (!x || !out || !scales || !zero_points || rows <= 0 || cols <= 0)
    return UMFA_ERROR_INVALID_ARGS;
  for (int64_t r = 0; r < rows; ++r) {
    const float *row = x + r * cols;
    float lo = row[0], hi = row[0];
    for (int64_t c = 1; c < cols; ++c) {
      lo = std::min(lo, row[c]);
      hi = std::max(hi, row[c]);
    }
    float scale = (hi - lo > 1e-12f ? hi - lo : 1e-12f) / 255.0f;
    // zp is int32 and deliberately NOT clipped to the int8 range —
    // distributions not straddling zero need |zp| > 127 (see ops/quant.py).
    int32_t zp = static_cast<int32_t>(std::nearbyint(-lo / scale)) - 128;
    scales[r] = scale;
    zero_points[r] = zp;
    float inv = 1.0f / scale;
    int8_t *orow = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      float q = std::nearbyint(row[c] * inv) + static_cast<float>(zp);
      q = std::min(127.0f, std::max(-128.0f, q));
      orow[c] = static_cast<int8_t>(q);
    }
  }
  return UMFA_SUCCESS;
}

umfa_error_t umfa_quantize_int4_rowwise(const float *x, int64_t rows,
                                        int64_t cols, int8_t *out,
                                        float *scales) {
  if (!x || !out || !scales || rows <= 0 || cols <= 0 || (cols % 2) != 0)
    return UMFA_ERROR_INVALID_ARGS;
  const int64_t half = cols / 2;
  for (int64_t r = 0; r < rows; ++r) {
    const float *row = x + r * cols;
    float absmax = 0.0f;
    for (int64_t c = 0; c < cols; ++c) absmax = std::max(absmax, std::fabs(row[c]));
    float scale = (absmax > 1e-12f ? absmax : 1e-12f) / 7.0f;
    scales[r] = scale;
    float inv = 1.0f / scale;
    int8_t *orow = out + r * half;
    for (int64_t j = 0; j < half; ++j) {
      float ql = std::nearbyint(row[j] * inv);
      float qh = std::nearbyint(row[j + half] * inv);
      int lo = static_cast<int>(std::min(7.0f, std::max(-8.0f, ql))) & 0xF;
      int hi = static_cast<int>(std::min(7.0f, std::max(-8.0f, qh))) & 0xF;
      orow[j] = static_cast<int8_t>(lo | (hi << 4));
    }
  }
  return UMFA_SUCCESS;
}

umfa_error_t umfa_dequantize_int8_rowwise(const int8_t *q, const float *scales,
                                          int64_t rows, int64_t cols,
                                          float *out) {
  if (!q || !scales || !out || rows <= 0 || cols <= 0)
    return UMFA_ERROR_INVALID_ARGS;
  for (int64_t r = 0; r < rows; ++r) {
    float s = scales[r];
    const int8_t *row = q + r * cols;
    float *orow = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      orow[c] = static_cast<float>(row[c]) * s;
    }
  }
  return UMFA_SUCCESS;
}

}  // extern "C"
