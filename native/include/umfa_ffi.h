/* umfa_ffi.h — C ABI for the umfa_tpu native runtime.
 *
 * TPU-native counterpart of the reference's C FFI layer
 * (/root/reference/Sources/MFAFFI/include/mfa_ffi.h): the device compute
 * path lives in XLA/Pallas, so this ABI carries the *runtime* services the
 * reference implements natively — process-global dispatch statistics,
 * quantization-mode atomics (metal_sdpa_backend.h:654-679), latency
 * bookkeeping (mfa_get_gpu_latency, MFABridge.swift:1607-1612), and CPU-side
 * reference quantizers (metal_sdpa_backend.cpp:217-931) used for host-side
 * data prep and validation.
 */

#ifndef UMFA_FFI_H
#define UMFA_FFI_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Error codes (parity: mfa_ffi.h:17-24). */
typedef enum {
  UMFA_SUCCESS = 0,
  UMFA_ERROR_INVALID_ARGS = 1,
  UMFA_ERROR_DEVICE_NOT_FOUND = 2,
  UMFA_ERROR_MEMORY_ALLOCATION = 3,
  UMFA_ERROR_KERNEL_COMPILATION = 4,
  UMFA_ERROR_EXECUTION_FAILED = 5
} umfa_error_t;

/* Precision (parity: mfa_ffi.h:33-39). */
typedef enum {
  UMFA_PRECISION_FP16 = 0,
  UMFA_PRECISION_BF16 = 1,
  UMFA_PRECISION_FP32 = 2,
  UMFA_PRECISION_INT8 = 3,
  UMFA_PRECISION_INT4 = 4
} umfa_precision_t;

/* Quantization granularity (parity: metal_sdpa_backend.h:15-20). */
typedef enum {
  UMFA_QUANT_TENSOR = 0,
  UMFA_QUANT_ROW = 1,
  UMFA_QUANT_BLOCK = 2,
  UMFA_QUANT_HYBRID = 3
} umfa_quant_mode_t;

/* Dispatch routes (parity: DispatchStats, metal_sdpa_backend.h:664-679). */
typedef enum {
  UMFA_ROUTE_TOTAL = 0,
  UMFA_ROUTE_FUSED_FWD = 1,
  UMFA_ROUTE_FUSED_AUTOGRAD = 2,
  UMFA_ROUTE_QUANTIZED_FWD = 3,
  UMFA_ROUTE_QUANTIZED_AUTOGRAD = 4,
  UMFA_ROUTE_ROPE_FUSED = 5,
  UMFA_ROUTE_NAIVE_FALLBACK = 6,
  UMFA_ROUTE_MASK_ALL_TRUE_SKIPPED = 7,
  UMFA_ROUTE_WINDOW_AUTO_TILED = 8,
  UMFA_ROUTE_COUNT = 9
} umfa_route_t;

const char *umfa_version(void);

/* ---- dispatch statistics (lock-free atomics) ---- */
void umfa_record_dispatch(umfa_route_t route);
void umfa_get_dispatch_stats(uint64_t out[UMFA_ROUTE_COUNT]);
void umfa_reset_dispatch_stats(void);

/* ---- process-global quantization mode ---- */
void umfa_set_quantization_mode(umfa_precision_t precision,
                                umfa_quant_mode_t mode);
/* Returns 1 if a mode is set (writes outputs), 0 otherwise. */
int umfa_get_quantization_mode(umfa_precision_t *precision,
                               umfa_quant_mode_t *mode);
void umfa_clear_quantization_mode(void);

/* ---- latency bookkeeping (parity: MFAContext.lastGPULatency) ---- */
void umfa_record_latency_ns(uint64_t ns);
uint64_t umfa_get_last_latency_ns(void);
double umfa_get_mean_latency_ns(void);

/* ---- CPU reference quantizers ----
 * Row-wise symmetric INT8: per-row scale = absmax/127.
 * x: rows*cols f32, out: rows*cols i8, scales: rows f32.               */
umfa_error_t umfa_quantize_int8_rowwise(const float *x, int64_t rows,
                                        int64_t cols, int8_t *out,
                                        float *scales);
/* Row-wise asymmetric INT8: scale=(max-min)/255, zp so min -> -128. */
umfa_error_t umfa_quantize_int8_rowwise_asym(const float *x, int64_t rows,
                                             int64_t cols, int8_t *out,
                                             float *scales,
                                             int32_t *zero_points);
/* Row-wise symmetric INT4 packed (split-halves layout: byte j holds
 * element j (low nibble) and element j + cols/2 (high)). cols must be even.
 * out: rows*(cols/2) bytes. */
umfa_error_t umfa_quantize_int4_rowwise(const float *x, int64_t rows,
                                        int64_t cols, int8_t *out,
                                        float *scales);
/* Dequantize row-wise INT8 back to f32 (validation path). */
umfa_error_t umfa_dequantize_int8_rowwise(const int8_t *q, const float *scales,
                                          int64_t rows, int64_t cols,
                                          float *out);

#ifdef __cplusplus
}
#endif

#endif /* UMFA_FFI_H */
