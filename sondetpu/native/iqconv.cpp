// Native IQ sample-format conversion for the host ingest hot loop.
//
// TPU-native replacement for the sample conversion the reference delegates to
// the SDR++ host application's source modules (the plugin itself consumes an
// already-converted float stream, src/main.cpp:55-60). Converting multi-MS/s
// int8/int16 interleaved IQ to complex64 is the one host-side per-sample loop
// in this framework, so it is done in C++ (auto-vectorized) rather than
// Python. Loaded via ctypes from sondetpu/io/iq.py.

#include <cstddef>
#include <cstdint>

extern "C" {

void iq_cs16_to_cf32(const int16_t *src, float *dst, size_t n_complex,
                     float scale) {
  const size_t n = n_complex * 2;
  for (size_t i = 0; i < n; ++i) {
    dst[i] = static_cast<float>(src[i]) * scale;
  }
}

void iq_cs8_to_cf32(const int8_t *src, float *dst, size_t n_complex,
                    float scale) {
  const size_t n = n_complex * 2;
  for (size_t i = 0; i < n; ++i) {
    dst[i] = static_cast<float>(src[i]) * scale;
  }
}

void iq_cu8_to_cf32(const uint8_t *src, float *dst, size_t n_complex,
                    float scale) {
  const size_t n = n_complex * 2;
  for (size_t i = 0; i < n; ++i) {
    dst[i] = (static_cast<float>(src[i]) - 127.5f) * scale;
  }
}

}  // extern "C"
