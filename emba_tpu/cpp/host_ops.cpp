// Native host-side runtime ops for emba_tpu.
//
// The reference implements its whole runtime in C++ (SURVEY.md §2). In this
// framework the accelerator does the math; the host-side hot paths that
// remain — per-pixel event pairing (the EventMap replacement,
// reference include/emba/event_map.h:22-113), event histogramming, and
// window slicing — are implemented here as a small C library loaded via
// ctypes (no pybind11 dependency), with numpy fallbacks in native.py.
//
// Build: cc -O3 -shared -fPIC -o libemba_host.so host_ops.cpp (see Makefile).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// For each event, the index of the previous event at the same sensor pixel
// (-1 if none). O(N) with a dense last-seen table — replaces the reference's
// ragged per-pixel vectors and the numpy argsort-based fallback.
void emba_prev_index(const int32_t* x, const int32_t* y, int64_t n,
                     int32_t width, int32_t height, int32_t* out) {
  std::vector<int32_t> last((size_t)width * height, -1);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = (int64_t)y[i] * width + x[i];
    out[i] = last[p];
    last[p] = (int32_t)i;
  }
}

// Events-per-pixel histogram (reference EventMap::getEventNumMap,
// event_map.h:85-102).
void emba_event_count(const int32_t* x, const int32_t* y, int64_t n,
                      int32_t width, int32_t height, int32_t* out) {
  std::memset(out, 0, (size_t)width * height * sizeof(int32_t));
  for (int64_t i = 0; i < n; ++i) {
    out[(int64_t)y[i] * width + x[i]] += 1;
  }
}

// Last-timestamp-per-pixel map (reference EventMap::getTimeMap,
// event_map.h:62-83).
void emba_time_map(const int32_t* x, const int32_t* y, const double* t,
                   int64_t n, int32_t width, int32_t height, double t0,
                   double* out) {
  std::memset(out, 0, (size_t)width * height * sizeof(double));
  for (int64_t i = 0; i < n; ++i) {
    out[(int64_t)y[i] * width + x[i]] = t[i] - t0;
  }
}

// Systematic subsampling: keep every `rate`-th event (reference
// emba.cpp:282-304). Returns the number of kept indices.
int64_t emba_subsample_indices(int64_t n, int32_t rate, int64_t* out) {
  if (rate < 2) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    return n;
  }
  int64_t m = 0;
  for (int64_t i = rate - 1; i < n; i += rate) out[m++] = i;
  return m;
}

}  // extern "C"
