// Native window staging: the host-side pad/rebase/convert pass that turns
// generator columns into fixed-capacity transfer buffers in ONE sweep.
//
// Reference counterpart: flock/src/transmute.rs:255-266
// (event_bytes_to_batch — the reference's hot feed loop re-encodes event
// bytes into Arrow batches).  Here the cost being replaced is numpy's
// chain of temporaries per column (int64 subtract → astype(int32) →
// concatenate-with-pad: three full passes plus allocations; measured 2.7 s
// per 14.7M-row window on the 2-vCPU host, round 5), which this does in a
// single streaming pass per column, split across two threads.
//
// Contract (ctypes, see flock_tpu/native/__init__.py):
//   flock_min_i64(src, n) -> int64            (INT64_MAX when n == 0)
//   flock_stage_sub_i64_i32(src, dst, n, cap, base) -> void
//       dst[i] = (int32)(src[i] - base) for i < n; zeros beyond.
//   flock_stage_copy(src, dst, nbytes, cap_bytes) -> void
//       raw copy + zero tail (same-dtype pad path).

#include <cstdint>
#include <cstring>
#include <thread>

namespace {
constexpr int64_t kParallelCutoff = 1 << 20;

template <typename F>
void split2(int64_t n, F f) {
  if (n < kParallelCutoff) {
    f(0, n);
    return;
  }
  int64_t mid = n / 2;
  std::thread t([&] { f(0, mid); });
  f(mid, n);
  t.join();
}
}  // namespace

extern "C" int64_t flock_min_i64(const int64_t* src, int64_t n) {
  int64_t mins[2] = {INT64_MAX, INT64_MAX};
  split2(n, [&](int64_t lo, int64_t hi) {
    int64_t m = INT64_MAX;
    for (int64_t i = lo; i < hi; ++i)
      if (src[i] < m) m = src[i];
    mins[lo == 0 ? 0 : 1] = m;
  });
  return mins[0] < mins[1] ? mins[0] : mins[1];
}

extern "C" void flock_stage_sub_i64_i32(const int64_t* src, int32_t* dst,
                                        int64_t n, int64_t cap,
                                        int64_t base) {
  split2(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      dst[i] = (int32_t)(src[i] - base);
  });
  if (cap > n) std::memset(dst + n, 0, (size_t)(cap - n) * 4);
}

extern "C" void flock_stage_copy(const void* src, void* dst, int64_t nbytes,
                                 int64_t cap_bytes) {
  const char* s = (const char*)src;
  char* d = (char*)dst;
  split2(nbytes, [&](int64_t lo, int64_t hi) {
    std::memcpy(d + lo, s + lo, (size_t)(hi - lo));
  });
  if (cap_bytes > nbytes)
    std::memset(d + nbytes, 0, (size_t)(cap_bytes - nbytes));
}
