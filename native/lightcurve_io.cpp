// Native batched light-curve packing / container IO.
//
// Role: the data-loader tier for pod-scale batches (BASELINE.json
// configs[4]: 10k light curves x sharded chains).  Ragged per-curve arrays
// are packed into padded (B, Nmax) matrices with a validity mask —
// multithreaded, since at 10k+ curves the pure-Python loop is the
// bottleneck, and the padded layout is what vmap/shard_map consume.
//
// The .lcb container format (written by celerite_tpu.data.save_lcb):
//   [0:4)   magic "CTLC"
//   [4:8)   uint32 version (1)
//   [8:16)  int64 n_curves
//   then per curve: int64 length, followed by float64 t[len], y[len],
//   yerr[len].  Reading is a single mmap-friendly sweep; this file
//   provides the packing kernel, Python handles the (trivial) framing.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Pack ragged data into padded row-major (B, nmax) outputs.
// src: concatenated values; offsets: (B+1) prefix offsets into src;
// fill: value for padding. nthreads <= 0 selects hardware concurrency.
void lc_pack(int64_t n_curves, int64_t nmax, const double* src,
             const int64_t* offsets, double fill, double* out,
             int nthreads) {
  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 1;
  }
  nthreads = std::min<int64_t>(nthreads, std::max<int64_t>(n_curves, 1));

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const int64_t len = offsets[b + 1] - offsets[b];
      double* row = out + b * nmax;
      std::memcpy(row, src + offsets[b], len * sizeof(double));
      std::fill(row + len, row + nmax, fill);
    }
  };

  std::vector<std::thread> threads;
  const int64_t chunk = (n_curves + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, n_curves);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Pack-with-edge-repeat: pads each row by repeating its last value
// (keeps padded time stamps sorted so dt >= 0 in the lowering).
void lc_pack_repeat(int64_t n_curves, int64_t nmax, const double* src,
                    const int64_t* offsets, double* out, int nthreads) {
  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 1;
  }
  nthreads = std::min<int64_t>(nthreads, std::max<int64_t>(n_curves, 1));

  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const int64_t len = offsets[b + 1] - offsets[b];
      double* row = out + b * nmax;
      std::memcpy(row, src + offsets[b], len * sizeof(double));
      const double edge = len > 0 ? row[len - 1] : 0.0;
      std::fill(row + len, row + nmax, edge);
    }
  };

  std::vector<std::thread> threads;
  const int64_t chunk = (n_curves + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, n_curves);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

int lc_abi_version() { return 1; }

}  // extern "C"
