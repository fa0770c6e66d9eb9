// Native CPU core for celerite_tpu: semiseparable factor/solve kernels.
//
// Role (mirrors the reference's header-only C++ layer,
// /root/reference/cpp/include/celerite/solver/cholesky.h, but a different
// design): the reference builds the (U, V, phi) representation row-by-row
// from kernel coefficients inside its loops; here the Python layer lowers
// terms to dense (N, P) arrays once (celerite_tpu.ops.lower) and this file
// implements only the recursions on those arrays, with a flat C ABI loaded
// via ctypes (no pybind11 dependency in this environment).
//
// Used as (a) a JAX-independent parity oracle in tests, and (b) a
// low-latency eager-CPU path for small problems where XLA dispatch
// overhead dominates.
//
// All matrices are row-major; U, V, phi are (n, p); A, D, y are (n,).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Factor K = L D L^T.  Writes D (n) and W (n, p).
// Returns 0 on success, 1 if a non-positive pivot was hit (index of the
// first bad pivot is written to *bad_index when non-null).
int ct_factor(int64_t n, int64_t p, const double* U, const double* V,
              const double* phi, const double* A, double* D, double* W,
              int64_t* bad_index) {
  std::vector<double> S(p * p, 0.0);
  double d_prev = 0.0;
  std::vector<double> w_prev(p, 0.0), su(p);

  for (int64_t i = 0; i < n; ++i) {
    const double* u = U + i * p;
    const double* v = V + i * p;
    const double* ph = phi + i * p;
    double* w = W + i * p;

    // S <- (phi phi^T) o (S + d_prev * w_prev w_prev^T)
    for (int64_t j = 0; j < p; ++j) {
      const double pj = ph[j];
      const double xj = d_prev * w_prev[j];
      double* Sj = S.data() + j * p;
      for (int64_t k = 0; k <= j; ++k) {
        const double val = pj * ph[k] * (Sj[k] + xj * w_prev[k]);
        Sj[k] = val;
        S[k * p + j] = val;
      }
    }

    // su = S u ; d = A - u.su ; w = (v - su) / d
    double d = A[i];
    for (int64_t j = 0; j < p; ++j) {
      double acc = 0.0;
      const double* Sj = S.data() + j * p;
      for (int64_t k = 0; k < p; ++k) acc += Sj[k] * u[k];
      su[j] = acc;
      d -= u[j] * acc;
    }
    if (!(d > 0.0)) {
      if (bad_index) *bad_index = i;
      return 1;
    }
    const double inv_d = 1.0 / d;
    for (int64_t j = 0; j < p; ++j) w[j] = (v[j] - su[j]) * inv_d;

    D[i] = d;
    d_prev = d;
    std::memcpy(w_prev.data(), w, p * sizeof(double));
  }
  return 0;
}

// Fused factor + forward substitution + reductions: the log-likelihood
// hot path.  Writes {quad, logdet} to out[0..1].  Returns 0/1 like
// ct_factor.  Does not materialize D/W.
int ct_loglike(int64_t n, int64_t p, const double* U, const double* V,
               const double* phi, const double* A, const double* y,
               double* out) {
  std::vector<double> S(p * p, 0.0), w(p, 0.0), w_prev(p, 0.0), su(p),
      f(p, 0.0);
  double d_prev = 0.0, z_prev = 0.0, quad = 0.0, logdet = 0.0;

  for (int64_t i = 0; i < n; ++i) {
    const double* u = U + i * p;
    const double* v = V + i * p;
    const double* ph = phi + i * p;

    for (int64_t j = 0; j < p; ++j) {
      const double pj = ph[j];
      const double xj = d_prev * w_prev[j];
      double* Sj = S.data() + j * p;
      for (int64_t k = 0; k <= j; ++k) {
        const double val = pj * ph[k] * (Sj[k] + xj * w_prev[k]);
        Sj[k] = val;
        S[k * p + j] = val;
      }
    }

    double d = A[i], z = y[i];
    for (int64_t j = 0; j < p; ++j) {
      double acc = 0.0;
      const double* Sj = S.data() + j * p;
      for (int64_t k = 0; k < p; ++k) acc += Sj[k] * u[k];
      su[j] = acc;
      d -= u[j] * acc;
      // forward substitution interleaved
      f[j] = ph[j] * (f[j] + w_prev[j] * z_prev);
      z -= u[j] * f[j];
    }
    if (!(d > 0.0)) return 1;
    const double inv_d = 1.0 / d;
    for (int64_t j = 0; j < p; ++j) w[j] = (v[j] - su[j]) * inv_d;

    quad += z * z * inv_d;
    logdet += std::log(d);
    d_prev = d;
    z_prev = z;
    std::swap(w, w_prev);
  }
  out[0] = quad;
  out[1] = logdet;
  return 0;
}

// Solve K x = y given the factor (D, W); x may alias y.
void ct_solve(int64_t n, int64_t p, const double* U, const double* phi,
              const double* W, const double* D, const double* y,
              double* x) {
  std::vector<double> f(p, 0.0);
  // Forward: L z = y.
  double prev = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double* u = U + i * p;
    const double* ph = phi + i * p;
    const double* wp = (i > 0) ? W + (i - 1) * p : nullptr;
    double z = y[i];
    for (int64_t j = 0; j < p; ++j) {
      f[j] = ph[j] * (f[j] + (wp ? wp[j] * prev : 0.0));
      z -= u[j] * f[j];
    }
    x[i] = z;
    prev = z;
  }
  // Scale by D^{-1}.
  for (int64_t i = 0; i < n; ++i) x[i] /= D[i];
  // Backward: L^T out = z'.
  std::fill(f.begin(), f.end(), 0.0);
  double next = 0.0;
  for (int64_t i = n - 1; i >= 0; --i) {
    const double* w = W + i * p;
    const double* phn = (i + 1 < n) ? phi + (i + 1) * p : nullptr;
    const double* un = (i + 1 < n) ? U + (i + 1) * p : nullptr;
    double v = x[i];
    for (int64_t j = 0; j < p; ++j) {
      const double pj = phn ? phn[j] : 0.0;
      const double uj = un ? un[j] : 0.0;
      f[j] = pj * (f[j] + uj * next);
      v -= w[j] * f[j];
    }
    x[i] = v;
    next = v;
  }
}

// y = L sqrt(D) z (prior sampling transport).
void ct_dot_l(int64_t n, int64_t p, const double* U, const double* phi,
              const double* W, const double* D, const double* z,
              double* y) {
  std::vector<double> f(p, 0.0);
  double prev = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double* u = U + i * p;
    const double* ph = phi + i * p;
    const double* wp = (i > 0) ? W + (i - 1) * p : nullptr;
    const double ti = std::sqrt(D[i]) * z[i];
    double acc = ti;
    for (int64_t j = 0; j < p; ++j) {
      f[j] = ph[j] * (f[j] + (wp ? wp[j] * prev : 0.0));
      acc += u[j] * f[j];
    }
    y[i] = acc;
    prev = ti;
  }
}

// y = K z without factorizing; A must hold the intended diagonal.
void ct_matmul(int64_t n, int64_t p, const double* U, const double* V,
               const double* phi, const double* A, const double* z,
               double* y) {
  std::vector<double> f(p, 0.0);
  // Lower triangle (forward).
  double prev = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double* u = U + i * p;
    const double* ph = phi + i * p;
    const double* vp = (i > 0) ? V + (i - 1) * p : nullptr;
    double acc = A[i] * z[i];
    for (int64_t j = 0; j < p; ++j) {
      f[j] = ph[j] * (f[j] + (vp ? vp[j] * prev : 0.0));
      acc += u[j] * f[j];
    }
    y[i] = acc;
    prev = z[i];
  }
  // Upper triangle (backward).
  std::fill(f.begin(), f.end(), 0.0);
  double next = 0.0;
  for (int64_t i = n - 1; i >= 0; --i) {
    const double* v = V + i * p;
    const double* phn = (i + 1 < n) ? phi + (i + 1) * p : nullptr;
    const double* un = (i + 1 < n) ? U + (i + 1) * p : nullptr;
    double acc = 0.0;
    for (int64_t j = 0; j < p; ++j) {
      const double pj = phn ? phn[j] : 0.0;
      const double uj = un ? un[j] : 0.0;
      f[j] = pj * (f[j] + uj * next);
      acc += v[j] * f[j];
    }
    y[i] += acc;
    next = z[i];
  }
}

int ct_abi_version() { return 1; }

}  // extern "C"
