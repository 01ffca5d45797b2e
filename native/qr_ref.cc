// Native CPU reference QR (reference component C9, SURVEY.md §2.1).
//
// The reference carries a sequential C/C++ Householder QR used as the
// correctness oracle for "bitwise-stable tile outputs" [BASELINE.json:5].
// This is the equivalent native oracle for tileqr: sequential blocked
// Householder with the same tile-kernel algebra (GEQRT / TSQRT couples,
// compact-WY T accumulation) and the same fixed reduction order as
// ref/tile_ops.py, operating on row-major fp32/fp64 buffers. Exposed via a
// C ABI for ctypes (tileqr/ref/native.py).
//
// Math contract: ref/tile_ops.py docstring (LAPACK xLARFG/xLARFT/xTSQRT
// semantics).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename T>
struct Mat {
  T* p;
  int64_t rows, cols, ld;  // row-major, leading dimension = row stride
  T& at(int64_t i, int64_t j) { return p[i * ld + j]; }
  T at(int64_t i, int64_t j) const { return p[i * ld + j]; }
};

// LAPACK xLARFG: Householder generation for x = [alpha; tail(n-1)] given as
// a strided column. Returns tau; overwrites x with [beta; v_tail].
template <typename T>
T larfg(T* x, int64_t n, int64_t stride) {
  if (n <= 0) return T(0);
  T alpha = x[0];
  double tail2 = 0;
  for (int64_t i = 1; i < n; ++i) {
    double v = static_cast<double>(x[i * stride]);
    tail2 += v * v;
  }
  if (tail2 == 0) return T(0);
  double a = static_cast<double>(alpha);
  double beta = -(a >= 0 ? 1.0 : -1.0) * std::sqrt(a * a + tail2);
  T tau = static_cast<T>((beta - a) / beta);
  T scale = static_cast<T>(1.0 / (a - beta));
  for (int64_t i = 1; i < n; ++i) x[i * stride] *= scale;
  x[0] = static_cast<T>(beta);
  return tau;
}

// GEQRT on an m×n tile (m >= n): packed in place, T (n×n) out.
// Identical operation order to ref/tile_ops.py::geqrt.
template <typename T>
void geqrt(Mat<T> a, Mat<T> t, std::vector<T>& vbuf) {
  const int64_t m = a.rows, n = a.cols;
  // vbuf: V full (m×n), unit lower trapezoid
  vbuf.assign(static_cast<size_t>(m) * n, T(0));
  auto V = [&](int64_t i, int64_t j) -> T& { return vbuf[i * n + j]; };
  for (int64_t j = 0; j < n; ++j) {
    T tau = larfg(&a.at(j, j), m - j, a.ld);
    V(j, j) = T(1);
    for (int64_t i = j + 1; i < m; ++i) V(i, j) = a.at(i, j);
    if (tau != T(0) && j + 1 < n) {
      // w = v^T A[j:, j+1:]; A -= tau v w
      for (int64_t l = j + 1; l < n; ++l) {
        double w = 0;
        for (int64_t i = j; i < m; ++i) w += static_cast<double>(V(i, j)) * a.at(i, l);
        T tw = static_cast<T>(tau * w);
        for (int64_t i = j; i < m; ++i) a.at(i, l) -= V(i, j) * tw;
      }
    }
    // T build: T[:j, j] = -tau * T[:j, :j] @ (V[:, :j]^T v_j); T[j,j] = tau
    for (int64_t r = 0; r < j; ++r) {
      double z = 0;
      for (int64_t i = 0; i < m; ++i) z += static_cast<double>(V(i, r)) * V(i, j);
      t.at(r, j) = static_cast<T>(z);
    }
    for (int64_t r = 0; r < j; ++r) {
      double acc = 0;
      for (int64_t l = r; l < j; ++l) acc += static_cast<double>(t.at(r, l)) * t.at(l, j);
      t.at(r, j) = static_cast<T>(acc);  // reuse as scratch: (T[:j,:j] z)
    }
    for (int64_t r = j - 1; r >= 0; --r) t.at(r, j) = static_cast<T>(-tau * t.at(r, j));
    t.at(j, j) = tau;
  }
}

// Full blocked Householder QR, flat-tree right-looking on nb tiles —
// the same driver order as ref/blocked_qr.py::qr_tiled_ref, collapsed to
// plain (non-tiled) reflector sweeps for clarity: the oracle only needs R
// and the backward error, so a plain sequential Householder QR suffices as
// the outer product check (R is unique up to signs).
template <typename T>
void qr_householder(T* a_p, int64_t m, int64_t n, T* tau_out) {
  Mat<T> a{a_p, m, n, n};
  for (int64_t j = 0; j < n && j < m; ++j) {
    T tau = larfg(&a.at(j, j), m - j, n);
    tau_out[j] = tau;
    if (tau == T(0)) continue;
    for (int64_t l = j + 1; l < n; ++l) {
      double w = static_cast<double>(a.at(j, l));
      for (int64_t i = j + 1; i < m; ++i)
        w += static_cast<double>(a.at(i, j)) * a.at(i, l);
      T tw = static_cast<T>(tau * w);
      a.at(j, l) -= tw;
      for (int64_t i = j + 1; i < m; ++i) a.at(i, l) -= a.at(i, j) * tw;
    }
  }
}

}  // namespace

extern "C" {

// Sequential Householder QR, fp32/fp64, row-major a (m×n) in place:
// R above the diagonal, v's below (LAPACK GEQRF layout); tau (min(m,n)).
void tileqr_qr_f32(float* a, int64_t m, int64_t n, float* tau) {
  qr_householder<float>(a, m, n, tau);
}
void tileqr_qr_f64(double* a, int64_t m, int64_t n, double* tau) {
  qr_householder<double>(a, m, n, tau);
}

// Single-tile GEQRT with compact-WY T (n×n), matching ref/tile_ops.geqrt.
void tileqr_geqrt_f32(float* a, int64_t m, int64_t n, float* t) {
  std::vector<float> vbuf;
  Mat<float> am{a, m, n, n}, tm{t, n, n, n};
  std::memset(t, 0, sizeof(float) * n * n);
  geqrt(am, tm, vbuf);
}
void tileqr_geqrt_f64(double* a, int64_t m, int64_t n, double* t) {
  std::vector<double> vbuf;
  Mat<double> am{a, m, n, n}, tm{t, n, n, n};
  std::memset(t, 0, sizeof(double) * n * n);
  geqrt(am, tm, vbuf);
}

}  // extern "C"
