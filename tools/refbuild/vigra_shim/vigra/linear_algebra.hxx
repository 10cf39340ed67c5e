// Shim for vigra::linalg — inverse / linearSolve / dot as used by the
// reference (sift.cpp:303-322, algorithms.cpp:153-178).
//
// Semantics mirrored from Vigra's documented behaviour:
//   * computations run in the element type (f32 here), like Vigra's
//     templated linear_solve.hxx;
//   * linearSolve uses Householder QR and returns false when a diagonal
//     element of R is exactly zero (rank deficiency); the result array is
//     NOT written on failure (MultiArray storage is value-initialized, so
//     the caller sees zeros — this drives vertexParabola's -0/0 = NaN,
//     algorithms.cpp:175-177, because the 3x3 system's third column is
//     identically zero and R(2,2) is therefore *exactly* 0);
//   * inverse solves A X = I by the same QR and likewise fails cleanly.
//
// This is the one part of the rebuilt reference whose *numerics* are a
// reimplementation (no Vigra in this environment): values can differ from
// real Vigra in final-ulp rounding, but the rank/failure decisions are
// structural (exact zeros), not numerical.

#ifndef VIGRA_SHIM_LINEAR_ALGEBRA_HXX
#define VIGRA_SHIM_LINEAR_ALGEBRA_HXX

#include <cmath>
#include <vector>

#include "matrix.hxx"

namespace vigra {
namespace linalg {

namespace detail {

// Householder QR of the n x n system [A | B] in float. Returns the
// transformed (R | Q^T B) in place. bcols = number of RHS columns.
inline void qr_inplace(std::vector<float>& a, std::vector<float>& b,
                       int n, int bcols) {
    // a: n*n column-major a[i + j*n] = A(i, j); b: n*bcols likewise.
    std::vector<float> v(static_cast<size_t>(n));
    for (int k = 0; k < n; ++k) {
        float norm2 = 0.0f;
        for (int i = k; i < n; ++i) norm2 += a[i + k * n] * a[i + k * n];
        float norm = std::sqrt(norm2);
        if (norm == 0.0f) continue;          // column already zero below k
        float akk = a[k + k * n];
        float alpha = akk >= 0.0f ? -norm : norm;
        // v = x - alpha e_k
        float vnorm2 = 0.0f;
        for (int i = k; i < n; ++i) {
            v[i] = a[i + k * n];
            if (i == k) v[i] -= alpha;
            vnorm2 += v[i] * v[i];
        }
        if (vnorm2 == 0.0f) continue;
        // Apply H = I - 2 v v^T / (v^T v) to A columns k..n-1 and to B.
        for (int j = k; j < n; ++j) {
            float s = 0.0f;
            for (int i = k; i < n; ++i) s += v[i] * a[i + j * n];
            s = 2.0f * s / vnorm2;
            for (int i = k; i < n; ++i) a[i + j * n] -= s * v[i];
        }
        for (int j = 0; j < bcols; ++j) {
            float s = 0.0f;
            for (int i = k; i < n; ++i) s += v[i] * b[i + j * n];
            s = 2.0f * s / vnorm2;
            for (int i = k; i < n; ++i) b[i + j * n] -= s * v[i];
        }
        a[k + k * n] = alpha;
        for (int i = k + 1; i < n; ++i) a[i + k * n] = 0.0f;
    }
}

template <class A>
void load_square(const A& m, std::vector<float>& a, int n) {
    a.resize(static_cast<size_t>(n) * n);
    for (int j = 0; j < n; ++j)
        for (int i = 0; i < n; ++i) a[i + j * n] = m(i, j);
}

}  // namespace detail

// Solve a * res = b. a: (n, n); b, res: (n, m). False iff rank-deficient
// (exact-zero R diagonal); res untouched on failure.
template <class A, class B, class C>
bool linearSolve(const A& a, const B& b, C& res) {
    const int n = static_cast<int>(a.width());
    const int m = static_cast<int>(b.height());
    std::vector<float> qa;
    detail::load_square(a, qa, n);
    std::vector<float> qb(static_cast<size_t>(n) * m);
    for (int j = 0; j < m; ++j)
        for (int i = 0; i < n; ++i) qb[i + j * n] = b(i, j);

    detail::qr_inplace(qa, qb, n, m);

    for (int k = 0; k < n; ++k)
        if (qa[k + k * n] == 0.0f) return false;   // singular: res untouched

    for (int j = 0; j < m; ++j) {
        for (int i = n - 1; i >= 0; --i) {
            float s = qb[i + j * n];
            for (int k = i + 1; k < n; ++k) s -= qa[i + k * n] * qb[k + j * n];
            qb[i + j * n] = s / qa[i + i * n];
        }
    }
    for (int j = 0; j < m; ++j)
        for (int i = 0; i < n; ++i) res(i, j) = qb[i + j * n];
    return true;
}

// res = a^-1 via QR solve against the identity; false iff singular.
template <class A, class B>
bool inverse(const A& a, B& res) {
    const int n = static_cast<int>(a.width());
    std::vector<float> qa;
    detail::load_square(a, qa, n);
    std::vector<float> qb(static_cast<size_t>(n) * n, 0.0f);
    for (int i = 0; i < n; ++i) qb[i + i * n] = 1.0f;

    detail::qr_inplace(qa, qb, n, n);
    for (int k = 0; k < n; ++k)
        if (qa[k + k * n] == 0.0f) return false;

    for (int j = 0; j < n; ++j) {
        for (int i = n - 1; i >= 0; --i) {
            float s = qb[i + j * n];
            for (int k = i + 1; k < n; ++k) s -= qa[i + k * n] * qb[k + j * n];
            qb[i + j * n] = s / qa[i + i * n];
        }
    }
    for (int j = 0; j < n; ++j)
        for (int i = 0; i < n; ++i) res(i, j) = qb[i + j * n];
    return true;
}

// Vector dot product: both arguments are 1 x n or n x 1.
template <class A, class B>
float dot(const A& a, const B& b) {
    float s = 0.0f;
    const MultiArrayIndex n = a.width() * a.height();
    for (MultiArrayIndex i = 0; i < n; ++i) {
        const float av = a.width() == 1 ? a(0, i) : a(i, 0);
        const float bv = b.width() == 1 ? b(0, i) : b(i, 0);
        s += av * bv;
    }
    return s;
}

}  // namespace linalg
}  // namespace vigra

#endif  // VIGRA_SHIM_LINEAR_ALGEBRA_HXX
