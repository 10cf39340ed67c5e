// Shim for vigra::Matrix<T> (vigra/matrix.hxx): a 2-D array with
// (row, column) access. In Vigra, Matrix is a MultiArray<2,T> in
// column-major storage where operator()(i, j) addresses row i / column j —
// which coincides exactly with the shim MultiArray's (x, y) indexing
// (dim0 stride 1). The reference only builds 3x3 / 3x1 matrices
// (algorithms.cpp:66-106, 153-178) and uses transpose() and *= scalar
// (sift.cpp:300-322).

#ifndef VIGRA_SHIM_MATRIX_HXX
#define VIGRA_SHIM_MATRIX_HXX

#include "multi_array.hxx"

namespace vigra {

template <class T>
class Matrix : public MultiArray<2, T> {
  public:
    Matrix() = default;
    explicit Matrix(const Shape2& s) : MultiArray<2, T>(s) {}
    Matrix(const Matrix& o) = default;
    Matrix& operator=(const Matrix& o) = default;
    Matrix(const MultiArray<2, T>& o) : MultiArray<2, T>(o) {}
    Matrix(const MultiArrayView<2, T>& o) : MultiArray<2, T>(o) {}

    MultiArrayIndex rowCount() const { return this->width(); }
    MultiArrayIndex columnCount() const { return this->height(); }

    Matrix transpose() const {
        Matrix r{Shape2(this->height(), this->width())};
        for (MultiArrayIndex j = 0; j < this->height(); ++j)
            for (MultiArrayIndex i = 0; i < this->width(); ++i)
                r(j, i) = (*this)(i, j);
        return r;
    }

    Matrix& operator*=(T s) {
        for (MultiArrayIndex j = 0; j < this->height(); ++j)
            for (MultiArrayIndex i = 0; i < this->width(); ++i)
                (*this)(i, j) *= s;
        return *this;
    }
};

}  // namespace vigra

#endif  // VIGRA_SHIM_MATRIX_HXX
