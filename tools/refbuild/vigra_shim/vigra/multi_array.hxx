// Minimal Vigra-compatible shim: just enough of vigra::MultiArray<2, T> for
// the reference sources (/root/reference/sift.cpp, algorithms.cpp) to
// compile unmodified. This is NOT Vigra; it reimplements the documented
// semantics the reference relies on:
//
//   * MultiArray<2,T>: dim0 = x (stride 1), dim1 = y (stride = width);
//     value-initialized storage (zeros for f32); deep-copy on
//     construction/assignment from arrays AND views.
//   * MultiArrayView<2,T>: non-owning view; subarray(ul, lr) is the
//     END-EXCLUSIVE window [ul, lr) into the parent's storage — writes
//     through a view mutate the parent (the descriptor stage depends on
//     this: sift.cpp:74-92).
//   * Shape2: 2-element index vector.
//
// Anything Vigra offers beyond what the reference touches is omitted.

#ifndef VIGRA_SHIM_MULTI_ARRAY_HXX
#define VIGRA_SHIM_MULTI_ARRAY_HXX

#include <cassert>
#include <cstddef>
#include <vector>

namespace vigra {

using MultiArrayIndex = std::ptrdiff_t;

class Shape2 {
  public:
    MultiArrayIndex v[2];
    Shape2() : v{0, 0} {}
    Shape2(MultiArrayIndex x, MultiArrayIndex y) : v{x, y} {}
    MultiArrayIndex& operator[](unsigned i) { return v[i]; }
    MultiArrayIndex operator[](unsigned i) const { return v[i]; }
    bool operator==(const Shape2& o) const {
        return v[0] == o.v[0] && v[1] == o.v[1];
    }
};

template <unsigned int N, class T>
class MultiArrayView;

template <unsigned int N, class T>
class MultiArray;

// ------------------------------------------------------------------ view
template <class T>
class MultiArrayView<2, T> {
  protected:
    T* data_ = nullptr;
    MultiArrayIndex w_ = 0, h_ = 0;
    MultiArrayIndex stride_y_ = 0;   // stride of dim1; dim0 stride is 1

  public:
    MultiArrayView() = default;
    MultiArrayView(T* data, MultiArrayIndex w, MultiArrayIndex h,
                   MultiArrayIndex stride_y)
        : data_(data), w_(w), h_(h), stride_y_(stride_y) {}

    MultiArrayIndex width() const { return w_; }
    MultiArrayIndex height() const { return h_; }
    Shape2 shape() const { return Shape2(w_, h_); }
    MultiArrayIndex shape(unsigned i) const { return i == 0 ? w_ : h_; }
    MultiArrayIndex size() const { return w_ * h_; }

    T& operator()(MultiArrayIndex x, MultiArrayIndex y) {
        assert(x >= 0 && x < w_ && y >= 0 && y < h_);
        return data_[x + y * stride_y_];
    }
    const T& operator()(MultiArrayIndex x, MultiArrayIndex y) const {
        assert(x >= 0 && x < w_ && y >= 0 && y < h_);
        return data_[x + y * stride_y_];
    }

    // End-exclusive window [ul, lr) sharing the parent's storage. The
    // reference's extrema detector passes lr = (x+1, y+1), making the
    // "3x3 neighborhood" actually 2x2 — that quirk lives HERE, in the
    // subarray convention, exactly as in Vigra.
    MultiArrayView<2, T> subarray(const Shape2& ul, const Shape2& lr) {
        return MultiArrayView<2, T>(data_ + ul[0] + ul[1] * stride_y_,
                                    lr[0] - ul[0], lr[1] - ul[1], stride_y_);
    }
    MultiArrayView<2, const T> subarray(const Shape2& ul,
                                        const Shape2& lr) const {
        return MultiArrayView<2, const T>(
            data_ + ul[0] + ul[1] * stride_y_,
            lr[0] - ul[0], lr[1] - ul[1], stride_y_);
    }

    const T* rawData() const { return data_; }
    MultiArrayIndex strideY() const { return stride_y_; }
};

// ----------------------------------------------------------------- array
template <class T>
class MultiArray<2, T> : public MultiArrayView<2, T> {
    std::vector<T> store_;

    void rebind() {
        this->data_ = store_.data();
        this->stride_y_ = this->w_;
    }

  public:
    MultiArray() = default;

    explicit MultiArray(const Shape2& s)
        : store_(static_cast<size_t>(s[0] * s[1])) {   // value-init: zeros
        this->w_ = s[0];
        this->h_ = s[1];
        rebind();
    }

    MultiArray(const MultiArray& o) : store_(o.store_) {
        this->w_ = o.w_;
        this->h_ = o.h_;
        rebind();
    }

    // Deep copy from any view (possibly strided) — this is the implicit
    // conversion the reference uses when passing subarray views to
    // functions taking `const MultiArray&` (e.g. convolveWithGauss at
    // sift.cpp:184) and when copying views into locals (sift.cpp:185-189).
    MultiArray(const MultiArrayView<2, T>& o)
        : store_(static_cast<size_t>(o.width() * o.height())) {
        this->w_ = o.width();
        this->h_ = o.height();
        rebind();
        for (MultiArrayIndex y = 0; y < this->h_; ++y)
            for (MultiArrayIndex x = 0; x < this->w_; ++x)
                (*this)(x, y) = o(x, y);
    }
    MultiArray(const MultiArrayView<2, const T>& o)
        : store_(static_cast<size_t>(o.width() * o.height())) {
        this->w_ = o.width();
        this->h_ = o.height();
        rebind();
        for (MultiArrayIndex y = 0; y < this->h_; ++y)
            for (MultiArrayIndex x = 0; x < this->w_; ++x)
                (*this)(x, y) = o(x, y);
    }

    MultiArray& operator=(const MultiArray& o) {
        if (this != &o) {
            store_ = o.store_;
            this->w_ = o.w_;
            this->h_ = o.h_;
            rebind();
        }
        return *this;
    }

    MultiArray(MultiArray&& o) noexcept : store_(std::move(o.store_)) {
        this->w_ = o.w_;
        this->h_ = o.h_;
        rebind();
    }
    MultiArray& operator=(MultiArray&& o) noexcept {
        store_ = std::move(o.store_);
        this->w_ = o.w_;
        this->h_ = o.h_;
        rebind();
        return *this;
    }
};

}  // namespace vigra

#endif  // VIGRA_SHIM_MULTI_ARRAY_HXX
