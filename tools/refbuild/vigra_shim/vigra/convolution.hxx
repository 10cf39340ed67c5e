// Shim for vigra's separable convolution + nearest-neighbour resize, as
// used by the reference (algorithms.cpp:10-49).
//
// Semantics mirrored from Vigra:
//   * Kernel1D<T>::initGaussian(sigma): sampled Gaussian, radius
//     round(3*sigma) (Vigra: int(3.0*std_dev + 0.5)), normalized to sum 1,
//     computed and stored in T (f32 here).
//   * separableConvolveX/Y: correlation with the symmetric kernel; the
//     default border treatment is BORDER_TREATMENT_REFLECT — mirror about
//     the edge pixel WITHOUT repeating it (scipy.ndimage "mirror"),
//     accumulation in T.
//   * resizeImageNoInterpolation: destination pixel i samples source index
//     round(i * (s-1)/(d-1)) (the rational mapping both refsim and the
//     parity path model; d == 1 maps to source 0).
//
// These are the modeled-not-compiled parts of the rebuild (no Vigra in
// this environment); they match refsim's oracles, which are themselves
// scipy-checked, so the rebuilt binary pins the C++ *logic* while the
// image math follows the documented Vigra conventions.

#ifndef VIGRA_SHIM_CONVOLUTION_HXX
#define VIGRA_SHIM_CONVOLUTION_HXX

#include <cmath>
#include <vector>

#include "multi_array.hxx"

namespace vigra {

template <class T>
class Kernel1D {
  public:
    std::vector<T> weights;   // [-radius, radius]
    int radius = 0;

    void initGaussian(T std_dev) {
        if (std_dev > 0.0) {
            radius = static_cast<int>(3.0 * std_dev + 0.5);
            weights.assign(2 * radius + 1, T(0));
            T sum = T(0);
            const T norm = T(1) / (std_dev * std::sqrt(T(2) * T(M_PI)));
            for (int i = -radius; i <= radius; ++i) {
                const T x = T(i);
                const T w =
                    norm * std::exp(-x * x / (T(2) * std_dev * std_dev));
                weights[i + radius] = w;
                sum += w;
            }
            for (auto& w : weights) w /= sum;
        } else {
            radius = 0;
            weights.assign(1, T(1));
        }
    }
};

namespace detail {
inline MultiArrayIndex reflect(MultiArrayIndex i, MultiArrayIndex n) {
    // Mirror about the edge pixels, edge not repeated: -1 -> 1, n -> n-2.
    while (i < 0 || i >= n) {
        if (i < 0) i = -i;
        if (i >= n) i = 2 * (n - 1) - i;
    }
    return i;
}
}  // namespace detail

template <class T>
void separableConvolveX(const MultiArrayView<2, T>& src,
                        MultiArrayView<2, T>& dest,
                        const Kernel1D<T>& k) {
    const MultiArrayIndex w = src.width(), h = src.height();
    for (MultiArrayIndex y = 0; y < h; ++y)
        for (MultiArrayIndex x = 0; x < w; ++x) {
            T acc = T(0);
            for (int t = -k.radius; t <= k.radius; ++t)
                acc += k.weights[t + k.radius] *
                       src(detail::reflect(x + t, w), y);
            dest(x, y) = acc;
        }
}

template <class T>
void separableConvolveY(const MultiArrayView<2, T>& src,
                        MultiArrayView<2, T>& dest,
                        const Kernel1D<T>& k) {
    const MultiArrayIndex w = src.width(), h = src.height();
    for (MultiArrayIndex y = 0; y < h; ++y)
        for (MultiArrayIndex x = 0; x < w; ++x) {
            T acc = T(0);
            for (int t = -k.radius; t <= k.radius; ++t)
                acc += k.weights[t + k.radius] *
                       src(x, detail::reflect(y + t, h));
            dest(x, y) = acc;
        }
}

template <class T>
void resizeImageNoInterpolation(const MultiArrayView<2, T>& src,
                                MultiArrayView<2, T>& dest) {
    const MultiArrayIndex sw = src.width(), sh = src.height();
    const MultiArrayIndex dw = dest.width(), dh = dest.height();
    auto map = [](MultiArrayIndex i, MultiArrayIndex s, MultiArrayIndex d) {
        if (d == 1) return static_cast<MultiArrayIndex>(0);
        const double r = static_cast<double>(s - 1) / static_cast<double>(d - 1);
        MultiArrayIndex j = static_cast<MultiArrayIndex>(i * r + 0.5);
        return j >= s ? s - 1 : j;
    };
    for (MultiArrayIndex y = 0; y < dh; ++y)
        for (MultiArrayIndex x = 0; x < dw; ++x)
            dest(x, y) = src(map(x, sw, dw), map(y, sh, dh));
}

}  // namespace vigra

#endif  // VIGRA_SHIM_CONVOLUTION_HXX
