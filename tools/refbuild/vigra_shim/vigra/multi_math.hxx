// Shim for vigra::multi_math — only the `any(view > scalar)` /
// `any(view < scalar)` expressions used by the reference's extrema scan
// (/root/reference/sift.cpp:356-372). Comparisons with NaN follow IEEE
// (always false), as in Vigra's elementwise expression templates.

#ifndef VIGRA_SHIM_MULTI_MATH_HXX
#define VIGRA_SHIM_MULTI_MATH_HXX

#include "multi_array.hxx"

namespace vigra {
namespace multi_math {

struct AnyExpr {
    bool value;
};

template <class T, class S>
AnyExpr operator>(const MultiArrayView<2, T>& a, S s) {
    for (MultiArrayIndex y = 0; y < a.height(); ++y)
        for (MultiArrayIndex x = 0; x < a.width(); ++x)
            if (a(x, y) > s) return {true};
    return {false};
}

template <class T, class S>
AnyExpr operator<(const MultiArrayView<2, T>& a, S s) {
    for (MultiArrayIndex y = 0; y < a.height(); ++y)
        for (MultiArrayIndex x = 0; x < a.width(); ++x)
            if (a(x, y) < s) return {true};
    return {false};
}

inline bool any(const AnyExpr& e) { return e.value; }

}  // namespace multi_math
}  // namespace vigra

#endif  // VIGRA_SHIM_MULTI_MATH_HXX
