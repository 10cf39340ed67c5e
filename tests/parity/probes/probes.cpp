// Dependency-free C++ probes pinning the language/stdlib semantics that
// sift_tpu/oracle/refsim.py *assumes* about the reference C++
// (/root/reference/sift.cpp, algorithms.cpp). Compiled with the local g++
// (same target: x86-64 Linux, libstdc++) by tests/parity/test_probes.py,
// which asserts each printed result against refsim's decision.
//
// Each probe reproduces the exact expression/idiom from the reference:
//   1. float->u16 histogram binning with NaN input   (algorithms.cpp:127-128,
//      144-145: `u16_t i = std::floor(orient / w); i = i % fold;`)
//   2. std::set<f32_t> NaN insertion collapse        (sift.cpp:192-200,
//      _findPeaks returns std::set<f32_t>; all peaks are NaN in practice)
//   3. `peaks.begin()++` post-increment of temporary (sift.cpp:195: the
//      loop starts at the FIRST element, duplicating the first peak)
//   4. -0.0f / 0.0f                                  (algorithms.cpp:177:
//      vertexParabola's `-res(1,0) / (2 * res(0,0))` with res zero-init)
//   5. std::sort with cmpByFilter partition order    (sift.cpp:37,
//      interestpoint.hpp cmpByFilter: introsort is NOT stable - prints the
//      resulting permutation for a fixed input so the non-stability the
//      parity layer must not depend on is on record)
//   6. fmod(atan2(y,x) + 360, 360) value range       (algorithms.cpp:114-115:
//      radians-as-degrees, results in [0,pi] U [360-pi, 360))
//
// Output: one `key=value` line per probe, parsed by the pytest.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <limits>
#include <set>
#include <vector>

using u16_t = unsigned short int;  // types.hpp:6
using f32_t = float;               // types.hpp:13

int main() {
    // ---- probe 1: NaN float -> u16 binning ------------------------------
    {
        // volatile: the reference's orientation values are runtime data, so
        // the conversion must use the runtime x86 semantics (cvttss2si ->
        // 0x80000000 for NaN/Inf/overflow), not gcc's compile-time constant
        // folding (which clamps differently: +Inf folds to 65535).
        volatile f32_t nan = std::numeric_limits<f32_t>::quiet_NaN();
        volatile f32_t inf = std::numeric_limits<f32_t>::infinity();
        volatile f32_t deg719 = 719.0f;
        // exact expression shape from orientationHistogram36/8
        u16_t i36 = std::floor(nan / 10);  // NOLINT: intentional UB probe
        i36 = i36 % 35;
        u16_t i8 = std::floor(nan / 45);
        i8 = i8 % 7;
        u16_t iinf = std::floor(inf / 45);
        iinf = iinf % 7;
        // A large *finite* orientation (360 - pi scaled values stay < 360,
        // but mutated orientations can reach ~720): sanity-check wrap.
        u16_t i719 = std::floor(deg719 / 45);
        i719 = i719 % 7;
        std::printf("nan_bin36=%u\n", static_cast<unsigned>(i36));
        std::printf("nan_bin8=%u\n", static_cast<unsigned>(i8));
        std::printf("inf_bin8=%u\n", static_cast<unsigned>(iinf));
        std::printf("deg719_bin8=%u\n", static_cast<unsigned>(i719));
    }

    // ---- probe 2: std::set<f32_t> NaN collapse --------------------------
    {
        std::set<f32_t> s;
        const f32_t nan = std::numeric_limits<f32_t>::quiet_NaN();
        s.emplace(nan);
        s.emplace(nan);      // NaN < NaN is false both ways -> "equivalent"
        s.emplace(nan);
        std::printf("set_nan_size=%zu\n", s.size());
        std::printf("set_nan_front_isnan=%d\n",
                    std::isnan(*s.begin()) ? 1 : 0);
        // Mixed: a NaN inserted into a NON-empty set compares "equivalent"
        // to whatever element it meets first (NaN < x and x < NaN are both
        // false), so it is REJECTED — {1.0, NaN, 2.0, NaN} keeps only the
        // finite values. In the reference the set always starts with a NaN
        // (every vertexParabola is NaN), so the set is exactly {NaN}.
        std::set<f32_t> m;
        m.emplace(1.0f);
        m.emplace(nan);
        m.emplace(2.0f);
        m.emplace(nan);
        std::printf("set_mixed_size=%zu\n", m.size());
    }

    // ---- probe 3: peaks.begin()++ --------------------------------------
    {
        std::set<f32_t> peaks{10.0f, 20.0f, 30.0f};
        // sift.cpp:195: `for (auto iter = peaks.begin()++; ...)`
        // post-increment of the *temporary* returned by begin(): iter is the
        // pre-increment value == begin(), so the first element is visited
        // again (duplicated as an "additional" orientation).
        std::vector<f32_t> visited;
        for (auto iter = peaks.begin()++; iter != peaks.end(); iter++)
            visited.push_back(*iter);
        std::printf("beginpp_count=%zu\n", visited.size());
        std::printf("beginpp_first=%g\n",
                    static_cast<double>(visited.empty() ? -1.0f : visited[0]));
    }

    // ---- probe 4: -0.0f / 0.0f -----------------------------------------
    {
        f32_t res00 = 0.0f;   // vigra MultiArray value-initializes to 0
        f32_t res10 = 0.0f;
        f32_t vertex = -res10 / (2 * res00);
        std::printf("neg0_div_0_isnan=%d\n", std::isnan(vertex) ? 1 : 0);
    }

    // ---- probe 5: std::sort partition (cmpByFilter) --------------------
    {
        struct IP { int id; bool filtered; };
        auto cmpByFilter = [](const IP& a, const IP& b) {
            return !a.filtered && b.filtered;   // interestpoint.hpp:55-60
        };
        // 20 points, alternating filtered flags; ids record input order.
        std::vector<IP> v;
        for (int i = 0; i < 20; i++) v.push_back({i, (i % 2) == 1});
        std::sort(v.begin(), v.end(), cmpByFilter);
        std::printf("sort_perm=");
        for (size_t i = 0; i < v.size(); i++)
            std::printf("%d%s", v[i].id, i + 1 < v.size() ? "," : "\n");
        bool partitioned = true;
        bool seen_filtered = false;
        for (const auto& p : v) {
            if (p.filtered) seen_filtered = true;
            else if (seen_filtered) partitioned = false;
        }
        std::printf("sort_partitioned=%d\n", partitioned ? 1 : 0);
        // Is the unfiltered prefix in input order (i.e. accidentally
        // stable)? The parity layer must NOT rely on this being 1.
        bool prefix_stable = true;
        int last = -1;
        for (const auto& p : v) {
            if (p.filtered) break;
            if (p.id < last) prefix_stable = false;
            last = p.id;
        }
        std::printf("sort_prefix_stable=%d\n", prefix_stable ? 1 : 0);
    }

    // ---- probe 6: radians-as-degrees fmod range ------------------------
    {
        // gradientOrientation: fmod(atan2(dy,dx) + 360, 360) where atan2 is
        // RADIANS in [-pi, pi] -> values in [0, pi] U [360-pi, 360).
        f32_t lo = std::fmod(std::atan2(0.0f, 1.0f) + 360, 360);     // 0
        f32_t hi = std::fmod(std::atan2(0.0f, -1.0f) + 360, 360);    // pi
        f32_t neg = std::fmod(std::atan2(-1.0f, 0.0f) + 360, 360);   // 360-pi/2
        std::printf("orient_zero=%.6f\n", static_cast<double>(lo));
        std::printf("orient_pi=%.6f\n", static_cast<double>(hi));
        std::printf("orient_neg=%.6f\n", static_cast<double>(neg));
    }

    return 0;
}
