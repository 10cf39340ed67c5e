// Boost/OpenCV-free driver for the rebuilt reference SIFT.
//
// Replaces /root/reference/main.cpp (whose only roles are CLI parsing,
// image import, and visualization) so the *algorithm* translation units —
// the unmodified /root/reference/sift.cpp and algorithms.cpp, compiled
// against the Vigra shim in vigra_shim/ — can run in this environment.
//
// Input:  raw frame file: int32 w, int32 h, then w*h float32 values in
//         row-major [y][x] order (values 0..255, like vigra::importImage's
//         grayscale f32 output that main.cpp:52-54 feeds to calculate()).
// Output: one line per surviving keypoint:
//         x y octave index scale orientation d0 ... d127
//         printed with %.9g; NaN prints as "nan".
//
// Usage: ref_driver <frame.raw> <out.txt> [sigma k octaves dogs subpixel]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <vigra/multi_array.hxx>

#include "sift.hpp"
#include "interestpoint.hpp"

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s frame.raw out.txt "
                             "[sigma k octaves dogs subpixel]\n", argv[0]);
        return 2;
    }
    f32_t sigma = argc > 3 ? std::strtof(argv[3], nullptr) : 1.6f;
    f32_t k = argc > 4 ? std::strtof(argv[4], nullptr)
                       : static_cast<f32_t>(std::sqrt(2.0));
    u16_t octaves = argc > 5 ? static_cast<u16_t>(std::atoi(argv[5])) : 4;
    u16_t dogs = argc > 6 ? static_cast<u16_t>(std::atoi(argv[6])) : 3;
    bool subpixel = argc > 7 ? std::atoi(argv[7]) != 0 : false;

    FILE* fp = std::fopen(argv[1], "rb");
    if (!fp) {
        std::fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }
    int32_t w = 0, h = 0;
    if (std::fread(&w, 4, 1, fp) != 1 || std::fread(&h, 4, 1, fp) != 1) {
        std::fprintf(stderr, "bad header\n");
        return 1;
    }
    std::vector<float> buf(static_cast<size_t>(w) * h);
    if (std::fread(buf.data(), 4, buf.size(), fp) != buf.size()) {
        std::fprintf(stderr, "short read\n");
        return 1;
    }
    std::fclose(fp);

    vigra::MultiArray<2, f32_t> img{vigra::Shape2(w, h)};
    for (int32_t y = 0; y < h; ++y)
        for (int32_t x = 0; x < w; ++x)
            img(x, y) = buf[static_cast<size_t>(y) * w + x];

    sift::Sift sift(dogs, octaves, sigma, k, subpixel);
    std::vector<sift::InterestPoint> ips = sift.calculate(img);

    FILE* out = std::fopen(argv[2], "w");
    if (!out) {
        std::fprintf(stderr, "cannot write %s\n", argv[2]);
        return 1;
    }
    for (const sift::InterestPoint& p : ips) {
        std::fprintf(out, "%u %u %u %u %.9g %.9g", unsigned(p.loc.x),
                     unsigned(p.loc.y), unsigned(p.octave), unsigned(p.index),
                     double(p.scale), double(p.orientation));
        for (f32_t d : p.descriptors)
            std::fprintf(out, " %.9g", double(d));
        std::fprintf(out, "\n");
    }
    std::fclose(out);
    return 0;
}
