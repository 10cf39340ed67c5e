// Native IO runtime: image decode + multithreaded prefetching loader.
//
// The reference implementation is a C++ program whose host-side work is
// image import via Vigra (main.cpp:52-54). In this framework the *compute*
// path is XLA (the native layer on TPU); the genuinely host-native need is
// feeding the accelerator: decoding benchmark sequences (KITTI PNG, TUM
// PNG/JPEG) fast enough to keep a >100 kf/s pipeline fed. This library
// provides:
//
//   * sift_load_gray()  — decode JPEG/PNG to grayscale float32 in [0, 255]
//     with BT.601 luminance weights (identical semantics to
//     sift_tpu.io.image.load_image_gray, so outputs are interchangeable);
//   * sift_loader_*()   — a worker-pool prefetcher that decodes a file list
//     ahead of consumption and hands frames out in order (double-buffered
//     host pipeline feeding device upload).
//
// C API only (ctypes-friendly); no global state; thread-safe per loader.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

constexpr float kLumaR = 0.299f;
constexpr float kLumaG = 0.587f;
constexpr float kLumaB = 0.114f;

struct Image {
  int width = 0;
  int height = 0;
  std::vector<float> data;  // row-major (height, width)
};

// ----------------------------------------------------------------- JPEG
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* fp, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;
  out->width = w;
  out->height = h;
  out->data.resize(static_cast<size_t>(w) * h);

  std::vector<JSAMPLE> row(static_cast<size_t>(w) * c);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    float* dst = out->data.data() + static_cast<size_t>(y) * w;
    if (c >= 3) {
      for (int x = 0; x < w; ++x) {
        dst[x] = kLumaR * row[x * c] + kLumaG * row[x * c + 1] +
                 kLumaB * row[x * c + 2];
      }
    } else {
      for (int x = 0; x < w; ++x) dst[x] = row[x * c];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------------ PNG
bool decode_png(FILE* fp, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  const bool is16 = bit_depth == 16;
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (is16) png_set_swap(png);  // little-endian 16-bit values
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> row(rowbytes);

  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->data.resize(static_cast<size_t>(w) * h);

  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data.data() + static_cast<size_t>(y) * w;
    if (is16) {
      const uint16_t* r16 = reinterpret_cast<const uint16_t*>(row.data());
      if (channels >= 3) {
        for (png_uint_32 x = 0; x < w; ++x)
          // 16-bit RGB: weight then scale to the 8-bit-equivalent range.
          dst[x] = (kLumaR * r16[x * channels] + kLumaG * r16[x * channels + 1] +
                    kLumaB * r16[x * channels + 2]) / 257.0f;
      } else {
        // 16-bit gray (e.g. TUM depth maps): raw values, no rescale.
        for (png_uint_32 x = 0; x < w; ++x) dst[x] = r16[x * channels];
      }
    } else {
      if (channels >= 3) {
        for (png_uint_32 x = 0; x < w; ++x)
          dst[x] = kLumaR * row[x * channels] + kLumaG * row[x * channels + 1] +
                   kLumaB * row[x * channels + 2];
      } else {
        for (png_uint_32 x = 0; x < w; ++x) dst[x] = row[x * channels];
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[8] = {0};
  const size_t got = fread(magic, 1, 8, fp);
  rewind(fp);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(fp, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(fp, out);
  }
  fclose(fp);
  return ok;
}

// ------------------------------------------------------------- prefetch
struct Loader {
  std::vector<std::string> paths;
  int threads;
  size_t queue_cap;

  std::mutex mu;
  std::condition_variable cv_space, cv_ready;
  std::deque<std::unique_ptr<Image>> ready;  // indexed from next_out
  size_t next_in = 0;    // next index to claim for decode
  size_t next_out = 0;   // next index the consumer wants
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (stop || next_in >= paths.size()) return;
        // Bound the decode-ahead window.
        cv_space.wait(lk, [&] {
          return stop || next_in < next_out + queue_cap;
        });
        if (stop || next_in >= paths.size()) return;
        idx = next_in++;
      }
      auto img = std::make_unique<Image>();
      if (!decode_file(paths[idx].c_str(), img.get())) {
        img->width = img->height = 0;  // error sentinel
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        const size_t slot = idx - next_out;
        if (ready.size() <= slot) ready.resize(slot + 1);
        ready[slot] = std::move(img);
        cv_ready.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

// Decode one file. Returns a malloc'd float buffer the caller frees with
// sift_free(); writes dims to *w/*h. Null on failure.
float* sift_load_gray(const char* path, int* w, int* h) {
  Image img;
  if (!decode_file(path, &img)) return nullptr;
  float* buf =
      static_cast<float*>(malloc(img.data.size() * sizeof(float)));
  if (!buf) return nullptr;
  memcpy(buf, img.data.data(), img.data.size() * sizeof(float));
  *w = img.width;
  *h = img.height;
  return buf;
}

void sift_free(float* p) { free(p); }

void* sift_loader_open(const char** paths, int n, int threads,
                       int queue_cap) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->threads = threads > 0 ? threads : 4;
  l->queue_cap = queue_cap > 0 ? queue_cap : 8;
  for (int i = 0; i < l->threads; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// Blocks until the next frame (in file order) is decoded. Returns a
// malloc'd buffer (caller frees with sift_free) or null at end/error.
float* sift_loader_next(void* handle, int* w, int* h) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_ptr<Image> img;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    if (l->next_out >= l->paths.size()) return nullptr;
    l->cv_ready.wait(lk, [&] {
      return l->stop || (!l->ready.empty() && l->ready.front() != nullptr);
    });
    if (l->stop) return nullptr;
    img = std::move(l->ready.front());
    l->ready.pop_front();
    l->next_out++;
    l->cv_space.notify_all();
  }
  if (img->width == 0) {  // decode error
    *w = *h = 0;
    return nullptr;
  }
  float* buf =
      static_cast<float*>(malloc(img->data.size() * sizeof(float)));
  memcpy(buf, img->data.data(), img->data.size() * sizeof(float));
  *w = img->width;
  *h = img->height;
  return buf;
}

void sift_loader_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->stop = true;
    l->cv_space.notify_all();
    l->cv_ready.notify_all();
  }
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
