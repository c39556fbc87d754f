// Native image loading for the host data pipeline.
//
// The reference leans on 4-8 torch DataLoader worker processes per GPU for
// PIL decode throughput (SURVEY §2.4, hard part 7). Here the hot path is
// C++: libjpeg decode (with DCT-domain downscaling — decode at 1/2, 1/4 or
// 1/8 resolution when the target is small), bilinear resize with optional
// shorter-side + center-crop, per-mode normalization, CHW float32 output,
// and a batch API fanned out over a thread pool. Exposed as a C ABI for
// ctypes (no pybind11 in this image).
//
// Modes: 0 = clip (CLIP mean/std), 1 = clipa (ImageNet), 2 = sd ([-1,1]).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};
constexpr float kImagenetMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kImagenetStd[3] = {0.229f, 0.224f, 0.225f};

// Decode a JPEG file to RGB8. Returns false on failure.
bool DecodeJpeg(const char* path, int min_target, std::vector<uint8_t>* rgb,
                int* width, int* height, int* orig_w, int* orig_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *orig_w = cinfo.image_width;
  *orig_h = cinfo.image_height;

  // DCT-domain downscale: largest denom in {1,2,4,8} keeping the shorter
  // side >= 2x the target, so the antialiased filter still does the final
  // >=2x reduction and output stays close to a full-res resize.
  if (min_target > 0) {
    int shorter = std::min<int>(cinfo.image_width, cinfo.image_height);
    int denom = 1;
    while (denom < 8 && shorter / (denom * 2) >= 2 * min_target) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  rgb->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Separable antialiased triangle-filter resize — PIL's BILINEAR resample
// (support widens with the downscale factor). Precomputed tap tables per
// output coordinate, applied horizontally then vertically.
struct Taps {
  std::vector<int> start;    // first source index per output px
  std::vector<int> count;    // taps per output px
  std::vector<float> weight; // flattened [out][tap]
  int max_taps = 0;
};

Taps BuildTaps(int src_size, int out_size, float scale, float offset) {
  Taps t;
  float filterscale = std::max(scale, 1.0f);
  float support = 1.0f * filterscale;  // triangle filter support
  int max_taps = int(std::ceil(support)) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(size_t(out_size) * max_taps, 0.0f);
  t.max_taps = max_taps;
  for (int x = 0; x < out_size; ++x) {
    float center = offset + (x + 0.5f) * scale;
    int lo = std::max(int(center - support + 0.5f), 0);
    int hi = std::min(int(center + support + 0.5f), src_size);
    hi = std::max(hi, lo + 1);
    float sum = 0.0f;
    for (int i = lo; i < hi; ++i) {
      float w = 1.0f - std::fabs((i + 0.5f - center) / filterscale);
      w = std::max(w, 0.0f);
      t.weight[size_t(x) * max_taps + (i - lo)] = w;
      sum += w;
    }
    if (sum > 0)
      for (int i = 0; i < hi - lo; ++i)
        t.weight[size_t(x) * max_taps + i] /= sum;
    t.start[x] = lo;
    t.count[x] = hi - lo;
  }
  return t;
}

void ResizeNormalize(const uint8_t* src, int sw, int sh, int size,
                     int keep_ratio, int mode, float* out /* 3*size*size */) {
  float scale_x, scale_y, off_x = 0.0f, off_y = 0.0f;
  if (keep_ratio) {
    // match PIL/torchvision two-stage arithmetic exactly: resize shorter
    // side to `size` with INTEGER-rounded longer side, then integer-offset
    // center crop (transforms.py _resize_shorter/_center_crop).
    int new_w, new_h;
    if (sw <= sh) {
      new_w = size;
      new_h = std::max(1, int(std::lround(double(sh) * size / sw)));
    } else {
      new_h = size;
      new_w = std::max(1, int(std::lround(double(sw) * size / sh)));
    }
    scale_x = float(sw) / new_w;
    scale_y = float(sh) / new_h;
    off_x = float((new_w - size) / 2) * scale_x;
    off_y = float((new_h - size) / 2) * scale_y;
  } else {
    scale_x = float(sw) / size;
    scale_y = float(sh) / size;
  }

  Taps tx = BuildTaps(sw, size, scale_x, off_x);
  Taps ty = BuildTaps(sh, size, scale_y, off_y);

  // pass 1: horizontal (sh x size x 3 float)
  std::vector<float> tmp(size_t(sh) * size * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + size_t(y) * sw * 3;
    float* trow = tmp.data() + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      const float* w = tx.weight.data() + size_t(x) * tx.max_taps;
      int s0 = tx.start[x], n = tx.count[x];
      float acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const uint8_t* px = row + size_t(s0 + i) * 3;
        acc[0] += w[i] * px[0];
        acc[1] += w[i] * px[1];
        acc[2] += w[i] * px[2];
      }
      trow[size_t(x) * 3 + 0] = acc[0];
      trow[size_t(x) * 3 + 1] = acc[1];
      trow[size_t(x) * 3 + 2] = acc[2];
    }
  }

  const float* mean;
  const float* stdv;
  switch (mode) {
    case 0: mean = kClipMean; stdv = kClipStd; break;
    case 1: mean = kImagenetMean; stdv = kImagenetStd; break;
    default: mean = nullptr; stdv = nullptr; break;  // sd: [-1, 1]
  }

  // pass 2: vertical + normalize + CHW
  const size_t plane = size_t(size) * size;
  for (int y = 0; y < size; ++y) {
    const float* w = ty.weight.data() + size_t(y) * ty.max_taps;
    int s0 = ty.start[y], n = ty.count[y];
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const float* px = tmp.data() + (size_t(s0 + i) * size + x) * 3;
        acc[0] += w[i] * px[0];
        acc[1] += w[i] * px[1];
        acc[2] += w[i] * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] / 255.0f;
        v = mean ? (v - mean[c]) / stdv[c] : v * 2.0f - 1.0f;
        out[c * plane + size_t(y) * size + x] = v;
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. out: 3*size*size floats (CHW).
// orig_w/orig_h (optional) receive the pre-decode dimensions.
int ss_load_image(const char* path, int size, int mode, int keep_ratio,
                  float* out, int* orig_w, int* orig_h) {
  std::vector<uint8_t> rgb;
  int w, h, ow, oh;
  if (!DecodeJpeg(path, size, &rgb, &w, &h, &ow, &oh)) return 1;
  if (orig_w) *orig_w = ow;
  if (orig_h) *orig_h = oh;
  ResizeNormalize(rgb.data(), w, h, size, keep_ratio, mode, out);
  return 0;
}

// Batch decode over a thread pool. status[i] = 0 on success per image.
// out: n * 3*size*size floats.
void ss_load_batch(const char** paths, int n, int size, int mode,
                   int keep_ratio, float* out, int* status, int* orig_w,
                   int* orig_h, int nthreads) {
  if (nthreads <= 0) nthreads = int(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next(0);
  const size_t stride = size_t(3) * size * size;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = ss_load_image(paths[i], size, mode, keep_ratio,
                                out + size_t(i) * stride,
                                orig_w ? orig_w + i : nullptr,
                                orig_h ? orig_h + i : nullptr);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

int ss_version() { return 1; }

}  // extern "C"
