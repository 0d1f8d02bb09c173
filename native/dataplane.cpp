// vqt_dataplane — native host-side image data plane.
//
// TPU-native equivalent of the C++ worker pool inside torch's DataLoader
// that the reference leans on (SURVEY §2.1: todd dataloader + PIL access
// layers): a persistent thread pool that, per batch, JPEG-decodes
// (libjpeg, with DCT-domain downscaling on the training path), applies the
// reference's transforms (shorter-side resize + center crop, or
// RandomResizedCrop + horizontal flip — vq/datasets/base.py semantics,
// PIL-compatible Catmull-Rom bicubic resampling) and writes uint8 NHWC
// directly into a caller-provided buffer. No Python, no GIL, one call per
// batch.
//
// C API (ctypes-consumed by vector_quantization_tpu/data/native.py):
//   void*   vqt_create(int num_threads);
//   void    vqt_destroy(void* pool);
//   int     vqt_version(void);
//   int64_t vqt_decode_batch(pool, paths, n, image_size, augment, seeds,
//                            out, ok);   // returns #failures
//
// Augment modes: 0 = eval ("none"): resize shorter side to S (bicubic),
// center crop S×S. 1 = train ("default"): RandomResizedCrop(area 0.08–1.0,
// log-aspect 3/4–4/3, 10 attempts, full-image fallback) + hflip(p=0.5),
// driven by a per-item counter-based RNG (splitmix64) so results are
// reproducible from the caller-supplied seed alone.
//
// Failures (non-JPEG magic, CMYK, truncated file, IO error) set ok[i]=0 and
// leave the caller to fall back to its Python decode path for that item.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <setjmp.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- RNG ----

// splitmix64: counter-based, no state shared between items.
struct SplitMix64 {
  uint64_t s;
  explicit SplitMix64(uint64_t seed) : s(seed) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }  // [0, 1)
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
  // integer in [0, n] inclusive
  int64_t randint(int64_t n) { return (int64_t)(next() % (uint64_t)(n + 1)); }
};

// ------------------------------------------------------------ resample ----

// PIL-compatible bicubic (Catmull-Rom, a = -0.5, support = 2).
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precompute per-output-pixel source bounds+weights for one axis, mirroring
// PIL's precompute_coeffs (box resize semantics: the float source window
// [box0, box1) maps onto [0, dst)).
struct AxisCoeffs {
  std::vector<int> xmin, xlen;
  std::vector<float> w;  // ksize per output pixel
  int ksize = 0;
};

AxisCoeffs precompute_coeffs(int src_size, double box0, double box1,
                             int dst) {
  AxisCoeffs c;
  const double scale = (box1 - box0) / dst;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;
  c.ksize = (int)std::ceil(support) * 2 + 1;
  c.xmin.resize(dst);
  c.xlen.resize(dst);
  c.w.assign((size_t)dst * c.ksize, 0.0f);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < dst; ++xx) {
    const double center = box0 + (xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > src_size) xmax = src_size;
    double sum = 0.0;
    float* w = &c.w[(size_t)xx * c.ksize];
    for (int x = 0; x < xmax - xmin; ++x) {
      w[x] = (float)cubic((x + xmin - center + 0.5) * ss);
      sum += w[x];
    }
    if (sum != 0.0)
      for (int x = 0; x < xmax - xmin; ++x) w[x] = (float)(w[x] / sum);
    c.xmin[xx] = xmin;
    c.xlen[xx] = xmax - xmin;
  }
  return c;
}

inline uint8_t clip8(float v) {
  int i = (int)std::lround(v);
  return (uint8_t)(i < 0 ? 0 : (i > 255 ? 255 : i));
}

// Resample `src` (src_w × src_h × 3, uint8) restricted to the float box
// (bx0, by0, bx1, by1) into `dst` (dst_w × dst_h × 3, uint8).
void resample_box(const uint8_t* src, int src_w, int src_h, double bx0,
                  double by0, double bx1, double by1, uint8_t* dst, int dst_w,
                  int dst_h) {
  AxisCoeffs ch = precompute_coeffs(src_w, bx0, bx1, dst_w);
  AxisCoeffs cv = precompute_coeffs(src_h, by0, by1, dst_h);
  // Horizontal pass only over source rows the vertical pass reads.
  int ymin_all = src_h, ymax_all = 0;
  for (int y = 0; y < dst_h; ++y) {
    ymin_all = std::min(ymin_all, cv.xmin[y]);
    ymax_all = std::max(ymax_all, cv.xmin[y] + cv.xlen[y]);
  }
  if (ymax_all <= ymin_all) {  // degenerate box
    std::memset(dst, 0, (size_t)dst_w * dst_h * 3);
    return;
  }
  const int rows = ymax_all - ymin_all;
  std::vector<float> tmp((size_t)rows * dst_w * 3);
  for (int y = 0; y < rows; ++y) {
    const uint8_t* srow = src + (size_t)(y + ymin_all) * src_w * 3;
    float* trow = &tmp[(size_t)y * dst_w * 3];
    for (int x = 0; x < dst_w; ++x) {
      const float* w = &ch.w[(size_t)x * ch.ksize];
      const int x0 = ch.xmin[x], n = ch.xlen[x];
      float r = 0.f, g = 0.f, b = 0.f;
      const uint8_t* p = srow + (size_t)x0 * 3;
      for (int k = 0; k < n; ++k, p += 3) {
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }
  for (int y = 0; y < dst_h; ++y) {
    const float* w = &cv.w[(size_t)y * cv.ksize];
    const int y0 = cv.xmin[y] - ymin_all, n = cv.xlen[y];
    uint8_t* drow = dst + (size_t)y * dst_w * 3;
    for (int x = 0; x < dst_w * 3; ++x) {
      float acc = 0.f;
      for (int k = 0; k < n; ++k) acc += w[k] * tmp[(size_t)(y0 + k) * dst_w * 3 + x];
      drow[x] = clip8(acc);
    }
  }
}

// --------------------------------------------------------------- jpeg ----

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(((JpegErr*)cinfo->err)->jb, 1);
}
void jpeg_silent(j_common_ptr, int) {}

// Decode a JPEG from memory into an RGB buffer. `min_out` requests
// DCT-domain downscaling: the smallest m/8 scale whose output still keeps
// min(out_w, out_h) ≥ min_out (0 disables scaling). Returns false on any
// decode error (caller falls back to Python).
bool decode_jpeg(const uint8_t* data, size_t len, int min_out,
                 std::vector<uint8_t>& rgb, int& out_w, int& out_h) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  jerr.pub.emit_message = jpeg_silent;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);  // no CMYK→RGB in libjpeg
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_denom = 8;
  cinfo.scale_num = 8;
  if (min_out > 0) {
    const int src_min = (int)std::min(cinfo.image_width, cinfo.image_height);
    for (int m = 1; m <= 8; ++m) {
      if ((int64_t)src_min * m / 8 >= min_out) {
        cinfo.scale_num = m;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {  // out_color_space forces 3; be safe
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  out_w = (int)cinfo.output_width;
  out_h = (int)cinfo.output_height;
  rgb.resize((size_t)out_w * out_h * 3);
  const size_t stride = (size_t)out_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Header-only parse: original dimensions without decoding.
bool jpeg_dims(const uint8_t* data, size_t len, int& w, int& h) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8) return false;
  jpeg_decompress_struct ci;
  JpegErr je;
  ci.err = jpeg_std_error(&je.pub);
  je.pub.error_exit = jpeg_err_exit;
  je.pub.emit_message = jpeg_silent;
  if (setjmp(je.jb)) {
    jpeg_destroy_decompress(&ci);
    return false;
  }
  jpeg_create_decompress(&ci);
  jpeg_mem_src(&ci, const_cast<unsigned char*>(data), (unsigned long)len);
  const bool ok = jpeg_read_header(&ci, TRUE) == JPEG_HEADER_OK;
  w = (int)ci.image_width;
  h = (int)ci.image_height;
  jpeg_destroy_decompress(&ci);
  return ok;
}

// ---------------------------------------------------------- transforms ----

// One item: read file → decode → transform → write S×S×3 uint8.
bool process_item(const char* path, int S, int augment, uint64_t seed,
                  uint8_t* out) {
  // Read the whole file (JPEGs are small; avoids mmap portability).
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  if (fsize <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)fsize);
  const bool read_ok = std::fread(data.data(), 1, (size_t)fsize, f) ==
                       (size_t)fsize;
  std::fclose(f);
  if (!read_ok) return false;

  SplitMix64 rng(seed);
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;

  if (augment == 1) {
    // Training path: DCT-downscale is safe (augmentation, not eval), but
    // the crop must be chosen on ORIGINAL dims for distribution parity.
    if (!jpeg_dims(data.data(), data.size(), w, h)) return false;
    const int orig_w = w, orig_h = h;
    // RandomResizedCrop on original dims (vq/datasets semantics: 10
    // attempts, area 0.08–1.0, log-uniform aspect 3/4–4/3, full-image
    // fallback).
    double bx0 = 0, by0 = 0, bx1 = w, by1 = h;
    const double area = (double)w * h;
    for (int attempt = 0; attempt < 10; ++attempt) {
      const double target = area * rng.uniform(0.08, 1.0);
      const double ar = std::exp(rng.uniform(std::log(0.75), std::log(4.0 / 3.0)));
      const int cw = (int)std::lround(std::sqrt(target * ar));
      const int ch = (int)std::lround(std::sqrt(target / ar));
      if (cw > 0 && cw <= w && ch > 0 && ch <= h) {
        const int left = (int)rng.randint(w - cw);
        const int top = (int)rng.randint(h - ch);
        bx0 = left;
        by0 = top;
        bx1 = left + cw;
        by1 = top + ch;
        break;
      }
    }
    const bool flip = rng.uniform() < 0.5;
    // Decode small: keep the crop at ≥ S decoded pixels.
    const int crop_min = (int)std::min(bx1 - bx0, by1 - by0);
    int min_out = 0;
    if (crop_min > 0) {
      // smallest scale m/8 with min(w,h)*m/8 >= needed, where needed keeps
      // crop_min*m/8 >= S  ⇔  min(w,h)*m/8 >= S*min(w,h)/crop_min
      min_out = (int)std::ceil((double)S * std::min(w, h) / crop_min);
    }
    if (!decode_jpeg(data.data(), data.size(), min_out, rgb, w, h))
      return false;
    // The decoded frame may be m/8-scaled: map the box onto it.
    // (jpeg output dims are ceil(orig * m/8); use the actual ratio.)
    const double rx = (double)w / orig_w, ry = (double)h / orig_h;
    resample_box(rgb.data(), w, h, bx0 * rx, by0 * ry, bx1 * rx, by1 * ry,
                 out, S, S);
    if (flip) {
      for (int y = 0; y < S; ++y) {
        uint8_t* row = out + (size_t)y * S * 3;
        for (int x = 0; x < S / 2; ++x) {
          for (int c = 0; c < 3; ++c)
            std::swap(row[x * 3 + c], row[(S - 1 - x) * 3 + c]);
        }
      }
    }
    return true;
  }

  // Eval path ("none"): full-res decode, shorter-side resize + center crop
  // — exactly vq/datasets/base.py / our Transform: scale = S/min(w,h),
  // resized dims = (max(S, round(w*scale)), max(S, round(h*scale))),
  // integer center crop in resized coords.
  if (!decode_jpeg(data.data(), data.size(), /*min_out=*/0, rgb, w, h))
    return false;
  const double scale = (double)S / std::min(w, h);
  const int rw = std::max(S, (int)std::lround(w * scale));
  const int rh = std::max(S, (int)std::lround(h * scale));
  const int left = (rw - S) / 2, top = (rh - S) / 2;
  // center crop after virtual full resize == box resize with the box the
  // cropped output region pulls from
  const double sx = (double)w / rw, sy = (double)h / rh;
  resample_box(rgb.data(), w, h, left * sx, top * sy, (left + S) * sx,
               (top + S) * sy, out, S, S);
  return true;
}

// ---------------------------------------------------------- thread pool ----

struct Pool {
  std::vector<std::thread> threads;
  std::mutex m;
  std::condition_variable cv, done_cv;
  std::function<void(int64_t)> task;
  std::atomic<int64_t> next{0};
  std::atomic<int64_t> completed{0};
  int64_t total = 0;
  uint64_t generation = 0;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      threads.emplace_back([this] { worker(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : threads) t.join();
  }

  void worker() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] { return stop || generation != seen; });
        if (stop) return;
        seen = generation;
      }
      for (;;) {
        const int64_t i = next.fetch_add(1);
        if (i >= total) break;
        task(i);
        if (completed.fetch_add(1) + 1 == total) done_cv.notify_all();
      }
    }
  }

  void run(int64_t n, std::function<void(int64_t)> fn) {
    if (threads.empty()) {  // degenerate: inline
      for (int64_t i = 0; i < n; ++i) fn(i);
      return;
    }
    std::unique_lock<std::mutex> lk(m);
    task = std::move(fn);
    total = n;
    next.store(0);
    completed.store(0);
    ++generation;
    cv.notify_all();
    done_cv.wait(lk, [&] { return completed.load() >= total; });
  }
};

}  // namespace

// ------------------------------------------------------------- C API ----

extern "C" {

int vqt_version(void) { return 1; }

void* vqt_create(int num_threads) {
  if (num_threads < 0) num_threads = 0;
  return new Pool(num_threads);
}

void vqt_destroy(void* pool) { delete (Pool*)pool; }

// Decode+transform a batch. out: n*S*S*3 uint8. ok[i] ∈ {0,1}.
// Returns the number of failed items.
int64_t vqt_decode_batch(void* pool, const char** paths, int64_t n,
                         int image_size, int augment, const uint64_t* seeds,
                         uint8_t* out, uint8_t* ok) {
  Pool* p = (Pool*)pool;
  const size_t item = (size_t)image_size * image_size * 3;
  std::atomic<int64_t> failures{0};
  p->run(n, [&](int64_t i) {
    const bool good = process_item(paths[i], image_size, augment, seeds[i],
                                   out + (size_t)i * item);
    ok[i] = good ? 1 : 0;
    if (!good) failures.fetch_add(1);
  });
  return failures.load();
}

}  // extern "C"
