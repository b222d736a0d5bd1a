// TF-NAS-TPU native data pipeline.
//
// The reference's input path is PIL decode + torchvision transforms in
// Python worker processes (dataset/dataset.py:9-17, train_search.py:124-141).
// This library replaces the per-image hot path with C++: libjpeg decode and
// a fused augment (bilinear resize of a crop box + horizontal flip + color
// jitter + normalize) that writes float32 HWC ready for device upload.
// Randomness (crop box, flip, jitter order/factors) stays in Python so the
// distribution matches the torchvision semantics bit-for-bit; C++ only
// executes the deterministic pixel math.
//
// Build: g++ -O3 -march=native -shared -fPIC image_pipeline.cpp -ljpeg
//
// All functions return 0 on success.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

// Work-stealing-free static dispatcher: images are independent; an atomic
// counter hands out indices to n_threads workers (n_threads == 1 runs
// inline with zero thread overhead).
static void run_batch_impl(int n, int n_threads,
                           void (*fn)(int, void*), void* ctx) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i, ctx);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i, ctx);
    }
  };
  const int t = std::min(n_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(t - 1);
  for (int k = 0; k < t - 1; ++k) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

extern "C" {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG byte buffer to tightly-packed RGB8. Caller frees *out with
// tfnas_free. Grayscale/CMYK sources are converted to RGB by libjpeg.
int tfnas_decode_jpeg(const uint8_t* data, size_t len, uint8_t** out,
                      int* width, int* height) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  uint8_t* buf = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    free(buf);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  const int stride = w * 3;
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(stride) * h));
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buf;
  *width = w;
  *height = h;
  return 0;
}

void tfnas_free(void* p) { free(p); }

// Bilinear sample from RGB8 image at continuous coords (PIL-style: sample
// positions map output pixel centers into the source box).
static inline void bilinear(const uint8_t* img, int w, int h, float sx,
                            float sy, float* rgb) {
  sx = std::min(std::max(sx, 0.0f), static_cast<float>(w - 1));
  sy = std::min(std::max(sy, 0.0f), static_cast<float>(h - 1));
  const int x0 = static_cast<int>(sx), y0 = static_cast<int>(sy);
  const int x1 = std::min(x0 + 1, w - 1), y1 = std::min(y0 + 1, h - 1);
  const float fx = sx - x0, fy = sy - y0;
  const uint8_t* p00 = img + (static_cast<size_t>(y0) * w + x0) * 3;
  const uint8_t* p01 = img + (static_cast<size_t>(y0) * w + x1) * 3;
  const uint8_t* p10 = img + (static_cast<size_t>(y1) * w + x0) * 3;
  const uint8_t* p11 = img + (static_cast<size_t>(y1) * w + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    const float top = p00[c] + (p01[c] - p00[c]) * fx;
    const float bot = p10[c] + (p11[c] - p10[c]) * fx;
    rgb[c] = top + (bot - top) * fy;
  }
}

// Resize crop box (cx, cy, cw, ch) of img to out_size x out_size into a
// float buffer scaled to [0,1]; optional horizontal flip.
static void resize_crop(const uint8_t* img, int w, int h, int cx, int cy,
                        int cw, int ch, int out_size, int flip, float* out) {
  const float sx_scale = static_cast<float>(cw) / out_size;
  const float sy_scale = static_cast<float>(ch) / out_size;
  float rgb[3];
  for (int oy = 0; oy < out_size; ++oy) {
    const float sy = cy + (oy + 0.5f) * sy_scale - 0.5f;
    for (int ox = 0; ox < out_size; ++ox) {
      const int tx = flip ? (out_size - 1 - ox) : ox;
      const float sx = cx + (ox + 0.5f) * sx_scale - 0.5f;
      bilinear(img, w, h, sx, sy, rgb);
      float* dst = out + (static_cast<size_t>(oy) * out_size + tx) * 3;
      dst[0] = rgb[0] * (1.0f / 255.0f);
      dst[1] = rgb[1] * (1.0f / 255.0f);
      dst[2] = rgb[2] * (1.0f / 255.0f);
    }
  }
}

static inline float gray(const float* p) {
  return 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
}

static void adjust_brightness(float* buf, int n, float f) {
  for (int i = 0; i < n * 3; ++i) buf[i] *= f;
}

static void adjust_contrast(float* buf, int n, float f) {
  double mean = 0.0;
  for (int i = 0; i < n; ++i) mean += gray(buf + i * 3);
  const float m = static_cast<float>(mean / n);
  for (int i = 0; i < n * 3; ++i) buf[i] = (buf[i] - m) * f + m;
}

static void adjust_saturation(float* buf, int n, float f) {
  for (int i = 0; i < n; ++i) {
    float* p = buf + i * 3;
    const float g = gray(p);
    p[0] = (p[0] - g) * f + g;
    p[1] = (p[1] - g) * f + g;
    p[2] = (p[2] - g) * f + g;
  }
}

static void adjust_hue(float* buf, int n, float shift) {
  for (int i = 0; i < n; ++i) {
    float* p = buf + i * 3;
    const float r = p[0], g = p[1], b = p[2];
    const float maxc = std::max(r, std::max(g, b));
    const float minc = std::min(r, std::min(g, b));
    const float v = maxc, delta = maxc - minc;
    const float s = maxc > 0.0f ? delta / std::max(maxc, 1e-12f) : 0.0f;
    float hh;
    const float dz = std::max(delta, 1e-12f);
    if (delta == 0.0f) hh = 0.0f;
    else if (maxc == r) hh = std::fmod((g - b) / dz, 6.0f);
    else if (maxc == g) hh = (b - r) / dz + 2.0f;
    else hh = (r - g) / dz + 4.0f;
    if (hh < 0.0f) hh += 6.0f;
    float hnorm = hh / 6.0f + shift;
    hnorm -= std::floor(hnorm);
    const float h6 = hnorm * 6.0f;
    const int ii = static_cast<int>(h6) % 6;
    const float fr = h6 - std::floor(h6);
    const float pp = v * (1.0f - s);
    const float qq = v * (1.0f - s * fr);
    const float tt = v * (1.0f - s * (1.0f - fr));
    switch (ii) {
      case 0: p[0] = v; p[1] = tt; p[2] = pp; break;
      case 1: p[0] = qq; p[1] = v; p[2] = pp; break;
      case 2: p[0] = pp; p[1] = v; p[2] = tt; break;
      case 3: p[0] = pp; p[1] = qq; p[2] = v; break;
      case 4: p[0] = tt; p[1] = pp; p[2] = v; break;
      default: p[0] = v; p[1] = pp; p[2] = qq; break;
    }
  }
}

static void clip01(float* buf, int n) {
  for (int i = 0; i < n * 3; ++i)
    buf[i] = std::min(std::max(buf[i], 0.0f), 1.0f);
}

static void normalize(float* buf, int n, const float* mean,
                      const float* stdv) {
  const float inv0 = 1.0f / stdv[0], inv1 = 1.0f / stdv[1],
              inv2 = 1.0f / stdv[2];
  for (int i = 0; i < n; ++i) {
    float* p = buf + i * 3;
    p[0] = (p[0] - mean[0]) * inv0;
    p[1] = (p[1] - mean[1]) * inv1;
    p[2] = (p[2] - mean[2]) * inv2;
  }
}

// Training augment: resize crop box to out_size + flip + color jitter (ops
// applied in `order` with `factors`; op ids 0=brightness 1=contrast
// 2=saturation 3=hue; order entries < 0 terminate) + clip + normalize.
int tfnas_augment_train(const uint8_t* img, int w, int h, int cx, int cy,
                        int cw, int ch, int out_size, int flip,
                        const int* order, const float* factors,
                        const float* mean, const float* stdv, float* out) {
  resize_crop(img, w, h, cx, cy, cw, ch, out_size, flip, out);
  const int n = out_size * out_size;
  for (int i = 0; i < 4; ++i) {
    const int op = order[i];
    if (op < 0) break;
    switch (op) {
      case 0: adjust_brightness(out, n, factors[0]); break;
      case 1: adjust_contrast(out, n, factors[1]); break;
      case 2: adjust_saturation(out, n, factors[2]); break;
      case 3: adjust_hue(out, n, factors[3]); break;
      default: return 4;
    }
  }
  clip01(out, n);
  normalize(out, n, mean, stdv);
  return 0;
}

// Validation: resize shortest side to `resize`, center crop `crop`,
// normalize.
int tfnas_augment_val(const uint8_t* img, int w, int h, int resize, int crop,
                      const float* mean, const float* stdv, float* out) {
  int nw, nh;
  if (w < h) {
    nw = resize;
    nh = static_cast<int>(std::lround(static_cast<double>(h) * resize / w));
  } else {
    nh = resize;
    nw = static_cast<int>(std::lround(static_cast<double>(w) * resize / h));
  }
  // center crop box in resized coords, mapped back to source coords
  const int x0 = (nw - crop) / 2, y0 = (nh - crop) / 2;
  const float sx_scale = static_cast<float>(w) / nw;
  const float sy_scale = static_cast<float>(h) / nh;
  float rgb[3];
  for (int oy = 0; oy < crop; ++oy) {
    const float sy = (y0 + oy + 0.5f) * sy_scale - 0.5f;
    for (int ox = 0; ox < crop; ++ox) {
      const float sx = (x0 + ox + 0.5f) * sx_scale - 0.5f;
      bilinear(img, w, h, sx, sy, rgb);
      float* dst = out + (static_cast<size_t>(oy) * crop + ox) * 3;
      dst[0] = rgb[0] * (1.0f / 255.0f);
      dst[1] = rgb[1] * (1.0f / 255.0f);
      dst[2] = rgb[2] * (1.0f / 255.0f);
    }
  }
  const int n = crop * crop;
  normalize(out, n, mean, stdv);
  return 0;
}

// One-call decode + train augment (saves a Python round trip per image).
int tfnas_decode_augment_train(const uint8_t* data, size_t len, int cx,
                               int cy, int cw, int ch, int out_size,
                               int flip, const int* order,
                               const float* factors, const float* mean,
                               const float* stdv, float* out) {
  uint8_t* img = nullptr;
  int w = 0, h = 0;
  const int rc = tfnas_decode_jpeg(data, len, &img, &w, &h);
  if (rc != 0) return rc;
  if (cx < 0 || cy < 0 || cx + cw > w || cy + ch > h) {
    free(img);
    return 5;
  }
  const int rc2 = tfnas_augment_train(img, w, h, cx, cy, cw, ch, out_size,
                                      flip, order, factors, mean, stdv, out);
  free(img);
  return rc2;
}

// ---- batch entry points ----------------------------------------------
//
// One C call per BATCH instead of per image: a Python caller pays one
// GIL release/acquire per batch, which eliminates the GIL convoy effect
// that throttles per-image ctypes calls from loader threads (measured
// 6-20x loader slowdown on a single-core host). n_threads > 1 splits the
// batch across std::threads for multicore hosts.

static void run_batch(int n, int n_threads, void (*fn)(int, void*),
                      void* ctx) {
  run_batch_impl(n, n_threads, fn, ctx);
}

struct TrainBatchCtx {
  const uint8_t* const* datas;
  const size_t* lens;
  const int* boxes;     // [n,4] (cx, cy, cw, ch)
  int out_size;
  const int* flips;     // [n]
  const int* orders;    // [n,4]
  const float* factors; // [n,4]
  const float* mean;
  const float* stdv;
  float* out;           // [n, out_size, out_size, 3]
  int* status;          // [n]
};

static void train_batch_one(int i, void* vctx) {
  TrainBatchCtx* c = static_cast<TrainBatchCtx*>(vctx);
  const int* b = c->boxes + 4 * i;
  c->status[i] = tfnas_decode_augment_train(
      c->datas[i], c->lens[i], b[0], b[1], b[2], b[3], c->out_size,
      c->flips[i], c->orders + 4 * i, c->factors + 4 * i, c->mean, c->stdv,
      c->out + static_cast<size_t>(i) * c->out_size * c->out_size * 3);
}

int tfnas_decode_augment_train_batch(
    const uint8_t* const* datas, const size_t* lens, int n, const int* boxes,
    int out_size, const int* flips, const int* orders, const float* factors,
    const float* mean, const float* stdv, float* out, int* status,
    int n_threads) {
  TrainBatchCtx ctx{datas, lens, boxes, out_size, flips,
                    orders, factors, mean, stdv, out, status};
  run_batch(n, n_threads, train_batch_one, &ctx);
  return 0;
}

struct ValBatchCtx {
  const uint8_t* const* datas;
  const size_t* lens;
  int resize;
  int crop;
  const float* mean;
  const float* stdv;
  float* out;           // [n, crop, crop, 3]
  int* status;          // [n]
};

static void val_batch_one(int i, void* vctx) {
  ValBatchCtx* c = static_cast<ValBatchCtx*>(vctx);
  uint8_t* img = nullptr;
  int w = 0, h = 0;
  int rc = tfnas_decode_jpeg(c->datas[i], c->lens[i], &img, &w, &h);
  if (rc == 0) {
    rc = tfnas_augment_val(
        img, w, h, c->resize, c->crop, c->mean, c->stdv,
        c->out + static_cast<size_t>(i) * c->crop * c->crop * 3);
    free(img);
  }
  c->status[i] = rc;
}

int tfnas_decode_augment_val_batch(
    const uint8_t* const* datas, const size_t* lens, int n, int resize,
    int crop, const float* mean, const float* stdv, float* out, int* status,
    int n_threads) {
  ValBatchCtx ctx{datas, lens, resize, crop, mean, stdv, out, status};
  run_batch(n, n_threads, val_batch_one, &ctx);
  return 0;
}

// ---- uint8 batch variants --------------------------------------------
//
// Same decode+augment pipelines, but the batch is written as uint8 pixels
// (rint(x*255), x in [0,1] after clip) with normalization LEFT OUT — the
// caller normalizes on the accelerator. Rationale: the host->device link
// is the step-rate bottleneck for search training (measured ~20 MB/s
// through the tunneled relay); uint8 is 4x smaller than float32 and
// matches the reference pipeline's own quantization (PIL ColorJitter
// works on uint8 images, dataset/dataset.py:9-17).

static const float kIdMean[3] = {0.0f, 0.0f, 0.0f};
static const float kIdStd[3] = {1.0f, 1.0f, 1.0f};

static void quantize_u8(const float* in, int n, uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    float v = in[i] * 255.0f;
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    out[i] = static_cast<uint8_t>(std::lround(v));
  }
}

struct TrainBatchU8Ctx {
  const uint8_t* const* datas;
  const size_t* lens;
  const int* boxes;
  int out_size;
  const int* flips;
  const int* orders;
  const float* factors;
  uint8_t* out;         // [n, out_size, out_size, 3]
  float* scratch;       // [n, out_size, out_size, 3]
  int* status;
};

static void train_batch_one_u8(int i, void* vctx) {
  TrainBatchU8Ctx* c = static_cast<TrainBatchU8Ctx*>(vctx);
  const int* b = c->boxes + 4 * i;
  const size_t sz = static_cast<size_t>(c->out_size) * c->out_size * 3;
  float* scr = c->scratch + sz * i;
  c->status[i] = tfnas_decode_augment_train(
      c->datas[i], c->lens[i], b[0], b[1], b[2], b[3], c->out_size,
      c->flips[i], c->orders + 4 * i, c->factors + 4 * i, kIdMean, kIdStd,
      scr);
  if (c->status[i] == 0)
    quantize_u8(scr, static_cast<int>(sz), c->out + sz * i);
}

int tfnas_decode_augment_train_batch_u8(
    const uint8_t* const* datas, const size_t* lens, int n, const int* boxes,
    int out_size, const int* flips, const int* orders, const float* factors,
    uint8_t* out, int* status, int n_threads) {
  const size_t sz = static_cast<size_t>(out_size) * out_size * 3;
  float* scratch = static_cast<float*>(malloc(sz * n * sizeof(float)));
  if (!scratch) return 6;
  TrainBatchU8Ctx ctx{datas, lens,   boxes,   out_size, flips,
                      orders, factors, out,     scratch,  status};
  run_batch(n, n_threads, train_batch_one_u8, &ctx);
  free(scratch);
  return 0;
}

struct ValBatchU8Ctx {
  const uint8_t* const* datas;
  const size_t* lens;
  int resize;
  int crop;
  uint8_t* out;         // [n, crop, crop, 3]
  float* scratch;       // [n, crop, crop, 3]
  int* status;
};

static void val_batch_one_u8(int i, void* vctx) {
  ValBatchU8Ctx* c = static_cast<ValBatchU8Ctx*>(vctx);
  const size_t sz = static_cast<size_t>(c->crop) * c->crop * 3;
  float* scr = c->scratch + sz * i;
  uint8_t* img = nullptr;
  int w = 0, h = 0;
  int rc = tfnas_decode_jpeg(c->datas[i], c->lens[i], &img, &w, &h);
  if (rc == 0) {
    rc = tfnas_augment_val(img, w, h, c->resize, c->crop, kIdMean, kIdStd,
                           scr);
    free(img);
    if (rc == 0) quantize_u8(scr, static_cast<int>(sz), c->out + sz * i);
  }
  c->status[i] = rc;
}

int tfnas_decode_augment_val_batch_u8(
    const uint8_t* const* datas, const size_t* lens, int n, int resize,
    int crop, uint8_t* out, int* status, int n_threads) {
  const size_t sz = static_cast<size_t>(crop) * crop * 3;
  float* scratch = static_cast<float*>(malloc(sz * n * sizeof(float)));
  if (!scratch) return 6;
  ValBatchU8Ctx ctx{datas, lens, resize, crop, out, scratch, status};
  run_batch(n, n_threads, val_batch_one_u8, &ctx);
  free(scratch);
  return 0;
}

int tfnas_image_size(const uint8_t* data, size_t len, int* width,
                     int* height) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
