// imgpipe: native JPEG decode + crop + antialiased resize for the input
// pipeline (the DALI-substrate replacement, SURVEY.md §2.3).
//
// Design:
//  * libjpeg DCT-domain scaling (scale_num/8) picks the smallest decode size
//    that still covers the requested crop — the same fused decode+crop idea
//    as DALI's decoders.image_random_crop (reference dali_dataloader.py:65).
//  * only the crop's scanline span is decoded (jpeg_skip_scanlines when
//    available, else cheap row skipping).
//  * separable triangle (DALI INTERP_TRIANGULAR) or Catmull-Rom cubic
//    (INTERP_CUBIC) resampling, antialiased on downscale — matches PIL/DALI
//    filtering so augmentation statistics agree with the Python path.
//  * pure C ABI, no Python: called via ctypes from a thread pool; the GIL is
//    released during the call so host decode scales across cores.
//
// Build: make -C native   ->  libimgpipe.so

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// error handling: libjpeg longjmp instead of exit()
// ---------------------------------------------------------------------------
struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// ---------------------------------------------------------------------------
// resampling (separable, float accum). filter: 0 = triangle, 1 = cubic
// ---------------------------------------------------------------------------

static inline float triangle_filt(float x) {
  x = std::fabs(x);
  return x < 1.0f ? 1.0f - x : 0.0f;
}

// Catmull-Rom / Keys a=-0.5 (PIL BICUBIC)
static inline float cubic_filt(float x) {
  const float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct Tap {
  int start;
  int n;
};

// Precompute contribution windows+weights for one axis.
static void build_taps(int in_size, int out_size, int filt, std::vector<Tap>& taps,
                       std::vector<float>& weights, int& max_taps) {
  const float support_base = filt == 1 ? 2.0f : 1.0f;
  const float scale = static_cast<float>(in_size) / out_size;
  const float fscale = std::max(scale, 1.0f);  // widen on downscale = antialias
  const float support = support_base * fscale;
  max_taps = static_cast<int>(std::ceil(support)) * 2 + 2;
  taps.resize(out_size);
  weights.assign(static_cast<size_t>(out_size) * max_taps, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    const float center = (o + 0.5f) * scale - 0.5f;
    int lo = static_cast<int>(std::floor(center - support));
    int hi = static_cast<int>(std::ceil(center + support));
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size - 1);
    float sum = 0.0f;
    int n = 0;
    float* w = &weights[static_cast<size_t>(o) * max_taps];
    for (int i = lo; i <= hi && n < max_taps; ++i, ++n) {
      const float x = (i - center) / fscale;
      const float v = filt == 1 ? cubic_filt(x) : triangle_filt(x);
      w[n] = v;
      sum += v;
    }
    if (sum != 0.0f)
      for (int k = 0; k < n; ++k) w[k] /= sum;
    taps[o].start = lo;
    taps[o].n = n;
  }
}

// (in_h, in_w, 3) uint8 -> (out_h, out_w, 3) uint8
static void resize_rgb(const uint8_t* in, int in_h, int in_w, uint8_t* out, int out_h,
                       int out_w, int filt) {
  std::vector<Tap> xt, yt;
  std::vector<float> xw, yw;
  int xmax, ymax;
  build_taps(in_w, out_w, filt, xt, xw, xmax);
  build_taps(in_h, out_h, filt, yt, yw, ymax);

  // horizontal pass into float buffer (in_h x out_w x 3)
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * in_w * 3;
    float* trow = &tmp[static_cast<size_t>(y) * out_w * 3];
    for (int x = 0; x < out_w; ++x) {
      const Tap t = xt[x];
      const float* w = &xw[static_cast<size_t>(x) * xmax];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < t.n; ++k) {
        const uint8_t* px = row + static_cast<size_t>(t.start + k) * 3;
        r += w[k] * px[0];
        g += w[k] * px[1];
        b += w[k] * px[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; ++y) {
    const Tap t = yt[y];
    const float* w = &yw[static_cast<size_t>(y) * ymax];
    uint8_t* orow = out + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < t.n; ++k) {
        const float* px = &tmp[(static_cast<size_t>(t.start + k) * out_w + x) * 3];
        r += w[k] * px[0];
        g += w[k] * px[1];
        b += w[k] * px[2];
      }
      orow[x * 3 + 0] = static_cast<uint8_t>(std::clamp(r + 0.5f, 0.0f, 255.0f));
      orow[x * 3 + 1] = static_cast<uint8_t>(std::clamp(g + 0.5f, 0.0f, 255.0f));
      orow[x * 3 + 2] = static_cast<uint8_t>(std::clamp(b + 0.5f, 0.0f, 255.0f));
    }
  }
}

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

// Read the header only: returns 0 on success, fills (w, h).
int ip_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode -> crop (full-res coords) -> resize to (out_w, out_h).
// crop_w/h == 0 means whole image. filt: 0 triangle, 1 cubic.
// out must hold out_h*out_w*3 bytes. Returns 0 on success.
int ip_decode_crop_resize(const uint8_t* data, size_t len, int crop_x, int crop_y,
                          int crop_w, int crop_h, int out_w, int out_h, int filt,
                          uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  std::vector<uint8_t> buf;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  const int W = cinfo.image_width, H = cinfo.image_height;
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = W;
    crop_h = H;
  }
  crop_x = std::clamp(crop_x, 0, W - 1);
  crop_y = std::clamp(crop_y, 0, H - 1);
  crop_w = std::clamp(crop_w, 1, W - crop_x);
  crop_h = std::clamp(crop_h, 1, H - crop_y);

  // DCT scaling: smallest n/8 so scaled crop still >= target
  int num = 8;
  for (int n = 1; n <= 8; ++n) {
    if (crop_w * n / 8 >= out_w && crop_h * n / 8 >= out_h) {
      num = n;
      break;
    }
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;
  // crop in scaled coords
  int sx = static_cast<int>(static_cast<int64_t>(crop_x) * sw / W);
  int sy = static_cast<int>(static_cast<int64_t>(crop_y) * sh / H);
  int scw = std::max(static_cast<int>(static_cast<int64_t>(crop_w) * sw / W), 1);
  int sch = std::max(static_cast<int>(static_cast<int64_t>(crop_h) * sh / H), 1);
  sx = std::min(sx, sw - 1);
  sy = std::min(sy, sh - 1);
  scw = std::min(scw, sw - sx);
  sch = std::min(sch, sh - sy);

  buf.resize(static_cast<size_t>(sch) * scw * 3);
  std::vector<uint8_t> rowbuf(static_cast<size_t>(sw) * 3);
  JSAMPROW rowptr[1];
  rowptr[0] = rowbuf.data();
  int outrow = 0;
  // rows above the crop: skip the IDCT/color-convert work entirely
  // (libjpeg-turbo jpeg_skip_scanlines; entropy decode still runs)
  while (static_cast<int>(cinfo.output_scanline) < sy) {
    if (jpeg_skip_scanlines(&cinfo, sy - cinfo.output_scanline) == 0) break;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, rowptr, 1);
    if (y >= sy && y < sy + sch) {
      memcpy(&buf[static_cast<size_t>(outrow) * scw * 3], rowbuf.data() + static_cast<size_t>(sx) * 3,
             static_cast<size_t>(scw) * 3);
      ++outrow;
    }
    if (y >= sy + sch) {
      // rest of the image is not needed
      jpeg_abort_decompress(&cinfo);
      break;
    }
  }
  if (cinfo.global_state != 0 && outrow == sch && cinfo.output_scanline >= cinfo.output_height) {
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  if (outrow < sch) return -2;

  if (scw == out_w && sch == out_h) {
    memcpy(out, buf.data(), static_cast<size_t>(out_h) * out_w * 3);
  } else {
    resize_rgb(buf.data(), sch, scw, out, out_h, out_w, filt);
  }
  return 0;
}

// Decode the crop at the best DCT scale WITHOUT host resampling, anchored
// top-left into a fixed (max_h, max_w) canvas (row stride max_w*3) — the
// host half of the device-side resample split (the DALI-GPU-resize analog,
// reference dali_dataloader.py:73-80: decode+crop fused, resize on the
// accelerator). Scale choice: smallest n/8 with scaled crop >= (tgt_w,
// tgt_h) in both dims (no upscale, same rule as ip_decode_crop_resize);
// if that overflows the canvas — extreme-aspect crops — n is decremented
// until it fits (the device then upscales one dim slightly); if even n=1
// cannot fit (crop > 8*canvas, i.e. sources beyond ~3600 px), falls back to
// a full host decode+resize to (tgt_w, tgt_h), which the device resample
// passes through as identity. Fills *scaled_w/*scaled_h with the valid
// extent. Canvas pixels beyond the extent are left untouched (the device
// resample masks them with exact-zero weights). Returns 0 on success.
int ip_decode_crop_scaled(const uint8_t* data, size_t len, int crop_x, int crop_y,
                          int crop_w, int crop_h, int tgt_w, int tgt_h, int max_w,
                          int max_h, uint8_t* out, int* scaled_w, int* scaled_h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  const int W = cinfo.image_width, H = cinfo.image_height;
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = W;
    crop_h = H;
  }
  crop_x = std::clamp(crop_x, 0, W - 1);
  crop_y = std::clamp(crop_y, 0, H - 1);
  crop_w = std::clamp(crop_w, 1, W - crop_x);
  crop_h = std::clamp(crop_h, 1, H - crop_y);

  int num = 8;
  for (int n = 1; n <= 8; ++n) {
    if (crop_w * n / 8 >= tgt_w && crop_h * n / 8 >= tgt_h) {
      num = n;
      break;
    }
  }
  // shrink until the canvas fits (+1: libjpeg rounds full-image dims up, so
  // the scaled crop can exceed crop*n/8 by one pixel)
  while (num > 1 && (static_cast<int64_t>(crop_w) * num / 8 + 1 > max_w ||
                     static_cast<int64_t>(crop_h) * num / 8 + 1 > max_h))
    --num;
  if (static_cast<int64_t>(crop_w) / 8 + 1 > max_w || static_cast<int64_t>(crop_h) / 8 + 1 > max_h) {
    // cannot fit even at 1/8: host-resample directly to target (device
    // resample becomes identity). Packed decode into a temp, then re-stride.
    jpeg_destroy_decompress(&cinfo);
    std::vector<uint8_t> tmp(static_cast<size_t>(tgt_h) * tgt_w * 3);
    const int rc = ip_decode_crop_resize(data, len, crop_x, crop_y, crop_w, crop_h, tgt_w,
                                         tgt_h, 0, tmp.data());
    if (rc != 0) return rc;
    for (int y = 0; y < tgt_h; ++y)
      memcpy(out + static_cast<size_t>(y) * max_w * 3, &tmp[static_cast<size_t>(y) * tgt_w * 3],
             static_cast<size_t>(tgt_w) * 3);
    *scaled_w = tgt_w;
    *scaled_h = tgt_h;
    return 0;
  }

  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;
  int sx = static_cast<int>(static_cast<int64_t>(crop_x) * sw / W);
  int sy = static_cast<int>(static_cast<int64_t>(crop_y) * sh / H);
  int scw = std::max(static_cast<int>(static_cast<int64_t>(crop_w) * sw / W), 1);
  int sch = std::max(static_cast<int>(static_cast<int64_t>(crop_h) * sh / H), 1);
  sx = std::min(sx, sw - 1);
  sy = std::min(sy, sh - 1);
  scw = std::min({scw, sw - sx, max_w});  // canvas clamp trims <= 1 rounding px
  sch = std::min({sch, sh - sy, max_h});

  std::vector<uint8_t> rowbuf(static_cast<size_t>(sw) * 3);
  JSAMPROW rowptr[1];
  rowptr[0] = rowbuf.data();
  int outrow = 0;
  while (static_cast<int>(cinfo.output_scanline) < sy) {  // see ip_decode_crop_resize
    if (jpeg_skip_scanlines(&cinfo, sy - cinfo.output_scanline) == 0) break;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, rowptr, 1);
    if (y >= sy && y < sy + sch) {
      memcpy(out + static_cast<size_t>(outrow) * max_w * 3,
             rowbuf.data() + static_cast<size_t>(sx) * 3, static_cast<size_t>(scw) * 3);
      ++outrow;
    }
    if (y >= sy + sch) {
      jpeg_abort_decompress(&cinfo);
      break;
    }
  }
  if (cinfo.global_state != 0 && outrow == sch && cinfo.output_scanline >= cinfo.output_height) {
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  if (outrow < sch) return -2;
  *scaled_w = scw;
  *scaled_h = sch;
  return 0;
}

// Resize-shorter + center-crop (validation path, reference
// dali_dataloader.py:145-158). Returns 0 on success.
int ip_decode_val(const uint8_t* data, size_t len, int resize_shorter, int crop,
                  uint8_t* out) {
  int W, H;
  if (ip_jpeg_dims(data, len, &W, &H) != 0) return -1;
  const double scale = static_cast<double>(resize_shorter) / std::min(W, H);
  int nw = std::max(static_cast<int>(std::lround(W * scale)), resize_shorter);
  int nh = std::max(static_cast<int>(std::lround(H * scale)), resize_shorter);
  // decode full image (scaled), resize to (nh, nw), center-crop `crop`
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  if (ip_decode_crop_resize(data, len, 0, 0, 0, 0, nw, nh, 0, resized.data()) != 0) return -1;
  const int x0 = (nw - crop) / 2, y0 = (nh - crop) / 2;
  if (x0 < 0 || y0 < 0) return -3;
  for (int y = 0; y < crop; ++y)
    memcpy(out + static_cast<size_t>(y) * crop * 3,
           &resized[(static_cast<size_t>(y0 + y) * nw + x0) * 3], static_cast<size_t>(crop) * 3);
  return 0;
}

}  // extern "C"
