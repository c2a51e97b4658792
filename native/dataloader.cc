// vfmseg_tpu native data loader.
//
// The host input pipeline is the one part of this framework where the
// reference relied on external native code (cv2/PIL codecs inside mmcv
// pipelines, SURVEY §2.6/§2.9). This library provides the hot per-sample
// path as a single C pass — decode (PNG via libpng / JPEG via libjpeg),
// bilinear image / nearest label resize, and fused normalize+pad to float32
// — callable from Python through ctypes (vfmseg_tpu/data/native.py), with a
// transparent PIL fallback when the shared object is absent.
//
// Build: make -C native   (g++ -O3 -shared, links libpng/libjpeg/zlib)
//
// All functions return 0 on success, negative error codes otherwise, and
// write row-major interleaved RGB (or single-channel labels).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // h * w * channels
};

bool has_suffix(const char* path, const char* suf) {
  size_t lp = strlen(path), ls = strlen(suf);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; i++) {
    char a = path[lp - ls + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

int decode_png(const char* path, int want_channels, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (want_channels == 3) {
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {  // labels: keep first channel
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE)
      png_set_rgb_to_gray_fixed(png, 1 /*error_action: no warn*/, -1, -1);
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->w = (int)w;
  out->h = (int)h;
  out->channels = channels;
  out->data.resize((size_t)w * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

int decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

int decode(const char* path, int want_channels, Image* out) {
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg")) {
    int rc = decode_jpeg(path, out);
    if (rc) return rc;
    if (want_channels == 1) {  // labels never ship as jpeg, but be safe
      for (int i = 0; i < out->w * out->h; i++)
        out->data[i] = out->data[(size_t)i * 3];
      out->data.resize((size_t)out->w * out->h);
      out->channels = 1;
    }
    return 0;
  }
  return decode_png(path, want_channels, out);
}

// torch/PIL-matching bilinear (half-pixel centers) for uint8 RGB.
void resize_bilinear(const Image& src, int tw, int th, uint8_t* dst) {
  const int c = src.channels;
  for (int y = 0; y < th; y++) {
    float sy = ((float)y + 0.5f) * src.h / th - 0.5f;
    if (sy < 0) sy = 0;
    if (sy > src.h - 1) sy = (float)src.h - 1;
    int y0 = (int)sy;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float fy = sy - y0;
    for (int x = 0; x < tw; x++) {
      float sx = ((float)x + 0.5f) * src.w / tw - 0.5f;
      if (sx < 0) sx = 0;
      if (sx > src.w - 1) sx = (float)src.w - 1;
      int x0 = (int)sx;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float fx = sx - x0;
      const uint8_t* p00 = &src.data[((size_t)y0 * src.w + x0) * c];
      const uint8_t* p01 = &src.data[((size_t)y0 * src.w + x1) * c];
      const uint8_t* p10 = &src.data[((size_t)y1 * src.w + x0) * c];
      const uint8_t* p11 = &src.data[((size_t)y1 * src.w + x1) * c];
      uint8_t* o = &dst[((size_t)y * tw + x) * c];
      for (int k = 0; k < c; k++) {
        float top = p00[k] * (1 - fx) + p01[k] * fx;
        float bot = p10[k] * (1 - fx) + p11[k] * fx;
        float v = top * (1 - fy) + bot * fy;
        o[k] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// torch 'nearest' (asymmetric floor mapping) for labels.
void resize_nearest(const Image& src, int tw, int th, uint8_t* dst) {
  const int c = src.channels;
  for (int y = 0; y < th; y++) {
    int sy = (int)((int64_t)y * src.h / th);
    for (int x = 0; x < tw; x++) {
      int sx = (int)((int64_t)x * src.w / tw);
      memcpy(&dst[((size_t)y * tw + x) * c],
             &src.data[((size_t)sy * src.w + sx) * c], c);
    }
  }
}

}  // namespace

extern "C" {

// Query decoded dimensions. Returns 0 on success.
int vfm_image_size(const char* path, int* w, int* h) {
  Image img;  // full decode: libpng header-only probing is not worth the
              // extra code path; callers cache sizes
  int rc = decode(path, 3, &img);
  if (rc) return rc;
  *w = img.w;
  *h = img.h;
  return 0;
}

// Decode to RGB uint8 and (optionally) bilinear-resize to (tw, th).
// tw/th == 0 => native size. `out` must hold tw*th*3 (or w*h*3) bytes.
int vfm_load_image(const char* path, int tw, int th, uint8_t* out) {
  Image img;
  int rc = decode(path, 3, &img);
  if (rc) return rc;
  if ((tw == 0 && th == 0) || (tw == img.w && th == img.h)) {
    memcpy(out, img.data.data(), img.data.size());
  } else {
    resize_bilinear(img, tw, th, out);
  }
  return 0;
}

// Decode a label map (single channel) with nearest resize.
int vfm_load_label(const char* path, int tw, int th, uint8_t* out) {
  Image img;
  int rc = decode(path, 1, &img);
  if (rc) return rc;
  if ((tw == 0 && th == 0) || (tw == img.w && th == img.h)) {
    memcpy(out, img.data.data(), img.data.size());
  } else {
    resize_nearest(img, tw, th, out);
  }
  return 0;
}

// Fused (img - mean) / std with bottom/right zero padding to (th, tw).
// img: h*w*3 uint8; out: th*tw*3 float32.
int vfm_normalize_pad(const uint8_t* img, int h, int w, int th, int tw,
                      const float* mean, const float* std_, float pad_val,
                      float* out) {
  float inv[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  for (int y = 0; y < th; y++) {
    for (int x = 0; x < tw; x++) {
      float* o = &out[((size_t)y * tw + x) * 3];
      if (y < h && x < w) {
        const uint8_t* p = &img[((size_t)y * w + x) * 3];
        o[0] = (p[0] - mean[0]) * inv[0];
        o[1] = (p[1] - mean[1]) * inv[1];
        o[2] = (p[2] - mean[2]) * inv[2];
      } else {
        o[0] = o[1] = o[2] = pad_val;
      }
    }
  }
  return 0;
}

}  // extern "C"
