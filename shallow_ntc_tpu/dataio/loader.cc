// Native data loader: multi-threaded JPEG/PNG decode + random/center crop.
//
// The reference's input pipeline is tf.data (C++ threads under the hood,
// /root/reference/common/data_lib.py pins it to CPU with 16 parallel map
// calls). This is the TPU-native framework's equivalent native component:
// a libjpeg/libpng decoder with a std::thread fan-out that fills a
// pre-allocated uint8 [N, patch, patch, 3] batch, bypassing Python/GIL
// entirely for the decode+crop hot path. Bound via ctypes
// (shallow_ntc_tpu/dataio/__init__.py).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 loader.cc -o libloader.so -ljpeg -lpng

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
  bool ok = false;
};

// --- JPEG ------------------------------------------------------------------
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.data.resize(size_t(img.h) * img.w * 3);
  std::vector<uint8_t*> rows(img.h);
  for (int y = 0; y < img.h; ++y) rows[y] = img.data.data() + size_t(y) * img.w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

// --- PNG -------------------------------------------------------------------
Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  // Normalize to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.h = int(h);
  img.w = int(w);
  img.data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = img.data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (n >= 8 && !png_sig_cmp(magic, 0, 8)) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

}  // namespace

extern "C" {

// Decode one image; returns 0 on success, fills dims. Buffer must hold
// max_bytes; fails if the image exceeds it.
int decode_image(const char* path, uint8_t* out, int64_t max_bytes,
                 int* h, int* w) {
  Image img = decode_file(path);
  if (!img.ok) return -1;
  const int64_t nbytes = int64_t(img.h) * img.w * 3;
  if (nbytes > max_bytes) return -2;
  std::memcpy(out, img.data.data(), size_t(nbytes));
  *h = img.h;
  *w = img.w;
  return 0;
}

// Probe an image's dimensions without keeping the pixels.
int image_dims(const char* path, int* h, int* w) {
  Image img = decode_file(path);  // full decode; dims-only fast paths omitted
  if (!img.ok) return -1;
  *h = img.h;
  *w = img.w;
  return 0;
}

// Decode n images and write (random or center) patch crops into
// out [n, patch, patch, 3] uint8, using `threads` worker threads.
// seeds[i] selects the crop (seed < 0 => center crop).
// Returns the number of failures (0 == all good); failed slots are zeroed.
int decode_crop_batch(const char** paths, int n, int patch,
                      const int64_t* seeds, uint8_t* out, int threads) {
  std::vector<int> failures(n, 0);
  const size_t patch_bytes = size_t(patch) * patch * 3;
  auto worker = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      Image img = decode_file(paths[i]);
      uint8_t* dst = out + size_t(i) * patch_bytes;
      if (!img.ok || img.h < patch || img.w < patch) {
        std::memset(dst, 0, patch_bytes);
        failures[i] = 1;
        continue;
      }
      int y0, x0;
      if (seeds[i] < 0) {
        y0 = (img.h - patch) / 2;
        x0 = (img.w - patch) / 2;
      } else {
        std::mt19937_64 rng{static_cast<uint64_t>(seeds[i])};
        y0 = int(rng() % uint64_t(img.h - patch + 1));
        x0 = int(rng() % uint64_t(img.w - patch + 1));
      }
      for (int y = 0; y < patch; ++y) {
        std::memcpy(dst + size_t(y) * patch * 3,
                    img.data.data() + (size_t(y0 + y) * img.w + x0) * 3,
                    size_t(patch) * 3);
      }
    }
  };
  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  for (int t = 1; t < threads; ++t) pool.emplace_back(worker, t, threads);
  worker(0, threads);
  for (auto& th : pool) th.join();
  int nfail = 0;
  for (int v : failures) nfail += v;
  return nfail;
}

}  // extern "C"
