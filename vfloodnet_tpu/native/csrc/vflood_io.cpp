// Native host-IO for vfloodnet_tpu.
//
// The inter-stage contract of the pipeline is indexed-PNG masks
// (SURVEY.md §1: segmentation writes palette PNGs that estimation reads
// back). PIL's palette-PNG encoder costs ~235 ms per 1080p mask — longer
// than the whole per-frame device step — so the hot writer lives here:
// libpng with fast compression and no intermediate copies (~10x faster).
//
// Exposed via ctypes (no pybind11 in the image); see ../__init__.py.

#include <png.h>
#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Write an 8-bit indexed PNG. palette: n_entries * 3 RGB bytes.
// Returns 0 on success.
int vf_write_palette_png(const char* path, const uint8_t* data, int height,
                         int width, const uint8_t* palette, int n_entries,
                         int compress_level) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;

  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(fp);
    return 3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return 4;
  }

  png_init_io(png, fp);
  png_set_compression_level(png, compress_level);
  png_set_filter(png, 0, PNG_FILTER_NONE);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_PALETTE,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);

  std::vector<png_color> plte(n_entries);
  for (int i = 0; i < n_entries; ++i) {
    plte[i].red = palette[i * 3];
    plte[i].green = palette[i * 3 + 1];
    plte[i].blue = palette[i * 3 + 2];
  }
  png_set_PLTE(png, info, plte.data(), n_entries);
  png_write_info(png, info);

  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) {
    rows[y] = const_cast<png_bytep>(data + static_cast<size_t>(y) * width);
  }
  png_write_image(png, rows.data());
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// Read an 8-bit indexed PNG's label plane into out (caller-allocated
// height*width). Returns 0 on success, fills height/width when out==NULL.
int vf_read_palette_png(const char* path, uint8_t* out, int* height,
                        int* width) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  *height = h;
  *width = w;
  if (!out) {  // size query
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
  }
  if (color != PNG_COLOR_TYPE_PALETTE && color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  if (depth < 8) png_set_packing(png);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) {
    rows[y] = out + static_cast<size_t>(y) * w;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

}  // extern "C"
