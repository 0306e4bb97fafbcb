// Native host-side data loader: JPEG decode + fused bilinear resize + a
// thread-pool batch API.  This replaces what the reference gets from
// torch DataLoader worker processes + PIL/cv2 (pl_torch_modules.py:354,
// :82-94): decoding happens in C++ threads (no GIL, no per-worker process
// fork), and decode->resize fuses so the full-resolution frame never
// round-trips through Python.
//
// Resize semantics match dino_tpu.ops.resize (cv2 INTER_LINEAR on uint8):
// half-pixel source mapping, edge clamp, round-half-up back to uint8 — so
// host-loaded batches are bit-identical to the device preprocessing path.
//
// C ABI only; bound from Python via ctypes (dino_tpu/data/native_loader.py).

#include <csetjmp>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first (FILE, size_t)

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to tightly-packed RGB. Returns malloc'd buffer (caller
// frees) or nullptr.
uint8_t* decode_rgb(const char* path, int* height, int* width) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  uint8_t* buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buffer);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int stride = w * 3;
  buffer = static_cast<uint8_t*>(malloc(static_cast<size_t>(h) * stride));
  if (!buffer) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *height = h;
  *width = w;
  return buffer;
}

// Half-pixel bilinear resize of packed RGB uint8, round-half-up (matches
// dino_tpu.ops.resize.bilinear_resize_matrix + uint8 rounding).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw) {
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> xt(dw);
  for (int x = 0; x < dw; ++x) {
    float s = (x + 0.5f) * sw / dw - 0.5f;
    if (s < 0) s = 0;
    if (s > sw - 1) s = sw - 1;
    int i0 = static_cast<int>(std::floor(s));
    x0[x] = i0 < 0 ? 0 : (i0 > sw - 1 ? sw - 1 : i0);
    x1[x] = i0 + 1 > sw - 1 ? sw - 1 : i0 + 1;
    xt[x] = s - i0;
  }
  for (int y = 0; y < dh; ++y) {
    float s = (y + 0.5f) * sh / dh - 0.5f;
    if (s < 0) s = 0;
    if (s > sh - 1) s = sh - 1;
    int y0 = static_cast<int>(std::floor(s));
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 > sh - 1 ? sh - 1 : y0 + 1;
    float ty = s - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float tx = xt[x];
      int a = x0[x] * 3, b = x1[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = r0[a + c] * (1 - tx) + r0[b + c] * tx;
        float bot = r1[a + c] * (1 - tx) + r1[b + c] * tx;
        float v = top * (1 - ty) + bot * ty;
        int iv = static_cast<int>(std::floor(v + 0.5f));
        out[x * 3 + c] = iv < 0 ? 0 : (iv > 255 ? 255 : iv);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode into caller buffer of capacity max_h*max_w*3. Returns 0 on success.
int dt_decode_jpeg_file(const char* path, uint8_t* out, int* h, int* w,
                        int max_h, int max_w) {
  int sh, sw;
  uint8_t* buf = decode_rgb(path, &sh, &sw);
  if (!buf) return -1;
  if (sh > max_h || sw > max_w) {
    free(buf);
    return -2;
  }
  memcpy(out, buf, static_cast<size_t>(sh) * sw * 3);
  free(buf);
  *h = sh;
  *w = sw;
  return 0;
}

// Decode + resize to (out_h, out_w) RGB in one pass. Returns 0 on success.
int dt_decode_resize_file(const char* path, int out_h, int out_w,
                          uint8_t* out) {
  int sh, sw;
  uint8_t* buf = decode_rgb(path, &sh, &sw);
  if (!buf) return -1;
  if (sh == out_h && sw == out_w) {
    memcpy(out, buf, static_cast<size_t>(sh) * sw * 3);
  } else {
    resize_bilinear_u8(buf, sh, sw, out, out_h, out_w);
  }
  free(buf);
  return 0;
}

// Decode+resize a batch of files into a packed (n, out_h, out_w, 3) buffer
// using a C++ thread pool. Returns the number of failures.
int dt_load_batch(const char** paths, int n, int out_h, int out_w,
                  uint8_t* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> failures(n_threads, 0);
  const size_t frame = static_cast<size_t>(out_h) * out_w * 3;

  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      if (dt_decode_resize_file(paths[i], out_h, out_w, out + frame * i) != 0)
        failures[tid]++;
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
