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

// Decode a JPEG from an in-memory buffer to tightly-packed RGB.  Returns
// malloc'd buffer (caller frees) or nullptr.  The memory source is the
// single decompress implementation: the file path below reads the bytes
// and lands here, and dt-serve feeds request bodies to it directly (no
// temp files, no PIL — the serving decode rides the same code the loader
// uses, off the GIL via ctypes).
uint8_t* decode_rgb_mem(const uint8_t* data, size_t len, int* height,
                        int* width) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  uint8_t* buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    free(buffer);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int stride = w * 3;
  buffer = static_cast<uint8_t*>(malloc(static_cast<size_t>(h) * stride));
  if (!buffer) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *height = h;
  *width = w;
  return buffer;
}

// Decode a JPEG file to tightly-packed RGB. Returns malloc'd buffer (caller
// frees) or nullptr.
uint8_t* decode_rgb(const char* path, int* height, int* width) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return nullptr; }
  const long fsize = ftell(f);
  if (fsize <= 0) { fclose(f); return nullptr; }
  rewind(f);
  uint8_t* bytes = static_cast<uint8_t*>(malloc(static_cast<size_t>(fsize)));
  if (!bytes) { fclose(f); return nullptr; }
  const size_t got = fread(bytes, 1, static_cast<size_t>(fsize), f);
  fclose(f);
  if (got != static_cast<size_t>(fsize)) { free(bytes); return nullptr; }
  uint8_t* out = decode_rgb_mem(bytes, got, height, width);
  free(bytes);
  return out;
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

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// cv2-bit-exact BICUBIC resize of packed RGB uint8 (OpenCV INTER_CUBIC, 8U
// path; oracle cv2.resize, cf. the INTER_LINEAR twin below).  The DINO
// multi-crop pipeline's RandomResizedCrop uses INTER_CUBIC
// (train/dino_pretrain.py:_rrc), so this replicates cv2's arithmetic:
//   * coords/coeffs exactly like linear: (i+0.5)*scale-0.5 in double, cast
//     to float, floor; 4-tap Catmull-Rom-style kernel A=-0.75 computed in
//     float; fixed-point saturate_cast<short>(w * 2048) round-half-even
//   * border taps CLAMP their index; unlike linear, coefficients of
//     out-of-range taps are NOT redistributed (clamping the index is what
//     cv2's border handling amounts to for replicate)
//   * horizontal pass in int32 (u8 * short taps)
//   * vertical pass follows cv2's SIMD float path (VResizeCubicVec_32s8u):
//     each int row scales by beta[i]/2048^2 as float32,
//     (S0*b0 + S1*b1) + (S2*b2 + S3*b3), round-half-even, saturate
// Exactness contract (tests/test_native_augment.py): cv2's OWN INTER_CUBIC
// output is not stable across machines — the default wheel routes through
// Intel IPP, the generic fallback mixes a SIMD-float row body with a
// fixed-point scalar tail (so even the generic path varies with vector
// width).  All variants agree within +-1 level; this implementation sits
// in that same envelope (measured <=7% of pixels off by 1 vs any given
// cv2 build), and is itself deterministic across hosts.
void cubic_coeffs_2048(float t, int32_t* c) {
  const float A = -0.75f;
  const float w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A;
  const float w1 = ((A + 2) * t - (A + 3)) * t * t + 1;
  const float w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1;
  const float w3 = 1.f - w0 - w1 - w2;
  c[0] = static_cast<int32_t>(std::nearbyint(static_cast<double>(w0) * 2048.0));
  c[1] = static_cast<int32_t>(std::nearbyint(static_cast<double>(w1) * 2048.0));
  c[2] = static_cast<int32_t>(std::nearbyint(static_cast<double>(w2) * 2048.0));
  c[3] = static_cast<int32_t>(std::nearbyint(static_cast<double>(w3) * 2048.0));
}

void resize_cubic_u8_cv2(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw) {
  std::vector<int> xi(static_cast<size_t>(dw) * 4);
  std::vector<int32_t> xc(static_cast<size_t>(dw) * 4);
  // cv2 computes the forward scale as the reciprocal of the inverse scale
  // (resize.cpp: scale_x = 1./inv_scale_x) — the last-ulp difference vs
  // sw/dw flips coefficient LSBs, so it must be reproduced exactly
  const double scale_x = 1.0 / (static_cast<double>(dw) / sw);
  for (int x = 0; x < dw; ++x) {
    const float c = static_cast<float>((x + 0.5) * scale_x - 0.5);
    const int s = static_cast<int>(std::floor(c));
    cubic_coeffs_2048(c - static_cast<float>(s), xc.data() + 4 * x);
    for (int i = 0; i < 4; ++i) xi[4 * x + i] = clampi(s - 1 + i, 0, sw - 1);
  }
  const double scale_y = 1.0 / (static_cast<double>(dh) / sh);
  // 4-row int32 cache of horizontally-resized source rows
  std::vector<int32_t> rows(static_cast<size_t>(4) * dw * 3);
  int have[4] = {-1, -1, -1, -1};
  auto hresize = [&](int sy, int slot) {
    const uint8_t* r = src + static_cast<size_t>(sy) * sw * 3;
    int32_t* out = rows.data() + static_cast<size_t>(slot) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int* ix = xi.data() + 4 * x;
      const int32_t* cx = xc.data() + 4 * x;
      for (int ch = 0; ch < 3; ++ch)
        out[x * 3 + ch] = r[ix[0] * 3 + ch] * cx[0] + r[ix[1] * 3 + ch] * cx[1]
                        + r[ix[2] * 3 + ch] * cx[2] + r[ix[3] * 3 + ch] * cx[3];
    }
    have[slot] = sy;
  };
  for (int y = 0; y < dh; ++y) {
    const float c = static_cast<float>((y + 0.5) * scale_y - 0.5);
    const int s = static_cast<int>(std::floor(c));
    int32_t bc[4];
    cubic_coeffs_2048(c - static_cast<float>(s), bc);
    const int32_t* S[4];
    for (int i = 0; i < 4; ++i) {
      const int sy = clampi(s - 1 + i, 0, sh - 1);
      int slot = -1;
      for (int j = 0; j < 4; ++j)
        if (have[j] == sy) { slot = j; break; }
      if (slot < 0) {  // evict a slot not needed by this dst row
        for (int j = 0; j < 4; ++j) {
          bool needed = false;
          for (int k = 0; k < i; ++k)
            if (have[j] >= 0 && have[j] == clampi(s - 1 + k, 0, sh - 1))
              needed = true;
          if (!needed) { slot = j; break; }
        }
        hresize(sy, slot);
      }
      S[i] = rows.data() + static_cast<size_t>(slot) * dw * 3;
    }
    const float inv = 1.0f / (2048.0f * 2048.0f);
    const float b0 = bc[0] * inv, b1 = bc[1] * inv;
    const float b2 = bc[2] * inv, b3 = bc[3] * inv;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int j = 0; j < dw * 3; ++j) {
      const float v = (static_cast<float>(S[0][j]) * b0
                       + static_cast<float>(S[1][j]) * b1)
                    + (static_cast<float>(S[2][j]) * b2
                       + static_cast<float>(S[3][j]) * b3);
      const int iv = static_cast<int>(std::nearbyint(v));
      out[j] = static_cast<uint8_t>(clampi(iv, 0, 255));
    }
  }
}

// cv2-bit-exact bilinear resize of packed RGB uint8 (OpenCV INTER_LINEAR,
// 8U fixed-point path).  The augmentation pipeline's oracle is cv2 (the
// reference's albumentations wraps it), so this path replicates cv2's exact
// integer arithmetic, derived empirically and verified bit-equal across
// 100+ shape pairs (tests/test_native_augment.py):
//   * continuous coord (i+0.5)*scale-0.5 computed in double, CAST TO FLOAT
//     before the floor (cv2 stores fx as float)
//   * both tap indices clamped independently to [0, n-1]; the fraction is
//     KEPT at borders (no degenerate 2048/0 snap)
//   * coefficients saturate_cast<short>(frac * 2048), round-half-to-even
//   * horizontal pass in int32; vertical pass via the SIMD-equivalent
//     (((b0*(r0>>4))>>16) + ((b1*(r1>>4))>>16) + 2) >> 2
// (resize_bilinear_u8 above keeps the DEVICE convention — it bit-matches
// dino_tpu.ops.resize for the eval/load path; two oracles, two functions.)
void resize_bilinear_u8_cv2(const uint8_t* src, int sh, int sw, uint8_t* dst,
                            int dh, int dw) {
  std::vector<int> x0(dw), x1(dw);
  std::vector<int32_t> ax0(dw), ax1(dw);
  const double scale_x = static_cast<double>(sw) / dw;
  for (int x = 0; x < dw; ++x) {
    const float c = static_cast<float>((x + 0.5) * scale_x - 0.5);
    const int s = static_cast<int>(std::floor(c));
    const float frac = c - static_cast<float>(s);
    x0[x] = clampi(s, 0, sw - 1);
    x1[x] = clampi(s + 1, 0, sw - 1);
    ax0[x] = static_cast<int32_t>(std::nearbyint((1.0 - frac) * 2048.0));
    ax1[x] = static_cast<int32_t>(std::nearbyint(frac * 2048.0));
  }
  const double scale_y = static_cast<double>(sh) / dh;
  std::vector<int32_t> rowA(static_cast<size_t>(dw) * 3);
  std::vector<int32_t> rowB(static_cast<size_t>(dw) * 3);
  auto hresize = [&](int sy, int32_t* out) {
    const uint8_t* r = src + static_cast<size_t>(sy) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      for (int c = 0; c < 3; ++c)
        out[x * 3 + c] = r[a + c] * ax0[x] + r[b + c] * ax1[x];
    }
  };
  int haveA = -1, haveB = -1;
  for (int y = 0; y < dh; ++y) {
    const float c = static_cast<float>((y + 0.5) * scale_y - 0.5);
    const int s = static_cast<int>(std::floor(c));
    const float frac = c - static_cast<float>(s);
    const int yA = clampi(s, 0, sh - 1);
    const int yB = clampi(s + 1, 0, sh - 1);
    const int64_t b0 = static_cast<int64_t>(std::nearbyint((1.0 - frac) * 2048.0));
    const int64_t b1 = static_cast<int64_t>(std::nearbyint(frac * 2048.0));
    if (haveA != yA) {
      if (haveB == yA) { rowA.swap(rowB); haveB = haveA; }
      else hresize(yA, rowA.data());
      haveA = yA;
    }
    if (haveB != yB) { hresize(yB, rowB.data()); haveB = yB; }
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int j = 0; j < dw * 3; ++j) {
      const int64_t v = ((b0 * (rowA[j] >> 4)) >> 16)
                      + ((b1 * (rowB[j] >> 4)) >> 16);
      out[j] = static_cast<uint8_t>(clampi(
          static_cast<int>((v + 2) >> 2), 0, 255));
    }
  }
}

// ---------------------------------------------------------------------------
// Training augmentations (parameters drawn in Python — data/augment.py
// draw_params/pack_params — pixels transformed here, off the GIL).
// Pipeline per sample: decode -> resize(res) -> crop+resize -> warpAffine
// (reflect-101) -> hflip -> color jitter -> gaussian blur.
// ---------------------------------------------------------------------------

inline int reflect101(int p, int n) {
  if (n <= 1) return 0;
  const int period = 2 * (n - 1);
  p %= period;
  if (p < 0) p += period;
  return p < n ? p : period - p;
}

// Nearest resize of an int32 mask: src row = floor(dst * sh / dh)
// (torchvision NEAREST, matching dino_tpu.ops.resize.nearest_resize_indices).
void resize_nearest_i32(const int32_t* src, int sh, int sw, int32_t* dst,
                        int dh, int dw) {
  std::vector<int> ci(dw);
  for (int x = 0; x < dw; ++x)
    ci[x] = clampi(static_cast<int>(std::floor(
        static_cast<double>(x) * sw / dw)), 0, sw - 1);
  for (int y = 0; y < dh; ++y) {
    const int sy = clampi(static_cast<int>(std::floor(
        static_cast<double>(y) * sh / dh)), 0, sh - 1);
    const int32_t* row = src + static_cast<size_t>(sy) * sw;
    int32_t* out = dst + static_cast<size_t>(y) * dw;
    for (int x = 0; x < dw; ++x) out[x] = row[ci[x]];
  }
}

// Invert a forward 2x3 affine (cv2.warpAffine semantics: dst = M(src), so
// sampling runs through M^-1).
void invert_affine(const float m[6], double inv[6]) {
  const double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5];
  const double det = a * e - b * d;
  const double s = det != 0.0 ? 1.0 / det : 0.0;
  inv[0] = e * s;  inv[1] = -b * s;
  inv[3] = -d * s; inv[4] = a * s;
  inv[2] = -(inv[0] * c + inv[1] * f);
  inv[5] = -(inv[3] * c + inv[4] * f);
}

// warpAffine as the exact two-rounding f32 recipe (data/augment.py
// warp_affine_u8 holds the same arithmetic; -ffp-contract=off keeps the
// mul/add pairs un-fused, so the two implementations are BIT-IDENTICAL —
// round 5; see the recipe block comment in data/augment.py for why this
// is a defined recipe rather than a replica of cv2 5.0's build-dependent
// f32 SIMD warp).
void warp_affine_u8(const uint8_t* src, int h, int w, uint8_t* dst,
                    int oh, int ow, const float m[6]) {
  double inv[6];
  invert_affine(m, inv);
  const float m0 = static_cast<float>(inv[0]);
  const float m1 = static_cast<float>(inv[1]);
  const float m2 = static_cast<float>(inv[2]);
  const float m3 = static_cast<float>(inv[3]);
  const float m4 = static_cast<float>(inv[4]);
  const float m5 = static_cast<float>(inv[5]);
  for (int y = 0; y < oh; ++y) {
    uint8_t* out = dst + static_cast<size_t>(y) * ow * 3;
    // row base: f32 mul then f32 add (the recipe's two roundings)
    const float bx = m1 * static_cast<float>(y) + m2;
    const float by = m4 * static_cast<float>(y) + m5;
    for (int x = 0; x < ow; ++x) {
      const float sx = m0 * static_cast<float>(x) + bx;
      const float sy = m3 * static_cast<float>(x) + by;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const float tx = sx - static_cast<float>(x0);
      const float ty = sy - static_cast<float>(y0);
      const int xa = reflect101(x0, w), xb = reflect101(x0 + 1, w);
      const int ya = reflect101(y0, h), yb = reflect101(y0 + 1, h);
      const uint8_t* r0 = src + static_cast<size_t>(ya) * w * 3;
      const uint8_t* r1 = src + static_cast<size_t>(yb) * w * 3;
      for (int c = 0; c < 3; ++c) {
        const float t00 = r0[xa * 3 + c], t01 = r0[xb * 3 + c];
        const float t10 = r1[xa * 3 + c], t11 = r1[xb * 3 + c];
        const float a = t00 + tx * (t01 - t00);
        const float b = t10 + tx * (t11 - t10);
        const float v = a + ty * (b - a);
        out[x * 3 + c] = static_cast<uint8_t>(clampi(
            static_cast<int>(std::floor(static_cast<double>(v) + 0.5)),
            0, 255));
      }
    }
  }
}

void warp_affine_i32_nearest(const int32_t* src, int h, int w, int32_t* dst,
                             int oh, int ow, const float m[6]) {
  double inv[6];
  invert_affine(m, inv);
  const float m0 = static_cast<float>(inv[0]);
  const float m1 = static_cast<float>(inv[1]);
  const float m2 = static_cast<float>(inv[2]);
  const float m3 = static_cast<float>(inv[3]);
  const float m4 = static_cast<float>(inv[4]);
  const float m5 = static_cast<float>(inv[5]);
  for (int y = 0; y < oh; ++y) {
    int32_t* out = dst + static_cast<size_t>(y) * ow;
    const float bx = m1 * static_cast<float>(y) + m2;
    const float by = m4 * static_cast<float>(y) + m5;
    for (int x = 0; x < ow; ++x) {
      // same f32 coords as the bilinear recipe; nearest = floor(v + .5)
      const float sx = m0 * static_cast<float>(x) + bx;
      const float sy = m3 * static_cast<float>(x) + by;
      const int xi = reflect101(static_cast<int>(std::floor(
          static_cast<double>(sx) + 0.5)), w);
      const int yi = reflect101(static_cast<int>(std::floor(
          static_cast<double>(sy) + 0.5)), h);
      out[x] = src[static_cast<size_t>(yi) * w + xi];
    }
  }
}

// The three color conversions in the jitter chain, as EXACT recipes
// bit-equal to this cv2 build's cvtColor (exhaustively verified from the
// Python side over every input; data/augment.py holds the same recipes,
// which is what makes cross-backend jitter bit-exact — round 4).

// cv2 RGB2GRAY on uint8: IPP's shift-15 fixed point with round-half-up.
inline int gray_u8i(int r, int g, int b) {
  return (r * 9798 + g * 19235 + b * 3735 + 16384) >> 15;
}
inline int gray_u8(float r, float g, float b) {  // float-held u8 values
  return gray_u8i(static_cast<int>(r), static_cast<int>(g),
                  static_cast<int>(b));
}

// cv2 RGB2HSV u8 div tables (hsv_shift = 12).
struct HsvLuts {
  int32_t sdiv[256];
  int32_t hdiv[256];
  HsvLuts() {
    sdiv[0] = hdiv[0] = 0;
    for (int i = 1; i < 256; ++i) {
      sdiv[i] = static_cast<int32_t>(std::lround((255 << 12) / (1.0 * i)));
      hdiv[i] = static_cast<int32_t>(std::lround((180 << 12) / (6.0 * i)));
    }
  }
};
const HsvLuts kHsv;

// cv2 uint8 RGB2HSV (H in [0,180)): the integer div-table path.
inline void rgb_to_hsv_u8(uint8_t r8, uint8_t g8, uint8_t b8,
                          uint8_t* hh, uint8_t* ss, uint8_t* vv) {
  const int r = r8, g = g8, b = b8;
  const int v = r > g ? (r > b ? r : b) : (g > b ? g : b);
  const int mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
  const int diff = v - mn;
  *vv = static_cast<uint8_t>(v);
  *ss = static_cast<uint8_t>((diff * kHsv.sdiv[v] + (1 << 11)) >> 12);
  int h = (v == r) ? (g - b)
        : (v == g) ? (b - r + 2 * diff)
                   : (r - g + 4 * diff);
  h = (h * kHsv.hdiv[diff] + (1 << 11)) >> 12;
  h += h < 0 ? 180 : 0;
  *hh = static_cast<uint8_t>(h);
}

// cv2-shaped uint8 HSV2RGB: float32 sector math, truncating output cast.
// The 1 - s*f terms are plain TWO-ROUNDING f32 (mul, round, subtract —
// the named temporaries plus -ffp-contract=off keep it that way): the
// form numpy and the TPU compute natively, making the three backends
// bit-identical; it deviates from this cv2 build's own (fma-contracted)
// cvtColor on ~5e-5 of inputs by one level (data/augment.py:
// hsv_to_rgb_u8 — same recipe; tests pin cross-backend equality).
// Branchless sector selection: vals = {v,p,q,t} via per-sector tables.
inline void hsv_to_rgb_u8(uint8_t hh, uint8_t ss, uint8_t vv,
                          uint8_t* r, uint8_t* g, uint8_t* b) {
  static const uint8_t RSEL[6] = {0, 2, 1, 1, 3, 0};
  static const uint8_t GSEL[6] = {3, 0, 0, 2, 1, 1};
  static const uint8_t BSEL[6] = {1, 1, 3, 0, 0, 2};
  const float h = hh * (6.0f / 180.0f);  // sector position in [0, 6)
  const float s = ss * (1.0f / 255.0f);
  const float v = vv * (1.0f / 255.0f);
  int sector = static_cast<int>(h);
  const float f = h - sector;
  sector = sector >= 6 ? 0 : sector;
  const float sf = s * f;
  const float sg = s * (1.0f - f);
  float vals[4];
  vals[0] = v;
  vals[1] = v * (1.0f - s);
  vals[2] = v * (1.0f - sf);
  vals[3] = v * (1.0f - sg);
  *r = static_cast<uint8_t>(vals[RSEL[sector]] * 255.0f);
  *g = static_cast<uint8_t>(vals[GSEL[sector]] * 255.0f);
  *b = static_cast<uint8_t>(vals[BSEL[sector]] * 255.0f);
}

// torchvision-style ColorJitter: factors applied in the drawn order, float
// accumulator clipped to [0,255] after every op (matches data/augment.py).
inline float clampf(float v) {  // plain ternaries vectorize (fmin/fmax's
  return v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);  // NaN rules don't)
}

void color_jitter(float* x, int h, int w, const float order[4],
                  float fb, float fc, float fs, float fh) {
  // BIT-EXACT vs data/augment.py:_apply_jitter: every op is the same
  // single-rounded f32 op (the mul and add are SEPARATE statements — the
  // oracle is numpy, which never contracts to fma; the named temporary
  // keeps -ffp-contract from fusing them here) or exact integer math.
  const size_t n = static_cast<size_t>(h) * w;
  for (int oi = 0; oi < 4; ++oi) {
    const int kind = static_cast<int>(order[oi]);
    if (kind == 0) {  // brightness
      for (size_t i = 0; i < 3 * n; ++i) x[i] = clampf(x[i] * fb);
    } else if (kind == 1) {  // contrast: blend with mean gray
      // exact integer-sum mean, split q + fl32(r/n) like the oracle
      int64_t acc = 0;
      for (size_t i = 0; i < n; ++i)
        acc += gray_u8(x[3 * i], x[3 * i + 1], x[3 * i + 2]);
      const int64_t q = acc / static_cast<int64_t>(n);
      const int64_t rr = acc % static_cast<int64_t>(n);
      const float frac = static_cast<float>(rr) / static_cast<float>(n);
      const float mean = static_cast<float>(q) + frac;
      const float add = mean * (1.0f - fc);
      for (size_t i = 0; i < 3 * n; ++i) {
        const float t = x[i] * fc;
        x[i] = clampf(t + add);
      }
    } else if (kind == 2) {  // saturation: blend with per-pixel gray
      const float ks = 1.0f - fs;
      for (size_t i = 0; i < n; ++i) {
        const float gy = gray_u8(x[3 * i], x[3 * i + 1], x[3 * i + 2]) * ks;
        const float t0 = x[3 * i] * fs;
        const float t1 = x[3 * i + 1] * fs;
        const float t2 = x[3 * i + 2] * fs;
        x[3 * i] = clampf(t0 + gy);
        x[3 * i + 1] = clampf(t1 + gy);
        x[3 * i + 2] = clampf(t2 + gy);
      }
    } else {  // hue shift through u8 HSV round-trip (numpy cast truncates)
      // rne like np.rint (lrintf under the default rounding mode)
      const int shift = static_cast<int>(std::lrintf(fh * 180.0f));
      for (size_t i = 0; i < n; ++i) {
        uint8_t r = static_cast<uint8_t>(x[3 * i]);
        uint8_t g = static_cast<uint8_t>(x[3 * i + 1]);
        uint8_t b = static_cast<uint8_t>(x[3 * i + 2]);
        uint8_t hh, ss, vv;
        rgb_to_hsv_u8(r, g, b, &hh, &ss, &vv);
        int hn = (hh + shift) % 180;
        if (hn < 0) hn += 180;
        hsv_to_rgb_u8(static_cast<uint8_t>(hn), ss, vv, &r, &g, &b);
        x[3 * i] = r; x[3 * i + 1] = g; x[3 * i + 2] = b;
      }
    }
  }
}

// Separable Gaussian blur, reflect-101 borders.  sigma <= 0 follows cv2's
// sigma=0 taps exactly: hardcoded small-kernel tables for k <= 7 and an
// 8-bit fixed-point quantization at k = 9 (cv2's bit-exact u8 path), the
// 0.3((k-1)/2 - 1) + 0.8 formula only from k >= 11 — the formula alone was
// measured up to ~6 levels off the oracle at k=3 hard edges.  sigma > 0
// matches an explicit cv2.GaussianBlur(..., sigmaX=sigma) (the DINO
// pil_augs radius).
void gaussian_blur_u8(uint8_t* img, int h, int w, int k,
                      double sigma_in = 0.0) {
  if (k < 3) return;
  const int half = k / 2;
  std::vector<float> kern(k);
  static const float small3[] = {0.25f, 0.5f, 0.25f};
  static const float small5[] = {0.0625f, 0.25f, 0.375f, 0.25f, 0.0625f};
  static const float small7[] = {0.03125f, 0.109375f, 0.21875f, 0.28125f,
                                 0.21875f, 0.109375f, 0.03125f};
  // tables apply to the odd sizes cv2 hardcodes ONLY; an even k (never
  // drawn by the pipelines, but this is a general utility) falls through
  // to the normalized formula path rather than a truncated table prefix
  if (sigma_in <= 0.0 && (k == 3 || k == 5 || k == 7)) {
    const float* tab = k == 3 ? small3 : (k == 5 ? small5 : small7);
    for (int i = 0; i < k; ++i) kern[i] = tab[i];
  } else {
    const double sigma = sigma_in > 0.0
        ? sigma_in : 0.3 * ((k - 1) * 0.5 - 1.0) + 0.8;
    std::vector<double> g(k);
    double sum = 0.0;
    for (int i = 0; i < k; ++i) {
      const double d = i - half;
      g[i] = std::exp(-d * d / (2 * sigma * sigma));
      sum += g[i];
    }
    for (int i = 0; i < k; ++i) g[i] /= sum;
    if (sigma_in <= 0.0 && k >= 9) {
      // /256 fixed point for every k >= 9 (cv2's own treatment at k = 9,
      // extended in round 5): dyadic taps make both separable passes
      // exact f32 arithmetic (all magnitudes < 2^24), so the blur is
      // bit-identical across the numpy/C++/XLA implementations
      // regardless of accumulation order — see ops/device_augment.py
      // _gaussian_taps for the full argument.
      double qsum = 0.0;
      for (int i = 0; i < k; ++i) {
        g[i] = std::floor(g[i] * 256.0 + 0.5);
        qsum += g[i];
      }
      g[half] += 256.0 - qsum;
      for (int i = 0; i < k; ++i) g[i] /= 256.0;
    }
    for (int i = 0; i < k; ++i) kern[i] = static_cast<float>(g[i]);
  }

  // Horizontal pass over a border-reflected padded row: tap-outer loops run
  // contiguous FMA over the row (SIMD-friendly), no per-pixel reflect calls.
  const int rowlen = w * 3;
  std::vector<float> tmp(static_cast<size_t>(h) * rowlen);
  std::vector<float> pad(static_cast<size_t>(w + 2 * half) * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img + static_cast<size_t>(y) * rowlen;
    for (int x = -half; x < w + half; ++x) {
      const int sx = reflect101(x, w);
      float* p = pad.data() + static_cast<size_t>(x + half) * 3;
      p[0] = row[sx * 3]; p[1] = row[sx * 3 + 1]; p[2] = row[sx * 3 + 2];
    }
    float* out = tmp.data() + static_cast<size_t>(y) * rowlen;
    memset(out, 0, sizeof(float) * rowlen);
    for (int i = 0; i < k; ++i) {
      const float kv = kern[i];
      const float* p = pad.data() + static_cast<size_t>(i) * 3;
      for (int j = 0; j < rowlen; ++j) out[j] += kv * p[j];
    }
  }
  // Vertical pass: row-wise AXPY over contiguous float rows.
  std::vector<float> acc(rowlen);
  for (int y = 0; y < h; ++y) {
    memset(acc.data(), 0, sizeof(float) * rowlen);
    for (int i = 0; i < k; ++i) {
      const float kv = kern[i];
      const float* row =
          tmp.data() + static_cast<size_t>(reflect101(y + i - half, h)) * rowlen;
      for (int j = 0; j < rowlen; ++j) acc[j] += kv * row[j];
    }
    uint8_t* out = img + static_cast<size_t>(y) * rowlen;
    for (int j = 0; j < rowlen; ++j)
      out[j] = static_cast<uint8_t>(clampi(
          static_cast<int>(acc[j] + 0.5f), 0, 255));
  }
}

// One sample through the full pipeline. params layout (float32[24], see
// data/augment.py pack_params): [do_crop, x0, y0, cw, ch, do_affine, m00,
// m01, m02, m10, m11, m12, do_flip, do_jitter, order0..3, fb, fc, fs, fh,
// do_blur, k].
int augment_one(const char* path, const int32_t* mask_in, int mh, int mw,
                int res, const float* p, uint8_t* out_img, int32_t* out_mask) {
  int sh, sw;
  uint8_t* raw = decode_rgb(path, &sh, &sw);
  if (!raw) return -1;

  std::vector<uint8_t> img(static_cast<size_t>(res) * res * 3);
  std::vector<int32_t> mask(static_cast<size_t>(res) * res);
  resize_bilinear_u8_cv2(raw, sh, sw, img.data(), res, res);
  free(raw);
  resize_nearest_i32(mask_in, mh, mw, mask.data(), res, res);

  std::vector<uint8_t> ibuf;
  std::vector<int32_t> mbuf;
  if (p[0] > 0.5f) {  // RandomResizedCrop
    const int x0 = static_cast<int>(p[1]), y0 = static_cast<int>(p[2]);
    const int cw = static_cast<int>(p[3]), ch = static_cast<int>(p[4]);
    std::vector<uint8_t> ci(static_cast<size_t>(ch) * cw * 3);
    std::vector<int32_t> cm(static_cast<size_t>(ch) * cw);
    for (int y = 0; y < ch; ++y) {
      memcpy(ci.data() + static_cast<size_t>(y) * cw * 3,
             img.data() + (static_cast<size_t>(y0 + y) * res + x0) * 3,
             static_cast<size_t>(cw) * 3);
      for (int x = 0; x < cw; ++x)
        cm[static_cast<size_t>(y) * cw + x] =
            mask[static_cast<size_t>(y0 + y) * res + x0 + x];
    }
    resize_bilinear_u8_cv2(ci.data(), ch, cw, img.data(), res, res);
    resize_nearest_i32(cm.data(), ch, cw, mask.data(), res, res);
  }
  if (p[5] > 0.5f) {  // ShiftScaleRotate
    ibuf = img;
    mbuf = mask;
    warp_affine_u8(ibuf.data(), res, res, img.data(), res, res, p + 6);
    warp_affine_i32_nearest(mbuf.data(), res, res, mask.data(), res, res,
                            p + 6);
  }
  if (p[12] > 0.5f) {  // HorizontalFlip
    for (int y = 0; y < res; ++y) {
      uint8_t* row = img.data() + static_cast<size_t>(y) * res * 3;
      int32_t* mrow = mask.data() + static_cast<size_t>(y) * res;
      for (int x = 0; x < res / 2; ++x) {
        for (int c = 0; c < 3; ++c)
          std::swap(row[x * 3 + c], row[(res - 1 - x) * 3 + c]);
        std::swap(mrow[x], mrow[res - 1 - x]);
      }
    }
  }
  if (p[13] > 0.5f) {  // ColorJitter
    std::vector<float> xf(img.begin(), img.end());
    color_jitter(xf.data(), res, res, p + 14, p[18], p[19], p[20], p[21]);
    // numpy astype(uint8) truncates (values already clipped to [0,255])
    for (size_t i = 0; i < xf.size(); ++i)
      img[i] = static_cast<uint8_t>(xf[i]);
  }
  if (p[22] > 0.5f)  // GaussianBlur
    gaussian_blur_u8(img.data(), res, res, static_cast<int>(p[23]));

  memcpy(out_img, img.data(), img.size());
  memcpy(out_mask, mask.data(), mask.size() * sizeof(int32_t));
  return 0;
}

// ---------------------------------------------------------------------------
// DINO multi-crop pipeline (parameters drawn in Python —
// train/dino_pretrain.py draw_dino_params — pixels transformed here, off the
// GIL; the pixel oracle is the cv2/numpy apply_dino_crop path).
// Per crop: rect crop -> INTER_CUBIC resize -> hflip -> color jitter ->
// grayscale -> gaussian blur(sigma) -> solarize.
// ---------------------------------------------------------------------------

// params float32[20] per crop: [0]=y0 [1]=x0 [2]=ch [3]=cw [4]=flip
// [5]=do_jitter [6..9]=order [10]=fb [11]=fc [12]=fs [13]=fh [14]=do_gray
// [15]=do_blur [16]=ksize [17]=sigma [18]=do_solarize [19]=out_size
void dino_crop_one(const uint8_t* src, int h, int w, const float* p,
                   uint8_t* out) {
  const int y0 = static_cast<int>(p[0]), x0 = static_cast<int>(p[1]);
  const int ch = static_cast<int>(p[2]), cw = static_cast<int>(p[3]);
  const int size = static_cast<int>(p[19]);
  std::vector<uint8_t> crop(static_cast<size_t>(ch) * cw * 3);
  for (int y = 0; y < ch; ++y)
    memcpy(crop.data() + static_cast<size_t>(y) * cw * 3,
           src + (static_cast<size_t>(y0 + y) * w + x0) * 3,
           static_cast<size_t>(cw) * 3);
  resize_cubic_u8_cv2(crop.data(), ch, cw, out, size, size);
  if (p[4] > 0.5f) {  // HorizontalFlip
    for (int y = 0; y < size; ++y) {
      uint8_t* row = out + static_cast<size_t>(y) * size * 3;
      for (int x = 0; x < size / 2; ++x)
        for (int c = 0; c < 3; ++c)
          std::swap(row[x * 3 + c], row[(size - 1 - x) * 3 + c]);
    }
  }
  if (p[5] > 0.5f) {  // ColorJitter (same kernel as the supervised path)
    std::vector<float> xf(out, out + static_cast<size_t>(size) * size * 3);
    color_jitter(xf.data(), size, size, p + 6, p[10], p[11], p[12], p[13]);
    for (size_t i = 0; i < xf.size(); ++i)
      out[i] = static_cast<uint8_t>(xf[i]);  // numpy cast truncates
  }
  if (p[14] > 0.5f) {  // RandomGrayscale: cv2 u8 RGB2GRAY fixed point
    for (size_t i = 0; i < static_cast<size_t>(size) * size; ++i) {
      const int g = (out[3 * i] * 4899 + out[3 * i + 1] * 9617
                     + out[3 * i + 2] * 1868 + (1 << 13)) >> 14;
      out[3 * i] = out[3 * i + 1] = out[3 * i + 2] =
          static_cast<uint8_t>(g);
    }
  }
  if (p[15] > 0.5f)  // GaussianBlur with the drawn radius as explicit sigma
    gaussian_blur_u8(out, size, size, static_cast<int>(p[16]), p[17]);
  if (p[18] > 0.5f)  // Solarization: v >= 128 -> 255 - v
    for (size_t i = 0; i < static_cast<size_t>(size) * size * 3; ++i)
      if (out[i] >= 128) out[i] = 255 - out[i];
}

}  // namespace

extern "C" {

// DINO multi-crop batch on the C++ thread pool: decode each JPEG ONCE, cut
// 2 global + n_local local crops per image.  params is
// (n, 2 + n_local, 20) float32; out_g is (2, n, g_size, g_size, 3) and
// out_l (n_local, n, l_size, l_size, 3) — the (crop, batch, ...) layout the
// pretrain step consumes, written directly (no Python restack).  Returns
// the number of failed images (caller falls back to the cv2 path).
int dt_dino_crops_batch(const char** paths, int n, int n_local, int g_size,
                        int l_size, const float* params, uint8_t* out_g,
                        uint8_t* out_l, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> failures(n_threads, 0);
  const int n_crops = 2 + n_local;
  const size_t gframe = static_cast<size_t>(g_size) * g_size * 3;
  const size_t lframe = static_cast<size_t>(l_size) * l_size * 3;

  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      int h, w;
      uint8_t* img = decode_rgb(paths[i], &h, &w);
      if (!img) { failures[tid]++; continue; }
      const float* p = params + static_cast<size_t>(i) * n_crops * 20;
      for (int c = 0; c < 2; ++c)
        dino_crop_one(img, h, w, p + static_cast<size_t>(c) * 20,
                      out_g + (static_cast<size_t>(c) * n + i) * gframe);
      for (int c = 0; c < n_local; ++c)
        dino_crop_one(img, h, w, p + static_cast<size_t>(2 + c) * 20,
                      out_l + (static_cast<size_t>(c) * n + i) * lframe);
      free(img);
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

// Augment a batch on the C++ thread pool. Returns the number of failures;
// out_imgs is (n, res, res, 3) u8, out_masks (n, res, res) i32.
int dt_augment_batch(const char** paths, int n, int res, const float* params,
                     const int32_t** masks_in, const int* mask_h,
                     const int* mask_w, uint8_t* out_imgs, int32_t* out_masks,
                     int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> failures(n_threads, 0);
  const size_t iframe = static_cast<size_t>(res) * res * 3;
  const size_t mframe = static_cast<size_t>(res) * res;

  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      if (augment_one(paths[i], masks_in[i], mask_h[i], mask_w[i], res,
                      params + static_cast<size_t>(i) * 24,
                      out_imgs + iframe * i, out_masks + mframe * i) != 0)
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

// Standalone cubic resize (testing: bit-exactness oracle is cv2.resize
// INTER_CUBIC; also reused by the DINO multi-crop pipeline below).
void dt_resize_cubic(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  resize_cubic_u8_cv2(src, sh, sw, dst, dh, dw);
}

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

// Header-only parse of in-memory JPEG bytes: dimensions without decoding
// (microseconds) so the caller can allocate an exact-size output buffer.
int dt_jpeg_dims(const uint8_t* data, long long len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode in-memory JPEG bytes into a caller buffer sized h*w*3 from
// dt_jpeg_dims (the dt-serve request-body path). Returns 0 on success.
int dt_decode_jpeg_mem(const uint8_t* data, long long len, uint8_t* out,
                       int expect_h, int expect_w) {
  int sh, sw;
  uint8_t* buf = decode_rgb_mem(data, static_cast<size_t>(len), &sh, &sw);
  if (!buf) return -1;
  if (sh != expect_h || sw != expect_w) {  // dims changed under us
    free(buf);
    return -2;
  }
  memcpy(out, buf, static_cast<size_t>(sh) * sw * 3);
  free(buf);
  return 0;
}

// Decode + resize in-memory JPEG bytes to (out_h, out_w). Returns 0.
int dt_decode_resize_mem(const uint8_t* data, long long len, int out_h,
                         int out_w, uint8_t* out) {
  int sh, sw;
  uint8_t* buf = decode_rgb_mem(data, static_cast<size_t>(len), &sh, &sw);
  if (!buf) return -1;
  if (sh == out_h && sw == out_w) {
    memcpy(out, buf, static_cast<size_t>(sh) * sw * 3);
  } else {
    resize_bilinear_u8(buf, sh, sw, out, out_h, out_w);
  }
  free(buf);
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

// Standalone warp entries: the exact-f32 recipe warps above, exported so
// the Python-side recipe (data/augment.py:warp_affine_u8/_mask) can
// dispatch here for speed — identical bits by construction (asserted by
// tests/test_native_augment.py).
void dt_warp_affine_u8(const uint8_t* src, int h, int w, int out_size,
                       const float* m6, uint8_t* out) {
  warp_affine_u8(src, h, w, out, out_size, out_size, m6);
}

void dt_warp_affine_i32(const int32_t* src, int h, int w, int out_size,
                        const float* m6, int32_t* out) {
  warp_affine_i32_nearest(src, h, w, out, out_size, out_size, m6);
}

// Standalone blur entry (the exact dyadic-tap recipe; sigma=0 path) —
// data/augment.py:gaussian_blur_u8 dispatches here for speed, numpy
// fallback computes the identical bits (see _gaussian_taps).
void dt_gaussian_blur_u8(uint8_t* img, int h, int w, int k) {
  gaussian_blur_u8(img, h, w, k);
}

}  // extern "C"
