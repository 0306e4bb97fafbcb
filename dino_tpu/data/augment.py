"""Host-side training augmentations, semantics-equivalent to the reference's
albumentations pipeline (pl_torch_modules.py:44-57):

    Resize(480) -> RandomResizedCrop(480, scale=(.25,1), ratio=(.9,1.1), p=.75)
    -> ShiftScaleRotate(shift=.4, scale=.1, rotate=15, p=.25)
    -> HorizontalFlip(p=.5) -> ColorJitter(brightness=.5, p=.5)
    -> GaussianBlur(blur_limit=(3,41), p=.25)

Images are interpolated bilinearly, masks nearest; affine borders reflect-101
(albumentations defaults).  Implemented with cv2 (the same SIMD backend
albumentations wraps) over a numpy Generator, so augmentation distributions
match while staying independent of the torch RNG stream.  Normalization is NOT
done here — it fuses into the device graph (dino_tpu.ops.preprocess).

Backend pixel contract (cv2 path here vs the native C++ path,
native/dtloader.cpp, pinned by tests/test_native_augment.py): all RANDOM
PARAMETERS are seed-exact on both backends (drawn only here); resize / crop /
flip produce BIT-IDENTICAL pixels (the C++ resize replicates cv2's
INTER_LINEAR fixed-point arithmetic); ColorJitter is BIT-IDENTICAL (round 4:
the chain is defined as exact f32/integer arithmetic — fx15 gray,
hsv_shift=12 HSV tables, two-rounding float sector math — that every
backend reproduces, see _apply_jitter); warpAffine is BIT-IDENTICAL
(round 5: defined as an exact two-rounding f32 recipe, see warp_affine_u8
— it deviates from cv2 5.0's own build-dependent f32 SIMD warp on ~1e-4
of pixels by one level, the hsv fma trade); blur is BIT-IDENTICAL for
every k (round 5: dyadic /256 taps make both separable passes exact
float arithmetic, see gaussian_blur_u8 — k <= 9 equals cv2's own output,
k >= 11 deviates from cv2's float taps by <=1 level).  EVERY op is now
bit-identical across the three backends: the same seed trains on the
same pixels unconditionally, on any backend mix.

A third backend runs the pixel ops ON DEVICE (`augment_backend='device'`,
ops/device_augment.py): same drawn parameters; geometry/blur in cv2's
conventions at the same fidelity class, ColorJitter bit-identical
(tests/test_device_augment.py); the host keeps only decode+resize.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np


def resize_pair(img: np.ndarray, mask: Optional[np.ndarray],
                size: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    if mask is not None:
        mask = cv2.resize(mask.astype(np.int32), (size, size),
                          interpolation=cv2.INTER_NEAREST)
    return img, mask


# ---------------------------------------------------------------------------
# Parameter drawing — the SINGLE source of randomness.  The numpy Generator is
# consumed here and only here, so the cv2 path below and the native C++ path
# (native/dtloader.cpp dt_augment_batch) produce the same geometry/photometry
# from the same per-sample seed (the resume-determinism contract).
# ---------------------------------------------------------------------------

def _draw_crop(rng: np.random.Generator, size: int,
               scale=(0.25, 1.0), ratio=(0.9, 1.1)):
    """RandomResizedCrop rect on a size x size canvas (albumentations'
    rejection-sampling loop)."""
    h = w = size
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            return x0, y0, cw, ch
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def _draw_affine(rng: np.random.Generator, size: int,
                 shift_limit=0.4, scale_limit=0.1, rotate_limit=15):
    """ShiftScaleRotate forward 2x3 matrix (cv2.getRotationMatrix2D about the
    pixel-center (size/2-0.5, size/2-0.5), plus the shift)."""
    h = w = size
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    dx = rng.uniform(-shift_limit, shift_limit)
    dy = rng.uniform(-shift_limit, shift_limit)
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    a = math.radians(angle)
    alpha, beta = scale * math.cos(a), scale * math.sin(a)
    return np.array([[alpha, beta, (1 - alpha) * cx - beta * cy + dx * w],
                     [-beta, alpha, beta * cx + (1 - alpha) * cy + dy * h]],
                    np.float64)


def _draw_jitter(rng: np.random.Generator,
                 brightness=0.5, contrast=0.2, saturation=0.2, hue=0.2):
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    hshift = rng.uniform(-hue, hue)
    order = rng.permutation(4)
    return order, (b, c, s, hshift)


def draw_params(rng: np.random.Generator, size: int = 480) -> dict:
    """Consume the rng exactly once per sample and return every decision the
    pipeline needs: Resize -> RandomResizedCrop(p=.75) ->
    ShiftScaleRotate(p=.25) -> HFlip(p=.5) -> ColorJitter(p=.5) ->
    GaussianBlur(p=.25)."""
    p = {"crop": None, "affine": None, "flip": False, "jitter": None,
         "blur": None}
    if rng.random() < 0.75:
        p["crop"] = _draw_crop(rng, size)
    if rng.random() < 0.25:
        p["affine"] = _draw_affine(rng, size)
    p["flip"] = bool(rng.random() < 0.5)
    if rng.random() < 0.5:
        p["jitter"] = _draw_jitter(rng)
    if rng.random() < 0.25:
        p["blur"] = int(rng.integers(3 // 2, 41 // 2 + 1)) * 2 + 1
    return p


PARAMS_LEN = 24  # packed float32 layout consumed by the C++ pipeline


def pack_params(p: dict) -> np.ndarray:
    """dict -> float32[PARAMS_LEN] for native/dtloader.cpp:dt_augment_batch."""
    out = np.zeros((PARAMS_LEN,), np.float32)
    if p["crop"] is not None:
        out[0] = 1.0
        out[1:5] = p["crop"]
    if p["affine"] is not None:
        out[5] = 1.0
        out[6:12] = np.asarray(p["affine"], np.float64).ravel()
    out[12] = 1.0 if p["flip"] else 0.0
    if p["jitter"] is not None:
        order, factors = p["jitter"]
        out[13] = 1.0
        out[14:18] = order
        out[18:22] = factors
    if p["blur"] is not None:
        out[22] = 1.0
        out[23] = p["blur"]
    return out


# ---------------------------------------------------------------------------
# warpAffine as an exact f32 recipe (round 5).
#
# cv2 5.0's warpAffine runs a rewritten float32 SIMD engine whose exact
# rounding depends on how the build associates/fuses the f32 chain (probed:
# every closed-form model — the classic fixed-point path, f64 coords, four
# f32 coordinate orders, fma blends — agrees with this build except on
# ~5e-5..1e-4 of pixels that sit within 3e-4 of a .5 boundary).  Unlike
# resize (round 3) and the jitter conversions (round 4) there is no stable
# integer contract to replicate, so the warp gets the same treatment the
# HSV2RGB fma got: the chain is DEFINED as an exact two-rounding f32 recipe
# that numpy (here), the C++ backend (-ffp-contract=off), and any device
# program compute natively and identically:
#
#   coords:   bx = f32(m1*y) + m2 ;  sx = f32(m0*x) + bx   (per-op rounding)
#   bilinear: r0 = t00 + tx*(t01-t00); r1 = t10 + tx*(t11-t10)
#             v  = r0 + ty*(r1-r0);   out = floor(f64(v) + 0.5) clipped
#   nearest:  xi = floor(f64(sx) + 0.5)  (masks)
#   borders:  reflect-101, matrix inverted in f64 (cv2's expressions)
#
# This makes the warp BIT-IDENTICAL across all three backends; the cost is
# deviating from this cv2 build's own warpAffine on ~1e-4 of pixels by one
# level (bounded in tests/test_native_augment.py), the same honesty class
# as the hsv_to_rgb_u8 note above.
# ---------------------------------------------------------------------------

def _invert_affine(M: np.ndarray) -> np.ndarray:
    """Forward 2x3 -> sampling matrix, double precision, cv2's expressions
    (mirrors native/dtloader.cpp:invert_affine)."""
    M = np.asarray(M, np.float64)
    d = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    d = 1.0 / d if d != 0.0 else 0.0
    inv = np.empty((2, 3), np.float64)
    inv[0, 0] = M[1, 1] * d
    inv[0, 1] = -M[0, 1] * d
    inv[1, 0] = -M[1, 0] * d
    inv[1, 1] = M[0, 0] * d
    inv[0, 2] = -(inv[0, 0] * M[0, 2] + inv[0, 1] * M[1, 2])
    inv[1, 2] = -(inv[1, 0] * M[0, 2] + inv[1, 1] * M[1, 2])
    return inv


def _reflect101_idx(idx: np.ndarray, n: int) -> np.ndarray:
    if n <= 1:
        return np.zeros_like(idx)
    period = 2 * (n - 1)
    idx = np.mod(idx, period)
    return np.where(idx < n, idx, period - idx)


def _warp_coords_f32(inv: np.ndarray, out_h: int, out_w: int):
    """(sy, sx) f32 source-coordinate grids per the recipe above."""
    f = np.float32
    xs = np.arange(out_w, dtype=f)
    ys = np.arange(out_h, dtype=f)
    bx = (f(inv[0, 1]) * ys) + f(inv[0, 2])     # f32 mul then f32 add
    by = (f(inv[1, 1]) * ys) + f(inv[1, 2])
    sx = (f(inv[0, 0]) * xs)[None, :] + bx[:, None]
    sy = (f(inv[1, 0]) * xs)[None, :] + by[:, None]
    return sx, sy


def warp_affine_u8(img: np.ndarray, M: np.ndarray, size: int) -> np.ndarray:
    """Bilinear reflect-101 warp of a uint8 (H,W,3) image onto a
    size x size canvas — the exact f32 recipe (bit-identical on every
    backend; see the block comment above).  The matrix quantizes to f32
    first: that is its wire precision in the packed-params layout
    (pack_params), so every backend inverts the identical matrix.

    Dispatches to the native C++ implementation when the library is built
    (same bits — native/dtloader.cpp:warp_affine_u8 is the identical
    recipe, asserted in tests/test_native_augment.py); the numpy fallback
    below IS the recipe's definition."""
    img = np.ascontiguousarray(img)
    from dino_tpu.data import native_loader
    native = native_loader.warp_affine(img, M, size)
    if native is not None:
        return native
    f = np.float32
    h, w = img.shape[:2]
    M32 = np.asarray(M, np.float32).astype(np.float64)
    sx, sy = _warp_coords_f32(_invert_affine(M32), size, size)
    x0 = np.floor(sx).astype(np.int32)
    y0 = np.floor(sy).astype(np.int32)
    tx = (sx - x0.astype(f))[..., None]
    ty = (sy - y0.astype(f))[..., None]
    xa = _reflect101_idx(x0, w)
    xb = _reflect101_idx(x0 + 1, w)
    ya = _reflect101_idx(y0, h)
    yb = _reflect101_idx(y0 + 1, h)
    flat = img.reshape(-1, 3)
    t00 = np.take(flat, ya * w + xa, axis=0).astype(f)
    t01 = np.take(flat, ya * w + xb, axis=0).astype(f)
    t10 = np.take(flat, yb * w + xa, axis=0).astype(f)
    t11 = np.take(flat, yb * w + xb, axis=0).astype(f)
    t01 -= t00
    t01 *= tx
    t01 += t00          # r0 = t00 + tx*(t01-t00), in place
    t11 -= t10
    t11 *= tx
    t11 += t10          # r1
    t11 -= t01
    t11 *= ty
    t11 += t01          # v
    v = t11.astype(np.float64)
    v += 0.5
    np.floor(v, out=v)
    return np.clip(v, 0, 255).astype(np.uint8)


def warp_affine_mask(mask: np.ndarray, M: np.ndarray, size: int
                     ) -> np.ndarray:
    """Nearest reflect-101 warp of an integer mask (same f32 coords;
    native fast path when built, numpy definition otherwise)."""
    mask = np.ascontiguousarray(mask, dtype=np.int32)
    from dino_tpu.data import native_loader
    native = native_loader.warp_affine_nearest(mask, M, size)
    if native is not None:
        return native
    h, w = mask.shape[:2]
    M32 = np.asarray(M, np.float32).astype(np.float64)
    sx, sy = _warp_coords_f32(_invert_affine(M32), size, size)
    xi = _reflect101_idx(np.floor(sx.astype(np.float64) + 0.5
                                  ).astype(np.int64), w)
    yi = _reflect101_idx(np.floor(sy.astype(np.float64) + 0.5
                                  ).astype(np.int64), h)
    return mask[yi, xi]


def gaussian_blur_u8(img: np.ndarray, k: int) -> np.ndarray:
    """GaussianBlur(k, sigma=0), reflect-101 — the exact dyadic-tap recipe
    (round 5).  Taps come from the same ladder every backend bakes in
    (ops/device_augment._gaussian_taps: cv2's tables for k <= 7, /256
    fixed point for k >= 9), so every product and partial sum in both
    separable passes is an exactly-representable float — the result is
    accumulation-order-independent and therefore BIT-IDENTICAL across
    this numpy definition, the C++ implementation (native dispatch
    below), and the device's banded matmuls.  vs cv2's own GaussianBlur:
    bit-equal for k <= 9 (those ARE cv2's taps), off-by-<=1 for k >= 11
    (cv2 keeps float taps there; bounded in tests/test_native_augment.py)
    — the last per-backend augmentation op is gone."""
    img = np.ascontiguousarray(img, np.uint8)
    from dino_tpu.data import native_loader
    native = native_loader.gaussian_blur(img, k)
    if native is not None:
        return native
    from dino_tpu.ops.device_augment import _gaussian_taps
    t = _gaussian_taps(int(k))
    pad = int(k) // 2
    x = np.pad(img.astype(np.float64), ((pad, pad), (0, 0), (0, 0)),
               mode="reflect")
    h, w = img.shape[:2]
    acc = np.zeros((h, w, 3), np.float64)
    for i in range(int(k)):
        acc += t[i] * x[i:i + h]
    x = np.pad(acc, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    acc = np.zeros((h, w, 3), np.float64)
    for i in range(int(k)):
        acc += t[i] * x[:, i:i + w]
    return np.clip(np.floor(acc + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# cv2 application path (reference semantics; also the native path's oracle)
# ---------------------------------------------------------------------------

# The three color conversions in the jitter chain, implemented as EXACT
# arithmetic recipes (each exhaustively verified bit-equal to this build's
# cv2.cvtColor over every input: 16.7M RGB triples for gray/HSV-forward,
# 11.8M HSV triples for the backward).  Having the recipe — instead of
# calling into cv2 — is what lets the C++ and device backends reproduce
# the chain bit-for-bit (round 4; the blur tap ladder was the same move).

def gray_u8(u8: np.ndarray) -> np.ndarray:
    """cv2 RGB2GRAY on uint8: IPP's shift-15 fixed point
    (9798, 19235, 3735)/32768 with round-half-up descale."""
    r = u8[..., 0].astype(np.int64)
    g = u8[..., 1].astype(np.int64)
    b = u8[..., 2].astype(np.int64)
    return ((r * 9798 + g * 19235 + b * 3735 + 16384) >> 15).astype(np.uint8)


_HSV_SHIFT = 12
_IDX = np.arange(256)
_IDX[0] = 1
SDIV_TABLE = np.round((255 << _HSV_SHIFT) / _IDX.astype(np.float64)
                      ).astype(np.int64)
HDIV_TABLE = np.round((180 << _HSV_SHIFT) / (6.0 * _IDX)).astype(np.int64)
SDIV_TABLE[0] = HDIV_TABLE[0] = 0


def rgb_to_hsv_u8(u8: np.ndarray):
    """cv2 RGB2HSV on uint8 (H in [0,180)): the hsv_shift=12 div-table
    integer path.  Returns (h, s, v) int arrays."""
    r = u8[..., 0].astype(np.int64)
    g = u8[..., 1].astype(np.int64)
    b = u8[..., 2].astype(np.int64)
    v = np.maximum(np.maximum(r, g), b)
    diff = v - np.minimum(np.minimum(r, g), b)
    s = (diff * SDIV_TABLE[v] + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    h = np.where(v == r, g - b,
                 np.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h * HDIV_TABLE[diff] + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    return np.where(h < 0, h + 180, h), s, v


def hsv_to_rgb_u8(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """cv2-shaped HSV2RGB on uint8: float32 sector math with TRUNCATING
    output cast.  One deliberate deviation from this cv2 build: the
    ``1 - s*f`` terms are plain two-rounding f32 (mul, round, subtract)
    where cv2's build contracts them into an fma — two-rounding is what
    numpy, the C++ backend (-ffp-contract=off), and the TPU's elementwise
    f32 all compute NATIVELY, which is what makes the three backends
    bit-identical; the cost is disagreeing with cv2's own cvtColor on
    ~5e-5 of HSV inputs by one level (bounded in
    tests/test_color_exact.py).  gray/RGB2HSV above are pure integer
    recipes and stay exactly cv2."""
    ft = np.float32
    hf = h.astype(ft) * ft(6.0 / 180.0)
    sf = s.astype(ft) * ft(1.0 / 255.0)
    vf = v.astype(ft) * ft(1.0 / 255.0)
    sector = np.floor(hf).astype(np.int64)
    f = (hf - sector).astype(ft)
    sector = sector % 6
    one = ft(1.0)
    tabs = np.stack([vf, vf * (one - sf), vf * (one - sf * f),
                     vf * (one - sf * (one - f))], axis=-1).astype(ft)
    rsel = np.array([0, 2, 1, 1, 3, 0])
    gsel = np.array([3, 0, 0, 2, 1, 1])
    bsel = np.array([1, 1, 3, 0, 0, 2])
    flat = tabs.reshape(-1, 4)
    ar = np.arange(flat.shape[0])
    sec = sector.reshape(-1)
    out = np.stack([flat[ar, rsel[sec]], flat[ar, gsel[sec]],
                    flat[ar, bsel[sec]]], axis=-1) * ft(255.0)
    return np.floor(out).astype(np.uint8).reshape(h.shape + (3,))


def _u8(x: np.ndarray) -> np.ndarray:
    """clip + truncating uint8 cast (numpy astype semantics)."""
    return np.clip(x, 0, 255).astype(np.uint8)


def _apply_jitter(img, order, factors):
    """torchvision-style ColorJitter, defined as an exact f32 chain.

    Every operation below is a single-rounded float32 op on f32-cast
    factors (or exact integer arithmetic), so the C++ backend
    (native/dtloader.cpp:color_jitter) and the device backend
    (ops/device_augment.py:_jitter) reproduce it BIT-FOR-BIT — the
    per-backend jitter tolerance of rounds 2-3 is gone.  Chain: f32
    accumulator, clip to [0,255] after each op, uint8 conversions
    truncate; the contrast mean is the exact integer-sum split
    q + fl32(r/n) (both addends exactly representable; a naive f32 mean
    of 230k grays accumulates error past 2^24)."""
    fb, fc, fs, fh = [np.float32(v) for v in factors]
    one = np.float32(1.0)
    x = img.astype(np.float32)
    for i in order:
        if i == 0:
            x = x * fb
        elif i == 1:
            g = gray_u8(_u8(x))
            q, r = divmod(int(g.sum()), g.size)
            gray32 = np.float32(q) + np.float32(
                np.float32(r) / np.float32(g.size))
            add = gray32 * (one - fc)
            x = (x * fc) + add
        elif i == 2:
            g = gray_u8(_u8(x)).astype(np.float32)
            gy = g * (one - fs)
            x = (x * fs) + gy[..., None]
        else:
            h, s, v = rgb_to_hsv_u8(_u8(x))
            shift = int(np.rint(fh * np.float32(180.0)))
            h = (h.astype(np.int64) + shift) % 180
            x = hsv_to_rgb_u8(h, s, v).astype(np.float32)
        x = np.clip(x, 0, 255)
    return x.astype(np.uint8)


def apply_params(p: dict, img: np.ndarray, mask: Optional[np.ndarray],
                 size: int = 480) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Apply drawn parameters with cv2 (images bilinear, masks nearest,
    affine borders reflect-101 — albumentations defaults)."""
    img, mask = resize_pair(img, mask, size)
    if p["crop"] is not None:
        x0, y0, cw, ch = p["crop"]
        img = img[y0:y0 + ch, x0:x0 + cw]
        mask = None if mask is None else mask[y0:y0 + ch, x0:x0 + cw]
        img, mask = resize_pair(img, mask, size)
    if p["affine"] is not None:
        m = np.asarray(p["affine"], np.float64)
        img = warp_affine_u8(img, m, size)
        if mask is not None:
            mask = warp_affine_mask(mask.astype(np.int32), m, size)
    if p["flip"]:
        img = img[:, ::-1].copy()
        mask = None if mask is None else mask[:, ::-1].copy()
    if p["jitter"] is not None:
        img = _apply_jitter(img, *p["jitter"])
    if p["blur"] is not None:
        img = gaussian_blur_u8(img, p["blur"])
    return img, mask


def augment(rng: np.random.Generator, img: np.ndarray, mask: np.ndarray,
            size: int = 480) -> Tuple[np.ndarray, np.ndarray]:
    """Full training augmentation. img uint8 (H,W,3), mask int (H,W)."""
    return apply_params(draw_params(rng, size), img, mask, size)


def prepare_device_batch(imgs: np.ndarray, params: list, size: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side geometry staging for the DEVICE augmentation backend.

    Affine warps are per-pixel gathers — the one augmentation op TPUs run
    poorly (~6 ms/sample measured vs <1 ms for everything else combined,
    PERF.md "Device-side augmentation").  ShiftScaleRotate fires on only
    25% of samples, so those samples get their geometry (crop + warp) done
    HERE with cv2 — which is the oracle, i.e. exact reference semantics —
    and their crop/affine flags are cleared before the packed params go to
    the device program (which therefore contains no warp at all).
    Returns (imgs with host geometry applied where needed, packed
    (B, PARAMS_LEN) float32).
    """
    # warped rows write back in place (the loader hands a fresh batch
    # array); non-affine rows are untouched — no full-batch copy on the
    # hot input path
    imgs = np.ascontiguousarray(imgs)
    packed = np.empty((len(params), PARAMS_LEN), np.float32)
    for i, p in enumerate(params):
        if p["affine"] is not None:
            img = imgs[i]
            if p["crop"] is not None:
                x0, y0, cw, ch = p["crop"]
                img, _ = resize_pair(img[y0:y0 + ch, x0:x0 + cw], None, size)
            imgs[i] = warp_affine_u8(img, np.asarray(p["affine"], np.float64),
                                     size)
            p = dict(p, crop=None, affine=None)
        packed[i] = pack_params(p)
    return imgs, packed
